"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship span+quality pipeline on sf0.001;
``queries``/``oracle_sql`` expose every implemented operator from
SURVEY.md §2 plus the training-data pipeline ops, each with a DuckDB oracle
where SQL-expressible (see pdf_extractor_spark/queries.py and
pipeline_queries.py — the registry keeps each Spark/SQL pair side by side).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pdf_extractor_spark.queries as _q  # noqa: E402
import pdf_extractor_spark.pipeline_queries  # noqa: F401,E402  (registers)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: documents → sentence spans (input_hint shape) → per-language
    corpus summary with quality + exact-dedup stats."""
    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    spans = docs.select(
        "doc_id",
        "lang",
        F.md5("text").alias("text_hash"),
        F.filter(
            F.transform(
                F.split("text", r"\. "),
                lambda s, i: F.struct(
                    F.lit("text").alias("kind"),
                    s.alias("text"),
                    F.lit(None).cast("string").alias("media_ref"),
                    i.cast("int").alias("offset"),
                ),
            ),
            lambda st: F.length(st["text"]) > 0,
        ).alias("spans"),
    )
    return (
        spans.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("text_hash").alias("n_distinct_docs"),
            F.sum(F.size("spans")).alias("n_spans"),
            F.round(F.avg(F.size("spans")), 4).alias("avg_spans_per_doc"),
        )
        .orderBy("lang")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.all_queries()


def oracle_sql() -> dict[str, str]:
    return _q.all_oracles()
