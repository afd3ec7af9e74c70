"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship span+quality pipeline on sf0.001;
``queries``/``oracle_sql`` expose every implemented operator from
SURVEY.md §2 plus the training-data pipeline ops — as of round 5 ALL 50
entries carry a DuckDB oracle (the two approximate-ANN entries are
in-plan recall@10 gates against the exact brute force, frozen VALUES
oracles; see pdf_extractor_spark/queries.py and pipeline_queries.py —
the registry keeps each Spark/SQL pair side by side).
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
import pdf_extractor_spark.extraction_queries  # noqa: F401,E402  (registers)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the real extraction engine end-to-end — deterministic
    synthetic interleaved PDF+HTML corpus → fused Arrow tokenize/assembly
    kernel (zero-shuffle narrow plan) → per-content-type span summary."""
    from pdf_extractor_spark.corpus import generate_corpus
    from pdf_extractor_spark.pipeline import extract_spans

    docs = generate_corpus(spark, 200, partitions=8)
    spans = extract_spans(docs, partitions=8, columns="public")
    kinds = docs.select("doc_id", "content_type")
    return (
        spans.join(kinds, "doc_id")
        .select(
            "content_type",
            F.size("spans").alias("n_spans"),
            F.size(F.filter("spans", lambda s: s["kind"] == "media")).alias("n_media"),
            "content_hash",
        )
        .groupBy("content_type")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("content_hash").alias("n_distinct_docs"),
            F.sum("n_spans").alias("n_spans"),
            F.sum("n_media").alias("n_media_spans"),
            F.round(F.avg("n_spans"), 4).alias("avg_spans_per_doc"),
        )
        .orderBy("content_type")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.all_queries()


def oracle_sql() -> dict[str, str]:
    return _q.all_oracles()
