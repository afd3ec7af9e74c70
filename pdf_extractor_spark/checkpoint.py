"""Checkpoint / lineage protocol (north_rule resumability).

Spark restatement of the reference's resume journal
(`/root/reference/batch_extract.py:99-107,153-181`): instead of rewriting one
JSON file per document, every partition appends idempotent lineage rows keyed
``(run_id, partition_id, doc_id)``; a restart anti-joins committed doc_ids.

The checkpoint table is plain parquet appends (atomic at file granularity —
each task writes its own file, so a killed job leaves only complete partition
files behind; no Iceberg transaction required)."""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_extractor_spark.schema import CHECKPOINT_SCHEMA

CHECKPOINT_DIR = "checkpoint"


def checkpoint_path(output_dir: str) -> str:
    return os.path.join(output_dir, CHECKPOINT_DIR)


def read_checkpoint(spark: SparkSession, output_dir: str) -> Optional[DataFrame]:
    path = checkpoint_path(output_dir)
    try:
        return spark.read.schema(CHECKPOINT_SCHEMA).parquet(path)
    except Exception:
        return None  # first run — nothing committed yet


def write_checkpoint(
    spark: SparkSession, output_dir: str, run_id: str, spans_path: str
) -> int:
    """Derive lineage rows from the just-written spans output and append them.

    Reading back the committed files (rather than trusting the in-flight
    DataFrame) makes the checkpoint reflect exactly what is durable — the
    property the reference gets by appending to its journal only after each
    document is written (batch_extract.py:176-181)."""
    written = spark.read.parquet(spans_path)
    lineage = written.select(
        F.lit(run_id).alias("run_id"),
        F.spark_partition_id().alias("partition_id"),
        F.col("doc_id"),
        F.col("content_hash"),
        F.lit("committed").alias("status"),
        F.col("span_count").cast("int").alias("span_count"),
        F.lit(0).cast("long").alias("byte_count"),
        F.current_timestamp().alias("committed_at"),
    )
    prior = read_checkpoint(spark, output_dir)
    if prior is not None:
        lineage = lineage.join(
            prior.select("doc_id").distinct(), "doc_id", "left_anti"
        )
    lineage.write.mode("append").parquet(checkpoint_path(output_dir))
    new = spark.read.parquet(checkpoint_path(output_dir)).where(
        F.col("run_id") == run_id
    )
    return new.count()


def run_metrics(checkpoint: DataFrame) -> DataFrame:
    """A3/A5 analog: per-run counters from lineage (docs, spans, partitions)."""
    return checkpoint.groupBy("run_id").agg(
        F.count("*").alias("docs"),
        F.sum("span_count").alias("total_spans"),
        F.countDistinct("partition_id").alias("partitions"),
        F.min("committed_at").alias("started_at"),
        F.max("committed_at").alias("finished_at"),
    )
