"""Custom stateful streaming ops: cross-batch dedup state that survives
restarts (applyInPandasWithState) and watermarked windowed aggregation."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pdf_extractor_spark.corpus import generate_corpus
from pdf_extractor_spark.streaming.stateful import (
    run_dedup_stream, run_windowed_counts,
)


def test_stateful_dedup_across_batches_and_restarts(spark, tmp_path):
    docs_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "out")

    # batch 1: first 40 docs of the corpus (contains its own duplicates)
    corpus = generate_corpus(spark, 60, partitions=2).persist()
    corpus.where(F.col("doc_id") < "doc_000000040").write.parquet(docs_dir)
    run_dedup_stream(spark, docs_dir, out_dir)
    uniq1 = spark.read.parquet(os.path.join(out_dir, "unique"))
    n1 = uniq1.count()
    assert n1 == uniq1.select("content_hash").distinct().count()  # no dupes

    # batch 2 arrives AFTER a stream restart: the full corpus appended as
    # new files — replays every batch-1 content hash; state must hold
    corpus.write.mode("append").parquet(docs_dir)
    run_dedup_stream(spark, docs_dir, out_dir)
    uniq = spark.read.parquet(os.path.join(out_dir, "unique"))
    total_distinct = (
        corpus.select(
            F.sha2(F.coalesce(F.col("content"), F.lit(b"")), 256).alias("h")
        )
        .distinct()
        .count()
    )
    assert uniq.select("content_hash").distinct().count() == total_distinct
    # exactly one row per hash across BOTH runs — cross-restart dedup
    assert uniq.count() == total_distinct
    corpus.unpersist()


def test_windowed_counts_match_batch_for_closed_windows(spark, tmp_path, sf_dir):
    out_dir = str(tmp_path / "out")
    events_src = os.path.join(sf_dir, "events.parquet")
    events_dir = str(tmp_path / "events")
    spark.read.parquet(events_src).write.parquet(events_dir)

    run_windowed_counts(spark, events_dir, out_dir)
    got = spark.read.parquet(os.path.join(out_dir, "window_counts"))
    assert got.count() > 0

    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
        )
    )
    # every emitted (closed) window must agree exactly with the batch
    # computation; only the tail windows past the final watermark may be
    # withheld
    mismatches = got.alias("g").join(
        batch.alias("b"), ["window_start", "event_type"], "left"
    ).where((F.col("b.n").isNull()) | (F.col("g.n") != F.col("b.n")))
    assert mismatches.count() == 0
    assert got.count() <= batch.count()
