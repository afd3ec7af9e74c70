"""End-to-end extraction pipeline (the Spark restatement of the reference's
CLI batch job, `/root/reference/batch_extract.py` + `extractor.py:871-988`).

Stages (all DataFrame-declarative; Catalyst owns pushdown/pruning/joins):

  read docs → anti-join checkpoint (resume, P5/ST4) → dedup by sha2 (O3)
    → size-bucket + salt repartition (O9, skew) → tokenize (Arrow kernel)
    → assemble (codegen) → [field extraction vs broadcast KB]
    → write spans + per-partition lineage/metrics (ST3/S8)

Scale notes (100 TB / 10^12 docs):
  * Dedup-before-compute is the dominant saving (the reference computes each
    distinct document once via its hash caches, extractor.py:72-81,883-886);
    here it is a shuffle on sha2(content) — the *only* wide dependency in the
    pipeline; everything downstream is narrow.
  * Skew: multi-MB PDFs are salted into size buckets before the Arrow kernel
    so one fat partition cannot stall a stage (north_rule).
  * Resume: a left-anti join against the checkpoint table keyed on doc_id —
    at scale this is a broadcast-able or bucketed join on the checkpoint side.
"""

from __future__ import annotations

import os
import time
import uuid
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_extractor_spark import assemble
from pdf_extractor_spark.pdf.udf import tokenize_pdf_udf

SESSION_DEFAULTS = {
    # AQE: runtime coalescing + skew-join splitting at cluster scale
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow everywhere; modest batches because span arrays are fat
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "1024",
    # 128 MB scan splits — fits executor memory with fat binary rows
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.parquet.compression.codec": "zstd",
    "spark.ui.enabled": "false",
}


def build_session(
    master: Optional[str] = None,
    shuffle_partitions: Optional[int] = None,
    app_name: str = "pdf_extractor_spark",
) -> SparkSession:
    # Make this package importable in executor Python workers regardless of
    # the driver's cwd (cluster deployments ship it via spark-submit
    # --py-files engine.zip instead).
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + existing if existing else "")
        )
    builder = SparkSession.builder.appName(app_name)
    builder = builder.config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
    if master:
        builder = builder.master(master)
    for k, v in SESSION_DEFAULTS.items():
        builder = builder.config(k, v)
    if shuffle_partitions:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return builder.getOrCreate()


# ---------------------------------------------------------------------------
# Core stages
# ---------------------------------------------------------------------------

SIZE_BUCKET_EDGES = [64 * 1024, 512 * 1024, 4 * 1024 * 1024]  # bytes


def with_content_hash(df: DataFrame, content_col: str = "content") -> DataFrame:
    """S2: streaming SHA-256 of the document bytes (extractor.py:72-81).

    NULL content hashes to the empty-bytes digest so such rows survive the
    dedup join (they get an empty span list instead of silently vanishing)."""
    return df.withColumn(
        "content_hash",
        F.sha2(F.coalesce(F.col(content_col), F.lit(b"")), 256),
    )


def size_bucket(col):
    """O9: coarse size bucket for skew-aware repartitioning."""
    b = F.lit(0)
    for i, edge in enumerate(SIZE_BUCKET_EDGES):
        b = F.when(col > edge, F.lit(i + 1)).otherwise(b)
    return b


def skew_repartition(df: DataFrame, partitions: int, size_col: str = "size_bytes") -> DataFrame:
    """Salted, size-bucketed repartition: fat docs spread uniformly so a
    single partition never owns all megabyte-scale PDFs (north_rule skew
    clause). Salt = hash of doc_id → deterministic, no Date/rand needed."""
    return df.repartition(
        partitions,
        size_bucket(F.col(size_col)),
        F.pmod(F.hash("doc_id"), F.lit(max(partitions, 1))),
    )


def dedup_by_hash(df: DataFrame) -> DataFrame:
    """O3: compute once per distinct content (the reference's pdf_cache,
    extractor.py:883-886). Returns representative rows; join results back
    with :func:`fanout_results`."""
    return df.dropDuplicates(["content_hash"])


def fanout_results(all_docs: DataFrame, distinct_results: DataFrame) -> DataFrame:
    """Join per-distinct-hash results back onto every duplicate row."""
    return all_docs.select("doc_id", "content_hash").join(
        distinct_results, "content_hash", "inner"
    )


def tokenize_stage(df: DataFrame, content_col: str = "content") -> DataFrame:
    """S1: Arrow tokenizer kernel + reading-order assembly.

    Dispatches PDF vs HTML by magic bytes (``%PDF``) — content_type metadata
    may lie at web scale. Both kernels emit the same tokenized struct; HTML
    document order is pre-encoded in y0 so one assembly stage serves both."""
    from pdf_extractor_spark.html.boilerplate import tokenize_html_udf

    is_pdf = F.startswith(
        F.col(content_col).cast("string"), F.lit("%PDF")
    )
    tok = df.withColumn(
        "_tok",
        F.when(is_pdf, tokenize_pdf_udf(F.col(content_col))).otherwise(
            tokenize_html_udf(F.col(content_col))
        ),
    )
    ordered = tok.withColumn("ordered_spans", assemble.ordered_spans(F.col("_tok.spans")))
    return (
        ordered.withColumn("page_width", F.col("_tok.page_width"))
        .withColumn("page_height", F.col("_tok.page_height"))
        .withColumn("spans", assemble.public_spans(F.col("ordered_spans")))
        .withColumn("full_text", assemble.full_text(F.col("ordered_spans")))
        .drop("_tok")
    )


def extract_spans(
    docs: DataFrame,
    partitions: int = 32,
    checkpoint: Optional[DataFrame] = None,
) -> DataFrame:
    """RAW_DOC_SCHEMA docs → (doc_id, spans, full_text, …) with resume/dedup.

    ``checkpoint``: prior lineage table; already-committed doc_ids are
    skipped via left-anti join (batch_extract.py:99-107 semantics).
    """
    df = with_content_hash(docs)
    if checkpoint is not None:
        done = checkpoint.where(F.col("status") == "committed").select("doc_id")
        df = df.join(done, "doc_id", "left_anti")
    all_ids = df.select("doc_id", "content_hash")
    distinct = dedup_by_hash(df)
    distinct = skew_repartition(distinct, partitions)
    tokenized = tokenize_stage(distinct).select(
        "content_hash", "page_width", "page_height",
        "ordered_spans", "spans", "full_text",
    )
    return all_ids.join(tokenized, "content_hash", "inner")


# ---------------------------------------------------------------------------
# Runnable job with lineage/metrics checkpointing
# ---------------------------------------------------------------------------


def run_extraction_job(
    spark: SparkSession,
    input_path: str,
    output_dir: str,
    run_id: Optional[str] = None,
    partitions: int = 32,
    resume: bool = True,
) -> dict:
    """Read a RAW_DOC parquet table, extract spans, write spans + checkpoint.

    Output layout (Iceberg-shaped parquet; catalog wiring is a config flag
    when an Iceberg runtime is present):
      {output_dir}/spans/        doc_id, spans (public contract)
      {output_dir}/checkpoint/   CHECKPOINT_SCHEMA rows, one per doc
    Resumable: rerunning with the same output_dir skips committed docs.
    """
    from pdf_extractor_spark.checkpoint import read_checkpoint, write_checkpoint

    run_id = run_id or uuid.uuid4().hex
    docs = spark.read.parquet(input_path)
    ckpt = read_checkpoint(spark, output_dir) if resume else None
    result = extract_spans(docs, partitions=partitions, checkpoint=ckpt)
    out = result.select(
        "doc_id",
        "content_hash",
        "spans",
        "full_text",
        F.size("spans").alias("span_count"),
    )
    t0 = time.time()
    spans_path = os.path.join(output_dir, "spans")
    out.write.mode("append").parquet(spans_path)
    n_docs = write_checkpoint(spark, output_dir, run_id, spans_path)
    elapsed = time.time() - t0
    return {
        "run_id": run_id,
        "docs": n_docs,
        "seconds": elapsed,
        "docs_per_sec": n_docs / elapsed if elapsed > 0 else 0.0,
    }
