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
import re
import time
import uuid
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_extractor_spark import assemble
from pdf_extractor_spark.schema import METRICS_SCHEMA  # noqa: F401 (public)

SESSION_DEFAULTS = {
    # local-mode: driver JVM hosts all executor threads. Multi-MB binary
    # document rows are humongous allocations under G1 and its GCLocker
    # interaction with the Arrow JNI paths collapses throughput (measured:
    # G1@8g 124s vs ZGC@8g 69s on the 500k-doc job; G1 at small heaps
    # GCLocker-thrashes outright). ZGC has no humongous regions and no
    # GCLocker stalls — it is the right collector for fat-binary-row
    # workloads. On a real cluster these become spark.executor.memory /
    # spark.executor.extraJavaOptions via spark-submit.
    "spark.driver.memory": "8g",
    "spark.driver.extraJavaOptions": "-XX:+UseZGC",
    # AQE: runtime coalescing + skew-join splitting at cluster scale
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Let AQE re-plan INSIDE cached plans too: with the default (false), any
    # persist() pins its shuffle output at spark.sql.shuffle.partitions and
    # disables runtime coalescing for the cached subtree — measured 45s vs
    # 2.4s on dedup_minhash_bands' persisted band relation at sf0.1
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
    # Long-lived, reused Python workers: every leg of the scaling sweep
    # amortizes worker spin-up identically (BENCH/BASELINE.md cites this)
    "spark.python.worker.reuse": "true",
    # Arrow everywhere; modest batches because span arrays are fat
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "1024",
    # Vectorized parquet reader: the default 4096-row columnar batch times
    # multi-MB binary document cells demands GBs of contiguous heap (OOMs on
    # the skew tail); 128 rows bounds a batch to ~256 MB even if every row
    # is a megabyte-class PDF
    "spark.sql.parquet.columnarReaderBatchSize": "128",
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

def with_content_hash(df: DataFrame, content_col: str = "content") -> DataFrame:
    """S2: streaming SHA-256 of the document bytes (extractor.py:72-81).

    NULL content hashes to the empty-bytes digest so such rows survive the
    dedup join (they get an empty span list instead of silently vanishing)."""
    return df.withColumn(
        "content_hash",
        F.sha2(F.coalesce(F.col(content_col), F.lit(b"")), 256),
    )


def skew_repartition(df: DataFrame, partitions: int) -> DataFrame:
    """Content-hash-salted repartition: sha2(content) is uniform, so
    megabyte-scale PDFs spread evenly instead of queueing behind each other
    (north_rule skew clause). Measured against a (size_bucket, salt) pair
    scheme: hashing the pair into partitions leaves bins empty/overloaded
    (7.7s vs 4.3s on the 20k-doc corpus), so the plain uniform key wins.
    Deterministic — no clock or rand involved."""
    return df.repartition(partitions, F.col("content_hash"))


def dedup_by_hash(df: DataFrame) -> DataFrame:
    """O3: compute once per distinct content (the reference's pdf_cache,
    extractor.py:883-886). Returns representative rows."""
    return df.dropDuplicates(["content_hash"])


def dedup_with_lineage(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Dedup that keeps every duplicate's doc_id alongside the one
    representative content — one shuffle total.

    ``dropDuplicates`` + join-back would shuffle the content AND then
    shuffle the (much larger) span results a second time; aggregating
    ``collect_list(doc_id)`` in the same exchange and exploding after the
    tokenizer halves the data movement. Map-side partial aggregation
    collapses same-partition duplicates before the wire."""
    return df.groupBy("content_hash").agg(
        F.first(content_col).alias(content_col),
        F.collect_list("doc_id").alias("doc_ids"),
    )


def tokenize_stage(
    df: DataFrame, content_col: str = "content", columns: str = "geo"
) -> DataFrame:
    """S1: Arrow tokenizer kernel + reading-order assembly.

    Dispatches PDF vs HTML by magic bytes (``%PDF``) — content_type metadata
    may lie at web scale. Dispatch AND per-doc assembly (sort/offset/full
    text) happen inside one fused Arrow kernel (tokenize_dispatch): content
    crosses the Arrow boundary exactly once and no higher-order Column
    function sits on the hot path (those fall out of codegen — see
    tokenize_dispatch docstring for the measurements). assemble.py holds
    the equivalent Column forms, oracle-tested separately.

    ``columns="geo"`` emits geometry-bearing ordered spans + full_text (for
    downstream field extraction); ``columns="public"`` pushes the projection
    into the kernel — only the 4-field public contract crosses Arrow (the
    kernel-level analog of parquet column pruning; right choice for
    spans-only jobs)."""
    from pdf_extractor_spark.tokenize_dispatch import (
        tokenize_assemble_public_udf,
        tokenize_assemble_udf,
    )

    if columns == "public":
        tok = df.withColumn("_tok", tokenize_assemble_public_udf(F.col(content_col)))
        return (
            tok.withColumn("page_width", F.col("_tok.page_width"))
            .withColumn("page_height", F.col("_tok.page_height"))
            .withColumn("spans", F.col("_tok.spans"))
            .drop("_tok")
        )
    tok = df.withColumn("_tok", tokenize_assemble_udf(F.col(content_col)))
    return (
        tok.withColumn("ordered_spans", F.col("_tok.spans"))
        .withColumn("page_width", F.col("_tok.page_width"))
        .withColumn("page_height", F.col("_tok.page_height"))
        .withColumn("spans", assemble.public_spans(F.col("_tok.spans")))
        .withColumn("full_text", F.col("_tok.full_text"))
        .drop("_tok")
    )


def extract_spans(
    docs: DataFrame,
    partitions: int = 32,
    checkpoint: Optional[DataFrame] = None,
    dedup: str = "narrow",
    columns: str = "geo",
) -> DataFrame:
    """RAW_DOC_SCHEMA docs → (doc_id, spans, full_text, …) with resume/dedup.

    ``checkpoint``: prior lineage table; already-committed doc_ids are
    skipped via left-anti join (batch_extract.py:99-107 semantics).

    ``dedup`` is a cost-model switch (the reference's pdf_cache always
    memoizes, extractor.py:883-886; at cluster scale the right answer
    depends on kernel cost vs wire cost):

    * ``"narrow"`` (default): tokenize straight off the scan — ZERO
      shuffles. Duplicates are re-tokenized (~dup_rate extra CPU). Wins
      whenever per-doc kernel cost is cheap relative to shuffling the
      content bytes (measured here: ~1 ms/doc kernel vs ~15 ms/doc to move
      a 15 KB doc through two shuffle hops).
    * ``"wide"``: dedup-before-compute — one groupBy(content_hash) exchange
      carrying content + collect_list(doc_id), tokenize once per distinct
      doc, explode the id list after. Wins when the kernel is expensive
      (OCR, media decode, LLM stages) or the dup rate is high; this is the
      100 TB default for those stages.
    """
    df = with_content_hash(docs)
    if checkpoint is not None:
        done = checkpoint.where(F.col("status") == "committed").select("doc_id")
        df = df.join(done, "doc_id", "left_anti")
    extra = (
        [] if columns == "public" else ["ordered_spans", "full_text"]
    )
    if dedup == "narrow":
        return tokenize_stage(df, columns=columns).select(
            "doc_id", "content_hash", "page_width", "page_height",
            "spans", *extra,
        )
    # ONE exchange total, at the caller-chosen width: the explicit
    # repartition on content_hash sets the task count for the tokenize
    # stage (uniform hash key spreads megabyte skew docs), and the groupBy
    # on the SAME key reuses that partitioning — Catalyst inserts no second
    # exchange (ClusteredDistribution satisfied). A repartition AFTER the
    # groupBy would be the redundant-shuffle version of this.
    distinct = dedup_with_lineage(skew_repartition(df, partitions))
    tokenized = tokenize_stage(distinct, columns=columns).select(
        "content_hash", "doc_ids", "page_width", "page_height",
        "spans", *extra,
    )
    return tokenized.withColumn("doc_id", F.explode("doc_ids")).drop("doc_ids")


# ---------------------------------------------------------------------------
# Runnable job with lineage/metrics checkpointing
# ---------------------------------------------------------------------------


def _read_kb_state(spark: SparkSession, output_dir: str) -> DataFrame:
    """Load the persisted KB, healing an interrupted swap first.

    Swap protocol (see _swap_kb_state): kb_new is written, kb is renamed to
    kb_old, kb_new renamed to kb, kb_old removed. A crash can leave (a) kb
    missing with kb_old present → roll BACK (kb_new may be incomplete), or
    (b) kb present with leftovers → just clean up."""
    import shutil

    from pdf_extractor_spark.kb import kb_df

    kb_dir = os.path.join(output_dir, "kb")
    kb_old = kb_dir + "_old"
    if not os.path.isdir(kb_dir) and os.path.isdir(kb_old):
        os.rename(kb_old, kb_dir)  # crashed mid-swap → previous state wins
    shutil.rmtree(kb_old, ignore_errors=True)
    shutil.rmtree(kb_dir + "_new", ignore_errors=True)
    if os.path.isdir(kb_dir):
        # materialize the KB off its files into a local relation: the KB is
        # dimension-sized (broadcast everywhere downstream — the reference
        # holds it as an in-memory dict), and the job swaps the kb directory
        # BEFORE the results write, so any plan still lazily referencing the
        # old parquet files would hit FILE_NOT_EXIST mid-job
        kb_files = spark.read.parquet(kb_dir)
        return spark.createDataFrame(kb_files.collect(), kb_files.schema)
    return kb_df(spark, [])


def _swap_kb_state(spark: SparkSession, output_dir: str, kb_out: DataFrame) -> None:
    """Atomically-enough replace the persisted KB: write to kb_new, shelve
    the old dir (rename, not delete), promote kb_new, drop the shelf. Every
    crash window leaves either the old or the new complete state
    recoverable (_read_kb_state heals on the next run)."""
    import shutil

    kb_dir = os.path.join(output_dir, "kb")
    kb_new, kb_old = kb_dir + "_new", kb_dir + "_old"
    kb_out.write.mode("overwrite").parquet(kb_new)
    # a prior run that crashed between promote and shelf-drop leaves a
    # non-empty kb_old; _read_kb_state heals it on the read path, but a
    # caller that passed an explicit kb= never reads — clear the shelf
    # here too or os.rename(kb_dir, kb_old) raises ENOTEMPTY forever
    shutil.rmtree(kb_old, ignore_errors=True)
    if os.path.isdir(kb_dir):
        os.rename(kb_dir, kb_old)
    os.rename(kb_new, kb_dir)
    shutil.rmtree(kb_old, ignore_errors=True)


def lineage_projection(result: DataFrame) -> DataFrame:
    """The spans-sink output columns BOTH the batch and streaming jobs write
    (write_checkpoint reads span_count/byte_count/partition_id back from
    these files — one shared definition so batch and stream lineage can
    never diverge silently):

    * ``byte_count``: serialized payload size, computed by the writing task
      while the spans are in memory — the lineage commit reads it back
      instead of re-serializing every span array a second time;
    * ``partition_id``: the WRITING task's partition, recorded verbatim.
    """
    return result.select(
        "doc_id",
        "content_hash",
        "spans",
        F.size("spans").alias("span_count"),
        F.octet_length(F.to_json("spans")).cast("long").alias("byte_count"),
        F.spark_partition_id().alias("partition_id"),
    )


def _guard_run_id_unused(ckpt: Optional[DataFrame], run_id: str) -> None:
    """Refuse to reuse a run_id that already committed docs.

    The per-run directory is written with mode("overwrite") so a mid-write
    retry of the SAME attempt is idempotent — but reusing a committed
    run_id against NEW input would overwrite the old run's spans with only
    the new docs while lineage still marks the old docs committed: silent
    permanent data loss. A committed run_id is therefore sealed."""
    if ckpt is None:
        return
    if not ckpt.where(F.col("run_id") == run_id).isEmpty():
        raise ValueError(
            f"run_id {run_id!r} already has committed lineage rows; "
            "each run (or retry of an uncommitted run) must reuse the id, "
            "but new work needs a fresh run_id"
        )


def _write_metrics(output_dir: str, run_id: str, metrics: dict) -> None:
    """Append one run's metrics rows (METRICS_SCHEMA layout) to
    ``{output_dir}/metrics`` as a single parquet part file written directly
    by the driver. The metrics are O(1) scalars per run and already live on
    the driver (``Observation.get``), so routing them through a Spark job
    is pure scheduling overhead (~0.4 s/run measured) for a 6-row write; a
    real cluster's driver does the same one-small-file put to object
    storage. Write-to-temp + rename keeps a crash from leaving a torn file
    that would poison later ``spark.read.parquet`` over the directory.

    The direct write requires a LOCAL output_dir (os.makedirs on
    's3a://bucket' would silently create a literal './s3a:/bucket' dir);
    any scheme other than file: routes through Spark's Hadoop-FS writer
    instead — the ~0.4 s of scheduling is the correct price for a
    filesystem the driver cannot os.replace() on."""
    rows = [(run_id, k, float(v if v is not None else 0)) for k, v in metrics.items()]
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://", output_dir)
    if m and m.group(1) != "file":
        spark = SparkSession.getActiveSession()
        spark.createDataFrame(
            rows, "run_id string, metric string, value double"
        ).coalesce(1).write.mode("append").parquet(
            os.path.join(output_dir, "metrics")
        )
        return
    import pyarrow as pa
    import pyarrow.parquet as pq
    table = pa.table(
        {
            "run_id": pa.array([r[0] for r in rows], pa.string()),
            "metric": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    metrics_dir = os.path.join(output_dir, "metrics")
    os.makedirs(metrics_dir, exist_ok=True)
    fname = f"part-{run_id}-{uuid.uuid4().hex}.parquet"
    final = os.path.join(metrics_dir, fname)
    # leading dot: Spark's FileIndex skips hidden files, so a crash that
    # orphans the temp never breaks later reads of the directory
    tmp = os.path.join(metrics_dir, "." + fname + ".tmp")
    pq.write_table(table, tmp, compression="zstd")
    os.replace(tmp, final)


def run_extraction_job(
    spark: SparkSession,
    input_path: str,
    output_dir: str,
    run_id: Optional[str] = None,
    partitions: int = 32,
    resume: bool = True,
    dedup: str = "narrow",
) -> dict:
    """Read a RAW_DOC parquet table, extract spans, write spans + checkpoint.

    Output layout (Iceberg-shaped parquet; catalog wiring is a config flag
    when an Iceberg runtime is present):
      {output_dir}/spans/run_id=<id>/   doc_id, spans (public contract),
                                        partition_id of the writing task
      {output_dir}/checkpoint/          CHECKPOINT_SCHEMA rows, one per doc
    Resumable: rerunning with the same output_dir first reconciles any
    crashed run (partial run dirs removed; durable-but-uncommitted runs
    adopted into lineage — never re-extracted, never duplicated), then
    anti-joins committed docs. If nothing is left to do the run directory
    is not touched (a retry after a successful commit must not erase it).
    """
    from pdf_extractor_spark.checkpoint import (
        read_checkpoint, reconcile_checkpoint, spans_run_path, write_checkpoint,
    )

    run_id = run_id or uuid.uuid4().hex
    docs = spark.read.parquet(input_path)
    t0 = time.time()
    ckpt = None
    if resume:
        reconcile_checkpoint(spark, output_dir)
        ckpt = read_checkpoint(spark, output_dir)
    if ckpt is not None:
        done = ckpt.where(F.col("status") == "committed").select("doc_id")
        todo = docs.join(done, "doc_id", "left_anti")
        if todo.isEmpty():
            return {
                "run_id": run_id, "docs": 0, "seconds": time.time() - t0,
                "docs_per_sec": 0.0, "metrics": {"docs": 0},
            }
        _guard_run_id_unused(ckpt, run_id)
    # spans-only job → push the public projection into the kernel (geometry
    # and full_text never cross Arrow; full_text is derivable from spans).
    result = extract_spans(
        docs, partitions=partitions, checkpoint=ckpt, dedup=dedup, columns="public"
    )
    out = lineage_projection(result)
    # A3/A5 run counters ride the job itself via observe() — no second pass
    # over the data (the reference increments its stats dict per doc,
    # extractor.py:59-66; here the executors aggregate for free).
    from pyspark.sql import Observation

    obs = Observation(f"extract_{run_id}")
    out = out.observe(
        obs,
        F.count(F.lit(1)).alias("docs"),
        F.sum("span_count").alias("spans"),
        F.sum(F.when(F.col("span_count") == 0, 1).otherwise(0)).alias("empty_docs"),
        # Identity-H runs without /ToUnicode surface as kind='unparsed'
        # spans (tokenizer.py IdentityCIDEncoding) — counted here so a
        # corpus owner sees how much content the text layer could not
        # recover instead of reading a silently smaller span count
        F.sum(
            F.size(F.filter("spans", lambda s: s["kind"] == F.lit("unparsed")))
        ).alias("unparsed_spans"),
        F.approx_count_distinct("content_hash").alias("approx_distinct"),
    )
    # overwrite makes a mid-write retry of the SAME run idempotent (partial
    # files from the failed attempt are replaced, not appended to)
    out.write.mode("overwrite").parquet(spans_run_path(output_dir, run_id))
    metrics = dict(obs.get)
    n_docs = write_checkpoint(spark, output_dir, run_id)
    elapsed = time.time() - t0
    _write_metrics(output_dir, run_id, metrics)
    return {
        "run_id": run_id,
        "docs": n_docs,
        "seconds": elapsed,
        "docs_per_sec": n_docs / elapsed if elapsed > 0 else 0.0,
        "metrics": metrics,
    }


def run_field_extraction_job(
    spark: SparkSession,
    input_path: str,
    output_dir: str,
    kb: Optional[DataFrame] = None,
    replay: Optional[dict] = None,
    run_id: Optional[str] = None,
    partitions: int = 32,
    resume: bool = True,
) -> dict:
    """The reference CLI end-to-end (`/root/reference/batch_extract.py` +
    the planner of `extractor.py:905-959`): labeled documents + KB →
    tokenize → three-way planner (bootstrap / whole-doc LLM / heuristics
    with adaptive repair) → results + updated KB + metrics, resumable.

    Output layout:
      {output_dir}/results/run_id=<id>/  doc_id, label, plan_branch,
                                         result map, LLM token/cost columns
      {output_dir}/kb/                   updated KB dim table (overwritten
                                         at job end — the reference's
                                         export_kb, batch_extract.py:196)
      {output_dir}/checkpoint/           shared lineage protocol
      {output_dir}/metrics/              A3 counters + F10 cost rows

    ``replay`` is the canned-LLM response table (extract.llm); None runs
    pure-deterministic (bootstraps learn from U6 only, failures stay null).
    """
    from pdf_extractor_spark.checkpoint import (
        read_checkpoint, reconcile_checkpoint, spans_run_path, write_checkpoint,
    )
    from pdf_extractor_spark.extract.llm import cost_summary
    from pdf_extractor_spark.extract.repair import extract_planned

    run_id = run_id or uuid.uuid4().hex
    t0 = time.time()
    docs = spark.read.parquet(input_path)
    ckpt = None
    if resume:
        reconcile_checkpoint(spark, output_dir, table="results")
        ckpt = read_checkpoint(spark, output_dir)
    if ckpt is not None:
        done = ckpt.where(F.col("status") == "committed").select("doc_id")
        docs = docs.join(done, "doc_id", "left_anti")
        if docs.isEmpty():
            return {"run_id": run_id, "docs": 0,
                    "seconds": time.time() - t0, "metrics": {}}
        _guard_run_id_unused(ckpt, run_id)
    if kb is None:
        kb = _read_kb_state(spark, output_dir)

    # persist the tokenized frame: the planner fans it into five consumers
    # (bootstrap window, post-bootstrap routing, heuristics, llm_full, the
    # content-hash join below) — without the cache every branch re-runs the
    # Arrow tokenize kernel; at larger scale swap for DISK_ONLY or a
    # spans-table checkpoint
    tokenized = tokenize_stage(with_content_hash(docs)).persist()
    caches: list = [tokenized]
    results, kb_out = extract_planned(tokenized, kb, replay or {}, caches=caches)
    hashes = tokenized.select("doc_id", "content_hash")
    out = (
        results.join(hashes, "doc_id")
        .withColumn(
            "span_count",  # lineage metric: # non-null extracted fields
            F.size(F.map_filter("result", lambda k, v: v.isNotNull())).cast("int"),
        )
        .withColumn("partition_id", F.spark_partition_id())
    )
    # KB state is written BEFORE the results run dir: reconcile_checkpoint
    # ADOPTS any _SUCCESS-complete run dir into lineage (the docs never
    # re-run), so a results-first ordering that crashed between the two
    # writes would commit the docs while dropping the bootstrap-learned and
    # repair-replaced rules forever. KB-first is safe on every window: a
    # crash after the swap but before the results write re-runs the batch
    # against the already-updated KB (idempotent — the repaired rules
    # re-derive to themselves).
    _swap_kb_state(spark, output_dir, kb_out)
    out.write.mode("overwrite").parquet(
        spans_run_path(output_dir, run_id, table="results")
    )
    n_docs = write_checkpoint(spark, output_dir, run_id, table="results")
    # results + KB + lineage are durable — release every frame the planner
    # pinned (tokenized plus the repair/bootstrap stage caches), so repeated
    # jobs in a long-lived session don't accrete storage memory
    for cached in caches:
        cached.unpersist()
    committed_results = spark.read.parquet(
        spans_run_path(output_dir, run_id, table="results")
    )

    # metrics: A3 counters + F10 cost columns in one append
    cost = cost_summary(committed_results).collect()[0].asDict()
    metrics = {
        "docs": float(n_docs),
        "fields_extracted": float(
            committed_results.agg(F.sum("span_count")).first()[0] or 0
        ),
        "llm_calls": float(cost["llm_calls"] or 0),
        "llm_failures": float(cost["llm_failures"] or 0),
        "llm_in_tokens": float(cost["llm_in_tokens"] or 0),
        "llm_out_tokens": float(cost["llm_out_tokens"] or 0),
        "llm_total_cost": float(cost["llm_total_cost"] or 0.0),
    }
    _write_metrics(output_dir, run_id, metrics)
    elapsed = time.time() - t0
    return {
        "run_id": run_id,
        "docs": n_docs,
        "seconds": elapsed,
        "docs_per_sec": n_docs / elapsed if elapsed > 0 else 0.0,
        "metrics": metrics,
    }
