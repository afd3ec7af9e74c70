"""Checkpoint / lineage protocol (north_rule resumability).

Spark restatement of the reference's resume journal
(`/root/reference/batch_extract.py:99-107,153-181`): instead of rewriting one
JSON file per document, every run appends its spans under its own partition
directory ``spans/run_id=<id>/`` and then commits idempotent lineage rows
keyed ``(run_id, partition_id, doc_id)``; a restart anti-joins committed
doc_ids.

Crash-window protocol (two non-atomic actions — spans commit, then lineage
commit — made safe):

* crash DURING the spans write → the run directory has no ``_SUCCESS``
  marker; :func:`reconcile_checkpoint` deletes the partial directory and the
  docs are re-extracted (they were never durable);
* crash BETWEEN spans commit and lineage commit → the run directory is
  complete but unreferenced; :func:`reconcile_checkpoint` adopts it by
  deriving its lineage rows from the committed files — the docs are NOT
  re-extracted and the spans table holds no duplicates;
* crash DURING the lineage commit (a multi-file parquet append is not
  atomic: some task files land, others do not) → the run has SOME
  committed rows; :func:`write_checkpoint` is idempotent (it anti-joins
  the run directory's doc_ids against the rows already in lineage), and
  :func:`reconcile_checkpoint` re-runs it for any committed run whose
  lineage row count trails its directory — the missing rows are appended,
  never the whole run twice;
* crash AFTER lineage commit → the resume anti-join sees the docs as
  committed; the job writes nothing new.

Per-commit cost is O(this run's output) — the previous protocol re-scanned
the entire spans table (all runs ever written) on every commit, which is
unbounded for a long-lived stream. The lineage ``partition_id`` is recorded
by the WRITING task (``spark_partition_id()`` evaluated inside the spans
write job), not re-derived at read time."""

from __future__ import annotations

import glob
import os
import shutil
from typing import List, Optional

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from pdf_extractor_spark.schema import CHECKPOINT_SCHEMA

CHECKPOINT_DIR = "checkpoint"
SPANS_DIR = "spans"


def checkpoint_path(output_dir: str) -> str:
    return os.path.join(output_dir, CHECKPOINT_DIR)


def spans_path(output_dir: str, table: str = SPANS_DIR) -> str:
    return os.path.join(output_dir, table)


def spans_run_path(output_dir: str, run_id: str, table: str = SPANS_DIR) -> str:
    return os.path.join(spans_path(output_dir, table), f"run_id={run_id}")


def read_checkpoint(spark: SparkSession, output_dir: str) -> Optional[DataFrame]:
    path = checkpoint_path(output_dir)
    # existence-check before handing the path to the JVM: a first run would
    # otherwise log a full PATH_NOT_FOUND stack trace from the catch-all
    if not os.path.isdir(path):
        return None
    try:
        return spark.read.schema(CHECKPOINT_SCHEMA).parquet(path)
    except Exception:
        return None


def write_checkpoint(
    spark: SparkSession, output_dir: str, run_id: str, table: str = SPANS_DIR
) -> int:
    """Commit lineage for ONE run by reading back its own partition
    directory (never the whole spans table). Idempotent: docs this run
    already committed are anti-joined away, so a retry — or a heal after a
    torn mid-append crash — appends only the missing rows.

    Reading the committed files (rather than trusting the in-flight
    DataFrame) makes the checkpoint reflect exactly what is durable — the
    property the reference gets by appending to its journal only after each
    document is written (batch_extract.py:176-181). ``byte_count`` is the
    serialized size of each doc's payload column (spans or result map) —
    the size-aware-scheduling input the lineage schema carries."""
    run_path = spans_run_path(output_dir, run_id, table)
    if not os.path.isdir(run_path):
        return 0
    written = spark.read.parquet(run_path)
    if "partition_id" not in written.columns:
        written = written.withColumn("partition_id", F.lit(-1))
    if "byte_count" in written.columns:
        # computed by the WRITING task in the same job as the spans write
        # (one to_json per doc, amortized into the write pass) — the commit
        # only reads the column back
        byte_count = F.col("byte_count").cast("long")
    else:
        payload = next(
            (c for c in ("spans", "result") if c in written.columns), None
        )
        byte_count = (
            F.octet_length(F.to_json(F.col(payload))).cast("long")
            if payload is not None
            else F.lit(0).cast("long")
        )
    lineage = written.select(
        F.lit(run_id).alias("run_id"),
        F.col("partition_id").cast("int").alias("partition_id"),
        F.col("doc_id"),
        F.col("content_hash"),
        F.lit("committed").alias("status"),
        F.col("span_count").cast("int").alias("span_count"),
        byte_count.alias("byte_count"),
        F.current_timestamp().alias("committed_at"),
    )
    already_n = 0
    ckpt = read_checkpoint(spark, output_dir)
    if ckpt is not None:
        already = ckpt.where(F.col("run_id") == run_id).select("doc_id")
        if not already.isEmpty():
            already_n = already.count()  # retry path only; ckpt is small
            lineage = lineage.join(already, "doc_id", "left_anti")
            if lineage.isEmpty():
                return spark.read.parquet(run_path).count()
    # the commit count rides the lineage write itself (observe) — the old
    # `read.parquet(run_path).count()` re-scanned the just-written output a
    # SECOND time purely to return a number; at production scale that is a
    # full extra pass over the run's output files
    obs = Observation(f"ckpt_{run_id}")
    lineage = lineage.observe(obs, F.count(F.lit(1)).alias("n"))
    # Lineage rows are ~1% the byte volume of the spans they describe, so a
    # task-per-spans-file write (the natural read-back partitioning) emits
    # tiny parquet files and pays ~n_files of task overhead for a near-empty
    # write. Coalesce to one lineage file per ~6 GB of spans (measured from
    # the run dir listing — no extra job): 1 file at bench scale, ~O(1000)
    # at 10^12 docs, and read_checkpoint scans proportionally fewer footers.
    # coalesce() inserts no shuffle — it collapses the UPSTREAM scan into
    # n_out tasks too — so it is applied only on the metadata-only path
    # (byte_count present: parquet column pruning means those tasks read a
    # few small columns, never the spans payload). The legacy fallback that
    # serializes every spans payload through to_json keeps its natural
    # partitioning: collapsing THAT into one task would single-thread a
    # multi-GB serialization pass.
    if "byte_count" in written.columns:
        try:
            spans_bytes = sum(
                e.stat().st_size for e in os.scandir(run_path) if e.is_file()
            )
            n_out = max(1, -(-spans_bytes // (6 << 30)))
            lineage = lineage.coalesce(int(n_out))
        except OSError:
            pass  # permission/race on the listing — keep natural partitioning
    lineage.write.mode("append").parquet(checkpoint_path(output_dir))
    return int(obs.get["n"]) + already_n


def _runs_on_disk(output_dir: str, table: str = SPANS_DIR) -> List[str]:
    return sorted(
        d.split("run_id=", 1)[1]
        for d in glob.glob(os.path.join(spans_path(output_dir, table), "run_id=*"))
        if os.path.isdir(d)
    )


def reconcile_checkpoint(
    spark: SparkSession,
    output_dir: str,
    table: str = SPANS_DIR,
    run_ids: Optional[List[str]] = None,
) -> List[str]:
    """Heal the two crash windows before a resume (see module docstring).

    Returns the run_ids whose durable-but-uncommitted spans were adopted
    into lineage. Partial (no ``_SUCCESS``) run directories are removed.

    ``run_ids`` restricts the sweep to the named runs: a long-lived stream
    reconciles everything ONCE at start, then only its current batch-run
    inside each trigger — sweeping every run dir per micro-batch is
    O(batches²) Spark jobs over the stream's lifetime."""
    adopted: List[str] = []
    runs = _runs_on_disk(output_dir, table)
    if run_ids is not None:
        wanted = set(run_ids)
        runs = [r for r in runs if r in wanted]
    if not runs:
        return adopted
    ckpt = read_checkpoint(spark, output_dir)
    # one aggregate over lineage (not a collect per run): run_id → committed
    # row count, to detect torn mid-append commits cheaply
    committed = (
        {
            r["run_id"]: r["n"]
            for r in ckpt.groupBy("run_id").agg(F.count("*").alias("n")).collect()
        }
        if ckpt is not None
        else {}
    )
    for rid in runs:
        run_path = spans_run_path(output_dir, rid, table)
        has_success = os.path.exists(os.path.join(run_path, "_SUCCESS"))
        if rid in committed:
            # torn lineage append (crash DURING the multi-file commit): the
            # run dir holds docs its lineage is missing — append exactly
            # those (write_checkpoint anti-joins), else a resume would
            # re-extract them under a new run_id and duplicate their rows.
            # Parquet metadata makes the directory count a footer read.
            if has_success and (
                spark.read.parquet(run_path).count() > committed[rid]
            ):
                write_checkpoint(spark, output_dir, rid, table)
                adopted.append(rid)
            continue
        if has_success:
            write_checkpoint(spark, output_dir, rid, table)
            adopted.append(rid)
        else:
            shutil.rmtree(run_path, ignore_errors=True)
    return adopted


def run_metrics(checkpoint: DataFrame) -> DataFrame:
    """A3/A5 analog: per-run counters from lineage (docs, spans, partitions)."""
    return checkpoint.groupBy("run_id").agg(
        F.count("*").alias("docs"),
        F.sum("span_count").alias("total_spans"),
        F.countDistinct("partition_id").alias("partitions"),
        F.min("committed_at").alias("started_at"),
        F.max("committed_at").alias("finished_at"),
    )
