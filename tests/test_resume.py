"""Resume idempotency: a job killed after committing part of the corpus
resumes exactly where it stopped — no missing docs, no duplicates, outputs
identical to a never-interrupted run (north_rule; SURVEY.md §5.3,
batch_extract.py:99-107 semantics)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pdf_extractor_spark.corpus import generate_corpus
from pdf_extractor_spark.pipeline import run_extraction_job


def _span_fingerprint(spark, out_dir):
    return {
        (r["doc_id"], r["fp"])
        for r in spark.read.parquet(os.path.join(out_dir, "spans"))
        .select("doc_id", F.md5(F.to_json("spans")).alias("fp"))
        .collect()
    }


def test_partial_run_then_resume_equals_clean_run(spark, tmp_path):
    docs_path = str(tmp_path / "docs")
    generate_corpus(spark, 60, partitions=4).write.parquet(docs_path)

    # clean uninterrupted run
    clean_dir = str(tmp_path / "clean")
    stats = run_extraction_job(spark, docs_path, clean_dir, run_id="c", partitions=4)
    assert stats["docs"] == 60

    # "killed" run: only the first half of the corpus got processed and
    # committed before the job died
    killed_dir = str(tmp_path / "killed")
    half = spark.read.parquet(docs_path).where(F.col("doc_id") < "doc_000000030")
    half_path = str(tmp_path / "half")
    half.write.parquet(half_path)
    s1 = run_extraction_job(spark, half_path, killed_dir, run_id="k1", partitions=4)
    assert s1["docs"] == 30

    # restart against the FULL input with the same output dir → exactly the
    # missing half is processed
    s2 = run_extraction_job(spark, docs_path, killed_dir, run_id="k2", partitions=4)
    assert s2["docs"] == 30

    # identical durable output, no duplicates
    assert _span_fingerprint(spark, killed_dir) == _span_fingerprint(spark, clean_dir)
    assert spark.read.parquet(os.path.join(killed_dir, "spans")).count() == 60

    # a third restart is a no-op
    s3 = run_extraction_job(spark, docs_path, killed_dir, run_id="k3", partitions=4)
    assert s3["docs"] == 0


def test_crash_between_spans_and_checkpoint_reconciles(spark, tmp_path):
    """The at-least-once crash window: spans durably committed, lineage
    never written. The resume must ADOPT the orphaned run (no
    re-extraction, no duplicate doc_ids), not redo it."""
    import shutil

    from pdf_extractor_spark.checkpoint import checkpoint_path, read_checkpoint

    docs_path = str(tmp_path / "docs")
    generate_corpus(spark, 40, partitions=4).write.parquet(docs_path)
    out_dir = str(tmp_path / "out")
    run_extraction_job(spark, docs_path, out_dir, run_id="r1", partitions=4)

    # simulate the crash: spans/run_id=r1 is durable, lineage vanished
    shutil.rmtree(checkpoint_path(out_dir))

    s2 = run_extraction_job(spark, docs_path, out_dir, run_id="r2", partitions=4)
    assert s2["docs"] == 0  # adopted, not re-extracted
    spans = spark.read.parquet(os.path.join(out_dir, "spans"))
    assert spans.count() == 40
    assert spans.select("doc_id").distinct().count() == 40  # no duplicates
    ckpt = read_checkpoint(spark, out_dir)
    assert ckpt.where(F.col("status") == "committed").count() == 40
    # lineage partition ids are the writing tasks', not a reader artifact
    assert ckpt.where(F.col("partition_id") >= 0).count() == 40
    # byte_count carries the real serialized span payload size per doc
    # (the size-aware-scheduling input), not a placeholder zero
    assert ckpt.where(F.col("byte_count") > 0).count() == 40


def test_torn_lineage_append_healed(spark, tmp_path):
    """Crash DURING the lineage parquet append (multi-file, non-atomic):
    some rows of the run committed, the rest not. The resume must append
    exactly the missing lineage rows from the durable run directory — not
    skip the run (leaving docs to be re-extracted and duplicated under a
    new run_id) and not double-append the committed rows."""
    import shutil

    from pdf_extractor_spark.checkpoint import checkpoint_path, read_checkpoint

    docs_path = str(tmp_path / "docs")
    generate_corpus(spark, 40, partitions=4).write.parquet(docs_path)
    out_dir = str(tmp_path / "out")
    run_extraction_job(spark, docs_path, out_dir, run_id="r1", partitions=4)

    # simulate the torn append: keep only 25 of r1's 40 lineage rows
    ckpt_dir = checkpoint_path(out_dir)
    kept = (
        read_checkpoint(spark, out_dir)
        .where(F.col("doc_id") < "doc_000000025")
        .toPandas()
    )
    assert len(kept) == 25
    shutil.rmtree(ckpt_dir)
    from pdf_extractor_spark.schema import CHECKPOINT_SCHEMA

    spark.createDataFrame(kept, CHECKPOINT_SCHEMA).write.parquet(ckpt_dir)

    s2 = run_extraction_job(spark, docs_path, out_dir, run_id="r2", partitions=4)
    assert s2["docs"] == 0  # healed + adopted, nothing re-extracted
    assert not os.path.isdir(os.path.join(out_dir, "spans", "run_id=r2"))
    ckpt = read_checkpoint(spark, out_dir)
    assert ckpt.count() == 40  # 25 kept + exactly the 15 missing
    assert ckpt.select("doc_id").distinct().count() == 40
    assert ckpt.select("run_id").distinct().collect()[0]["run_id"] == "r1"
    spans = spark.read.parquet(os.path.join(out_dir, "spans"))
    assert spans.count() == 40
    assert spans.select("doc_id").distinct().count() == 40


def test_write_checkpoint_idempotent(spark, tmp_path):
    """A retried lineage commit for an already-committed run appends
    nothing (the at-least-once window of foreachBatch retries)."""
    from pdf_extractor_spark.checkpoint import read_checkpoint, write_checkpoint

    docs_path = str(tmp_path / "docs")
    generate_corpus(spark, 20, partitions=2).write.parquet(docs_path)
    out_dir = str(tmp_path / "out")
    run_extraction_job(spark, docs_path, out_dir, run_id="r1", partitions=2)
    assert read_checkpoint(spark, out_dir).count() == 20

    n = write_checkpoint(spark, out_dir, "r1")  # retry of the commit
    assert n == 20
    ckpt = read_checkpoint(spark, out_dir)
    assert ckpt.count() == 20  # no duplicate rows
    assert ckpt.select("doc_id").distinct().count() == 20


def test_partial_spans_write_cleaned_and_redone(spark, tmp_path):
    """A run directory without _SUCCESS (killed mid-write) is junk: the
    resume removes it and re-extracts its docs cleanly."""
    docs_path = str(tmp_path / "docs")
    generate_corpus(spark, 20, partitions=2).write.parquet(docs_path)
    out_dir = str(tmp_path / "out")

    # fabricate a partial run dir: parquet files present, no _SUCCESS
    partial = os.path.join(out_dir, "spans", "run_id=dead")
    scratch = str(tmp_path / "scratch")
    os.makedirs(partial)
    spark.range(3).write.mode("overwrite").parquet(scratch)
    for f in os.listdir(scratch):
        if f.endswith(".parquet"):
            os.rename(os.path.join(scratch, f), os.path.join(partial, f))

    s = run_extraction_job(spark, docs_path, out_dir, run_id="r1", partitions=2)
    assert s["docs"] == 20
    assert not os.path.isdir(partial)  # junk removed
    spans = spark.read.parquet(os.path.join(out_dir, "spans"))
    assert spans.count() == 20
    assert spans.select("doc_id").distinct().count() == 20


def test_unparsed_span_metric_counts_identity_h_runs(spark, tmp_path):
    """A Type0 Identity-H font without /ToUnicode yields a typed
    kind='unparsed' span; the job's observed metrics must surface the
    count (observability for how much content the text layer could not
    recover)."""
    from pdf_extractor_spark.schema import RAW_DOC_SCHEMA
    from tests.test_tokenizer_constructs import _pdf_with_font

    font = (b"10 0 obj << /Type/Font /Subtype/Type0 /BaseFont/EEEEEE+Sub "
            b"/Encoding/Identity-H >> endobj")
    ops = b"BT /F1 10 Tf 1 0 0 1 50 700 Tm <00030004000500050007> Tj ET"
    pdf = _pdf_with_font(ops, [font], b"/F1 10 0 R")
    rows = [("idh_doc", pdf, "application/pdf", "x", {}, len(pdf))]
    docs_path = str(tmp_path / "docs")
    spark.createDataFrame(rows, RAW_DOC_SCHEMA).write.parquet(docs_path)
    out_dir = str(tmp_path / "out")
    stats = run_extraction_job(spark, docs_path, out_dir, run_id="u", partitions=2)
    assert stats["metrics"]["unparsed_spans"] == 1


def test_general_corpus_docs_flow_through_distributed_pipeline(spark, tmp_path):
    """r5 tokenizer additions under the DISTRIBUTED pipeline (not just the
    unit kernel): a CJK predefined-UCS2-CMap PDF, an encrypted PDF and a
    plain doc run through run_extraction_job together — the CJK text
    decodes, the encrypted doc surfaces as exactly one typed unparsed
    span, and nothing is dropped."""
    from pyspark.sql import functions as F

    from pdf_extractor_spark.schema import RAW_DOC_SCHEMA
    from tests.test_tokenizer_constructs import (
        _encrypted_pdf, _pdf, _pdf_with_font, BASIC,
    )

    cjk_font = (b"10 0 obj << /Type/Font /Subtype/Type0 /BaseFont/STSong "
                b"/Encoding/UniGB-UCS2-H >> endobj")
    cjk_ops = b"BT /F1 10 Tf 1 0 0 1 50 700 Tm <4F60597D> Tj ET"
    rows = [
        ("cjk.pdf", _pdf_with_font(cjk_ops, [cjk_font], b"/F1 10 0 R"),
         "application/pdf", "t", {}, 1),
        ("enc.pdf", _encrypted_pdf(), "application/pdf", "t", {}, 1),
        ("plain.pdf", _pdf(BASIC), "application/pdf", "t", {}, 1),
    ]
    docs_dir = str(tmp_path / "docs")
    out_dir = str(tmp_path / "out")
    spark.createDataFrame(rows, RAW_DOC_SCHEMA).write.parquet(docs_dir)
    stats = run_extraction_job(spark, docs_dir, out_dir, run_id="g", partitions=2)
    assert stats["docs"] == 3
    spans = spark.read.parquet(os.path.join(out_dir, "spans"))
    got = {
        r["doc_id"]: r
        for r in spans.select(
            "doc_id", "span_count",
            F.expr("filter(spans, s -> s.kind = 'unparsed')").alias("unp"),
            F.expr("transform(spans, s -> s.text)").alias("texts"),
        ).collect()
    }
    assert "你好" in "".join(got["cjk.pdf"]["texts"])
    assert got["enc.pdf"]["span_count"] == 1 and len(got["enc.pdf"]["unp"]) == 1
    assert any("hello" in t for t in got["plain.pdf"]["texts"])
