"""Synthetic corpus generator: determinism, duplicates, skew, and
tokenizability of both document kinds (bench.py's input contract)."""

from __future__ import annotations

from pdf_extractor_spark.corpus import _doc_for_index, generate_corpus
from pdf_extractor_spark.tokenize_dispatch import tokenize_any


def test_generator_deterministic():
    a = _doc_for_index(7, 1000, 0.1, 0.01)
    b = _doc_for_index(7, 1000, 0.1, 0.01)
    assert a == b


def test_duplicate_zone_replays_earlier_doc():
    dup = _doc_for_index(950, 1000, 0.1, 0.01)
    originals = {_doc_for_index(i, 1000, 0.1, 0.01)[1] for i in range(900)}
    assert dup[1] in originals


def test_skew_docs_are_megabyte_class():
    sizes = [
        _doc_for_index(i, 100, 0.0, 1.0)[5]
        for i in range(20)
        if _doc_for_index(i, 100, 0.0, 1.0)[2] == "application/pdf"
    ]
    assert sizes and max(sizes) > 256 * 1024


def test_both_kinds_tokenize():
    seen = set()
    for i in range(40):
        row = _doc_for_index(i, 1000, 0.0, 0.0)
        tok = tokenize_any(row[1])
        assert tok["spans"], f"doc {i} produced no spans"
        seen.add(row[2])
    assert seen == {"application/pdf", "text/html"}


def test_spark_generation_schema_and_count(spark):
    df = generate_corpus(spark, 120, partitions=4)
    rows = df.collect()
    assert len(rows) == 120
    assert set(df.columns) == {
        "doc_id", "content", "content_type", "label",
        "extraction_schema", "size_bytes",
    }
    r = rows[0]
    assert r["size_bytes"] == len(r["content"])


def test_frame_sample_fanout(spark):
    """mm UDTF arithmetic: n_frames = len(blob) % 7 + 1, stride 2 →
    ceil(n_frames / 2) rows per doc."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pdf_extractor_spark.multimodal import sample_frames

    pdf = pd.DataFrame({
        "doc_id": [f"d{i}" for i in range(10)],
        "blob": [bytes(range(i % 23)) for i in range(10)],
    })
    sdf = spark.createDataFrame(pdf)
    out = sample_frames(sdf).groupBy("doc_id").count().collect()
    got = {r["doc_id"]: r["count"] for r in out}
    want = {
        f"d{i}": -(-((i % 23) % 7 + 1) // 2)  # ceil(n_frames / 2)
        for i in range(10)
    }
    assert got == want


def test_spark_path_equals_local_kernel(spark):
    """Distributed extract_spans output is span-for-span identical to the
    kernel run locally on the same bytes (SURVEY.md §5.4 spot check) —
    covers PDF, HTML, and duplicate docs through the real Spark path."""
    from pdf_extractor_spark.pipeline import extract_spans
    from pdf_extractor_spark.tokenize_dispatch import assemble_doc, tokenize_any

    docs = generate_corpus(spark, 50, partitions=4, dup_frac=0.2)
    got = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                      for s in r["spans"]]
        for r in extract_spans(docs, partitions=4, columns="public")
        .select("doc_id", "spans").collect()
    }
    local = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in assemble_doc(tokenize_any(bytes(r["content"])))["spans"]
        ]
        for r in docs.collect()
    }
    assert got == local


def test_wide_dedup_path_equals_narrow(spark):
    """The dedup cost-model switch must be semantics-free: the wide path
    (groupBy(content_hash) -> tokenize once per distinct -> explode the
    doc_id list back) yields exactly the narrow path's spans for every
    doc_id on a duplicate-heavy corpus."""
    from pdf_extractor_spark.pipeline import extract_spans

    docs = generate_corpus(spark, 60, partitions=4, dup_frac=0.3)

    def spans_of(dedup):
        return {
            r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                          for s in r["spans"]]
            for r in extract_spans(docs, partitions=4, columns="public",
                                   dedup=dedup)
            .select("doc_id", "spans").collect()
        }

    narrow = spans_of("narrow")
    wide = spans_of("wide")
    assert wide == narrow
    assert len(wide) == 60
