"""Corpus-curation operators: split assignment, repetition signals, PII
scrub, and the per-cluster keep decision.

These are behavioral tests on small adversarial corpora; bit-level parity
with the SQL oracles is covered by the registry harness
(tools/check_oracles.py / the driver's CORRECTNESS gate)."""

from __future__ import annotations

from tests.test_dedup import _write_documents


def test_split_assign_deterministic_and_proportioned(spark, sf_dir):
    from pdf_extractor_spark.pipeline_queries import corpus_split_assign

    a = {r["doc_id"]: r["split"] for r in corpus_split_assign(spark, sf_dir).collect()}
    b = {r["doc_id"]: r["split"] for r in corpus_split_assign(spark, sf_dir).collect()}
    assert a == b  # key-hash based: stable across runs
    n = len(a)
    frac = {s: sum(1 for v in a.values() if v == s) / n for s in ("train", "val", "test")}
    # md5 buckets at n=50 (sf0.001) wobble; just pin the ordering + bounds
    assert frac["train"] > 0.6
    assert 0.0 < frac["val"] < 0.3 and 0.0 < frac["test"] < 0.3


def test_repetition_ratios_exact(spark, tmp_path):
    from pdf_extractor_spark.pipeline_queries import text_repetition

    sf = _write_documents(spark, tmp_path, ["a a a a b", "x y z w"])
    rows = {r["doc_id"]: r for r in text_repetition(spark, sf).collect()}
    r0 = rows[0]
    assert (r0["n_words"], r0["n_distinct"]) == (5, 2)
    assert abs(r0["distinct_ratio"] - 0.4) < 1e-9
    assert abs(r0["top_word_ratio"] - 0.8) < 1e-9
    r1 = rows[1]
    assert r1["distinct_ratio"] == 1.0 and r1["top_word_ratio"] == 0.25


def test_pii_scrub_redacts_embedded_and_counts(spark, tmp_path):
    from pdf_extractor_spark.pipeline_queries import text_pii_scrub

    sf = _write_documents(
        spark,
        tmp_path,
        ["mail me at alice.smith@corp.example.org or 192.168.10.17 tel 212-555-0147",
         "no personal data here"],
    )
    rows = {r["doc_id"]: r for r in text_pii_scrub(spark, sf).collect()}
    s0 = rows[0]["scrubbed"]
    assert "alice.smith" not in s0 and "192.168.10.17" not in s0
    assert "212-555-0147" not in s0
    assert "<EMAIL>" in s0 and "<IP>" in s0 and "<PHONE>" in s0
    # 3 embedded + 3 appended (the deterministic oracle tail)
    assert rows[0]["n_pii"] == 6
    assert rows[1]["n_pii"] == 3  # appended tail only


def test_keep_list_one_canonical_per_cluster(spark, tmp_path):
    from pdf_extractor_spark.pipeline_queries import dedup_keep_list

    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the green hills beyond the river bend tonight")
    texts = [base, base + " extra trailing words here", base + " x"]
    texts += [f"unrelated{i} solo{i} document{i} tokens{i} only{i} " * 5 for i in range(3, 8)]
    sf = _write_documents(spark, tmp_path, texts)
    rows = dedup_keep_list(spark, sf).collect()
    assert {r["doc_id"] for r in rows} == set(range(8))  # total coverage
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for members in by_cluster.values():
        assert sum(m["keep"] for m in members) == 1  # exactly one canonical
    dup_cluster = [c for c, ms in by_cluster.items() if len(ms) > 1]
    assert dup_cluster, "near-identical docs must cluster together"
    members = by_cluster[dup_cluster[0]]
    kept = [m for m in members if m["keep"]][0]
    longest = max(members, key=lambda m: len(texts[m["doc_id"]]))
    assert kept["doc_id"] == longest["doc_id"]  # longest text wins
