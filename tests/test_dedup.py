"""Dedup operator behavior on adversarial corpora.

The ngram-Jaccard document-frequency cap: on natural text, stop-bigrams
("of the") put a huge fraction of documents into one gram bucket and drive
the inverted-index join toward n². The cap must (a) bound candidate pair
counts on a stop-bigram-heavy corpus and (b) still find real near-dups
through their rare grams."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pdf_extractor_spark.pipeline_queries import (
    NGRAM_HOT_DF_FLOOR, dedup_ngram_jaccard,
)


def _write_documents(spark, tmp_path, texts):
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir, exist_ok=True)
    rows = [(i, t, "en", "test", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(sf_dir, "documents.parquet"))
    return sf_dir


def test_hot_grams_do_not_generate_candidates(spark, tmp_path):
    """200 docs ALL sharing the stop-bigram run 'of the' but otherwise
    unique: without the df cap the gram join would emit ~200²/2 ≈ 20k
    candidate pairs from the hot bucket alone; with it, zero pairs reach
    the Jaccard stage (no shared rare grams)."""
    n = 200
    texts = [f"word{i}a word{i}b of the word{i}c word{i}d" for i in range(n)]
    sf_dir = _write_documents(spark, tmp_path, texts)
    assert n * 0.1 > NGRAM_HOT_DF_FLOOR  # the fractional cap is the binding one
    out = dedup_ngram_jaccard(spark, sf_dir)
    assert out.count() == 0


def test_real_duplicates_survive_the_cap(spark, tmp_path):
    """An exact duplicate pair shares all its rare grams → Jaccard 1.0,
    found despite every doc also carrying the hot stop-bigrams."""
    n = 150
    texts = [f"alpha{i} beta{i} of the gamma{i} delta{i}" for i in range(n)]
    texts.append(texts[7])  # doc 150 duplicates doc 7
    sf_dir = _write_documents(spark, tmp_path, texts)
    rows = dedup_ngram_jaccard(spark, sf_dir).collect()
    assert [(r["doc_a"], r["doc_b"], r["jaccard"]) for r in rows] == [(7, 150, 1.0)]


def test_candidate_join_is_bounded(spark, tmp_path):
    """Direct bound check: with the cap, every gram bucket is ≤ max(0.1·n,
    floor) docs, so candidate pairs ≤ Σ df² — polynomially below n² even
    when every doc shares phrases with 30% of the corpus."""
    n = 120
    texts = []
    for i in range(n):
        shared = f"common{i % 3} phrase{i % 3}"  # df = n/3 = 40 > cap (12)
        texts.append(f"{shared} unique{i}x unique{i}y")
    sf_dir = _write_documents(spark, tmp_path, texts)
    out = dedup_ngram_jaccard(spark, sf_dir)
    # the shared grams (df=40 > 12) are dropped; the unique grams pair no
    # documents → no candidates at all
    assert out.count() == 0


def test_winnow_pairs_find_copied_passage(spark, tmp_path):
    """A copied passage (≥ k+w−1 chars) with DIFFERENT surrounding text on
    each side must pair via shared winnowing fingerprints — the
    position-robust case word-shingle schemes miss when edits shift
    offsets. Unrelated docs must not pair."""
    from pdf_extractor_spark.pipeline_queries import (
        WINNOW_PAIR_MIN_SHARED, dedup_winnow_pairs,
    )

    passage = "the quick brown fox jumps over the lazy dog again and again"
    texts = [f"prefix{i}pad {passage} suffix{i}tail" for i in range(2)]
    # filler docs with no shared substrings of fingerprint length
    texts += [f"zq{i}x" * 30 for i in range(2, 14)]
    sf_dir = _write_documents(spark, tmp_path, texts)
    rows = dedup_winnow_pairs(spark, sf_dir).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in rows}
    assert (0, 1) in pairs
    assert all(p == (0, 1) for p in pairs)
    shared = {(r["doc_a"], r["doc_b"]): r["n_shared"] for r in rows}
    assert shared[(0, 1)] >= WINNOW_PAIR_MIN_SHARED


def test_winnow_pairs_hot_fingerprints_capped(spark, tmp_path):
    """Boilerplate shared by ALL docs (df > max(10% n, floor)) is removed
    before the self-join: 120 docs sharing one long boilerplate sentence
    but otherwise unique must produce zero pairs."""
    from pdf_extractor_spark.pipeline_queries import dedup_winnow_pairs

    boiler = "this document is confidential and proprietary to the company"
    n = 120
    texts = [f"u{i}a{i}b{i}c{i} {boiler} z{i}y{i}x{i}w{i}" for i in range(n)]
    sf_dir = _write_documents(spark, tmp_path, texts)
    assert dedup_winnow_pairs(spark, sf_dir).count() == 0

def _label_set(df):
    return {(r["id"], r["label"]) for r in df.collect()}


def test_star_cc_equals_propagation_on_random_graph(spark, monkeypatch):
    """All three component paths — driver union-find (small-graph fast
    path), min-label propagation, large-star/small-star — must compute the
    same (node -> component min) map on an arbitrary undirected graph."""
    import random

    import pdf_extractor_spark.pipeline_queries as pq

    rng = random.Random(11)
    edges = [(rng.randrange(120), rng.randrange(120)) for _ in range(90)]
    edges = [(a, b) for a, b in edges if a != b]
    # self-loop-only nodes: every path must emit them labeled themselves
    # (the star rounds drop u == v edges, so this pins the domain repair)
    edges += [(500, 500), (501, 501)]
    pairs = spark.createDataFrame(edges, "a long, b long")
    driver = _label_set(pq._connected_components(pairs, "a", "b"))
    monkeypatch.setattr(pq, "_CC_DRIVER_EDGE_LIMIT", 0)  # force distributed
    prop = _label_set(pq._connected_components(pairs, "a", "b"))
    star = _label_set(pq._connected_components_star(pairs, "a", "b"))
    assert {(500, 500), (501, 501)} <= driver
    assert star == prop == driver


def test_star_cc_chain_and_dispatch(spark, monkeypatch):
    """A 60-node chain (diameter 59) exceeds the propagation round cap, so
    _connected_components (forced past the driver fast path) must dispatch
    to the star algorithm and still return the exact fixpoint: every node
    labeled 0. The driver path must agree."""
    import pdf_extractor_spark.pipeline_queries as pq

    n = 60
    assert n - 1 > pq._PROP_ROUND_LIMIT
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a long, b long"
    )
    want = {(i, 0) for i in range(n)}
    assert _label_set(pq._connected_components(pairs, "a", "b")) == want
    monkeypatch.setattr(pq, "_CC_DRIVER_EDGE_LIMIT", 0)  # force distributed
    assert _label_set(pq._connected_components_star(pairs, "a", "b")) == want
    assert _label_set(pq._connected_components(pairs, "a", "b")) == want


def test_standalone_signatures_agree_with_fused_entry(spark, sf_dir):
    """The fused dedup_signatures (one explode, one agg) must equal the
    composition of the standalone MinHash and SimHash builders joined on
    doc_id — the Spark-side counterpart of the oracle's two-CTE form, and
    the proof that permutation mins really are duplicate-invariant."""
    import pdf_extractor_spark.pipeline_queries as pq

    fused = {tuple(r) for r in pq.dedup_signatures(spark, sf_dir).collect()}
    composed = {
        tuple(r)
        for r in pq._minhash_signature_df(spark, sf_dir)
        .join(pq._simhash_df(spark, sf_dir), "doc_id")
        .collect()
    }
    assert fused == composed
