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
