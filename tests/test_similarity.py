"""Similarity-search quality: the LSH-bucketed ANN path is *approximate* —
its contract is recall against the exact brute-force top-k, which the
sim_ann_lsh_topk docstring promises is asserted here."""

from __future__ import annotations

import pdf_extractor_spark.queries as q
import pdf_extractor_spark.pipeline_queries  # noqa: F401  (registers)

SF = "/root/testdata/sf0.01"


def test_lsh_recall_vs_bruteforce(spark):
    from pdf_extractor_spark.pipeline_queries import _lsh_topk

    exact = q.all_queries()["sim_topk_bruteforce"](spark, SF).collect()
    approx = _lsh_topk(spark, SF, 3).collect()
    truth = {(r["query_id"], r["neighbor_id"]) for r in exact}
    got = {(r["query_id"], r["neighbor_id"]) for r in approx}
    # single-table 8-bit LSH: recall over the shared query ids must be
    # well above random (top-3 of ~500 candidates ≈ 0.6% at random)
    shared_queries = {qid for qid, _ in truth} & {qid for qid, _ in got}
    assert shared_queries, "LSH produced no results for any exact query id"
    t = {p for p in truth if p[0] in shared_queries}
    g = {p for p in got if p[0] in shared_queries}
    recall = len(t & g) / len(t)
    assert recall >= 0.3, f"recall {recall:.2f} below floor"


def test_ann_recall_gate_rows(spark):
    """The registered ANN entries are now recall gates (r4 task #4): one
    frozen summary row each, recall_ok TRUE at the registered floors."""
    for name in ("sim_ann_lsh_topk", "sim_ann_ivf_topk"):
        rows = q.all_queries()[name](spark, SF).collect()
        assert len(rows) == 1, name
        r = rows[0]
        assert (r["n_queries"], r["k"], r["recall_ok"]) == (10, 10, True), (
            name, r,
        )


def test_bruteforce_topk_properties(spark):
    rows = q.all_queries()["sim_topk_bruteforce"](spark, SF).collect()
    by_query: dict = {}
    for r in rows:
        by_query.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_query.items():
        rs.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rs] == list(range(1, len(rs) + 1))
        cosines = [r["cos"] for r in rs]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r["neighbor_id"] != qid for r in rs)


def _clusters(pairs_df):
    from pdf_extractor_spark.pipeline_queries import _connected_components

    return {
        (r["id"], r["label"])
        for r in _connected_components(pairs_df, "va", "vb").collect()
    }


def test_lsh_pairs_reproduce_allpairs_clusters_on_corpus(spark):
    """The dedup_embedding_clusters scale path: LSH-bucketed candidate
    pairs must yield the SAME connected components as the exact all-pairs
    join on the test corpus at the registered (tables, bits). This is the
    empirical full-recall pin for the guard constants — see the
    EMB_ALLPAIRS_MAX derivation."""
    from pdf_extractor_spark.pipeline_queries import (
        EMB_DUP_COS, EMB_LSH_BITS, EMB_LSH_TABLES,
        _emb_pairs_allpairs, _emb_pairs_lsh,
    )
    from pdf_extractor_spark.queries import t

    e = t(spark, "/root/testdata/sf0.001", "embeddings")
    exact = _clusters(_emb_pairs_allpairs(e, EMB_DUP_COS))
    lsh = _clusters(_emb_pairs_lsh(e, EMB_DUP_COS, EMB_LSH_TABLES, EMB_LSH_BITS))
    assert lsh == exact


def test_lsh_pairs_subquadratic_in_clustered_regime(spark):
    """Where LSH actually earns its keep — clustered embeddings with a
    selective threshold (cos ≥ 0.9, real semantic-dedup regime): the
    bucketed candidates must reproduce the all-pairs clusters while
    generating a small fraction of the n²/2 candidate volume."""
    import numpy as np

    from pdf_extractor_spark.pipeline_queries import (
        _emb_pairs_allpairs, _emb_pairs_lsh,
    )

    rng = np.random.default_rng(7)
    dim, n_clusters, members = 16, 40, 4
    rows = []
    vid = 0
    for _ in range(n_clusters):
        base = rng.normal(size=dim)
        base /= np.linalg.norm(base)
        for _ in range(members):
            v = base + rng.normal(scale=0.03, size=dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    exact_pairs = _emb_pairs_allpairs(e, 0.9)
    lsh_pairs = _emb_pairs_lsh(e, 0.9, tables=8, bits=6)
    assert _clusters(lsh_pairs) == _clusters(exact_pairs)

    # selectivity: candidate volume (pre-cosine-check, distinct) ≪ n²/2
    from pdf_extractor_spark.pipeline_queries import _lsh_code
    coded = e.selectExpr("vec_id").count()
    n_all = coded * (coded - 1) // 2
    n_cand = _emb_pairs_lsh(e, -1.0, tables=8, bits=6).count()  # keep all
    assert n_cand < 0.2 * n_all, f"{n_cand} candidates vs {n_all} all-pairs"


def test_ivf_recall_vs_bruteforce(spark):
    from pdf_extractor_spark.pipeline_queries import _ivf_topk

    exact = q.all_queries()["sim_topk_bruteforce"](spark, SF).collect()
    approx = _ivf_topk(spark, SF, 3).collect()
    truth = {(r["query_id"], r["neighbor_id"]) for r in exact}
    got = {(r["query_id"], r["neighbor_id"]) for r in approx}
    shared = {qid for qid, _ in truth} & {qid for qid, _ in got}
    t = {p for p in truth if p[0] in shared}
    g = {p for p in got if p[0] in shared}
    recall = len(t & g) / len(t)
    # nprobe=2 of 16 clusters probes ~12% of the corpus; measured 0.87
    assert recall >= 0.6, f"IVF recall {recall:.2f} below floor"
