#!/usr/bin/env python
"""Per-component wall-time profile of the curation record's stages at a
given corpus size — the tool behind the 400k-doc findings in
BENCH/BASELINE.md (langid explode-join anti-scaling, decontamination gram
allocation, and the integer-join-key rewrites). Each component is timed
cold (side-input memo reset before every measurement) with a noop write,
so the numbers compose the way the record's own stages do.

Usage:
  python tools/curation_profile.py [--cpus 32] [--n-docs 400000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--n-docs", type=int, default=400000)
    args = ap.parse_args()

    try:
        # script invocation (python tools/curation_profile.py): the script
        # dir is on sys.path
        from curation_scaling import ensure_corpus  # same corpus as the legs
    except ImportError:
        # module invocation (python -m tools.curation_profile) or import
        # from elsewhere: resolve via the repo root (ADVICE r4 #2)
        from tools.curation_scaling import ensure_corpus
    from pdf_extractor_spark.pipeline import build_session
    import pdf_extractor_spark.pipeline_queries as pq

    spark = build_session(
        master=f"local[{args.cpus}]", shuffle_partitions=args.cpus,
        app_name="curation-profile",
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = ensure_corpus(spark, args.n_docs)

    components = [
        ("text_quality", pq.text_quality),
        ("text_langid", pq.text_langid),
        ("corpus_split_sample", pq.corpus_split_sample),
        ("dedup_minhash_bands", pq.dedup_minhash_bands),
        ("dedup_clusters", pq.dedup_clusters),
        ("dedup_keep_list", pq.dedup_keep_list),
        ("corpus_decontaminate", pq.corpus_decontaminate),
        ("corpus_curation_record", pq.corpus_curation_record),
    ]
    out = {}
    for name, fn in components:
        best = None
        for _ in range(2):
            pq.reset_side_memo()
            spark.catalog.clearCache()
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        out[name] = round(best, 2)
        print(f"{name}: {out[name]}s", file=sys.stderr)
    print(json.dumps({"n_docs": args.n_docs, "cpus": args.cpus,
                      "components": out}))
    spark.stop()


if __name__ == "__main__":
    main()
