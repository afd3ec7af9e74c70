#!/usr/bin/env python
"""Regenerate pdf_extractor_spark/extraction_golden.py after an INTENTIONAL
tokenizer/corpus change. The frozen hashes are the s1_extract_spans oracle —
only regenerate when the span contract is supposed to have changed, and
re-run the goldens + oracle sweep afterwards."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from pdf_extractor_spark.extraction_queries import s1_extract_spans
    from pdf_extractor_spark.pipeline import build_session

    spark = build_session(master="local[8]", shuffle_partitions=8,
                          app_name="regen-s1-golden")
    spark.sparkContext.setLogLevel("ERROR")
    rows = s1_extract_spans(spark, None).collect()
    out = os.path.join(REPO, "pdf_extractor_spark", "extraction_golden.py")
    with open(out, "w") as f:
        f.write(
            '"""Frozen golden output of the deterministic S1 flagship query.\n'
            "\n"
            "The corpus (corpus.generate_corpus, seed-fixed) and the tokenizer are\n"
            "both deterministic, so the 200 per-doc span-sequence hashes are\n"
            "constants — embedding them as an inline-VALUES DuckDB oracle puts the\n"
            "flagship kernel under the driver's full hash gate instead of a\n"
            "rows-only check. Regenerate after an intentional kernel/corpus change:\n"
            "\n"
            "    python tools/regen_s1_golden.py\n"
            '"""\n\nS1_GOLDEN = [\n'
        )
        for r in rows:
            f.write(
                f'    ("{r["doc_id"]}", {r["span_count"]}, '
                f'"{r["span_seq_hash"]}"),\n'
            )
        f.write("]\n")
    print(f"wrote {len(rows)} rows to {out}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
