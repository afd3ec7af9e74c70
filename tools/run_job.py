#!/usr/bin/env python
"""spark-submit entry point for the extraction job.

Submitted by tools/submit_extraction.sh with the engine shipped via
``--py-files engine.zip`` — the cluster deployment shape the north_rule
specifies (the same job bench.py drives in-process). Resumable: re-submit
with the same output dir to continue after a kill.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("input", help="RAW_DOC parquet path")
    ap.add_argument("output", help="output dir (spans/ + checkpoint/)")
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--dedup", choices=["narrow", "wide"], default="narrow")
    args = ap.parse_args()

    # spark-submit owns master/memory/conf; build_session is for in-process use
    spark = SparkSession.builder.appName("pdf_extractor_spark.extract").getOrCreate()
    from pdf_extractor_spark.pipeline import run_extraction_job

    stats = run_extraction_job(
        spark,
        args.input,
        args.output,
        run_id=args.run_id,
        partitions=args.partitions,
        resume=not args.no_resume,
        dedup=args.dedup,
    )
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
