#!/usr/bin/env bash
# Package the engine and submit the extraction job the way a real cluster
# runs it (north_rule: spark-submit --py-files, N and 4N executors).
#
#   MASTER=local[8]  tools/submit_extraction.sh <input_parquet> <output_dir>
#   MASTER=spark://host:7077 EXECUTOR_CONF="--num-executors 32 ..." \
#     tools/submit_extraction.sh <input> <output>
#
# Local mode maps executor memory/GC onto the driver JVM; on a real cluster
# swap the driver confs for spark.executor.memory / executor.extraJavaOptions.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="${MASTER:-local[32]}"
INPUT="${1:?input parquet path}"
OUTPUT="${2:?output dir}"
shift 2

cd "$REPO"
rm -f /tmp/engine.zip
zip -qr /tmp/engine.zip pdf_extractor_spark -x '*__pycache__*'

exec spark-submit \
  --master "$MASTER" \
  --py-files /tmp/engine.zip \
  --conf spark.driver.memory=8g \
  --conf spark.driver.extraJavaOptions=-XX:+UseZGC \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.parquet.columnarReaderBatchSize=128 \
  ${EXECUTOR_CONF:-} \
  tools/run_job.py "$INPUT" "$OUTPUT" "$@"
