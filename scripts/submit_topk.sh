#!/usr/bin/env bash
# Package mgspark and run the distributed heavy-hitters job via
# spark-submit --py-files (north_star contract).  Works against any
# Spark master; defaults to local[32] in this sandbox.
#
# Usage: scripts/submit_topk.sh <k> <epsilon> <delta> <parquet path> <column> [checkpoint dir]
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MASTER="${SPARK_MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}"
ZIP="$(mktemp -d)/mgspark.zip"
(cd "$REPO" && zip -qr "$ZIP" mgspark -x '*__pycache__*')
exec spark-submit \
  --master "$MASTER" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.execution.arrow.maxRecordsPerBatch=262144 \
  --py-files "$ZIP" \
  "$REPO/scripts/topk_job.py" "$@"
