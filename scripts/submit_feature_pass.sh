#!/usr/bin/env bash
# Cluster-ready launch: the flagship resumable feature pass via
# spark-submit --py-files (north rule packaging). On a real cluster swap
# --master for yarn/k8s and size executors; the job code is identical.
#
# Usage: scripts/submit_feature_pass.sh INPUT OUTPUT CHECKPOINT [MASTER] [extra args...]
set -euo pipefail

REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
INPUT="${1:?input path}"; OUTPUT="${2:?output path}"; CKPT="${3:?checkpoint path}"
MASTER="${4:-local[8]}"
shift $(( $# > 4 ? 4 : $# ))

python "$REPO/scripts/build_pyfiles.py" >/dev/null

exec spark-submit \
  --master "$MASTER" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  --py-files "$REPO/dist/temporalscope_spark.zip" \
  "$REPO/temporalscope_spark/pipelines/feature_pass.py" \
  --input "$INPUT" --output "$OUTPUT" --checkpoint "$CKPT" "$@"
