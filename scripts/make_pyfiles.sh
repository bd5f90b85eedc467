#!/usr/bin/env bash
# Build the --py-files zip for spark-submit deployment.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/setsm_pps_spark.zip
zip -qr dist/setsm_pps_spark.zip setsm_postprocessing_python_spark \
    -x '*__pycache__*'
echo "dist/setsm_pps_spark.zip"
