#!/usr/bin/env python
"""spark-submit entry point: runs the end-to-end pipeline.

Usage (cluster shape; local[] in the sandbox):
    scripts/make_pyfiles.sh
    spark-submit --master local[8] \
        --py-files dist/setsm_pps_spark.zip \
        scripts/submit_job.py --sf-dir /root/testdata/sf0.001 \
        --workdir /tmp/pps_run

The engine package arrives via --py-files (no install step), per the
north rule's deployment model. On a real cluster only --master and the
executor sizing change.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--workdir", required=True)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("setsm_pps_pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from setsm_postprocessing_python_spark.plans.pipeline import run_pipeline

    results = run_pipeline(spark, args.sf_dir, args.workdir)
    print(json.dumps({"stages": results}))
    spark.stop()


if __name__ == "__main__":
    main()
