"""SparkSession factory tuned for this engine.

Local mode is the sandbox proxy for a multi-executor cluster; the configs
below are the ones that matter at cluster scale too (AQE, Arrow, shuffle
partition sizing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    parallelism: int | None = None,
    app_name: str = "setsm_pps_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) the engine SparkSession.

    parallelism: local[N] thread count; defaults to $SPARK_GRAFT_CPUS or '*'.
    shuffle_partitions: defaults to max(parallelism, 32) locally. On a real
    cluster this would be sized so post-shuffle partitions are 100-200 MB;
    AQE coalescing then trims small ones at runtime.
    """
    if parallelism is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        par = int(env) if env else (os.cpu_count() or 8)
    else:
        master = f"local[{parallelism}]"
        par = parallelism
    if shuffle_partitions is None:
        shuffle_partitions = max(par, 32)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        # deterministic float semantics for oracle parity
        .config("spark.sql.codegen.wholeStage", "true")
        # Shuffle I/O tuning for this sandbox (single-node, many threads):
        # the bypass-merge writer creates numPartitions files per map task —
        # with 32 concurrent writers on one ext4 volume the fs serializes and
        # local[32] runs SLOWER than local[8] (measured 4.7x). The sort-based
        # writer (one file + index per task) + tmpfs local dirs + plain IO
        # streams restore linear scaling. On a real cluster with NVMe local
        # dirs these are left to their defaults.
        .config("spark.shuffle.sort.bypassMergeThreshold", "0")
        .config("spark.file.transferTo", "false")
    )
    if os.path.isdir("/dev/shm"):
        builder = builder.config("spark.local.dir", "/dev/shm/spark-tmp")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
