"""Table layout for scale: the Iceberg partition-spec design, realized on
parquet in this sandbox (no Iceberg jars are available here — the layout
and pruning behavior below carry over 1:1 to
`writeTo(...).partitionedBy(bucket(N, url), days(warc_ts))` when the
Iceberg catalog is present; see README).

Production spec (BASELINE north star: 10^12-row pages table):
- partition: bucket(4096, url) + days(warc_ts)  — bounded partition count,
  url-keyed writes spread uniformly, time-range pruning for incremental
  crawls,
- sort order within files: cell  — parquet row-group min/max stats on the
  cell column turn every cell-range predicate into file/row-group skipping
  (the engine's spatial partition-pruning story; the analogue of the
  reference cropping to the overlap window before compute,
  lib/scenes2strips.py:350-364).

Sandbox realization: directory-partition by a url-hash bucket, sort rows
by cell inside each file via repartitionByRange + sortWithinPartitions.
`cell_range_scan` shows the predicate reaching the parquet reader
(PushedFilters) and pruning row groups via stats.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

N_BUCKETS_SANDBOX = 16


def write_pages_layout(df: DataFrame, path: str,
                       n_buckets: int = N_BUCKETS_SANDBOX) -> None:
    """Write pages in the scale layout: bucket(url) dirs, cell-sorted files."""
    out = (df.withColumn("url_bucket",
                         F.pmod(F.xxhash64("url"), F.lit(n_buckets)))
             .repartition("url_bucket")
             .sortWithinPartitions("cell"))
    (out.write.mode("overwrite")
        .partitionBy("url_bucket")
        .option("parquet.block.size", 8 * 1024 * 1024)
        .parquet(path))


def read_pages_layout(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def walk(srcdir: str, mindepth: int = 0, maxdepth: int = 10**9):
    """Bounded-depth recursive directory walk (reference lib/walk.py:12-42
    semantics: yield (dirpath, dnames, fnames) only for depths in
    [mindepth, maxdepth], pruning descent past maxdepth). Used for
    filesystem-layout discovery where no Iceberg metadata listing exists;
    with a catalog this is replaced by the snapshot file listing."""
    import os

    def _walk(d: str, depth: int):
        try:
            entries = sorted(os.scandir(d), key=lambda e: e.name)
        except OSError:
            return
        dnames = [e.name for e in entries if e.is_dir(follow_symlinks=False)]
        fnames = [e.name for e in entries if not e.is_dir(follow_symlinks=False)]
        if depth >= mindepth:
            yield d, dnames, fnames
        if depth < maxdepth:
            for name in dnames:
                yield from _walk(os.path.join(d, name), depth + 1)

    yield from _walk(srcdir, 0)


def cell_range_scan(spark: SparkSession, path: str,
                    cell_lo: int, cell_hi: int) -> DataFrame:
    """Cell-range query against the layout. The BETWEEN predicate is pushed
    to the parquet scan (PushedFilters: [GreaterThanOrEqual(cell,..),
    LessThanOrEqual(cell,..)]) and, because files are cell-sorted,
    row-group min/max stats skip everything outside the window."""
    df = read_pages_layout(spark, path)
    return df.where(F.col("cell").between(cell_lo, cell_hi))
