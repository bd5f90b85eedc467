"""Structured Streaming facade: watermarked dedup + windowed rollups,
driven with availableNow triggers into memory sinks."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest

from setsm_postprocessing_python_spark.sources.pages import pages
from setsm_postprocessing_python_spark.streaming.stream import (
    crawl_rate,
    dedup_urls,
    incremental_tile_counts,
    read_pages_stream,
)


@pytest.fixture(scope="module")
def pages_dir(spark):
    d = Path(tempfile.mkdtemp(prefix="stream_src_")) / "pages"
    df = pages(spark, "/root/testdata/sf0.001")
    # duplicate every row once to exercise dedup
    df.union(df).repartition(4).write.parquet(str(d))
    yield str(d)
    shutil.rmtree(d.parent, ignore_errors=True)


def _run(stream_df, name, mode="append"):
    # windowed aggs use complete mode here: in append mode, windows still
    # inside the watermark at end-of-stream are (correctly) withheld
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode(mode).trigger(availableNow=True).start())
    q.awaitTermination(120)
    return q


def test_watermarked_dedup(spark, pages_dir):
    stream = read_pages_stream(spark, pages_dir)
    _run(dedup_urls(stream), "dedup_sink")
    out = spark.sql("select count(*) n, count(distinct url) d from dedup_sink").collect()[0]
    assert out.n == out.d == 500  # 1000 input rows -> 500 unique urls


def test_windowed_crawl_rate(spark, pages_dir):
    stream = read_pages_stream(spark, pages_dir)
    _run(crawl_rate(stream, window="10 minutes"), "rate_sink", mode="complete")
    rows = spark.sql("select * from rate_sink").collect()
    assert sum(r.n_pages for r in rows) == 1000
    assert all(r.lang in {"en", "de", "fr", "es", "zh"} for r in rows)


def test_incremental_tile_counts(spark, pages_dir):
    stream = read_pages_stream(spark, pages_dir)
    _run(incremental_tile_counts(stream), "tile_sink", mode="complete")
    rows = spark.sql("select * from tile_sink").collect()
    assert sum(r.n_pages for r in rows) == 1000
    assert all(r.tile_id.startswith("q") and len(r.tile_id) == 5 for r in rows)


def test_foreachbatch_exactly_once_sink(spark, pages_dir, tmp_path):
    """Batch replay writes the same path (no duplicates): run the stream
    twice against the same checkpoint; second run is a no-op, output rows
    stay consistent with the input."""
    import pyspark.sql.functions as F

    from setsm_postprocessing_python_spark.streaming.stream import (
        read_exactly_once_output,
        write_tile_counts_exactly_once,
    )

    out = str(tmp_path / "tiles_out")
    ckpt = str(tmp_path / "ckpt")
    for _ in range(2):  # second start replays from checkpoint -> no new data
        stream = read_pages_stream(spark, pages_dir)
        counts = (stream.withWatermark("warc_ts", "1 hour")
                  .groupBy("lang").agg(F.count(F.lit(1)).alias("n")))
        q = (write_tile_counts_exactly_once(counts, out, ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
    # the documented reader contract: compacted latest-batch-per-key view
    final = read_exactly_once_output(spark, out, ["lang"]).collect()
    assert sum(r.n for r in final) == 1000
    assert len(final) == len({r.lang for r in final})  # one row per key


def test_watermark_late_data_semantics(spark, tmp_path):
    """Append-mode windowed agg with a 10-min watermark over 3 sequential
    micro-batches (maxFilesPerTrigger=1):
    - batch B's row at t0+35m arrives AFTER its window's data but WITHIN
      the watermark -> folds into its window,
    - batch C's row at t0 is older than the watermark -> dropped,
    so the finalized windows show exactly the on-time + within-watermark
    counts. This is the late-data contract of SURVEY §2.9."""
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyspark.sql.functions as F

    t0 = 1704067200  # epoch base
    mins = 60
    src = tmp_path / "late_src"
    src.mkdir()

    def write_batch(name, epochs, mtime):
        tbl = pa.table({
            "url": [f"u{i}" for i in range(len(epochs))],
            "warc_ts": pa.array([e * 1_000_000 for e in epochs],
                                type=pa.timestamp("us", tz="UTC")),
        })
        p = src / name
        pq.write_table(tbl, p)
        os.utime(p, (mtime, mtime))

    now = _time.time()
    # A: 3 rows in W0=[0,10m), 2 rows in W30=[30m,40m), pusher at 40m
    write_batch("a.parquet",
                [t0, t0 + 1, t0 + 2,
                 t0 + 31 * mins, t0 + 32 * mins,
                 t0 + 40 * mins], now - 30)
    # B: late-but-within-watermark row for W30 (35m >= watermark 30m),
    #    plus a pusher far ahead (2h) that finalizes everything
    write_batch("b.parquet", [t0 + 35 * mins, t0 + 120 * mins], now - 20)
    # C: a row at t0, now far older than the watermark (110m) -> dropped
    write_batch("c.parquet", [t0, t0 + 121 * mins], now - 10)

    static = spark.read.parquet(str(src))
    stream = (spark.readStream.schema(static.schema)
              .option("maxFilesPerTrigger", "1").parquet(str(src)))
    agg = (stream.withWatermark("warc_ts", "10 minutes")
           .groupBy(F.window("warc_ts", "10 minutes").alias("w"))
           .agg(F.count(F.lit(1)).alias("n"))
           .select(F.col("w.start").cast("long").alias("ws"), "n"))
    q = (agg.writeStream.format("memory").queryName("late_sink")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.ws - t0: r.n for r in spark.sql("select * from late_sink").collect()}
    assert got.get(0) == 3                 # late t0 row in C was DROPPED
    assert got.get(30 * mins) == 3         # B's 35m row folded in (2 + 1)
