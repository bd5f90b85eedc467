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
