"""Custom stateful operator (applyInPandasWithState sessionization)."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest

from setsm_postprocessing_python_spark.sources.pages import pages
from setsm_postprocessing_python_spark.streaming.stateful import crawl_sessions
from setsm_postprocessing_python_spark.streaming.stream import read_pages_stream


def test_crawl_sessions(spark):
    d = Path(tempfile.mkdtemp(prefix="sess_src_")) / "pages"
    df = pages(spark, "/root/testdata/sf0.001")
    df.repartition(2).write.parquet(str(d))
    try:
        stream = read_pages_stream(spark, str(d))
        q = (crawl_sessions(stream).writeStream.format("memory")
             .queryName("sessions").outputMode("update")
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        rows = spark.sql("select * from sessions").collect()
        assert rows, "no session rows emitted"
        # update mode re-emits a session as it grows: keep the LATEST
        # emission per (group_id, session_start) — that is the sink's
        # upsert contract — then totals must add up to the input
        latest = {}
        for r in rows:
            k = (r.group_id, r.session_start)
            cur = latest.get(k)
            if cur is None or r.n_pages >= cur.n_pages:
                latest[k] = r
        per_host = {}
        for (g, _), r in latest.items():
            per_host[g] = per_host.get(g, 0) + r.n_pages
        assert len(per_host) == 50
        assert sum(per_host.values()) == 500
        # session bounds are ordered
        assert all(r.session_start <= r.session_end for r in rows)
    finally:
        shutil.rmtree(d.parent, ignore_errors=True)
