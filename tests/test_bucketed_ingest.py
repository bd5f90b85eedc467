"""Incremental ingest into the bucketed layout (round 6).

The layout job (sources/bucketed.ensure_bucketed) is once-per-corpus; at
10^12 rows the table then grows by APPEND — a daily-ingest commit into
the same bucket spec, never a rewrite. These tests pin the three claims
that make the append path production-grade:

  1. the shuffle elimination is a TABLE property: block-keyed equi-joins
     plan ZERO Exchanges over any number of ingests (multiple files per
     bucket), with rows identical to a one-shot write of the union;
  2. the ingest is exactly-once: replaying an applied ingest_id is a
     no-op, and a committed-but-unrecorded append (SIGKILL between the
     write commit and the marker update) is removed and redone —
     the `.fin`/checkfile semantics of reference
     batch_scenes2strips.py:1518-1533 applied to appends;
  3. the protocol survives a fresh session (catalog re-registration via
     the marker DDL keeps the bucket spec, hence the plan shape).
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df):
    from setsm_postprocessing_python_spark.plans.planview import (
        formatted_plan)

    return formatted_plan(df)


def _n_exchanges(plan):
    from setsm_postprocessing_python_spark.plans.planview import n_exchanges

    return n_exchanges(plan)


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _block_join_count(df):
    left = df.select(F.col("url").alias("ua"), "block")
    right = df.select(F.col("url").alias("ub"), "block")
    return left.join(right, "block").where("ua < ub")


def _layout(spark, tmp_path, table):
    """Base layout = the first half of the sf0.001 pages (by doc hash);
    the ingest = the second half. Deterministic, disjoint, non-trivially
    interleaved across blocks."""
    from setsm_postprocessing_python_spark.sources import bucketed as B

    full = B.blocked_pages(spark, SF, block_shift=12)
    base = full.where("pmod(crc32(url), 2) = 0")
    inc = full.where("pmod(crc32(url), 2) = 1")
    tbl, did = B.ensure_bucketed(
        spark, str(tmp_path / "layout"), table,
        build=lambda: base, meta={"grain": "half0"}, n_buckets=4)
    assert did
    return full, base, inc, tbl


def test_ingest_appends_exactly_once_and_keeps_plan(
        spark, tmp_path, no_broadcast):
    from setsm_postprocessing_python_spark.sources import bucketed as B

    table = "t_ingest_once"
    path = str(tmp_path / "layout")
    try:
        full, base, inc, tbl = _layout(spark, tmp_path, table)
        n_base, n_full = base.count(), full.count()
        assert tbl.count() == n_base < n_full

        tbl2, did = B.ensure_bucketed_ingest(
            spark, path, table, build=lambda: inc,
            ingest_id="half1", n_buckets=4)
        assert did
        assert tbl2.count() == n_full
        # rows == one-shot union (append lost/duplicated nothing)
        assert tbl2.exceptAll(full).isEmpty()
        assert full.exceptAll(tbl2).isEmpty()
        # the 100 TB claim: still ZERO Exchanges with 2 files/bucket
        plan = _plan(_block_join_count(tbl2))
        assert "Bucketed: true" in plan
        assert _n_exchanges(plan) == 0

        # replay: the checkfile makes it a no-op
        tbl3, did3 = B.ensure_bucketed_ingest(
            spark, path, table, build=lambda: inc,
            ingest_id="half1", n_buckets=4)
        assert not did3
        assert tbl3.count() == n_full

        # fresh-session analogue: catalog gone, files+marker durable
        spark.sql(f"DROP TABLE {table}")
        tbl4, did4 = B.ensure_bucketed_ingest(
            spark, path, table, build=lambda: inc,
            ingest_id="half1", n_buckets=4)
        assert not did4
        assert tbl4.count() == n_full
        assert _n_exchanges(_plan(_block_join_count(tbl4))) == 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_ingest_removes_unrecorded_append_then_redoes(
        spark, tmp_path, no_broadcast):
    """SIGKILL between the append's write commit and the marker update:
    the files exist but the marker records neither them nor the ingest.
    The next run must remove the orphans (remove-incomplete) and redo the
    ingest — asserting directly on the torn state, which is strictly
    stronger than killing a subprocess and hoping to land in the window
    (the mid-WRITE kill is chaos-tested in test_manifest_resume)."""
    from setsm_postprocessing_python_spark.sources import bucketed as B

    table = "t_ingest_torn"
    path = str(tmp_path / "layout")
    p = Path(path)
    try:
        full, base, inc, tbl = _layout(spark, tmp_path, table)
        n_base, n_full = base.count(), full.count()
        marker = p / B.LAYOUT_MARKER
        rec_before = marker.read_text()

        # commit an append WITHOUT recording it (the torn state)
        (inc.repartition(4, F.col("block"))
            .write.mode("append").bucketBy(4, "block").sortBy("block")
            .option("path", path).format("parquet").saveAsTable(table))
        spark.catalog.refreshTable(table)
        assert spark.table(table).count() == n_full
        assert marker.read_text() == rec_before  # marker untouched
        # plus torn staging from a second, mid-write kill
        (p / "_temporary" / "0").mkdir(parents=True)

        tbl2, did = B.ensure_bucketed_ingest(
            spark, path, table, build=lambda: inc,
            ingest_id="half1", n_buckets=4)
        assert did  # orphans removed, ingest REDONE
        assert tbl2.count() == n_full
        assert tbl2.exceptAll(full).isEmpty()
        assert full.exceptAll(tbl2).isEmpty()
        assert not (p / "_temporary").exists()
        rec = json.loads(marker.read_text())
        assert rec["ingests"] == ["half1"]
        assert sorted(rec["files"]) == sorted(
            f.name for f in p.iterdir() if f.name.startswith("part-"))
        # no stray .crc shadows for removed files
        for crc in p.glob(".part-*.crc"):
            assert crc.name[1:-4] in rec["files"]
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_ingest_guards_spec_and_missing_layout(spark, tmp_path):
    from setsm_postprocessing_python_spark.sources import bucketed as B

    table = "t_ingest_guard"
    path = str(tmp_path / "layout")
    try:
        with pytest.raises(ValueError, match="no completed layout"):
            B.ensure_bucketed_ingest(spark, str(tmp_path / "nope"), table,
                                     build=lambda: None, ingest_id="x")
        full, base, inc, tbl = _layout(spark, tmp_path, table)
        with pytest.raises(ValueError, match="must match"):
            B.ensure_bucketed_ingest(spark, path, table, build=lambda: inc,
                                     ingest_id="x", n_buckets=8)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_ingest_adopts_pre_protocol_marker(spark, tmp_path):
    """Layouts written before the ingest protocol existed (marker without
    `files`) adopt their current file set as known-good instead of
    nuking it as orphans."""
    from setsm_postprocessing_python_spark.sources import bucketed as B

    table = "t_ingest_adopt"
    path = str(tmp_path / "layout")
    p = Path(path)
    try:
        full, base, inc, tbl = _layout(spark, tmp_path, table)
        n_base, n_full = base.count(), full.count()
        marker = p / B.LAYOUT_MARKER
        rec = json.loads(marker.read_text())
        del rec["files"], rec["ingests"]
        marker.write_text(json.dumps(rec))

        tbl2, did = B.ensure_bucketed_ingest(
            spark, path, table, build=lambda: inc,
            ingest_id="half1", n_buckets=4)
        assert did
        assert tbl2.count() == n_full  # base files survived adoption
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
