"""Greedy merge-ordering semantics vs constructed fixtures (the reference's
strip-merge order regression surface, lib/scenes2strips.py:921-997)."""

from __future__ import annotations

import pandas as pd
import pytest

from setsm_postprocessing_python_spark.operators.merge import (
    _order_group,
    merge_order,
    with_footprint,
)


def g(rows):
    return pd.DataFrame(rows, columns=["group_id", "url", "fx0", "fx1", "fy0", "fy1"])


def test_west_to_east_chain():
    # wide layout -> W->E direction; overlapping chain a-b-c
    pdf = g([("h", "a", 0.0, 2.0, 0.0, 1.0),
             ("h", "b", 1.5, 3.5, 0.0, 1.0),
             ("h", "c", 3.0, 5.0, 0.0, 1.0)])
    out = _order_group(pdf).sort_values("order_idx")
    assert list(out["url"]) == ["a", "b", "c"]
    assert list(out["segment_num"]) == [0, 0, 0]
    assert not out["is_redundant"].any()


def test_south_to_north_direction():
    # tall layout -> S->N by ymin
    pdf = g([("h", "top", 0.0, 1.0, 4.0, 6.0),
             ("h", "bot", 0.0, 1.0, 0.0, 2.0),
             ("h", "mid", 0.0, 1.0, 1.5, 4.5)])
    out = _order_group(pdf).sort_values("order_idx")
    assert list(out["url"]) == ["bot", "mid", "top"]


def test_first_scene_domination_reselect():
    # 'small' is >=90% covered by 'big' -> demoted despite being
    # directionally first (reference :960-967)
    pdf = g([("h", "small", 0.0, 0.5, 0.0, 0.5),
             ("h", "big", -0.1, 4.0, -0.1, 1.1),
             ("h", "right", 3.5, 6.0, 0.0, 1.0)])
    out = _order_group(pdf)
    first = out[out["order_idx"] == 0].iloc[0]
    assert first["url"] == "big"
    # small is fully inside big -> adds no area -> redundant
    small = out[out["url"] == "small"].iloc[0]
    assert small["is_redundant"]


def test_zero_overlap_segment_break():
    pdf = g([("h", "a", 0.0, 1.0, 0.0, 1.0),
             ("h", "b", 0.5, 1.5, 0.0, 1.0),
             ("h", "far", 10.0, 11.0, 0.0, 1.0)])
    out = _order_group(pdf)
    far = out[out["url"] == "far"].iloc[0]
    assert far["segment_num"] == 1
    assert set(out[out["url"].isin(["a", "b"])]["segment_num"]) == {0}


def test_redundant_member_skipped():
    # inner adds ~0 new area to the union of a+b
    pdf = g([("h", "a", 0.0, 2.0, 0.0, 2.0),
             ("h", "b", 1.0, 3.0, 0.0, 2.0),
             ("h", "inner", 0.8, 1.6, 0.5, 1.5)])
    out = _order_group(pdf)
    inner = out[out["url"] == "inner"].iloc[0]
    assert inner["is_redundant"]
    assert inner["order_idx"] == -1


def test_jointly_covered_member_is_redundant():
    # 'strip' is <60% covered by either neighbor alone but >95% by their
    # UNION -> the gate must measure union coverage, not max pairwise
    pdf = g([("h", "a", 0.0, 2.0, 0.0, 1.0),
             ("h", "b", 1.0, 3.0, 0.0, 1.0),
             ("h", "strip", 0.5, 2.5, 0.2, 0.8)])
    out = _order_group(pdf)
    strip = out[out["url"] == "strip"].iloc[0]
    assert strip["is_redundant"]


def test_deterministic_under_input_order():
    rows = [("h", f"u{i}", float(i), float(i) + 1.5, 0.0, 1.0) for i in range(6)]
    a = _order_group(g(rows))
    b = _order_group(g(list(reversed(rows))))
    pd.testing.assert_frame_equal(
        a.sort_values("url", ignore_index=True),
        b.sort_values("url", ignore_index=True))


def test_spark_merge_order_runs(spark):
    from setsm_postprocessing_python_spark.sources.pages import geocoded_pages

    df = with_footprint(geocoded_pages(spark, "/root/testdata/sf0.001"))
    out = merge_order(df)
    rows = out.collect()
    assert len(rows) == 500
    # every non-redundant member gets a unique order_idx within its group
    import collections
    seen = collections.defaultdict(set)
    for r in rows:
        if not r.is_redundant:
            assert r.order_idx >= 0
            assert r.order_idx not in seen[r.group_id]
            seen[r.group_id].add(r.order_idx)


def test_live_oracle_fuzz_vs_engine_kernel():
    """The round-6 live SQL oracle (recursive CTE re-derivation of the
    greedy fold, plans/queries_ext.merge_order_oracle_sql) must equal the
    engine's _order_group on synthetic rect sets that EXERCISE EVERY
    BRANCH — the driver corpora never trigger the redundancy gate, so this
    fuzz is what pins the 'red' and domination paths of the SQL. Heavy
    overlap (small spread) drives redundancy + domination; sparse layouts
    drive segment breaks."""
    import random

    import duckdb

    from setsm_postprocessing_python_spark.plans.queries_ext import (
        merge_order_oracle_sql)

    rng = random.Random(13)
    rows = []
    for gi in range(30):
        n = rng.randint(1, 9)
        spread = rng.choice([0.3, 1.0, 6.0])  # tight -> redundant; wide -> breaks
        for mi in range(n):
            cx, cy = rng.uniform(-5, 5) * spread, rng.uniform(-5, 5) * spread
            hw, hh = rng.uniform(0.4, 2.5), rng.uniform(0.4, 2.5)
            rows.append((f"g{gi}", f"u{mi:02d}",
                         cx - hw, cx + hw, cy - hh, cy + hh))
    mem = pd.DataFrame(rows, columns=["group_id", "url",
                                      "fx0", "fx1", "fy0", "fy1"])
    want = pd.concat([_order_group(sub)
                      for _, sub in mem.groupby("group_id")],
                     ignore_index=True)

    con = duckdb.connect()
    con.register("mo_fuzz", mem)
    sql = merge_order_oracle_sql(
        member_source="SELECT group_id, url, fx0 AS x0, fx1 AS x1, "
                      "fy0 AS y0, fy1 AS y1 FROM mo_fuzz",
        groups=sorted(mem.group_id.unique()))
    got = con.execute(sql).fetchdf()

    key = ["group_id", "url"]
    a = got.sort_values(key, ignore_index=True)
    b = want.sort_values(key, ignore_index=True)
    assert len(a) == len(b) == len(mem)
    for col in ("order_idx", "segment_num"):
        assert (a[col].astype(int) == b[col].astype(int)).all(), col
    assert (a["is_redundant"].astype(bool)
            == b["is_redundant"].astype(bool)).all()
    assert (a["url"] == b["url"]).all() and (a["group_id"] == b["group_id"]).all()
    # branch coverage: the fuzz corpus must actually hit every path
    assert b["is_redundant"].any(), "fuzz never exercised the redundancy gate"
    assert (b["segment_num"] > 0).any(), "fuzz never exercised segment breaks"
