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
