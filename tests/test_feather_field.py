"""2-D feather weight field semantics (overlap-boundary interpolation)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from setsm_postprocessing_python_spark.operators.merge import (
    _feather_field,
    feather_weight_field,
)


def _mk_sides(a_blocks, b_blocks):
    a = pd.DataFrame({"pair": "p0", "bx": [x for x, _ in a_blocks],
                      "by": [y for _, y in a_blocks]})
    b = pd.DataFrame({"pair": "p0", "bx_b": [x for x, _ in b_blocks],
                      "by_b": [y for _, y in b_blocks]})
    return a, b


def test_field_gradient_across_overlap():
    """A occupies x in [0,6], B occupies x in [4,10], overlap [4,6]:
    w must decrease monotonically from the A side to the B side."""
    a_blocks = [(x, y) for x in range(0, 7) for y in range(3)]
    b_blocks = [(x, y) for x in range(4, 11) for y in range(3)]
    a, b = _mk_sides(a_blocks, b_blocks)
    out = _feather_field(("p0",), a, b)
    assert len(out) == 9  # 3 x-cols * 3 y-rows of overlap
    w_by_x = out.assign(x=out["block"] % 64).groupby("x")["w"].mean()
    xs = sorted(w_by_x.index)
    vals = [w_by_x[x] for x in xs]
    assert all(vals[i] >= vals[i + 1] for i in range(len(vals) - 1))
    assert vals[0] > vals[-1]
    assert ((out["w"] >= 0) & (out["w"] <= 1)).all()


def test_field_no_overlap_empty():
    a, b = _mk_sides([(0, 0)], [(5, 5)])
    out = _feather_field(("p0",), a, b)
    assert len(out) == 0


def test_field_full_containment_fallback():
    """B entirely inside A: no B-only boundary -> flat 0.5-raw field
    rescaled to a constant."""
    a_blocks = [(x, y) for x in range(0, 5) for y in range(5)]
    b_blocks = [(2, 2)]
    a, b = _mk_sides(a_blocks, b_blocks)
    out = _feather_field(("p0",), a, b)
    assert len(out) == 1
    # w_raw -> dB/(dA+dB) with dB=0 at the single B block -> 0 -> clipped
    assert 0.0 <= out["w"].iloc[0] <= 1.0


def test_spark_feather_field(spark):
    from setsm_postprocessing_python_spark.sources.pages import geocoded_pages

    df = geocoded_pages(spark, "/root/testdata/sf0.01")
    out = feather_weight_field(df)
    rows = out.collect()
    assert rows, "no overlap blocks found at sf0.01"
    assert all(0.0 <= r.w <= 1.0 for r in rows)
    pairs = {r.pair for r in rows}
    assert len(pairs) >= 10
