"""Footprint hull: containment + determinism properties, Spark wiring."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from setsm_postprocessing_python_spark.operators.footprint import (
    _poly_area,
    convex_hull,
    group_footprints,
)


def _inside_hull(hull: np.ndarray, pts: np.ndarray) -> np.ndarray:
    """All cross products non-negative for CCW hull."""
    ok = np.ones(len(pts), dtype=bool)
    m = len(hull)
    for i in range(m):
        a, b = hull[i], hull[(i + 1) % m]
        ok &= np.cross(b - a, pts - a) >= -1e-9
    return ok


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(
    st.floats(-100, 100, allow_nan=False), st.floats(-100, 100, allow_nan=False)),
    min_size=3, max_size=60))
def test_hull_contains_all_points(points):
    pts = np.array(points, dtype=np.float64)
    hull = convex_hull(pts)
    if len(hull) >= 3:
        assert _inside_hull(hull, pts).all()
        assert _poly_area(hull) >= 0


def test_hull_square():
    pts = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0.5, 0.5], [0.2, 0.8]])
    hull = convex_hull(pts)
    assert len(hull) == 4
    assert abs(_poly_area(hull) - 1.0) < 1e-12


def test_group_footprints_spark(spark):
    from setsm_postprocessing_python_spark.sources.pages import geocoded_pages

    df = geocoded_pages(spark, "/root/testdata/sf0.001")
    fps = group_footprints(df).collect()
    assert len(fps) == 50
    for r in fps:
        assert r.n_cells == 10  # 10 pages per host at sf0.001, distinct cells
        assert r.wkt.startswith("POLYGON")
        assert r.xmin <= r.xmax and r.ymin <= r.ymax
        assert r.hull_area <= (r.xmax - r.xmin) * (r.ymax - r.ymin) + 1e-9
