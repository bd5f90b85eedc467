"""S2 cell-id implementation invariants (no external s2 library available,
so validation is roundtrip + hierarchy + independent-path consistency)."""

from __future__ import annotations

import numpy as np
import pytest

from setsm_postprocessing_python_spark.functions import s2


def _rand_latlon(n, seed=42):
    rng = np.random.default_rng(seed)
    return rng.uniform(-85, 85, n), rng.uniform(-180, 180, n)


def test_level_extraction():
    lat, lon = _rand_latlon(500)
    for level in (0, 5, 13, 30):
        ids = s2.cell_id(lat, lon, level)
        assert (s2.cell_level(ids) == level).all()


def test_roundtrip_center_reencodes_to_same_cell():
    lat, lon = _rand_latlon(2000)
    for level in (5, 13, 20):
        ids = s2.cell_id(lat, lon, level)
        clat, clon = s2.cell_center(ids)
        again = s2.cell_id(clat, clon, level)
        assert (again == ids).all(), f"level {level} roundtrip failed"


def test_hierarchy_containment():
    """A point's level-13 cell id, coarsened to level 10, equals the
    point's level-10 cell id (prefix property of the Hilbert curve)."""
    lat, lon = _rand_latlon(2000)
    id13 = np.asarray(s2.cell_id(lat, lon, 13)).view(np.uint64)
    id10 = np.asarray(s2.cell_id(lat, lon, 10)).view(np.uint64)
    lsb10 = np.uint64(1 << (2 * (30 - 10)))
    coarsened = (id13 & (~(lsb10 - np.uint64(1)) & ~lsb10)) | lsb10
    assert (coarsened == id10).all()


def test_nearby_points_share_cell_far_points_do_not():
    # two points 1e-7 deg apart share a level-13 cell (~1 km)
    a = s2.cell_id([40.0], [30.0], 13)
    b = s2.cell_id([40.0000001], [30.0000001], 13)
    assert a[0] == b[0]
    c = s2.cell_id([41.0], [31.0], 13)
    assert a[0] != c[0]


def test_faces_cover_all_six():
    lat = np.array([0.0, 0.0, 89.9, 0.0, 0.0, -89.9])
    lon = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    ids = np.asarray(s2.cell_id(lat, lon, 13)).view(np.uint64)
    faces = (ids >> np.uint64(61)).astype(int)
    assert sorted(faces) == [0, 1, 2, 3, 4, 5]


def test_determinism_and_dtype():
    lat, lon = _rand_latlon(100, seed=7)
    a = s2.cell_id(lat, lon, 13)
    b = s2.cell_id(lat, lon, 13)
    assert (a == b).all()
    assert a.dtype == np.int64


def test_spark_udf_matches_numpy(spark):
    from setsm_postprocessing_python_spark.functions.s2 import with_s2_cell
    from setsm_postprocessing_python_spark.sources.pages import geocoded_pages

    df = with_s2_cell(geocoded_pages(spark, "/root/testdata/sf0.001"))
    rows = df.select("lat", "lon", "cell_s2").collect()
    lat = np.array([r.lat for r in rows])
    lon = np.array([r.lon for r in rows])
    want = s2.cell_id(lat, lon, 13)
    got = np.array([r.cell_s2 for r in rows])
    assert (got == want).all()
