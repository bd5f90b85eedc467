"""Group footprints: data-extent polygons per page group.

Reference semantics: footprint vertices of the strip's data extent
(getFPvertices, lib/raster_array_tools.py:3440-3524) simplified for the
strip metadata report (batch_scenes2strips.py:1939-2136), plus the
bounding rectFootprint (lib/scenes2strips.py:1000-1027).

Engine recast: per group, the convex hull of the group's occupied cell
corner points (Andrew's monotone chain, pure numpy inside applyInPandas —
cells per group are bounded after the distinct), emitted as WKT polygon +
area + bounding rect, the footprint line of the strip-meta analogue.

Scale shape: the per-group distinct cell set is small (the aggregation
happens before the hull); groups fan out as tasks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

FOOTPRINT_SCHEMA = ("group_id string, n_cells long, n_vertices int, "
                    "wkt string, hull_area double, "
                    "xmin double, xmax double, ymin double, ymax double")


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain; points (n,2) -> hull vertices CCW (m,2)."""
    pts = np.unique(points, axis=0)
    if len(pts) <= 2:
        return pts
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(seq):
        out: list[np.ndarray] = []
        for p in seq:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def _poly_area(hull: np.ndarray) -> float:
    if len(hull) < 3:
        return 0.0
    x, y = hull[:, 0], hull[:, 1]
    return float(0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))))


def _wkt(hull: np.ndarray) -> str:
    if len(hull) == 0:
        return "POLYGON EMPTY"
    ring = np.vstack([hull, hull[:1]])
    coords = ", ".join(f"{x:.6f} {y:.6f}" for x, y in ring)
    return f"POLYGON (({coords}))"


def _group_footprint(pdf: pd.DataFrame) -> pd.DataFrame:
    gid = pdf["group_id"].iloc[0]
    pts = pdf[["lon", "lat"]].to_numpy(dtype=np.float64)
    hull = convex_hull(pts)
    return pd.DataFrame([{
        "group_id": gid,
        "n_cells": len(pdf),
        "n_vertices": int(len(hull)),
        "wkt": _wkt(hull),
        "hull_area": _poly_area(hull),
        "xmin": float(pts[:, 0].min()), "xmax": float(pts[:, 0].max()),
        "ymin": float(pts[:, 1].min()), "ymax": float(pts[:, 1].max()),
    }])


def group_footprints(df: DataFrame) -> DataFrame:
    """Per-group footprint hull from the group's distinct cells. The
    distinct happens BEFORE the applyInPandas, so each task sees the
    group's cell set, not its pages."""
    cells = df.select("group_id", "lat", "lon", "cell").distinct()
    return cells.groupBy("group_id").applyInPandas(
        _group_footprint, FOOTPRINT_SCHEMA)
