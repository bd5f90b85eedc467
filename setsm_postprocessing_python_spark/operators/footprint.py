"""Group footprints: data-extent polygons per page group.

Reference semantics: footprint vertices of the strip's data extent
(getFPvertices, lib/raster_array_tools.py:3440-3524) with the CONCAVE
hull of the data region (concave_hull_image, lib/raster_array_tools.py:
3081-3431 — convex hull eroded to the tightest fit that keeps coverage
of all data pixels), simplified under a boundary-offset tolerance and
vertex budget (DecimatePoly analogue, lib/DecimatePoly.py — greedy
lowest-offset-error vertex removal with error accumulation on the
neighbors), plus the bounding rectFootprint (lib/scenes2strips.py:
1000-1027).

Engine recast: the reference's concave hull operates on a binary IMAGE;
the engine's group data region is likewise a set of occupied grid cells,
so the concavity-1 analogue is exact — the rectilinear outer boundary of
the union of occupied cell squares (tightest polygon that loses no data
cell), traced edge-wise in integer corner space, then decimated. Like the
reference (erosion stops rather than splitting the hull into multiple
polygons), a group whose cells form multiple 4-connected regions falls
back to the convex hull of its cell corners — coverage is never lost.

Scale shape: per-group distinct cell sets are bounded (the distinct
happens before the hull); groups fan out as applyInPandas tasks — the
same shape the reference runs per-strip.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..sql import dialect as D

FOOTPRINT_SCHEMA = ("group_id string, n_cells long, n_vertices int, "
                    "wkt string, hull_area double, convex_area double, "
                    "is_concave boolean, "
                    "xmin double, xmax double, ymin double, ymax double")

# Decimation defaults: half-a-cell boundary offset (removes collinear
# staircase vertices and sub-cell jitter), hard vertex budget like the
# reference's simplified strip-meta footprint line.
DECIMATE_TOL_CELLS = 0.5
MAX_VERTICES = 64


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


def _signed_area(ring: list[tuple[int, int]]) -> float:
    s = 0.0
    for (x0, y0), (x1, y1) in zip(ring, ring[1:] + ring[:1]):
        s += x0 * y1 - x1 * y0
    return 0.5 * s


def boundary_rings(cells: set[tuple[int, int]]) -> list[list[tuple[int, int]]]:
    """Directed boundary rings of the union of unit cell squares, interior
    on the LEFT: outer rings come out CCW (positive signed area), hole
    rings CW. At a checkerboard corner the walk takes the sharpest LEFT
    turn, which keeps each 4-connected region on its own ring.

    Determinism: the successor of every directed edge is precomputed from
    its incoming DIRECTION alone (at a 4-degree pinch vertex the two
    incoming directions are opposite, so left-turn pairing is a bijection);
    rings are the orbits of that permutation, so the decomposition is
    identical no matter which edge a walk starts from. Ring order and
    starting vertex are canonicalized by sorting.

    NB: a region pinched at a checkerboard corner (both diagonal cells in
    one 4-connected region) yields a ring that visits the pinch vertex
    twice — a self-touching, non-simple (OGC-invalid) but area-exact
    POLYGON. Downstream treats wkt as a coverage outline, not a strict
    OGC geometry."""
    edges: dict[tuple[int, int], list[tuple[int, int]]] = {}

    def add(s, e):
        edges.setdefault(s, []).append(e)

    for (x, y) in cells:
        if (x, y - 1) not in cells:
            add((x, y), (x + 1, y))
        if (x + 1, y) not in cells:
            add((x + 1, y), (x + 1, y + 1))
        if (x, y + 1) not in cells:
            add((x + 1, y + 1), (x, y + 1))
        if (x - 1, y) not in cells:
            add((x, y + 1), (x, y))
    # successor per directed edge: pure function of the incoming direction
    succ: dict[tuple[tuple[int, int], tuple[int, int]], tuple[int, int]] = {}
    for s, outs in edges.items():
        for e in outs:
            cands = edges.get(e, ())
            if not cands:
                raise AssertionError("open boundary ring — impossible for "
                                     "a finite cell set")
            if len(cands) == 1:
                nxt = cands[0]
            else:
                dx, dy = e[0] - s[0], e[1] - s[1]
                nxt = max(cands,
                          key=lambda t: dx * (t[1] - e[1]) - dy * (t[0] - e[0]))
            succ[(s, e)] = nxt
    unused = set(succ)
    rings = []
    for start_edge in sorted(succ):
        if start_edge not in unused:
            continue
        ring = []
        edge = start_edge
        while True:  # orbit of the successor permutation; one vertex per edge
            ring.append(edge[0])
            unused.discard(edge)
            edge = (edge[1], succ[edge])
            if edge == start_edge:
                break
        rings.append(ring)
    return rings


def decimate_ring(ring: np.ndarray, tol: float = DECIMATE_TOL_CELLS,
                  max_vertices: int = MAX_VERTICES) -> np.ndarray:
    """DecimatePoly-style simplification (lib/DecimatePoly.py): repeatedly
    remove the vertex with the smallest boundary-offset error (distance to
    the chord of its neighbors), ACCUMULATING the removed error onto the
    recomputed neighbor errors so total drift stays bounded by tol; keep
    removing the cheapest vertex past tol only while over the vertex
    budget. O(n log n) via a lazy heap."""
    n = len(ring)
    if n <= 4:
        return ring
    pts = ring.astype(np.float64)
    prv = np.roll(np.arange(n), 1)
    nxt = np.roll(np.arange(n), -1)
    alive = np.ones(n, dtype=bool)
    acc = np.zeros(n)

    def offset(i) -> float:
        a, b, c = pts[prv[i]], pts[i], pts[nxt[i]]
        ab = c - a
        L = np.hypot(*ab)
        if L == 0.0:
            return float(np.hypot(*(b - a)))
        return float(abs(ab[0] * (b[1] - a[1]) - ab[1] * (b[0] - a[0])) / L)

    stamp = np.zeros(n, dtype=np.int64)
    heap = [(offset(i) + acc[i], i, 0) for i in range(n)]
    heapq.heapify(heap)
    remaining = n
    while heap and remaining > 4:
        err, i, st = heapq.heappop(heap)
        if not alive[i] or st != stamp[i]:
            continue
        if err > tol and remaining <= max_vertices:
            break
        alive[i] = False
        remaining -= 1
        p, q = prv[i], nxt[i]
        nxt[p], prv[q] = q, p
        for j in (p, q):
            acc[j] += err
            stamp[j] += 1
            heapq.heappush(heap, (offset(j) + acc[j], j, int(stamp[j])))
    return ring[alive]


def _wkt(hull: np.ndarray) -> str:
    if len(hull) == 0:
        return "POLYGON EMPTY"
    ring = np.vstack([hull, hull[:1]])
    coords = ", ".join(f"{x:.6f} {y:.6f}" for x, y in ring)
    return f"POLYGON (({coords}))"


def _corners_deg(corners: np.ndarray, cells_per_deg: float) -> np.ndarray:
    """Integer cell-corner coords -> (lon, lat) degrees."""
    out = corners.astype(np.float64) / cells_per_deg
    out[:, 0] -= 180.0
    out[:, 1] -= 90.0
    return out


def _group_footprint(pdf: pd.DataFrame,
                     cells_per_deg: float = D.CELLS_PER_DEG) -> pd.DataFrame:
    gid = pdf["group_id"].iloc[0]
    cells_xy = np.unique(
        pdf[["cell_x", "cell_y"]].to_numpy(dtype=np.int64), axis=0)
    cellset = {(int(x), int(y)) for x, y in cells_xy}
    rings = boundary_rings(cellset)
    outers = [r for r in rings if _signed_area(r) > 0]  # fill=True: drop holes
    if len(outers) == 1:
        ring = decimate_ring(np.array(outers[0], dtype=np.int64))
        hull_deg = _corners_deg(ring, cells_per_deg)
        is_concave = True
    else:
        # multiple 4-connected regions: like the reference, never erode the
        # hull into a split — convex hull of all cell corners keeps coverage
        corners = np.concatenate([cells_xy + d for d in
                                  ([0, 0], [1, 0], [0, 1], [1, 1])])
        hull_deg = _corners_deg(convex_hull(corners), cells_per_deg)
        is_concave = False
    corners = np.concatenate([cells_xy + d for d in
                              ([0, 0], [1, 0], [0, 1], [1, 1])])
    convex_deg = _corners_deg(convex_hull(corners), cells_per_deg)
    return pd.DataFrame([{
        "group_id": gid,
        "n_cells": len(cells_xy),
        "n_vertices": int(len(hull_deg)),
        "wkt": _wkt(hull_deg),
        "hull_area": _poly_area(hull_deg),
        "convex_area": _poly_area(convex_deg),
        "is_concave": is_concave,
        "xmin": float(convex_deg[:, 0].min()), "xmax": float(convex_deg[:, 0].max()),
        "ymin": float(convex_deg[:, 1].min()), "ymax": float(convex_deg[:, 1].max()),
    }])


def group_footprints(df: DataFrame,
                     cells_per_deg: float = D.CELLS_PER_DEG) -> DataFrame:
    """Per-group concave footprint from the group's distinct cells. The
    distinct happens BEFORE the applyInPandas, so each task sees the
    group's cell set, not its pages. cells_per_deg converts the input's
    cell grid to degrees (pass the block resolution when footprinting
    coarse blocks)."""
    cells = df.select("group_id", "cell_x", "cell_y").distinct()

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return _group_footprint(pdf, cells_per_deg)

    return cells.groupBy("group_id").applyInPandas(fn, FOOTPRINT_SCHEMA)
