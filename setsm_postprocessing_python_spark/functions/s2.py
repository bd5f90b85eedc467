"""S2 cell ids (level-13 default) in pure vectorized numpy.

Implements the public S2 geometry cell-id scheme (s2geometry.io; the
algorithm is public knowledge: cube-face projection, quadratic st
transform, Hilbert curve position, 64-bit id layout = 3 face bits +
2*level position bits + trailing marker bit). No external s2 library is
available in this container, so encode/decode are implemented from the
published definition and validated by roundtrip + hierarchy invariants in
tests/test_s2.py.

All operations are numpy-vectorized over row batches and exposed as an
Arrow pandas UDF (no per-row Python), per the engine's north rule.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType

MAX_LEVEL = 30
_POS_TO_IJ = np.array([
    [0, 1, 3, 2],   # orientation 0
    [0, 2, 3, 1],   # swap
    [3, 2, 0, 1],   # invert
    [3, 1, 0, 2],   # swap | invert
], dtype=np.int64)
_POS_TO_ORIENT = np.array([1, 0, 0, 3], dtype=np.int64)  # swap,0,0,invert|swap
# inverse: ij -> pos per orientation
_IJ_TO_POS = np.zeros((4, 4), dtype=np.int64)
for _r in range(4):
    for _p in range(4):
        _IJ_TO_POS[_r, _POS_TO_IJ[_r, _p]] = _p


def _latlon_to_xyz(lat_deg: np.ndarray, lon_deg: np.ndarray):
    lat = np.radians(lat_deg)
    lon = np.radians(lon_deg)
    coslat = np.cos(lat)
    return coslat * np.cos(lon), coslat * np.sin(lon), np.sin(lat)


def _xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay,
                    np.where(ax >= az, 0, 2),
                    np.where(ay >= az, 1, 2))
    face = face + 3 * (
        ((face == 0) & (x < 0)) | ((face == 1) & (y < 0)) | ((face == 2) & (z < 0)))
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve, de) in enumerate([
        (lambda: y / x, lambda: z / x, None),        # face 0: +x
        (lambda: -x / y, lambda: z / y, None),       # face 1: +y
        (lambda: -x / z, lambda: -y / z, None),      # face 2: +z
        (lambda: z / x, lambda: y / x, None),        # face 3: -x
        (lambda: z / y, lambda: -x / y, None),       # face 4: -y
        (lambda: -y / z, lambda: -x / z, None),      # face 5: -z
    ]):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u[m] = ue()[m]
                v[m] = ve()[m]
    return face.astype(np.int64), u, v


def _uv_to_st(u: np.ndarray) -> np.ndarray:
    """S2's quadratic projection (both np.where branches evaluate eagerly,
    so clamp the radicands to keep sqrt domain-safe)."""
    return np.where(u >= 0,
                    0.5 * np.sqrt(np.maximum(1.0 + 3.0 * u, 0.0)),
                    1.0 - 0.5 * np.sqrt(np.maximum(1.0 - 3.0 * u, 0.0)))


def _st_to_uv(s: np.ndarray) -> np.ndarray:
    return np.where(s >= 0.5,
                    (1.0 / 3.0) * (4.0 * s * s - 1.0),
                    (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)))


def _st_to_ij(s: np.ndarray) -> np.ndarray:
    return np.clip((s * (1 << MAX_LEVEL)).astype(np.int64), 0,
                   (1 << MAX_LEVEL) - 1)


def _ij_to_pos(face: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """Hilbert curve position (2*MAX_LEVEL bits) from leaf ij, vectorized
    2 bits per iteration (MSB first). Initial orientation = face & 1 swap
    per the S2 definition (odd faces start swapped)."""
    orient = (face & 1).astype(np.int64) * 1  # swapMask for odd faces
    pos = np.zeros_like(i)
    for k in range(MAX_LEVEL - 1, -1, -1):
        ib = (i >> k) & 1
        jb = (j >> k) & 1
        ij2 = (ib << 1) | jb
        p2 = _IJ_TO_POS[orient, ij2]
        pos = (pos << 2) | p2
        orient = orient ^ _POS_TO_ORIENT[p2]
    return pos


def _pos_to_ij(face: np.ndarray, pos: np.ndarray):
    orient = (face & 1).astype(np.int64) * 1
    i = np.zeros_like(pos)
    j = np.zeros_like(pos)
    for k in range(MAX_LEVEL - 1, -1, -1):
        p2 = (pos >> (2 * k)) & 3
        ij2 = _POS_TO_IJ[orient, p2]
        i = (i << 1) | (ij2 >> 1)
        j = (j << 1) | (ij2 & 1)
        orient = orient ^ _POS_TO_ORIENT[p2]
    return i, j


def cell_id(lat_deg, lon_deg, level: int = 13) -> np.ndarray:
    """Vectorized S2 cell id at `level` (default 13 per the north rule)."""
    lat_deg = np.asarray(lat_deg, dtype=np.float64)
    lon_deg = np.asarray(lon_deg, dtype=np.float64)
    x, y, z = _latlon_to_xyz(lat_deg, lon_deg)
    face, u, v = _xyz_to_face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))
    pos = _ij_to_pos(face, i, j)
    leaf = (face.astype(np.uint64) << np.uint64(61)) \
        | (pos.astype(np.uint64) << np.uint64(1)) | np.uint64(1)
    lsb = np.uint64(1 << (2 * (MAX_LEVEL - level)))
    parent = (leaf & (~(lsb - np.uint64(1)) & ~lsb)) | lsb
    return parent.view(np.int64)


def cell_level(ids: np.ndarray) -> np.ndarray:
    """Level from the position of the lowest set bit."""
    u = np.asarray(ids).view(np.uint64)
    lsb = u & (~u + np.uint64(1))
    return (MAX_LEVEL - (np.log2(lsb.astype(np.float64)) / 2)).astype(np.int64)


def cell_center(ids: np.ndarray):
    """(lat_deg, lon_deg) of the cell center (the center leaf ij)."""
    u = np.asarray(ids, dtype=np.int64).view(np.uint64)
    face = (u >> np.uint64(61)).astype(np.int64)
    # decoding the full pos INCLUDING the trailing marker bit lands on a
    # leaf strictly inside the cell (the canonical center-leaf trick)
    pos = ((u & np.uint64((1 << 61) - 1)) >> np.uint64(1)).astype(np.int64)
    i, j = _pos_to_ij(face, pos)
    s = (i.astype(np.float64) + 0.5) / (1 << MAX_LEVEL)
    t = (j.astype(np.float64) + 0.5) / (1 << MAX_LEVEL)
    uu = _st_to_uv(s)
    vv = _st_to_uv(t)
    x = np.empty_like(uu); y = np.empty_like(uu); z = np.empty_like(uu)
    axes = [
        (lambda u_, v_: (np.ones_like(u_), u_, v_)),     # face 0
        (lambda u_, v_: (-u_, np.ones_like(u_), v_)),    # face 1
        (lambda u_, v_: (-u_, -v_, np.ones_like(u_))),   # face 2
        (lambda u_, v_: (-np.ones_like(u_), -v_, -u_)),  # face 3
        (lambda u_, v_: (v_, -np.ones_like(u_), -u_)),   # face 4
        (lambda u_, v_: (v_, u_, -np.ones_like(u_))),    # face 5
    ]
    for f, fn in enumerate(axes):
        m = face == f
        if m.any():
            xf, yf, zf = fn(uu[m], vv[m])
            x[m], y[m], z[m] = xf, yf, zf
    lat = np.degrees(np.arctan2(z, np.sqrt(x * x + y * y)))
    lon = np.degrees(np.arctan2(y, x))
    return lat, lon


def with_s2_cell(df: DataFrame, level: int = 13,
                 lat: str = "lat", lon: str = "lon",
                 out: str = "cell_s2") -> DataFrame:
    """Arrow pandas UDF: add the S2 cell id column (vectorized numpy)."""

    @F.pandas_udf(LongType())
    def s2_udf(lat_s: pd.Series, lon_s: pd.Series) -> pd.Series:
        return pd.Series(cell_id(lat_s.to_numpy(), lon_s.to_numpy(), level))

    return df.withColumn(out, s2_udf(F.col(lat), F.col(lon)))
