"""Connected components vs numpy flood-fill oracle; salted aggs vs plain."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from setsm_postprocessing_python_spark.operators.components import bwareaopen, connected_components
from setsm_postprocessing_python_spark.operators.skew import hot_keys, salted_agg, salted_count
from setsm_postprocessing_python_spark.sql import dialect as D


def _cells_df(spark, coords):
    rows = [(int(y) * D.LON_CELL_STRIDE + int(x), int(x), int(y)) for x, y in coords]
    return spark.createDataFrame(rows, "cell long, cell_x long, cell_y long")


def _numpy_components(coords):
    """Flood-fill oracle (8-connectivity), labels = min cell id."""
    cellid = {c: c[1] * D.LON_CELL_STRIDE + c[0] for c in coords}
    remaining = set(coords)
    out = {}
    while remaining:
        seed = remaining.pop()
        comp = {seed}
        frontier = [seed]
        while frontier:
            x, y = frontier.pop()
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    n = (x + dx, y + dy)
                    if n in remaining:
                        remaining.discard(n)
                        comp.add(n)
                        frontier.append(n)
        label = min(cellid[c] for c in comp)
        for c in comp:
            out[cellid[c]] = label
    return out


def test_components_match_floodfill(spark):
    rng = np.random.default_rng(42)
    coords = {(int(x), int(y)) for x, y in rng.integers(0, 30, (120, 2))}
    df = _cells_df(spark, coords)
    got = {r.cell: r.component for r in connected_components(df).collect()}
    want = _numpy_components(coords)
    assert got == want


def test_bwareaopen_filters_small_components(spark):
    # one 5-cell line, one 2-cell pair, one isolated cell
    coords = [(0, 0), (1, 0), (2, 0), (3, 0), (4, 0),
              (10, 10), (11, 10),
              (20, 20)]
    df = _cells_df(spark, coords)
    kept = bwareaopen(df, min_size=3).collect()
    assert len(kept) == 5
    assert all(r.csize == 5 for r in kept)


def test_salted_count_equals_plain(spark):
    from setsm_postprocessing_python_spark.sources.datagen import synthetic_pages

    df = synthetic_pages(spark, 20_000, partitions=8, hot_fraction=0.3)
    plain = {r.cell: r["count"] for r in df.groupBy("cell").count().collect()}
    salted = {r.cell: r.n for r in salted_count(df, "cell").collect()}
    assert plain == salted
    # the hot cell really is hot (30% of rows)
    hot = hot_keys(df, "cell", threshold=1000).collect()
    assert len(hot) == 1
    assert plain[hot[0].cell] == 6000


def test_salted_agg_min_max_bitor(spark):
    from setsm_postprocessing_python_spark.operators.flags import with_flags
    from setsm_postprocessing_python_spark.sources.datagen import synthetic_pages

    df = with_flags(synthetic_pages(spark, 10_000, partitions=8, hot_fraction=0.2))
    got = {r.cell: (r.zmin, r.zmax, r.fl, r.n) for r in salted_agg(
        df.withColumn("z", F.expr(D.z_expr(D.SPARK))), "cell",
        {"zmin": ("z", "min"), "zmax": ("z", "max"),
         "fl": ("flags", "bit_or"), "n": ("url", "count")}).collect()}
    want = {r.cell: (r.zmin, r.zmax, r.fl, r.n) for r in (
        df.withColumn("z", F.expr(D.z_expr(D.SPARK))).groupBy("cell")
          .agg(F.min("z").alias("zmin"), F.max("z").alias("zmax"),
               F.expr("bit_or(flags)").alias("fl"),
               F.count("url").alias("n"))).collect()}
    assert got == want
