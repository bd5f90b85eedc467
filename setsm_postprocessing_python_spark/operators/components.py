"""Connected components over cell adjacency — the bwareaopen family.

Reference semantics (citations into /root/reference):
- bwareaopen(array, minsize, conn): drop 8-connected components smaller
  than minsize (lib/raster_array_tools.py:2406-2438),
- clean_mask: bwareaopen on the mask, then on its complement = fill holes
  (lib/filter_scene.py:1691-1722).

Engine recast: occupied cells form a graph (8-adjacency in the grid cell
space); components found by iterative min-label propagation:

    label(c) <- min(label(c), min over neighbors(label(n)))

repeated until fixpoint. Each iteration is one scatter-join + min-agg —
the standard large-scale CC pattern (HashMin). Iteration count is bounded
by the graph diameter; a deterministic cap + convergence check keeps the
driver loop tiny. The per-iteration dataframes are checkpointed via
localCheckpoint to truncate lineage (else the plan doubles every round).

bwareaopen then = CC + component-size filter (groupBy(label).count).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..sql import dialect as D
from .knn import ring_offsets


def _neighbor_pairs(cells: DataFrame) -> DataFrame:
    """(cell, nbr_cell) for occupied 8-neighbors (both directions)."""
    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx, dy in ring_offsets(1) if not (dx == 0 and dy == 0)
    ])
    cand = (cells.withColumn("_o", F.explode(offsets))
            .select(F.col("cell"),
                    ((F.col("cell_y") + F.col("_o.dy")) * D.LON_CELL_STRIDE
                     + (F.col("cell_x") + F.col("_o.dx"))).alias("nbr_cell")))
    occ = cells.select(F.col("cell").alias("nbr_cell"))
    return cand.join(occ, "nbr_cell", "inner")  # keep only occupied neighbors


def connected_components(cells: DataFrame, max_iter: int = 20) -> DataFrame:
    """(cell, component) where component = min cell id in the component.

    cells: distinct occupied cells with (cell, cell_x, cell_y).
    Deterministic: labels are min cell ids, propagation order-insensitive.
    """
    edges = _neighbor_pairs(cells).persist()
    labels = cells.select("cell", F.col("cell").alias("component"))
    labels = labels.localCheckpoint()
    for _ in range(max_iter):
        # push each cell's label to its neighbors, take the min seen
        pushed = (edges.join(labels, "cell")
                  .select(F.col("nbr_cell").alias("cell"),
                          F.col("component")))
        new_labels = (labels.unionByName(pushed)
                      .groupBy("cell").agg(F.min("component").alias("component")))
        new_labels = new_labels.localCheckpoint()
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "cell")
                   .where(F.col("n.component") != F.col("o.component"))
                   .limit(1).count())
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels


def bwareaopen(cells: DataFrame, min_size: int, max_iter: int = 20) -> DataFrame:
    """Occupied cells that belong to a component of size >= min_size
    (lib/raster_array_tools.py:2406-2438 semantics)."""
    labels = connected_components(cells, max_iter)
    sizes = labels.groupBy("component").agg(F.count(F.lit(1)).alias("csize"))
    return (labels.join(sizes, "component")
            .where(F.col("csize") >= min_size)
            .select("cell", "component", "csize"))
