"""Physical-plan regression tests: the properties that matter at 100 TB
must survive refactors (column pruning, pushdown, partial aggs, top-k
pushdown, broadcast of small sides)."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def _plan(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))


def test_tile_counts_prunes_to_doc_id(spark):
    """The whole geocode->tile->rollup chain must read ONLY doc_id — the
    wide text/html columns never leave the parquet reader."""
    from setsm_postprocessing_python_spark.plans.queries import q_tile_counts

    plan = _plan(spark, q_tile_counts(spark, SF))
    assert "ReadSchema: struct<doc_id:" in plan
    assert "text" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_tile_counts_partial_aggregation(spark):
    """Map-side combine: a partial HashAggregate must precede the Exchange."""
    from setsm_postprocessing_python_spark.plans.queries import q_tile_counts

    plan = _plan(spark, q_tile_counts(spark, SF))
    agg_before_exchange = plan.index("HashAggregate") < plan.index("Exchange")
    assert agg_before_exchange


def test_knn_uses_topk_pushdown(spark):
    """row_number()<=k must compile to WindowGroupLimit (partial top-k
    before the shuffle), not a full sort."""
    from setsm_postprocessing_python_spark.plans.queries import q_knn

    plan = _plan(spark, q_knn(spark, SF))
    assert "WindowGroupLimit" in plan


def test_dn2rad_broadcasts_dim(spark):
    """The 5-row gain/offset dim side must be broadcast, never shuffled."""
    from setsm_postprocessing_python_spark.plans.queries_ref import q_dn2rad

    plan = _plan(spark, q_dn2rad(spark, SF))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_ring_density_is_join_free(spark):
    """The occupied-cell check must ride the scatter shuffle (self-marker
    max), NOT a join back to the cell set — at 100 TB that join is a whole
    extra |cells|-row shuffle per kernel application."""
    from setsm_postprocessing_python_spark.operators.neighborhood import (
        ring_density)
    from setsm_postprocessing_python_spark.sources.pages import geocoded_pages

    plan = _plan(spark, ring_density(geocoded_pages(spark, SF), ring=1))
    assert "Join" not in plan


def test_slope_partial_aggregation(spark):
    """central_gradient: one scatter + conditional-agg gather; the partial
    HashAggregate must precede the Exchange (map-side combine)."""
    from setsm_postprocessing_python_spark.plans.queries_ref import q_slope

    plan = _plan(spark, q_slope(spark, SF))
    assert plan.index("HashAggregate") < plan.index("Exchange")


def test_layout_scan_pushes_cell_range(spark, tmp_path):
    """Cell-range predicates must reach the parquet scan as PushedFilters."""
    from setsm_postprocessing_python_spark.sources.layout import (
        cell_range_scan, write_pages_layout)
    from setsm_postprocessing_python_spark.sources.pages import geocoded_pages

    d = str(tmp_path / "pages")
    write_pages_layout(geocoded_pages(spark, SF), d)
    plan = _plan(spark, cell_range_scan(spark, d, 0, 10**9))
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(cell" in plan


def test_adaptive_assign_join_path_matches_pip_and_guards(spark):
    """The distributed adaptive assignment (join on adaptive_leaf_map,
    zero driver collect) is row-identical to the bounded Tile-list/PIP
    path, and the Tile-list path raises past its leaf budget."""
    import pytest

    from setsm_postprocessing_python_spark.operators.tiles import (
        adaptive_tiles, assign_tiles_adaptive, assign_tiles_pip)
    from setsm_postprocessing_python_spark.sources.pages import geocoded_pages

    df = geocoded_pages(spark, "/root/testdata/sf0.001")
    joined = {(r.url, r.tile_id) for r in
              assign_tiles_adaptive(df, max_pages=50, max_depth=8)
              .select("url", "tile_id").collect()}
    tiles = adaptive_tiles(df, max_pages=50, max_depth=8)
    pip = {(r.url, r.tile_id) for r in
           assign_tiles_pip(df, tiles).select("url", "tile_id").collect()}
    assert joined == pip and joined
    # join path stays a join: no collect-backed local relation of leaves
    plan = assign_tiles_adaptive(df, max_pages=50, max_depth=8) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Join" in plan and "LocalTableScan" not in plan

    with pytest.raises(ValueError, match="assign_tiles_adaptive"):
        adaptive_tiles(df, max_pages=1, max_depth=8, leaf_budget=10)
