"""Checkpoint-manifest resume semantics (the .fin marker analogue,
reference batch_scenes2strips.py:884-924, 1518-1533)."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pyspark.sql.functions as F
import pytest

from setsm_postprocessing_python_spark.plans.manifest import (
    pending_units,
    read_manifest,
    run_stage,
    unit_fingerprints,
)
from setsm_postprocessing_python_spark.sources.pages import pages


@pytest.fixture()
def tmpdirs():
    d = Path(tempfile.mkdtemp(prefix="manifest_test_"))
    yield str(d / "out"), str(d / "manifest")
    shutil.rmtree(d, ignore_errors=True)


def _transform(df):
    return (df.groupBy("unit").agg(F.count(F.lit(1)).alias("n_pages"),
                                   F.min("doc_id").alias("min_doc")))


def test_stage_runs_then_skips(spark, tmpdirs):
    out_dir, man_dir = tmpdirs
    inputs = pages(spark, "/root/testdata/sf0.001")
    r1 = run_stage(spark, "census", inputs, "group_id", _transform, out_dir, man_dir)
    assert r1["units_run"] == r1["units_total"] == 50
    first = spark.read.parquet(f"{out_dir}/census")
    assert first.count() == 50

    # second run: everything fingerprint-matched -> zero work
    r2 = run_stage(spark, "census", inputs, "group_id", _transform, out_dir, man_dir)
    assert r2["units_run"] == 0

    man = read_manifest(spark, man_dir)
    assert man.where("status = 'done'").count() == 50
    assert man.agg(F.sum("row_count")).collect()[0][0] == 50


def test_resume_after_partial_completion(spark, tmpdirs):
    """Kill-mid-run analogue: only half the units are recorded done;
    resume must recompute exactly the missing ones and converge to the
    same final output as a clean run."""
    out_dir, man_dir = tmpdirs
    inputs = pages(spark, "/root/testdata/sf0.001")

    # simulate a partial run: process only hosts 0-24, record their manifest
    partial = inputs.where(F.expr("cast(substring(group_id, 5) as int) < 25"))
    run_stage(spark, "census", partial, "group_id", _transform, out_dir, man_dir)
    assert read_manifest(spark, man_dir).count() == 25

    # resume with the full input: only the 25 missing units are pending
    fps = unit_fingerprints(inputs, "group_id")
    todo = pending_units(spark, man_dir, "census", fps)
    assert todo.count() == 25

    run_stage(spark, "census", inputs, "group_id", _transform, out_dir, man_dir)
    final = spark.read.parquet(f"{out_dir}/census")
    assert final.count() == 50
    assert final.select("unit").distinct().count() == 50


def test_changed_inputs_invalidate_unit(spark, tmpdirs):
    """Lineage: a unit whose input fingerprint changed is recomputed."""
    out_dir, man_dir = tmpdirs
    inputs = pages(spark, "/root/testdata/sf0.001")
    run_stage(spark, "census", inputs, "group_id", _transform, out_dir, man_dir)

    # perturb one group's inputs (drop a row from host7)
    perturbed = inputs.where(
        ~((F.col("group_id") == "host7") & (F.col("doc_id") == 7)))
    fps = unit_fingerprints(perturbed, "group_id")
    todo = pending_units(spark, man_dir, "census", fps)
    assert [r.unit for r in todo.collect()] == ["host7"]

    r = run_stage(spark, "census", perturbed, "group_id", _transform, out_dir, man_dir)
    assert r["units_run"] == 1
    final = spark.read.parquet(f"{out_dir}/census")
    host7 = final.where("unit = 'host7'").collect()
    assert len(host7) == 1 and host7[0].n_pages == 9


def test_ithresh_snapshot_replay(spark, tmp_path):
    """ithresh save/replay (lib/filter_scene.py:59-71,1895-1987 analogue):
    the threshold step re-evaluated from the snapshot must equal the
    direct full-pipeline result."""
    import pyspark.sql.functions as F

    from setsm_postprocessing_python_spark.plans.debug import (
        ithresh_save,
        replay_percentile_gate,
    )
    from setsm_postprocessing_python_spark.plans.queries_ext import (
        q_percentile_gate,
    )
    from setsm_postprocessing_python_spark.sources.pages import geocoded_pages
    from setsm_postprocessing_python_spark.sql import dialect as D

    wd = str(tmp_path / "wd")
    df = (geocoded_pages(spark, "/root/testdata/sf0.001")
          .withColumn("z", F.expr(D.z_expr(D.SPARK))))
    spreads = df.groupBy("group_id").agg(
        F.expr("percentile(z, 0.8) - percentile(z, 0.2)").alias("spread"))
    ithresh_save(spreads, wd, "percentile_gate")

    replayed = {(r.group_id, r.spread, r.stdev_thresh)
                for r in replay_percentile_gate(spark, wd).collect()}
    direct = {(r.group_id, r.spread, r.stdev_thresh)
              for r in q_percentile_gate(spark, "/root/testdata/sf0.001").collect()}
    assert replayed == direct
