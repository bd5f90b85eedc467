"""End-to-end pipeline: clean run == interrupted-then-resumed run."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest

from setsm_postprocessing_python_spark.plans.pipeline import run_pipeline

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def workdirs():
    a = tempfile.mkdtemp(prefix="pipe_clean_")
    b = tempfile.mkdtemp(prefix="pipe_resume_")
    yield a, b
    shutil.rmtree(a, ignore_errors=True)
    shutil.rmtree(b, ignore_errors=True)


def _final_state(spark, workdir):
    rollup = spark.read.parquet(f"{workdir}/out/tile_rollup")
    order = spark.read.parquet(f"{workdir}/out/merge_order")
    return (
        sorted(map(tuple, rollup.select("unit", "n_pages", "n_flagged",
                                        "flags_merged").collect())),
        sorted(map(tuple, order.select("group_id", "url", "order_idx",
                                       "segment_num").collect())),
    )


def test_pipeline_clean_vs_interrupted_resume(spark, workdirs):
    clean_dir, resume_dir = workdirs

    # clean run
    r1 = run_pipeline(spark, SF, clean_dir)
    assert all(s["units_run"] > 0 for s in r1)

    # interrupted run: run everything, then damage one stage's outputs and
    # manifest rows for a subset of units (mid-write kill analogue)
    run_pipeline(spark, SF, resume_dir)
    man = spark.read.parquet(f"{resume_dir}/manifest")
    kept = man.where("NOT (stage = 'tile_rollup')")
    # drop the whole tile_rollup stage record + its output
    shutil.rmtree(Path(resume_dir) / "out" / "tile_rollup")
    kept.write.mode("overwrite").parquet(f"{resume_dir}/manifest_new")
    shutil.rmtree(Path(resume_dir) / "manifest")
    Path(resume_dir, "manifest_new").rename(Path(resume_dir, "manifest"))

    # resume: only tile_rollup re-runs; others fingerprint-skip
    r2 = run_pipeline(spark, SF, resume_dir)
    by_stage = {s["stage"]: s for s in r2}
    assert by_stage["geocode"]["units_run"] == 0
    assert by_stage["tile_assign"]["units_run"] == 0
    assert by_stage["merge_order"]["units_run"] == 0
    assert by_stage["tile_rollup"]["units_run"] > 0

    assert _final_state(spark, clean_dir) == _final_state(spark, resume_dir)
