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
    assert by_stage["coregister"]["units_run"] == 0
    assert by_stage["strip_assemble"]["units_run"] == 0
    assert by_stage["tile_rollup"]["units_run"] > 0

    assert _final_state(spark, clean_dir) == _final_state(spark, resume_dir)


def test_strip_pass2_holds_persisted_translations(spark, workdirs):
    """The mosaic pass consumes the PERSISTED pass-1 translations (the
    readStripMeta_stats -> trans_guess/HOLD_GUESS_ALL path): forcing the
    strip_assemble stage to re-run picks up edits made to the persisted
    coregister output — proof there is no hidden re-fit — and an
    untouched resume reproduces the identical strip output."""
    import pyspark.sql.functions as F

    workdir, _ = workdirs
    run_pipeline(spark, SF, workdir)
    strip1 = sorted(map(tuple, spark.read.parquet(
        f"{workdir}/out/strip_assemble")
        .select("pair", "block", "src", "segment_break").collect()))

    # plain resume: nothing re-runs, output identical
    r2 = run_pipeline(spark, SF, workdir)
    assert {s["stage"]: s["units_run"] for s in r2}["strip_assemble"] == 0
    strip2 = sorted(map(tuple, spark.read.parquet(
        f"{workdir}/out/strip_assemble")
        .select("pair", "block", "src", "segment_break").collect()))
    assert strip1 == strip2

    # rewrite the persisted translations to a perfect usable fit, drop the
    # strip stage's manifest rows (stale-output analogue), re-run: the pass
    # consumes the EDITED translations -> blended rows appear where the
    # genuine fit had segment-broken (no re-fit happened)
    coreg = spark.read.parquet(f"{workdir}/out/coregister")
    forged = coreg.select(
        "pair", "group_a", "group_b", "n_points", "iters",
        F.lit(0.0).alias("dz"), F.lit(0.0).alias("dx"), F.lit(0.0).alias("dy"),
        F.lit(0.0).alias("rmse"), F.lit("ok").alias("status"), "unit")
    forged.write.mode("overwrite").parquet(f"{workdir}/out/coregister_new")
    shutil.rmtree(Path(workdir) / "out" / "coregister")
    Path(workdir, "out", "coregister_new").rename(
        Path(workdir, "out", "coregister"))
    man = spark.read.parquet(f"{workdir}/manifest")
    kept = man.where("stage <> 'strip_assemble'")
    kept.write.mode("overwrite").parquet(f"{workdir}/manifest_new")
    shutil.rmtree(Path(workdir) / "manifest")
    Path(workdir, "manifest_new").rename(Path(workdir, "manifest"))

    r3 = run_pipeline(spark, SF, workdir)
    assert {s["stage"]: s["units_run"] for s in r3}["strip_assemble"] > 0
    assert {s["stage"]: s["units_run"] for s in r3}["coregister"] == 0
    strip3 = spark.read.parquet(f"{workdir}/out/strip_assemble")
    assert strip3.where("NOT segment_break").count() > 0
    assert strip3.where("segment_break").count() == 0


def test_registry_cache_release(spark):
    """Cache hygiene for the heavy registered queries: repeated registry
    invocations must not ACCUMULATE persisted tables (Spark's CacheManager
    dedupes identical plans; the tracked-handle registry proves it), and
    release_caches() must return the session to its pre-call baseline —
    no persisted table survives once the caller has materialized and
    released. Release is caller-owned, not automatic: the bench's
    warm-pass protocol relies on re-invocations reusing these caches."""
    from setsm_postprocessing_python_spark.plans import queries_ext as QX

    jsc = spark.sparkContext._jsc

    def n_persisted():
        return jsc.getPersistentRDDs().size()

    QX.release_caches()  # drop anything an earlier test left behind
    base = n_persisted()

    QX.q_strip_assembly(spark, SF).count()
    QX.q_ann_dedup(spark, SF).count()
    first = n_persisted()
    assert first > base, "expected tracked caches while results are live"

    # repeat invocations: identical plans re-persist into the SAME cache
    # entries — the persisted count must not grow
    QX.q_strip_assembly(spark, SF).count()
    QX.q_ann_dedup(spark, SF).count()
    assert n_persisted() == first, "registry re-invocation accumulated caches"

    QX.release_caches()
    assert n_persisted() == base, "release_caches left persisted tables"
    QX.release_caches()  # idempotent
    assert n_persisted() == base
