"""Bench bookkeeping invariants (pure python, no Spark): the recorded
numbers the per-round grading reads must be protected against the two
ways a record can lie — a stage-subset run sharing a full-suite history
rev, and incomparable scaling experiments min-merging into one
efficiency figure."""

from __future__ import annotations

import importlib.util
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load_bench(monkeypatch=None, **env):
    for k in list(os.environ):
        if k.startswith("SPARK_GRAFT"):
            os.environ.pop(k)
    os.environ.update(env)
    spec = importlib.util.spec_from_file_location("bench_under_test",
                                                  REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_subset_runs_key_their_own_rev():
    full = _load_bench()
    sub = _load_bench(SPARK_GRAFT_STAGES="knn, ann_dedup")
    assert full.BENCH_REV != sub.BENCH_REV
    assert sub.BENCH_REV.startswith(full.BENCH_REV + "-sub.")
    assert "ann_dedup" in sub.BENCH_REV and "knn" in sub.BENCH_REV


def test_curve_merge_same_protocol_takes_per_level_min():
    b = _load_bench()
    rows = [{"n_rows": 4, "layout": "bucketed", "scale_n": 2, "reps": 2,
             "t_n": 40.0, "t_4n": 18.0, "eff": 0.556, "pps_4n": 100.0}]
    out = b._merge_curve_row(rows, {
        "n_rows": 4, "layout": "bucketed", "scale_n": 2, "reps": 2,
        "t_n": 42.0, "t_4n": 12.0, "eff": 0.875, "pps_4n": 150.0})
    assert len(out) == 1
    r = out[0]
    assert (r["t_n"], r["t_4n"]) == (40.0, 12.0)  # per-LEVEL min
    assert abs(r["eff"] - (40.0 / 12.0) / 4.0) < 1e-3  # rounded to 3 dp
    assert r["reps"] == 4  # provenance accumulates


def test_curve_merge_different_protocol_keys_new_row():
    b = _load_bench()
    base = {"n_rows": 4, "layout": "bucketed", "scale_n": 2, "reps": 2,
            "t_n": 40.0, "t_4n": 18.0, "eff": 0.556, "pps_4n": 100.0}
    for delta in ({"layout": "flat"}, {"scale_n": 8}, {"n_rows": 16}):
        out = b._merge_curve_row([dict(base)], {**base, **delta,
                                                "t_n": 1.0, "t_4n": 0.5})
        assert len(out) == 2, f"{delta} must NOT merge"
    # legacy row without scale_n never merges with a keyed row
    legacy = {k: v for k, v in base.items() if k != "scale_n"}
    out = b._merge_curve_row([legacy], dict(base))
    assert len(out) == 2
