"""batch_mask nodata policy family: per-policy semantics on a hand-built
fixture (reference batch_mask.py:944-958)."""

from __future__ import annotations

import pytest

from setsm_postprocessing_python_spark.operators.flags import (
    nodata_policy_stats)

# rows: (group, z, flags)  — z<10 carries the src nodata sentinel
ROWS = [
    ("g", 50.0, 0),   # live
    ("g", 30.0, 1),   # masked
    ("g", 5.0, 0),    # src-nodata, unmasked
    ("g", 2.0, 4),    # src-nodata, masked (overwritten by maskval)
    ("g", 20.0, 0),   # live
]
# a=2 masked, b=1 unmasked-src-nodata, s_src=70, s_ns=75
EXPECT = {
    # (policy, has_src): (nodata_val, n_nodata, sum_live)
    ("same", True): (-1.0, 1, 70.0 + 2 * -9999.0),
    ("add", True): (-1.0, 1, 70.0 + 2 * -9999.0),
    ("switch", True): (-9999.0, 2, 70.0 + 1 * -1.0),
    ("convert", True): (-9999.0, 3, 70.0),
    ("unset", True): (None, 0, 70.0 + 2 * -9999.0 + 1 * -1.0),
    ("same", False): (None, 0, 75.0 + 2 * -9999.0),
    ("add", False): (-9999.0, 2, 75.0),
    ("switch", False): (-9999.0, 2, 75.0),
    ("convert", False): (-9999.0, 2, 75.0),
    ("unset", False): (None, 0, 75.0 + 2 * -9999.0),
}


def test_nodata_policy_family(spark):
    df = spark.createDataFrame(ROWS, "group_id string, z double, flags int")
    got = {(r.policy, r.has_src_nodata):
           (r.nodata_val, r.n_nodata, r.sum_live)
           for r in nodata_policy_stats(df).collect()}
    assert set(got) == set(EXPECT)
    for k, (nv, nn, sl) in EXPECT.items():
        gnv, gnn, gsl = got[k]
        assert gnv == pytest.approx(nv) if nv is not None else gnv is None, k
        assert gnn == nn, k
        assert gsl == pytest.approx(sl), k
