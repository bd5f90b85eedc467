"""Spark-vs-DuckDB comparison harness mirroring the driver's correctness
gate: row count + sorted-column value equality per query."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con.execute(sql).df()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], bytes):
            df[c] = df[c].apply(lambda b: b.hex())
    return df.sort_values(by=list(df.columns), ignore_index=True)


def assert_frames_match(spark_df, duck_df: pd.DataFrame, name: str = "",
                        float_exact: bool = True):
    sp = normalize(spark_df.toPandas())
    dk = normalize(duck_df)
    assert len(sp) == len(dk), f"{name}: rowcount {len(sp)} != {len(dk)}"
    assert list(sp.columns) == list(dk.columns), \
        f"{name}: columns {list(sp.columns)} != {list(dk.columns)}"
    for c in sp.columns:
        a, b = sp[c].to_numpy(), dk[c].to_numpy()
        if np.issubdtype(sp[c].dtype, np.floating):
            if float_exact:
                ok = (a == b) | (np.isnan(a.astype(float)) & np.isnan(b.astype(float)))
            else:
                ok = np.isclose(a.astype(float), b.astype(float),
                                rtol=1e-9, atol=1e-12, equal_nan=True)
            assert ok.all(), f"{name}.{c}: float mismatch at {np.flatnonzero(~ok)[:5]}"
        else:
            mism = a.astype(str) != b.astype(str)
            assert not mism.any(), \
                f"{name}.{c}: mismatch at rows {np.flatnonzero(mism)[:5]}: " \
                f"{a[mism][:3]} vs {b[mism][:3]}"
