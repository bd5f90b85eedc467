"""Regenerate golden-parquet oracle fixtures for procedural operators.

Usage: python scripts/make_goldens.py [q_name ...]   (no args = all)

For each query in plans/queries_ext.py:GOLDEN_COLS, runs the registered
Spark query at sf0.001 and sf0.01 and writes a single parquet per (query,
sf) under tests/fixtures/goldens/, stamped with sf_key = sum(n_chars) of
the documents table (a content-derived scalar — sf0.001 and sf0.01 share
the same ROW COUNT but not content) so one oracle SQL string serves both
scales (see golden_oracle()).

These are REGRESSION oracles: the operators' semantics are validated by
independent numpy cross-implementations in tests/ (test_merge_order,
test_coreg_similarity, test_hexgrid, test_s2, test_footprint,
test_feather_field); the goldens freeze those validated outputs so the
driver can hash-compare them every round.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
OUT = REPO / "tests" / "fixtures" / "goldens"


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as E
    from setsm_postprocessing_python_spark.plans.queries_ext import GOLDEN_COLS
    from setsm_postprocessing_python_spark.session import get_spark

    spark = get_spark(parallelism=8, app_name="make_goldens",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    OUT.mkdir(parents=True, exist_ok=True)
    from setsm_postprocessing_python_spark.plans.queries_ext import (
        EMB_GOLDEN_COLS, EMB_KEY_EXPR_SPARK)

    from setsm_postprocessing_python_spark.plans.queries_ext import (
        hex_knn_stitched)

    # partial goldens: callables whose output backs only PART of a
    # registered query's oracle (the rest is live SQL)
    partials = {"q_hex_knn_stitched": hex_knn_stitched}

    qs = E.queries()
    for sf_dir in SF_DIRS:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        sf_key = docs.agg({"n_chars": "sum"}).first()[0]
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        emb_key = emb.selectExpr(EMB_KEY_EXPR_SPARK).first()[0]
        only = set(sys.argv[1:])
        for name, key in ([(n, sf_key) for n in GOLDEN_COLS]
                          + [(n, emb_key) for n in EMB_GOLDEN_COLS]
                          + [(n, sf_key) for n in partials]):
            if only and name not in only:
                continue
            fn = partials.get(name) or qs[name]
            pdf = fn(spark, sf_dir).toPandas()
            pdf["sf_key"] = key
            path = OUT / f"{name}_sf{key}.parquet"
            pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                           path)
            print(f"wrote {path} ({len(pdf)} rows)")


if __name__ == "__main__":
    main()
