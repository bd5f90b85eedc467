"""Layout A/B: the bucketed pages table vs the flat parquet, measured.

Companion to tests/test_plan_shapes.py::test_bucketed_layout_* — the
pytest proves the Exchange disappears from the PLAN; this script measures
what that is worth in wall-clock on the amplified bench corpus, plus the
one-time cost of the layout write itself (the number a 100 TB operator
needs to amortize).

Stages (each flat vs bucketed, same session, min over passes):
  cell_join  — block equi-join pair rollup (the strip-overlap shape)
  knn        — knn_join_blocked at the native grid (the bench knn stage)

Broadcast is pinned OFF for the A/B: at 10^12 rows neither side of these
joins broadcasts, so the shuffle-join plan is the one whose cost matters.

Usage: python scripts/bench_bucketed.py
Writes one JSON line to stdout + BENCH/bucketed_layout.jsonl, and
regenerates BENCH/BUCKETED.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from bench import AMP, BENCH_PASSES, CPUS, EMB_AMP, SF_DIR, amplified_dir, \
    materialize  # noqa: E402


from setsm_postprocessing_python_spark.plans.planview import \
    n_exchanges as _n_exchanges  # noqa: E402


def main() -> int:
    import pyspark.sql.functions as F

    from setsm_postprocessing_python_spark.operators.knn import (
        knn_join_blocked)
    from setsm_postprocessing_python_spark.session import get_spark
    from setsm_postprocessing_python_spark.sources import bucketed as B

    spark = get_spark(parallelism=CPUS, app_name="bench_bucketed")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    bench_dir = amplified_dir(spark, SF_DIR, AMP, EMB_AMP)

    table_name = "bench_pages_bucketed"
    flat = B.blocked_pages(spark, bench_dir)
    t0 = time.time()
    tbl = B.write_bucketed(spark, flat, "/tmp/bench_bucketed_pages",
                           table=table_name, n_buckets=32)
    layout_write_s = round(time.time() - t0, 3)

    def cell_join(d):
        left = d.select(F.col("url").alias("ua"), "block")
        right = d.select(F.col("url").alias("ub"), "block")
        return (left.join(right, "block").where("ua < ub")
                .groupBy("block").agg(F.count(F.lit(1)).alias("n_pairs")))

    def knn(d, lname):
        # the stored-block flag is keyed off the LAYOUT NAME, not object
        # identity: both layouts carry a `block` column, so an identity
        # check (`d is tbl`) would silently benchmark the bucketed layout
        # with the stored-block path off after any refactor that rebuilds
        # the frame (e.g. re-reading the table)
        return knn_join_blocked(d, k=3, ring=1,
                                use_stored_block=(lname == "bucketed"))

    stages = {"cell_join": lambda d, lname: cell_join(d), "knn": knn}
    layouts = {"flat": flat, "bucketed": tbl}
    times: dict[str, float] = {}
    exchanges: dict[str, int] = {}
    for _ in range(max(1, BENCH_PASSES)):
        for sname, fn in stages.items():
            for lname, d in layouts.items():
                key = f"{sname}_{lname}"
                t = time.time()
                materialize(fn(d, lname))
                times[key] = min(times.get(key, float("inf")),
                                 round(time.time() - t, 3))
    for sname, fn in stages.items():
        for lname, d in layouts.items():
            exchanges[f"{sname}_{lname}"] = _n_exchanges(fn(d, lname))
    # sanity: identical results across layouts
    for sname, fn in stages.items():
        a = fn(flat, "flat")
        cols = a.columns
        b = fn(tbl, "bucketed")
        assert (b.select(cols).exceptAll(a.select(cols)).isEmpty()
                and a.select(cols).exceptAll(b.select(cols)).isEmpty()), \
            f"{sname}: layouts disagree"

    n_pages = spark.read.parquet(f"{bench_dir}/documents.parquet").count()
    result = {
        "metric": "bucketed-vs-flat layout wall-clock",
        "sf": SF_DIR, "amp": AMP, "pages": n_pages,
        "layout_write_s": layout_write_s,
        "times_s": times, "n_exchanges": exchanges,
        "speedup": {s: round(times[f"{s}_flat"] / times[f"{s}_bucketed"], 3)
                    for s in stages},
    }
    line = json.dumps(result)
    print(line)
    bdir = REPO / "BENCH"
    bdir.mkdir(exist_ok=True)
    with (bdir / "bucketed_layout.jsonl").open("a") as f:
        f.write(json.dumps({"ts": time.time(), **result}) + "\n")
    # regenerate BUCKETED.md from the FULL history (latest record per
    # amplification), so multi-scale runs accumulate instead of clobber
    latest: dict[int, dict] = {}
    for ln in (bdir / "bucketed_layout.jsonl").read_text().splitlines():
        try:
            r = json.loads(ln)
        except json.JSONDecodeError:
            continue
        latest[int(r.get("pages", 0))] = r  # key by corpus size
    md = [
        "# Bucketed layout A/B (flat parquet vs bucketBy(32, block))",
        "",
        "Broadcast pinned off (the 10^12-row regime); min over "
        f"{BENCH_PASSES} passes; latest record per corpus scale "
        "(raw history in bucketed_layout.jsonl). Plan shapes pinned by "
        "tests/test_plan_shapes.py::test_bucketed_layout_*.",
    ]
    for pages_key in sorted(latest):
        r = latest[pages_key]
        md += [
            "",
            f"## {r['pages']} pages (AMP={r['amp']}) — layout write "
            f"{r['layout_write_s']}s one-time",
            "",
            "| stage | flat s | bucketed s | speedup | exchanges "
            "flat→bucketed |",
            "|---|---|---|---|---|",
        ]
        for st in ("cell_join", "knn"):
            md.append(
                f"| {st} | {r['times_s'][f'{st}_flat']} | "
                f"{r['times_s'][f'{st}_bucketed']} | "
                f"{r['speedup'][st]}x | {r['n_exchanges'][f'{st}_flat']} "
                f"→ {r['n_exchanges'][f'{st}_bucketed']} |")
    md += [
        "",
        "The eliminated Exchange is the data-proportional network phase of",
        "the join, so the speedup GROWS with corpus size while the one-time",
        "layout write grows sub-linearly. Residual in-partition Sorts",
        "remain by design (Spark 3+ ignores bucket sort order unless the",
        "legacy scan-ordering flag is set); they are local CPU, not",
        "network.",
    ]
    (bdir / "BUCKETED.md").write_text("\n".join(md) + "\n")
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
