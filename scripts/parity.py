"""Fast local parity check: python scripts/parity.py [sf_dir] q_a q_b ...

Runs the named queries() entries against their oracle_sql() twins (all
queries if none named). Mirrors the driver's comparison via
tests/oracle_compare.py. Keep one Spark session across queries for speed.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and args[0].startswith("/"):
        sf_dir, args = args[0], args[1:]

    import __spark_entry__ as E
    from tests.oracle_compare import assert_frames_match, duckdb_run

    from setsm_postprocessing_python_spark.session import get_spark

    spark = get_spark(parallelism=8, app_name="parity", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = E.queries(), E.oracle_sql()
    names = args or list(qs)
    failed = []
    for name in names:
        if name not in qs:
            print(f"{name}: NOT REGISTERED")
            failed.append(name)
            continue
        try:
            sdf = qs[name](spark, sf_dir)
            if name in osql:
                assert_frames_match(sdf, duckdb_run(osql[name], sf_dir), name)
                n = sdf.count()
                print(f"{name}: MATCH ({n} rows)")
            else:
                print(f"{name}: rows-only {sdf.count()}")
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{name}: FAIL {type(e).__name__}: {e}")
            failed.append(name)
    print(f"== {len(names) - len(failed)}/{len(names)} ok ==")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
