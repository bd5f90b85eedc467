"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship query (geocode -> PIP tile assign -> tile rollup) at
sf0.001. queries()/oracle_sql(): per-operator DataFrame callables and their
DuckDB-oracle twins (see setsm_postprocessing_python_spark/plans/queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from setsm_postprocessing_python_spark.plans import queries as Q
from setsm_postprocessing_python_spark.plans import queries_ext as QX
from setsm_postprocessing_python_spark.plans import queries_ref as QR


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: geocode pages, assign
    quad-tree tiles via broadcast PIP, roll up per-tile page/host counts."""
    return Q.q_tile_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {**Q.QUERIES, **QX.QUERIES, **QR.QUERIES}


def oracle_sql() -> dict[str, str]:
    return {**Q.ORACLES, **QX.ORACLES, **QR.ORACLES}
