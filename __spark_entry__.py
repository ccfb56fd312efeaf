"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship exact point-in-polygon join (compacted-polyfill
broadcast build + boundary refinement) over derived geography on
sf0.001. queries()/oracle_sql(): one entry per implemented operator
(SURVEY.md §2 + training-data ops); H3-kernel queries are rows-only
(DuckDB has no H3) with correctness carried by tests/test_h3_goldens.py
and the numpy oracles in tests/test_operators.py.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(_REPO))

from h3_rs_spark import queries as Q  # noqa: E402


def _ensure_workers_can_import(spark: SparkSession) -> None:
    """Executor python workers don't inherit the driver's sys.path; ship
    the package zip so pandas UDFs unpickle when the harness launches
    from any cwd."""
    from h3_rs_spark.session import ship_package

    ship_package(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_workers_can_import(spark)
    return Q.q26_pip_polygons(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_workers_can_import(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, (fn, _sql) in Q.catalog().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql for name, (_fn, sql) in Q.catalog().items() if sql is not None
    }
