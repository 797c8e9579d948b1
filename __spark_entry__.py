"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual catalog lives in ``archive_to_parquet_spark/queries.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from archive_to_parquet_spark import queries as _catalog  # noqa: E402
from archive_to_parquet_spark.session import ensure_package_shipped  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: reference dataflow (project+hash → filter → dedup →
    per-source counters) over sf0.001 documents."""
    ensure_package_shipped(spark)
    return _catalog.flagship(spark, "/root/testdata/sf0.001")


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        # the driver's session isn't ours — make the package importable
        # on its executor workers before any pandas_udf/mapInPandas runs
        ensure_package_shipped(spark)
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, fn in _catalog.queries().items()}


def oracle_sql() -> dict[str, str]:
    return _catalog.oracle_sql()
