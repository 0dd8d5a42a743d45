"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query smoke check on sf0.001.
queries()     — operator registry (SURVEY.md §2 + training-data ops), each
                (spark, sf_dir) -> DataFrame.
oracle_sql()  — DuckDB-equivalent ANSI SQL per query (omitted for the
                rows-only non-SQL-expressible ops).

Implementations live in ethereum_etl_spark.plans.harness_queries; this file
stays a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ethereum_etl_spark.plans.harness_queries import ORACLES, QUERIES  # noqa: E402
from ethereum_etl_spark.session import _ship_package  # noqa: E402


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        # the driver may hand us a session it built itself: ship the package
        # zip so executor-side UDF closures resolve module references
        _ship_package(spark)
        return fn(spark, sf_dir)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: OHLCV candle aggregation over the events stream at
    sf0.001 (A1 — the reference's candle MVs, schema.sql:92-146)."""
    _ship_package(spark)
    return QUERIES["q09_ohlcv_candles"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
