"""OHLCV candle aggregation (A1) + incremental count aggregates (A2-A4).

Re-expression of the ClickHouse candle MVs
(/root/reference/db/migrations/schema.sql:92-146 for 1d; same shape
1m/5m/1h at :170-308): per (series key, time bucket):
open/close = value at min/max (ts, tiebreak) — deterministic argmin/argmax;
high/low = max/min; volume = sum(abs); trades = count.

Spark shape: one groupBy per granularity on (key, window(ts)) with
min_by/max_by over a unique ordering struct — map-side partial agg, single
shuffle. Multi-resolution = GROUPING SETS or independent aggs; here the
caller picks the bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ohlcv(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    bucket: str = "1 hour",
) -> DataFrame:
    """Deterministic OHLCV candles; ``tiebreak_col`` must make (ts, tiebreak)
    unique so open/close are well-defined (trace of schema.sql:115-127
    argMin/argMax over Tuple(ts, value))."""
    order = F.struct(F.col(ts_col), F.col(tiebreak_col))
    w = F.window(ts_col, bucket)
    return (
        df.groupBy(F.col(key_col), w.alias("w"))
        .agg(
            F.min_by(value_col, order).alias("open"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.max_by(value_col, order).alias("close"),
            F.sum(F.abs(F.col(value_col))).alias("volume"),
            F.count(F.lit(1)).alias("trades"),
        )
        .select(
            key_col,
            F.col("w.start").alias("bucket_start"),
            "open",
            "high",
            "low",
            "close",
            "volume",
            "trades",
        )
    )


def approx_uniques(df: DataFrame, group_col: str, value_col: str, rsd: float = 0.05) -> DataFrame:
    """A2/A3 chain_counts analog (schema.sql:390-397): approximate distinct,
    incrementally mergeable — HLL sketch under the hood."""
    return df.groupBy(group_col).agg(
        F.approx_count_distinct(value_col, rsd).alias("approx_uniques")
    )


def salted_sum(df: DataFrame, group_col: str, value_col: str, salt_buckets: int = 16) -> DataFrame:
    """Skew-safe two-stage aggregation (SURVEY §4 skew handling): partial sum
    on (key, salt) then final sum on key. Identical result to a direct
    groupBy; bounded partition size under hot keys."""
    partial = df.groupBy(
        F.col(group_col), F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)).alias("__salt")
    ).agg(F.sum(value_col).alias("__psum"))
    return partial.groupBy(group_col).agg(F.sum("__psum").alias(f"sum_{value_col}"))
