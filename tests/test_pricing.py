"""Pricing as-of de-skew (VERDICT r2 'what's wrong #1'): the bucketed
window must (a) return EXACTLY what the naive bare-token window returned,
across bucket boundaries, carries over empty buckets, and in-bucket marks;
(b) never plan a window partitioned on the bare token column."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from ethereum_etl_spark.operators.pricing import (
    attach_stable_price,
    enrich_trades_usd,
    stable_price_marks,
)

STABLE = "0x" + "5" * 40
TOK_A = "0x" + "a" * 40
TOK_B = "0x" + "b" * 40


def _marks(spark):
    # marks for TOK_A at blocks 3, 9, 40 (gap over buckets 2-4 at bucket=7),
    # TOK_B only at block 65; nothing for TOK_C
    rows = [
        (TOK_A, 3, 1, 2.0),
        (TOK_A, 9, 0, 2.5),
        (TOK_A, 40, 2, 3.0),
        (TOK_B, 65, 5, 10.0),
    ]
    return spark.createDataFrame(
        rows, "token_address string, block_number long, log_index int, price_stable double"
    )


def _probes(spark):
    # probes before any mark, exactly AT a mark, between marks, in empty
    # carry buckets, after the last mark
    rows = [
        (i, TOK_A, b, li)
        for i, (b, li) in enumerate(
            [(1, 0), (3, 0), (3, 1), (3, 2), (9, 0), (20, 7), (39, 9),
             (40, 2), (41, 0), (99, 3)]
        )
    ] + [(100, TOK_B, 64, 0), (101, TOK_B, 66, 0), (102, STABLE, 50, 0)]
    return spark.createDataFrame(
        rows, "rid long, token_address string, block_number long, log_index int"
    )


def _collect(df):
    return sorted(
        (r["rid"], r["price_stable"]) for r in df.collect()
    )


def test_bucketed_asof_equals_single_window(spark):
    marks, probes = _marks(spark), _probes(spark)
    small = attach_stable_price(probes, marks, [STABLE], block_bucket=7)
    # block_bucket larger than the whole range ≡ the original single-window
    big = attach_stable_price(probes, marks, [STABLE], block_bucket=10**9)
    assert _collect(small) == _collect(big)
    got = dict(_collect(small))
    assert got[0] == 0.0          # before any mark
    assert got[2] == 2.0          # exactly at the mark (same block+log)
    assert got[5] == 2.5          # carried across empty buckets
    assert got[9] == 3.0          # long after last mark
    assert got[102] == 1.0        # stablecoin → 1.0


def test_enrich_trades_usd_bucketed_equivalence(spark):
    trades = spark.createDataFrame(
        [
            (b, f"0xt{b}", li, "0xp", "swap", [1.0, -2.0], [p0, 1.0 / p0 if p0 else 0.0],
             [TOK_A, STABLE])
            for b, li, p0 in [(2, 0, 4.0), (9, 1, 5.0), (30, 0, 0.0), (80, 2, 6.0)]
        ],
        "block_number long, transaction_hash string, log_index int, pool_address string,"
        "event_type string, token_amounts array<double>, token_prices array<double>,"
        "token_addresses array<string>",
    )
    cols = ["transaction_hash", "log_index", "prices_stable", "amount_stable"]

    def rows(bucket):
        out = enrich_trades_usd(trades, [STABLE], block_bucket=bucket)
        return sorted(tuple(r[c] for c in cols) for r in out.select(*cols).collect())

    assert rows(7) == rows(10**9)


def _window_partitions(df):
    """[(partition_cols, order_cols)] for every windowspecdefinition."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    parts = []
    for s in specs:
        args = [a.strip() for a in s.split(",")]
        cols, order = [], []
        for a in args:
            if a.startswith("specifiedwindowframe"):
                break
            if " ASC" in a or " DESC" in a:
                order.append(a.split("#")[0])
            else:
                cols.append(a.split("#")[0])
        parts.append((tuple(cols), tuple(order)))
    return parts


def test_no_bare_token_window_in_priced_paths(spark):
    marks, probes = _marks(spark), _probes(spark)
    for df in [
        attach_stable_price(probes, marks, [STABLE]),
        enrich_trades_usd(
            spark.createDataFrame(
                [(1, "0xt", 0, "0xp", "swap", [1.0, -1.0], [1.0, 1.0], [TOK_A, STABLE])],
                "block_number long, transaction_hash string, log_index int,"
                "pool_address string, event_type string, token_amounts array<double>,"
                "token_prices array<double>, token_addresses array<string>",
            ),
            [STABLE],
        ),
    ]:
        for cols, order in _window_partitions(df):
            if any(c in ("__tok", "token_address") for c in cols):
                # a bare-token partition is only allowed on the tiny
                # bucket-domain carry window (ordered by __bkt); the
                # probe-volume windows must carry __bkt in the KEY
                assert "__bkt" in cols or (order and order[0] == "__bkt"), (
                    f"bare-token window over probe rows: {cols} / {order}"
                )


def test_approx_uniques_tolerance(spark):
    """A2/A3 (VERDICT r2 'what's wrong #5'): the HLL estimate must sit
    within the advertised rsd band of the exact distinct count."""
    from pyspark.sql import functions as F2

    from ethereum_etl_spark.operators.candles import approx_uniques

    df = spark.range(100_000).select(
        (F2.col("id") % 7).alias("g"),
        (F2.xxhash64("id") % (F2.col("id") % 7 * 1000 + 50)).alias("v"),
    )
    exact = {r["g"]: r["c"] for r in df.groupBy("g").agg(F2.countDistinct("v").alias("c")).collect()}
    approx = {r["g"]: r["approx_uniques"] for r in approx_uniques(df, "g", "v", rsd=0.05).collect()}
    assert set(exact) == set(approx)
    for g, e in exact.items():
        assert abs(approx[g] - e) <= max(3 * 0.05 * e, 2), (g, e, approx[g])
