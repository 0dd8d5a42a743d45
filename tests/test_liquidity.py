"""enrich_liquidity_events — LP-transfer-chain wallet resolution parity
(reference enrich_dex_trades_job.py:141-263, 374-477)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ethereum_etl_spark.operators.liquidity import enrich_liquidity_events

NULL = "0x" + "0" * 40
POOL = "0x" + "aa" * 20
POOL2 = "0x" + "bb" * 20
T0, T1 = "0x" + "1" * 40, "0x" + "2" * 40
W1, W2, W3, ROUTER = (
    "0x" + "c1" * 20,
    "0x" + "c2" * 20,
    "0x" + "c3" * 20,
    "0x" + "dd" * 20,
)

TRADE_DDL = (
    "block_number long, transaction_hash string, log_index int,"
    "pool_address string, event_type string, token_amounts array<double>,"
    "token_reserves array<double>, prices_stable array<double>,"
    "token_addresses array<string>, factory_address string, amm string"
)
TRANSFER_DDL = (
    "transaction_hash string, log_index int, block_number long,"
    "token_address string, from_address string, to_address string, value double"
)
POOL_DDL = "address string, lp_token_addresses array<string>"
TOKEN_DDL = "address string, decimals int, total_supply double"


def _trade(tx, li, event_type, pool=POOL, amounts=(10.0, 20.0)):
    return (
        100, tx, li, pool, event_type, list(amounts),
        [100.0, 200.0], [1.0, 2.0], [T0, T1], "0xfac", "uniswap_v2",
    )


def _run(spark, trades, transfers, pools=None, tokens=None):
    pools = pools or [(POOL, [POOL]), (POOL2, [POOL2])]
    tokens = tokens or [(POOL, 18, 1e21), (POOL2, 18, 2e21)]
    out = enrich_liquidity_events(
        spark.createDataFrame(trades, TRADE_DDL),
        spark.createDataFrame(transfers, TRANSFER_DDL),
        spark.createDataFrame(pools, POOL_DDL),
        spark.createDataFrame(tokens, TOKEN_DDL),
    )
    return {
        (r["transaction_hash"], r["log_index"], r["wallet_address"]): r
        for r in out.collect()
    }


def test_direct_mint_and_lp_leg(spark):
    # LP minted NULL -> W1: wallet = W1; LP leg appended with supply pricing
    rows = _run(
        spark,
        [_trade("t1", 5, "mint")],
        [("t1", 10, 100, POOL, NULL, W1, 7e18)],
    )
    assert list(rows) == [("t1", 5, W1)]
    r = rows[("t1", 5, W1)]
    assert r["token_addresses"] == [T0, T1, POOL]
    assert r["token_amounts"] == [10.0, 20.0, 7.0]
    # amount_stable excludes the LP leg: 10*1 + 20*2
    assert r["amount_stable"] == pytest.approx(50.0)
    # supply = 1e21/1e18 = 1000; lp_price = (100*1 + 200*2)/1000 = 0.5
    assert r["token_reserves"] == [100.0, 200.0, 1000.0]
    assert r["prices_stable"][2] == pytest.approx(0.5)
    assert r["reserves_stable"] == pytest.approx([100.0, 400.0, 500.0])


def test_routed_mint_walks_chain(spark):
    # NULL -> ROUTER -> W2: terminal wallet wins
    rows = _run(
        spark,
        [_trade("t2", 5, "mint")],
        [
            ("t2", 10, 100, POOL, NULL, ROUTER, 1e18),
            ("t2", 11, 100, POOL, ROUTER, W2, 1e18),
        ],
    )
    assert list(rows) == [("t2", 5, W2)]


def test_burn_walks_upstream(spark):
    # W1 -> ROUTER -> NULL: burn chains start at the NULL end and walk back
    rows = _run(
        spark,
        [_trade("t3", 5, "burn")],
        [
            ("t3", 10, 100, POOL, W1, ROUTER, 1e18),
            ("t3", 11, 100, POOL, ROUTER, NULL, 1e18),
        ],
    )
    assert list(rows) == [("t3", 5, W1)]


def test_prorating_multiple_events_and_transfers(spark):
    # two mints share the lp token; two LP mints to different wallets:
    # merged amounts (30, 60) pro-rated 1:3
    rows = _run(
        spark,
        [_trade("t4", 5, "mint"), _trade("t4", 6, "mint", amounts=(20.0, 40.0))],
        [
            ("t4", 10, 100, POOL, NULL, W1, 1e18),
            ("t4", 11, 100, POOL, NULL, W2, 3e18),
        ],
    )
    assert set(rows) == {("t4", 5, W1), ("t4", 5, W2)}
    r1, r2 = rows[("t4", 5, W1)], rows[("t4", 5, W2)]
    assert r1["token_amounts"][:2] == pytest.approx([7.5, 15.0])
    assert r2["token_amounts"][:2] == pytest.approx([22.5, 45.0])
    assert r1["token_amounts"][2] == pytest.approx(1.0)
    assert r2["token_amounts"][2] == pytest.approx(3.0)


def test_single_event_keeps_full_amounts(spark):
    # one event, two transfers: amounts NOT pro-rated (reference :181-185)
    rows = _run(
        spark,
        [_trade("t5", 5, "mint")],
        [
            ("t5", 10, 100, POOL, NULL, W1, 1e18),
            ("t5", 11, 100, POOL, NULL, W2, 3e18),
        ],
    )
    assert rows[("t5", 5, W1)]["token_amounts"][:2] == [10.0, 20.0]
    assert rows[("t5", 5, W2)]["token_amounts"][:2] == [10.0, 20.0]


def test_null_to_null_uses_first_transfer(spark):
    # LP moved NULL -> NULL: wallet = the tx's FIRST transfer's from_address
    rows = _run(
        spark,
        [_trade("t6", 5, "mint")],
        [
            ("t6", 9, 100, T0, W3, POOL, 5.0),  # first transfer of the tx
            ("t6", 10, 100, POOL, NULL, NULL, 1e18),
        ],
    )
    assert list(rows) == [("t6", 5, W3)]


def test_transfer_cap_drops_transaction(spark):
    transfers = [("t7", 10, 100, POOL, NULL, W1, 1e18)] + [
        ("t7", 100 + i, 100, T0, W1, W2, 1.0) for i in range(501)
    ]
    assert _run(spark, [_trade("t7", 5, "mint")], transfers) == {}


def test_no_transfers_drops_event(spark):
    assert _run(spark, [_trade("t8", 5, "mint")], []) == {}


def test_merges_same_terminal_wallet(spark):
    # two chains ending at W1 merge into ONE row with summed LP value
    rows = _run(
        spark,
        [_trade("t9", 5, "mint")],
        [
            ("t9", 10, 100, POOL, NULL, W1, 2e18),
            ("t9", 11, 100, POOL, NULL, ROUTER, 3e18),
            ("t9", 12, 100, POOL, ROUTER, W1, 3e18),
        ],
    )
    assert list(rows) == [("t9", 5, W1)]
    assert rows[("t9", 5, W1)]["token_amounts"][2] == pytest.approx(5.0)


def test_unknown_pool_skipped(spark):
    rows = _run(
        spark,
        [_trade("t10", 5, "mint", pool="0x" + "ee" * 20)],
        [("t10", 10, 100, "0x" + "ee" * 20, NULL, W1, 1e18)],
        pools=[(POOL, [POOL])],
    )
    assert rows == {}


def test_plan_no_row_python(spark):
    # the only Python in the plan is the Arrow cogroup (FlatMapCoGroups…),
    # never row-at-a-time BatchEvalPython
    out = enrich_liquidity_events(
        spark.createDataFrame([_trade("t1", 5, "mint")], TRADE_DDL),
        spark.createDataFrame(
            [("t1", 10, 100, POOL, NULL, W1, 1e18)], TRANSFER_DDL
        ),
        spark.createDataFrame([(POOL, [POOL])], POOL_DDL),
        spark.createDataFrame([(POOL, 18, 1e21)], TOKEN_DDL),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
