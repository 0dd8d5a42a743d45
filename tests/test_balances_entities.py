from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from ethereum_etl_spark.operators.balances import (
    native_balances_from_transactions,
    token_balances_from_transfers,
)
from ethereum_etl_spark.sources.wal import ChainWalSpec, WalTailer, generate_chain_wal
from ethereum_etl_spark.streaming import ChainStreamer, StreamerConfig


def test_token_balances_cumulative_with_carry(spark):
    rows = [
        # (token, std, from, to, value, block, token_id)
        ("0xt1", "ERC-20", "0xa", "0xb", Decimal(100), 1, None),
        ("0xt1", "ERC-20", "0xb", "0xc", Decimal(40), 2, None),
        ("0xt1", "ERC-20", "0x0000000000000000000000000000000000000000", "0xa", Decimal(7), 2, None),  # mint
    ]
    tt = spark.createDataFrame(
        rows,
        "token_address string, token_standard string, from_address string,"
        "to_address string, value decimal(38,0), block_number long, token_id decimal(38,0)",
    ).withColumn("transaction_hash", F.lit("0xh")).withColumn("log_index", F.lit(1))
    out = token_balances_from_transfers(tt)
    got = {(r["holder_address"], r["block_number"]): int(r["value"]) for r in out.collect()}
    assert got[("0xa", 1)] == -100
    assert got[("0xb", 1)] == 100
    assert got[("0xb", 2)] == 60  # 100 - 40
    assert got[("0xc", 2)] == 40
    assert got[("0xa", 2)] == -93  # -100 + 7 mint; burn side skipped
    assert ("0x0000000000000000000000000000000000000000", 2) not in got

    carry = spark.createDataFrame(
        [("0xt1", "0xb", None, Decimal(1000))],
        "token_address string, holder_address string, token_id decimal(38,0), value decimal(38,0)",
    )
    out2 = token_balances_from_transfers(tt, carry_in=carry)
    got2 = {(r["holder_address"], r["block_number"]): int(r["value"]) for r in out2.collect()}
    assert got2[("0xb", 2)] == 1060


def test_native_balances(spark):
    tx = spark.createDataFrame(
        [("0xa", "0xb", Decimal(10), 1), ("0xb", None, Decimal(99), 2), ("0xb", "0xa", Decimal(3), 2)],
        "from_address string, to_address string, value decimal(38,0), block_number long",
    )
    out = native_balances_from_transactions(tx)
    got = {(r["address"], r["block_number"]): int(r["value"]) for r in out.collect()}
    assert got[("0xb", 1)] == 10
    assert got[("0xb", 2)] == 10 - 99 - 3
    assert got[("0xa", 2)] == -10 + 3


def test_native_balances_gas_accounting(spark):
    """VERDICT r3 item 7: with the receipt join present the sender pays
    gas_used × effective_gas_price; with blocks present the miner earns the
    tip (fee − gas × base_fee); the base-fee portion is burned. A crafted
    uint256 gas price must drop the fee leg, not throw (ANSI)."""
    ddl = (
        "from_address string, to_address string, value decimal(38,0),"
        "block_number long, receipt_gas_used long,"
        "receipt_effective_gas_price decimal(38,0)"
    )
    tx = spark.createDataFrame(
        [
            ("0xa", "0xb", Decimal(100), 1, 10, Decimal(3)),   # fee 30, tip 10
            ("0xb", "0xa", Decimal(5), 2, 20, Decimal(2)),     # fee 40, tip 0
            ("0xa", "0xb", Decimal(0), 3, 2, Decimal(10**38 - 1)),  # overflow fee → dropped
        ],
        ddl,
    )
    blocks = spark.createDataFrame(
        [(1, "0xm", 2), (2, "0xm", 2), (3, "0xm", 2)],
        "number long, miner string, base_fee_per_gas long",
    )
    out = native_balances_from_transactions(tx, blocks=blocks)
    got = {(r["address"], r["block_number"]): int(r["value"]) for r in out.collect()}
    assert got[("0xa", 1)] == -100 - 30
    assert got[("0xb", 1)] == 100
    assert got[("0xm", 1)] == 10            # tip = 10*(3-2)
    assert got[("0xb", 2)] == 100 - 5 - 40  # pays value + full fee
    assert got[("0xa", 2)] == -130 + 5
    assert ("0xm", 2) not in got            # tip 0 → no leg
    # block 3: fee overflows Decimal(38,0) → leg dropped, value flow kept
    assert got[("0xa", 3)] == got[("0xa", 2)] + 0 - 0
    # no-blocks call: fees debited, no miner credits
    out2 = native_balances_from_transactions(tx)
    got2 = {(r["address"], r["block_number"]): int(r["value"]) for r in out2.collect()}
    assert got2[("0xa", 1)] == -130
    assert all(a != "0xm" for a, _ in got2)


def test_streamer_full_entity_suite(spark, tmp_path):
    spec = ChainWalSpec(start_block=0, end_block=14, txs_per_block=3, logs_per_tx=2)
    wal_path = str(tmp_path / "wal")
    generate_chain_wal(spark, spec).write.mode("overwrite").parquet(wal_path)
    wal = spark.read.parquet(wal_path)
    cfg = StreamerConfig(warehouse=str(tmp_path / "wh"), batch_size=80, partition_size=10)
    s = ChainStreamer(spark, cfg)
    s.run(WalTailer(wal, batch_size=80))

    n_tx = 15 * 3
    assert s.tables["geth_traces"].read().count() == n_tx
    traces = s.tables["traces"].read()
    # every non-create tx has root + 1 child; creates have only root
    n_creates = len([i for i in range(n_tx) if i % 29 == 0])
    assert traces.count() == (n_tx - n_creates) * 2 + n_creates
    # status inheritance exercised: every 13th tx child errors
    assert traces.filter("status = 0").count() > 0
    assert traces.filter("trace_index >= 0").count() == traces.count()
    # trace ids well-formed
    r = traces.filter("size(trace_address) = 1").first()
    assert r["trace_id"].endswith("_0")

    itr = s.tables["internal_transfers"].read()
    assert itr.count() > 0
    assert itr.filter(~F.col("id").rlike("^(call|create|staticcall)_[0-9]+$")).count() == 0

    contracts = s.tables["contracts"].read()
    assert contracts.count() == n_creates
    assert contracts.filter("is_erc20").count() >= 1

    tb = s.tables["token_balances"].read()
    tbl_latest = s.tables["token_balances_latest"].read()
    assert tb.count() > 0
    # latest = max-block value per holder key
    one = tbl_latest.first()
    hist = (
        tb.filter(
            (F.col("token_address") == one["token_address"])
            & (F.col("holder_address") == one["holder_address"])
        )
        .orderBy(F.col("block_number").desc())
        .first()
    )
    assert int(hist["value"]) == int(one["value"])

    nb = s.tables["native_balances"].read()
    assert nb.count() > 0


def test_balances_carry_across_batches(spark, tmp_path):
    """Same WAL replayed in 1 batch vs many batches must yield identical
    latest balances (carry-in correctness)."""
    spec = ChainWalSpec(start_block=0, end_block=11, txs_per_block=2, logs_per_tx=1)
    wal_path = str(tmp_path / "wal")
    generate_chain_wal(spark, spec).write.mode("overwrite").parquet(wal_path)
    wal = spark.read.parquet(wal_path)

    def run(name, batch):
        cfg = StreamerConfig(
            warehouse=str(tmp_path / name), batch_size=batch, partition_size=100
        )
        s = ChainStreamer(spark, cfg)
        s.run(WalTailer(wal, batch_size=batch))
        return {
            (r["token_address"], r["holder_address"]): int(r["value"])
            for r in s.tables["token_balances_latest"].read().collect()
        }

    assert run("one", 10_000) == run("many", 30)


def test_candles_incremental_vs_batch(spark, tmp_path):
    """Candles MERGEd incrementally across micro-batches must equal candles
    computed in one shot over the final transfers table (replay-safe
    deterministic recompute, SURVEY §7 hard-point 4)."""
    from ethereum_etl_spark.operators.candles import ohlcv

    spec = ChainWalSpec(start_block=0, end_block=23, txs_per_block=2, logs_per_tx=2)
    wal_path = str(tmp_path / "wal")
    generate_chain_wal(spark, spec).write.mode("overwrite").parquet(wal_path)
    wal = spark.read.parquet(wal_path)

    cfg = StreamerConfig(warehouse=str(tmp_path / "wh"), batch_size=60, partition_size=10)
    s = ChainStreamer(spark, cfg)
    s.run(WalTailer(wal, batch_size=60))

    got = {
        (r["token_address"], r["bucket_epoch"]): (
            int(r["open"]), int(r["high"]), int(r["low"]), int(r["close"]),
            int(r["volume"]), r["trades"],
        )
        for r in s.tables["candles_1h"].read().collect()
    }
    tt = (
        s.tables["token_transfers"].read()
        .withColumn("ts", F.to_timestamp("block_timestamp"))
        .withColumn("tb", F.struct(F.col("block_number"), F.col("log_index")))
    )
    want = {
        (r["token_address"], int(r["bucket_start"].timestamp())): (
            int(r["open"]), int(r["high"]), int(r["low"]), int(r["close"]),
            int(r["volume"]), r["trades"],
        )
        for r in ohlcv(tt, "token_address", "ts", "value", "tb", "1 hour").collect()
    }
    assert got == want and len(got) > 0

    # multi-resolution (VERDICT r3 item 9): 1m and 1d tables maintained by
    # the same loop must match their one-shot recomputes too
    for name, dur in [("candles_1m", "1 minute"), ("candles_1d", "1 day")]:
        got_b = {
            (r["token_address"], r["bucket_epoch"]): (
                int(r["open"]), int(r["close"]), int(r["volume"]), r["trades"]
            )
            for r in s.tables[name].read().collect()
        }
        want_b = {
            (r["token_address"], int(r["bucket_start"].timestamp())): (
                int(r["open"]), int(r["close"]), int(r["volume"]), r["trades"]
            )
            for r in ohlcv(tt, "token_address", "ts", "value", "tb", dur).collect()
        }
        assert got_b == want_b and len(got_b) > 0, name
    # 1d aggregates strictly coarser than 1h
    assert len(got) >= s.tables["candles_1d"].read().count()
