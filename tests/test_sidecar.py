"""Lossless uint256 sidecar (SURVEY §7): when Decimal(38,0) decode of
`value` overflows to NULL, the original payload string survives in
value_raw; exact values leave the sidecar NULL."""

from __future__ import annotations

import json
from decimal import Decimal

from ethereum_etl_spark.sources.decode import decode_entity


def _tx_event(seq, value_hex):
    payload = {
        "hash": f"0xt{seq}", "nonce": 1, "block_hash": "0xb",
        "block_number": seq, "transaction_index": 0,
        "from_address": "0xA", "to_address": "0xB",
        "value": value_hex, "gas": 21000, "gas_price": "0x5",
        "input": "0x", "block_timestamp": 1_600_000_000,
    }
    return (seq, seq, "0xb", "transaction", "upsert", json.dumps(payload))


def test_uint256_sidecar(spark):
    big = hex(10**40)  # > Decimal(38,0)
    wal = spark.createDataFrame(
        [_tx_event(1, "0xde0b6b3a7640000"), _tx_event(2, big)],
        "seq long, block_number long, block_hash string, entity_type string,"
        "op string, payload string",
    )
    out = decode_entity(wal, "transaction", uint256_sidecar=True)
    rows = {r["block_number"]: r for r in out.collect()}
    assert rows[1]["value"] == Decimal(10**18)
    assert rows[1]["value_raw"] is None
    assert rows[2]["value"] is None           # overflowed
    assert rows[2]["value_raw"] == big        # but lossless

    # default off: no sidecar column at all
    out2 = decode_entity(wal, "transaction")
    assert "value_raw" not in out2.columns


def test_token_metadata_bytes32_fallback(spark):
    """S9 fallback-coalesce: bytes32-shaped symbol/name decode to UTF-8,
    plain strings pass through, garbage/empty bytes32 → NULL."""
    from ethereum_etl_spark.operators.tokens import normalize_token_metadata

    mkr_word = "0x" + b"MKR".hex().ljust(64, "0")
    empty_word = "0x" + "0" * 64
    rows = [
        ("0x1", "USDC", "USD Coin"),
        ("0x2", mkr_word, mkr_word),
        ("0x3", empty_word, None),
    ]
    df = spark.createDataFrame(rows, "address string, symbol string, name string")
    out = {r["address"]: r for r in normalize_token_metadata(df).collect()}
    assert out["0x1"]["symbol"] == "USDC" and out["0x1"]["name"] == "USD Coin"
    assert out["0x2"]["symbol"] == "MKR" and out["0x2"]["name"] == "MKR"
    assert out["0x3"]["symbol"] is None and out["0x3"]["name"] is None


def test_approx_uniques_error_bound(spark, sf_dir):
    """A2/A3: HLL approximate distinct stays within ~3x the configured rsd
    of the exact count on the events table (no cross-engine oracle exists
    for HLL — this is the accuracy contract instead)."""
    from pyspark.sql import functions as F

    from ethereum_etl_spark.operators.candles import approx_uniques

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    approx = {
        r["event_type"]: r["approx_uniques"]
        for r in approx_uniques(events, "event_type", "user_id", rsd=0.02).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(3, 0.06 * n), (k, approx[k], n)


def test_multi_sink_fanout(spark):
    """K7: an entity's batch rows land in extra file sinks alongside the
    lake MERGE; replays overwrite their batch dir (idempotent)."""
    import shutil
    import tempfile

    from ethereum_etl_spark.sources.wal import ChainWalSpec, WalTailer, generate_chain_wal
    from ethereum_etl_spark.streaming import ChainStreamer, StreamerConfig

    wh = tempfile.mkdtemp(prefix="fanout_wh_")
    sink = tempfile.mkdtemp(prefix="fanout_sink_")
    try:
        wal = generate_chain_wal(spark, ChainWalSpec(start_block=0, end_block=9))
        cfg = StreamerConfig(
            warehouse=wh, batch_size=1000, partition_size=16,
            entity_types=("block", "transaction", "receipt"),
            fanout={"blocks": [("json", sink + "/blocks")]},
        )
        s = ChainStreamer(spark, cfg)
        s.run(WalTailer(wal, batch_size=1000))
        got = spark.read.json(sink + "/blocks/batch=*")
        assert got.count() == 10
        # replay: same batch id → same files, no duplication
        s2 = ChainStreamer(spark, cfg)
        s2.run(WalTailer(wal, batch_size=1000), start=0)
        assert spark.read.json(sink + "/blocks/batch=*").count() == 10
    finally:
        shutil.rmtree(wh, ignore_errors=True)
        shutil.rmtree(sink, ignore_errors=True)
