from __future__ import annotations

import os

from pyspark.sql import functions as F

from ethereum_etl_spark.lake.export import export_block_ranges
from ethereum_etl_spark.sources.wal import ChainWalSpec, WalTailer, generate_chain_wal
from ethereum_etl_spark.streaming import ChainStreamer, StreamerConfig
from ethereum_etl_spark.streaming.structured import run_structured

ENTITIES = ("block", "transaction", "receipt", "log", "token_transfer", "token")


def _wal_dir(spark, tmp_path, **kw):
    spec = ChainWalSpec(start_block=0, end_block=19, txs_per_block=2, logs_per_tx=1, **kw)
    p = str(tmp_path / "wal")
    generate_chain_wal(spark, spec).write.mode("overwrite").parquet(p)
    return p


def test_structured_streaming_front_end(spark, tmp_path):
    """readStream → foreachBatch → MERGE: same final state as batch replay."""
    p = _wal_dir(spark, tmp_path)
    cfg = StreamerConfig(warehouse=str(tmp_path / "wh"), partition_size=10, entity_types=ENTITIES)
    s = ChainStreamer(spark, cfg)
    q = run_structured(s, p, str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(300)
    assert s.tables["blocks"].read().count() == 20
    assert s.tables["transactions"].read().count() == 40
    assert s.tables["tokens"].read().count() == 38

    # restart with same checkpoint: no new data → state unchanged
    q2 = run_structured(s, p, str(tmp_path / "ckpt"), available_now=True)
    q2.awaitTermination(300)
    assert s.tables["blocks"].read().count() == 20
    assert any(e.get("source") == "structured" for e in s.lineage.entries())


def test_tokens_dimension(spark, tmp_path):
    p = _wal_dir(spark, tmp_path)
    cfg = StreamerConfig(warehouse=str(tmp_path / "wh"), batch_size=10_000,
                         partition_size=10, entity_types=ENTITIES)
    s = ChainStreamer(spark, cfg)
    s.run(WalTailer(spark.read.parquet(p), batch_size=10_000))
    toks = s.tables["tokens"].read()
    assert toks.count() == 38
    # ~10% missing metadata (docs/limitations.md:6-8 parity)
    assert 0 < toks.filter("symbol IS NULL").count() < 10
    assert toks.filter("decimals IS NULL").count() == 0


def test_export_from_warehouse_complete_and_fallback(spark, tmp_path):
    p = _wal_dir(spark, tmp_path)
    wal = spark.read.parquet(p)
    cfg = StreamerConfig(warehouse=str(tmp_path / "wh"), batch_size=10_000,
                         partition_size=10, entity_types=ENTITIES)
    s = ChainStreamer(spark, cfg)
    s.run(WalTailer(wal, batch_size=10_000))

    df, src = s.export_from_warehouse("block", 5, 14)
    assert src == "warehouse" and df.count() == 10
    df, src = s.export_from_warehouse("transaction", 0, 19)
    assert src == "warehouse" and df.count() == 40
    # incomplete range (beyond ingested head) → WAL fallback
    df, src = s.export_from_warehouse("block", 15, 25, wal=wal)
    assert src == "wal"
    assert df.count() == 5  # only blocks 15-19 exist anywhere
    # no fallback → LookupError
    import pytest

    with pytest.raises(LookupError):
        s.export_from_warehouse("block", 15, 25)


def test_csv_export_block_range_layout(spark, tmp_path):
    p = _wal_dir(spark, tmp_path)
    cfg = StreamerConfig(warehouse=str(tmp_path / "wh"), batch_size=10_000,
                         partition_size=10, entity_types=ENTITIES)
    s = ChainStreamer(spark, cfg)
    s.run(WalTailer(spark.read.parquet(p), batch_size=10_000))
    out = str(tmp_path / "csv")
    export_block_ranges(s.tables["logs"], out, blocks_per_file=10, fmt="csv")
    dirs = sorted(d for d in os.listdir(out) if d.startswith("start_block="))
    assert dirs == ["start_block=00000000", "start_block=00000010"]
    back = spark.read.option("header", "true").csv(out + "/start_block=00000000/end_block=00000009")
    assert back.count() == 20  # 10 blocks x 2 logs
    assert "topics" in back.columns  # array stringified


def test_projection_tables(spark, tmp_path):
    """§1.4 MVs: logs/tx re-keyed by address, same row sets."""
    p = _wal_dir(spark, tmp_path)
    cfg = StreamerConfig(warehouse=str(tmp_path / "wh"), batch_size=10_000,
                         partition_size=10, entity_types=ENTITIES, projections=True)
    s = ChainStreamer(spark, cfg)
    s.run(WalTailer(spark.read.parquet(p), batch_size=10_000))
    logs = s.tables["logs"].read()
    proj = s.tables["logs_by_address"].read()
    assert proj.count() == logs.count()
    # point lookup by address hits ~1 file in the projection layout
    one = logs.first()["address"]
    assert proj.filter(F.col("address") == one).count() == logs.filter(
        F.col("address") == one
    ).count()
    assert s.tables["transactions_by_address"].read().count() == 40


def test_amqp_reingest_spans_dlq_idempotent(spark, tmp_path):
    """S12: message-queue re-ingest — block spans re-exported from the WAL,
    malformed messages dead-lettered, redelivery absorbed exactly-once
    (reference cli/amqp_stream.py:111-141 semantics)."""
    import json

    from ethereum_etl_spark.streaming.amqp import run_amqp_reingest

    p = _wal_dir(spark, tmp_path)
    wal = spark.read.parquet(p)
    cfg = StreamerConfig(
        warehouse=str(tmp_path / "wh"), partition_size=10, entity_types=ENTITIES
    )
    s = ChainStreamer(spark, cfg)

    qd = tmp_path / "queue"
    qd.mkdir()
    # two disjoint spans (blocks 0-4 named by tx items, 10-19 by block
    # items) + one malformed message (no item type) → DLQ
    with open(qd / "m1.json", "w") as f:
        for i in range(5):
            f.write(json.dumps({"type": "transaction", "block_number": i}) + "\n")
        for i in range(10, 20):
            f.write(json.dumps({"type": "block", "number": i}) + "\n")
        f.write(json.dumps({"block_number": 3}) + "\n")

    q = run_amqp_reingest(s, str(qd), wal, str(tmp_path / "ckpt"), available_now=True)
    q.awaitTermination(300)

    assert s.tables["blocks"].read().count() == 15  # 0-4 + 10-19
    assert s.tables["transactions"].read().count() == 30
    errs = s.tables["errors"].read().filter("kind = 'amqp_no_item_type'")
    assert errs.count() == 1

    # lineage recorded the coalesced spans
    amqp = [e for e in s.lineage.entries() if e.get("source") == "amqp"]
    assert amqp and sorted(map(tuple, amqp[0]["spans"])) == [(0, 4), (10, 19)]

    # second delivery: fills the 5-9 gap AND redelivers 10-14; counts
    # converge to the full chain with no duplicates
    with open(qd / "m2.json", "w") as f:
        for i in range(5, 15):
            f.write(json.dumps({"type": "log", "block_number": i}) + "\n")
    q2 = run_amqp_reingest(s, str(qd), wal, str(tmp_path / "ckpt"), available_now=True)
    q2.awaitTermination(300)

    assert s.tables["blocks"].read().count() == 20
    assert s.tables["transactions"].read().count() == 40
    assert s.tables["blocks"].read().select("number").distinct().count() == 20
