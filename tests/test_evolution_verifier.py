from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField

from ethereum_etl_spark.sources.decode import decode_entity
from ethereum_etl_spark.sources.wal import ChainWalSpec, WalTailer, generate_chain_wal
from ethereum_etl_spark.streaming import ChainStreamer, StreamerConfig

EVOLUTION_FIELDS = [
    StructField("withdrawals_root", StringType(), True),
    StructField("blob_gas_used", LongType(), True),
]

ENTITIES = ("block", "transaction", "receipt", "log", "token_transfer")


def test_schema_evolution_end_to_end(spark, tmp_path):
    """Late payloads carry new fields → table widens additively, early rows
    read back NULL (SURVEY §1.3 / north_rule schema evolution)."""
    spec = ChainWalSpec(start_block=0, end_block=19, txs_per_block=2,
                        logs_per_tx=1, evolve_at_block=10)
    wal_path = str(tmp_path / "wal")
    generate_chain_wal(spark, spec).write.mode("overwrite").parquet(wal_path)
    wal = spark.read.parquet(wal_path)

    cfg = StreamerConfig(
        warehouse=str(tmp_path / "wh"),
        batch_size=75,  # several cycles: evolution appears mid-stream
        partition_size=10,
        entity_types=ENTITIES,
        extra_entity_fields={"block": EVOLUTION_FIELDS},
    )
    s = ChainStreamer(spark, cfg)
    s.run(WalTailer(wal, batch_size=cfg.batch_size))

    blocks = s.tables["blocks"].read()
    assert "blob_gas_used" in blocks.columns
    assert blocks.filter("number < 10 AND blob_gas_used IS NOT NULL").count() == 0
    assert blocks.filter("number >= 10 AND withdrawals_root IS NULL").count() == 0


def test_decode_errors_dead_letter(spark, tmp_path):
    spec = ChainWalSpec(start_block=0, end_block=4, txs_per_block=1, logs_per_tx=1)
    wal = generate_chain_wal(spark, spec)
    junk = spark.createDataFrame(
        [(999, 2, "0xdead", "block", "upsert", "{{{not json")],
        "seq long, block_number long, block_hash string, entity_type string, op string, payload string",
    )
    wal_path = str(tmp_path / "wal")
    wal.unionByName(junk).write.mode("overwrite").parquet(wal_path)

    cfg = StreamerConfig(
        warehouse=str(tmp_path / "wh"), batch_size=10_000,
        partition_size=10, entity_types=ENTITIES, collect_errors=True,
    )
    s = ChainStreamer(spark, cfg)
    s.run(WalTailer(spark.read.parquet(wal_path), batch_size=10_000))
    errs = s.tables["errors"].read().collect()
    assert len(errs) == 1
    assert errs[0]["kind"] == "decode_error:block"
    assert errs[0]["data"].startswith("{{{")
    # good rows unaffected
    assert s.tables["blocks"].read().count() == 5


def test_verifier_detect_and_repair(spark, tmp_path):
    spec = ChainWalSpec(start_block=0, end_block=9, txs_per_block=2,
                        logs_per_tx=1, reorg_blocks=(5,))
    wal_path = str(tmp_path / "wal")
    generate_chain_wal(spark, spec).write.mode("overwrite").parquet(wal_path)
    wal = spark.read.parquet(wal_path)

    cfg = StreamerConfig(warehouse=str(tmp_path / "wh"), batch_size=10_000,
                         partition_size=10, entity_types=ENTITIES)
    s = ChainStreamer(spark, cfg)
    # stream ONLY the original chain (simulate reorg discovered later)
    orig = wal.filter("op = 'upsert'")
    s.run(WalTailer(orig, batch_size=10_000))
    stored5 = s.tables["blocks"].read().filter("number = 5").first()["hash"]

    # canonical view = fork rows for block 5 (what the chain now says)
    canonical = decode_entity(wal, "block", ops=("reorg",)).select("number", "hash")
    fork5 = canonical.first()["hash"]
    assert fork5 != stored5

    detected = s.detect_reorged_blocks(canonical)
    assert detected == [5]

    s.repair_blocks(wal, detected)
    blocks = s.tables["blocks"].read()
    assert blocks.count() == 10
    assert blocks.filter("number = 5").first()["hash"] == fork5
    txs5 = s.tables["transactions"].read().filter("block_number = 5")
    assert txs5.count() == 2
    assert {r["block_hash"] for r in txs5.collect()} == {fork5}
    # lineage recorded the repair
    assert any("repair" in e.get("batch_id", "") for e in s.lineage.entries())
