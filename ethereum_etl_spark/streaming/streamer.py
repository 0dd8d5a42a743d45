"""ChainStreamer — the flagship CDC loop (EP1 of SURVEY.md §3).

Re-expresses /root/reference/blockchainetl/streaming/streamer.py:77-157 +
ethereumetl/streaming/eth_streamer_adapter.py:184-300 as a Spark micro-batch
driver:

  while watermark < head:
      target = min(head - lag, watermark + batch)          (streamer.py:151-157)
      batch  = WAL rows in (watermark, target]             (block-range tail)
      per entity: decode → enrich → stamp ids → MERGE      (export_batch DAG)
      reorg rows in batch → delete+upsert on block keys    (ch_adapter:839-890)
      lineage.record(...); watermark = target              (streamer.py:128-132)

Exactly-once: the MERGE carries batch_id "{lo}-{hi}"; a crash after commit
but before the watermark write replays the batch, which the LakeTable
recognizes and skips. Decoded parents are cached per batch (the memoized
thunk DAG of eth_streamer_adapter.py:246-258 → df.cache()).

The same loop drives the north_rule repo-file CDC (entity='repo_file'),
proving the engine is entity-agnostic: an entity is (schema, natural key,
prune column) — nothing else.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethereum_etl_spark.functions.ids import stamp
from ethereum_etl_spark.lake import LakeTable, WatermarkStore
from ethereum_etl_spark.lake.checkpoint import LineageLog
from ethereum_etl_spark.operators.enrich import enrich_transactions, enrich_with_blocks
from ethereum_etl_spark.operators.transfers import extract_token_transfers
from ethereum_etl_spark.schemas import (
    ENTITY_KEYS,
    ENTITY_SCHEMAS,
    TOKEN_TRANSFER_SCHEMA,
)
from ethereum_etl_spark.sources.decode import decode_entity
from ethereum_etl_spark.sources.wal import WalTailer


@dataclass
class StreamerConfig:
    warehouse: str
    batch_size: int = 100  # WAL seq units per cycle
    lag: int = 0
    entity_types: tuple[str, ...] = ("block", "transaction", "receipt", "log", "token_transfer")
    partition_size: int = 100_000  # block numbers per lake partition
    strict_counts: bool = False
    parallel_merges: bool = True
    extra_merge_opts: dict = field(default_factory=dict)


# which raw entities each derived/enriched entity needs —
# EXPORT_DEPENDENCIES analog (eth_streamer_adapter.py:122-147)
DEPENDENCIES: dict[str, set[str]] = {
    "block": set(),
    "transaction": {"receipt"},  # enrich j2
    "receipt": set(),
    "log": {"block"},
    "token_transfer": {"log", "block"},
}


def _enriched_tx_schema():
    from pyspark.sql.types import StructField, StructType

    base = ENTITY_SCHEMAS["transaction"]
    rec = ENTITY_SCHEMAS["receipt"]
    ren = {
        "cumulative_gas_used": "receipt_cumulative_gas_used",
        "gas_used": "receipt_gas_used",
        "contract_address": "receipt_contract_address",
        "root": "receipt_root",
        "status": "receipt_status",
        "effective_gas_price": "receipt_effective_gas_price",
        "logs_count": "receipt_logs_count",
    }
    extra = [StructField(ren[f.name], f.dataType, True) for f in rec.fields if f.name in ren]
    return StructType(list(base.fields) + extra)


class ChainStreamer:
    def __init__(self, spark: SparkSession, cfg: StreamerConfig):
        self.spark = spark
        self.cfg = cfg
        self.watermarks = WatermarkStore(f"{cfg.warehouse}/_checkpoints/watermarks.json")
        self.lineage = LineageLog(f"{cfg.warehouse}/_checkpoints/lineage.jsonl")
        self.tables: dict[str, LakeTable] = {}
        self._init_tables()

    # ---------- tables ----------

    def _init_tables(self):
        from pyspark.sql.types import StringType, StructField, StructType

        def tbl(name, schema, key, prune="block_number"):
            root = f"{self.cfg.warehouse}/{name}"
            extra = [
                StructField("item_id", StringType(), True),
                StructField("item_timestamp", StringType(), True),
            ]
            full = StructType(list(schema.fields) + extra)
            t = (
                LakeTable(self.spark, root)
                if LakeTable.exists(root)
                else LakeTable.create(
                    self.spark, root, full, key=key,
                    prune_col=prune, partition_size=self.cfg.partition_size,
                )
            )
            self.tables[name] = t

        want = set(self.cfg.entity_types)
        if "block" in want:
            tbl("blocks", ENTITY_SCHEMAS["block"], ENTITY_KEYS["block"], prune="number")
        if "transaction" in want:
            tbl("transactions", _enriched_tx_schema(), ENTITY_KEYS["transaction"])
        if "receipt" in want:
            tbl("receipts", ENTITY_SCHEMAS["receipt"], ENTITY_KEYS["receipt"])
        if "log" in want:
            tbl("logs", ENTITY_SCHEMAS["log"], ENTITY_KEYS["log"])
        if "token_transfer" in want:
            tbl("token_transfers", TOKEN_TRANSFER_SCHEMA, ENTITY_KEYS["token_transfer"])

    # ---------- one sync cycle ----------

    def _decode_batch(self, batch: DataFrame, ops=("upsert", "reorg")):
        """Decode raw entities once, cached — the memoized thunk DAG."""
        cache = {}

        def get(entity):
            if entity not in cache:
                cache[entity] = decode_entity(batch, entity, ops=ops).cache()
            return cache[entity]

        return get, cache

    def _derive(self, get) -> dict[str, DataFrame]:
        """Entity name → final DataFrame to MERGE (decode + enrich + stamp)."""
        out: dict[str, DataFrame] = {}
        want = set(self.cfg.entity_types)
        if "block" in want:
            out["blocks"] = stamp(get("block"), "block", ts_col="timestamp")
        if "transaction" in want:
            tx = enrich_transactions(get("transaction"), get("receipt"), self.cfg.strict_counts)
            out["transactions"] = stamp(tx, "transaction", ts_col="block_timestamp")
        if "receipt" in want:
            out["receipts"] = stamp(get("receipt"), "receipt")
        if "log" in want:
            logs = enrich_with_blocks(get("log"), get("block"), self.cfg.strict_counts)
            out["logs"] = stamp(logs, "log", ts_col="block_timestamp")
        if "token_transfer" in want:
            tt = extract_token_transfers(get("log"))
            tt = enrich_with_blocks(tt, get("block"))
            out["token_transfers"] = stamp(tt, "token_transfer", ts_col="block_timestamp")
        return out

    def sync_cycle(self, tailer: WalTailer, watermark: int) -> int | None:
        target = tailer.compute_target(watermark)
        if target is None:
            return None
        t0 = time.time()
        batch = tailer.read_range(watermark, target).cache()
        batch_id = f"{watermark}-{target}"

        # ONE stats pass over the batch: block span + reorg presence. The
        # span becomes the touched-partition hint for every table MERGE —
        # no per-table discovery scans.
        stats = batch.agg(
            F.min("block_number").alias("lo"),
            F.max("block_number").alias("hi"),
            F.sum(F.when(F.col("op") == "reorg", 1).otherwise(0)).alias("n_reorg"),
        ).first()
        if stats["lo"] is None:  # empty range
            self.watermarks.set(target)
            batch.unpersist()
            return target
        lo_bn, hi_bn = int(stats["lo"]), int(stats["hi"])
        has_reorg = (stats["n_reorg"] or 0) > 0

        reorg_blocks: list[int] = []
        if has_reorg:
            # winning (latest-seq) hash per reorged block
            # (clickhouse_eth_streamer_adapter.py:815-890)
            winners = (
                batch.filter(F.col("op") == "reorg")
                .groupBy("block_number")
                .agg(F.max_by("block_hash", "seq").alias("__winning_hash"))
                .collect()
            )
            reorg_blocks = [int(r["block_number"]) for r in winners]
            wdf = self.spark.createDataFrame(
                [(r["block_number"], r["__winning_hash"]) for r in winners],
                "block_number long, __winning_hash string",
            )
            # drop in-batch rows superseded by a same-batch reorg
            batch = (
                batch.join(F.broadcast(wdf), on="block_number", how="left")
                .filter(
                    F.col("__winning_hash").isNull()
                    | (F.col("block_hash") == F.col("__winning_hash"))
                )
                .drop("__winning_hash")
            )

        get, cache = self._decode_batch(batch)
        derived = self._derive(get)

        def _merge_one(name: str, df: DataFrame) -> None:
            t = self.tables[name]
            dk = None
            dkc = None
            if has_reorg:
                prune = t.manifest().prune_col
                dk = self.spark.createDataFrame(
                    [(b,) for b in reorg_blocks], f"{prune} long"
                )
                dkc = [prune]
            t.merge_upsert(
                df,
                batch_id=batch_id,
                version_col="_ingest_seq" if "_ingest_seq" in df.columns else None,
                delete_keys=dk,
                delete_key_cols=dkc,
                touched_range=(lo_bn, hi_bn),
                extra_touched_values=reorg_blocks,
            )

        # per-entity MERGEs are independent (separate tables) → submit
        # concurrently; the Spark scheduler interleaves their stages (the
        # reference's thread-pool job parallelism, batch_work_executor.py,
        # done the Spark way).
        if self.cfg.parallel_merges and len(derived) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=len(derived)) as ex:
                futures = {ex.submit(_merge_one, n, d): n for n, d in derived.items()}
                for f in futures:
                    f.result()  # propagate failures
        else:
            for name, df in derived.items():
                _merge_one(name, df)

        for cdf in cache.values():
            cdf.unpersist()
        batch.unpersist()

        # watermark AFTER sink commit (streamer.py:128-132)
        self.watermarks.set(target)
        self.lineage.record(
            batch_id=batch_id,
            lo=watermark,
            hi=target,
            entities=list(derived),
            reorg=bool(has_reorg),
            duration_s=round(time.time() - t0, 3),
        )
        return target

    def run(self, tailer: WalTailer, start: int = 0, max_cycles: int | None = None) -> int:
        """Replay until caught up. Returns final watermark."""
        wm = self.watermarks.init_resume(start)
        cycles = 0
        while True:
            nxt = self.sync_cycle(tailer, wm)
            if nxt is None:
                return wm
            wm = nxt
            cycles += 1
            if max_cycles is not None and cycles >= max_cycles:
                return wm
