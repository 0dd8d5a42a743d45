"""High-watermark checkpoint store (exactly-once bookkeeping).

Mirrors the reference's LastSyncedBlockProvider family
(/root/reference/blockchainetl/streaming/streamer.py:197-305): a tiny
atomic key→value store of per-partition high watermarks, written AFTER the
sink commit (streamer.py:128-132 ordering). Replays between sink-commit and
watermark-write are absorbed by LakeTable's idempotent batch_ids + keyed
MERGE, giving exactly-once end-to-end.

Also records per-batch lineage + ingest metrics rows (etl_delay analog,
/root/reference/db/migrations/schema.sql:769-799).
"""

from __future__ import annotations

import json
import os
import time

from ethereum_etl_spark.lake.table import _atomic_write


class WatermarkStore:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def get(self, partition: str = "default", default: int = -1) -> int:
        if not os.path.exists(self.path):
            return default
        with open(self.path) as f:
            d = json.load(f)
        return int(d.get(partition, default))

    def set(self, value: int, partition: str = "default") -> None:
        d = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                d = json.load(f)
        d[partition] = int(value)
        _atomic_write(self.path, json.dumps(d))

    def init_resume(self, start_block: int, partition: str = "default") -> int:
        """Resume semantics of init_last_synced_block_provider
        (streamer.py:169-184): resume from max(start-1, stored)."""
        return max(start_block - 1, self.get(partition))


class LineageLog:
    """Append-only JSONL of per-batch lineage + metrics (north_rule:
    'resumable from checkpoint with per-partition lineage + metrics')."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def record(self, **fields) -> None:
        fields.setdefault("ts", time.time())
        with open(self.path, "a") as f:
            f.write(json.dumps(fields) + "\n")

    def entries(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]
