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
        # committing the watermark retires the batch intent (the batch is
        # done; the next cycle plans its own range)
        d.pop(f"__intent_{partition}", None)
        _atomic_write(self.path, json.dumps(d))

    # -- batch-intent pinning (exactly-once under crash + head advance) --
    #
    # The batch_id is "{lo}-{hi}". Every per-table merge skips replayed
    # batch_ids, so exactly-once depends on a crash-replay reusing the SAME
    # (lo, hi). But ``hi`` comes from compute_target, which reads the WAL
    # head — if the head advanced between crash and restart, a naive replay
    # would pick a LARGER hi, a NEW batch_id, and re-apply the overlap's
    # deltas to the carry-forward balance tables (double count). Writing the
    # intended range BEFORE the merges and pinning the replay to it makes
    # the batch plan deterministic across crashes.

    def set_intent(self, lo: int, hi: int, partition: str = "default") -> None:
        d = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                d = json.load(f)
        d[f"__intent_{partition}"] = [int(lo), int(hi)]
        _atomic_write(self.path, json.dumps(d))

    def get_intent(self, partition: str = "default") -> tuple[int, int] | None:
        if not os.path.exists(self.path):
            return None
        with open(self.path) as f:
            d = json.load(f)
        v = d.get(f"__intent_{partition}")
        return (int(v[0]), int(v[1])) if v else None

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
