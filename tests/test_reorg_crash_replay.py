"""Crash-replay reorg repair (ADVICE r4, medium).

Failure mode being guarded: the streamer crashes AFTER the phase-1 merges of
a reorg batch committed (deleting the orphaned blocks' history rows) but
BEFORE the balance repair ran. By the time it restarts, the WAL head has
advanced, so ``compute_target`` yields a LARGER target and the replayed
batch carries a DIFFERENT batch_id. The replay's own pre-merge key capture
runs against a warehouse whose orphan-only history rows are already gone —
only the crashed attempt's journal rows (written under the old batch_id)
still name those keys. A repair that filters the journal on its own
batch_id therefore misses them and the carry-forward balances stay poisoned
forever; the fix reads journal rows by (block range, table) instead.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from ethereum_etl_spark.operators.balances import token_balances_from_transfers
from ethereum_etl_spark.sources.wal import ChainWalSpec, WalTailer, generate_chain_wal
from ethereum_etl_spark.streaming import ChainStreamer, StreamerConfig


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_crash_between_merge_and_repair_then_head_advance(spark):
    wh = tempfile.mkdtemp(prefix="reorg_crash_wh_")
    try:
        # fork drops the orphaned transactions entirely (fork_key_shift):
        # keys touched ONLY by orphaned blocks 5-6 exist, the exact set the
        # journal must preserve across the crash
        spec = ChainWalSpec(
            start_block=0, end_block=79, txs_per_block=4, logs_per_tx=2,
            reorg_blocks=(5, 6), reorg_lag=50, fork_key_shift=97,
        )
        wal = generate_chain_wal(spark, spec).cache()
        wal.count()
        big = 100_000  # one batch swallows whatever range the tailer offers

        cfg = StreamerConfig(warehouse=wh, batch_size=big, partition_size=16)
        # phase A: clean history up to just before the fork rows arrive
        # (reorg_lag puts block 5-6 re-emissions at seq of blocks 55-56)
        s1 = ChainStreamer(spark, cfg)
        import pyspark.sql.functions as F

        pre_fork = wal.filter(F.col("seq") < 55 * 16)
        wm = s1.run(WalTailer(pre_fork, batch_size=big))
        assert wm > 0

        # phase B: the reorg batch, crashing AFTER merges committed but
        # BEFORE the balance repair ran
        s1b = ChainStreamer(spark, cfg)

        def boom(*a, **k):
            raise RuntimeError("crash before repair")

        s1b._reorg_fix_balances = boom
        with pytest.raises(RuntimeError, match="crash before repair"):
            s1b.run(WalTailer(wal.filter(F.col("seq") < 60 * 16), batch_size=big))
        # watermark must NOT have advanced (crash before watermarks.set)
        assert s1b.watermarks.init_resume(0) == wm

        # phase C: restart against the ADVANCED head — bigger target, new
        # batch_id; the pre-merge capture now runs post-deletion
        s2 = ChainStreamer(spark, cfg)
        s2.run(WalTailer(wal, batch_size=big))

        # invariant: stored balance history == clean recompute over the
        # committed (reorg-merged) transfers — including the orphan-only keys
        committed_tt = s2.tables["token_transfers"].read()
        expected = token_balances_from_transfers(committed_tt)
        cols = ["token_address", "holder_address", "block_number", "value"]
        assert _rows(s2.tables["token_balances"].read(), cols) == _rows(expected, cols)
        wal.unpersist()
    finally:
        shutil.rmtree(wh, ignore_errors=True)
