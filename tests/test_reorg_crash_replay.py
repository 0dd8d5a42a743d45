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


def test_crash_before_dex_reprice_then_head_advance(spark):
    """Same crash window, dex side (VERDICT r4 item 3): the streamer dies
    AFTER the reorg batch's merges committed (price_marks repaired,
    orphaned marks deleted) but BEFORE _reorg_fix_dex_prices re-enriched
    the interim trades. The WAL head advances before restart. The replay
    must still find the affected tokens — fork-mark rows plus the crashed
    attempt's journaled orphan-mark tokens — and the final dex_trades /
    liquidity_events must equal a from-scratch single-batch replay."""
    import pyspark.sql.functions as F

    from ethereum_etl_spark.sources.wal import DEX_STABLE

    whA = tempfile.mkdtemp(prefix="dex_crash_a_")
    whB = tempfile.mkdtemp(prefix="dex_crash_b_")
    try:
        spec = ChainWalSpec(
            start_block=0, end_block=39, dex_pools=3, dex_families=True,
            reorg_blocks=(8,), reorg_lag=400, fork_key_shift=11,
        )
        wal = generate_chain_wal(spark, spec).cache()
        wal.count()
        ents = (
            "block", "transaction", "receipt", "log", "token",
            "token_transfer", "geth_trace", "trace", "contract",
            "token_balance", "dex_pool", "dex_trade", "liquidity_event",
        )

        def cfg(wh):
            return StreamerConfig(
                warehouse=wh, batch_size=250, partition_size=16,
                entity_types=ents, stablecoins=(DEX_STABLE,),
            )

        def snap(s):
            return sorted(
                (r["block_number"], r["log_index"], r["pool_address"],
                 r["amount_stable"], tuple(r["prices_stable"] or []))
                for r in s.tables["dex_trades"].read().collect()
            ) + sorted(
                (r["block_number"], r["log_index"], r["wallet_address"],
                 r["amount_stable"], tuple(r["prices_stable"] or []))
                for r in s.tables["liquidity_events"].read().collect()
            )

        # truth: one batch, orphaned marks never reach the table
        sA = ChainStreamer(spark, cfg(whA))
        sA.run(WalTailer(wal, batch_size=10**6))
        truth = snap(sA)

        # phase A: stream up to just before the fork rows (seq of the
        # re-emitted block 8 ≈ its arrival position near the WAL tail)
        fork_seq = int(
            wal.filter(F.col("op") == "reorg").agg(F.min("seq")).collect()[0][0]
        )
        sB = ChainStreamer(spark, cfg(whB))
        wm = sB.run(WalTailer(wal.filter(F.col("seq") < fork_seq), batch_size=250))
        assert wm > 0

        # phase B: fork batch crashes between merges and the dex reprice
        sB2 = ChainStreamer(spark, cfg(whB))

        def boom(*a, **k):
            raise RuntimeError("crash before dex reprice")

        sB2._reorg_fix_dex_prices = boom
        with pytest.raises(RuntimeError, match="crash before dex reprice"):
            sB2.run(
                WalTailer(
                    wal.filter(F.col("seq") < fork_seq + 160), batch_size=10**6
                )
            )
        assert sB2.watermarks.init_resume(0) == wm  # watermark held back

        # phase C: restart against the FULL WAL (head advanced past the
        # crashed attempt's range)
        sB3 = ChainStreamer(spark, cfg(whB))
        sB3.run(WalTailer(wal, batch_size=10**6))
        assert snap(sB3) == truth
        wal.unpersist()
    finally:
        shutil.rmtree(whA, ignore_errors=True)
        shutil.rmtree(whB, ignore_errors=True)
