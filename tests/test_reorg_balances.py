"""Reorg balance-repair invariant (ADVICE r1, high): after a replay that
contains reorged blocks, the stored balance tables must equal a clean
recompute over the committed (reorg-merged) transfer/transaction tables.

Without repair, the latest-balance carry-in keeps the orphaned blocks'
deltas and the fork deltas stack on top; history rows written between the
orphaned block and the fork's arrival (reorg_lag later) stay poisoned.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from ethereum_etl_spark.operators.balances import (
    native_balances_from_transactions,
    token_balances_from_transfers,
)
from ethereum_etl_spark.sources.wal import ChainWalSpec, WalTailer, generate_chain_wal
from ethereum_etl_spark.streaming import ChainStreamer, StreamerConfig


def _rows(df, cols):
    return sorted(
        tuple(r[c] for c in cols) for r in df.select(*cols).collect()
    )


@pytest.fixture(scope="module")
def reorg_warehouse(spark):
    wh = tempfile.mkdtemp(prefix="reorg_bal_wh_")
    spec = ChainWalSpec(
        start_block=0, end_block=79, txs_per_block=4, logs_per_tx=2,
        reorg_blocks=(5, 6), reorg_lag=50,
    )
    wal = generate_chain_wal(spark, spec).cache()
    cfg = StreamerConfig(warehouse=wh, batch_size=300, partition_size=16)
    s = ChainStreamer(spark, cfg)
    s.run(WalTailer(wal, batch_size=300))
    yield s
    wal.unpersist()
    shutil.rmtree(wh, ignore_errors=True)


def test_token_balance_history_matches_recompute(spark, reorg_warehouse):
    s = reorg_warehouse
    committed_tt = s.tables["token_transfers"].read()
    expected = token_balances_from_transfers(committed_tt)
    cols = ["token_address", "holder_address", "block_number", "value"]
    assert _rows(s.tables["token_balances"].read(), cols) == _rows(expected, cols)


def test_token_balance_latest_matches_recompute(spark, reorg_warehouse):
    s = reorg_warehouse
    committed_tt = s.tables["token_transfers"].read()
    expected = (
        token_balances_from_transfers(committed_tt)
        .groupBy("token_address", "holder_address")
        .agg(F.max_by("value", F.col("block_number")).alias("value"))
    )
    got = s.tables["token_balances_latest"].read().groupBy(
        "token_address", "holder_address"
    ).agg(F.max("value").alias("value"))
    cols = ["token_address", "holder_address", "value"]
    assert _rows(got, cols) == _rows(expected, cols)


def test_native_balance_history_matches_recompute(spark, reorg_warehouse):
    s = reorg_warehouse
    committed_tx = s.tables["transactions"].read()
    expected = native_balances_from_transactions(
        committed_tx, blocks=s.tables["blocks"].read()
    )
    cols = ["address", "block_number", "value"]
    assert _rows(s.tables["native_balances"].read(), cols) == _rows(expected, cols)


def test_native_balance_latest_matches_recompute(spark, reorg_warehouse):
    s = reorg_warehouse
    committed_tx = s.tables["transactions"].read()
    expected = (
        native_balances_from_transactions(committed_tx, blocks=s.tables["blocks"].read())
        .groupBy("address")
        .agg(F.max_by("value", F.col("block_number")).alias("value"))
    )
    cols = ["address", "value"]
    assert _rows(s.tables["native_balances_latest"].read(), cols) == _rows(expected, cols)


@pytest.fixture(scope="module")
def dropped_tx_warehouse(spark):
    """Reorg where the fork blocks carry DIFFERENT transactions than the
    orphaned originals (fork_key_shift) — the real-chain dropped-transaction
    case (ADVICE r2): keys touched ONLY by the orphaned block leave no
    post-merge history row at the reorged blocks, so a repair that derives
    its affected-key set post-merge never finds them."""
    wh = tempfile.mkdtemp(prefix="reorg_drop_wh_")
    spec = ChainWalSpec(
        start_block=0, end_block=79, txs_per_block=4, logs_per_tx=2,
        reorg_blocks=(5, 6), reorg_lag=50, fork_key_shift=97,
    )
    wal = generate_chain_wal(spark, spec).cache()
    cfg = StreamerConfig(warehouse=wh, batch_size=300, partition_size=16)
    s = ChainStreamer(spark, cfg)
    s.run(WalTailer(wal, batch_size=300))
    yield s
    wal.unpersist()
    shutil.rmtree(wh, ignore_errors=True)


def test_dropped_tx_token_balances_repaired(spark, dropped_tx_warehouse):
    s = dropped_tx_warehouse
    committed_tt = s.tables["token_transfers"].read()
    expected = token_balances_from_transfers(committed_tt)
    cols = ["token_address", "holder_address", "block_number", "value"]
    assert _rows(s.tables["token_balances"].read(), cols) == _rows(expected, cols)
    latest_expected = (
        expected.groupBy("token_address", "holder_address")
        .agg(F.max_by("value", F.col("block_number")).alias("value"))
    )
    got = s.tables["token_balances_latest"].read().groupBy(
        "token_address", "holder_address"
    ).agg(F.max("value").alias("value"))
    lcols = ["token_address", "holder_address", "value"]
    assert _rows(got, lcols) == _rows(latest_expected, lcols)


def test_dropped_tx_native_balances_repaired(spark, dropped_tx_warehouse):
    s = dropped_tx_warehouse
    committed_tx = s.tables["transactions"].read()
    expected = native_balances_from_transactions(
        committed_tx, blocks=s.tables["blocks"].read()
    )
    cols = ["address", "block_number", "value"]
    assert _rows(s.tables["native_balances"].read(), cols) == _rows(expected, cols)
    latest_expected = (
        expected.groupBy("address")
        .agg(F.max_by("value", F.col("block_number")).alias("value"))
    )
    lcols = ["address", "value"]
    assert _rows(s.tables["native_balances_latest"].read(), lcols) == _rows(
        latest_expected, lcols
    )
