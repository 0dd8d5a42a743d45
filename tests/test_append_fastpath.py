"""Append-only fast-path + compaction semantics of LakeTable.merge_upsert.

The chain-tail case: when the natural key contains the prune column and a
batch's key range sits strictly above everything stored, the merge must not
read-modify-write the tail partition — it appends files. Correctness must be
indistinguishable from the full merge path: same rows, same last-write-wins,
same idempotent replay; overlapping or reorg batches must silently fall back
to read-modify-write.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ethereum_etl_spark.lake import LakeTable

SCHEMA = StructType([
    StructField("block_number", LongType(), False),
    StructField("hash", StringType(), False),
    StructField("v", StringType(), True),
])


@pytest.fixture()
def table(spark):
    root = tempfile.mkdtemp(prefix="append_fp_")
    t = LakeTable.create(
        spark, root + "/t", SCHEMA, key=["block_number", "hash"],
        prune_col="block_number", partition_size=100,
    )
    yield spark, t
    shutil.rmtree(root, ignore_errors=True)


def _batch(spark, lo, hi, tag):
    return spark.createDataFrame(
        [(b, f"h{b}", f"{tag}-{b}") for b in range(lo, hi + 1)], SCHEMA
    )


def test_append_path_taken_and_correct(table):
    spark, t = table
    t.merge_upsert(_batch(spark, 0, 49, "a"), batch_id="b0", touched_range=(0, 49))
    v1 = t.current_version()
    files_before = len(t.manifest().files)
    # strictly-above range in the SAME partition → append, old files kept
    t.merge_upsert(_batch(spark, 50, 79, "a"), batch_id="b1", touched_range=(50, 79))
    files_after = len(t.manifest().files)
    assert t.current_version() > v1
    assert files_after > files_before  # appended next to, not instead of
    assert t.row_count() == 80
    got = sorted((r["block_number"], r["v"]) for r in t.read().collect())
    assert got == [(b, f"a-{b}") for b in range(80)]


def test_overlap_falls_back_to_rmw(table):
    spark, t = table
    t.merge_upsert(_batch(spark, 0, 59, "a"), batch_id="b0", touched_range=(0, 59))
    # overlapping range → full merge; newest version wins on the key
    t.merge_upsert(_batch(spark, 40, 69, "b"), batch_id="b1", touched_range=(40, 69))
    assert t.row_count() == 70
    got = dict((r["block_number"], r["v"]) for r in t.read().collect())
    assert got[39] == "a-39" and got[40] == "b-40" and got[69] == "b-69"


def test_append_replay_is_noop(table):
    spark, t = table
    t.merge_upsert(_batch(spark, 0, 9, "a"), batch_id="b0", touched_range=(0, 9))
    t.merge_upsert(_batch(spark, 10, 19, "a"), batch_id="b1", touched_range=(10, 19))
    v = t.current_version()
    t.merge_upsert(_batch(spark, 10, 19, "a"), batch_id="b1", touched_range=(10, 19))
    assert t.current_version() == v
    assert t.row_count() == 20


def test_compaction_bounds_file_count(table):
    spark, t = table
    for i in range(t.COMPACT_FILE_THRESHOLD + 6):
        lo = i * 2
        t.merge_upsert(
            _batch(spark, lo, lo + 1, "a"), batch_id=f"b{i}", touched_range=(lo, lo + 1)
        )
    m = t.manifest()
    per_pt: dict[int, int] = {}
    for f in m.files:
        per_pt[f.pt] = per_pt.get(f.pt, 0) + 1
    assert max(per_pt.values()) <= t.COMPACT_FILE_THRESHOLD + 2, per_pt
    n = t.COMPACT_FILE_THRESHOLD + 6
    got = sorted((r["block_number"], r["v"]) for r in t.read().collect())
    assert got == [(b, f"a-{b}") for b in range(2 * n)]


def test_delete_keys_disables_append(table):
    spark, t = table
    t.merge_upsert(_batch(spark, 0, 9, "a"), batch_id="b0", touched_range=(0, 9))
    dk = spark.createDataFrame([(5,)], "block_number long")
    t.merge_upsert(
        _batch(spark, 10, 12, "a"), batch_id="b1",
        delete_keys=dk, delete_key_cols=["block_number"],
        touched_range=(10, 12), extra_touched_values=[5],
    )
    got = sorted(r["block_number"] for r in t.read().collect())
    assert got == [0, 1, 2, 3, 4, 6, 7, 8, 9, 10, 11, 12]
