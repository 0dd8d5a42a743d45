"""Geth call-tree flatten → traces / internal transfers (P5, P6, P10-P12).

Behavioral parity with the reference, re-expressed for Spark:

- flatten_geth_traces: recursive JSON walk
  (/root/reference/ethereumetl/mappers/trace_mapper.py:130-168) as
  mapInPandas — the one genuinely-Python surface (unbounded tree depth).
  Type normalization: lowercase; selfdestruct→suicide; call-family types
  (call/callcode/delegatecall/staticcall) become trace_type='call' +
  call_type. subtraces = len(calls); trace_address = child-index path.
- status (P10, service/trace_status_calculator.py:26-63): 0 when the frame
  has an error, and a failed parent forces all descendants to 0 — computed
  in the same DFS (carrying parent_failed), which is exactly the sorted
  prefix-propagation of the reference.
- trace_id (P11, service/trace_id_calculator.py:26-79): tx-scoped
  '{type}_{tx_hash}_{trace_address joined by _}'; block-scoped (rewards)
  '{type}_{block}_{index}' after sorting by (reward_type, from, to, value) —
  the latter as a row_number window.
- trace_index (P12, jobs/export_traces_job.py:110-113): enumeration in DFS
  order per block — a row_number over a depth-first sortable key.
- internal transfers (P6, mappers/internal_transfer_mapper.py:11-48):
  value-bearing frames, id = '{type}_{depth-string}' replicating the
  reference's exact (quirky) sibling depth-string update.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ethereum_etl_spark.schemas import INTERNAL_TRANSFER_SCHEMA, TRACE_SCHEMA

_CALL_TYPES = ("call", "callcode", "delegatecall", "staticcall")


def _hex_to_int(v):
    if v is None:
        return None
    if isinstance(v, int):
        return v
    try:
        return int(v, 16)
    except (ValueError, TypeError):
        return None


def _norm_addr(a):
    return a.lower() if isinstance(a, str) else a


def _flatten_tree(block_number, tx_index, tx_hash, tree):
    """DFS preorder flatten with status propagation. Yields dict rows.

    Besides the trace fields, each row carries the internal-transfer
    projection of the same frame (raw type, the reference's quirky
    depth-string id, walk-default gas limit, value-key presence) so ONE
    tree walk serves traces, contracts AND internal transfers — the walk
    is the costliest Python stage of a sync cycle and used to run twice.
    """
    # (node, trace_address, parent_failed, depth_string)
    stack = [(tree, [], False, "0")]
    out = []
    while stack:
        node, ta, parent_failed, depth = stack.pop()
        raw_type = (node.get("type") or "call").lower()
        call_type = None
        if raw_type == "selfdestruct":
            trace_type = "suicide"
        elif raw_type in _CALL_TYPES:
            trace_type, call_type = "call", raw_type
        else:
            trace_type = raw_type
        error = node.get("error")
        failed = parent_failed or (error is not None and len(str(error)) > 0)
        calls = node.get("calls") or []
        gas = node.get("gas", "0x0")  # walk-default: absent key counts as 0
        out.append(
            {
                "block_number": block_number,
                "transaction_hash": tx_hash,
                "transaction_index": tx_index,
                "from_address": _norm_addr(node.get("from")),
                "to_address": _norm_addr(node.get("to")),
                "value": _hex_to_int(node.get("value")),
                "input": node.get("input"),
                "output": node.get("output"),
                "trace_type": trace_type,
                "call_type": call_type,
                "reward_type": None,
                "gas": _hex_to_int(node.get("gas")),
                "gas_used": _hex_to_int(node.get("gasUsed")),
                "subtraces": len(calls),
                "trace_address": list(ta),
                "error": error,
                "status": 0 if failed else 1,
                "trace_id": "_".join(
                    [trace_type, tx_hash, "_".join(str(x) for x in ta)]
                ),
                "_raw_type": raw_type,
                "_depth": depth,
                "_has_value": node.get("value") is not None,
                "_gas_limit": _hex_to_int(gas) if isinstance(gas, str) else gas,
            }
        )
        # replicate the reference's sibling depth-string update EXACTLY,
        # including its ≥10-sibling quirk (depth[:-1] strips one char, str(i)
        # appends two) — internal_transfer_mapper.py:17-42 parity
        child_depths = []
        d = depth
        for i in range(len(calls)):
            d = d + "0" if i == 0 else d[:-1] + str(i)
            child_depths.append(d)
        # push children reversed so pop() yields DFS preorder
        for i in range(len(calls) - 1, -1, -1):
            stack.append((calls[i], [*ta, i], failed, child_depths[i]))
    return out


INTERNAL_COLS = ["_raw_type", "_depth", "_has_value", "_gas_limit"]
_INTERNAL_FIELDS_DDL = (
    "_raw_type string, _depth string, _has_value boolean, _gas_limit long"
)


def flatten_geth_traces(
    geth_traces: DataFrame, include_internal: bool = False
) -> DataFrame:
    """geth_traces(transaction_hash, block_number[, transaction_index],
    transaction_traces JSON) → flat trace rows (TRACE_SCHEMA sans
    trace_index; add with assign_trace_index).

    ``include_internal`` appends the per-frame internal-transfer projection
    columns (INTERNAL_COLS) so internal transfers derive from the SAME walk
    — see internal_transfers_from_frames."""
    has_tx_index = "transaction_index" in geth_traces.columns
    cols = ["transaction_hash", "block_number", "transaction_traces"] + (
        ["transaction_index"] if has_tx_index else []
    )
    src = geth_traces.select(*cols)

    from pyspark.sql.types import StructType

    base_fields = [f for f in TRACE_SCHEMA.fields if f.name != "trace_index"]
    if include_internal:
        base_fields += list(StructType.fromDDL(_INTERNAL_FIELDS_DDL).fields)
    out_schema = StructType(base_fields)
    names = [f.name for f in out_schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                tree = json.loads(r.transaction_traces)
                tx_index = getattr(r, "transaction_index", None)
                rows.extend(
                    _flatten_tree(r.block_number, tx_index, r.transaction_hash, tree)
                )
            if rows:
                out = pd.DataFrame(rows)
                # Decimal(38,0) value: keep as Python ints → objects
                yield out[names]
            else:
                yield pd.DataFrame({n: [] for n in names})

    return src.mapInPandas(run, out_schema)


def _dfs_order_key():
    """Sortable string for DFS preorder: comma-joined zero-padded path.
    Prefix ordering == preorder (parent before children, siblings by index)."""
    return F.concat_ws(
        ",", F.transform(F.col("trace_address"), lambda x: F.lpad(x.cast("string"), 6, "0"))
    )


def assign_trace_index(traces: DataFrame) -> DataFrame:
    """P12: enumerate traces per block in (transaction_index, DFS) order —
    row_number window (W1)."""
    w = Window.partitionBy("block_number").orderBy(
        F.col("transaction_index").asc_nulls_last(),
        F.col("transaction_hash").asc_nulls_last(),
        _dfs_order_key(),
    )
    return traces.withColumn("trace_index", (F.row_number().over(w) - 1).cast("int"))


def assign_block_scoped_trace_ids(traces: DataFrame) -> DataFrame:
    """P11 block-scoped ids for reward/genesis/daofork traces (no tx hash):
    sort by (reward_type, from, to, value) within (block, type), enumerate
    (trace_id_calculator.py:61-68)."""
    w = Window.partitionBy("block_number", "trace_type").orderBy(
        F.col("reward_type").asc_nulls_first(),
        F.col("from_address").asc_nulls_first(),
        F.col("to_address").asc_nulls_first(),
        F.col("value").asc_nulls_first(),
    )
    scoped = F.concat_ws(
        "_",
        F.col("trace_type"),
        F.col("block_number").cast("string"),
        (F.row_number().over(w) - 1).cast("string"),
    )
    return traces.withColumn(
        "trace_id",
        F.when(
            F.col("transaction_hash").isNull() | (F.col("transaction_hash") == ""),
            scoped,
        ).otherwise(F.col("trace_id")),
    )


def calculate_trace_statuses(traces: DataFrame) -> DataFrame:
    """P10 for pre-flattened (parity) traces: status=0 on error, and a failed
    parent forces descendants to 0 via trace_address prefixes — applyInPandas
    per transaction group (bounded; the SURVEY §2.11 mapping of
    trace_status_calculator.py:26-63)."""
    import pandas as pd

    base = traces.withColumn(
        "status",
        F.when(
            F.col("error").isNotNull() & (F.length("error") > 0), 0
        ).otherwise(1).cast("int"),
    )
    schema = base.schema

    def propagate(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) <= 1:
            return pdf
        pdf = pdf.copy()
        order = pdf["trace_address"].map(lambda ta: 0 if ta is None else len(ta))
        pdf = pdf.iloc[order.argsort(kind="stable")]
        status_by_path: dict[tuple, int] = {}
        out = []
        for _, row in pdf.iterrows():
            ta = tuple(row["trace_address"]) if row["trace_address"] is not None else ()
            st = int(row["status"])
            if ta and status_by_path.get(ta[:-1], 1) == 0:
                st = 0
            status_by_path[ta] = st
            row["status"] = st
            out.append(row)
        return pd.DataFrame(out)

    with_tx = base.filter(F.col("transaction_hash").isNotNull())
    without_tx = base.filter(F.col("transaction_hash").isNull())
    propagated = with_tx.groupBy("block_number", "transaction_hash").applyInPandas(
        propagate, schema
    )
    return propagated.unionByName(without_tx)


def internal_transfers_from_frames(frames: DataFrame) -> DataFrame:
    """P6: value-bearing frames → internal transfers with the reference's
    exact depth-string id scheme (internal_transfer_mapper.py:17-42,
    including its sibling-update quirk — carried through the flatten DFS).

    ``frames`` must come from flatten_geth_traces(include_internal=True);
    this is a pure column projection, so deriving internal transfers costs
    no second tree walk. _has_value distinguishes a present-but-unparseable
    value (row emitted with NULL value, like the reference) from an absent
    value key (no row)."""
    out = frames.filter(F.col("_has_value")).select(
        "transaction_hash",
        "block_number",
        "from_address",
        "to_address",
        F.col("value"),
        F.col("_gas_limit").alias("gas_limit"),
        F.concat_ws("_", F.col("_raw_type"), F.col("_depth")).alias("id"),
    )
    return out.select(
        *[F.col(f.name).cast(f.dataType) for f in INTERNAL_TRANSFER_SCHEMA.fields]
    )


def extract_internal_transfers(geth_traces: DataFrame) -> DataFrame:
    """P6 standalone entry: one flatten walk + the frame projection."""
    return internal_transfers_from_frames(
        flatten_geth_traces(geth_traces, include_internal=True)
    )
