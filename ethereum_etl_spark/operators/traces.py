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
    """DFS preorder flatten with status propagation. Yields dict rows."""
    stack = [(tree, [], False)]  # (node, trace_address, parent_failed)
    out = []
    while stack:
        node, ta, parent_failed = stack.pop()
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
            }
        )
        # push children reversed so pop() yields DFS preorder
        for i in range(len(calls) - 1, -1, -1):
            stack.append((calls[i], [*ta, i], failed))
    return out


def flatten_geth_traces(geth_traces: DataFrame) -> DataFrame:
    """geth_traces(transaction_hash, block_number[, transaction_index],
    transaction_traces JSON) → flat trace rows (TRACE_SCHEMA sans
    trace_index; add with assign_trace_index)."""
    has_tx_index = "transaction_index" in geth_traces.columns
    cols = ["transaction_hash", "block_number", "transaction_traces"] + (
        ["transaction_index"] if has_tx_index else []
    )
    src = geth_traces.select(*cols)

    schema = TRACE_SCHEMA
    names = [f.name for f in schema.fields if f.name != "trace_index"]
    out_schema = schema
    from pyspark.sql.types import StructType

    out_schema = StructType([f for f in schema.fields if f.name != "trace_index"])

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
        order = pdf["trace_address"].map(lambda ta: len(ta or []))
        pdf = pdf.iloc[order.argsort(kind="stable")]
        status_by_path: dict[tuple, int] = {}
        out = []
        for _, row in pdf.iterrows():
            ta = tuple(row["trace_address"] or [])
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


def extract_internal_transfers(geth_traces: DataFrame) -> DataFrame:
    """P6: value-bearing frames → internal transfers with the reference's
    exact depth-string id scheme (internal_transfer_mapper.py:17-42,
    including its sibling-update quirk, replicated for parity)."""
    src = geth_traces.select("transaction_hash", "block_number", "transaction_traces")

    def walk(tx_hash, tree):
        out = []

        def dfs(trace, depth):
            v = trace.get("value")
            if v is not None:
                gas = trace.get("gas", "0x0")
                out.append(
                    {
                        "transaction_hash": tx_hash,
                        "from_address": _norm_addr(trace.get("from")),
                        "to_address": _norm_addr(trace.get("to")),
                        "value": _hex_to_int(v) if isinstance(v, str) else v,
                        "gas_limit": _hex_to_int(gas) if isinstance(gas, str) else gas,
                        "id": (trace.get("type", "call") or "call").lower() + f"_{depth}",
                    }
                )
            for i, sub in enumerate(trace.get("calls") or []):
                if i == 0:
                    depth = f"{depth}{i}"
                else:
                    depth = depth[:-1] + str(i)
                dfs(sub, depth)

        dfs(tree, "0")
        return out

    names = [f.name for f in INTERNAL_TRANSFER_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                items = walk(r.transaction_hash, json.loads(r.transaction_traces))
                for it in items:
                    it["block_number"] = r.block_number
                rows.extend(items)
            if rows:
                yield pd.DataFrame(rows)[names]
            else:
                yield pd.DataFrame({n: [] for n in names})

    return src.mapInPandas(run, INTERNAL_TRANSFER_SCHEMA)
