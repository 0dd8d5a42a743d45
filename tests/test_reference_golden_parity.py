"""Per-row sha256 parity against the REFERENCE'S OWN golden fixtures
(north_star correctness gate): the reference's pytest inputs are fed through
OUR operators and each output row's canonical sha256 must equal the golden
row's. Fixtures (read-only) under /root/reference/tests/resources/.

Covered here:
- extract_token_transfers: logs.csv → expected_token_transfers.csv
  (tests/ethereumetl/job/test_extract_token_transfers_job.py analog)
- extract_internal_transfers: parsed_geth_trace.json →
  expected_internal_transfers.json (test_extract_internal_transfers_job)
- contract sighashes/flags: CryptoKitties bytecode →
  expected_contracts.json (test_export_contracts_job — exercises the
  from-scratch EVM disassembler against ethereum_dasm's golden output)
"""

from __future__ import annotations

import csv
import hashlib
import json

import pytest

from ethereum_etl_spark.operators.contracts import (
    get_function_sighashes,
    with_token_flags,
)
from ethereum_etl_spark.operators.traces import extract_internal_transfers
from ethereum_etl_spark.operators.transfers import extract_token_transfers
from ethereum_etl_spark.schemas import GETH_TRACE_SCHEMA, LOG_SCHEMA

RES = "/root/reference/tests/resources"


def _row_sha(values: list) -> str:
    canon = "|".join("" if v is None else str(v) for v in values)
    return hashlib.sha256(canon.encode()).hexdigest()


def test_token_transfers_golden(spark):
    with open(f"{RES}/test_extract_token_transfers_job/logs/logs.csv") as f:
        raw = list(csv.DictReader(f))
    rows = [
        (
            int(r["log_index"]),
            r["transaction_hash"],
            int(r["transaction_index"]),
            r["block_hash"],
            int(r["block_number"]),
            r["address"],
            r["data"],
            r["topics"].split(",") if r["topics"] else [],
        )
        for r in raw
    ]
    logs = spark.createDataFrame(rows, LOG_SCHEMA)
    out = extract_token_transfers(logs).collect()

    def canon_ours(r):
        return _row_sha([
            r["token_address"], r["from_address"], r["to_address"],
            None if r["value"] is None else int(r["value"]),
            r["transaction_hash"], r["log_index"], r["block_number"],
            None if r["token_id"] is None else int(r["token_id"]),
            r["operator_address"],
        ])

    with open(f"{RES}/test_extract_token_transfers_job/logs/expected_token_transfers.csv") as f:
        exp = list(csv.DictReader(f))

    def canon_exp(r):
        return _row_sha([
            r["token_address"], r["from_address"], r["to_address"],
            int(r["value"]) if r["value"] else None,
            r["transaction_hash"], int(r["log_index"]), int(r["block_number"]),
            int(r["token_id"]) if r["token_id"] else None,
            r["operator_address"] or None,
        ])

    ours = sorted(canon_ours(r) for r in out)
    want = sorted(canon_exp(r) for r in exp)
    assert len(ours) == len(want)
    assert ours == want  # per-row sha256 equality


@pytest.mark.parametrize(
    "case", ["tx_with_internal_transfers", "tx_without_internal_transfers"]
)
def test_internal_transfers_golden(spark, case):
    src = json.load(open(f"{RES}/test_extract_internal_transfers_job/{case}/parsed_geth_trace.json"))
    gt = spark.createDataFrame(
        [(src["transaction_hash"], src["block_number"], json.dumps(src["transaction_traces"]))],
        GETH_TRACE_SCHEMA,
    )
    out = extract_internal_transfers(gt).collect()
    exp_path = f"{RES}/test_extract_internal_transfers_job/{case}/expected_internal_transfers.json"
    expected = [json.loads(line) for line in open(exp_path) if line.strip()]

    def canon_ours(r):
        return _row_sha([
            r["from_address"], r["to_address"],
            None if r["value"] is None else int(r["value"]),
            r["transaction_hash"], r["id"], r["gas_limit"],
        ])

    def canon_exp(r):
        return _row_sha([
            r["from_address"], r["to_address"], r["value"],
            r["transaction_hash"], r["id"], r["gas_limit"],
        ])

    assert sorted(canon_ours(r) for r in out) == sorted(canon_exp(r) for r in expected)


def test_contract_sighashes_golden(spark):
    """CryptoKitties runtime bytecode through the from-scratch disassembler
    must reproduce ethereum_dasm's PUSH4 set and the ERC flags."""
    exp = json.load(open(f"{RES}/test_export_contracts_job/erc721_contract/expected_contracts.json"))
    got = get_function_sighashes(exp["bytecode"])
    assert got == exp["function_sighashes"]

    df = spark.createDataFrame([(exp["address"], got)], "address string, function_sighashes array<string>")
    flags = with_token_flags(df).first()
    assert flags["is_erc20"] == exp["is_erc20"]
    assert flags["is_erc721"] == exp["is_erc721"]


def _load_rpc_results(spark, pattern: str):
    import glob

    rows = []
    for p in sorted(glob.glob(pattern)):
        d = json.load(open(p))
        rows.append((json.dumps(d.get("result", d)),))
    return spark.createDataFrame(rows, "payload string")


def _csv_rows(path):
    with open(path) as f:
        return list(csv.DictReader(f))


def _i(v):
    return int(v) if v not in (None, "") else None


def test_export_blocks_golden(spark):
    """export_blocks_job parity: eth_getBlockByNumber responses → blocks
    rows sha256-equal to expected_blocks.csv."""
    from ethereum_etl_spark.sources.rpc_decode import rpc_blocks

    base = f"{RES}/test_export_blocks_job/blocks_with_transactions"
    rpc = _load_rpc_results(spark, f"{base}/web3_response.eth_getBlockByNumber_*.json")
    out = rpc_blocks(rpc).collect()
    exp = _csv_rows(f"{base}/expected_blocks.csv")
    cols = [
        "number", "hash", "parent_hash", "nonce", "sha3_uncles", "logs_bloom",
        "transactions_root", "state_root", "receipts_root", "miner",
        "difficulty", "total_difficulty", "size", "extra_data", "gas_limit",
        "gas_used", "timestamp", "transaction_count", "base_fee_per_gas",
        "withdrawals_root", "blob_gas_used", "excess_blob_gas",
    ]
    ints = {"number", "difficulty", "total_difficulty", "size", "gas_limit",
            "gas_used", "timestamp", "transaction_count", "base_fee_per_gas",
            "blob_gas_used", "excess_blob_gas"}

    def canon_ours(r):
        return _row_sha([
            (None if r[c] is None else int(r[c])) if c in ints else r[c] for c in cols
        ])

    def canon_exp(r):
        return _row_sha([_i(r[c]) if c in ints else (r[c] or None) for c in cols])

    assert sorted(canon_ours(r) for r in out) == sorted(canon_exp(r) for r in exp)


def test_export_transactions_golden(spark):
    from ethereum_etl_spark.sources.rpc_decode import rpc_transactions

    base = f"{RES}/test_export_blocks_job/blocks_with_transactions"
    rpc = _load_rpc_results(spark, f"{base}/web3_response.eth_getBlockByNumber_*.json")
    out = rpc_transactions(rpc).collect()
    exp = _csv_rows(f"{base}/expected_transactions.csv")
    cols = ["hash", "nonce", "block_hash", "block_number", "transaction_index",
            "from_address", "to_address", "value", "gas", "gas_price", "input",
            "block_timestamp", "max_fee_per_gas", "max_priority_fee_per_gas",
            "transaction_type", "max_fee_per_blob_gas"]
    ints = {"nonce", "block_number", "transaction_index", "value", "gas",
            "gas_price", "block_timestamp", "max_fee_per_gas",
            "max_priority_fee_per_gas", "transaction_type", "max_fee_per_blob_gas"}

    def canon_ours(r):
        return _row_sha([
            (None if r[c] is None else int(r[c])) if c in ints else r[c] for c in cols
        ])

    def canon_exp(r):
        return _row_sha([_i(r[c]) if c in ints else (r[c] or None) for c in cols])

    assert sorted(canon_ours(r) for r in out) == sorted(canon_exp(r) for r in exp)


def test_export_receipts_golden(spark):
    from ethereum_etl_spark.sources.rpc_decode import rpc_receipts

    base = f"{RES}/test_export_receipts_job/receipts_with_logs"
    rpc = _load_rpc_results(spark, f"{base}/web3_response.eth_getTransactionReceipt_*.json")
    out = rpc_receipts(rpc).collect()
    exp = _csv_rows(f"{base}/expected_receipts.csv")
    cols = ["transaction_hash", "transaction_index", "block_hash", "block_number",
            "cumulative_gas_used", "gas_used", "contract_address", "root",
            "status", "effective_gas_price"]
    ints = {"transaction_index", "block_number", "cumulative_gas_used",
            "gas_used", "status", "effective_gas_price"}

    def canon_ours(r):
        return _row_sha([
            (None if r[c] is None else int(r[c])) if c in ints else r[c] for c in cols
        ])

    def canon_exp(r):
        return _row_sha([_i(r[c]) if c in ints else (r[c] or None) for c in cols])

    assert sorted(canon_ours(r) for r in out) == sorted(canon_exp(r) for r in exp)


@pytest.mark.parametrize(
    "case",
    ["block_with_create", "block_with_error", "block_with_subtraces",
     "block_with_suicide", "block_without_transactions"],
)
def test_export_traces_golden(spark, case):
    """export_traces_job parity: trace_block (parity) responses → trace rows
    sha256-equal to expected_traces.csv, incl. status propagation and
    block-scoped reward ids."""
    from ethereum_etl_spark.operators.traces import (
        assign_block_scoped_trace_ids,
        calculate_trace_statuses,
    )
    from ethereum_etl_spark.sources.rpc_decode import rpc_parity_traces

    base = f"{RES}/test_export_traces_job/{case}"
    rpc = _load_rpc_results(spark, f"{base}/web3_response.trace_block_*.json")
    traces = assign_block_scoped_trace_ids(
        calculate_trace_statuses(rpc_parity_traces(rpc))
    )
    out = traces.collect()
    exp = _csv_rows(f"{base}/expected_traces.csv")
    ints = {"block_number", "transaction_index", "value", "gas", "gas_used",
            "subtraces", "status"}
    cols = ["block_number", "transaction_hash", "transaction_index",
            "from_address", "to_address", "value", "input", "output",
            "trace_type", "call_type", "reward_type", "gas", "gas_used",
            "subtraces", "trace_address", "error", "status", "trace_id"]

    def canon_ours(r):
        vals = []
        for c in cols:
            v = r[c]
            if c == "trace_address":
                v = ",".join(str(x) for x in (v or []))
            elif c in ints and v is not None:
                v = int(v)
            elif v == "":
                v = None
            vals.append(v)
        return _row_sha(vals)

    def canon_exp(r):
        vals = []
        for c in cols:
            v = r[c]
            if c in ints:
                v = _i(v)
            elif v == "":
                v = None
            vals.append(v)
        return _row_sha(vals)

    assert sorted(canon_ours(r) for r in out) == sorted(canon_exp(r) for r in exp)


def test_token_transfers_priced_golden(spark):
    """extract_token_transfers_priced fixture (tests/resources/
    test_extract_token_transfers_priced_job/block_with_transfers): the
    reference's EthTokenTransferPriced fields that are pure functions of
    (transfer, token dim, price state) must match our
    priced_token_transfers output — amounts scaled by decimals, zero
    stable price/amount when no price mark exists, symbol lookup, and the
    hash-logindex item id."""
    import pyspark.sql.functions as F

    from ethereum_etl_spark.operators.pricing import priced_token_transfers

    base = f"{RES}/test_extract_token_transfers_priced_job/block_with_transfers"
    transfers_in = json.load(open(f"{base}/token_transfers_priced.json"))
    tokens_in = json.load(open(f"{base}/tokens.json"))
    expected = json.loads(open(f"{base}/expected_transfers_priced.json").read())

    t = spark.createDataFrame(
        [
            (
                r["token_address"], r["from_address"], r["to_address"],
                int(r["value"]), r["transaction_hash"], int(r["log_index"]),
                int(r["block_number"]), r["token_standard"],
            )
            for r in transfers_in
        ],
        "token_address string, from_address string, to_address string,"
        "value long, transaction_hash string, log_index int, block_number long,"
        "token_standard string",
    )
    # the fixture's tokens.json spells the key 'decimal' — the reference
    # job reads token.get('decimals', 0), so the golden output is scaled by
    # 10^0; mirror that by leaving decimals NULL (the operator's documented
    # 0-default for unknown tokens)
    toks = spark.createDataFrame(
        [(r["address"], r["symbol"], None) for r in tokens_in],
        "address string, symbol string, decimals int",
    )
    marks = spark.createDataFrame(
        [], "token_address string, block_number long, log_index int, price_stable double"
    )
    out = priced_token_transfers(t, toks, marks, stablecoins=[]).join(
        F.broadcast(toks.select(F.col("address").alias("token_address"), "symbol")),
        on="token_address", how="left",
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert [r["token_address"]] == expected["token_addresses"]
    assert [r["from_address"], r["to_address"]] == expected["wallets"]
    assert r["from_address"] == expected["direction"]["from_address"]
    assert r["to_address"] == expected["direction"]["to_address"]
    assert r["transaction_hash"] == expected["transaction_address"]
    assert r["block_number"] == expected["block_number"]
    assert (
        f"{r['transaction_hash']}-{r['log_index']}" == expected["id"]
    )
    assert [r["amount"]] == expected["amounts"]          # 10 / 10^18 * 10^18?
    assert [r["price_stable"]] == [float(p) for p in expected["prices_stable"]]
    assert r["value_stable"] == expected["amount_stable"]
    assert [r["symbol"]] == expected["symbols"]


def test_stream_end_to_end_golden(spark):
    """Full-stream parity on REAL mainnet blocks 1755634-1755635
    (tests/resources/test_stream — raw web3 responses in, the reference
    streamer's enriched+stamped NDJSON out): blocks, receipt-enriched
    transactions, logs, token transfers, parity traces, geth traces, and
    native balances all flow through OUR decode → enrich → item-id stamp
    composition and must match the expected rows field-for-field —
    including the item_id layouts this test caught drifting (geth_trace /
    internal_transfer / contract ids carry block_number in the reference's
    EthItemIdCalculator.ID_FIELDS).

    Out of scope here: expected_tokens (RPC-default token metadata rows for
    failed eth_calls — the lake engine sources token metadata from its
    dimension stream) and token/native balance DERIVATION (the reference
    point-calls eth_getBalance; the fixture's responses are decoded and
    enriched through our path instead)."""
    import glob
    import re

    import pyspark.sql.functions as F

    from ethereum_etl_spark.functions.ids import stamp
    from ethereum_etl_spark.operators.enrich import (
        enrich_transactions,
        enrich_with_blocks,
    )
    from ethereum_etl_spark.operators.traces import (
        assign_block_scoped_trace_ids,
        calculate_trace_statuses,
    )
    from ethereum_etl_spark.operators.transfers import extract_token_transfers
    from ethereum_etl_spark.sources.rpc_decode import (
        rpc_blocks,
        rpc_parity_traces,
        rpc_receipt_logs,
        rpc_receipts,
        rpc_transactions,
    )

    base = f"{RES}/test_stream/blocks_1755634_1755635"

    def ndjson(name):
        return [json.loads(l) for l in open(f"{base}/{name}.json") if l.strip()]

    def check(ours_rows, expected, skip=()):
        ours = {r["item_id"]: r.asDict() for r in ours_rows}
        assert sorted(ours) == sorted(e["item_id"] for e in expected)
        for e in expected:
            mine = ours[e["item_id"]]
            for k, v in e.items():
                if k in ("type", *skip) or k not in mine:
                    continue
                got = mine[k]
                assert got == v, (e["item_id"], k, got, v)

    blocks = rpc_blocks(
        _load_rpc_results(spark, f"{base}/web3_response.eth_getBlockByNumber_0x*.json")
    ).cache()
    check(
        stamp(blocks, "block", ts_col="timestamp").collect(),
        ndjson("expected_blocks"),
    )

    tx = rpc_transactions(
        _load_rpc_results(spark, f"{base}/web3_response.eth_getBlockByNumber_0x*.json")
    )
    rcpt_rpc = _load_rpc_results(
        spark, f"{base}/web3_response.eth_getTransactionReceipt_*.json"
    )
    tx_e = enrich_with_blocks(enrich_transactions(tx, rpc_receipts(rcpt_rpc)), blocks)
    check(
        stamp(tx_e, "transaction", ts_col="block_timestamp").collect(),
        ndjson("expected_transactions"),
    )

    logs = enrich_with_blocks(rpc_receipt_logs(rcpt_rpc), blocks)
    check(
        stamp(logs, "log", ts_col="block_timestamp").collect(),
        ndjson("expected_logs"),
    )

    tt = extract_token_transfers(logs)
    check(
        stamp(tt, "token_transfer", ts_col="block_timestamp").collect(),
        ndjson("expected_token_transfers"),
    )

    traces = assign_block_scoped_trace_ids(
        calculate_trace_statuses(
            rpc_parity_traces(
                _load_rpc_results(spark, f"{base}/web3_response.trace_block_*.json")
            )
        )
    )
    check(
        stamp(enrich_with_blocks(traces, blocks), "trace", ts_col="block_timestamp").collect(),
        ndjson("expected_traces"),
    )

    gt_rows = []
    for p in sorted(glob.glob(f"{base}/web3_response.debug_traceTransaction_*.json")):
        h = re.search(r"debug_traceTransaction_(0x[0-9a-f]+)_", p).group(1)
        gt_rows.append((h, json.dumps(json.load(open(p))["result"])))
    gt = spark.createDataFrame(gt_rows, "transaction_hash string, traces_json string")
    gt = gt.join(
        tx_e.select(F.col("hash").alias("transaction_hash"), "block_number",
                    "block_timestamp"),
        on="transaction_hash",
    )
    got = {
        r["item_id"]: r
        for r in stamp(gt, "geth_trace", ts_col="block_timestamp").collect()
    }
    exp_gt = ndjson("expected_geth_traces")
    assert sorted(got) == sorted(e["item_id"] for e in exp_gt)
    for e in exp_gt:
        mine = got[e["item_id"]]
        assert json.loads(mine["traces_json"]) == json.loads(e["traces_json"])
        assert mine["block_number"] == e["block_number"]
        assert mine["item_timestamp"] == e["item_timestamp"]

    from ethereum_etl_spark.functions.hex import hex_to_dec38

    nb_rows = []
    for p in sorted(glob.glob(f"{base}/web3_response.eth_getBalance_*.json")):
        m = re.search(r"eth_getBalance_(0x[0-9a-f]{40})_(0x[0-9a-f]+)", p)
        nb_rows.append((m.group(1), int(m.group(2), 16), json.load(open(p))["result"]))
    nb = spark.createDataFrame(
        nb_rows, "address string, block_number long, __raw string"
    ).select(
        "address", "block_number", hex_to_dec38(F.col("__raw")).cast("long").alias("value")
    )
    check(
        stamp(
            enrich_with_blocks(nb, blocks), "native_balance", ts_col="block_timestamp"
        ).collect(),
        ndjson("expected_native_balances"),
    )
