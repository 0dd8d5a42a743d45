from __future__ import annotations

import json

from pyspark.sql import functions as F

from ethereum_etl_spark.functions.keccak import function_selector
from ethereum_etl_spark.operators.contracts import (
    ERC20_REQUIRED,
    extract_contracts,
    get_function_sighashes,
)
from ethereum_etl_spark.operators.traces import (
    assign_block_scoped_trace_ids,
    assign_trace_index,
    extract_internal_transfers,
    flatten_geth_traces,
)
from ethereum_etl_spark.schemas import GETH_TRACE_SCHEMA

# ---- synthetic geth call tree mirroring reference fixtures:
# root call → [failing call → [inherits-failure call], create, value call]
TREE = {
    "type": "CALL",
    "from": "0xAAAA000000000000000000000000000000000001",
    "to": "0xaaaa000000000000000000000000000000000002",
    "value": "0xde0b6b3a7640000",
    "gas": "0x7a120",
    "gasUsed": "0x5208",
    "input": "0x",
    "output": "0x",
    "calls": [
        {
            "type": "STATICCALL",
            "from": "0xaaaa000000000000000000000000000000000002",
            "to": "0xaaaa000000000000000000000000000000000003",
            "gas": "0x100",
            "gasUsed": "0x100",
            "error": "out of gas",
            "calls": [
                {
                    "type": "DELEGATECALL",
                    "from": "0xaaaa000000000000000000000000000000000003",
                    "to": "0xaaaa000000000000000000000000000000000004",
                    "gas": "0x10",
                    "gasUsed": "0x10",
                }
            ],
        },
        {
            "type": "SELFDESTRUCT",
            "from": "0xaaaa000000000000000000000000000000000005",
            "to": "0xaaaa000000000000000000000000000000000006",
            "value": "0x5",
        },
    ],
}


def _erc20_bytecode() -> str:
    """Dispatcher-style bytecode: PUSH4 per ERC20 selector in block 0."""
    body = "6080604052"  # standard solidity prologue (PUSH1s + MSTORE...)
    for sel in ERC20_REQUIRED:
        body += "63" + sel[2:]  # PUSH4 <selector>
    body += "00"  # STOP terminates block 0
    body += "5b63" + "deadbeef"  # JUMPDEST then PUSH4 in block 1 → ignored
    return "0x" + body


def _geth_df(spark, tree, tx_hash="0xt1", block=7, create_output=None):
    t = dict(tree)
    if create_output is not None:
        t = {
            "type": "CREATE",
            "from": "0xaaaa000000000000000000000000000000000001",
            "to": "0xcccc000000000000000000000000000000000001",
            "gas": "0x1000",
            "gasUsed": "0x800",
            "output": create_output,
        }
    return spark.createDataFrame(
        [(tx_hash, block, json.dumps(t))], GETH_TRACE_SCHEMA
    )


def test_flatten_types_status_ids(spark):
    df = _geth_df(spark, TREE)
    rows = {tuple(r["trace_address"]): r for r in flatten_geth_traces(df).collect()}
    assert len(rows) == 4
    root = rows[()]
    assert root["trace_type"] == "call" and root["call_type"] == "call"
    assert root["status"] == 1 and root["subtraces"] == 2
    assert root["value"] == 10**18
    assert root["trace_id"] == "call_0xt1_"
    failing = rows[(0,)]
    assert failing["call_type"] == "staticcall" and failing["status"] == 0
    child = rows[(0, 0)]
    assert child["status"] == 0  # inherits parent failure
    assert child["trace_id"] == "call_0xt1_0_0"
    sd = rows[(1,)]
    assert sd["trace_type"] == "suicide" and sd["status"] == 1
    # addresses normalized to lowercase
    assert root["from_address"] == "0xaaaa000000000000000000000000000000000001"


def test_trace_index_dfs_order(spark):
    df = _geth_df(spark, TREE)
    out = assign_trace_index(flatten_geth_traces(df)).orderBy("trace_index").collect()
    order = [tuple(r["trace_address"]) for r in out]
    assert order == [(), (0,), (0, 0), (1,)]  # DFS preorder
    assert [r["trace_index"] for r in out] == [0, 1, 2, 3]


def test_block_scoped_reward_ids(spark):
    from ethereum_etl_spark.schemas import TRACE_SCHEMA

    rows = [
        {"block_number": 5, "trace_type": "reward", "reward_type": "block",
         "from_address": None, "to_address": "0xb", "value": None, "status": 1},
        {"block_number": 5, "trace_type": "reward", "reward_type": "uncle",
         "from_address": None, "to_address": "0xa", "value": None, "status": 1},
    ]
    df = spark.createDataFrame(rows, TRACE_SCHEMA)
    out = {r["reward_type"]: r["trace_id"] for r in assign_block_scoped_trace_ids(df).collect()}
    # sorted by (reward_type, from, to, value): block < uncle
    assert out["block"] == "reward_5_0"
    assert out["uncle"] == "reward_5_1"


def test_internal_transfers_depth_ids(spark):
    df = _geth_df(spark, TREE)
    out = {r["id"]: r for r in extract_internal_transfers(df).collect()}
    # root (value) id=call_0; selfdestruct at sibling index 1:
    # reference depth-string: after child0 depth='00', sibling1 → '01'
    assert "call_0" in out
    assert out["call_0"]["value"] == 10**18
    assert "selfdestruct_01" in out
    assert out["selfdestruct_01"]["value"] == 5
    assert out["call_0"]["gas_limit"] == 0x7A120


def test_disassembler_sighashes():
    code = _erc20_bytecode()
    sighashes = get_function_sighashes(code)
    assert set(ERC20_REQUIRED) <= set(sighashes)
    assert "0xdeadbeef" not in sighashes  # block-1 PUSH4 excluded
    assert get_function_sighashes("0x") == []
    assert get_function_sighashes(None) == []
    # selector sanity vs known Ethereum values
    assert function_selector("transfer(address,uint256)") == "a9059cbb"


def test_extract_contracts_erc20(spark):
    df = _geth_df(spark, TREE, create_output=_erc20_bytecode())
    out = extract_contracts(df).collect()
    assert len(out) == 1
    c = out[0]
    assert c["address"] == "0xcccc000000000000000000000000000000000001"
    assert c["is_erc20"] is True
    assert c["is_erc721"] is False
    assert c["block_number"] == 7

    # non-create root yields nothing
    assert extract_contracts(_geth_df(spark, TREE)).count() == 0
