"""Contract extraction: bytecode → function sighashes → ERC-20/721 flags.

Parity with /root/reference/ethereumetl/service/eth_contract_service.py:27-92
and jobs/extract_contracts_job.py:52-83, from scratch:

- get_function_sighashes: disassemble the FIRST BASIC BLOCK of the runtime
  bytecode and collect PUSH4 operands (the Solidity dispatcher loads each
  function selector with PUSH4 before comparing). The reference uses
  ethereum_dasm; here it's a ~30-line linear scan (PUSH1-32 skip their
  operand bytes; the block ends at the first terminator or JUMPDEST).
  Vectorized as an Arrow pandas UDF — pure function of the hex string.
- is_erc20 / is_erc721: selector-set membership per the EIP-20/721 required
  methods (:48-79), with selectors derived by our own keccak at import time.
- extract_contracts: geth create-frames with a to-address and no error
  (extract_contracts_job.py:60-67); contract bytecode = frame output.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from ethereum_etl_spark.functions.keccak import function_selector

_JUMPDEST = 0x5B
_PUSH1, _PUSH32, _PUSH4 = 0x60, 0x7F, 0x63


def get_function_sighashes(bytecode: str | None) -> list[str]:
    """PUSH4 operands of basic block 0, sorted unique '0x…' strings.

    Block-0 boundary matches ethereum_dasm's golden behavior (verified
    against the CryptoKitties fixture): the first block runs until the FIRST
    JUMPDEST — JUMP/JUMPI inside the Solidity dispatcher do NOT end it (the
    dispatcher is a chain of PUSH4/EQ/PUSH2/JUMPI before any JUMPDEST).
    """
    if bytecode is None or bytecode == "0x":
        return []
    h = bytecode[2:] if bytecode.startswith("0x") else bytecode
    try:
        code = bytes.fromhex(h)
    except ValueError:
        return []
    sighashes = set()
    i = 0
    n = len(code)
    while i < n:
        op = code[i]
        if op == _JUMPDEST and i > 0:
            break  # next basic block starts
        if _PUSH1 <= op <= _PUSH32:
            width = op - _PUSH1 + 1
            if op == _PUSH4 and i + 5 <= n:
                sighashes.add("0x" + code[i + 1 : i + 5].hex())
            i += 1 + width
            continue
        i += 1
    return sorted(sighashes)


@pandas_udf(ArrayType(StringType()))
def function_sighashes_udf(s: pd.Series) -> pd.Series:
    return s.map(get_function_sighashes)


# required selector sets (eth_contract_service.py:48-79) — derived, not
# hardcoded, via our keccak (asserted against known values in tests)
ERC20_REQUIRED = [
    "0x" + function_selector(sig)
    for sig in (
        "totalSupply()",
        "balanceOf(address)",
        "transfer(address,uint256)",
        "transferFrom(address,address,uint256)",
        "approve(address,uint256)",
        "allowance(address,address)",
    )
]
ERC721_REQUIRED = [
    "0x" + function_selector(sig)
    for sig in ("balanceOf(address)", "ownerOf(uint256)", "approve(address,uint256)")
]
ERC721_ANY_OF = [
    "0x" + function_selector(sig)
    for sig in ("transfer(address,uint256)", "transferFrom(address,address,uint256)")
]


def _contains_all(arr_col, selectors: list[str]):
    cond = F.lit(True)
    for s in selectors:
        cond = cond & F.array_contains(arr_col, s)
    return cond


def _contains_any(arr_col, selectors: list[str]):
    cond = F.lit(False)
    for s in selectors:
        cond = cond | F.array_contains(arr_col, s)
    return cond


def with_token_flags(contracts: DataFrame, sighash_col: str = "function_sighashes") -> DataFrame:
    """P8: is_erc20/is_erc721 predicates as array_contains conjunctions."""
    c = F.col(sighash_col)
    return contracts.withColumn(
        "is_erc20", _contains_all(c, ERC20_REQUIRED)
    ).withColumn(
        "is_erc721", _contains_all(c, ERC721_REQUIRED) & _contains_any(c, ERC721_ANY_OF)
    )


def extract_contracts(
    geth_traces: DataFrame | None = None, frames: DataFrame | None = None
) -> DataFrame:
    """P9: contract rows from create-frames of the geth call trees.

    Root-frame filter per extract_contracts_job.py:60-67 (type=create,
    non-empty to, no error); bytecode = output; sighash UDF + flags.
    Pass pre-flattened ``frames`` to reuse the trace-flatten pass (the
    streamer derives traces anyway — don't walk the JSON trees twice).
    """
    if frames is None:
        from ethereum_etl_spark.operators.traces import flatten_geth_traces

        frames = flatten_geth_traces(geth_traces)
    created = frames.filter(
        (F.size("trace_address") == 0)  # ROOT frames only, like the reference
        & (F.col("trace_type") == "create")
        & F.col("to_address").isNotNull()
        & (F.length("to_address") > 0)
        & F.col("error").isNull()
    ).select(
        F.col("to_address").alias("address"),
        F.coalesce(F.col("output"), F.lit("0x")).alias("bytecode"),
        F.col("block_number"),
    )
    sh = created.withColumn("function_sighashes", function_sighashes_udf("bytecode"))
    return with_token_flags(sh).select(
        "address", "bytecode", "function_sighashes", "is_erc20", "is_erc721", "block_number"
    )
