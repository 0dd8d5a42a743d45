"""JSON-RPC payload mappers (P2/S3/S4): camelCase hex → typed entity rows.

Columnar re-expression of /root/reference/ethereumetl/mappers/
block_mapper.py:38-78, transaction_mapper.py:32-56, receipt_mapper.py —
from_json with the RPC field names, then rename/convert projections. Used by
the reference-golden parity tests (the engine's WAL carries pre-normalized
payloads; this layer exists for ingesting raw eth_getBlockByNumber /
eth_getTransactionReceipt responses and for bit-parity with the reference's
CSV goldens).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ethereum_etl_spark.functions.hex import hex_to_dec38, hex_to_long, to_normalized_address

RPC_TX_DDL = (
    "hash string, nonce string, blockHash string, blockNumber string,"
    "transactionIndex string, `from` string, `to` string, value string,"
    "gas string, gasPrice string, input string, maxFeePerGas string,"
    "maxPriorityFeePerGas string, type string, maxFeePerBlobGas string,"
    "blobVersionedHashes array<string>"
)

RPC_BLOCK_DDL = (
    "number string, hash string, parentHash string, nonce string,"
    "sha3Uncles string, logsBloom string, transactionsRoot string,"
    "stateRoot string, receiptsRoot string, miner string, difficulty string,"
    "totalDifficulty string, size string, extraData string, gasLimit string,"
    "gasUsed string, timestamp string, baseFeePerGas string,"
    "withdrawalsRoot string, blobGasUsed string, excessBlobGas string,"
    f"transactions array<struct<{RPC_TX_DDL}>>"
)

RPC_RECEIPT_DDL = (
    "transactionHash string, transactionIndex string, blockHash string,"
    "blockNumber string, cumulativeGasUsed string, gasUsed string,"
    "contractAddress string, root string, status string,"
    "effectiveGasPrice string, logs array<struct<logIndex string,"
    "transactionHash string, transactionIndex string, blockHash string,"
    "blockNumber string, address string, data string, topics array<string>>>"
)


def _parsed(rpc_json: DataFrame, ddl: str) -> DataFrame:
    return rpc_json.select(F.from_json("payload", ddl).alias("r"))


def rpc_blocks(rpc_json: DataFrame) -> DataFrame:
    """df(payload=eth_getBlockByNumber result JSON) → block rows
    (block_mapper.py:38-78 parity, incl. late-evolution columns)."""
    r = _parsed(rpc_json, RPC_BLOCK_DDL).select("r.*")
    return r.select(
        hex_to_long(F.col("number")).alias("number"),
        "hash",
        F.col("parentHash").alias("parent_hash"),
        "nonce",
        F.col("sha3Uncles").alias("sha3_uncles"),
        F.col("logsBloom").alias("logs_bloom"),
        F.col("transactionsRoot").alias("transactions_root"),
        F.col("stateRoot").alias("state_root"),
        F.col("receiptsRoot").alias("receipts_root"),
        to_normalized_address(F.col("miner")).alias("miner"),
        hex_to_dec38(F.col("difficulty")).alias("difficulty"),
        hex_to_dec38(F.col("totalDifficulty")).alias("total_difficulty"),
        hex_to_long(F.col("size")).alias("size"),
        F.col("extraData").alias("extra_data"),
        hex_to_long(F.col("gasLimit")).alias("gas_limit"),
        hex_to_long(F.col("gasUsed")).alias("gas_used"),
        hex_to_long(F.col("timestamp")).alias("timestamp"),
        F.size("transactions").cast("long").alias("transaction_count"),
        hex_to_long(F.col("baseFeePerGas")).alias("base_fee_per_gas"),
        F.col("withdrawalsRoot").alias("withdrawals_root"),
        hex_to_long(F.col("blobGasUsed")).alias("blob_gas_used"),
        hex_to_long(F.col("excessBlobGas")).alias("excess_blob_gas"),
    )


def rpc_transactions(rpc_json: DataFrame) -> DataFrame:
    """Nested block transactions → tx rows (transaction_mapper.py:32-56);
    block_timestamp is inherited from the enclosing block."""
    r = _parsed(rpc_json, RPC_BLOCK_DDL).select(
        hex_to_long(F.col("r.timestamp")).alias("block_timestamp"),
        F.explode("r.transactions").alias("t"),
    )
    t = F.col("t")
    return r.select(
        t["hash"].alias("hash"),
        hex_to_long(t["nonce"]).alias("nonce"),
        t["blockHash"].alias("block_hash"),
        hex_to_long(t["blockNumber"]).alias("block_number"),
        hex_to_long(t["transactionIndex"]).cast("int").alias("transaction_index"),
        to_normalized_address(t["from"]).alias("from_address"),
        to_normalized_address(t["to"]).alias("to_address"),
        hex_to_dec38(t["value"]).alias("value"),
        hex_to_long(t["gas"]).alias("gas"),
        hex_to_dec38(t["gasPrice"]).alias("gas_price"),
        t["input"].alias("input"),
        "block_timestamp",
        hex_to_long(t["maxFeePerGas"]).alias("max_fee_per_gas"),
        hex_to_long(t["maxPriorityFeePerGas"]).alias("max_priority_fee_per_gas"),
        hex_to_long(t["type"]).cast("int").alias("transaction_type"),
        hex_to_dec38(t["maxFeePerBlobGas"]).alias("max_fee_per_blob_gas"),
        t["blobVersionedHashes"].alias("blob_versioned_hashes"),
    )


def rpc_receipts(rpc_json: DataFrame) -> DataFrame:
    """eth_getTransactionReceipt results → receipt rows (+ logs_count)."""
    r = _parsed(rpc_json, RPC_RECEIPT_DDL).select("r.*")
    return r.select(
        F.col("transactionHash").alias("transaction_hash"),
        hex_to_long(F.col("transactionIndex")).cast("int").alias("transaction_index"),
        F.col("blockHash").alias("block_hash"),
        hex_to_long(F.col("blockNumber")).alias("block_number"),
        hex_to_long(F.col("cumulativeGasUsed")).alias("cumulative_gas_used"),
        hex_to_long(F.col("gasUsed")).alias("gas_used"),
        to_normalized_address(F.col("contractAddress")).alias("contract_address"),
        F.col("root"),
        hex_to_long(F.col("status")).cast("int").alias("status"),
        hex_to_dec38(F.col("effectiveGasPrice")).alias("effective_gas_price"),
        F.size("logs").cast("int").alias("logs_count"),
    )


RPC_TRACE_DDL = (
    "array<struct<"
    "action struct<callType string, `from` string, `to` string, value string,"
    "  gas string, input string, init string, address string,"
    "  refundAddress string, balance string, author string, rewardType string>,"
    "blockHash string, blockNumber long,"
    "result struct<gasUsed string, output string, address string, code string>,"
    "subtraces int, traceAddress array<int>, transactionHash string,"
    "transactionPosition int, type string, error string>>"
)


def rpc_parity_traces(rpc_json: DataFrame) -> DataFrame:
    """trace_block (parity) results → trace rows
    (/root/reference/ethereumetl/mappers/trace_mapper.py:33-80 parity):
    per-type field sourcing (call/create/suicide/reward), tx-scoped trace ids
    (trace_id_calculator.py:43-48); reward ids and status propagation are
    applied by the caller (assign_block_scoped_trace_ids +
    calculate_trace_statuses)."""
    r = rpc_json.select(
        F.explode(F.from_json("payload", RPC_TRACE_DDL)).alias("t")
    ).select("t.*")
    a, res = F.col("action"), F.col("result")
    ttype = F.col("type")
    is_cc = ttype.isin("call", "create")
    from_address = F.when(is_cc, to_normalized_address(a["from"])).when(
        ttype == "suicide", to_normalized_address(a["address"])
    )
    to_address = (
        F.when(ttype == "call", to_normalized_address(a["to"]))
        .when(ttype == "create", to_normalized_address(res["address"]))
        .when(ttype == "suicide", to_normalized_address(a["refundAddress"]))
        .when(ttype == "reward", to_normalized_address(a["author"]))
    )
    value = F.when(is_cc | (ttype == "reward"), hex_to_dec38(a["value"])).when(
        ttype == "suicide", hex_to_dec38(a["balance"])
    )
    out = r.select(
        F.col("blockNumber").alias("block_number"),
        F.col("transactionHash").alias("transaction_hash"),
        F.col("transactionPosition").alias("transaction_index"),
        from_address.alias("from_address"),
        to_address.alias("to_address"),
        value.alias("value"),
        F.when(ttype == "call", a["input"]).when(ttype == "create", a["init"]).alias("input"),
        F.when(ttype == "call", res["output"]).when(ttype == "create", res["code"]).alias("output"),
        ttype.alias("trace_type"),
        F.when(ttype == "call", a["callType"]).alias("call_type"),
        F.when(ttype == "reward", a["rewardType"]).alias("reward_type"),
        F.when(is_cc, hex_to_long(a["gas"])).alias("gas"),
        F.when(is_cc, hex_to_long(res["gasUsed"])).alias("gas_used"),
        F.col("subtraces"),
        F.coalesce("traceAddress", F.array().cast("array<int>")).alias("trace_address"),
        F.col("error"),
    )
    tx_scoped_id = F.concat_ws(
        "_",
        F.col("trace_type"),
        F.col("transaction_hash"),
        F.concat_ws("_", F.transform("trace_address", lambda x: x.cast("string"))),
    )
    return out.withColumn(
        "trace_id", F.when(F.col("transaction_hash").isNotNull(), tx_scoped_id)
    )


def rpc_receipt_logs(rpc_json: DataFrame) -> DataFrame:
    """Nested receipt logs → log rows (receipt_log_mapper parity)."""
    r = _parsed(rpc_json, RPC_RECEIPT_DDL).select(F.explode("r.logs").alias("l"))
    g = F.col("l")
    return r.select(
        hex_to_long(g["logIndex"]).cast("int").alias("log_index"),
        g["transactionHash"].alias("transaction_hash"),
        hex_to_long(g["transactionIndex"]).cast("int").alias("transaction_index"),
        g["blockHash"].alias("block_hash"),
        hex_to_long(g["blockNumber"]).alias("block_number"),
        to_normalized_address(g["address"]).alias("address"),
        g["data"].alias("data"),
        g["topics"].alias("topics"),
    )
