"""Entity schemas (Spark StructTypes) for every reference entity stream.

Derived from the reference domain dataclasses and warehouse DDL:
- blocks        /root/reference/ethereumetl/domain/block.py:27-48, db/migrations/schema.sql:10-36
- transactions  /root/reference/ethereumetl/domain/transaction.py:27-43, schema.sql:411-439
- receipts      /root/reference/ethereumetl/domain/receipt.py
- logs          /root/reference/ethereumetl/domain/receipt_log.py:26-35, schema.sql:450-463
- token_transfers /root/reference/ethereumetl/domain/token_transfer.py:33-44, schema.sql:1250-1269
- traces        /root/reference/ethereumetl/domain/trace.py:27-47, schema.sql:1460-1486
- geth_traces   /root/reference/ethereumetl/domain/geth_trace.py:4-7
- internal_transfers /root/reference/ethereumetl/domain/internal_transfer.py:4-12
- contracts     /root/reference/ethereumetl/domain/contract.py
- tokens        /root/reference/ethereumetl/domain/token.py:5-11
- token_balances /root/reference/ethereumetl/domain/token_balance.py
- native_balances /root/reference/ethereumetl/domain/native_balance.py:4-9
- errors        /root/reference/ethereumetl/domain/error.py:5-11

uint256 columns use DecimalType(38, 0) with the overflow-to-null + hex-string
sidecar strategy from SURVEY.md §7 (the reference's BigQuery schema makes the
same compromise, /root/reference/docs/limitations.md:9-12).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DecimalType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

U256 = DecimalType(38, 0)


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


BLOCK_SCHEMA = StructType([
    _f("number", LongType(), False),
    _f("hash", StringType(), False),
    _f("parent_hash", StringType()),
    _f("nonce", StringType()),
    _f("sha3_uncles", StringType()),
    _f("logs_bloom", StringType()),
    _f("transactions_root", StringType()),
    _f("state_root", StringType()),
    _f("receipts_root", StringType()),
    _f("miner", StringType()),
    _f("difficulty", U256),
    _f("total_difficulty", U256),
    _f("size", LongType()),
    _f("extra_data", StringType()),
    _f("gas_limit", LongType()),
    _f("gas_used", LongType()),
    _f("timestamp", LongType()),
    _f("transaction_count", LongType()),
    _f("base_fee_per_gas", LongType()),
])

# Additive schema-evolution columns that appear in later protocol upgrades
# (withdrawals/blob fields: golden CSV header
# /root/reference/tests/resources/test_export_blocks_job/blocks_with_transactions/expected_blocks.csv:1)
BLOCK_EVOLUTION_COLUMNS = StructType([
    _f("withdrawals_root", StringType()),
    _f("blob_gas_used", LongType()),
    _f("excess_blob_gas", LongType()),
])

TRANSACTION_SCHEMA = StructType([
    _f("hash", StringType(), False),
    _f("nonce", LongType()),
    _f("block_hash", StringType(), False),
    _f("block_number", LongType(), False),
    _f("transaction_index", IntegerType()),
    _f("from_address", StringType()),
    _f("to_address", StringType()),
    _f("value", U256),
    _f("gas", LongType()),
    _f("gas_price", U256),
    _f("input", StringType()),
    _f("block_timestamp", LongType()),
    _f("max_fee_per_gas", LongType()),
    _f("max_priority_fee_per_gas", LongType()),
    _f("transaction_type", IntegerType()),
])

RECEIPT_SCHEMA = StructType([
    _f("transaction_hash", StringType(), False),
    _f("transaction_index", IntegerType()),
    _f("block_hash", StringType(), False),
    _f("block_number", LongType(), False),
    _f("cumulative_gas_used", LongType()),
    _f("gas_used", LongType()),
    _f("contract_address", StringType()),
    _f("root", StringType()),
    _f("status", IntegerType()),
    _f("effective_gas_price", U256),
    _f("logs_count", IntegerType()),
])

LOG_SCHEMA = StructType([
    _f("log_index", IntegerType(), False),
    _f("transaction_hash", StringType(), False),
    _f("transaction_index", IntegerType()),
    _f("block_hash", StringType(), False),
    _f("block_number", LongType(), False),
    _f("address", StringType()),
    _f("data", StringType()),
    _f("topics", ArrayType(StringType())),
])

TOKEN_TRANSFER_SCHEMA = StructType([
    _f("token_address", StringType(), False),
    _f("token_standard", StringType(), False),
    _f("from_address", StringType()),
    _f("to_address", StringType()),
    _f("value", U256),
    _f("transaction_hash", StringType(), False),
    _f("log_index", IntegerType(), False),
    _f("block_number", LongType(), False),
    _f("token_id", U256),
    _f("operator_address", StringType()),
])

TRACE_SCHEMA = StructType([
    _f("block_number", LongType(), False),
    _f("transaction_hash", StringType()),
    _f("transaction_index", IntegerType()),
    _f("from_address", StringType()),
    _f("to_address", StringType()),
    _f("value", U256),
    _f("input", StringType()),
    _f("output", StringType()),
    _f("trace_type", StringType(), False),
    _f("call_type", StringType()),
    _f("reward_type", StringType()),
    _f("gas", LongType()),
    _f("gas_used", LongType()),
    _f("subtraces", IntegerType()),
    _f("trace_address", ArrayType(IntegerType())),
    _f("error", StringType()),
    _f("status", IntegerType()),
    _f("trace_id", StringType()),
    _f("trace_index", IntegerType()),
])

GETH_TRACE_SCHEMA = StructType([
    _f("transaction_hash", StringType(), False),
    _f("block_number", LongType(), False),
    _f("transaction_traces", StringType(), False),  # recursive JSON call tree
])

INTERNAL_TRANSFER_SCHEMA = StructType([
    _f("transaction_hash", StringType(), False),
    _f("block_number", LongType(), False),
    _f("from_address", StringType()),
    _f("to_address", StringType()),
    _f("value", U256),
    _f("gas_limit", LongType()),
    _f("id", StringType(), False),
])

CONTRACT_SCHEMA = StructType([
    _f("address", StringType(), False),
    _f("bytecode", StringType()),
    _f("function_sighashes", ArrayType(StringType())),
    _f("is_erc20", BooleanType()),
    _f("is_erc721", BooleanType()),
    _f("block_number", LongType()),
])

TOKEN_SCHEMA = StructType([
    _f("address", StringType(), False),
    _f("symbol", StringType()),
    _f("name", StringType()),
    _f("decimals", IntegerType()),
    _f("total_supply", U256),
    _f("block_number", LongType()),
])

TOKEN_BALANCE_SCHEMA = StructType([
    _f("token_address", StringType(), False),
    _f("holder_address", StringType(), False),
    _f("block_number", LongType(), False),
    _f("token_id", U256),
    _f("value", U256),
    _f("token_standard", StringType()),
])

NATIVE_BALANCE_SCHEMA = StructType([
    _f("block_number", LongType(), False),
    _f("address", StringType(), False),
    _f("value", U256),
])

# dex dimension + fact streams (domain/dex_pool.py:25-32,
# domain/dex_trade.py:7-44; warehouse keys schema.sql:63-88,474-483)
DEX_POOL_SCHEMA = StructType([
    _f("address", StringType(), False),
    _f("factory_address", StringType()),
    _f("token_addresses", ArrayType(StringType())),
    _f("fee", IntegerType()),
    _f("lp_token_addresses", ArrayType(StringType())),
    _f("amm", StringType()),
    _f("block_number", LongType()),
])

DEX_TRADE_SCHEMA = StructType([
    _f("block_number", LongType(), False),
    _f("transaction_hash", StringType(), False),
    _f("log_index", IntegerType(), False),
    _f("pool_address", StringType()),
    _f("event_type", StringType()),
    _f("token_amounts", ArrayType(DoubleType())),
    _f("token_reserves", ArrayType(DoubleType())),
    _f("token_prices", ArrayType(DoubleType())),
    _f("token_addresses", ArrayType(StringType())),
    _f("factory_address", StringType()),
    _f("wallet_address", StringType()),
    _f("amm", StringType()),
    # J7 enrichment (enrich_dex_trades_job.py:38-108): persisted when the
    # streamer is configured with stablecoins, NULL otherwise
    _f("prices_stable", ArrayType(DoubleType())),
    _f("amount_stable", DoubleType()),
    _f("owner", StringType()),
    _f("owner_type", StringType()),
])

# enriched liquidity events (enrich_dex_trades_job.py:141-263): mint/burn
# trades merged per (tx, lp_token) and re-emitted once per resolved
# LP-transfer chain, with the LP token appended as an extra leg
LIQUIDITY_EVENT_SCHEMA = StructType([
    _f("block_number", LongType(), False),
    _f("transaction_hash", StringType(), False),
    _f("log_index", IntegerType(), False),
    _f("pool_address", StringType()),
    _f("lp_token_address", StringType()),
    _f("event_type", StringType()),
    _f("wallet_address", StringType()),
    _f("token_addresses", ArrayType(StringType())),
    _f("token_amounts", ArrayType(DoubleType())),
    _f("prices_stable", ArrayType(DoubleType())),
    _f("token_reserves", ArrayType(DoubleType())),
    _f("reserves_stable", ArrayType(DoubleType())),
    _f("amount_stable", DoubleType()),
    _f("factory_address", StringType()),
    _f("amm", StringType()),
])

# as-of stable-price observations (PriceService state, made a table)
PRICE_MARK_SCHEMA = StructType([
    _f("token_address", StringType(), False),
    _f("block_number", LongType(), False),
    _f("log_index", IntegerType(), False),
    _f("price_stable", DoubleType()),
])

ERROR_SCHEMA = StructType([
    _f("timestamp", LongType(), False),
    _f("kind", StringType(), False),
    _f("data", StringType()),  # JSON payload, domain/error.py:5-11 dict -> JSON string
])

ENTITY_SCHEMAS: dict[str, StructType] = {
    "block": BLOCK_SCHEMA,
    "transaction": TRANSACTION_SCHEMA,
    "receipt": RECEIPT_SCHEMA,
    "log": LOG_SCHEMA,
    "token_transfer": TOKEN_TRANSFER_SCHEMA,
    "trace": TRACE_SCHEMA,
    "geth_trace": GETH_TRACE_SCHEMA,
    "internal_transfer": INTERNAL_TRANSFER_SCHEMA,
    "contract": CONTRACT_SCHEMA,
    "token": TOKEN_SCHEMA,
    "token_balance": TOKEN_BALANCE_SCHEMA,
    "native_balance": NATIVE_BALANCE_SCHEMA,
    "dex_pool": DEX_POOL_SCHEMA,
    "dex_trade": DEX_TRADE_SCHEMA,
    "liquidity_event": LIQUIDITY_EVENT_SCHEMA,
    "error": ERROR_SCHEMA,
}

# Natural (MERGE / ReplacingMergeTree ORDER BY) keys per entity — SURVEY §1.4,
# /root/reference/db/migrations/schema.sql (engines table).  block_hash is the
# reorg discriminator everywhere it appears.
ENTITY_KEYS: dict[str, list[str]] = {
    "block": ["number"],
    "transaction": ["block_number", "hash"],
    "receipt": ["block_number", "transaction_hash"],
    "log": ["block_number", "transaction_hash", "log_index"],
    "token_transfer": ["block_number", "transaction_hash", "log_index", "token_id"],
    "trace": ["trace_id"],
    "geth_trace": ["block_number", "transaction_hash"],
    "internal_transfer": ["block_number", "transaction_hash", "id"],
    "contract": ["address"],
    "token": ["address"],
    "token_balance": ["block_number", "token_address", "holder_address", "token_id"],
    "native_balance": ["block_number", "address"],
    "dex_pool": ["address"],
    "dex_trade": ["block_number", "transaction_hash", "log_index"],
    # per-transfer fan-out: one event row per (lp token, terminal wallet)
    "liquidity_event": [
        "block_number", "transaction_hash", "log_index",
        "lp_token_address", "wallet_address",
    ],
    "error": ["timestamp", "kind"],
}

# item_id field lists (idempotency keys) —
# /root/reference/ethereumetl/streaming/eth_item_id_calculator.py:31-52
ITEM_ID_FIELDS: dict[str, list[str]] = {
    "block": ["hash"],
    "transaction": ["hash"],
    "receipt": ["transaction_hash"],
    "log": ["transaction_hash", "log_index"],
    "token_transfer": ["transaction_hash", "log_index"],
    "trace": ["trace_id"],
    "geth_trace": ["block_number", "transaction_hash"],
    "internal_transfer": ["block_number", "transaction_hash", "id"],
    "contract": ["block_number", "address"],
    "token": ["address"],
    "token_balance": ["block_number", "token_address", "holder_address", "token_id"],
    "native_balance": ["block_number", "address"],
    "dex_pool": ["address"],
    "dex_trade": ["transaction_hash", "log_index"],
    "liquidity_event": [
        "transaction_hash", "log_index", "lp_token_address", "wallet_address",
    ],
    "error": ["timestamp", "kind"],
}

# Deterministic output sort per entity —
# /root/reference/ethereumetl/streaming/eth_streamer_adapter.py:80-102
SORT_BY_FIELDS: dict[str, list[str]] = {
    "block": ["number"],
    "transaction": ["block_number", "transaction_index"],
    "receipt": ["block_number", "transaction_index"],
    "log": ["block_number", "log_index"],
    "token_transfer": ["block_number", "log_index"],
    "trace": ["block_number", "trace_index"],
    "geth_trace": ["block_number", "transaction_hash"],
    "internal_transfer": ["block_number", "transaction_hash", "id"],
    "contract": ["block_number", "address"],
    "token": ["block_number", "address"],
    "token_balance": ["block_number", "token_address", "holder_address"],
    "native_balance": ["block_number", "address"],
    "dex_pool": ["block_number", "address"],
    "dex_trade": ["block_number", "log_index"],
    "liquidity_event": ["block_number", "log_index", "wallet_address"],
    "error": ["timestamp"],
}

# Change-event WAL envelope — FIXTURES.md §0; the engine's only streaming input.
CHANGE_EVENT_SCHEMA = StructType([
    _f("block_number", LongType(), False),
    _f("block_hash", StringType(), False),
    _f("entity_type", StringType(), False),
    _f("op", StringType(), False),  # 'upsert' | 'reorg'
    _f("payload", StringType(), False),  # JSON per entity schema
])

# north_rule input shape: source-code repository change events (BASELINE.json
# input_hint) — the generic-CDC demo table.
REPO_FILE_SCHEMA = StructType([
    _f("repo", StringType(), False),
    _f("path", StringType(), False),
    _f("commit", StringType(), False),
    _f("lang", StringType()),
    _f("content", StringType()),
])
