"""DEX trade assembly (J6/J7, A8-A10 surface) — Uniswap-V2-family semantics.

Re-expresses the reference's dex subsystem on DataFrames:
- trade assembly joins: parsed_logs × broadcast(dex_pools) on pool address ×
  broadcast(tokens) per pool token (jobs/export_dex_trades.py:44-80 builds
  the same three hash maps in Python dicts).
- amounts: Swap → (amountIn − amountOut)/10^decimals per token; Mint/Burn →
  ±amounts (service/dex/uniswap_v2/uniswap_v2.py:166-230 family).
- reserves/prices: the reference point-calls getReserves at block−1
  (uniswap_v2.py:124-135); a lake engine reads them from the Sync event the
  pair emits in the SAME transaction before every Swap/Mint/Burn — an
  as-of lookup within (pool, tx) ordered by log_index, done with a window,
  no RPC. price0 = reserve1/reserve0 with the infinite-price clamp → 0
  (uniswap_v2.py:151-156, misc/info.py INFINITE_PRICE_THRESHOLD).
- enrichment (J7): trades × blocks via the shared broadcast enrich.

Scale shape: pools/tokens are broadcast dims; the only shuffle is the
within-tx window (keyed by pool+tx — bounded groups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ethereum_etl_spark.operators.parsed_logs import EventAbi

INFINITE_PRICE_THRESHOLD = 1e18

POOL_DDL = (
    "address string, factory_address string, token_addresses array<string>,"
    "fee int, lp_token_addresses array<string>"
)
TOKEN_DIM_DDL = "address string, symbol string, decimals int"

UNISWAP_V2_ABIS = [
    EventAbi(
        name="Swap",
        inputs=[
            {"name": "sender", "type": "address", "indexed": True},
            {"name": "amount0In", "type": "uint256", "indexed": False},
            {"name": "amount1In", "type": "uint256", "indexed": False},
            {"name": "amount0Out", "type": "uint256", "indexed": False},
            {"name": "amount1Out", "type": "uint256", "indexed": False},
            {"name": "to", "type": "address", "indexed": True},
        ],
        namespace="uniswap_v2",
        contract_name="pair",
    ),
    EventAbi(
        name="Sync",
        inputs=[
            {"name": "reserve0", "type": "uint112", "indexed": False},
            {"name": "reserve1", "type": "uint112", "indexed": False},
        ],
        namespace="uniswap_v2",
        contract_name="pair",
    ),
    EventAbi(
        name="Mint",
        inputs=[
            {"name": "sender", "type": "address", "indexed": True},
            {"name": "amount0", "type": "uint256", "indexed": False},
            {"name": "amount1", "type": "uint256", "indexed": False},
        ],
        namespace="uniswap_v2",
        contract_name="pair",
    ),
    EventAbi(
        name="Burn",
        inputs=[
            {"name": "sender", "type": "address", "indexed": True},
            {"name": "amount0", "type": "uint256", "indexed": False},
            {"name": "amount1", "type": "uint256", "indexed": False},
            {"name": "to", "type": "address", "indexed": True},
        ],
        namespace="uniswap_v2",
        contract_name="pair",
    ),
]


def _pe(name):
    # parsed_event values are decimal strings up to 2^63 and 0x-hex beyond
    # (parsed_logs static-decode contract) — hex_to_dec38 accepts both
    from ethereum_etl_spark.functions.hex import hex_to_dec38

    return hex_to_dec38(F.col("parsed_event")[name]).cast("double")


def extract_dex_trades(
    parsed_logs: DataFrame, pools: DataFrame, tokens: DataFrame
) -> DataFrame:
    """parsed uniswap-v2 logs → dex_trades rows (EthDexTrade shape:
    token_amounts, pool, tx, log_index, event_type, reserves, prices,
    token_addresses, wallet)."""
    p = F.broadcast(
        pools.select(
            F.col("address").alias("contract_address"),
            "factory_address",
            "token_addresses",
            F.element_at("token_addresses", 1).alias("__t0"),
            F.element_at("token_addresses", 2).alias("__t1"),
        )
    )
    tok = tokens.select("address", "decimals")
    events = parsed_logs.filter(F.col("event_name").isin("Swap", "Sync", "Mint", "Burn"))
    ev = (
        events.join(p, on="contract_address", how="inner")
        .join(
            F.broadcast(tok.select(F.col("address").alias("__t0"), F.col("decimals").alias("__d0"))),
            on="__t0", how="left",
        )
        .join(
            F.broadcast(tok.select(F.col("address").alias("__t1"), F.col("decimals").alias("__d1"))),
            on="__t1", how="left",
        )
        .withColumn("__s0", F.pow(F.lit(10.0), F.coalesce("__d0", F.lit(18))))
        .withColumn("__s1", F.pow(F.lit(10.0), F.coalesce("__d1", F.lit(18))))
    )

    # reserves as-of: last Sync in the same (pool, tx) before this log —
    # the no-RPC rendering of getReserves(block-1) + same-tx state updates
    w = (
        Window.partitionBy("contract_address", "transaction_hash")
        .orderBy("log_index")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ev = (
        ev.withColumn("__sync_r0", F.when(F.col("event_name") == "Sync", _pe("reserve0")))
        .withColumn("__sync_r1", F.when(F.col("event_name") == "Sync", _pe("reserve1")))
        .withColumn("reserve0", F.last("__sync_r0", ignorenulls=True).over(w) / F.col("__s0"))
        .withColumn("reserve1", F.last("__sync_r1", ignorenulls=True).over(w) / F.col("__s1"))
    )
    price0 = F.when(F.col("reserve0") > 0, F.col("reserve1") / F.col("reserve0")).otherwise(F.lit(0.0))
    price1 = F.when(F.col("reserve1") > 0, F.col("reserve0") / F.col("reserve1")).otherwise(F.lit(0.0))
    clamp = lambda c: F.when(c >= INFINITE_PRICE_THRESHOLD, F.lit(0.0)).otherwise(c)  # noqa: E731

    amount0 = (
        F.when(F.col("event_name") == "Swap", (_pe("amount0In") - _pe("amount0Out")) / F.col("__s0"))
        .when(F.col("event_name") == "Mint", _pe("amount0") / F.col("__s0"))
        .when(F.col("event_name") == "Burn", -_pe("amount0") / F.col("__s0"))
    )
    amount1 = (
        F.when(F.col("event_name") == "Swap", (_pe("amount1In") - _pe("amount1Out")) / F.col("__s1"))
        .when(F.col("event_name") == "Mint", _pe("amount1") / F.col("__s1"))
        .when(F.col("event_name") == "Burn", -_pe("amount1") / F.col("__s1"))
    )
    wallet = F.coalesce(F.col("parsed_event")["to"], F.col("parsed_event")["sender"])

    return (
        ev.filter(F.col("event_name") != "Sync")  # Sync only feeds reserves
        .select(
            F.array(amount0, amount1).alias("token_amounts"),
            F.col("contract_address").alias("pool_address"),
            "transaction_hash",
            "log_index",
            "block_number",
            F.lower(F.col("event_name")).alias("event_type"),
            F.array(
                F.coalesce("reserve0", F.lit(0.0)), F.coalesce("reserve1", F.lit(0.0))
            ).alias("token_reserves"),
            F.array(clamp(price0), clamp(price1)).alias("token_prices"),
            "token_addresses",
            "factory_address",
            wallet.alias("wallet_address"),
            F.lit("uniswap_v2").alias("amm"),
        )
        .withColumn(
            "event_type",
            F.when(F.col("event_type") == "swap", "swap")
            .when(F.col("event_type") == "mint", "mint")
            .otherwise("burn"),
        )
    )


def enrich_dex_trades(trades: DataFrame, blocks: DataFrame, tokens: DataFrame) -> DataFrame:
    """J7: trades × blocks (timestamp/hash) + token symbols array."""
    from ethereum_etl_spark.operators.enrich import enrich_with_blocks

    t = enrich_with_blocks(trades, blocks)
    sym = F.broadcast(tokens.select(F.col("address"), F.col("symbol")))
    t = (
        t.withColumn("__t0", F.element_at("token_addresses", 1))
        .withColumn("__t1", F.element_at("token_addresses", 2))
        .join(sym.select(F.col("address").alias("__t0"), F.col("symbol").alias("__sym0")), "__t0", "left")
        .join(sym.select(F.col("address").alias("__t1"), F.col("symbol").alias("__sym1")), "__t1", "left")
        .withColumn("symbols", F.array("__sym0", "__sym1"))
        .drop("__t0", "__t1", "__sym0", "__sym1")
    )
    return t


def liquidity_merge(trades: DataFrame) -> DataFrame:
    """A8 (enrich_dex_trades_job.py:141-173): element-wise sum of amount
    arrays per (transaction, pool) — zip_with over grouped arrays."""
    return (
        trades.groupBy("transaction_hash", "pool_address")
        .agg(F.collect_list("token_amounts").alias("amts"))
        .withColumn(
            "merged_amounts",
            F.aggregate(
                "amts",
                F.array(F.lit(0.0), F.lit(0.0)),
                lambda acc, a: F.zip_with(acc, a, lambda x, y: x + y),
            ),
        )
        .drop("amts")
    )


def latest_price_per_token(trades: DataFrame) -> DataFrame:
    """A10 (ch_adapter:572-593): newest price per token — explode the
    (token, price) pairs and max_by over (block, log_index)."""
    order = F.struct(F.col("block_number"), F.col("log_index"))
    pairs = trades.select(
        "block_number",
        "log_index",
        F.explode(F.arrays_zip(
            F.col("token_addresses").alias("token"), F.col("token_prices").alias("price")
        )).alias("z"),
    ).select("block_number", "log_index", F.col("z.token").alias("token_address"), F.col("z.price").alias("price"))
    return pairs.groupBy("token_address").agg(
        F.max_by("price", order).alias("latest_price"),
        F.max("block_number").alias("as_of_block"),
    )
