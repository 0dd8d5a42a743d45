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
    token_addresses, wallet).

    v2-FORK coverage (solidly/sushiswap/meshswap/canto_dex — reference
    subclasses of UniswapV2Amm with identical event shapes): the Swap/Sync/
    Mint/Burn decode is byte-identical across forks; what differs is the
    NAMESPACE attribution, which the reference derives from the creating
    factory. When the ``pools`` dimension carries an ``amm`` column (as
    discover_pools emits), the trade inherits the pool's label instead of
    the hardcoded 'uniswap_v2'."""
    pcols = [
        F.col("address").alias("contract_address"),
        "factory_address",
        "token_addresses",
        F.element_at("token_addresses", 1).alias("__t0"),
        F.element_at("token_addresses", 2).alias("__t1"),
    ]
    if "amm" in pools.columns:
        pcols.append(F.col("amm").alias("__pool_amm"))
    p = F.broadcast(pools.select(*pcols))
    tok = tokens.select("address", "decimals")
    events = parsed_logs.filter(
        F.array_contains(F.col("namespace"), "uniswap_v2")
        & F.col("event_name").isin("Swap", "Sync", "Mint", "Burn")
    )
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
            (
                F.coalesce(F.col("__pool_amm"), F.lit("uniswap_v2"))
                if "amm" in pools.columns
                else F.lit("uniswap_v2")
            ).alias("amm"),
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


# ---------------------------------------------------------------------------
# Uniswap-V3 family (service/dex/uniswap_v3/uniswap_v3.py re-expressed)
# ---------------------------------------------------------------------------

UNISWAP_V3_ABIS = [
    EventAbi(
        name="Swap",
        inputs=[
            {"name": "sender", "type": "address", "indexed": True},
            {"name": "recipient", "type": "address", "indexed": True},
            {"name": "amount0", "type": "int256", "indexed": False},
            {"name": "amount1", "type": "int256", "indexed": False},
            {"name": "sqrtPriceX96", "type": "uint160", "indexed": False},
            {"name": "liquidity", "type": "uint128", "indexed": False},
            {"name": "tick", "type": "int24", "indexed": False},
        ],
        namespace="uniswap_v3",
        contract_name="pool",
    ),
    EventAbi(
        name="Mint",
        inputs=[
            {"name": "sender", "type": "address", "indexed": False},
            {"name": "owner", "type": "address", "indexed": True},
            {"name": "tickLower", "type": "int24", "indexed": True},
            {"name": "tickUpper", "type": "int24", "indexed": True},
            {"name": "amount", "type": "uint128", "indexed": False},
            {"name": "amount0", "type": "uint256", "indexed": False},
            {"name": "amount1", "type": "uint256", "indexed": False},
        ],
        namespace="uniswap_v3",
        contract_name="pool",
    ),
    EventAbi(
        name="Burn",
        inputs=[
            {"name": "owner", "type": "address", "indexed": True},
            {"name": "tickLower", "type": "int24", "indexed": True},
            {"name": "tickUpper", "type": "int24", "indexed": True},
            {"name": "amount", "type": "uint128", "indexed": False},
            {"name": "amount0", "type": "uint256", "indexed": False},
            {"name": "amount1", "type": "uint256", "indexed": False},
        ],
        namespace="uniswap_v3",
        contract_name="pool",
    ),
    EventAbi(
        name="Collect",
        inputs=[
            {"name": "owner", "type": "address", "indexed": True},
            {"name": "recipient", "type": "address", "indexed": False},
            {"name": "tickLower", "type": "int24", "indexed": True},
            {"name": "tickUpper", "type": "int24", "indexed": True},
            {"name": "amount0", "type": "uint128", "indexed": False},
            {"name": "amount1", "type": "uint128", "indexed": False},
        ],
        namespace="uniswap_v3",
        contract_name="pool",
    ),
]


def extract_dex_trades_v3(
    parsed_logs: DataFrame,
    pools: DataFrame,
    tokens: DataFrame,
    pool_balances: DataFrame | None = None,
    namespace: str = "uniswap_v3",
    amm: str | None = None,
    amount0_key: str = "amount0",
    amount1_key: str = "amount1",
    sqrtp_key: str = "sqrtPriceX96",
    event_names: tuple[str, ...] = ("Swap", "Mint", "Burn", "Collect"),
) -> DataFrame:
    """parsed uniswap-v3 pool logs → dex_trades rows.

    Reference semantics (uniswap_v3.py:134-226):
    - token_amounts = [amount0/10^d0, amount1/10^d1] for Swap/Mint/Burn and
      Collect (Collect resolves through the burn path → event_type 'burn');
      v3 Swap amounts are SIGNED int256 (out-token negative) — decoded by
      the signed static-ABI path.
    - price0 = (sqrtPriceX96² / 2¹⁹²) / (10^d1 / 10^d0); price1 = 1/price0
      (uniswap_v3.py:288-295). Non-Swap events carry no sqrtPriceX96 and the
      reference point-calls slot0; the lake rendering takes the last Swap's
      sqrtPriceX96 in the same (pool, tx) window, else 0 (the reference's
      error fallback).
    - reserves: the reference point-calls balanceOf(pool) per token at the
      trade block (uniswap_v3.py:123-132); here an AS-OF join against the
      ``pool_balances`` table (token_address, holder_address, block_number,
      value) — latest balance ≤ trade block, scaled by token decimals.
      Without it reserves are 0 (the reference's fallback).

    v3-FORK coverage: KyberSwap Elastic's Swap
    (service/dex/kyberswap_elastic/Pool.json — deltaQty0/deltaQty1/sqrtP)
    has the IDENTICAL canonical signature Swap(address,address,int256,
    int256,uint160,uint128,int24), hence the SAME topic0 as uniswap v3 —
    indistinguishable at the log level. Fork pools therefore decode through
    the v3 inventory and are ATTRIBUTED via the ``amm`` column of the pool
    dimension (the creating factory), the same mechanism as the v2 forks;
    the namespace/field-key parameters remain for forks that DO rename the
    event. quickswap_v3 (Algebra) swaps share this shape minus the fee
    field ordering and ride the same path.
    """
    pcols3 = [
        F.col("address").alias("contract_address"),
        "factory_address",
        "token_addresses",
        F.element_at("token_addresses", 1).alias("__t0"),
        F.element_at("token_addresses", 2).alias("__t1"),
    ]
    if "amm" in pools.columns:
        pcols3.append(F.col("amm").alias("__pool_amm"))
    p = F.broadcast(pools.select(*pcols3))
    tok = tokens.select("address", "decimals")
    events = parsed_logs.filter(
        F.array_contains(F.col("namespace"), namespace)
        & F.col("event_name").isin(*event_names)
    )
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

    # sqrtPriceX96 as-of within (pool, tx): Swap rows carry it; Mint/Burn/
    # Collect take the latest preceding one (same shape as the v2 Sync
    # window — no RPC)
    w = (
        Window.partitionBy("contract_address", "transaction_hash")
        .orderBy("log_index")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # sqrtPriceX96 is uint160 (max ~1.46e48): decode straight to double —
    # routing it through hex_to_dec38 NULLs above Decimal(38,0) and extreme
    # decimal-skew pairs would silently price at 0 / a stale mark (ADVICE r2)
    from ethereum_etl_spark.functions.hex import hex_to_double

    sqrtp = F.when(
        F.col("event_name") == "Swap",
        hex_to_double(F.col("parsed_event")[sqrtp_key]),
    )
    ev = ev.withColumn("__sqrtp", F.last(sqrtp, ignorenulls=True).over(w))
    scalars_diff = F.col("__s1") / F.col("__s0")
    price0 = F.when(
        F.col("__sqrtp").isNotNull(),
        (F.col("__sqrtp") * F.col("__sqrtp") / F.lit(float(2**192))) / scalars_diff,
    ).otherwise(F.lit(0.0))
    price1 = F.when(price0 > 0, F.lit(1.0) / price0).otherwise(F.lit(0.0))

    amount0 = _pe(amount0_key) / F.col("__s0")
    amount1 = _pe(amount1_key) / F.col("__s1")
    wallet = F.coalesce(
        F.col("parsed_event")["recipient"],
        F.col("parsed_event")["owner"],
        F.col("parsed_event")["sender"],
    )

    trades = ev.select(
        F.array(amount0, amount1).alias("token_amounts"),
        F.col("contract_address").alias("pool_address"),
        "transaction_hash",
        "log_index",
        "block_number",
        F.when(F.col("event_name") == "Swap", "swap")
        .when(F.col("event_name") == "Mint", "mint")
        .otherwise("burn")  # Burn and Collect both resolve as burns
        .alias("event_type"),
        F.array(price0, price1).alias("token_prices"),
        "token_addresses",
        "factory_address",
        wallet.alias("wallet_address"),
        (
            F.coalesce(F.col("__pool_amm"), F.lit(amm or namespace))
            if "amm" in pools.columns
            else F.lit(amm or namespace)
        ).alias("amm"),
        F.col("__t0"), F.col("__t1"), F.col("__s0"), F.col("__s1"),
    )

    if pool_balances is None:
        trades = trades.withColumn(
            "token_reserves", F.array(F.lit(0.0), F.lit(0.0))
        )
    else:
        trades = _asof_pool_reserves(trades, pool_balances)
    return trades.drop("__t0", "__t1", "__s0", "__s1")


def _asof_pool_reserves(trades: DataFrame, pool_balances: DataFrame) -> DataFrame:
    """As-of lookup: per trade and pool token, the latest balance with
    block_number ≤ trade block (inclusive, like balanceOf at the block).

    Union trick: balance rows and trade probes share one window keyed
    (holder=pool, token) ordered by (block, is_probe) — balances at the same
    block sort first, so the running last-value is the as-of answer. One
    shuffle, no range join explosion."""
    probes = trades.select(
        F.col("pool_address").alias("holder_address"),
        F.explode(
            F.array(
                F.struct(F.col("__t0").alias("token_address"), F.lit(0).alias("slot")),
                F.struct(F.col("__t1").alias("token_address"), F.lit(1).alias("slot")),
            )
        ).alias("pt"),
        F.col("block_number"),
        F.col("transaction_hash"),
        F.col("log_index"),
    ).select(
        "holder_address", F.col("pt.token_address").alias("token_address"),
        F.col("pt.slot").alias("slot"), "block_number", "transaction_hash", "log_index",
    )
    bal = pool_balances.select(
        "holder_address", "token_address", "block_number",
        F.col("value").cast("double").alias("__bal"),
    ).withColumn("__probe", F.lit(0)).withColumn("slot", F.lit(None).cast("int")) \
        .withColumn("transaction_hash", F.lit(None).cast("string")) \
        .withColumn("log_index", F.lit(None).cast("int"))
    pr = probes.withColumn("__probe", F.lit(1)).withColumn("__bal", F.lit(None).cast("double"))
    unioned = bal.unionByName(pr.select(*bal.columns))
    w = (
        Window.partitionBy("holder_address", "token_address")
        .orderBy("block_number", "__probe")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    asof = (
        unioned.withColumn("__asof", F.last("__bal", ignorenulls=True).over(w))
        .filter(F.col("__probe") == 1)
        .select(
            F.col("holder_address").alias("pool_address"),
            "transaction_hash", "log_index", "slot",
            F.coalesce("__asof", F.lit(0.0)).alias("__r"),
        )
    )
    r = asof.groupBy("pool_address", "transaction_hash", "log_index").pivot(
        "slot", [0, 1]
    ).agg(F.first("__r"))
    return trades.join(
        r, on=["pool_address", "transaction_hash", "log_index"], how="left"
    ).withColumn(
        "token_reserves",
        F.array(
            F.coalesce(F.col("0") / F.col("__s0"), F.lit(0.0)),
            F.coalesce(F.col("1") / F.col("__s1"), F.lit(0.0)),
        ),
    ).drop("0", "1")


# ---------------------------------------------------------------------------
# Pool discovery (export_dex_pools_job + per-AMM factory create metadata)
# ---------------------------------------------------------------------------

FACTORY_ABIS = [
    EventAbi(
        name="PairCreated",
        inputs=[
            {"name": "token0", "type": "address", "indexed": True},
            {"name": "token1", "type": "address", "indexed": True},
            {"name": "pair", "type": "address", "indexed": False},
            {"name": "idx", "type": "uint256", "indexed": False},
        ],
        namespace="uniswap_v2",
        contract_name="factory",
    ),
    EventAbi(
        name="PoolCreated",
        inputs=[
            {"name": "token0", "type": "address", "indexed": True},
            {"name": "token1", "type": "address", "indexed": True},
            {"name": "fee", "type": "uint24", "indexed": True},
            {"name": "tickSpacing", "type": "int24", "indexed": False},
            {"name": "pool", "type": "address", "indexed": False},
        ],
        namespace="uniswap_v3",
        contract_name="factory",
    ),
]

V2_DEFAULT_FEE = 3000  # DexPoolFeeAmount.MEDIUM (service/dex/enums.py:8)


def discover_pools(
    parsed_logs: DataFrame, factory_amm: dict[str, str] | None = None
) -> DataFrame:
    """Factory create events → dex_pools dimension rows (EthDexPool shape,
    domain/dex_pool.py:25-32). The reference bootstraps pools by RPC
    introspection per unseen address (export_dex_pools_job.py); a lake
    engine derives the dimension from the factory event stream itself —
    PairCreated (v2, fee fixed at MEDIUM=3000, LP token = the pair) and
    PoolCreated (v3, fee from the event, LP positions are NFTs → the pool
    address stands in, uniswap_v3.py:60-66).

    ``factory_amm``: factory address → amm label (the reference's
    deploys/metadata.json role) — lets v2/v3-shaped FORK factories
    (solidly, sushiswap, quickswap…) label their pools so downstream trade
    attribution inherits the right namespace."""
    pe = F.col("parsed_event")
    if factory_amm:
        fmap = F.create_map(
            *[F.lit(x) for k, v in factory_amm.items() for x in (k.lower(), v)]
        )
        amm_v2 = F.coalesce(fmap[F.lower("contract_address")], F.lit("uniswap_v2"))
        amm_v3 = F.coalesce(fmap[F.lower("contract_address")], F.lit("uniswap_v3"))
    else:
        amm_v2, amm_v3 = F.lit("uniswap_v2"), F.lit("uniswap_v3")
    v2 = parsed_logs.filter(F.col("event_name") == "PairCreated").select(
        F.lower(pe["pair"]).alias("address"),
        F.col("contract_address").alias("factory_address"),
        F.array(F.lower(pe["token0"]), F.lower(pe["token1"])).alias("token_addresses"),
        F.lit(V2_DEFAULT_FEE).alias("fee"),
        F.array(F.lower(pe["pair"])).alias("lp_token_addresses"),
        amm_v2.alias("amm"),
        F.col("block_number"),
    )
    v3 = parsed_logs.filter(F.col("event_name") == "PoolCreated").select(
        F.lower(pe["pool"]).alias("address"),
        F.col("contract_address").alias("factory_address"),
        F.array(F.lower(pe["token0"]), F.lower(pe["token1"])).alias("token_addresses"),
        pe["fee"].cast("int").alias("fee"),
        F.array(F.lower(pe["pool"])).alias("lp_token_addresses"),
        amm_v3.alias("amm"),
        F.col("block_number"),
    )
    return v2.unionByName(v3)


# ---------------------------------------------------------------------------
# Balancer-V2 family (service/dex/balancer/balancer.py re-expressed)
# ---------------------------------------------------------------------------

BALANCER_V2_ABIS = [
    EventAbi(
        name="Swap",
        inputs=[
            {"name": "poolId", "type": "bytes32", "indexed": True},
            {"name": "tokenIn", "type": "address", "indexed": True},
            {"name": "tokenOut", "type": "address", "indexed": True},
            {"name": "amountIn", "type": "uint256", "indexed": False},
            {"name": "amountOut", "type": "uint256", "indexed": False},
        ],
        namespace="balancer_v2",
        contract_name="vault",
    ),
]


def extract_dex_trades_balancer(parsed_logs: DataFrame, tokens: DataFrame) -> DataFrame:
    """Balancer-V2 Vault swaps → dex_trades rows (balancer.py:448-481).

    The ONE Vault contract emits every pool's Swap; the pool address is the
    first 20 bytes of the indexed poolId (balancer.py:129-133), so trade
    assembly needs no pool dimension at all — only token decimals.
    token_amounts = [amountIn/s_in, -amountOut/s_out] over
    token_addresses = [tokenIn, tokenOut]; prices = amountOut/amountIn and
    its reciprocal; reserves are RPC point-reads in the reference → 0 here
    (same fallback as its error path)."""
    pe = F.col("parsed_event")
    ev = parsed_logs.filter(
        F.array_contains(F.col("namespace"), "balancer_v2")
        & (F.col("event_name") == "Swap")
    ).select(
        "block_number", "transaction_hash", "log_index",
        F.lower(F.substring(pe["poolId"], 1, 42)).alias("pool_address"),
        F.lower(pe["tokenIn"]).alias("__tin"),
        F.lower(pe["tokenOut"]).alias("__tout"),
        pe["amountIn"].alias("__ain_raw"),
        pe["amountOut"].alias("__aout_raw"),
        F.col("contract_address").alias("factory_address"),  # the Vault
    )
    from ethereum_etl_spark.functions.hex import hex_to_dec38

    tok = tokens.select("address", "decimals")
    ev = (
        ev.join(
            F.broadcast(tok.select(F.col("address").alias("__tin"), F.col("decimals").alias("__din"))),
            on="__tin", how="left",
        )
        .join(
            F.broadcast(tok.select(F.col("address").alias("__tout"), F.col("decimals").alias("__dout"))),
            on="__tout", how="left",
        )
        .withColumn("__ain", hex_to_dec38(F.col("__ain_raw")).cast("double")
                    / F.pow(F.lit(10.0), F.coalesce("__din", F.lit(18))))
        .withColumn("__aout", hex_to_dec38(F.col("__aout_raw")).cast("double")
                    / F.pow(F.lit(10.0), F.coalesce("__dout", F.lit(18))))
    )
    p0 = F.when(F.col("__ain") != 0, F.abs(F.col("__aout") / F.col("__ain"))).otherwise(F.lit(0.0))
    p1 = F.when(F.col("__aout") != 0, F.abs(F.col("__ain") / F.col("__aout"))).otherwise(F.lit(0.0))
    return ev.select(
        F.array(F.col("__ain"), -F.col("__aout")).alias("token_amounts"),
        "pool_address",
        "transaction_hash",
        "log_index",
        "block_number",
        F.lit("swap").alias("event_type"),
        F.array(F.lit(0.0), F.lit(0.0)).alias("token_reserves"),
        F.array(p0, p1).alias("token_prices"),
        F.array(F.col("__tin"), F.col("__tout")).alias("token_addresses"),
        "factory_address",
        F.lit(None).cast("string").alias("wallet_address"),
        F.lit("balancer_v2").alias("amm"),
    )


# Curve stable-swap pools (reference service/dex/curve/curve.py:36-47 event
# enum; CurvePoolv1.json ABI): N-coin pools address their legs by COIN INDEX
# (int128 sold_id/bought_id), resolved against the pool's coin array —
# structurally different from the 2-token pair families above.
CURVE_ABIS = [
    EventAbi(
        name="TokenExchange",
        inputs=[
            {"name": "buyer", "type": "address", "indexed": True},
            {"name": "sold_id", "type": "int128", "indexed": False},
            {"name": "tokens_sold", "type": "uint256", "indexed": False},
            {"name": "bought_id", "type": "int128", "indexed": False},
            {"name": "tokens_bought", "type": "uint256", "indexed": False},
        ],
        namespace="curve",
        contract_name="pool",
    ),
    EventAbi(
        name="TokenExchangeUnderlying",
        inputs=[
            {"name": "buyer", "type": "address", "indexed": True},
            {"name": "sold_id", "type": "int128", "indexed": False},
            {"name": "tokens_sold", "type": "uint256", "indexed": False},
            {"name": "bought_id", "type": "int128", "indexed": False},
            {"name": "tokens_bought", "type": "uint256", "indexed": False},
        ],
        namespace="curve",
        contract_name="pool",
    ),
]


def extract_dex_trades_curve(
    parsed_logs: DataFrame, pools: DataFrame, tokens: DataFrame
) -> DataFrame:
    """Curve TokenExchange / TokenExchangeUnderlying → dex_trades rows
    (curve.py get_swap_from_exchange_event :514-556 /
    get_swap_from_underlying_event :558-603):

    - tokens = [coins[sold_id], coins[bought_id]] where coins is the pool's
      N-coin array — token_addresses for TokenExchange, the pool's
      underlying coin array for TokenExchangeUnderlying (falling back to
      token_addresses when the pool has no underlying set, the reference's
      non-metapool fallback :214-224);
    - amounts = [tokens_sold/10^d_i, -tokens_bought/10^d_j];
    - prices = [|a1/a0|, |a0/a1|] (the two-token price pair the reference
      derives from the swap itself); reserves = 0 (its RPC-error fallback —
      get_pool_finances point-calls get_dy per coin pair, unavailable to a
      lake engine);
    - an out-of-range coin index yields NULL legs and the row is dropped,
      mirroring the reference's resolve failure skip.

    ``pools`` may carry an optional ``underlying_token_addresses``
    array column next to the POOL_DDL shape."""
    pool_cols = [
        F.col("address").alias("contract_address"),
        "factory_address",
        "token_addresses",
    ]
    has_underlying = "underlying_token_addresses" in pools.columns
    if has_underlying:
        pool_cols.append("underlying_token_addresses")
    p = F.broadcast(pools.select(*pool_cols))
    ev = parsed_logs.filter(
        F.array_contains(F.col("namespace"), "curve")
        & F.col("event_name").isin("TokenExchange", "TokenExchangeUnderlying")
    ).join(p, on="contract_address", how="inner")
    if not has_underlying:
        ev = ev.withColumn(
            "underlying_token_addresses", F.lit(None).cast("array<string>")
        )
    coins = F.when(
        (F.col("event_name") == "TokenExchangeUnderlying")
        & F.col("underlying_token_addresses").isNotNull()
        & (F.size("underlying_token_addresses") > 0),
        F.col("underlying_token_addresses"),
    ).otherwise(F.col("token_addresses"))
    # sold_id/bought_id are tiny int128 → decimal strings from the signed
    # static decode; try_cast guards crafted giants under ANSI
    i = F.col("parsed_event")["sold_id"].try_cast("int")
    j = F.col("parsed_event")["bought_id"].try_cast("int")
    ev = (
        ev.withColumn("__coins", coins)
        .withColumn("__ti", F.when((i >= 0) & (i < F.size("__coins")), F.get("__coins", i)))
        .withColumn("__tj", F.when((j >= 0) & (j < F.size("__coins")), F.get("__coins", j)))
        .filter(F.col("__ti").isNotNull() & F.col("__tj").isNotNull())
    )
    tok = tokens.select("address", "decimals")
    ev = (
        ev.join(
            F.broadcast(tok.select(F.col("address").alias("__ti"), F.col("decimals").alias("__di"))),
            on="__ti", how="left",
        )
        .join(
            F.broadcast(tok.select(F.col("address").alias("__tj"), F.col("decimals").alias("__dj"))),
            on="__tj", how="left",
        )
        .withColumn(
            "__a0",
            _pe("tokens_sold") / F.pow(F.lit(10.0), F.coalesce("__di", F.lit(18))),
        )
        .withColumn(
            "__a1",
            -_pe("tokens_bought") / F.pow(F.lit(10.0), F.coalesce("__dj", F.lit(18))),
        )
    )
    p0 = F.when(F.col("__a0") != 0, F.abs(F.col("__a1") / F.col("__a0"))).otherwise(F.lit(0.0))
    p1 = F.when(F.col("__a1") != 0, F.abs(F.col("__a0") / F.col("__a1"))).otherwise(F.lit(0.0))
    return ev.select(
        F.array(F.col("__a0"), F.col("__a1")).alias("token_amounts"),
        F.col("contract_address").alias("pool_address"),
        "transaction_hash",
        "log_index",
        "block_number",
        F.lit("swap").alias("event_type"),
        F.array(F.lit(0.0), F.lit(0.0)).alias("token_reserves"),
        F.array(p0, p1).alias("token_prices"),
        F.array(F.col("__ti"), F.col("__tj")).alias("token_addresses"),
        "factory_address",
        F.col("parsed_event")["buyer"].alias("wallet_address"),
        F.lit("curve").alias("amm"),
    )


# DODO v1 pools (reference service/dex/dodo/contracts_v1.py:19-31,195-214):
# the pool holds an ordered [base, quote] pair and swaps are expressed as
# buy/sell of the BASE token rather than in/out amounts.
DODO_ABIS = [
    EventAbi(
        name="BuyBaseToken",
        inputs=[
            {"name": "buyer", "type": "address", "indexed": True},
            {"name": "receiveBase", "type": "uint256", "indexed": False},
            {"name": "payQuote", "type": "uint256", "indexed": False},
        ],
        namespace="dodo",
        contract_name="pool",
    ),
    EventAbi(
        name="SellBaseToken",
        inputs=[
            {"name": "seller", "type": "address", "indexed": True},
            {"name": "payBase", "type": "uint256", "indexed": False},
            {"name": "receiveQuote", "type": "uint256", "indexed": False},
        ],
        namespace="dodo",
        contract_name="pool",
    ),
]


def extract_dex_trades_dodo(
    parsed_logs: DataFrame, pools: DataFrame, tokens: DataFrame
) -> DataFrame:
    """DODO v1 BuyBaseToken / SellBaseToken → dex_trades rows
    (contracts_v1.py:195-214): amounts over [base, quote] =
    [-receiveBase/s0, +payQuote/s1] for buys and [+payBase/s0,
    -receiveQuote/s1] for sells. Prices are the swap's own ratio pair
    (the reference point-reads pool midprice over RPC; the trade-ratio
    fallback is the curve/balancer lake rendering); reserves 0 for the
    same reason."""
    p = F.broadcast(
        pools.select(
            F.col("address").alias("contract_address"),
            "factory_address",
            "token_addresses",
        )
    )
    ev = parsed_logs.filter(
        F.array_contains(F.col("namespace"), "dodo")
        & F.col("event_name").isin("BuyBaseToken", "SellBaseToken")
    ).join(p, on="contract_address", how="inner")
    tok = tokens.select("address", "decimals")
    ev = (
        ev.withColumn("__t0", F.element_at("token_addresses", 1))
        .withColumn("__t1", F.element_at("token_addresses", 2))
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
    is_buy = F.col("event_name") == "BuyBaseToken"
    a0 = F.when(is_buy, -_pe("receiveBase")).otherwise(_pe("payBase")) / F.col("__s0")
    a1 = F.when(is_buy, _pe("payQuote")).otherwise(-_pe("receiveQuote")) / F.col("__s1")
    ev = ev.withColumn("__a0", a0).withColumn("__a1", a1)
    p0 = F.when(F.col("__a0") != 0, F.abs(F.col("__a1") / F.col("__a0"))).otherwise(F.lit(0.0))
    p1 = F.when(F.col("__a1") != 0, F.abs(F.col("__a0") / F.col("__a1"))).otherwise(F.lit(0.0))
    wallet = F.coalesce(
        F.col("parsed_event")["buyer"], F.col("parsed_event")["seller"]
    )
    return ev.select(
        F.array(F.col("__a0"), F.col("__a1")).alias("token_amounts"),
        F.col("contract_address").alias("pool_address"),
        "transaction_hash",
        "log_index",
        "block_number",
        F.lit("swap").alias("event_type"),
        F.array(F.lit(0.0), F.lit(0.0)).alias("token_reserves"),
        F.array(p0, p1).alias("token_prices"),
        F.slice("token_addresses", 1, 2).alias("token_addresses"),
        "factory_address",
        wallet.alias("wallet_address"),
        F.lit("dodo").alias("amm"),
    )

