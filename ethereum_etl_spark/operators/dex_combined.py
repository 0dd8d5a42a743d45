"""Single-tree multi-family DEX trade assembly for the streaming hot path.

The per-family extractors in :mod:`ethereum_etl_spark.operators.dex` are the
documented, oracle-checked renderings of the reference's per-namespace AMM
clients (service/dex/*/ — one resolver class per family, dispatched by
dex_client_factory.py). Unioning them inside the CDC loop builds ~12
independent join trees per batch — each with its own pools broadcast, two
token-decimals broadcasts, and (for v2/v3/bento) a window — ~30 broadcast
exchanges and a Catalyst tree whose analysis alone is a measurable serial
per-cycle cost (profiled: the dex subgraph added ~60-100 s/cycle of mostly
fixed cost at small batch sizes).

Every family shares one skeleton: filter parsed logs → attach the pool row →
resolve the two traded legs → attach decimals → family-specific amount/price
arithmetic. This module runs that skeleton ONCE for all families:

- ONE broadcast join against the pools dimension (LEFT; families whose pair
  is in the event — balancer_v2, wombat, carbondefi — ignore it, and the
  per-family inner-join semantics are restored by a post-filter);
- ONE pair of token-decimals broadcast joins on the resolved leg addresses;
- ONE window shuffle over (contract_address, transaction_hash) computing both
  the v2/bento same-tx Sync reserves (exclusive frame) and the v3 last-Swap
  sqrtPriceX96 (inclusive frame) — Spark plans both frames over a single
  exchange because partitioning and ordering agree;
- per-family arithmetic as one CASE chain on the resolved ``__fam`` column.

Equivalence with the individual extractors is pinned by
tests/test_dex_combined.py (sorted full-row comparison on a WAL fixture that
emits every family), so the combined path inherits their oracle checks.

Family semantics are documented on the individual extractors; reference
citations live there (uniswap_v2 v2.py, uniswap_v3.py:134-226, curve.py:
514-603, saddle/saddle.py:87-105, contracts_v1.py:195-214,
contracts_v2.py:146-156, traderjoe_v2_1.py:68-221, oneinch.py:145-173,
sushiswap_bento.py:16-41, wombat.py:224-253, carbondefi.py:110-155,
fjord.py:125-174, balancer.py:448-481).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ethereum_etl_spark.operators.dex import (
    BALANCER_V2_ABIS,
    BANCOR_V2_ABIS,
    CARBON_ABIS,
    CURVE_ABIS,
    DMM_ABIS,
    DODO_ABIS,
    DODO_V2_ABIS,
    FJORD_ABIS,
    INFINITE_PRICE_THRESHOLD,
    MESHSWAP_ABIS,
    ONE_INCH_ABIS,
    SADDLE_ABIS,
    SUSHI_BENTO_ABIS,
    TRADERJOE_ABIS,
    UNISWAP_V2_ABIS,
    UNISWAP_V3_ABIS,
    WOMBAT_ABIS,
    _asof_pool_reserves,
    _lb_half,
    _pe,
    _ratio_prices,
)

# family key → its event-ABI list (one import point for the streamer: the
# combined inventory is the concatenation, and per-family topic0 sets gate
# which families a batch pays for)
FAMILY_ABIS = {
    "uniswap_v2": UNISWAP_V2_ABIS,
    "dmm": DMM_ABIS,
    "meshswap": MESHSWAP_ABIS,
    "uniswap_v3": UNISWAP_V3_ABIS,
    "balancer_v2": BALANCER_V2_ABIS,
    "curve": CURVE_ABIS,
    "saddle": SADDLE_ABIS,
    "dodo": DODO_ABIS,
    "dodo_v2": DODO_V2_ABIS,
    "traderjoe_v2_1": TRADERJOE_ABIS,
    "one_inch": ONE_INCH_ABIS,
    "sushiswap_bento": SUSHI_BENTO_ABIS,
    "wombat": WOMBAT_ABIS,
    "carbondefi": CARBON_ABIS,
    "fjord": FJORD_ABIS,
    "bancor_v2": BANCOR_V2_ABIS,
}

# family key → event names, in the SAME order the streamer's union ran the
# individual extractors (a hypothetical row matching two families resolves to
# the first — today no two families share a (topic0, event-name) pair, which
# the equivalence test would catch if an ABI change ever broke it)
FAMILY_EVENTS: dict[str, tuple[str, ...]] = {
    "uniswap_v2": ("Swap", "Sync", "Mint", "Burn"),
    # DMM Mint/Burn share v2's topic0s and ride the uniswap_v2 branch
    # (attributed "dmm" via the pool dim); DMM's own Sync is mark-only
    "dmm": ("Swap", "Sync"),
    "meshswap": ("ExchangePos", "ExchangeNeg", "AddLiquidity", "RemoveLiquidity"),
    "uniswap_v3": ("Swap", "Mint", "Burn", "Collect"),
    "balancer_v2": ("Swap",),
    "curve": ("TokenExchange", "TokenExchangeUnderlying"),
    "saddle": ("TokenSwap", "TokenSwapUnderlying"),
    "dodo": ("BuyBaseToken", "SellBaseToken"),
    "dodo_v2": ("DODOSwap",),
    "traderjoe_v2_1": ("Swap", "DepositedToBins", "WithdrawnFromBins"),
    "one_inch": ("Swapped",),
    "sushiswap_bento": ("Swap", "Sync", "Mint"),
    "wombat": ("Swap",),  # Deposit/Withdraw ride the aux N-leg union below
    "carbondefi": ("TokensTraded",),
    "fjord": ("Buy", "Sell"),
    "bancor_v2": ("Conversion", "LiquidityAdded", "LiquidityRemoved"),
}

# families that resolve their traded pair from the event itself and need no
# pool-dimension row (their per-family extractors take no ``pools`` argument)
_IN_EVENT_FAMILIES = {"balancer_v2", "wombat", "carbondefi"}


def _fam_case(families: list[str], events: dict[str, tuple[str, ...]] | None = None):
    """__fam := first family whose (namespace, event_name) predicate holds."""
    events = events or FAMILY_EVENTS
    expr = F.lit(None).cast("string")
    for fam in reversed(families):
        expr = F.when(
            F.array_contains(F.col("namespace"), fam)
            & F.col("event_name").isin(*events[fam]),
            F.lit(fam),
        ).otherwise(expr)
    return expr


def _norm_families(families: list[str] | None) -> list[str]:
    families = [f for f in FAMILY_EVENTS if families is None or f in set(families)]
    if not families:
        raise ValueError("families must be non-empty")
    return families


def prepare_marked(parsed_logs: DataFrame, families: list[str] | None = None) -> DataFrame:
    """Family dispatch + the shared Sync-reserve / v3-sqrtPrice window, with
    UNSCALED marks (``__res0_raw``/``__res1_raw``/``__sqrtp``); Sync rows
    dropped after feeding the window.

    Pools-INDEPENDENT by construction (r6): the window is keyed
    (contract_address, transaction_hash) and pool-membership is a property
    of the contract, so running it before the pools join sees extra marks
    only from contracts whose family rows the pools join would drop anyway
    (in-event families never read reserve/sqrtp marks). That makes this
    half of the extract buildable on the streamer's PREFETCH thread,
    overlapped with the previous batch's merges — it carries the window
    exchange and the family-dispatch codegen, which were serial inside the
    dex critical chain. Decimal scaling happens in
    extract_dex_trades_combined after the token joins, with the consuming
    row's own scale — identical arithmetic to the fused form.
    """
    families = _norm_families(families)
    fams = set(families)
    pe = F.col("parsed_event")
    fam = F.col("__fam")

    events_map = {f: FAMILY_EVENTS[f] for f in families}
    if "meshswap" in fams and "uniswap_v2" not in fams:
        # meshswap Syncs decode under uniswap v2's inventory row (identical
        # topic0 — MESHSWAP_ABIS note); when v2 itself isn't requested,
        # claim those rows through a mark-only pseudo-branch so the reserve
        # window still sees them (they never reach the output: Sync rows
        # are dropped after the window).
        events_map["uniswap_v2"] = ("Sync",)
    if "uniswap_v2" in fams and "dmm" not in fams:
        # the mirror case: v2-topic0 Mint/Burn on a Kyber DMM pool read
        # their reserves from DMM's OWN 4-word Sync (extract_dex_trades
        # admits those marks unconditionally) — keep the subset equivalent
        # with a mark-only dmm pseudo-branch
        events_map["dmm"] = ("Sync",)
    ev = parsed_logs.withColumn(
        "__fam", _fam_case(list(events_map), events_map)
    ).filter(F.col("__fam").isNotNull())

    win_cols: dict = {}
    sync_fams = set(events_map) & {"uniswap_v2", "dmm", "sushiswap_bento"}
    if sync_fams:
        w_excl = (
            Window.partitionBy("contract_address", "transaction_hash")
            .orderBy("log_index")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        is_sync = fam.isin(*sorted(sync_fams)) & (F.col("event_name") == "Sync")
        win_cols["__res0_raw"] = F.last(
            F.when(is_sync, _pe("reserve0")), ignorenulls=True
        ).over(w_excl)
        win_cols["__res1_raw"] = F.last(
            F.when(is_sync, _pe("reserve1")), ignorenulls=True
        ).over(w_excl)
    else:
        win_cols["__res0_raw"] = F.lit(None).cast("double")
        win_cols["__res1_raw"] = F.lit(None).cast("double")
    if "uniswap_v3" in fams:
        from ethereum_etl_spark.functions.hex import hex_to_double

        w_incl = (
            Window.partitionBy("contract_address", "transaction_hash")
            .orderBy("log_index")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        sqrtp_mark = F.when(
            (fam == "uniswap_v3") & (F.col("event_name") == "Swap"),
            hex_to_double(pe["sqrtPriceX96"]),
        )
        win_cols["__sqrtp"] = F.last(sqrtp_mark, ignorenulls=True).over(w_incl)

    # Sync rows only feed the window
    return ev.withColumns(win_cols).filter(F.col("event_name") != "Sync")


def extract_dex_trades_combined(
    parsed_logs: DataFrame,
    pools: DataFrame,
    tokens: DataFrame,
    pool_balances: DataFrame | None = None,
    families: list[str] | None = None,
    marked: DataFrame | None = None,
) -> DataFrame:
    """All requested AMM families → dex_trades rows in one join tree.

    ``families`` defaults to every key of FAMILY_EVENTS; the streamer passes
    the subset whose topic0s actually occur in the batch so the CASE chains
    stay as small as the batch needs. ``marked`` (optional) is a pre-built
    :func:`prepare_marked` frame for the SAME (parsed_logs, families) —
    the streamer hands in a prefetched checkpoint so the window/dispatch
    half runs off the critical path. Output schema = TRADE_SHAPE_DDL, row
    set identical to unioning the individual extractors.
    """
    families = _norm_families(families)
    fams = set(families)
    pe = F.col("parsed_event")
    fam = F.col("__fam")
    ev = marked if marked is not None else prepare_marked(parsed_logs, families)

    # ---- ONE pools attach (LEFT; inner-join semantics restored below) ----
    # Missing dimension columns are projected as NULL on the (tiny) pools
    # side rather than patched onto the joined tree afterwards: every extra
    # DataFrame transformation here re-runs eager analysis over the whole
    # accumulated tree — a measurable serial per-cycle driver cost.
    need_pool = bool(fams - _IN_EVENT_FAMILIES)
    has_amm = "amm" in pools.columns
    has_underlying = "underlying_token_addresses" in pools.columns
    if need_pool:
        pcols = [
            F.col("address").alias("contract_address"),
            F.col("factory_address").alias("__pfactory"),
            F.col("token_addresses").alias("__ptoks"),
            (F.col("amm") if has_amm else F.lit(None).cast("string")).alias("__pamm"),
            (
                F.col("underlying_token_addresses")
                if has_underlying
                else F.lit(None).cast("array<string>")
            ).alias("__punder"),
        ]
        ev = ev.join(
            F.broadcast(pools.select(*pcols)), on="contract_address", how="left"
        )
    else:
        ev = ev.withColumns(
            {
                "__pfactory": F.lit(None).cast("string"),
                "__ptoks": F.lit(None).cast("array<string>"),
                "__pamm": F.lit(None).cast("string"),
                "__punder": F.lit(None).cast("array<string>"),
            }
        )

    in_event = fam.isin(*sorted(_IN_EVENT_FAMILIES)) if fams & _IN_EVENT_FAMILIES else F.lit(False)
    # per-family INNER join semantics: pool-dimension families drop rows
    # whose emitting contract has no committed pool row
    ev = ev.filter(in_event | F.col("__ptoks").isNotNull())

    # ---- resolve the two traded legs (scaling pair) ----
    t0p = F.element_at("__ptoks", 1)
    t1p = F.element_at("__ptoks", 2)
    leg_a = t0p
    leg_b = t1p
    # coin-index families (curve + saddle): legs resolve by event coin index
    # into the pool's coin array (underlying for the *Underlying variants)
    _COIN_IDX = {"curve": ("sold_id", "bought_id"), "saddle": ("soldId", "boughtId")}
    coin_fams = [f for f in ("curve", "saddle") if f in fams]
    for cf in coin_fams:
        coins = F.when(
            F.col("event_name").isin("TokenExchangeUnderlying", "TokenSwapUnderlying")
            & F.col("__punder").isNotNull()
            & (F.size("__punder") > 0),
            F.col("__punder"),
        ).otherwise(F.col("__ptoks"))
        ci = pe[_COIN_IDX[cf][0]].try_cast("int")
        cj = pe[_COIN_IDX[cf][1]].try_cast("int")
        cf_ta = F.when((ci >= 0) & (ci < F.size(coins)), F.get(coins, ci))
        cf_tb = F.when((cj >= 0) & (cj < F.size(coins)), F.get(coins, cj))
        leg_a = F.when(fam == cf, cf_ta).otherwise(leg_a)
        leg_b = F.when(fam == cf, cf_tb).otherwise(leg_b)
    if "balancer_v2" in fams:
        leg_a = F.when(fam == "balancer_v2", F.lower(pe["tokenIn"])).otherwise(leg_a)
        leg_b = F.when(fam == "balancer_v2", F.lower(pe["tokenOut"])).otherwise(leg_b)
    if "wombat" in fams:
        leg_a = F.when(fam == "wombat", F.lower(pe["fromToken"])).otherwise(leg_a)
        leg_b = F.when(fam == "wombat", F.lower(pe["toToken"])).otherwise(leg_b)
    if "carbondefi" in fams:
        leg_a = F.when(fam == "carbondefi", F.lower(pe["sourceToken"])).otherwise(leg_a)
        leg_b = F.when(fam == "carbondefi", F.lower(pe["targetToken"])).otherwise(leg_b)
    ev = ev.withColumns({"__t0": leg_a, "__t1": leg_b})
    if coin_fams:
        # out-of-range coin index → resolve-failure skip
        ev = ev.filter(
            ~fam.isin(*coin_fams)
            | (F.col("__t0").isNotNull() & F.col("__t1").isNotNull())
        )

    # ---- ONE pair of decimals joins ----
    tok = tokens.select("address", "decimals")
    ev = ev.join(
        F.broadcast(tok.select(F.col("address").alias("__t0"), F.col("decimals").alias("__d0"))),
        on="__t0", how="left",
    ).join(
        F.broadcast(tok.select(F.col("address").alias("__t1"), F.col("decimals").alias("__d1"))),
        on="__t1", how="left",
    )
    # inline-able twins of __s0/__s1 for expressions created in the SAME
    # withColumns pass (a pass may not reference columns it creates)
    s0x = F.pow(F.lit(10.0), F.coalesce("__d0", F.lit(18)))
    s1x = F.pow(F.lit(10.0), F.coalesce("__d1", F.lit(18)))
    # reserve marks scaled by the CONSUMING row's own decimals — the window
    # itself ran (unscaled) in prepare_marked; NULL marks stay NULL through
    # the division, identical to the previously fused `last(...)/s0x`
    scale_cols = {
        "__s0": s0x,
        "__s1": s1x,
        "__res0": F.col("__res0_raw") / s0x,
        "__res1": F.col("__res1_raw") / s1x,
    }
    s0, s1 = F.col("__s0"), F.col("__s1")
    ev = ev.withColumns(scale_cols)

    # ---- per-family arithmetic ----
    en = F.col("event_name")
    clamp = lambda c: F.when(c >= INFINITE_PRICE_THRESHOLD, F.lit(0.0)).otherwise(c)  # noqa: E731

    def chain(cases, default=F.lit(None)):
        expr = None
        for f, e in cases:
            if f in fams:
                expr = F.when(fam == f, e) if expr is None else expr.when(fam == f, e)
        return default if expr is None else expr.otherwise(default)

    # amounts
    v2_a0 = (
        F.when(en == "Swap", (_pe("amount0In") - _pe("amount0Out")) / s0)
        .when(en == "Mint", _pe("amount0") / s0)
        .when(en == "Burn", -_pe("amount0") / s0)
    )
    v2_a1 = (
        F.when(en == "Swap", (_pe("amount1In") - _pe("amount1Out")) / s1)
        .when(en == "Mint", _pe("amount1") / s1)
        .when(en == "Burn", -_pe("amount1") / s1)
    )
    mesh_sw = en.isin("ExchangePos", "ExchangeNeg")
    mesh_sold0 = F.lower(pe["token0"]) == F.col("__t0")
    mesh_a0 = (
        F.when(mesh_sw, F.when(mesh_sold0, _pe("amount0")).otherwise(-_pe("amount1")))
        .when(en == "AddLiquidity", _pe("amount0"))
        .otherwise(-_pe("amount0"))
    )
    mesh_a1 = (
        F.when(mesh_sw, F.when(mesh_sold0, -_pe("amount1")).otherwise(_pe("amount0")))
        .when(en == "AddLiquidity", _pe("amount1"))
        .otherwise(-_pe("amount1"))
    )
    dodo_buy = en == "BuyBaseToken"
    tj_swap = en == "Swap"
    tj_arr = F.from_json(pe["amounts"], "array<string>")
    tj_a0 = F.when(
        tj_swap, _lb_half(pe["amountsIn"], False) - _lb_half(pe["amountsOut"], False)
    ).otherwise(F.aggregate(tj_arr, F.lit(0.0), lambda acc, w: acc + _lb_half(w, False)))
    tj_a1 = F.when(
        tj_swap, _lb_half(pe["amountsIn"], True) - _lb_half(pe["amountsOut"], True)
    ).otherwise(F.aggregate(tj_arr, F.lit(0.0), lambda acc, w: acc + _lb_half(w, True)))
    oi_dst1 = F.lower(pe["dst"]) == F.col("__t1")
    bento_in0 = F.lower(pe["tokenIn"]) == F.col("__t0")
    dv2_from0 = F.lower(pe["fromToken"]) == F.col("__t0")
    fj_buy = en == "Buy"
    # bancor v2 (BANCOR_V2_ABIS note): Conversion maps -_amount/+_return
    # onto the converter's reserve order; Liquidity* is one-sided _amount
    # at the _reserveToken leg (sign = mint/burn)
    bc_conv = en == "Conversion"
    bc_sign = F.when(en == "LiquidityAdded", F.lit(1.0)).otherwise(F.lit(-1.0))

    def _bc_leg(t, s_):
        return (
            F.when(
                bc_conv,
                F.when(F.lower(pe["_fromToken"]) == t, -_pe("_amount"))
                .when(F.lower(pe["_toToken"]) == t, _pe("_return"))
                .otherwise(F.lit(0.0)),
            ).otherwise(
                F.when(
                    F.lower(pe["_reserveToken"]) == t, bc_sign * _pe("_amount")
                ).otherwise(F.lit(0.0))
            )
            / s_
        )

    def _bc_res(t, s_):
        return F.when(
            ~bc_conv & (F.lower(pe["_reserveToken"]) == t),
            _pe("_newBalance") / s_,
        ).otherwise(F.lit(0.0))

    a0 = chain([
        ("uniswap_v2", v2_a0),
        ("dmm", v2_a0),
        ("meshswap", mesh_a0 / s0),
        ("uniswap_v3", _pe("amount0") / s0),
        ("balancer_v2", _pe("amountIn") / s0),
        ("curve", _pe("tokens_sold") / s0),
        ("saddle", _pe("tokensSold") / s0),
        ("dodo", (F.when(dodo_buy, -_pe("receiveBase")).otherwise(_pe("payBase"))) / s0),
        ("dodo_v2", (F.when(dv2_from0, _pe("fromAmount")).otherwise(-_pe("toAmount"))) / s0),
        ("traderjoe_v2_1", tj_a0 / s0),
        ("one_inch", (F.when(oi_dst1, -_pe("amount")).otherwise(_pe("result"))) / s0),
        ("sushiswap_bento", (
            F.when(en == "Swap", F.when(bento_in0, _pe("amountIn")).otherwise(-_pe("amountOut")))
            .when(en == "Mint", _pe("amount0"))
            .otherwise(-_pe("amount0"))
        ) / s0),
        ("wombat", _pe("fromAmount") / s0),
        ("carbondefi", _pe("sourceAmount") / s0),
        ("fjord", (F.when(fj_buy, -_pe("assets")).otherwise(_pe("assets"))) / s0),
        ("bancor_v2", _bc_leg(F.col("__t0"), s0)),
    ])
    a1 = chain([
        ("uniswap_v2", v2_a1),
        ("dmm", v2_a1),
        ("meshswap", mesh_a1 / s1),
        ("uniswap_v3", _pe("amount1") / s1),
        ("balancer_v2", -_pe("amountOut") / s1),
        ("curve", -_pe("tokens_bought") / s1),
        ("saddle", -_pe("tokensBought") / s1),
        ("dodo", (F.when(dodo_buy, _pe("payQuote")).otherwise(-_pe("receiveQuote"))) / s1),
        ("dodo_v2", (F.when(dv2_from0, -_pe("toAmount")).otherwise(_pe("fromAmount"))) / s1),
        ("traderjoe_v2_1", tj_a1 / s1),
        ("one_inch", (F.when(oi_dst1, _pe("result")).otherwise(-_pe("amount"))) / s1),
        ("sushiswap_bento", (
            F.when(en == "Swap", F.when(bento_in0, -_pe("amountOut")).otherwise(_pe("amountIn")))
            .when(en == "Mint", _pe("amount1"))
            .otherwise(-_pe("amount1"))
        ) / s1),
        ("wombat", -_pe("toAmount") / s1),
        ("carbondefi", -_pe("targetAmount") / s1),
        ("fjord", (F.when(fj_buy, _pe("shares")).otherwise(-_pe("shares"))) / s1),
        ("bancor_v2", _bc_leg(F.col("__t1"), s1)),
    ])
    ev = ev.withColumns({"__a0": a0, "__a1": a1})
    ra0, ra1 = F.col("__a0"), F.col("__a1")

    # prices
    rat0, rat1 = _ratio_prices(ra0, ra1)
    res_p0 = F.when(F.col("__res0") > 0, F.col("__res1") / F.col("__res0")).otherwise(F.lit(0.0))
    res_p1 = F.when(F.col("__res1") > 0, F.col("__res0") / F.col("__res1")).otherwise(F.lit(0.0))
    if "uniswap_v3" in fams:
        v3_p0 = F.when(
            F.col("__sqrtp").isNotNull(),
            (F.col("__sqrtp") * F.col("__sqrtp") / F.lit(float(2**192))) / (s1 / s0),
        ).otherwise(F.lit(0.0))
        v3_p1 = F.when(v3_p0 > 0, F.lit(1.0) / v3_p0).otherwise(F.lit(0.0))
    else:
        v3_p0 = v3_p1 = F.lit(0.0)
    oi_r0 = (F.when(oi_dst1, _pe("srcBalance")).otherwise(_pe("dstBalance"))) / s0
    oi_r1 = (F.when(oi_dst1, _pe("dstBalance")).otherwise(_pe("srcBalance"))) / s1
    oi_p0 = F.when(oi_r0 > 0, oi_r1 / oi_r0).otherwise(F.lit(0.0))
    oi_p1 = F.when(oi_r1 > 0, oi_r0 / oi_r1).otherwise(F.lit(0.0))
    tj_p0 = F.when(tj_swap, rat0).otherwise(F.lit(0.0))
    tj_p1 = F.when(tj_swap, rat1).otherwise(F.lit(0.0))
    p0 = chain([
        ("uniswap_v2", clamp(res_p0)),
        ("dmm", clamp(res_p0)),
        ("meshswap", clamp(res_p0)),
        ("uniswap_v3", v3_p0),
        ("one_inch", clamp(oi_p0)),
        ("sushiswap_bento", clamp(res_p0)),
        ("traderjoe_v2_1", tj_p0),
        ("bancor_v2", F.when(bc_conv, rat0).otherwise(F.lit(0.0))),
    ], default=rat0)
    p1 = chain([
        ("uniswap_v2", clamp(res_p1)),
        ("dmm", clamp(res_p1)),
        ("meshswap", clamp(res_p1)),
        ("uniswap_v3", v3_p1),
        ("one_inch", clamp(oi_p1)),
        ("sushiswap_bento", clamp(res_p1)),
        ("traderjoe_v2_1", tj_p1),
        ("bancor_v2", F.when(bc_conv, rat1).otherwise(F.lit(0.0))),
    ], default=rat1)

    # reserves (v3's as-of branch attaches after the select)
    zero2 = F.array(F.lit(0.0), F.lit(0.0))
    sync_res = F.array(
        F.coalesce("__res0", F.lit(0.0)), F.coalesce("__res1", F.lit(0.0))
    )
    reserves = chain([
        ("uniswap_v2", sync_res),
        ("dmm", sync_res),
        ("meshswap", sync_res),
        ("sushiswap_bento", sync_res),
        ("one_inch", F.array(oi_r0, oi_r1)),
        ("bancor_v2", F.array(_bc_res(F.col("__t0"), s0), _bc_res(F.col("__t1"), s1))),
    ], default=zero2)

    # event_type / wallet / amm / addresses / identity columns
    event_type = chain([
        ("uniswap_v2", F.when(en == "Swap", "swap").when(en == "Mint", "mint").otherwise("burn")),
        ("meshswap", F.when(mesh_sw, "swap").when(en == "AddLiquidity", "mint").otherwise("burn")),
        ("uniswap_v3", F.when(en == "Swap", "swap").when(en == "Mint", "mint").otherwise("burn")),
        ("traderjoe_v2_1", F.when(tj_swap, "swap").when(en == "DepositedToBins", "mint").otherwise("burn")),
        ("sushiswap_bento", F.when(en == "Swap", "swap").when(en == "Mint", "mint").otherwise("burn")),
        ("bancor_v2", F.when(bc_conv, "swap").when(en == "LiquidityAdded", "mint").otherwise("burn")),
    ], default=F.lit("swap"))
    wallet = chain([
        ("uniswap_v2", F.coalesce(pe["to"], pe["sender"])),
        ("dmm", F.coalesce(pe["to"], pe["sender"])),
        ("meshswap", F.lower(pe["user"])),
        ("uniswap_v3", F.coalesce(pe["recipient"], pe["owner"], pe["sender"])),
        ("balancer_v2", F.lit(None).cast("string")),
        ("curve", pe["buyer"]),
        ("saddle", pe["buyer"]),
        ("dodo", F.coalesce(pe["buyer"], pe["seller"])),
        ("dodo_v2", F.lower(pe["trader"])),
        ("traderjoe_v2_1", F.coalesce(pe["to"], pe["sender"])),
        ("one_inch", F.lower(pe["account"])),
        ("sushiswap_bento", F.coalesce(pe["recipient"], pe["sender"])),
        ("wombat", F.lower(pe["to"])),
        ("carbondefi", F.lower(pe["trader"])),
        ("fjord", F.lower(pe["caller"])),
        ("bancor_v2", F.lower(F.coalesce(pe["_trader"], pe["_provider"]))),
    ])
    amm = chain([
        ("uniswap_v2", F.coalesce(F.col("__pamm"), F.lit("uniswap_v2")) if has_amm else F.lit("uniswap_v2")),
        ("uniswap_v3", F.coalesce(F.col("__pamm"), F.lit("uniswap_v3")) if has_amm else F.lit("uniswap_v3")),
    ], default=F.coalesce(F.col("__pamm"), fam) if has_amm else fam)
    out_tokens = chain([
        ("uniswap_v2", F.col("__ptoks")),
        ("dmm", F.col("__ptoks")),
        ("uniswap_v3", F.col("__ptoks")),
        ("curve", F.array(F.col("__t0"), F.col("__t1"))),
        ("saddle", F.array(F.col("__t0"), F.col("__t1"))),
        ("balancer_v2", F.array(F.col("__t0"), F.col("__t1"))),
        ("wombat", F.array(F.col("__t0"), F.col("__t1"))),
        ("carbondefi", F.array(F.col("__t0"), F.col("__t1"))),
    ], default=F.slice("__ptoks", 1, 2))
    pool_address = (
        F.when(fam == "balancer_v2", F.lower(F.substring(pe["poolId"], 1, 42)))
        .otherwise(F.col("contract_address"))
        if "balancer_v2" in fams
        else F.col("contract_address")
    )
    factory = (
        F.when(in_event, F.col("contract_address")).otherwise(F.col("__pfactory"))
        if fams & _IN_EVENT_FAMILIES
        else F.col("__pfactory")
    )

    trades = ev.select(
        F.array(ra0, ra1).alias("token_amounts"),
        pool_address.alias("pool_address"),
        "transaction_hash",
        "log_index",
        "block_number",
        event_type.alias("event_type"),
        reserves.alias("token_reserves"),
        F.array(p0, p1).alias("token_prices"),
        out_tokens.alias("token_addresses"),
        factory.alias("factory_address"),
        wallet.alias("wallet_address"),
        amm.alias("amm"),
        fam.alias("__fam"),
        F.col("__t0"), F.col("__t1"), F.col("__s0"), F.col("__s1"),
    )

    if pool_balances is not None and "uniswap_v3" in fams:
        # v3 reserves: as-of against maintained pool balance history —
        # branch + union rather than a 12-tree fan-out. The split's two
        # branches would otherwise each EXECUTE the whole shared subtree
        # (parse + joins + window) — the union has no common-subplan reuse —
        # so pin it once with a lazy checkpoint (profiled: the in-loop raw
        # build ran ~2x the pool_balances=None cost before this barrier).
        trades = trades.localCheckpoint(eager=False)
        v3 = trades.filter(F.col("__fam") == "uniswap_v3")
        rest = trades.filter(F.col("__fam") != "uniswap_v3")
        v3 = _asof_pool_reserves(v3, pool_balances)
        trades = rest.unionByName(v3.select(*rest.columns))
    out = trades.drop("__fam", "__t0", "__t1", "__s0", "__s1")
    if "wombat" in fams:
        # wombat/platypus Deposit/Withdraw emit N-leg one-sided rows in pool
        # token order — a different row shape than the pair tree, unioned as
        # a (tiny) side branch only when the family is present in the batch
        from ethereum_etl_spark.operators.dex import (
            extract_dex_trades_wombat_liquidity,
        )

        out = out.unionByName(
            extract_dex_trades_wombat_liquidity(parsed_logs, pools, tokens)
        )
    return out
