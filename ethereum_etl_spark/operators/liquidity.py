"""Liquidity-event (mint/burn) enrichment — the reference's per-transaction
LP-transfer-chain resolution re-expressed as a cogrouped Arrow UDF.

Reference semantics (/root/reference/ethereumetl/jobs/enrich_dex_trades_job.py):

- :141-178 ``_enrich_liquidity_events``: within one transaction, mint (resp.
  burn) trades that share an lp_token are MERGED (element-wise sum of
  token_amounts), then re-emitted once per resolved LP-token transfer, with
  ``wallet_address`` taken from that transfer's receiving (mint) /
  originating (burn) end.
- :423-477 ``_get_transfers_for_liquidity_events``: transactions with more
  than 500 transfers are skipped entirely (skew guard — the event rows then
  produce NO enriched output); chain starts are transfers minted from a
  NULL address (mint) / burned to one (burn).
- :374-421 ``_get_target_transfer``: each chain is walked through same-token
  transfers (next hop's ``from`` == current hop's ``to``; for burn the walk
  runs upstream with the roles flipped), first-in-log-order hop wins, hops
  are consumed within a chain but not across chains; an LP transfer that is
  NULL -> NULL resolves to the transaction's FIRST transfer's counterparty.
  Final hops are merged by (terminal wallet, token) with values summed.
- :181-187 pro-rating: only when SEVERAL events share one lp_token are the
  merged amounts scaled by transfer_value / sum(transfer_values).
- :240-260 LP leg: when the lp token is known with decimals, it is appended
  as an extra leg — amount = transfer_value / 10^dec, reserve =
  total_supply / 10^dec, price_stable = sum(reserves_stable) / supply.

Why a Pandas UDF: the walk is imperative and order-dependent (first-match
hop selection, per-chain consumption, a mutation-based NULL->NULL special
case) — not expressible as a bounded composition of joins without one join
per hop depth. It is, however, perfectly partitionable: everything is keyed
by transaction_hash, and the reference's own 500-transfer cap bounds every
group, so the cogrouped ``applyInPandas`` ships small Arrow batches and the
shuffle is a single hash partition by transaction_hash. Only LP-token
transfers are shipped to Python (the walk provably never leaves the start
transfer's token; the transaction-wide transfer COUNT the cap needs and the
first transfer's endpoints the NULL->NULL case needs are computed
Spark-side and attached as per-tx scalars).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ethereum_etl_spark.operators.balances import NULL_ADDRESSES

_NULL_SET = frozenset(NULL_ADDRESSES)

LIQUIDITY_EVENT_DDL = (
    "block_number long, transaction_hash string, log_index int,"
    "pool_address string, lp_token_address string, event_type string,"
    "wallet_address string, token_addresses array<string>,"
    "token_amounts array<double>, prices_stable array<double>,"
    "token_reserves array<double>, reserves_stable array<double>,"
    "amount_stable double, factory_address string, amm string"
)


def _walk_chain(start: dict, by_token: list[dict], to_k: str, from_k: str) -> dict:
    """One chain walk (enrich_dex_trades_job.py:374-421) over the LP-token
    transfers of one transaction, already in log_index order."""
    avail = {t["log_index"]: t for t in by_token}
    cur = start
    while True:
        hop = None
        for t in avail.values():
            if t[from_k] == cur[to_k]:
                hop = t
                break
        if hop is None:
            return cur
        del avail[hop["log_index"]]
        cur = hop


def _resolve_transfers(
    lp_transfers: list[dict],
    event_type: str,
    lp_tokens: set[str],
    first_from: str | None,
    first_to: str | None,
) -> dict[str, list[dict]]:
    """enrich_dex_trades_job.py:423-477 restricted to LP-token transfers
    (the only chains the caller consults)."""
    is_reverse = event_type == "burn"
    to_k, from_k = ("from_address", "to_address") if is_reverse else ("to_address", "from_address")

    starts = [t for t in lp_transfers if t[from_k] in _NULL_SET]
    finals = []
    for s in starts:
        if s["token_address"] in lp_tokens and s[to_k] in _NULL_SET:
            # NULL -> NULL LP move: attribute to the transaction's first
            # transfer's counterparty (:392-397)
            s = dict(s)
            s[to_k] = first_to if is_reverse else first_from
            finals.append(s)
            continue
        same_token = [t for t in lp_transfers if t["token_address"] == s["token_address"]]
        finals.append(_walk_chain(s, same_token, to_k, from_k))

    merged: dict[tuple[str, str], dict] = {}
    for t in finals:
        key = (t[to_k], t["token_address"])
        if key in merged:
            merged[key] = {**merged[key], "value": merged[key]["value"] + t["value"]}
        else:
            merged[key] = dict(t)
    out: dict[str, list[dict]] = {}
    for t in merged.values():
        out.setdefault(t["token_address"], []).append(t)
    return out


def _enrich_tx(
    trades: list[dict],
    transfers: list[dict],
    tx_transfer_count: int,
    first_from: str | None,
    first_to: str | None,
) -> Iterable[dict]:
    if tx_transfer_count == 0 or tx_transfer_count > 500:
        return  # :429-430 — the skew cap drops the whole transaction

    trades = sorted(trades, key=lambda r: r["log_index"])  # export order
    lp_transfers = sorted(transfers, key=lambda r: r["log_index"])
    lp_tokens = {
        r["lp_token_address"] for r in trades
        if isinstance(r["lp_token_address"], str)
    }

    for event_type in ("burn", "mint"):
        ev = [r for r in trades if r["event_type"] == event_type]
        if not ev:
            continue
        resolved = _resolve_transfers(
            lp_transfers, event_type, lp_tokens, first_from, first_to
        )
        wallet_k = "from_address" if event_type == "burn" else "to_address"

        by_lp: dict[str, list[dict]] = {}  # insertion order = event order
        for r in ev:
            lp = r["lp_token_address"]
            if isinstance(lp, str):
                by_lp.setdefault(lp, []).append(r)

        for lp_token, rows in by_lp.items():
            base = rows[0]
            n_legs = len(base["token_amounts"])
            merged_amounts = [
                sum(r["token_amounts"][i] for r in rows) for i in range(n_legs)
            ]
            chain = resolved.get(lp_token, [])
            total = sum(t["value"] for t in chain)

            def _arr(v):  # Arrow lists arrive as numpy arrays; NULL → zeros
                return list(v) if v is not None and len(v) else [0.0] * n_legs

            prices = _arr(base["prices_stable"])
            reserves = _arr(base["token_reserves"])
            reserves_stable = [r * p for r, p in zip(reserves, prices)]

            for t in chain:
                amounts = list(merged_amounts)
                if len(rows) > 1 and total:
                    # pro-rate ONLY when several events share the lp token
                    # (:181-185 — single-event transfers keep full amounts)
                    amounts = [a / total * t["value"] for a in amounts]
                amount_stable = sum(a * p for a, p in zip(amounts, prices))

                addrs = list(base["token_addresses"])
                out_prices, out_reserves = list(prices), list(reserves)
                out_rs = list(reserves_stable)
                lp_dec = base["__lp_decimals"]
                # reference :240 `if lp_token and lp_token['decimals']:` —
                # 0 decimals counts as unknown, no LP leg
                if lp_dec is not None and not pd.isna(lp_dec) and int(lp_dec):
                    scale = 10.0 ** int(lp_dec)
                    supply_raw = base["__lp_total_supply"]
                    supply = (
                        float(supply_raw) / scale
                        if supply_raw is not None and not pd.isna(supply_raw)
                        else 0.0
                    )
                    lp_price = sum(reserves_stable) / supply if supply else 0.0
                    addrs.append(lp_token)
                    amounts.append(t["value"] / scale)
                    out_prices.append(lp_price)
                    out_reserves.append(supply)
                    out_rs.append(supply * lp_price)

                yield {
                    "block_number": t["block_number"],
                    "transaction_hash": base["transaction_hash"],
                    "log_index": base["log_index"],
                    "pool_address": base["pool_address"],
                    "lp_token_address": lp_token,
                    "event_type": event_type,
                    "wallet_address": t[wallet_k],
                    "token_addresses": addrs,
                    "token_amounts": amounts,
                    "prices_stable": out_prices,
                    "token_reserves": out_reserves,
                    "reserves_stable": out_rs,
                    "amount_stable": amount_stable,
                    "factory_address": base["factory_address"],
                    "amm": base["amm"],
                }


_OUT_COLS = [f.strip().split(" ")[0] for f in LIQUIDITY_EVENT_DDL.split(",")]


def _map_fn(batches):
    """mapInPandas over PRE-AGGREGATED rows (one row = one transaction,
    trades/transfers as struct arrays): the per-transaction Python work is
    microseconds, so the dominant cost of a per-tx cogroup was the Arrow +
    pandas invocation PER GROUP (~1.5 ms × one group per transaction —
    measured as the single largest merge in the dex-inclusive replay).
    Folding the fan-out into struct-array rows amortizes that overhead over
    whole Arrow batches (~100x fewer Python crossings)."""
    for pdf in batches:
        rows: list[dict] = []
        for tx_trades, tx_transfers, cnt, ff, ft in zip(
            pdf["__trades"], pdf["__transfers"], pdf["__tx_transfer_count"],
            pdf["__first_from"], pdf["__first_to"],
        ):
            rows.extend(
                _enrich_tx(list(tx_trades), list(tx_transfers), int(cnt), ff, ft)
            )
        yield pd.DataFrame(rows, columns=_OUT_COLS)


def enrich_liquidity_events(
    trades: DataFrame,
    transfers: DataFrame,
    pools: DataFrame,
    tokens: DataFrame,
) -> DataFrame:
    """mint/burn dex_trades × token_transfers → per-LP-transfer enriched
    liquidity events (the reference's enriched_dex_trade rows for
    liquidity events).

    ``trades`` needs the already-priced dex_trades columns
    (token_amounts/token_reserves/prices_stable may be NULL → priced at 0,
    the reference's price-service fallback). ``pools`` supplies
    lp_token_addresses, ``tokens`` the LP token's decimals/total_supply.

    Scale shape: transfers are semi-joined to the liquidity transactions,
    the per-tx transfer count (cap) and first-transfer endpoints are one
    aggregation, only LP-token transfers cross the Arrow boundary, both
    sides collapse to per-transaction struct arrays (bounded by the
    reference's own 500-transfer cap) in ONE hash(transaction_hash)
    shuffle each, and the Python stage is a mapInPandas over those
    pre-aggregated rows — no per-group pandas invocations.
    """
    liq = trades.filter(F.col("event_type").isin("mint", "burn"))
    # key-filter both dims to this call's pools BEFORE broadcasting — the
    # probe set is batch-bounded, the dims grow with chain history
    pool_lp = pools.select(
        F.lower(F.col("address")).alias("pool_address"),
        F.lower(F.element_at("lp_token_addresses", 1)).alias("lp_token_address"),
    ).join(
        liq.select(F.lower("pool_address").alias("pool_address")).distinct(),
        on="pool_address",
        how="left_semi",
    )
    tok = tokens.select(
        F.lower(F.col("address")).alias("lp_token_address"),
        F.col("decimals").alias("__lp_decimals"),
        F.col("total_supply").cast("double").alias("__lp_total_supply"),
    ).join(
        pool_lp.select("lp_token_address").distinct(),
        on="lp_token_address",
        how="left_semi",
    )
    pool_lp, tok = F.broadcast(pool_lp), F.broadcast(tok)
    liq = (
        liq.withColumn("pool_address", F.lower("pool_address"))
        .join(pool_lp, on="pool_address", how="left")
        .join(tok, on="lp_token_address", how="left")
    )

    txs = liq.select("transaction_hash").distinct()
    tr = transfers.join(txs, on="transaction_hash", how="left_semi").select(
        "transaction_hash",
        "log_index",
        "block_number",
        F.lower("token_address").alias("token_address"),
        F.lower("from_address").alias("from_address"),
        F.lower("to_address").alias("to_address"),
        F.col("value").cast("double").alias("value"),
    )
    # per-tx scalars the Python side needs about the WHOLE transfer set
    stats = tr.groupBy("transaction_hash").agg(
        F.count(F.lit(1)).alias("__tx_transfer_count"),
        F.min_by("from_address", "log_index").alias("__first_from"),
        F.min_by("to_address", "log_index").alias("__first_to"),
    )
    # only LP-token transfers can appear in a consulted chain — ship just those
    lp_keys = liq.select(
        "transaction_hash", F.col("lp_token_address").alias("token_address")
    ).distinct()
    tr_lp = tr.join(lp_keys, on=["transaction_hash", "token_address"], how="left_semi")

    trade_cols = [
        "block_number", "log_index", "transaction_hash", "pool_address",
        "lp_token_address", "event_type", "token_amounts", "token_reserves",
        "prices_stable", "token_addresses", "factory_address", "amm",
        "__lp_decimals", "__lp_total_supply",
    ]
    liq_agg = liq.groupBy("transaction_hash").agg(
        F.collect_list(F.struct(*trade_cols)).alias("__trades")
    )
    tr_agg = tr_lp.groupBy("transaction_hash").agg(
        F.collect_list(
            F.struct(
                "log_index", "block_number", "token_address",
                "from_address", "to_address", "value",
            )
        ).alias("__transfers")
    )
    # inner: a liquidity transaction with NO LP-token transfers produces no
    # rows (reference :165-167 get -> []); left on stats is only belt and
    # braces (tr ⊇ tr_lp's transactions by construction)
    joined = (
        liq_agg.join(tr_agg, on="transaction_hash", how="inner")
        .join(stats, on="transaction_hash", how="left")
        .fillna({"__tx_transfer_count": 0})
    )
    return joined.mapInPandas(_map_fn, LIQUIDITY_EVENT_DDL)
