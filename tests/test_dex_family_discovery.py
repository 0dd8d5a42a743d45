"""Factory-event pool discovery end-to-end in the CDC loop (VERDICT r4
items 1 + 7): curve pools resolved through the SAME-tx CREATE trace, DODO
v1/v2 pools from their factory events, v3 pools from PoolCreated — all
discovered FROM the WAL (no fabricated dims) — and every family's trades
assemble against the discovered dimension. The v3 trades carry NON-ZERO
reserves from the maintained token_balances table (as-of at the trade
block), replacing the reference's per-trade balanceOf point-calls
(uniswap_v3.py:123-132). Also proves cfg.factory_amm fork labeling flows
discovery → dimension → trade attribution."""

from __future__ import annotations

import hashlib
import shutil
import tempfile

from pyspark.sql import functions as F

from ethereum_etl_spark.sources.wal import (
    DEX_STABLE,
    ChainWalSpec,
    WalTailer,
    generate_chain_wal,
)
from ethereum_etl_spark.streaming import ChainStreamer, StreamerConfig

ENTITIES = (
    "block", "transaction", "receipt", "log", "token", "token_transfer",
    "geth_trace", "trace", "contract", "token_balance",
    "dex_pool", "dex_trade",
)


def _addr(prefix: str, salt: int) -> str:
    return "0x" + hashlib.sha256(f"{prefix}:{salt}".encode()).hexdigest()[:40]


def test_family_discovery_and_assembly(spark):
    wh = tempfile.mkdtemp(prefix="dex_fam_wh_")
    try:
        n_pools, end_block = 4, 59
        active = end_block + 1 - n_pools
        spec = ChainWalSpec(
            start_block=0, end_block=end_block,
            dex_pools=n_pools, dex_families=True,
        )
        wal = generate_chain_wal(spark, spec).cache()
        cfg = StreamerConfig(
            warehouse=wh, batch_size=200, partition_size=16,
            entity_types=ENTITIES,
            factory_amm={_addr("dexfactory", 0): "sushiswap"},
        )
        s = ChainStreamer(spark, cfg)
        s.run(WalTailer(wal, batch_size=200))

        pools = s.tables["dex_pools"].read()
        by_amm = {
            r["amm"]: r["n"]
            for r in pools.groupBy("amm").agg(F.count("*").alias("n")).collect()
        }
        # 5 families × n_pools each; the v2 factory is amm-mapped to its
        # fork label at DISCOVERY time (deploys/metadata.json role)
        assert by_amm == {
            "sushiswap": n_pools, "curve": n_pools, "dodo": n_pools,
            "dodo_v2": n_pools, "uniswap_v3": n_pools,
        }, by_amm

        # the curve pool address came from the same-tx CREATE trace
        curve_pools = {
            r["address"]: r for r in pools.filter(F.col("amm") == "curve").collect()
        }
        for k in range(n_pools):
            expect = _addr("curvepool", k)
            assert expect in curve_pools, (expect, sorted(curve_pools))
            assert curve_pools[expect]["token_addresses"] == [
                DEX_STABLE, _addr("dtok", k),
            ]

        trades = s.tables["dex_trades"].read().cache()
        t_by_amm = {
            r["amm"]: r["n"]
            for r in trades.groupBy("amm").agg(F.count("*").alias("n")).collect()
        }
        # the v2 family carries one Swap + one Mint per active block
        assert t_by_amm == {
            "sushiswap": 2 * active, "curve": active, "dodo": active,
            "dodo_v2": active, "uniswap_v3": active,
        }, t_by_amm

        b = 20  # any active block
        rows = {
            r["amm"]: r
            for r in trades.filter(
                (F.col("block_number") == b) & (F.col("event_type") == "swap")
            ).collect()
        }
        # curve: sold_id=0 → +(b%50+1) stable units (6 dec); bought leg negative
        cr = rows["curve"]
        assert abs(cr["token_amounts"][0] - (b % 50 + 1)) < 1e-9
        assert cr["token_amounts"][1] < 0
        assert cr["token_addresses"][0] == DEX_STABLE
        # dodo v1 (even block → SellBaseToken): +base, −quote over [base, quote]
        d1 = rows["dodo"]
        assert d1["event_type"] == "swap"
        assert d1["token_amounts"][0] > 0 and d1["token_amounts"][1] < 0
        # dodo v2: fromToken=stable=pool.token1 → +from on slot 1
        d2 = rows["dodo_v2"]
        assert abs(d2["token_amounts"][1] - (b % 50 + 1)) < 1e-9
        assert d2["token_amounts"][0] < 0
        # v3: signed decode (+stable in, −token out) AND reserves resolved
        # from the maintained balance table — the transfers INTO the pool
        # earlier in the stream (and at this very block) are visible as-of
        v3 = rows["uniswap_v3"]
        assert abs(v3["token_amounts"][0] - (b % 50 + 1)) < 1e-9
        assert v3["token_amounts"][1] < 0
        assert v3["token_reserves"][0] > 0 and v3["token_reserves"][1] > 0
        assert v3["token_prices"][0] > 0
        # fork attribution rides the mapped pool dimension
        assert rows["sushiswap"]["factory_address"] == _addr("dexfactory", 0)
        trades.unpersist()
        wal.unpersist()
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def test_curve_fork_labels_ellipsis_saddle(spark):
    """Ellipsis (and saddle registry deployments that reuse curve-shaped
    factory events) are curve forks the reference ships as separate,
    factory-commented clients (service/dex/ellipsis/ellipsis.py CurveAmm
    subclass, service/dex/saddle/). They carry no decode of their own here
    beyond SADDLE_ABIS — discovery labels their pools through the
    ``factory_amm`` map and trade attribution inherits the pool's label,
    exactly like the v2/v3 fork families."""
    wh = tempfile.mkdtemp(prefix="dex_ellipsis_wh_")
    try:
        spec = ChainWalSpec(
            start_block=0, end_block=39, dex_pools=2, dex_families=True,
        )
        wal = generate_chain_wal(spark, spec).cache()
        cfg = StreamerConfig(
            warehouse=wh, batch_size=200, partition_size=16,
            entity_types=ENTITIES,
            factory_amm={
                _addr("curvefactory", 0): "ellipsis",
                _addr("v3factory", 0): "saddle",  # any factory row can map
            },
        )
        s = ChainStreamer(spark, cfg)
        s.run(WalTailer(wal, batch_size=200))

        pools = s.tables["dex_pools"].read()
        labels = {r["amm"] for r in pools.select("amm").distinct().collect()}
        assert "ellipsis" in labels and "saddle" in labels, labels
        # curve-event trades on the ellipsis-labeled pools attribute the
        # fork name (pool-dim indirection, not the hardcoded namespace)
        trades = s.tables["dex_trades"].read()
        ell = trades.filter(F.col("amm") == "ellipsis")
        assert ell.count() > 0
        assert {r["address"] for r in pools.filter(F.col("amm") == "ellipsis").collect()} == {
            r["pool_address"] for r in ell.select("pool_address").distinct().collect()
        }
        assert trades.filter(F.col("amm") == "curve").count() == 0
        wal.unpersist()
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def test_metapool_underlying_decimals_via_tok_probe(spark):
    """ADVICE r3 / VERDICT r4 minor: the streamer's token-dim semi-join
    (tok_probe) must explode the batch pools' UNDERLYING coin arrays, not
    just their top-level pairs — otherwise a TokenExchangeUnderlying leg's
    decimals silently fall back to 18. End-to-end: metapools discovered
    from MetaPoolDeployed + same-tx CREATE, underlying = [coin] + base
    coins, and the sold leg scales by the 9-decimal underlying token."""
    wh = tempfile.mkdtemp(prefix="dex_meta_wh_")
    try:
        n_pools = 3
        spec = ChainWalSpec(
            start_block=0, end_block=39, dex_pools=n_pools,
            dex_families=True, dex_metapools=True,
        )
        wal = generate_chain_wal(spark, spec).cache()
        cfg = StreamerConfig(
            warehouse=wh, batch_size=200, partition_size=16,
            entity_types=ENTITIES,
        )
        s = ChainStreamer(spark, cfg)
        s.run(WalTailer(wal, batch_size=200))

        pools = s.tables["dex_pools"].read()
        metas = {
            r["address"]: r
            for r in pools.filter(
                F.col("underlying_token_addresses").isNotNull()
            ).collect()
        }
        assert len(metas) == n_pools, sorted(metas)
        for k in range(n_pools):
            row = metas[_addr("curvemeta", k)]
            assert row["underlying_token_addresses"] == [
                _addr("utok", k), DEX_STABLE, _addr("dtok", k),
            ], row
            # metapool pairs [coin, base_pool]
            assert row["token_addresses"] == [
                _addr("utok", k), _addr("curvepool", k),
            ]

        trades = s.tables["dex_trades"].read().filter(
            F.col("pool_address").startswith("0x")
            & F.col("token_addresses")[0].isin(
                *[_addr("utok", k) for k in range(n_pools)]
            )
        ).collect()
        assert len(trades) == 40 - n_pools  # one underlying swap per active block
        for r in trades:
            b = r["block_number"]
            # sold leg scaled by utok's 9 decimals (an 18-fallback would
            # shrink it by 1e9), bought leg by the stable's 6
            assert abs(r["token_amounts"][0] - (b % 50 + 1)) < 1e-9, r
            assert abs(r["token_amounts"][1] + (b % 40 + 1)) < 1e-9, r
            assert r["token_addresses"][1] == DEX_STABLE
            assert r["amm"] == "curve"
        wal.unpersist()
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def test_dmm_pool_created_discovery(spark):
    """Kyber DMM factory PoolCreated (own topic0: amp factor, no fee tier;
    reference IDMMFactory.json, dmm.py enabled in the live factory) — the
    pool lands in the dimension labeled dmm, v2 pool semantics (LP token =
    the pool, fee MEDIUM), disambiguated from v3's same-NAME PoolCreated by
    inventory namespace."""
    from ethereum_etl_spark.operators.dex import (
        FACTORY_ABIS,
        V2_DEFAULT_FEE,
        discover_pools,
    )
    from ethereum_etl_spark.operators.parsed_logs import build_inventory, parse_logs

    DMM_PC = next(
        a for a in FACTORY_ABIS if a.namespace == "dmm" and a.name == "PoolCreated"
    )
    V3_PC = next(
        a for a in FACTORY_ABIS
        if a.namespace == "uniswap_v3" and a.name == "PoolCreated"
    )
    assert DMM_PC.topic0 != V3_PC.topic0
    word = lambda n: f"{n:064x}"  # noqa: E731
    t = lambda n: "0x" + word(n)  # noqa: E731
    logs = spark.createDataFrame(
        [
            (1, "0xt1", 0, "0xb", 5, "0x" + "fa" * 20,
             "0x" + word(0xD00) + word(10000) + word(7), [DMM_PC.topic0, t(0xA), t(0xB)]),
            (2, "0xt1", 0, "0xb", 5, "0x" + "fb" * 20,
             "0x" + word(60) + word(0xE00), [V3_PC.topic0, t(0xA), t(0xB), t(3000)]),
        ],
        "log_index int, transaction_hash string, transaction_index int,"
        "block_hash string, block_number long, address string, data string,"
        "topics array<string>",
    )
    parsed = parse_logs(logs, build_inventory(spark, FACTORY_ABIS), FACTORY_ABIS)
    pools = {r["amm"]: r for r in discover_pools(parsed).collect()}
    assert set(pools) == {"dmm", "uniswap_v3"}
    dmm = pools["dmm"]
    assert dmm["address"] == "0x" + word(0xD00)[-40:]
    assert dmm["token_addresses"] == ["0x" + word(0xA)[-40:], "0x" + word(0xB)[-40:]]
    assert dmm["fee"] == V2_DEFAULT_FEE
    assert dmm["lp_token_addresses"] == [dmm["address"]]
    assert pools["uniswap_v3"]["fee"] == 3000


def test_dmm_end_to_end_in_streamer(spark):
    """Kyber DMM through the full CDC loop: factory PoolCreated discovery,
    DMM-Swap assembly with reserves from the 4-word Sync, and a v2-topic0
    Mint on the SAME dmm pool whose reserves come from that dmm Sync (the
    cross-namespace mark coupling) — all labeled dmm via the dimension."""
    wh = tempfile.mkdtemp(prefix="dex_dmm_wh_")
    try:
        n_pools = 3
        spec = ChainWalSpec(
            start_block=0, end_block=39, dex_pools=n_pools,
            dex_families=True, dex_dmm=True,
        )
        wal = generate_chain_wal(spark, spec).cache()
        cfg = StreamerConfig(
            warehouse=wh, batch_size=200, partition_size=16,
            entity_types=ENTITIES,
        )
        s = ChainStreamer(spark, cfg)
        s.run(WalTailer(wal, batch_size=200))

        pools = s.tables["dex_pools"].read()
        dmm_pools = {r["address"]: r for r in pools.filter(F.col("amm") == "dmm").collect()}
        assert set(dmm_pools) == {_addr("dmmpool", k) for k in range(n_pools)}
        for k in range(n_pools):
            row = dmm_pools[_addr("dmmpool", k)]
            assert row["token_addresses"] == [DEX_STABLE, _addr("dtok", k)]
            assert row["lp_token_addresses"] == [row["address"]]

        trades = s.tables["dex_trades"].read().filter(F.col("amm") == "dmm").collect()
        active = 40 - n_pools
        by_type = {}
        for r in trades:
            by_type.setdefault(r["event_type"], []).append(r)
        assert len(by_type["swap"]) == active and len(by_type["mint"]) == active
        for r in trades:
            b = r["block_number"]
            # reserves from the dmm Sync's trailing REAL pair, for BOTH the
            # dmm Swap and the v2-topic0 Mint
            assert abs(r["token_reserves"][0] - (b % 97 + 5)) < 1e-9, r
            assert abs(r["token_reserves"][1] - (b % 89 + 3) / 10) < 1e-9, r
            assert r["token_prices"][0] > 0
            if r["event_type"] == "swap":
                assert abs(r["token_amounts"][0] - (b % 50 + 1)) < 1e-9
                assert abs(r["token_amounts"][1] + (b % 30 + 1) / 100) < 1e-9
            else:
                assert abs(r["token_amounts"][0] - (b % 9 + 1)) < 1e-9
                assert abs(r["token_amounts"][1] - (b % 7 + 1) / 100) < 1e-9
        wal.unpersist()
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def test_lb_oneinch_meshswap_factory_discovery(spark):
    """The remaining pool-dimension families' factory events (reference
    LBFactory.json LBPairCreated, OneInchFactory.json Deployed, meshswap
    UniswapV2Factory.json CreatePool — the reference maps these factories
    via deploys/metadata.json and RPC-introspects the pool; the lake engine
    derives the dimension from the event itself): LB binStep doubles as the
    fee parameter, mooniswap pools are their own LP token, meshswap carries
    everything in the data payload."""
    from ethereum_etl_spark.operators.dex import FACTORY_ABIS, discover_pools
    from ethereum_etl_spark.operators.parsed_logs import build_inventory, parse_logs

    LB = next(a for a in FACTORY_ABIS if a.name == "LBPairCreated")
    OI = next(a for a in FACTORY_ABIS if a.name == "Deployed")
    MESH = next(a for a in FACTORY_ABIS if a.name == "CreatePool")
    word = lambda n: f"{n:064x}"  # noqa: E731
    t = lambda n: "0x" + word(n)  # noqa: E731
    logs = spark.createDataFrame(
        [
            (1, "0xt1", 0, "0xb", 7, "0x" + "f1" * 20,
             "0x" + word(0xAB1) + word(42), [LB.topic0, t(0xA), t(0xB), t(25)]),
            (2, "0xt1", 0, "0xb", 7, "0x" + "f2" * 20,
             "0x", [OI.topic0, t(0xAB2), t(0xA), t(0)]),
            (3, "0xt1", 0, "0xb", 7, "0x" + "f3" * 20,
             "0x" + word(0xA) + word(5) + word(0xB) + word(9) + word(40)
             + word(0xAB3) + word(77), [MESH.topic0]),
        ],
        "log_index int, transaction_hash string, transaction_index int,"
        "block_hash string, block_number long, address string, data string,"
        "topics array<string>",
    )
    parsed = parse_logs(logs, build_inventory(spark, FACTORY_ABIS), FACTORY_ABIS)
    pools = {r["amm"]: r for r in discover_pools(parsed).collect()}
    assert set(pools) == {"traderjoe_v2_1", "one_inch", "meshswap"}
    a = lambda n: "0x" + word(n)[-40:]  # noqa: E731
    lb = pools["traderjoe_v2_1"]
    assert (lb["address"], lb["fee"]) == (a(0xAB1), 25)
    assert lb["token_addresses"] == [a(0xA), a(0xB)]
    oi = pools["one_inch"]
    assert oi["address"] == a(0xAB2)
    assert oi["token_addresses"] == [a(0xA), a(0)]  # ETH side = zero addr
    assert oi["lp_token_addresses"] == [a(0xAB2)]
    mesh = pools["meshswap"]
    assert (mesh["address"], mesh["fee"]) == (a(0xAB3), 40)
    assert mesh["token_addresses"] == [a(0xA), a(0xB)]
