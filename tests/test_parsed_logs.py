from __future__ import annotations

from ethereum_etl_spark.operators.parsed_logs import (
    EventAbi,
    build_inventory,
    merge_inventory,
    parse_logs,
)
from ethereum_etl_spark.schemas import LOG_SCHEMA

SWAP = EventAbi(
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
)
SYNC = EventAbi(
    name="Sync",
    inputs=[
        {"name": "reserve0", "type": "uint112", "indexed": False},
        {"name": "reserve1", "type": "uint112", "indexed": False},
    ],
    namespace="uniswap_v2",
    contract_name="pair",
)

A = "a" * 40
B = "b" * 40


def _w(v: int) -> str:
    return hex(v)[2:].rjust(64, "0")


def _waddr(a: str) -> str:
    return "0x" + "0" * 24 + a


def test_known_uniswap_topic():
    # canonical UniswapV2 Swap topic — proves signature/keccak parity
    assert SWAP.topic0 == "0xd78ad95fa46c994b6551d0da85fc275fe613ce37657fb8d5e3d130840159d822"
    assert SWAP.topic_count == 3
    assert SYNC.topic_count == 1


def test_parse_swap_and_sync(spark):
    inv = build_inventory(spark, [SWAP, SYNC])
    logs = spark.createDataFrame(
        [
            (1, "0xt1", 0, "0xb", 10, "0x" + "c" * 40,
             "0x" + _w(100) + _w(0) + _w(0) + _w(250),
             [SWAP.topic0, _waddr(A), _waddr(B)]),
            (2, "0xt1", 0, "0xb", 10, "0x" + "c" * 40,
             "0x" + _w(11) + _w(22),
             [SYNC.topic0]),
            (3, "0xt1", 0, "0xb", 10, "0x" + "c" * 40, "0x", ["0x" + "9" * 64]),
        ],
        LOG_SCHEMA,
    )
    out = {r["log_index"]: r for r in parse_logs(logs, inv, [SWAP, SYNC]).collect()}
    assert set(out) == {1, 2}  # unknown topic dropped
    swap = out[1]
    assert swap["event_name"] == "Swap"
    assert swap["namespace"] == ["uniswap_v2"]
    pe = swap["parsed_event"]
    assert pe["sender"] == "0x" + A
    assert pe["to"] == "0x" + B
    assert pe["amount0In"] == "100"
    assert pe["amount1Out"] == "250"
    sync = out[2]
    assert sync["parsed_event"] == {"reserve0": "11", "reserve1": "22"}

    # event filter (parse_log filter_for_events parity)
    only = parse_logs(logs, inv, [SWAP, SYNC], filter_for_events=["Sync"])
    assert [r["event_name"] for r in only.collect()] == ["Sync"]


def test_inventory_merge_array_union(spark):
    inv = build_inventory(spark, [SWAP])
    src = build_inventory(
        spark,
        [EventAbi(name="Swap", inputs=SWAP.inputs, namespace="sushiswap", contract_name="pair")]
        + [SYNC],
    )
    merged = merge_inventory(inv, src)
    rows = {r["event_name"]: r for r in merged.collect()}
    assert rows["Swap"]["namespace"] == ["sushiswap", "uniswap_v2"]  # sorted distinct union
    assert rows["Sync"]["namespace"] == ["uniswap_v2"]
    assert merged.count() == 2


def test_dynamic_and_signed_abi_decode(spark):
    """Dynamic types (string/bytes/uint256[]) decode from offset+tail words;
    signed intN decodes two's complement (small → decimal string, huge →
    '~0x' marker resolved exactly by hex_to_dec38)."""
    from decimal import Decimal

    from pyspark.sql import functions as F

    from ethereum_etl_spark.functions.hex import hex_to_dec38
    from ethereum_etl_spark.operators.parsed_logs import (
        EventAbi,
        build_inventory,
        parse_logs,
    )
    from ethereum_etl_spark.schemas import LOG_SCHEMA

    abi = EventAbi(
        name="Note",
        inputs=[
            {"name": "name", "type": "string", "indexed": False},
            {"name": "blob", "type": "bytes", "indexed": False},
            {"name": "vals", "type": "uint256[]", "indexed": False},
            {"name": "delta", "type": "int256", "indexed": False},
        ],
        namespace="t",
        contract_name="t",
    )

    def w(v: int) -> str:
        return f"{v:064x}"

    name_hex = "hello world".encode().hex()
    blob_hex = "deadbeef"
    big = 2**70
    neg_small = (-60) % 2**256
    words = [
        w(4 * 32),                      # offset of name
        w(6 * 32),                      # offset of blob
        w(8 * 32),                      # offset of vals
        w(neg_small),                   # delta = -60 (two's complement)
        w(11), name_hex.ljust(64, "0"),
        w(4), blob_hex.ljust(64, "0"),
        w(2), w(7), w(big),
    ]
    rows = [(0, "0xtx", 0, "0xb", 1, "0x" + "a" * 40, "0x" + "".join(words),
             [abi.topic0])]
    logs = spark.createDataFrame(rows, LOG_SCHEMA)
    parsed = parse_logs(logs, build_inventory(spark, [abi]), [abi])
    pe = parsed.select("parsed_event").first()["parsed_event"]
    assert pe["name"] == "hello world"
    assert pe["blob"] == "0x" + blob_hex
    assert pe["vals"] == f'["7","0x{w(big)}"]'
    assert pe["delta"] == "-60"

    # huge negative int256 → '~0x' marker → exact Decimal via hex_to_dec38
    abi2 = EventAbi(
        name="D", inputs=[{"name": "x", "type": "int256", "indexed": False}],
        namespace="t", contract_name="t",
    )
    rows2 = [(0, "0xtx", 0, "0xb", 1, "0x" + "a" * 40,
              "0x" + w((-(2**100)) % 2**256), [abi2.topic0])]
    logs2 = spark.createDataFrame(rows2, LOG_SCHEMA)
    parsed2 = parse_logs(logs2, build_inventory(spark, [abi2]), [abi2])
    v = parsed2.select(
        hex_to_dec38(F.col("parsed_event")["x"]).alias("v")
    ).first()["v"]
    assert v == Decimal(-(2**100))


def test_dynamic_decode_poison_offset_yields_null(spark):
    """A crafted dynamic-param offset with 15 significant hex digits (~2^60)
    passed the old guard into (off/32).cast('int') and threw CAST_OVERFLOW
    under Spark 4 ANSI, aborting the batch. It must decode to NULL per the
    function's malformed-offset contract."""
    abi = EventAbi(
        name="S",
        inputs=[
            {"name": "s", "type": "string", "indexed": False},
            {"name": "v", "type": "uint256[]", "indexed": False},
        ],
        namespace="t",
        contract_name="t",
    )
    poison = "0" * 49 + "f" * 15  # 16^15-1 ≈ 2^60: old guard admitted this
    rows = [
        (0, "0xtx", 0, "0xb", 1, "0x" + "a" * 40,
         "0x" + poison + poison, [abi.topic0]),
        # a length-word poison too: valid offset, garbage length at the tail
        (1, "0xtx", 0, "0xb", 1, "0x" + "a" * 40,
         "0x" + f"{2*32:064x}" + f"{3*32:064x}" + poison + poison,
         [abi.topic0]),
    ]
    logs = spark.createDataFrame(rows, LOG_SCHEMA)
    out = {r["log_index"]: r["parsed_event"]
           for r in parse_logs(logs, build_inventory(spark, [abi]), [abi]).collect()}
    assert out[0]["s"] is None and out[0]["v"] is None
    assert out[1]["s"] is None and out[1]["v"] is None
