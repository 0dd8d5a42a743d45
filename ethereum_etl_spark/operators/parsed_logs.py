"""ABI event decode against an event-inventory dimension (P4 + J10).

Re-expresses /root/reference/ethereumetl/service/eth_resolve_log_service.py:60-163
and the event_inventory warehouse objects (db/migrations/schema.sql:887-946):

- EventInventory rows are keyed (event_signature_hash == keccak(signature),
  topic_count) with namespaces/contract names accumulated as sorted distinct
  arrays — the MV's arraySort(arrayDistinct(arrayConcat(...))) LEFT-JOIN merge
  (schema.sql:917-946) becomes ``merge_inventory`` (groupBy + array_union +
  MERGE by key).
- ``parse_logs`` dispatches logs on (topics[0], size(topics)) via a BROADCAST
  join against the inventory (it is a small dimension) and decodes the event
  parameters columnar: indexed params come from topics[1..], data params from
  64-char data words, per the ABI input list in the inventory row. Static
  types only (address/uintN/intN/bool/bytes32) — the reference's web3
  process_log handles the same set for its DEX ABIs; dynamic types fall back
  to raw words. Output ``parsed_event`` is a MapType(name → decoded string),
  the Spark rendering of ParsedReceiptLog.parsed_event
  (domain/receipt_log.py:38-46).

No Python in the decode path: the parameter slicing is built from the
inventory's param layout with transform/element_at over the word arrays.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ethereum_etl_spark.functions.hex import split_to_words
from ethereum_etl_spark.functions.keccak import keccak256


@dataclass
class EventAbi:
    name: str
    inputs: list[dict]  # [{name, type, indexed}]
    namespace: str = "default"
    contract_name: str = "unknown"
    # canonical signature types when they differ from the flattened decode
    # layout — a STATIC fixed array (address[4]) hashes as one type but lays
    # out inline as N words, which `inputs` models as N scalar params (e.g.
    # curve PlainPoolDeployed)
    sig_types: list[str] | None = None

    @property
    def signature(self) -> str:
        types = self.sig_types or [i["type"] for i in self.inputs]
        return f"{self.name}({','.join(types)})"

    @property
    def topic0(self) -> str:
        return keccak256(self.signature)

    @property
    def topic_count(self) -> int:
        return 1 + sum(1 for i in self.inputs if i.get("indexed"))


INVENTORY_DDL = (
    "event_signature_hash string, event_topic_count int, event_signature string,"
    "event_name string, namespace array<string>, contract_name array<string>,"
    "event_abi_json string"
)


def inventory_rows(abis: list[EventAbi]):
    return [
        (
            a.topic0,
            a.topic_count,
            a.signature,
            a.name,
            [a.namespace],
            [a.contract_name],
            json.dumps({"name": a.name, "inputs": a.inputs}),
        )
        for a in abis
    ]


def build_inventory(spark: SparkSession, abis: list[EventAbi]) -> DataFrame:
    return spark.createDataFrame(inventory_rows(abis), INVENTORY_DDL)


def merge_inventory(existing: DataFrame, src: DataFrame) -> DataFrame:
    """J10 (schema.sql:917-946): new src rows LEFT JOIN existing inventory,
    namespaces/contract names merged as sorted distinct arrays, keyed
    (event_signature_hash, event_topic_count)."""
    key = ["event_signature_hash", "event_topic_count"]
    dst = existing.select(
        *key,
        F.col("namespace").alias("__dst_ns"),
        F.col("contract_name").alias("__dst_cn"),
    )
    merged_src = (
        src.join(dst, on=key, how="left")
        .withColumn(
            "namespace",
            F.array_sort(F.array_distinct(F.concat(
                F.coalesce("__dst_ns", F.array().cast("array<string>")), F.col("namespace")
            ))),
        )
        .withColumn(
            "contract_name",
            F.array_sort(F.array_distinct(F.concat(
                F.coalesce("__dst_cn", F.array().cast("array<string>")), F.col("contract_name")
            ))),
        )
        .drop("__dst_ns", "__dst_cn")
    )
    untouched = existing.join(src.select(*key), on=key, how="left_anti")
    return untouched.unionByName(merged_src)


def _decode_param(word, ptype: str):
    """64-hex-char word → decoded string per static ABI type."""
    if ptype == "address":
        return F.concat(F.lit("0x"), F.lower(F.substring(word, 25, 40)))
    if ptype == "bool":
        # NO conv here: whole-stage codegen's subexpression elimination can
        # hoist a per-slot conv() out of its dispatch branch and evaluate it
        # on rows of OTHER events whose same slot holds an address word —
        # an ANSI overflow for a branch that was never selected (hit when
        # meshswap AddLiquidity's token1 shares carbondefi's bool slot)
        return F.when(
            F.ltrim(word, F.lit("0")) == "1", F.lit("true")
        ).otherwise(F.lit("false"))
    if ptype.startswith("uint"):
        # decimal string; conv is exact through 60 bits, larger values keep
        # the hex form (hex_to_dec38 downstream accepts both).
        # ltrim('0') ≡ regexp_replace('^0+') for leading-zero strip — no
        # regex engine per decoded param (r6; this runs once per distinct
        # (slot, type) per log row in the streaming parse)
        return F.when(
            F.length(F.ltrim(word, F.lit("0"))) <= 15,
            F.conv(word, 16, 10),
        ).otherwise(F.concat(F.lit("0x"), word))
    if ptype.startswith("int"):
        # signed (two's complement over the full word): int256 amounts in
        # uniswap_v3 Swap events are negative for the out-token. Small
        # magnitudes decode to a signed decimal string JVM-side via the
        # bitwise complement (hex digit translate); big negatives carry the
        # '~0x' two's-complement marker that hex_to_dec38 resolves exactly.
        w = F.lower(word)
        comp = F.translate(w, "0123456789abcdef", "fedcba9876543210")
        neg = F.substring(w, 1, 1).isin("8", "9", "a", "b", "c", "d", "e", "f")
        small_mag = F.length(F.ltrim(comp, F.lit("0"))) <= 15
        neg_small = F.concat(
            F.lit("-"),
            (F.conv(comp, 16, 10).cast("decimal(38,0)") + 1).cast("string"),
        )
        pos = F.when(
            F.length(F.ltrim(w, F.lit("0"))) <= 15, F.conv(w, 16, 10)
        ).otherwise(F.concat(F.lit("0x"), w))
        return F.when(
            neg, F.when(small_mag, neg_small).otherwise(F.concat(F.lit("~0x"), w))
        ).otherwise(pos)
    # bytes32 / unknown → raw word
    return F.concat(F.lit("0x"), word)


def _w_small(word):
    """Offset/length word → long; NULL unless it has ≤7 significant hex
    digits (max 2^28-1). Malformed giants must not throw under ANSI — the
    downstream (off/32).cast('int') and (ln*2).cast('int') arithmetic stays
    safely inside int range for any value this guard admits, so no cast in
    the dynamic-tail decode can raise CAST_OVERFLOW (transfers.py rule).
    Prefix memcmp ≡ rlike('^0{57}') without the regex engine (r6)."""
    return F.when(
        F.substring(word, 1, 57) == "0" * 57, F.conv(word, 16, 10).cast("long")
    )


def _decode_dynamic(head_word, ptype: str, w_arr, data):
    """Dynamic-type tail decode (string / bytes / T[]) from the head word's
    byte offset — the columnar rendering of web3 process_log's dynamic
    branch (eth_resolve_log_service.py:120-150). Malformed offsets/lengths
    yield NULL, mirroring the reference's DecodingError skip."""
    off = (_w_small(head_word) / 32).cast("int")  # word index of the length
    ln = _w_small(F.get(w_arr, off))
    if ptype in ("string", "bytes"):
        n_words = F.ceil(ln / 32).cast("int")
        content_hex = F.substring(
            F.concat_ws("", F.slice(w_arr, off + 2, n_words)), 1, (ln * 2).cast("int")
        )
        if ptype == "string":
            return F.when(
                ln.isNotNull(), F.decode(F.unhex(content_hex), "UTF-8")
            )
        return F.when(ln.isNotNull(), F.concat(F.lit("0x"), content_hex))
    if ptype.endswith("[]"):
        elem = ptype[:-2]
        elems = F.slice(w_arr, off + 2, ln.cast("int"))
        decoded = F.transform(elems, lambda x: _decode_param(x, elem))
        return F.when(ln.isNotNull(), F.to_json(decoded))
    return F.concat(F.lit("0x"), head_word)


_DYNAMIC = ("string", "bytes")


def _is_dynamic(ptype: str) -> bool:
    return ptype in _DYNAMIC or ptype.endswith("[]")


def parse_logs(
    logs: DataFrame,
    inventory: DataFrame,
    abis: list[EventAbi],
    filter_for_events: list[str] | None = None,
) -> DataFrame:
    """logs × broadcast(inventory) on (topic0, topic_count) → parsed rows
    with event_name and parsed_event map (param name → decoded value).

    The per-event param layout is compiled driver-side from ``abis`` into a
    single when-chain (the inventory is small and static per deployment, like
    the reference's ABI directory)."""
    base = (
        logs.filter(F.col("topics").isNotNull() & (F.size("topics") >= 1))
        .withColumn("event_signature_hash", F.lower(F.get("topics", 0)))
        .withColumn("event_topic_count", F.size("topics"))
        .join(
            F.broadcast(
                inventory.select(
                    "event_signature_hash", "event_topic_count",
                    "event_signature", "event_name", "namespace",
                )
            ),
            on=["event_signature_hash", "event_topic_count"],
            how="inner",
        )
    )
    if filter_for_events:
        base = base.filter(F.col("event_name").isin(filter_for_events))

    base = base.withColumn(
        "t",
        F.transform(
            F.col("topics"),
            # startswith+substring ≡ regexp_replace("^0x") without the
            # regex engine per topic (r6)
            lambda x: F.when(x.startswith("0x"), F.substring(x, 3, 2_000_000)).otherwise(x),
        ),
    ).withColumn("w", split_to_words(F.col("data")))

    # Pre-decode each distinct (source, position, type-class) ONCE as its
    # own projection column, then assemble the per-ABI maps from cheap
    # column references. The previous shape inlined the full decode
    # expression per ABI param inside ONE when-chain column: whole-stage
    # codegen emits a single column's expression into processNext()
    # undivided, the generated method crossed the JVM's 64 KB limit
    # ("Code grows beyond 64 KB" — InternalCompilerException), and every
    # batch paid a multi-second FAILED Janino compile and then ran the
    # stage INTERPRETED. Separate columns split into separate codegen
    # methods; shared decodes (e.g. word-0-as-uint across every Swap
    # family) are also computed once instead of per ABI.
    def _canon(kind: str, ptype: str) -> str:
        if kind == "tdyn":
            return "raw"  # indexed dynamic: raw topic word for any ptype
        if _is_dynamic(ptype):
            return ptype  # tail decode differs per exact type (string/bytes/T[])
        if ptype in ("address", "bool"):
            return ptype
        if ptype.startswith("uint"):
            return "uint"
        if ptype.startswith("int"):
            return "int"
        return "raw"

    dec_name: dict[tuple, str] = {}
    dec_exprs: list = []

    def _dec(kind: str, idx: int, ptype: str):
        key = (kind, idx, _canon(kind, ptype))
        if key not in dec_name:
            name = f"__dec_{len(dec_name)}"
            if kind == "tdyn":
                e = F.concat(F.lit("0x"), F.get("t", idx))
            elif kind == "t":
                e = _decode_param(F.get("t", idx), ptype)
            elif kind == "wdyn":
                e = _decode_dynamic(
                    F.get("w", idx), ptype, F.col("w"), F.col("data")
                )
            else:  # "w"
                e = _decode_param(F.get("w", idx), ptype)
            dec_name[key] = name
            dec_exprs.append(e.alias(name))
        return F.col(dec_name[key])

    # compile param extraction per (topic0, count) into one when-chain of
    # create_map over the pre-decoded columns
    parsed = F.lit(None).cast("map<string,string>")
    for abi in abis:
        cond = (F.col("event_signature_hash") == abi.topic0) & (
            F.col("event_topic_count") == abi.topic_count
        )
        entries = []
        ti, wi = 1, 0  # indexed params from topics[1..], rest from data words
        for inp in abi.inputs:
            ptype = inp["type"]
            if inp.get("indexed"):
                # indexed dynamic params are stored as their keccak hash in
                # the topic — web3 returns the hash too; keep the raw word
                decoded = _dec("tdyn" if _is_dynamic(ptype) else "t", ti, ptype)
                ti += 1
            else:
                decoded = _dec("wdyn" if _is_dynamic(ptype) else "w", wi, ptype)
                wi += 1
            entries.append(F.lit(inp["name"]))
            entries.append(decoded)
        parsed = F.when(cond, F.create_map(*entries)).otherwise(parsed)

    base = base.select("*", *dec_exprs)
    return base.withColumn("parsed_event", parsed).select(
        "block_number",
        "transaction_hash",
        "log_index",
        F.col("address").alias("contract_address"),
        "event_signature_hash",
        "event_topic_count",
        "event_name",
        "event_signature",
        "namespace",
        "parsed_event",
    )
