"""Change-event payload decode: JSON envelope → typed entity DataFrames.

The mapper layer of the reference (/root/reference/ethereumetl/mappers/
block_mapper.py:38-78, transaction_mapper.py:32-56, receipt_log_mapper.py)
re-expressed as one vectorized ``from_json`` + column casts: camelCase→
snake_case is already normalized in the WAL payloads; hex→numeric runs
JVM-side (``conv``) for <2^63 fields and through the Arrow uint256 UDF for
Decimal(38,0) fields. No per-row Python anywhere on this path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType, StringType, StructField, StructType

from ethereum_etl_spark.functions.hex import hex_to_dec38, to_normalized_address
from ethereum_etl_spark.schemas import ENTITY_SCHEMAS

_ADDRESS_COLS = {
    "miner",
    "from_address",
    "to_address",
    "address",
    "contract_address",
    "token_address",
    "holder_address",
    "operator_address",
}


def raw_json_schema(entity_type: str, extra_fields=None) -> StructType:
    """Entity schema with uint256 columns widened to string (hex-in-flight).

    ``extra_fields``: additively-evolved columns (e.g. withdrawals/blob
    fields appearing in late payloads, SURVEY §1.3) — appended so from_json
    surfaces them; early payloads simply yield NULL.
    """
    fields = []
    for f in list(ENTITY_SCHEMAS[entity_type].fields) + list(extra_fields or []):
        if isinstance(f.dataType, DecimalType):
            fields.append(StructField(f.name, StringType(), True))
        else:
            fields.append(StructField(f.name, f.dataType, True))
    return StructType(fields)


# entities whose `value` column is a true uint256 that can exceed
# Decimal(38,0) — these get the lossless hex sidecar when enabled
_SIDECAR_VALUE_ENTITIES = {"transaction", "token_transfer", "internal_transfer"}


def decode_entity(
    wal_batch: DataFrame,
    entity_type: str,
    ops=("upsert",),
    include_seq: bool = True,
    extra_fields=None,
    uint256_sidecar: bool = False,
) -> DataFrame:
    """Filter one entity stream out of a WAL batch and decode its payload.

    Returns rows typed per ENTITY_SCHEMAS[entity_type]; addresses lowercased
    (utils.py:84-87 parity); hex uint256 → Decimal(38,0) w/ overflow→NULL.
    ``include_seq`` carries the WAL position through as ``_ingest_seq`` (the
    Iceberg _sequence_number analog) so MERGE can order same-key rows that
    arrive in one batch — e.g. an upsert and its reorg replacement.

    ``uint256_sidecar``: adds a lossless ``value_raw`` string column holding
    the ORIGINAL payload string whenever the Decimal(38,0) decode of `value`
    overflowed to NULL — the SURVEY §7 sidecar (the reference's BigQuery
    schema stores value as STRING for the same reason,
    docs/limitations.md:9-12). NULL when the decimal is exact, so the column
    compresses to nothing on healthy data.
    """
    schema = StructType(
        list(ENTITY_SCHEMAS[entity_type].fields) + list(extra_fields or [])
    )
    raw = raw_json_schema(entity_type, extra_fields)
    sel = [F.from_json("payload", raw).alias("r")]
    if include_seq and "seq" in wal_batch.columns:
        sel.append(F.col("seq").alias("_ingest_seq"))
    df = wal_batch.filter(
        (F.col("entity_type") == entity_type) & F.col("op").isin(*ops)
    ).select(*sel)
    df = df.select("r.*", *(["_ingest_seq"] if len(sel) > 1 else []))
    cols = []
    for f in schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, DecimalType):
            c = hex_to_dec38(c)
        elif f.name in _ADDRESS_COLS:
            c = to_normalized_address(c)
        cols.append(c.cast(f.dataType).alias(f.name))
    if "_ingest_seq" in df.columns:
        cols.append(F.col("_ingest_seq"))
    want_sidecar = (
        uint256_sidecar
        and entity_type in _SIDECAR_VALUE_ENTITIES
        and "value" in df.columns
    )
    if want_sidecar:
        # referencing the DECODED value post-projection keeps the Arrow
        # decode single-pass; raw survives only where the decimal lost it
        cols.append(F.col("value").alias("__raw_value"))
        out = df.select(*cols)
        return out.withColumn(
            "value_raw",
            F.when(
                F.col("value").isNull() & F.col("__raw_value").isNotNull(),
                F.col("__raw_value"),
            ),
        ).drop("__raw_value")
    return df.select(*cols)


def drop_null_keys(decoded: DataFrame, entity_type: str) -> DataFrame:
    """Dead-letter guard: unparseable payloads decode to all-null rows
    (Spark 4 PERMISSIVE); drop rows missing any REQUIRED (non-nullable)
    field. Apply this ABOVE a cache()/materialization boundary — fused into
    the decode plan, Catalyst pushes the predicate below the projection and
    duplicates the from_json parse into the filter (verified on the
    physical plan)."""
    out = decoded
    for f in ENTITY_SCHEMAS[entity_type].fields:
        if not f.nullable:
            out = out.filter(F.col(f.name).isNotNull())
    return out
