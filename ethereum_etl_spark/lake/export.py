"""Batch file exports (K3): Hive-style block-range partition layout.

Mirrors the reference's CSV/JSON export layout
(/root/reference/ethereumetl/jobs/export_all_common.py:72-120; dir scheme
docs/exporting-the-blockchain.md:33-43):
  out/start_block=00000000/end_block=00099999/blocks_00000000_00099999.csv
Here each range partition becomes a directory of part files written by one
distributed job (no driver loop over ranges, unlike the reference)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ethereum_etl_spark.lake.table import LakeTable


def export_block_ranges(
    table: LakeTable,
    out_dir: str,
    blocks_per_file: int = 100_000,
    fmt: str = "csv",
) -> None:
    """Write the table's current snapshot as fmt files partitioned into
    zero-padded start/end block-range directories."""
    m = table.manifest()
    df = table.read()
    rng = F.floor(F.col(m.prune_col) / blocks_per_file).cast("long")
    start = F.lpad((rng * blocks_per_file).cast("string"), 8, "0")
    end = F.lpad((rng * blocks_per_file + blocks_per_file - 1).cast("string"), 8, "0")
    out = df.withColumn("start_block", start).withColumn("end_block", end)
    # arrays/maps aren't CSV-encodable: stringify like the reference's CSV
    # convention (comma-joined topics, FIXTURES.md §4)
    if fmt == "csv":
        for f in out.schema.fields:
            if f.dataType.typeName() in ("array", "map", "struct"):
                out = out.withColumn(f.name, F.to_json(f.name))
    (
        out.repartition("start_block")
        .sortWithinPartitions(*m.key)
        .write.partitionBy("start_block", "end_block")
        .mode("overwrite")
        .format(fmt)
        .option("header", "true")
        .save(out_dir)
    )
