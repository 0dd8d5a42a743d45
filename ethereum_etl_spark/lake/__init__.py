"""chainlake: a minimal snapshot-committed lakehouse table format.

Plays the role Iceberg plays in SURVEY.md §4/§7 (MERGE INTO + atomic snapshot
commits + partition pruning + additive schema evolution) — implemented from
scratch on Parquet because no Iceberg/Delta jars ship in this sandbox. On a
real cluster the same `LakeTable` API would be backed by Iceberg; the engine
code above it would not change.
"""

from ethereum_etl_spark.lake.table import LakeTable  # noqa: F401
from ethereum_etl_spark.lake.checkpoint import WatermarkStore  # noqa: F401
