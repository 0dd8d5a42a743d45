"""spark-chain-cdc: a PySpark-native CDC/incremental-ingest engine.

From-scratch re-expression of the query & data-processing capabilities of
dex-guru/ethereum-etl (reference at /root/reference, cited by file:line in
docstrings) on idiomatic Spark: DataFrame/SQL plans optimized by Catalyst,
vectorized pandas/Arrow UDFs for the genuinely-Python decode surface, and a
snapshot-committed lakehouse MERGE sink (``ethereum_etl_spark.lake``) playing
the role Iceberg MERGE INTO would play on a real cluster.
"""

__version__ = "0.1.0"
