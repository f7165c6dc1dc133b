"""bridgedownstream_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of Sage-Bionetworks/BridgeDownstream.

Architecture (Spark-first, not a port):

- ``session``        tuned SparkSession builder (AQE, Arrow, UTC)
- ``operators``      relationalize and friends (custom composite operators)
- ``sources``        NDJSON lake sink, archive (zip) source, listings
- ``pipeline``       dataset registry (Glue-catalog replacement) + the
                     stage-2 json→parquet job + incremental ledger
- ``queries``        the full query surface with DuckDB-oracle twins

Reference behavior is documented per-module with file:line citations into
/root/reference (Sage-Bionetworks/BridgeDownstream).
"""

__version__ = "0.1.0"
