"""bridgedownstream_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of Sage-Bionetworks/BridgeDownstream.

Architecture (Spark-first, not a port):

- ``session``        tuned SparkSession builder (AQE, Arrow, UTC)
- ``registry``       dataset/schema registry replacing the Glue catalog
- ``operators``      relationalize, reconciliation, dedup, similarity, text
- ``sources``        archive (zip) source, NDJSON + Parquet lake sinks
- ``validation``     JSON-Schema resolution + validation (quarantine routing)
- ``pipeline``       stage-1 ingest and stage-2 json→parquet jobs
- ``streaming``      incremental processing (bookmark-equivalent ledger)

Reference behavior is documented per-module with file:line citations into
/root/reference (Sage-Bionetworks/BridgeDownstream).
"""

__version__ = "0.1.0"
