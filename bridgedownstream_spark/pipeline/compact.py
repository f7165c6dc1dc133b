"""Small-file compaction for partitioned parquet lakes.

Incremental appends (ledger batches, streaming micro-batches, per-day
ingest) each leave a few files per partition; after months a 100 TB lake
holds millions of KB-scale files and every scan drowns in open/footer
overhead. The reference leans on Glue's ``groupFiles: inPartition`` to
*read* through the mess (json_s3_to_parquet.py:73); a lake you operate
also needs to *fix* the mess. This module is that maintenance operator:

1. **stats** — a distributed listing via the ``binaryFile`` source
   projecting only (path, length): no file CONTENT is read, and the
   listing itself scales across executors instead of a driver-side walk.
2. **select** — partitions whose file count exceeds a threshold and whose
   mean file size is under target (driver-side decision over
   partition-count-scale rows, like the ledger).
3. **rewrite** — ONE partition-pruned scan of just those partitions,
   salted so each writes ``ceil(bytes / target)`` output files, committed
   with dynamic partition overwrite so untouched partitions are never
   rewritten and readers see whole partitions swap atomically.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["partition_file_stats", "compact_dataset"]


def partition_file_stats(spark: SparkSession, table_path: str) -> DataFrame:
    """Per-partition (n_files, total_bytes) from a distributed listing.

    ``binaryFile`` with only (path, length) projected never reads file
    bodies — it is a parallel directory walk. Partition identity is the
    ``key=value/…`` path between the table root and the file name.
    """
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .load(table_path)
        .select("path", "length")
    )
    root = table_path.rstrip("/")
    # strip scheme + root prefix, then the trailing file name
    rel = F.regexp_replace(
        "path", f"^(file:)?/*{re.escape(root.lstrip('/'))}/", ""
    )
    part_dir = F.regexp_replace(rel, "/[^/]*$", "")
    return files.groupBy(part_dir.alias("partition")).agg(
        F.count("*").alias("n_files"), F.sum("length").alias("total_bytes")
    )


def _partition_values(partition: str) -> list[str]:
    """``a=1/b=2`` → ``["1", "2"]`` (Hive layout, string-typed values)."""
    return [seg.split("=", 1)[1] for seg in partition.split("/") if "=" in seg]


def compact_dataset(
    spark: SparkSession,
    table_path: str,
    partition_cols: list[str],
    target_file_bytes: int = 128 << 20,
    min_files: int = 2,
) -> dict[str, int]:
    """Rewrite fragmented partitions of ``table_path`` into
    ``ceil(partition_bytes / target_file_bytes)`` files each.

    Returns ``{partition: n_output_files}`` for every compacted partition
    (empty dict ⇒ nothing needed). Only partitions with more than
    ``min_files`` files AND mean file size below target are touched.

    **Concurrency contract**: compaction is read-snapshot → dynamic
    overwrite, with NO coordination against concurrent writers — rows
    committed into a selected partition between the snapshot
    (localCheckpoint) and the overwrite are LOST. Do not run it while an
    upsert/lake-sync writer may touch the same partitions; schedule it
    the way table formats schedule OPTIMIZE — against quiesced (e.g.
    closed-date) partitions, or under an external lock. It also toggles
    the session-level ``partitionOverwriteMode`` conf, so it must not
    share a SparkSession with concurrent writers mid-flight.
    """
    stats = partition_file_stats(spark, table_path).collect()
    todo: dict[str, int] = {}
    for r in stats:
        if (
            r["n_files"] > min_files
            and r["total_bytes"] / r["n_files"] < target_file_bytes
        ):
            todo[r["partition"]] = max(
                1, math.ceil(r["total_bytes"] / target_file_bytes)
            )
    if not todo:
        return {}

    df = spark.read.parquet(table_path)
    # prune the scan to the fragmented partitions only
    part_key = F.concat_ws("/", *[F.col(c).cast("string") for c in partition_cols])
    keys = [
        "/".join(_partition_values(p)) for p in todo
    ]
    pruned = df.where(part_key.isin(keys))

    # per-partition output fan: salt = hash(row) mod n_out for THAT
    # partition, broadcast-joined in — so a 10 GB partition gets 80 files
    # and a 100 MB one gets 1, from the same single rewrite job
    fan = spark.createDataFrame(
        [(k, n) for k, n in zip(keys, todo.values())], "__pk string, __n_out int"
    )
    data_cols = [c for c in df.columns if c not in partition_cols]
    salted = (
        pruned.withColumn("__pk", part_key)
        .join(F.broadcast(fan), "__pk")
        .withColumn(
            "__salt",
            F.pmod(F.xxhash64(*[F.col(c) for c in data_cols]), F.col("__n_out")),
        )
    )
    out = (
        salted.repartition(*partition_cols, F.col("__salt"))
        .drop("__pk", "__n_out", "__salt")
    )
    # Spark (rightly) refuses to overwrite a path its own plan reads;
    # materialize the compacted rows first to cut the lineage — the
    # double-buffer every compactor pays. localCheckpoint holds only the
    # fragmented partitions, on executor storage; a production variant on
    # object storage would stage to a sibling prefix + rename instead.
    out = out.localCheckpoint(eager=True)

    # dynamic overwrite: ONLY the partitions present in `out` are replaced
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        out.write.mode("overwrite").partitionBy(*partition_cols).parquet(table_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return todo
