"""Partition-scoped upsert (merge-into) for parquet lakes.

The reference's idempotency contract is overwrite-by-recordid: a
re-exported record replaces its prior file in place
(s3_to_json_s3.py:592-648 key layout), and stage 2 re-derives tables from
whatever is current. A parquet lake has no per-record files, so the same
contract becomes a **merge**: new/updated rows replace same-key rows,
everything else survives untouched.

Without a table format (Delta/Iceberg) the atomic unit is the partition,
and that is exactly enough:

1. prune — read ONLY the partitions the updates touch (partition-pruned
   scan; untouched partitions are never opened);
2. merge — anti-join existing rows against update keys, union the
   updates in (same-key rows replaced, new keys appended);
3. swap — dynamic partition overwrite rewrites just those partitions.

Cost scales with touched partitions, not table size: upserting one day
of records into a years-deep lake reads and rewrites one day. The
update-key set is broadcast (update batches are file-count-scale, like
the ledger); the merge is therefore shuffle-free on the lake side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["upsert_dataset"]


def upsert_dataset(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_cols: list[str],
) -> None:
    """Merge ``updates`` into the lake at ``table_path``.

    Rows whose ``key_cols`` match an update are replaced; new keys are
    appended; rows in untouched partitions are never rewritten. The
    updates must carry the partition columns. A key that MOVES partitions
    between versions is handled (the old partition is in the touched set
    iff the old row's partition appears among the updates' partitions —
    callers with partition-mobile keys should derive partition values
    from the key, as the pipeline's layout does, so this cannot arise).
    """
    try:
        existing = spark.read.parquet(table_path)
        table_exists = True
    except Exception:  # noqa: BLE001 — first write
        table_exists = False

    if not table_exists:
        updates.write.partitionBy(*partition_cols).parquet(table_path)
        return

    part_key = F.concat_ws("/", *[F.col(c).cast("string") for c in partition_cols])
    touched = [
        r["p"] for r in updates.select(part_key.alias("p")).distinct().collect()
    ]
    pruned = existing.where(part_key.isin(touched))

    upd_keys = updates.select(*key_cols).distinct()
    kept = pruned.join(F.broadcast(upd_keys), key_cols, "left_anti")
    merged = kept.unionByName(updates.select(*existing.columns))
    # cut the read-own-path lineage before overwriting (see compact.py)
    merged = merged.localCheckpoint(eager=True)

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(*partition_cols).parquet(
            table_path
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
