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

**Deletes**: ``delete_keys`` removes a key's existing rows even when
``updates`` carries no replacement row — required for the re-export
contract, where a record whose child array shrank to empty must lose its
stale child rows despite producing zero update rows for that table.
Locating doomed rows has no partition prior, so it costs one columnar
(key + partition columns only) scan with a broadcast semi-join; at lake
scale, callers that derive partition values from the key should pass the
known partitions instead of relying on this scan.
"""

from __future__ import annotations

import posixpath
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bridgedownstream_spark.pipeline.fsutil import delete_path, has_data_files

__all__ = ["upsert_dataset"]

#: Spark's directory name for a NULL (or empty-string) partition value
_HIVE_DEFAULT = "__HIVE_DEFAULT_PARTITION__"

#: partition VALUES must round-trip to directory names verbatim for the
#: empty-partition cleanup to address the right paths; Spark %-escapes
#: anything outside roughly this set, which this module does not replicate
_PATH_SAFE = re.compile(r"^[A-Za-z0-9._\- ]+$")


def _check_path_safe(part_keys: set[str], partition_cols: list[str]) -> None:
    """Reject partition keys whose VALUES would not round-trip to directory
    names verbatim. Validated structurally, not just per-character: a value
    containing ``/`` splits into extra segments (caught by the count and
    ``col=`` prefix checks — naive per-segment validation would pass it),
    and a value containing ``=`` or any other character Spark %-escapes
    fails the charset check."""
    for p in part_keys:
        segs = p.split("/") if p else []
        ok = len(segs) == len(partition_cols) and all(
            seg.startswith(f"{col}=")
            and (
                (val := seg[len(col) + 1:]) == _HIVE_DEFAULT
                or _PATH_SAFE.match(val)
            )
            for col, seg in zip(partition_cols, segs)
        )
        if not ok:
            raise ValueError(
                f"upsert_dataset: partition key {p!r} does not round-trip "
                "to a directory path (a value contains '/', '=', or other "
                "characters Spark %-escapes); the FS-level empty-partition "
                "cleanup would address the wrong path. Use path-safe "
                "partition values (the pipeline's layout does)."
            )


def upsert_dataset(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame | None,
    key_cols: list[str],
    partition_cols: list[str],
    delete_keys: DataFrame | None = None,
) -> set[str]:
    """Merge ``updates`` into the lake at ``table_path``. Returns the set
    of touched partition paths (``"c=v/c=v"`` strings; empty string for an
    unpartitioned table) — the updates' partitions PLUS the partitions
    where deleted keys' existing rows lived, i.e. exactly the partitions
    whose contents this merge changed. Callers maintaining derived state
    (rollups) must refresh precisely this set: a re-export that MOVES a
    record between partitions changes both its old and new partition.

    Rows whose ``key_cols`` match an update are replaced; new keys are
    appended; rows in untouched partitions are never rewritten. The
    updates must carry the partition columns. A key that MOVES partitions
    between versions is handled (the old partition is in the touched set
    iff the old row's partition appears among the updates' partitions —
    callers with partition-mobile keys should derive partition values
    from the key, as the pipeline's layout does, so this cannot arise).

    ``delete_keys`` (metadata-scale, broadcastable): keys whose existing
    rows are removed even if no update row re-adds them. ``updates=None``
    performs a delete-only merge. Partitions left empty by deletes are
    removed outright (dynamic overwrite only rewrites partitions present
    in the output, so an all-rows-deleted partition must be dropped via
    the FS API or its stale files would survive).
    """
    if updates is None and delete_keys is None:
        raise ValueError("upsert_dataset: need updates and/or delete_keys")

    # opaque partition identity = the partition's directory path — used for
    # pruning (expression over partition columns only, so the scan still
    # partition-prunes) AND for locating directories to drop when emptied.
    # NULL/empty values map to Spark's __HIVE_DEFAULT_PARTITION__ exactly as
    # the writer lays them out — a raw NULL would collapse the whole
    # segment out of concat_ws and alias DIFFERENT partitions onto one key
    # (worst case: the cleanup deletes a parent directory holding live
    # sibling partitions).
    def _seg(c: str):
        s = F.col(c).cast("string")
        return F.concat(
            F.lit(f"{c}="),
            F.when(s.isNull() | (s == ""), F.lit(_HIVE_DEFAULT)).otherwise(s),
        )

    part_key = F.concat_ws("/", *[_seg(c) for c in partition_cols])

    # the updates' partition keys are validated on EVERY path, including
    # the first write — a table created with %-escaped values would be
    # writable exactly once and never mergeable again
    upd_parts: set[str] = set()
    if updates is not None:
        upd_parts = {
            r["p"] for r in updates.select(part_key.alias("p")).distinct().collect()
        }
        _check_path_safe(upd_parts, partition_cols)

    # first-write probe on DATA files, not directory existence: a table
    # whose every partition was removed by a delete-only merge leaves an
    # existing-but-empty directory that spark.read.parquet cannot infer a
    # schema from — it must be treated as absent, not read
    if not has_data_files(spark, table_path):
        if updates is not None:
            if has_data_files(spark, table_path, suffix=""):
                # the dir exists and holds visible NON-parquet files: this
                # is not an emptied table (those keep only _SUCCESS-style
                # markers) — overwriting would destroy foreign data
                raise ValueError(
                    f"upsert_dataset: {table_path} exists with non-parquet "
                    "contents; refusing to overwrite"
                )
            updates.write.mode("overwrite").partitionBy(*partition_cols).parquet(
                table_path
            )
            return upd_parts
        return set()
    existing = spark.read.parquet(table_path)

    touched: set[str] = set(upd_parts)
    removal: DataFrame | None = None
    if updates is not None:
        removal = updates.select(*key_cols).distinct()
    if delete_keys is not None:
        dk = delete_keys.select(*key_cols).distinct()
        removal = dk if removal is None else removal.unionByName(dk).distinct()
        doomed = existing.select(*key_cols, part_key.alias("p")).join(
            F.broadcast(dk), key_cols, "left_semi"
        )
        touched |= {r["p"] for r in doomed.select("p").distinct().collect()}
    if not touched:
        return set()  # nothing to replace and no existing rows to delete
    # fail BEFORE any write: a non-path-safe partition value would be laid
    # out %-escaped by Spark while the cleanup below addresses the raw
    # string — deleting the wrong (or no) directory. (Covers the doomed
    # partitions of EXISTING rows too, not just the updates'.)
    _check_path_safe(touched, partition_cols)

    pruned = existing.where(part_key.isin(list(touched)))
    kept = pruned.join(F.broadcast(removal), key_cols, "left_anti")
    merged = (
        kept.unionByName(updates.select(*existing.columns))
        if updates is not None
        else kept
    )
    # cut the read-own-path lineage before overwriting (see compact.py)
    merged = merged.localCheckpoint(eager=True)
    out_parts = {
        r["p"] for r in merged.select(part_key.alias("p")).distinct().collect()
    }

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(*partition_cols).parquet(
            table_path
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    for p in sorted(touched - out_parts):
        if p:  # never the table root (unpartitioned tables use p == "")
            delete_path(spark, posixpath.join(table_path, p))
    return touched
