"""Processed-files ledger: job-bookmark-equivalent incremental semantics.

The reference relies on Glue job bookmarks — ``transformation_ctx`` on the
read and write plus ``job.commit()`` make each run process only files not
seen by a previous successful run (json_s3_to_parquet.py:74,103,233); the
schema-change protocol's "reset the bookmark" step clears that state
(docs/schema_change_protocol.md §3e; introspection
src/scripts/bookmarks/get-bookmarks.py:19-27).

Spark-first: the bookmark is just a tiny parquet table of processed file
paths per dataset. New work = an **anti-join of the file listing against
the ledger** — file-count-scale, not data-scale: at 100 TB the ledger holds
one row per input file (millions, not billions) and broadcasts cleanly.
Commit = appending the newly processed paths after the sink write succeeds,
mirroring the reference's post-write ``job.commit()`` ordering so a failed
run reprocesses rather than drops files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bridgedownstream_spark.pipeline.fsutil import delete_path, path_exists

__all__ = ["FileLedger"]


class FileLedger:
    """Per-dataset processed-file bookkeeping in a parquet table
    ``(dataset, file_path)`` under ``ledger_root``."""

    def __init__(self, spark: SparkSession, ledger_root: str):
        self.spark = spark
        self.root = ledger_root

    def _path(self, dataset: str) -> str:
        return os.path.join(self.root, f"dataset={dataset}")

    def processed_files(self, dataset: str) -> DataFrame:
        """The ledger as a DataFrame (empty if never committed). Existence
        is checked explicitly — a transient read failure must propagate,
        not masquerade as an empty ledger (which would reprocess and
        double-append every file)."""
        path = self._path(dataset)
        if not path_exists(self.spark, path):
            return self.spark.createDataFrame([], "file_path string")
        return self.spark.read.parquet(path).select("file_path")

    def filter_new(self, df: DataFrame, dataset: str, file_col: str = "_source_file") -> DataFrame:
        """Keep only rows from files not yet in the ledger: a broadcast
        anti-join on the file path (operator S9 listing semantics — the
        'scan' side is ``input_file_name()`` already on the rows)."""
        ledger = self.processed_files(dataset).withColumnRenamed(
            "file_path", file_col
        )
        return df.join(F.broadcast(ledger), file_col, "left_anti")

    def commit(self, df_or_paths: DataFrame | list[str], dataset: str) -> int:
        """Record files as processed (idempotent: duplicates are
        anti-joined away first). Call AFTER the sink write succeeds —
        the reference's ``job.commit()`` ordering."""
        if isinstance(df_or_paths, DataFrame):
            new = df_or_paths.select(
                F.col(df_or_paths.columns[0]).alias("file_path")
            ).distinct()
        else:
            new = self.spark.createDataFrame(
                [(p,) for p in df_or_paths], "file_path string"
            ).distinct()
        new = new.join(
            F.broadcast(self.processed_files(dataset)), "file_path", "left_anti"
        )
        rows = new.count()
        if rows:
            new.coalesce(1).write.mode("append").parquet(self._path(dataset))
        return rows

    def reset(self, dataset: str) -> None:
        """Bookmark reset (schema-change protocol §3e): forget the dataset's
        processed files so the next run reprocesses everything. Goes
        through the Hadoop FS API so it works on object stores too."""
        path = self._path(dataset)
        if path_exists(self.spark, path):
            delete_path(self.spark, path)
