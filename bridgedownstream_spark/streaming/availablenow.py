"""Checkpointed incremental stage-2 via Structured Streaming.

The reference's incremental machinery is Glue job bookmarks: each run of
``json_s3_to_parquet`` reads only files unseen by prior successful runs
(transformation_ctx + job.commit(), json_s3_to_parquet.py:74,103,233),
driven by SQS-triggered micro-batched workflow runs (SURVEY §2.11). Spark
has this built in: a **file-source stream with a checkpoint** tracks
processed files exactly-once, and ``Trigger.AvailableNow`` drains all
currently-available input then stops — the same "process what's new, then
exit" lifecycle as a bookmarked Glue job, with no bespoke state.

Each micro-batch runs the ordinary stage-2 body (conform → relationalize →
partitioned parquet append) through ``foreachBatch``, so batch and
streaming share one code path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import types as T

from bridgedownstream_spark.pipeline.json_to_parquet import (
    _widen_leaves,
    conform_to_schema,
    run_json_to_parquet,
)
from bridgedownstream_spark.pipeline.registry import DatasetRegistry
from bridgedownstream_spark.operators.relationalize import DEFAULT_KEY_COLS
from bridgedownstream_spark.sources.ndjson import dataset_path

__all__ = ["stream_json_to_parquet"]


def stream_json_to_parquet(
    spark: SparkSession,
    json_root: str,
    parquet_root: str,
    dataset_name: str,
    registry: DatasetRegistry,
    checkpoint_root: str,
    key_cols: tuple[str, ...] = DEFAULT_KEY_COLS,
    timeout_sec: int = 300,
) -> None:
    """Drain all new files of one JSON dataset into the parquet lake, then
    return. Re-running with the same ``checkpoint_root`` processes only
    files that arrived since the last run; a fresh checkpoint reprocesses
    everything (the bookmark-reset analogue)."""
    ds = registry[dataset_name]
    src = dataset_path(json_root, dataset_name)
    # Read through the LEAF-WIDENED schema, exactly like the batch reader
    # (read_json_dataset) and lake_sync: reading a drifted scalar (e.g.
    # "7" where the registry declares int) through the strict declared
    # schema would make PERMISSIVE mode silently NULL it — the batch path
    # coerces it instead, and batch/stream must produce the same lake.
    widened = T.StructType(
        [
            T.StructField(f.name, _widen_leaves(f.dataType), True)
            for f in ds.data_schema().fields
        ]
        + list(ds.partition_schema().fields)
    )
    stream = (
        spark.readStream.schema(widened)
        .option("basePath", src)
        .json(src)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        run_json_to_parquet(
            spark,
            json_root,
            parquet_root,
            dataset_name,
            registry,
            key_cols=key_cols,
            mode="append",
            source_df=conform_to_schema(batch_df, ds.full_schema()),
        )

    query = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", os.path.join(checkpoint_root, dataset_name))
        .trigger(availableNow=True)
        .start()
    )
    if not query.awaitTermination(timeout_sec):
        query.stop()  # hung drains must raise, not return half-synced
        raise TimeoutError(
            f"stream_json_to_parquet: drain exceeded {timeout_sec}s "
            f"(dataset={dataset_name})"
        )
