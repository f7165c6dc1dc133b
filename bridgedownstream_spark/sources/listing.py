"""Listing & manifest sources (SURVEY S9/S10).

- :func:`list_lake_files` — enumerate a lake prefix as rows (path, size,
  mtime) with record ids derived from file names, replacing the
  reference's paginated list_objects_v2 loops (etl-408/etl_408.py:38-60,
  etl-245/main.py:20-27, etl-437/main.py:41-72). Spark's binaryFile source
  does the distributed listing; bodies are never read
  (``ReadSchema: struct<>`` after pruning).
- :func:`manifest_from_messages` — the workflow-properties source: job
  arguments arrive as a JSON blob of messages (reference
  get_workflow_run_properties, s3_to_json_s3.py:758-782, produced by the
  Lambda at src/lambda/sns_to_glue/app.py:50-57); here they become the
  ingest manifest DataFrame.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["list_lake_files", "manifest_from_messages"]


def list_lake_files(spark: SparkSession, path: str) -> DataFrame:
    """(path, length, modificationTime, object_name, record_stem) for every
    file under ``path`` — the listing-scan operator. ``record_stem`` is the
    reference's ``key.split('/')[-1].split('.')[0]`` record-id derivation
    (F7), as a native regexp."""
    df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", "length", "modificationTime")
    )
    object_name = F.regexp_extract("path", r"([^/]+)$", 1)
    return df.select(
        F.regexp_replace("path", "^file:/*", "/").alias("path"),
        "length",
        "modificationTime",
        object_name.alias("object_name"),
        # FIRST-dot truncation, exactly the reference's
        # split('/')[-1].split('.')[0]: a multi-dot name like
        # 'rec-abc.v2.ndjson' must yield 'rec-abc' — the previous
        # strip-last-extension regex yielded 'rec-abc.v2', so ids derived
        # here never matched the source of truth and reconciliation would
        # flag present records as missing forever
        F.split(object_name, "\\.").getItem(0).alias("record_stem"),
    )


def manifest_from_messages(spark: SparkSession, messages_json: str) -> DataFrame:
    """Parse a workflow-properties ``messages`` blob into the ingest
    manifest. Each message carries the source object location plus its
    record metadata (the engine's stand-in for S3 object metadata)."""
    messages = json.loads(messages_json)
    rows = [
        (
            m["path"],
            m["recordid"],
            m["assessmentid"],
            str(m["assessmentrevision"]),
            m["uploadedon"],
            m.get("clientinfo", ""),
        )
        for m in messages
    ]
    return spark.createDataFrame(
        rows,
        "path string, recordid string, assessmentid string, "
        "assessmentrevision string, uploadedon string, clientinfo string",
    )
