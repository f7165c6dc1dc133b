"""Partition-scoped upsert: same-key rows replaced, new keys appended,
untouched partitions keep their exact files."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from bridgedownstream_spark.pipeline.upsert import upsert_dataset


def _files(path, part):
    return sorted(glob.glob(os.path.join(path, part, "*.parquet")))


def test_upsert_replaces_appends_and_isolates(spark, tmp_path):
    table = str(tmp_path / "lake")
    base = spark.createDataFrame(
        [
            ("r1", "2024-01-01", 1.0),
            ("r2", "2024-01-01", 2.0),
            ("r3", "2024-01-02", 3.0),
        ],
        "recordid string, day string, value double",
    )
    upsert_dataset(spark, table, base, ["recordid"], ["day"])
    day2_files = _files(table, "day=2024-01-02")

    updates = spark.createDataFrame(
        [
            ("r1", "2024-01-01", 10.0),   # replace
            ("r4", "2024-01-01", 4.0),    # append
        ],
        "recordid string, day string, value double",
    )
    upsert_dataset(spark, table, updates, ["recordid"], ["day"])

    got = {
        r["recordid"]: r["value"] for r in spark.read.parquet(table).collect()
    }
    assert got == {"r1": 10.0, "r2": 2.0, "r3": 3.0, "r4": 4.0}
    # day=2024-01-02 was not touched: same exact files on disk
    assert _files(table, "day=2024-01-02") == day2_files


def test_upsert_is_idempotent(spark, tmp_path):
    table = str(tmp_path / "lake")
    rows = spark.createDataFrame(
        [("r1", "d1", 1.0), ("r2", "d1", 2.0)],
        "recordid string, day string, value double",
    )
    upsert_dataset(spark, table, rows, ["recordid"], ["day"])
    upsert_dataset(spark, table, rows, ["recordid"], ["day"])
    out = spark.read.parquet(table)
    assert out.count() == 2
    assert out.agg(F.sum("value")).first()[0] == 3.0


def test_upsert_creates_table_on_first_write(spark, tmp_path):
    table = str(tmp_path / "fresh")
    rows = spark.createDataFrame(
        [("r1", "d1", 1.0)], "recordid string, day string, value double"
    )
    upsert_dataset(spark, table, rows, ["recordid"], ["day"])
    assert spark.read.parquet(table).count() == 1
