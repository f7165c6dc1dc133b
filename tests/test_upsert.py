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


def test_upsert_model_based_random_sequence(spark, tmp_path):
    """Model-based check of the full merge contract: a seeded random
    sequence of batches — each carrying updates, re-adds, and delete_keys
    (deletes that no update re-adds) — applied to the lake AND to a plain
    Python dict model. After every batch the lake must equal the model
    exactly, including partitions fully emptied by deletes."""
    import random

    from pyspark.errors import AnalysisException

    rng = random.Random(20260814)
    table = str(tmp_path / "lake")
    keys = [f"r{i}" for i in range(12)]
    days = ["2024-01-01", "2024-01-02", "2024-01-03"]
    # partition derives from the key (the pipeline's layout contract —
    # upsert's documented precondition for partition-mobile keys)
    day_of = {k: days[i % len(days)] for i, k in enumerate(keys)}

    model: dict[str, float] = {}
    for step in range(6):
        upd_keys = rng.sample(keys, rng.randint(0, 5))
        del_keys = rng.sample(keys, rng.randint(0, 4))
        updates = [
            (k, day_of[k], float(step * 100 + i))
            for i, k in enumerate(upd_keys)
        ]
        for k, _d, v in updates:
            model[k] = v
        for k in del_keys:
            if k not in upd_keys:
                model.pop(k, None)
        upd_df = (
            spark.createDataFrame(
                updates, "recordid string, day string, value double"
            )
            if updates
            else None
        )
        del_df = spark.createDataFrame(
            [(k,) for k in set(del_keys) | set(upd_keys)] or [("__none__",)],
            "recordid string",
        )
        if upd_df is None and del_df is None:
            continue
        upsert_dataset(
            spark, table, upd_df, ["recordid"], ["day"], delete_keys=del_df
        )
        if not os.path.exists(table):
            assert not model, f"step {step}: lake absent but model={model}"
            continue
        try:
            got = {
                r["recordid"]: r["value"]
                for r in spark.read.parquet(table).collect()
            }
        except AnalysisException:
            got = {}  # fully-emptied table has no files to infer from
        assert got == model, f"step {step}: lake={got} model={model}"


def test_upsert_revives_fully_emptied_table(spark, tmp_path):
    """A delete-only merge can empty the whole table (dir remains, zero
    data files). The next upsert must treat that as a first write — not
    crash trying to infer a schema from an empty directory."""
    table = str(tmp_path / "lake")
    rows = spark.createDataFrame(
        [("r1", "d1", 1.0)], "recordid string, day string, value double"
    )
    upsert_dataset(spark, table, rows, ["recordid"], ["day"])
    upsert_dataset(
        spark, table, None, ["recordid"], ["day"],
        delete_keys=spark.createDataFrame([("r1",)], "recordid string"),
    )
    assert os.path.exists(table)  # the emptied dir is the crash trigger
    upsert_dataset(spark, table, rows, ["recordid"], ["day"])
    got = spark.read.parquet(table).collect()
    assert [(r["recordid"], r["value"]) for r in got] == [("r1", 1.0)]


def test_upsert_null_partition_value_isolated(spark, tmp_path):
    """A NULL partition value must map to Spark's
    __HIVE_DEFAULT_PARTITION__ directory, NOT collapse out of the partition
    key — a collapsed key would alias the parent directory and the
    empty-partition cleanup would delete live sibling partitions."""
    table = str(tmp_path / "lake")
    rows = spark.createDataFrame(
        [("r1", "d1", None, 1.0), ("r2", "d1", "h2", 2.0)],
        "recordid string, day string, hour string, value double",
    )
    upsert_dataset(spark, table, rows, ["recordid"], ["day", "hour"])
    upsert_dataset(
        spark, table, None, ["recordid"], ["day", "hour"],
        delete_keys=spark.createDataFrame([("r1",)], "recordid string"),
    )
    got = spark.read.parquet(table).collect()
    assert [(r["recordid"], r["value"]) for r in got] == [("r2", 2.0)]
    # the emptied NULL-hour dir is gone; the sibling hour dir survives
    assert not os.path.exists(
        os.path.join(table, "day=d1", "hour=__HIVE_DEFAULT_PARTITION__")
    )
    assert os.path.exists(os.path.join(table, "day=d1", "hour=h2"))


def test_upsert_rejects_unsafe_partition_values(spark, tmp_path):
    """Partition values Spark would %-escape in directory names are
    rejected before any write: the FS-level cleanup addresses raw strings,
    so letting them through risks deleting the wrong path."""
    import pytest

    table = str(tmp_path / "lake")
    upsert_dataset(
        spark, table,
        spark.createDataFrame(
            [("r1", "d1", 1.0)], "recordid string, day string, value double"
        ),
        ["recordid"], ["day"],
    )
    bad = spark.createDataFrame(
        [("r2", "d:2", 2.0)], "recordid string, day string, value double"
    )
    with pytest.raises(ValueError, match="path-safe"):
        upsert_dataset(spark, table, bad, ["recordid"], ["day"])
