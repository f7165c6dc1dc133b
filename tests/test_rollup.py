"""Incremental rollup refresh: only new partitions aggregate, re-refresh is
a no-op, late data replaces exactly its partition's rollup rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from bridgedownstream_spark.pipeline.rollup import refresh_rollup


def _write_day(spark, path, day, rows):
    df = spark.createDataFrame(
        [(rid, etype, val, day) for rid, etype, val in rows],
        "recordid string, event_type string, value double, day string",
    )
    df.write.mode("append").partitionBy("day").parquet(path)


def _rollup(spark, lake, roll, refresh_partitions=None):
    return refresh_rollup(
        spark,
        lake,
        roll,
        group_cols=["event_type"],
        aggs=[
            F.count("*").cast("bigint").alias("n"),
            F.sum("value").alias("total"),
        ],
        partition_cols=["day"],
        refresh_partitions=refresh_partitions,
    )


def _read(spark, roll):
    return {
        (r["day"], r["event_type"]): (r["n"], r["total"])
        for r in spark.read.parquet(roll).collect()
    }


def test_incremental_refresh(spark, tmp_path):
    lake = str(tmp_path / "lake")
    roll = str(tmp_path / "rollup")
    _write_day(spark, lake, "01", [("r1", "a", 1.0), ("r2", "a", 2.0), ("r3", "b", 4.0)])

    assert _rollup(spark, lake, roll) == 1
    assert _read(spark, roll) == {("01", "a"): (2, 3.0), ("01", "b"): (1, 4.0)}

    # nothing new: refresh must be a no-op (0 partitions)
    assert _rollup(spark, lake, roll) == 0

    # a new day lands: ONLY it aggregates; day 01's rows are untouched
    _write_day(spark, lake, "02", [("r4", "a", 10.0)])
    assert _rollup(spark, lake, roll) == 1
    assert _read(spark, roll) == {
        ("01", "a"): (2, 3.0),
        ("01", "b"): (1, 4.0),
        ("02", "a"): (1, 10.0),
    }


def test_late_data_re_refresh(spark, tmp_path):
    lake = str(tmp_path / "lake")
    roll = str(tmp_path / "rollup")
    _write_day(spark, lake, "01", [("r1", "a", 1.0)])
    _write_day(spark, lake, "02", [("r2", "a", 2.0)])
    assert _rollup(spark, lake, roll) == 2

    # late row lands in the already-rolled day 01; a plain refresh skips it
    _write_day(spark, lake, "01", [("r9", "a", 100.0)])
    assert _rollup(spark, lake, roll) == 0
    assert _read(spark, roll)[("01", "a")] == (1, 1.0)

    # explicit re-refresh recomputes day 01 only, replacing its rows
    assert _rollup(spark, lake, roll, refresh_partitions=[{"day": "01"}]) == 1
    assert _read(spark, roll) == {
        ("01", "a"): (2, 101.0),
        ("02", "a"): (1, 2.0),
    }
