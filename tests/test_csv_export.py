"""CSV export: partition-parallel layout with parquet, lossless round-trip
through the declared schema, JSON serialization of nested columns."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from bridgedownstream_spark.sources.csv_export import (
    read_csv_dataset,
    write_csv_dataset,
)


def _table(spark):
    return spark.createDataFrame(
        [
            ("r1", 1.5, [1, 2], {"a": "x"}, "A", "2024", "3", "4"),
            ("r2", None, [], None, "A", "2024", "3", "4"),
            ("r3", 0.0, [7], {"a": ""}, "B", "2024", "3", "5"),
        ],
        T.StructType(
            [
                T.StructField("recordid", T.StringType()),
                T.StructField("score", T.DoubleType()),
                T.StructField("vals", T.ArrayType(T.LongType())),
                T.StructField(
                    "meta", T.StructType([T.StructField("a", T.StringType())])
                ),
                T.StructField("assessmentid", T.StringType()),
                T.StructField("year", T.StringType()),
                T.StructField("month", T.StringType()),
                T.StructField("day", T.StringType()),
            ]
        ),
    )


def test_csv_round_trip(spark, tmp_path):
    df = _table(spark)
    path = write_csv_dataset(df, str(tmp_path), "rec_v1")

    # parquet-parallel hive layout
    assert os.path.isdir(
        os.path.join(path, "assessmentid=A", "year=2024", "month=3", "day=4")
    )

    # nested columns came back as JSON text; scalars kept their types
    schema = T.StructType(
        [
            T.StructField("recordid", T.StringType()),
            T.StructField("score", T.DoubleType()),
            T.StructField("vals", T.StringType()),
            T.StructField("meta", T.StringType()),
            T.StructField("assessmentid", T.StringType()),
            T.StructField("year", T.StringType()),
            T.StructField("month", T.StringType()),
            T.StructField("day", T.StringType()),
        ]
    )
    back = read_csv_dataset(spark, path, schema)
    rows = {r["recordid"]: r for r in back.collect()}
    assert len(rows) == 3
    assert rows["r1"]["score"] == 1.5
    assert rows["r1"]["vals"] == "[1,2]"
    assert rows["r1"]["meta"] == '{"a":"x"}'
    # NULL survives distinct from empty: r2.score is NULL, not 0/""
    assert rows["r2"]["score"] is None
    assert rows["r2"]["meta"] is None
    # JSON text re-parses losslessly
    reparsed = back.select(
        "recordid",
        F.from_json("vals", T.ArrayType(T.LongType())).alias("vals"),
    ).collect()
    assert {r["recordid"]: r["vals"] for r in reparsed}["r1"] == [1, 2]


def test_csv_partition_pruning(spark, tmp_path):
    df = _table(spark)
    path = write_csv_dataset(df, str(tmp_path), "rec_v1")
    schema = T.StructType(
        [
            T.StructField("recordid", T.StringType()),
            T.StructField("assessmentid", T.StringType()),
        ]
    )
    pruned = read_csv_dataset(spark, path, schema).where(
        F.col("assessmentid") == "B"
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert pruned.count() == 1


def test_csv_timestamp_round_trip(spark, tmp_path):
    import datetime

    from bridgedownstream_spark.sources.csv_export import (
        read_csv_dataset,
        write_csv_dataset,
    )

    ts = datetime.datetime(2024, 3, 4, 12, 34, 56, 789123)
    df = spark.createDataFrame(
        [("r1", ts), ("r2", None)], "recordid string, exported_at timestamp"
    )
    path = write_csv_dataset(df, str(tmp_path), "t", partition_cols=[])
    back = read_csv_dataset(
        spark,
        path,
        T.StructType(
            [
                T.StructField("recordid", T.StringType()),
                T.StructField("exported_at", T.TimestampType()),
            ]
        ),
    )
    rows = {r["recordid"]: r["exported_at"] for r in back.collect()}
    # microsecond precision survives the ISO text format; NULL stays NULL
    assert rows["r1"] == ts
    assert rows["r2"] is None


def test_orc_partitioned_round_trip(spark, tmp_path):
    """Native ORC sink/source: doubles (incl. NULL) and negative values
    survive bit-exact; partition values come back as declared strings."""
    src = spark.createDataFrame(
        [(1, "alpha", -3.25, 0), (2, "beta", None, 0), (3, "gamma", 0.1, 1)],
        "k long, name string, bal double, nk int",
    )
    path = os.path.join(str(tmp_path), "orc", "t")
    src.write.mode("overwrite").partitionBy("nk").orc(path)
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("bal", T.DoubleType()),
            T.StructField("nk", T.StringType()),
        ]
    )
    back = {r.k: r for r in spark.read.schema(schema).orc(path).collect()}
    assert len(back) == 3
    assert back[1].bal == -3.25 and back[2].bal is None and back[3].bal == 0.1
    assert back[1].nk == "0" and back[3].nk == "1"
    # partition pruning reaches the ORC scan
    plan = (
        spark.read.schema(schema)
        .orc(path)
        .where(F.col("nk") == "1")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [" in plan and "nk" in plan.split("PartitionFilters")[1][:80]
