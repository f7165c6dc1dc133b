"""Reconciliation-operator and schema-evolution tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from bridgedownstream_spark.operators.reconcile import (
    assign_batches,
    count_reconciliation,
    dedup_latest,
    missing_records,
    replay_quarantine,
)
from bridgedownstream_spark.pipeline.registry import (
    Dataset,
    is_compatible_evolution,
)


def test_dedup_latest(spark):
    df = spark.createDataFrame(
        [("r1", "2022-01-01", "a"), ("r1", "2022-03-01", "b"), ("r2", "2022-02-01", "c")],
        "recordid string, exportedon string, payload string",
    )
    out = dedup_latest(df, "recordid", "exportedon", tiebreak="payload")
    got = {r["recordid"]: r["payload"] for r in out.collect()}
    assert got == {"r1": "b", "r2": "c"}


def test_missing_records_union_variant(spark):
    source = spark.createDataFrame(
        [("r1",), ("r2",), ("r3",), ("r4",)], "recordId string"
    )
    lake1 = spark.createDataFrame([("r1",)], "recordid string")
    lake2 = spark.createDataFrame([("r3",)], "recordid string")
    out = missing_records(source, [lake1, lake2], "recordId", "recordid")
    assert {r["recordId"] for r in out.collect()} == {"r2", "r4"}


def test_count_reconciliation(spark):
    src = spark.createDataFrame(
        [("a", "r1"), ("a", "r2"), ("b", "r3")], "ds string, recordId string"
    )
    lake = spark.createDataFrame(
        [("a", "r1"), ("a", "r1")], "ds string, recordid string"  # dup export
    )
    out = {r["grp"]: r for r in count_reconciliation(src, lake, "recordId", "recordid", "ds").collect()}
    assert out["a"]["n_source"] == 2 and out["a"]["n_lake"] == 2
    assert out["a"]["n_lake_distinct"] == 1 and out["a"]["delta"] == 1
    assert out["b"]["n_lake"] == 0 and out["b"]["delta"] == 1


def test_assign_batches(spark):
    ids = spark.createDataFrame([(i,) for i in range(250)], "id bigint")
    out = assign_batches(ids, "id", batch_size=100)
    sizes = {r["batch_id"]: r["n"] for r in out.groupBy("batch_id").agg(F.count("*").alias("n")).collect()}
    assert sizes == {0: 100, 1: 100, 2: 50}


def test_replay_quarantine(spark):
    q = spark.createDataFrame(
        [
            ("r1", "weather.json", ["e1", "e2"]),
            ("r1", "motion.json", ["e3"]),
            ("r2", "weather.json", ["e4"]),
        ],
        "recordid string, file_name string, errors array<string>",
    )
    out = {r["recordid"]: r for r in replay_quarantine(q).collect()}
    assert out["r1"]["n_files"] == 2
    assert out["r1"]["files"] == ["motion.json", "weather.json"]
    assert out["r1"]["first_errors"] == ["e3", "e1"]
    assert out["r2"]["files"] == ["weather.json"]


def test_schema_evolution_compatibility():
    v1 = Dataset("d_v1", (("recordid", "string"), ("a", "int")))
    add = Dataset("d_v1", (("recordid", "string"), ("a", "int"), ("b", "double")))
    retype = Dataset("d_v1", (("recordid", "string"), ("a", "double")))
    drop = Dataset("d_v1", (("recordid", "string"),))
    assert is_compatible_evolution(v1, add)  # additive → in-place rebuild
    assert not is_compatible_evolution(v1, retype)  # type change → new _v2
    assert not is_compatible_evolution(v1, drop)  # drop → new _v2
    assert is_compatible_evolution(v1, v1)
