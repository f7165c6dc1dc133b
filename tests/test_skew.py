"""salted_join: result-identical to the plain join, with the fact side
spread over salt sub-keys (hot-key mitigation)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bridgedownstream_spark.operators.skew import salted_join

SF = "/root/testdata/sf0.001"


def _norm(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_inner_equals_plain_join(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    plain = li.join(o, ["l_orderkey"], "inner")
    salted = salted_join(li, o, ["l_orderkey"], salt=4)
    assert _norm(salted) == _norm(plain)


def test_salted_left_keeps_unmatched_fact_rows(spark):
    f = spark.createDataFrame(
        [("hot", i) for i in range(50)] + [("orphan", 99)], "k string, v int"
    )
    d = spark.createDataFrame([("hot", "H")], "k string, label string")
    out = salted_join(f, d, ["k"], salt=5, how="left")
    rows = out.collect()
    assert len(rows) == 51  # 50 matched + 1 unmatched, no replication
    assert {r["label"] for r in rows if r["k"] == "hot"} == {"H"}
    assert [r["label"] for r in rows if r["k"] == "orphan"] == [None]


def test_salted_spreads_hot_key(spark):
    f = spark.createDataFrame([("hot", i) for i in range(1000)], "k string, v int")
    d = spark.createDataFrame([("hot", "H")], "k string, label string")
    salts = (
        f.withColumn(
            "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in f.columns]), F.lit(8))
        )
        .select("__salt")
        .distinct()
        .count()
    )
    assert salts == 8  # one hot key really fans across all sub-keys
    assert salted_join(f, d, ["k"], salt=8).count() == 1000


def test_salted_rejects_right_join(spark):
    df = spark.createDataFrame([("a", 1)], "k string, v int")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(df, df, ["k"], how="right")
