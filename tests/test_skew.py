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


def _skewed_fact(spark):
    # one hot key with 80% of rows, 20 cold keys sharing the rest
    rows = [("hot", i) for i in range(800)] + [
        (f"c{i % 20}", i) for i in range(200)
    ]
    return spark.createDataFrame(rows, "k string, v int")


def test_hot_join_keys_thresholds(spark):
    from bridgedownstream_spark.operators.skew import hot_join_keys

    f = _skewed_fact(spark)
    hot = hot_join_keys(f, ["k"], min_share_bp=1000).collect()  # >= 10%
    assert [(r["k"], r["n"], r["share_bp"]) for r in hot] == [("hot", 800, 8000)]
    # every key clears a 0-bp threshold; max_keys caps the result hottest-first
    top3 = hot_join_keys(f, ["k"], min_share_bp=0, max_keys=3).collect()
    assert top3[0]["k"] == "hot" and len(top3) == 3


def test_adaptive_salted_join_equals_plain(spark):
    from bridgedownstream_spark.operators.skew import adaptive_salted_join

    f = _skewed_fact(spark)
    d = spark.createDataFrame(
        [("hot", "H")] + [(f"c{i}", f"C{i}") for i in range(20)]
        + [("nomatch", "X")],
        "k string, label string",
    )
    plain = f.join(d, ["k"], "inner")
    out = adaptive_salted_join(f, d, ["k"], salt=4, min_share_bp=1000)
    assert _norm(out.select(*plain.columns)) == _norm(plain)

    # left join keeps orphan fact rows exactly once, on the cold path
    f2 = f.unionByName(spark.createDataFrame([("orphan", 1)], "k string, v int"))
    left = adaptive_salted_join(
        f2, d, ["k"], salt=4, min_share_bp=1000, how="left", tag_col="salted"
    )
    rows = left.collect()
    assert len(rows) == 1001
    assert [r["salted"] for r in rows if r["k"] == "orphan"] == [False]
    # the hot key really took the salted path; cold keys did not
    assert {r["salted"] for r in rows if r["k"] == "hot"} == {True}
    assert {r["salted"] for r in rows if r["k"].startswith("c")} == {False}
