"""Bucketed co-located join: the 100 TB repeated-join strategy.

When the same big-big join runs repeatedly (the reference's nightly
reconciliation joins stage-1 and stage-2 lakes on recordid every hour),
paying a shuffle per run is the dominant cost at scale. Bucketing both
tables on the join key at write time pre-partitions them identically, so
every subsequent join is Exchange-free: each task reads bucket i of both
sides and joins locally. This test pins that plan property.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_orderstatus"
    )
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(tmp_path / "b_lineitem"))
        .saveAsTable("b_lineitem")
    )
    (
        o.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(tmp_path / "b_orders"))
        .saveAsTable("b_orders")
    )
    try:
        bl, bo = spark.table("b_lineitem"), spark.table("b_orders")
        joined = bl.hint("MERGE").join(
            bo, bl.l_orderkey == bo.o_orderkey, "inner"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: sort-merge join straight over the bucketed scans,
        # with no shuffle on either side
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        # and it still computes the right thing
        n = joined.count()
        assert n == li.count()  # every lineitem has its order
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")
