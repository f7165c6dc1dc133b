"""Core query surface — every scan/filter/join/agg/window/set-op/scalar
operator family from SURVEY.md §2, expressed over the synthetic testdata
tables, each with a DuckDB oracle twin.

Naming discipline: every computed column is aliased identically in the Spark
plan and the oracle SQL (the driver's compare sorts columns by name).
Floating-point aggregates are rounded to 2 decimals on both sides so
accumulation order can't flip the value hash. Timestamps are rendered as
microsecond strings (see util.ts_str) to sidestep tz-aware vs tz-naive
metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from bridgedownstream_spark.operators import relationalize
from bridgedownstream_spark.queries.util import TS_STR, tbl, ts_str, wide

QUERIES: dict = {}


def q(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = (fn, oracle)
        return fn

    return deco


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.4) — flagship pricing summary (TPC-H Q1 shape)
# ---------------------------------------------------------------------------


@q(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(l_quantity       AS DECIMAL(24,10))), 2) AS DOUBLE) AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice  AS DECIMAL(24,10))), 2) AS DOUBLE) AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,10))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(24,10))), 2) AS DOUBLE) AS sum_charge,
           round(CAST(sum(CAST(l_quantity      AS DECIMAL(24,10))) AS DOUBLE) / count(*), 2) AS avg_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(24,10))) AS DOUBLE) / count(*), 2) AS avg_price,
           round(CAST(sum(CAST(l_discount      AS DECIMAL(24,10))) AS DOUBLE) / count(*), 4) AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Sums run on DECIMAL so every aggregate is exact regardless of
    # partial-agg merge order (float order is nondeterministic across runs
    # — the r2 skew_salted_agg lesson applied to the flagship); averages
    # divide the exact decimal sum in one double op.
    li = tbl(spark, sf_dir, "lineitem")
    dec = "decimal(24,10)"
    qty_d = F.col("l_quantity").cast(dec)
    price_d = F.col("l_extendedprice").cast(dec)
    disc_d = F.col("l_discount").cast(dec)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    disc_price_d = disc_price.cast(dec)
    charge_d = (disc_price * (1 + F.col("l_tax"))).cast(dec)
    n = F.count("*")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(qty_d), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(price_d), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price_d), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge_d), 2).cast("double").alias("sum_charge"),
            F.round(F.sum(qty_d).cast("double") / n, 2).alias("avg_qty"),
            F.round(F.sum(price_d).cast("double") / n, 2).alias("avg_price"),
            F.round(F.sum(disc_d).cast("double") / n, 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Projections / filters (SURVEY §2.2)
# ---------------------------------------------------------------------------


@q(
    "projection_pushdown",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem WHERE l_shipdate < TIMESTAMP '1995-06-01 00:00:00'
    """,
)
def projection_pushdown(spark, sf_dir):
    # P1/S6: column-pruned scan with a pushed-down predicate
    # (reference: bootstrap_trigger.py:121-143 reads parquet with columns=[...]).
    return (
        tbl(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate") < F.lit("1995-06-01 00:00:00").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


@q(
    "distinct_projection",
    "SELECT DISTINCT o_custkey, o_orderpriority FROM orders",
)
def distinct_projection(spark, sf_dir):
    # P2/A1: parent-index projection + distinct (json_s3_to_parquet.py:151-155)
    return tbl(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority").distinct()


@q(
    "conjunctive_filter",
    """
    SELECT event_id, user_id, round(value, 2) AS value
    FROM events
    WHERE event_type = 'purchase' AND value > 100 AND props IS NOT NULL
    """,
)
def conjunctive_filter(spark, sf_dir):
    # P4: conjunctive predicates + null guard (etl-408/etl_408.py:147-150)
    return (
        tbl(spark, sf_dir, "events")
        .where(
            (F.col("event_type") == "purchase")
            & (F.col("value") > 100)
            & F.col("props").isNotNull()
        )
        .select("event_id", "user_id", F.round("value", 2).alias("value"))
    )


@q(
    "membership_filter",
    """
    SELECT c_custkey, c_name, c_mktsegment FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
    """,
)
def membership_filter(spark, sf_dir):
    # P5: IN-list predicate (get_representative_sample.py:56-58)
    return (
        tbl(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@q(
    "prefix_filter",
    """
    SELECT p_partkey, p_name, p_type FROM part
    WHERE p_name LIKE 'small%' AND p_type LIKE '%ECO%'
    """,
)
def prefix_filter(spark, sf_dir):
    # P6/F10: startswith + contains on keys (etl-437/main.py:62-72)
    return (
        tbl(spark, sf_dir, "part")
        .where(F.col("p_name").startswith("small") & F.col("p_type").contains("ECO"))
        .select("p_partkey", "p_name", "p_type")
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.3)
# ---------------------------------------------------------------------------


@q(
    "join_revenue_by_nation",
    """
    SELECT n.n_name AS nation,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                              AS DECIMAL(24,10))), 2) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN nation n    ON c.c_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    ORDER BY nation
    """,
)
def join_revenue_by_nation(spark, sf_dir):
    # J1/J5: fact⋈dims star join; every dim is broadcast (no shuffle of the
    # fact table except the final groupBy) — the 100 TB plan: one shuffle.
    #
    # Dimension filters are pushed AHEAD of the big-big join: region→nation
    # →customer collapse into one small broadcast frame, orders is
    # broadcast-semi-filtered by it, so the lineitem⋈orders exchange moves
    # only the ~1/R of orders that can contribute (VERDICT r1's suggested
    # refinement: shrink the probe side before the one real shuffle).
    li, o = tbl(spark, sf_dir, "lineitem"), tbl(spark, sf_dir, "orders")
    c, n, r = (tbl(spark, sf_dir, t) for t in ("customer", "nation", "region"))
    n_asia = n.join(
        F.broadcast(r.where(F.col("r_name") == "ASIA")),
        n.n_regionkey == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    # region/nation are BOUNDED dims → forced broadcast is always right.
    # customer (and the orders projection derived from it) GROWS with the
    # data, so those joins carry no broadcast hint: the planner/AQE
    # broadcast them from true sizes while they fit the threshold and fall
    # back to shuffle joins at scale — a forced broadcast of a
    # fact-derived frame is how 100 TB star joins OOM their executors.
    c_asia = c.join(
        F.broadcast(n_asia), c.c_nationkey == F.col("n_nationkey")
    ).select("c_custkey", "n_name")
    o_asia = o.join(c_asia, o.o_custkey == F.col("c_custkey")).select(
        "o_orderkey", "n_name"
    )
    # shuffle_merge pins the fact⋈fact join to the scale-honest shape
    # (static planning would otherwise broadcast the lineitem PROJECTION
    # because its 3-column estimate fits the threshold — building a hash
    # relation over the whole fact table); AQE still converts to broadcast
    # at runtime from TRUE sizes, picking the genuinely small side.
    return (
        li.hint("shuffle_merge")
        .join(o_asia, li.l_orderkey == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            # DECIMAL sum: exact under any partial-agg merge order
            F.round(
                F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                      .cast("decimal(24,10)")), 2,
            ).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("nation")
    )


@q(
    "anti_join_missing",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
)
def anti_join_missing(spark, sf_dir):
    # J2: set-diff reconciliation (bootstrap_trigger.py:226-236) — customers
    # with no urgent order ("records not yet in the lake"), via the
    # library operator.
    from bridgedownstream_spark.operators import reconcile

    c, o = tbl(spark, sf_dir, "customer"), tbl(spark, sf_dir, "orders")
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT")
    return reconcile.missing_records(c, urgent, "c_custkey", "o_custkey").select(
        "c_custkey", "c_name"
    )


@q(
    "anti_join_union",
    """
    -- NOT EXISTS, not NOT IN: a single NULL l_orderkey would turn NOT IN
    -- into UNKNOWN for every order (0 rows) while Spark's left_anti join
    -- ignores NULL keys — the two must share null semantics to stay
    -- equivalent on any data
    SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice FROM orders o
    WHERE NOT EXISTS (
        SELECT 1 FROM (
            SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
            UNION
            SELECT l_orderkey FROM lineitem WHERE l_tax > 0.07
        ) u WHERE u.l_orderkey = o.o_orderkey
    )
    """,
)
def anti_join_union(spark, sf_dir):
    # J3: anti-join vs union of two key sets (bootstrap_trigger.py:237-246),
    # via the library operator's multi-lake variant.
    from bridgedownstream_spark.operators import reconcile

    o, li = tbl(spark, sf_dir, "orders"), tbl(spark, sf_dir, "lineitem")
    return reconcile.missing_records(
        o,
        [li.where(F.col("l_returnflag") == "R"), li.where(F.col("l_tax") > 0.07)],
        "o_orderkey",
        "l_orderkey",
    ).select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))


@q(
    "semi_join_exists",
    """
    SELECT o_orderkey, o_orderpriority FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45
    )
    """,
)
def semi_join_exists(spark, sf_dir):
    o, li = tbl(spark, sf_dir, "orders"), tbl(spark, sf_dir, "lineitem")
    return o.join(
        li.where(F.col("l_quantity") >= 45), o.o_orderkey == li.l_orderkey, "left_semi"
    ).select("o_orderkey", "o_orderpriority")


# ---------------------------------------------------------------------------
# Window-shaped operators (SURVEY §2.4 A2/A3, §2.5) and sorts/top-k (§2.6)
# ---------------------------------------------------------------------------


@q(
    "dedup_latest",
    f"""
    SELECT user_id, {TS_STR.format(col="ts")} AS latest_ts, event_type,
           round(value, 2) AS value, event_id
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def dedup_latest(spark, sf_dir):
    # A2 dedup-latest: "only use the most recently exported record"
    # (bootstrap_trigger.py:222-225), via the library operator.
    from bridgedownstream_spark.operators import reconcile

    return reconcile.dedup_latest(
        tbl(spark, sf_dir, "events"), "user_id", "ts", tiebreak="event_id"
    ).select(
        "user_id",
        ts_str("ts").alias("latest_ts"),
        "event_type",
        F.round("value", 2).alias("value"),
        "event_id",
    )


@q(
    "sample_per_group",
    """
    SELECT event_type, event_id, user_id FROM events
    QUALIFY row_number() OVER (
        PARTITION BY event_type
        ORDER BY ((event_id % 65536) * 2654435761) % 4294967296, event_id
    ) = 1
    """,
)
def sample_per_group(spark, sf_dir):
    # A3 representative sample: the reference shuffles then keeps one row per
    # appVersion (get_representative_sample.py:61-65). A seeded Knuth-hash
    # order replaces rand() so the pick is deterministic and oracle-checkable.
    # The operand is bounded (% 65536) first: the raw multiply overflows
    # BIGINT above event_id ~3.47e9, where Spark (non-ANSI) wraps silently
    # but DuckDB raises — the bound keeps both engines in exact-int range.
    h = ((F.col("event_id") % 65536) * F.lit(2654435761)) % F.lit(4294967296)
    w = W.partitionBy("event_type").orderBy(h, "event_id")
    return (
        tbl(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_type", "event_id", "user_id")
    )


@q(
    "reconcile_counts",
    """
    SELECT event_type,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           CAST(round(sum(CAST(value AS DECIMAL(24,10))), 2) AS DOUBLE) AS total_value,
           round(max(value), 2) AS max_value,
           round(min(value), 2) AS min_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def reconcile_counts(spark, sf_dir):
    # A4/A5/A6/A7: the count / count-distinct reconciliation report
    # (etl-245/main.py:29-63). The sum runs on DECIMAL: exact under any
    # partial-agg merge order (max/min are order-insensitive already).
    return (
        tbl(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum(F.col("value").cast("decimal(24,10)")), 2)
            .cast("double").alias("total_value"),
            F.round(F.max("value"), 2).alias("max_value"),
            F.round(F.min("value"), 2).alias("min_value"),
        )
        .orderBy("event_type")
    )


@q(
    "group_collect",
    """
    SELECT l_returnflag,
           string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def group_collect(spark, sf_dir):
    # A8 group-accumulate (sns_to_glue/app.py:26-45); sorted for determinism.
    return (
        tbl(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.array_join(F.sort_array(F.collect_set("l_linestatus")), ",").alias("statuses"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag")
    )


@q(
    "top_k_per_group",
    """
    SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
           CAST(rn AS INT) AS rn
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey
        ) AS rn FROM orders
    ) WHERE rn <= 3
    """,
)
def top_k_per_group(spark, sf_dir):
    w = W.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        tbl(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "rn",
        )
    )


@q(
    "running_total",
    f"""
    SELECT user_id, event_id, {TS_STR.format(col="ts")} AS ts,
           round(sum(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_value
    FROM events WHERE user_id < 50
    """,
)
def running_total(spark, sf_dir):
    # Window frame (beyond the reference's needs; §2.5 notes frames unused —
    # we support them anyway as a first-class window surface).
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        tbl(spark, sf_dir, "events")
        .where(F.col("user_id") < 50)
        .select(
            "user_id",
            "event_id",
            ts_str("ts").alias("ts"),
            F.round(F.sum("value").over(w), 2).alias("running_value"),
        )
    )


@q(
    "asof_closest",
    """
    SELECT l_orderkey, strftime(l_shipdate, '%Y-%m-%d %H:%M:%S.%f') AS first_ship,
           l_linenumber
    FROM lineitem
    QUALIFY row_number() OVER (
        PARTITION BY l_orderkey ORDER BY l_shipdate, l_linenumber
    ) = 1
    """,
)
def asof_closest(spark, sf_dir):
    # P3 closest-match lookup (s3_to_json_s3.py:230-248): argmin over an
    # ordered candidate set per key — the reference's only as-of semantic.
    w = W.partitionBy("l_orderkey").orderBy("l_shipdate", "l_linenumber")
    return (
        tbl(spark, sf_dir, "lineitem")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("l_orderkey", ts_str("l_shipdate").alias("first_ship"), "l_linenumber")
    )


# ---------------------------------------------------------------------------
# Set ops (§2.7), rollup/pivot, scalar functions (§2.8)
# ---------------------------------------------------------------------------


@q(
    "union_distinct",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal > 9000
    """,
)
def union_distinct(spark, sf_dir):
    c = tbl(spark, sf_dir, "customer")
    return (
        c.where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .union(c.where(F.col("c_acctbal") > 9000).select("c_custkey"))
        .distinct()
    )


@q(
    "intersect_keys",
    """
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '5-LOW'
    """,
)
def intersect_keys(spark, sf_dir):
    o = tbl(spark, sf_dir, "orders")
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    low = o.where(F.col("o_orderpriority") == "5-LOW").select(
        F.col("o_custkey").alias("custkey")
    )
    return urgent.intersect(low)


@q(
    "rollup_revenue",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(24,10))), 2) AS DOUBLE)
               AS revenue,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_revenue(spark, sf_dir):
    # DECIMAL sum: exact under any partial-agg merge order
    return (
        tbl(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(24,10)")), 2)
            .cast("double").alias("revenue"),
            F.count("*").alias("n"),
        )
    )


@q(
    "cube_revenue",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(24,10))), 2) AS DOUBLE)
               AS revenue,
           count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_revenue(spark, sf_dir):
    # Grouping sets beyond the reference's needs (§2.4 notes it has none):
    # full CUBE over the pricing dimensions. DECIMAL sum: exact under any
    # partial-agg merge order.
    return (
        wide(
            spark,
            tbl(spark, sf_dir, "lineitem").select(
                "l_returnflag", "l_linestatus", "l_extendedprice"
            ),
            sf_dir,
            "lineitem",
        )
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(24,10)")), 2)
            .cast("double").alias("revenue"),
            F.count("*").alias("n"),
        )
    )


@q(
    "pivot_daily_events",
    """
    SELECT strftime(ts, '%Y-%m-%d') AS day,
           count(*) FILTER (WHERE event_type = 'click')    AS click,
           count(*) FILTER (WHERE event_type = 'view')     AS view,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS signup,
           count(*) FILTER (WHERE event_type = 'error')    AS error
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def pivot_daily_events(spark, sf_dir):
    types = ["click", "view", "purchase", "signup", "error"]
    df = (
        tbl(spark, sf_dir, "events")
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .pivot("event_type", types)
        .count()
    )
    # pivot leaves NULL where a (day, type) combo is absent; the oracle's
    # FILTER counts yield 0 — normalize.
    return df.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types]
    ).orderBy("day")


@q(
    "scalar_functions",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)        AS order_year,
           CAST(month(o_orderdate) AS INT)       AS order_month,
           CAST(day(o_orderdate) AS INT)         AS order_day,
           lower(o_orderpriority)                AS priority_lower,
           CAST(string_split(o_orderpriority, '-')[1] AS INT) AS priority_num,
           substr(o_orderstatus, 1, 1)           AS status_char,
           CAST(floor(o_totalprice) AS BIGINT)   AS price_floor,
           concat(o_orderstatus, '-', o_orderpriority) AS status_priority
    FROM orders WHERE o_orderkey % 10 = 0
    """,
)
def scalar_functions(spark, sf_dir):
    # F1 (date parts), F3 (split), F5 (lower), F7 (substring), F11 (casts),
    # plus concat — the reference's scalar-function surface in one projection.
    o = tbl(spark, sf_dir, "orders").where(F.col("o_orderkey") % 10 == 0)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.lower("o_orderpriority").alias("priority_lower"),
        F.split("o_orderpriority", "-").getItem(0).cast("int").alias("priority_num"),
        F.substring("o_orderstatus", 1, 1).alias("status_char"),
        F.floor("o_totalprice").cast("bigint").alias("price_floor"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_priority"),
    )


@q(
    "case_when_routing",
    """
    SELECT CASE WHEN event_type = 'purchase' THEN 'revenue'
                WHEN event_type = 'signup'   THEN 'growth'
                ELSE 'engagement' END AS category,
           count(*) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(24,10))), 2) AS DOUBLE) AS total_value
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def case_when_routing(spark, sf_dir):
    # F6 conditional rewrite (s3_to_json_s3.py:152-154 filename rewrite).
    cat = (
        F.when(F.col("event_type") == "purchase", "revenue")
        .when(F.col("event_type") == "signup", "growth")
        .otherwise("engagement")
    )
    return (
        tbl(spark, sf_dir, "events")
        .groupBy(cat.alias("category"))
        .agg(
            F.count("*").alias("n"),
            # DECIMAL sum: exact under any partial-agg merge order
            F.round(F.sum(F.col("value").cast("decimal(24,10)")), 2)
            .cast("double").alias("total_value"),
        )
        .orderBy("category")
    )


@q(
    "json_extract",
    """
    SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
           count(*) AS n, count(DISTINCT user_id) AS n_users
    FROM events WHERE props IS NOT NULL
    GROUP BY 1 ORDER BY 1
    """,
)
def json_extract(spark, sf_dir):
    # F9 JSON parse of message bodies (sns_to_glue/app.py:28-29).
    return (
        tbl(spark, sf_dir, "events")
        .where(F.col("props").isNotNull())
        .groupBy(F.get_json_object("props", "$.k").cast("int").alias("k"))
        .agg(F.count("*").alias("n"), F.countDistinct("user_id").alias("n_users"))
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# Relationalize through the SQL oracle (SURVEY §2.9)
# ---------------------------------------------------------------------------


def _nested_orders(spark, sf_dir):
    """Build a BridgeDownstream-shaped nested table from real testdata:
    one record per order, a struct column and an array<struct> column."""
    o = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem")
    items = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(F.struct("l_linenumber", "l_partkey", "l_quantity"))
        ).alias("items")
    )
    return o.join(items, o.o_orderkey == items.l_orderkey, "inner").select(
        F.col("o_orderkey").cast("string").alias("recordid"),
        F.struct("o_orderstatus", "o_orderpriority").alias("meta"),
        "items",
    )


@q(
    "relationalize_root",
    """
    SELECT CAST(o_orderkey AS VARCHAR) AS recordid,
           o_orderstatus  AS meta_o_orderstatus,
           o_orderpriority AS meta_o_orderpriority
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
    """,
)
def relationalize_root(spark, sf_dir):
    # N3 struct-flatten path: the root table of relationalize(), minus the
    # surrogate-key column (engine-internal, not SQL-expressible).
    tables = relationalize(_nested_orders(spark, sf_dir), "rec", key_cols=("recordid",))
    return tables["rec"].select("recordid", "meta_o_orderstatus", "meta_o_orderpriority")


@q(
    "relationalize_child",
    """
    SELECT CAST(row_number() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey, l_quantity
           ) - 1 AS INT)                    AS index,
           l_linenumber, l_partkey,
           round(l_quantity, 2)             AS l_quantity,
           CAST(l_orderkey AS VARCHAR)      AS recordid
    FROM lineitem
    """,
)
def relationalize_child(spark, sf_dir):
    # N3/N4 array-explode path: the child table (id omitted — surrogate ids
    # are deterministic but engine-defined; index/values/keys are the
    # SQL-checkable contract).
    tables = relationalize(_nested_orders(spark, sf_dir), "rec", key_cols=("recordid",))
    child = tables["rec_items"]
    return child.select(
        "index",
        "l_linenumber",
        "l_partkey",
        F.round("l_quantity", 2).alias("l_quantity"),
        "recordid",
    )


@q(
    "q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(24,10))), 2) AS DOUBLE) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 (shipping priority): unshipped BUILDING-segment orders
    ranked by revenue — the classic 3-way join + aggregate + top-k shape.

    Plan: the segment filter shrinks customer before anything joins; both
    joins key on their natural keys with AQE choosing broadcast for the
    filtered customer side; revenue sums on DECIMAL (merge-order-exact)
    and the top-10 is TakeOrdered, no global sort. Extra l_orderkey
    tie-break (beyond the spec's revenue/date) pins a deterministic cut
    for the oracle compare.
    """
    c = tbl(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = tbl(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = tbl(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    rev = F.round(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(24,10)")),
        2,
    ).cast("double")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(rev.alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
    )


@q(
    "q6_forecast_revenue",
    """
    SELECT CAST(round(sum(CAST(l_extendedprice * l_discount
                               AS DECIMAL(24,10))), 2) AS DOUBLE) AS revenue,
           CAST(count(*) AS INT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 (forecasting revenue change): a pure scan-filter-aggregate
    — the canonical predicate-pushdown benchmark. All four predicates
    reach the parquet scan (PushedFilters); the sum runs on DECIMAL.
    """
    li = tbl(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(24,10)")),
            2,
        )
        .cast("double")
        .alias("revenue"),
        F.count("*").cast("int").alias("n_lines"),
    )


@q(
    "q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(24,10))), 2) AS DOUBLE) AS revenue,
           round(c.c_acctbal, 2) AS c_acctbal
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 4
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 (returned-item reporting): customers who returned the
    most revenue in a quarter-ish window — join-heavy top-k over the two
    fact tables with a dimension rollup.

    Plan: the date window prunes orders at the scan, the returnflag
    prunes lineitem at the scan, the facts join on orderkey, and the
    per-customer rollup groups on the customer key; top-20 is
    TakeOrdered with a key tie-break for a deterministic cut.
    """
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = tbl(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    rev = F.round(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(24,10)")),
        2,
    ).cast("double")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "c_name", F.round("c_acctbal", 2).alias("c_acctbal"))
        .agg(rev.alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@q(
    "q5_local_supplier_volume",
    """
    SELECT n.n_name,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(24,10))), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name ASC
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 (local supplier volume): revenue per nation where the
    customer and supplier share the nation, scoped to one region + year.

    Plan: region/nation collapse to a broadcast filter; the LOCAL
    constraint (c_nationkey = s_nationkey) rides the supplier join as an
    extra equi-condition, so no post-join filter pass; only the two fact
    joins shuffle, both on their natural keys, and revenue sums on
    DECIMAL. The 5-way star exercises Catalyst's join reordering with
    every dimension broadcastable.
    """
    r = tbl(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = tbl(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = tbl(spark, sf_dir, "lineitem")
    s = tbl(spark, sf_dir, "supplier")
    rev = F.round(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(24,10)"
            )
        ),
        2,
    ).cast("double")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(rev.alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@q(
    "q7_volume_shipping",
    """
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(24,10))), 2) AS DOUBLE) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 (volume shipping): bilateral trade between two nations by
    ship year — the two-role dimension pattern (nation joined twice under
    different aliases) plus a disjunctive cross-pair predicate.

    Plan: both nation roles broadcast; the pair predicate is evaluated
    after both role joins as a row-local filter over broadcast-joined
    columns (never a cartesian); facts join on natural keys; year() is a
    codegen projection. At 100 TB the two-year shipdate window reaches
    the scan as a pushed range filter.
    """
    n = tbl(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = tbl(spark, sf_dir, "supplier")
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    li = tbl(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    rev = F.round(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(24,10)"
            )
        ),
        2,
    ).cast("double")
    return (
        s.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(rev.alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@q(
    "q14_promo_effect",
    """
    SELECT CAST(round(
             100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                              THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                                        AS DECIMAL(24,10))
                              ELSE CAST(0 AS DECIMAL(24,10)) END) AS DOUBLE)
                   / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                                   AS DECIMAL(24,10))) AS DOUBLE),
             4) AS DOUBLE) AS promo_pct,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01'
    """,
)
def q14_promo_effect(spark, sf_dir):
    """TPC-H Q14 (promotion effect): percent of one month's revenue from
    promo parts — conditional aggregation over a fact⋈dimension join.

    Plan: the month window prunes lineitem at the scan; part broadcasts
    (AQE — it is the bounded dimension); BOTH the numerator and the
    denominator accumulate in one partial→final aggregate pass (a single
    scan, not two), exact in DECIMAL with one final double division.
    """
    li = tbl(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = tbl(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(24,10)"
    )
    zero = F.lit(0).cast("decimal(24,10)")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(zero))
                .cast("double")
                / F.sum(disc).cast("double"),
                4,
            )
            .cast("double")
            .alias("promo_pct"),
            F.count("*").cast("bigint").alias("n_lines"),
        )
    )


@q(
    "q18_large_volume_customers",
    """
    WITH big AS (
      SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(24,10))) AS qty
      FROM lineitem GROUP BY 1
      HAVING sum(CAST(l_quantity AS DECIMAL(24,10))) > 200
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           round(o.o_totalprice, 2) AS o_totalprice,
           CAST(round(b.qty, 2) AS DOUBLE) AS sum_qty
    FROM big b
    JOIN orders o   ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def q18_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 (large-volume customers): orders whose total quantity
    exceeds a threshold, joined back to their customers — the classic
    aggregate-then-semi-join shape (the spec's IN-subquery expressed as
    the aggregate it is).

    Plan: the quantity rollup is ONE partial→final aggregate on
    l_orderkey (only (orderkey, qty) crosses the wire); the HAVING
    shrinks it to the big-order sliver, which then joins orders hashed
    on the same orderkey and customers via a broadcast-eligible dim
    join; top-100 is TakeOrdered with an orderkey tie-break. DECIMAL
    quantities make the threshold cut merge-order-exact.
    """
    li = tbl(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(24,10)")).alias("qty"))
        .where(F.col("qty") > 200)
    )
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer")
    return (
        big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("qty", 2).cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@q(
    "q8_market_share",
    """
    WITH all_nations AS (
      SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount)
                  AS DECIMAL(24,10)) AS volume,
             n2.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'EUROPE' AND p.p_type = 'STANDARD'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           CAST(round(CAST(sum(CASE WHEN supp_nation = 'NATION_3'
                                    THEN volume
                                    ELSE CAST(0 AS DECIMAL(24,10)) END)
                           AS DOUBLE)
                    / CAST(sum(volume) AS DOUBLE), 6) AS DOUBLE) AS mkt_share,
           CAST(round(sum(volume), 2) AS DOUBLE) AS total_volume
    FROM all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 (national market share): one supplier nation's share of a
    region's order volume for one part type, by year — the widest star in
    the suite (7 joins, nation in BOTH the filter role and the measure
    role).

    Plan: part's type filter and the region→nation customer-side filter
    collapse into broadcasts that shrink lineitem/orders before the
    fact⋈fact joins; the supplier-side nation broadcast only LABELS rows
    (no filter), and both the share numerator and total accumulate
    DECIMAL-exact in one partial→final aggregate. At 100 TB each year's
    share is one ratio of two exact sums, so the 7-way join's output
    never materializes beyond the agg state.
    """
    p = tbl(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    li = tbl(spark, sf_dir, "lineitem")
    s = tbl(spark, sf_dir, "supplier")
    o = tbl(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = tbl(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    n1 = n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")).select(
        F.col("n_nationkey").alias("n1_key")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(24,10)"
    )
    zero = F.lit(0).cast("decimal(24,10)")
    return (
        F.broadcast(p)
        .join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(zero))
                .cast("double")
                / F.sum(vol).cast("double"),
                6,
            )
            .cast("double")
            .alias("mkt_share"),
            F.round(F.sum(vol), 2).cast("double").alias("total_volume"),
        )
        .orderBy("o_year")
    )


@q(
    "q13_customer_distribution",
    """
    WITH counts AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(count(*) AS BIGINT) AS custdist
    FROM counts
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 (customer order-count distribution): how many customers
    placed N orders, for every N INCLUDING ZERO — the left-join-then-
    double-aggregate shape (an inner join would silently drop the
    zero-order customers the query exists to count).

    Plan: count(o_orderkey) ignores the nulls the left join manufactures;
    the first aggregate keys on c_custkey (the join's own key — AQE
    reuses the partitioning, no second exchange for the count), and the
    second groups the tiny (count, custdist) histogram."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy(F.col("c_count").cast("bigint").alias("c_count"))
        .agg(F.count("*").cast("bigint").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@q(
    "q22_global_sales_opportunity",
    """
    WITH wealthy AS (
      SELECT c_custkey, c_acctbal,
             substr(c_name, 1, 10) AS cntry
      FROM customer
      WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                         WHERE c_acctbal > 0)
    )
    SELECT w.cntry,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(round(sum(CAST(w.c_acctbal AS DECIMAL(24,10))), 2)
                AS DOUBLE) AS totacctbal
    FROM wealthy w
    ANTI JOIN (SELECT o_custkey FROM orders
               WHERE o_orderdate >= TIMESTAMP '2000-01-01') o
      ON o.o_custkey = w.c_custkey
    GROUP BY w.cntry
    ORDER BY w.cntry
    """,
)
def q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 (global sales opportunity): above-average-balance
    customers with no RECENT orders — scalar subquery + anti-join +
    rollup (the spec's country code adapted to the synthetic c_name
    prefix; the spec's never-ordered test rebound to a recency cutoff
    because every synthetic customer has ordered at least once — the
    all-time anti-join is degenerate-empty on this corpus).

    Plan: the average is a broadcast 1-row aggregate (scalar subquery →
    one tiny extra job, applied as a plain filter — never a per-row
    re-evaluation); the inactivity test is a LeftAnti hash join on
    custkey projecting keys only, with the recency predicate pushed to
    the orders scan; balances sum DECIMAL-exact."""
    c = tbl(spark, sf_dir, "customer")
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__avg")
    )
    o = (
        tbl(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    wealthy = (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("__avg"))
        .select(
            "c_custkey",
            "c_acctbal",
            F.substring("c_name", 1, 10).alias("cntry"),
        )
    )
    return (
        wealthy.join(o, wealthy.c_custkey == o.o_custkey, "left_anti")
        .groupBy("cntry")
        .agg(
            F.count("*").cast("bigint").alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(24,10)")), 2)
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("cntry")
    )


@q(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(24,10))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(round(r.total_rev, 2) AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev = (SELECT max(total_rev) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 (top supplier): the supplier(s) with the maximum quarterly
    revenue — the spec's revenue VIEW + scalar-max correlated predicate.

    Plan: the quarter filter prunes lineitem at the scan; revenue is ONE
    partial->final aggregate keyed on l_suppkey (supplier-cardinality
    output); the max is a broadcast 1-row aggregate applied as a plain
    filter (NOT a global window, which would funnel every supplier row
    through a single partition); the supplier dim joins broadcast. DECIMAL
    revenue makes the max tie-set merge-order-exact, so "the" winner is
    bit-stable.
    """
    li = tbl(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(24,10)"
            )
        ).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("__mx"))
    s = tbl(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_rev") == F.col("__mx"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_rev", 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@q(
    "q17_small_quantity_revenue",
    """
    WITH cand AS (
      SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = 'Brand#3' AND p.p_size < 15
    ),
    lim AS (
      SELECT l_partkey AS pk, 0.2 * avg(l_quantity) AS qty_lim
      FROM cand GROUP BY 1
    )
    SELECT CAST(round(CAST(sum(CAST(c.l_extendedprice AS DECIMAL(24,10)))
                           AS DOUBLE) / 7.0, 2) AS DOUBLE) AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM cand c
    JOIN lim ON lim.pk = c.l_partkey
    WHERE c.l_quantity < lim.qty_lim
    """,
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 (small-quantity-order revenue): revenue lost to orders
    below 20% of a part's average quantity — the spec's correlated AVG
    subquery expressed as the per-part aggregate it is (spec's
    Brand/container filter adapted to the synthetic brand+size columns).

    Plan: the brand+size part filter broadcasts and shrinks lineitem
    FIRST, so the per-part average runs over the filtered sliver, not the
    full fact (semantically identical: the filter only restricts
    partkeys, never drops lines of a surviving part). The threshold join
    is partkey->partkey on two frames ALREADY partitioned by the same
    groupBy key, and the final sum is DECIMAL-exact. l_quantity values
    are integer-valued doubles, so sum/count (and 0.2x) are bit-exact in
    IEEE double regardless of accumulation order — the threshold compare
    cannot wobble across engines.
    """
    p = tbl(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#3") & (F.col("p_size") < 15)
    )
    cand = (
        tbl(spark, sf_dir, "lineitem")
        .join(F.broadcast(p.select("p_partkey")),
              F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_quantity", "l_extendedprice")
    )
    lim = cand.groupBy(F.col("l_partkey").alias("pk")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_lim")
    )
    return (
        cand.join(lim, cand.l_partkey == lim.pk)
        .where(F.col("l_quantity") < F.col("qty_lim"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(24,10)")).cast(
                    "double"
                )
                / 7.0,
                2,
            )
            .cast("double")
            .alias("avg_yearly"),
            F.count("*").cast("bigint").alias("n_lines"),
        )
    )


@q(
    "q19_disjunctive_revenue",
    """
    SELECT CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(24,10))), 2) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity >= 1  AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 20
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 30
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
)
def q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 (discounted revenue): an OR-of-ANDs predicate spanning
    both join sides (spec's brand/container/shipmode triples adapted to
    the synthetic brand+size+quantity columns).

    Plan: Catalyst factors side-local implications out of the
    disjunction — the part side gets
    (brand IN (...) AND p_size <= 30)-shaped pushdown reaching the part
    scan, the lineitem side gets the quantity envelope [1, 40] — so both
    scans prune BEFORE the broadcast join, and only the residual mixed
    disjunction evaluates post-join. One DECIMAL-exact partial->final
    aggregate; nothing wider than (partkey, qty, price, discount)
    crosses the wire.
    """
    li = tbl(spark, sf_dir, "lineitem")
    p = tbl(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    qty = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & (qty >= 1)
            & (qty <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 20)
            & (qty >= 10)
            & (qty <= 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 30)
            & (qty >= 20)
            & (qty <= 40)
        )
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(24,10)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").cast("bigint").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Pivot — relational cross-tab via groupBy().pivot()
# ---------------------------------------------------------------------------

_PIVOT_SQL = """
    SELECT n_name AS nation,
           CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_f,
           CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS n_o,
           CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS n_p,
           CAST(round(sum(CASE WHEN o_orderstatus = 'F'
                          THEN CAST(o_totalprice AS DECIMAL(19,2))
                          ELSE 0 END), 2) AS DOUBLE) AS rev_f,
           CAST(round(sum(CASE WHEN o_orderstatus = 'O'
                          THEN CAST(o_totalprice AS DECIMAL(19,2))
                          ELSE 0 END), 2) AS DOUBLE) AS rev_o,
           CAST(round(sum(CASE WHEN o_orderstatus = 'P'
                          THEN CAST(o_totalprice AS DECIMAL(19,2))
                          ELSE 0 END), 2) AS DOUBLE) AS rev_p
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
"""


@q("pivot_order_status", _PIVOT_SQL)
def pivot_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-tab (PIVOT): nation rows x order-status columns, carrying
    both a count and a decimal-exact revenue sum per cell — the
    wide-report operator the DataFrame API expresses natively as
    ``groupBy().pivot()``. The pivot values are DECLARED (['F','O','P'])
    rather than discovered, which at scale removes the extra
    distinct-scan Spark otherwise runs to enumerate the pivot domain —
    the unbounded-cardinality footgun of implicit pivots. Absent cells
    surface as 0 (coalesce), matching the oracle's FILTER/CASE
    conditional-aggregation twin exactly; revenue sums run on
    DECIMAL(19,2) so the hash compare is merge-order-proof.

    Plan/scale: customer and nation broadcast; the pivot itself is ONE
    hash aggregate whose row width is groups x (3 statuses x 2 measures)
    — a pivot never shuffles more than the underlying groupBy, it only
    widens the aggregation buffer."""
    o = tbl(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(19,2)").alias("price"),
    )
    c = tbl(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = tbl(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    wide = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("price").alias("rev"),
        )
    )
    z = F.lit(0).cast("long")
    zd = F.lit(0.0)
    return wide.select(
        "nation",
        F.coalesce(F.col("F_n"), z).alias("n_f"),
        F.coalesce(F.col("O_n"), z).alias("n_o"),
        F.coalesce(F.col("P_n"), z).alias("n_p"),
        F.coalesce(F.round(F.col("F_rev"), 2).cast("double"), zd).alias("rev_f"),
        F.coalesce(F.round(F.col("O_rev"), 2).cast("double"), zd).alias("rev_o"),
        F.coalesce(F.round(F.col("P_rev"), 2).cast("double"), zd).alias("rev_p"),
    ).orderBy("nation")


# ---------------------------------------------------------------------------
# TPC-H long tail (adapted) — the corpus has no partsupp table and no
# l_commitdate / l_receiptdate / l_shipmode columns, so the canonical
# predicates are re-expressed over the columns that exist (noted per query).
# With these eight, all 22 TPC-H query *shapes* have a registry entry
# (q1 ≡ pricing_summary).
# ---------------------------------------------------------------------------


@q(
    "q4_order_priority",
    """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking), adapted: the canonical
    late-delivery EXISTS (l_commitdate < l_receiptdate — columns absent)
    becomes "has at least one returned line" (l_returnflag = 'R').

    Plan: the quarter window prunes orders at the scan; the EXISTS is a
    LEFT SEMI hash join on l_orderkey (each order counted once no matter
    how many lines match — never a join-then-distinct); the probe side
    projects a single column so only (l_orderkey) shuffles. At 100 TB
    the semi join is the only exchange besides the 5-group aggregate.
    """
    o = tbl(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    returned = (
        tbl(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(returned, o.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@q(
    "q9_product_type_profit",
    """
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                               - 0.4 * p.p_retailprice * l.l_quantity
                               AS DECIMAL(24,10))), 2) AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit), adapted: with no partsupp table,
    unit cost is proxied as 40% of p_retailprice (the shape — revenue
    minus cost, rolled up by supplier nation x order year over a
    name-matched part slice — is the canonical one).

    Plan: the LIKE filter cuts part before its broadcast; supplier and
    nation broadcast; lineitem joins orders on the natural key — the one
    big shuffle. Profit is computed row-local in double (both engines
    evaluate the identical expression tree) and accumulated exactly in
    DECIMAL so partial-agg merge order can't flip the hash.
    """
    li = tbl(spark, sf_dir, "lineitem")
    p = tbl(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    o = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = tbl(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = tbl(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.4) * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(24,10)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@q(
    "q11_important_parts",
    """
    WITH val AS (
      SELECT l.l_partkey,
             sum(CAST(l.l_extendedprice * l.l_quantity AS DECIMAL(30,10))) AS v
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_9'
      GROUP BY l.l_partkey
    )
    SELECT val.l_partkey,
           CAST(round(val.v, 2) AS DOUBLE) AS part_value
    FROM val, (SELECT sum(v) AS total FROM val) t
    WHERE val.v > t.total * 0.001
    ORDER BY part_value DESC, l_partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification), adapted: part value is
    accumulated from lineitem flow (extendedprice x quantity) for one
    nation's suppliers instead of partsupp stock (table absent). The
    shape is canonical: an aggregate compared against a scalar fraction
    of its own grand total.

    Plan: ONE aggregation produces per-part values; the grand total is a
    1-row re-aggregate of that (cached) result, broadcast back as a
    scalar via crossJoin — the value frame is NOT recomputed (a second
    scan at 100 TB) and nothing resembling a join-per-row exists. The
    nation gate collapses to a broadcast semi filter on the supplier
    dimension before the fact shuffle.
    """
    li = tbl(spark, sf_dir, "lineitem")
    s = tbl(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = tbl(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_9")
    s_in = s.join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi"
    ).select("s_suppkey")
    val = (
        li.join(F.broadcast(s_in), li.l_suppkey == s_in.s_suppkey, "left_semi")
        .groupBy("l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_quantity")).cast(
                    "decimal(30,10)"
                )
            ).alias("v")
        )
    ).localCheckpoint(eager=False)  # one build, two consumers (total+filter)
    total = val.agg(F.sum("v").alias("total"))
    return (
        val.crossJoin(F.broadcast(total))
        .where(F.col("v") > F.col("total") * F.lit(0.001))
        .select(
            "l_partkey",
            F.round(F.col("v"), 2).cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
    )


@q(
    "q12_priority_lines",
    """
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_returnflag = 'R'
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
    """,
)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping-mode priority split), adapted: l_shipmode /
    commit-vs-receipt lateness don't exist in this corpus, so the group
    key is l_linestatus and the "late" gate is l_returnflag = 'R'. The
    canonical double conditional count over a fact-fact join remains.

    Plan: both the year window and the returnflag gate reach the
    lineitem scan as pushed filters BEFORE the orders join; both
    conditional counts accumulate in the same partial->final aggregate
    pass (one scan, one exchange on the 2-value group key after the
    join's key exchange).
    """
    li = tbl(spark, sf_dir, "lineitem").where(
        (F.col("l_returnflag") == "R")
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    o = tbl(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    one = F.lit(1).cast("long")
    zero = F.lit(0).cast("long")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, one).otherwise(zero)).alias("high_line_count"),
            F.sum(F.when(hi, zero).otherwise(one)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@q(
    "q16_supplier_part_counts",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 9, 19, 29, 39, 49)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship), adapted: the
    supplier-exclusion subquery keys on s_acctbal < 0 (no comment column
    to grep for complaints), and the part-supplier link rides lineitem
    (no partsupp). NOT IN + multi-attribute COUNT DISTINCT is canonical.

    Plan: the exclusion list is tiny -> broadcast LEFT ANTI join (the
    NOT-IN; key is never null so the semantics coincide); the filtered
    part slice broadcasts; COUNT DISTINCT goes through Spark's two-phase
    expand (partial distinct per partition, then exact final) — no
    row-level distinct materialization crosses the wire beyond
    (group-key, suppkey) pairs.
    """
    p = tbl(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 19, 29, 39, 49)
    )
    li = tbl(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = tbl(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@q(
    "q2_min_cost_supplier",
    """
    WITH eligible AS (
      SELECT l.l_partkey, l.l_extendedprice,
             s.s_acctbal, s.s_name, n.n_name
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA'
    )
    SELECT DISTINCT e.s_acctbal, e.s_name, e.n_name,
           p.p_partkey, p.p_name,
           e.l_extendedprice
    FROM eligible e
    JOIN (SELECT l_partkey, min(l_extendedprice) AS mn
          FROM eligible GROUP BY l_partkey) m
      ON e.l_partkey = m.l_partkey AND e.l_extendedprice = m.mn
    JOIN part p ON p.p_partkey = e.l_partkey
    WHERE p.p_size = 25
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier), adapted: the part-supplier
    price relation rides lineitem (no partsupp), "cost" is the shipped
    l_extendedprice, and the region scope is ASIA. The canonical
    correlated-min subquery (price = MIN(price) over the same part
    within the region) is the shape under test.

    Plan: the correlated min is a WINDOW min over l_partkey followed by
    a row-local equality filter — one exchange on partkey, no self-join
    back onto the fact (the oracle spells the same thing as join-with-
    groupwise-min). Supplier/nation/region collapse to one broadcast
    enrich before the window; the size-filtered part slice broadcasts
    after it. DISTINCT collapses price-tied duplicate lines of the same
    (supplier, part); the ORDER...LIMIT total-orders on unique keys so
    the top-100 set is deterministic.
    """
    li = tbl(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    r = tbl(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = tbl(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    s = tbl(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_acctbal", "s_name", "n_name")
    p = tbl(spark, sf_dir, "part").where(F.col("p_size") == 25).select(
        "p_partkey", "p_name"
    )
    eligible = li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
    w = W.partitionBy("l_partkey")
    return (
        eligible.withColumn("mn", F.min("l_extendedprice").over(w))
        .where(F.col("l_extendedprice") == F.col("mn"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            "l_extendedprice",
        )
        .distinct()
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@q(
    "q20_potential_promotion",
    """
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_type = 'PROMO'
      GROUP BY l.l_suppkey
      HAVING 6 * sum(CASE WHEN l.l_shipdate >= TIMESTAMP '1996-01-01'
                           AND l.l_shipdate <  TIMESTAMP '1997-01-01'
                          THEN CAST(l.l_quantity AS DECIMAL(24,10))
                          ELSE CAST(0 AS DECIMAL(24,10)) END)
           > sum(CAST(l.l_quantity AS DECIMAL(24,10)))
    )
    ORDER BY s_suppkey
    """,
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion), adapted: availqty > half of
    shipped qty (partsupp absent) becomes "1996 shipped quantity of
    PROMO parts exceeds a sixth of the supplier's all-time shipped
    quantity of those parts" — the same correlated fractional-sum
    HAVING, one level up (the year window is ~1/7 of the corpus's date
    range, so 1/6 is the just-above-uniform gate half was for TPC-H).

    Plan: ONE conditional aggregate per supplier computes both the
    windowed and the all-time sum in a single partial->final pass (the
    canonical nested-subquery form would scan lineitem twice); the
    fractional compare is integerized as 6*window > total in DECIMAL so
    no division and no float boundary exists; the qualifying-supplier
    set then semi-joins supplier (broadcast — it is HAVING-filtered
    tiny). At 100 TB lineitem is scanned exactly once.
    """
    li = tbl(spark, sf_dir, "lineitem")
    p = tbl(spark, sf_dir, "part").where(F.col("p_type") == "PROMO").select(
        "p_partkey"
    )
    s = tbl(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    in_window = (
        F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")
    ) & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    qty = F.col("l_quantity").cast("decimal(24,10)")
    zero = F.lit(0).cast("decimal(24,10)")
    qualified = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.when(in_window, qty).otherwise(zero)).alias("win_qty"),
            F.sum(qty).alias("tot_qty"),
        )
        .where(F.lit(6) * F.col("win_qty") > F.col("tot_qty"))
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(qualified), s.s_suppkey == qualified.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@q(
    "q21_suppliers_kept_waiting",
    """
    WITH fl AS (
      SELECT l.l_orderkey, l.l_suppkey, l.l_returnflag
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
    )
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN fl l1 ON s.s_suppkey = l1.l_suppkey
    WHERE l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM fl l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM fl l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    """,
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), adapted: "failed
    the order" is l_returnflag = 'R' (no receipt/commit dates). A failed
    line counts iff the finished order involved at least one OTHER
    supplier and NO other supplier failed it.

    Plan: the canonical EXISTS + NOT-EXISTS pair would self-join the
    fact table twice (three scans total); here both collapse into two
    per-order WINDOW sets over ONE scan and ONE l_orderkey exchange —
    n_supp = size(collect_set(supplier)), n_fail = size(collect_set(
    supplier WHERE failed)): EXISTS(other supplier) ≡ n_supp >= 2,
    NOT EXISTS(other failed) ≡ n_fail = 1 (the probe row itself is
    failed). The sets are bounded by suppliers-per-order (single
    digits), so the window state never blows up; supplier broadcasts
    for the name.
    """
    o_f = tbl(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    fl = (
        tbl(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_returnflag")
        .join(o_f, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
    )
    w = W.partitionBy("l_orderkey")
    s = tbl(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        fl.withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_fail",
            F.size(
                F.collect_set(
                    F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
                ).over(w)
            ),
        )
        .where(F.col("l_returnflag") == "R")
        .where((F.col("n_supp") >= 2) & (F.col("n_fail") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
    )


@q(
    "array_hof_suite",
    """
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
           round(list_reduce(list_transform(embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                 (a, b) -> a + b), 4) AS norm2,
           round(list_reduce(list_transform(embedding,
                     x -> greatest(CAST(x AS DOUBLE), 0)),
                 (a, b) -> a + b), 4) AS relu_sum,
           CAST(list_sort(embedding)[3] AS DOUBLE) AS third_smallest,
           CAST(len(list_filter(embedding, x -> abs(x) > 0.25)) > 0
                AS INT) AS has_extreme
    FROM embeddings
    ORDER BY vec_id
    """,
)
def array_hof_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding column — the
    lambda-expression surface (transform / filter / aggregate / exists /
    sort_array) a vector-bearing lakehouse needs without ever exploding:
    per-vector positive count, squared L2 norm, ReLU mass, 3rd-smallest
    component, and an any-extreme flag.

    Exactness: folds run element-in-order over doubles in BOTH engines
    (Spark `aggregate` init 0.0 left-fold ≡ DuckDB `list_reduce` left-
    reduce — IEEE-identical because 0.0 + s1 == s1 exactly), so the
    rounded hash can't flip; comparisons are float-exact.

    Plan/scale: one narrow projection pass, zero exchanges except the
    output sort — each lambda compiles to a Catalyst HigherOrderFunction
    evaluated inside the scan's codegen stage, never a posexplode +
    re-aggregate (which would shuffle |vectors|·dim rows: 64× the data
    at dim-64, unbounded at dim-4096)."""
    emb = tbl(spark, sf_dir, "embeddings")
    d = lambda c: c.cast("double")  # noqa: E731
    return emb.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > F.lit(0.0))).alias(
            "n_pos"
        ),
        F.round(
            F.aggregate(
                F.transform("embedding", lambda x: d(x) * d(x)),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
            4,
        ).alias("norm2"),
        F.round(
            F.aggregate(
                F.transform(
                    "embedding", lambda x: F.greatest(d(x), F.lit(0.0))
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
            4,
        ).alias("relu_sum"),
        F.sort_array("embedding").getItem(2).cast("double").alias(
            "third_smallest"
        ),
        F.exists("embedding", lambda x: F.abs(x) > F.lit(0.25))
        .cast("int")
        .alias("has_extreme"),
    ).orderBy("vec_id")
