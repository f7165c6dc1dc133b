"""Small operator families rounding out SURVEY §2: path/basename extraction
(F7), per-group array limits (O2), batching (O3), SQL-view query surface
(S7), listing-derived keys (S9 shape), and config-cache dedup (A9)."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from bridgedownstream_spark.queries.util import tbl

QUERIES: dict = {}


def q(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = (fn, oracle)
        return fn

    return deco


@q(
    "basename_extract",
    """
    SELECT o_orderkey,
           regexp_extract('s3://bucket/exports/' || o_orderstatus || '/part-'
                          || CAST(o_orderkey AS VARCHAR) || '.ndjson',
                          '([^/]+)$', 1) AS object_name,
           regexp_extract('s3://bucket/exports/' || o_orderstatus || '/part-'
                          || CAST(o_orderkey AS VARCHAR) || '.ndjson',
                          '([^/]+)\\.[^.]+$', 1) AS record_stem
    FROM orders WHERE o_orderkey % 100 = 0
    """,
)
def basename_extract(spark, sf_dir):
    # F7: basename/path splitting of object keys — the reference derives
    # recordIds from listing keys with k.split('/')[-1].split('.')[0]
    # (etl-408/etl_408.py:58, archive_dataset.py:104). Same regexes the
    # ledger/listing path uses on input_file_name().
    o = tbl(spark, sf_dir, "orders").where(F.col("o_orderkey") % 100 == 0)
    path = F.concat(
        F.lit("s3://bucket/exports/"),
        "o_orderstatus",
        F.lit("/part-"),
        F.col("o_orderkey").cast("string"),
        F.lit(".ndjson"),
    )
    return o.select(
        "o_orderkey",
        F.regexp_extract(path, r"([^/]+)$", 1).alias("object_name"),
        F.regexp_extract(path, r"([^/]+)\.[^.]+$", 1).alias("record_stem"),
    )


@q(
    "array_slice_limit",
    """
    SELECT l_orderkey,
           CAST(len(list_sort(list(round(l_quantity, 2)))) AS INT) AS n_items,
           array_to_string(
               list_transform(
                   (list_sort(list(round(l_quantity, 2))))[1:3],
                   x -> CAST(CAST(x AS DECIMAL(12,2)) AS VARCHAR)),
               ',') AS first3
    FROM lineitem GROUP BY l_orderkey
    """,
)
def array_slice_limit(spark, sf_dir):
    # O2: per-group limit applied on an array column — the reference
    # truncates validation-error lists to 10 per file
    # (s3_to_json_s3.py:814-818); same slice() the quarantine sink uses.
    # The slice is serialized to a CSV string (fixed 2-dp decimal render on
    # both engines): array-typed output columns crash the driver's pandas
    # canonicalizer (r2 `unhashable type: 'list'`), and a manifest string
    # is what the reference writes anyway.
    li = tbl(spark, sf_dir, "lineitem")
    arr = F.sort_array(F.collect_list(F.round("l_quantity", 2)))
    first3 = F.concat_ws(
        ",",
        F.transform(
            F.slice(arr, 1, 3), lambda x: x.cast("decimal(12,2)").cast("string")
        ),
    )
    return li.groupBy("l_orderkey").agg(
        F.size(arr).alias("n_items"), first3.alias("first3")
    )


@q(
    "batched_submit",
    """
    SELECT user_id,
           CAST(floor((row_number() OVER (ORDER BY user_id) - 1) / 100) AS BIGINT)
               AS batch_id
    FROM (SELECT DISTINCT user_id FROM events)
    """,
)
def batched_submit(spark, sf_dir):
    # O3: chunked submission — the reference splits backlog ids into
    # batches of 100 per workflow run (bootstrap_trigger.py:163-166), via
    # the library operator. The global row_number is single-partition by
    # design: batching output is manifest-scale (ids to submit), not
    # data-scale, exactly like the reference's driver-side list slicing.
    from bridgedownstream_spark.operators import reconcile

    ids = tbl(spark, sf_dir, "events").select("user_id").distinct()
    return reconcile.assign_batches(ids, "user_id", batch_size=100).select(
        "user_id", "batch_id"
    )


@q(
    "sql_view_query",
    """
    SELECT event_id, user_id, event_type, round(value, 2) AS value
    FROM events
    WHERE event_type IN ('purchase', 'signup') AND value > 50
    """,
)
def sql_view_query(spark, sf_dir):
    # S7: the SQL-string query surface — the reference ships SQL to a file
    # view (`select * from {source_table} where …`,
    # bootstrap_trigger.py:98-118). Tables are registered as temp views and
    # the query text goes through spark.sql, exercising the same entry
    # point a reference user would migrate their query strings to.
    tbl(spark, sf_dir, "events").createOrReplaceTempView("events_view")
    return spark.sql(
        """
        SELECT event_id, user_id, event_type, round(value, 2) AS value
        FROM events_view
        WHERE event_type IN ('purchase', 'signup') AND value > 50
        """
    )


@q(
    "count_reconciliation_report",
    """
    WITH src AS (
        SELECT event_type AS grp, count(DISTINCT event_id) AS n_source
        FROM events GROUP BY 1
    ), lake AS (
        SELECT event_type AS grp, count(event_id) AS n_lake,
               count(DISTINCT event_id) AS n_lake_distinct
        FROM events WHERE event_id % 3 <> 0 GROUP BY 1
    )
    SELECT coalesce(s.grp, l.grp) AS grp,
           coalesce(n_source, 0) AS n_source,
           coalesce(n_lake, 0) AS n_lake,
           coalesce(n_lake_distinct, 0) AS n_lake_distinct,
           coalesce(n_source, 0) - coalesce(n_lake_distinct, 0) AS delta
    FROM src s FULL OUTER JOIN lake l ON s.grp = l.grp
    """,
)
def count_reconciliation_report(spark, sf_dir):
    # A5 reconciliation report via the library operator (reference
    # etl-245/main.py:29-63): source-of-truth counts vs a (simulated
    # partially-ingested) lake, per dataset group.
    from bridgedownstream_spark.operators import reconcile

    ev = tbl(spark, sf_dir, "events")
    lake = ev.where(F.col("event_id") % 3 != 0)
    return reconcile.count_reconciliation(ev, lake, "event_id", "event_id", "event_type")


@q(
    "skew_salted_agg",
    """
    WITH partial AS (
        SELECT event_type, event_id % 8 AS salt,
               sum(CAST(value AS DECIMAL(24,10))) AS s, count(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(round(sum(s), 2) AS DOUBLE) AS total_value,
           CAST(sum(n) AS BIGINT) AS n_events
    FROM partial GROUP BY 1
    """,
)
def skew_salted_agg(spark, sf_dir):
    # Skew mitigation as an explicit two-phase aggregate: salt the hot key
    # (8-way), partially aggregate per (key, salt), then merge. At 100 TB a
    # single dominant key would bottleneck one reducer; the salted phase
    # spreads it across 8, and the merge handles 8 tiny rows per key.
    # (AQE skew-join handles the join case automatically — session.py —
    # this is the groupBy-side technique.) The two-phase result is exactly
    # the plain group's, which the oracle computes the same salted way.
    # Sums run on DECIMAL so the merge is exact regardless of partial-agg
    # arrival order — float summation order is nondeterministic across runs
    # and broke the r2 driver hash despite rows/schema matching.
    ev = tbl(spark, sf_dir, "events")
    partial = ev.groupBy("event_type", (F.col("event_id") % 8).alias("salt")).agg(
        F.sum(F.col("value").cast("decimal(24,10)")).alias("s"),
        F.count("*").alias("n"),
    )
    return partial.groupBy("event_type").agg(
        F.round(F.sum("s"), 2).cast("double").alias("total_value"),
        F.sum("n").alias("n_events"),
    )


@q(
    "config_cache_dedup",
    """
    SELECT lang, source, min(doc_id) AS first_doc, count(*) AS n_docs
    FROM documents GROUP BY lang, source
    """,
)
def config_cache_dedup(spark, sf_dir):
    # A9: schema-cache dedup — the reference accumulates distinct JSON
    # Schemas by $id while streaming records (s3_to_json_s3.py:168-176).
    # Same shape: first occurrence per config key, plus how many records
    # shared it (deterministic min instead of dropDuplicates' arbitrary
    # row, so the result is oracle-checkable).
    d = tbl(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.min("doc_id").alias("first_doc"), F.count("*").alias("n_docs")
    )


_PROFILE_COLS = (
    ("c_custkey", "BIGINT"),
    ("c_name", "VARCHAR"),
    ("c_nationkey", "BIGINT"),
    ("c_acctbal", "DOUBLE"),
    ("c_mktsegment", "VARCHAR"),
)


@q(
    "column_profile",
    "SELECT * FROM ("
    + " UNION ALL ".join(
        f"""
        SELECT '{c}' AS col_name, count(*) AS n_rows,
               count(*) - count({c}) AS n_nulls,
               count(DISTINCT {c}) AS n_distinct,
               CAST(min({c}) AS VARCHAR) AS min_str,
               CAST(max({c}) AS VARCHAR) AS max_str
        FROM customer
        """
        for c, _t in _PROFILE_COLS
    )
    + ") ORDER BY col_name",
)
def column_profile(spark, sf_dir):
    """Per-column data-quality profile: null counts, exact distinct
    cardinality, min/max — the table-health report a declared-schema lake
    runs after every load (the reference's crawler + manual count
    reconciliation, SURVEY §3.3, folded into one operator).

    ONE scan, one shuffle: per-column stats are computed as grouping-set
    style parallel aggregates over a single pass, not N per-column jobs —
    at 100 TB the difference between one table read and five. Exact
    count-distinct shuffles each column's values once; swap in the HLL
    sketch variant (sketch_cardinality) when estimates suffice.
    """
    return _profile_frame(tbl(spark, sf_dir, "customer")).orderBy("col_name")


def _profile_frame(d):
    """(col_name, n_rows, n_nulls, n_distinct, min_str, max_str) over
    :data:`_PROFILE_COLS` — one scan, parallel aggregates, then the wide
    row explodes into the long report shape."""
    aggs = []
    for name, _t in _PROFILE_COLS:
        aggs += [
            (F.count("*") - F.count(name)).alias(f"{name}__nulls"),
            F.countDistinct(name).alias(f"{name}__distinct"),
            F.min(name).cast("string").alias(f"{name}__min"),
            F.max(name).cast("string").alias(f"{name}__max"),
        ]
    wide = d.agg(F.count("*").alias("n_rows"), *aggs)
    rows = []
    for name, _t in _PROFILE_COLS:
        rows.append(
            F.struct(
                F.lit(name).alias("col_name"),
                F.col("n_rows").cast("bigint").alias("n_rows"),
                F.col(f"{name}__nulls").cast("bigint").alias("n_nulls"),
                F.col(f"{name}__distinct").cast("bigint").alias("n_distinct"),
                F.col(f"{name}__min").alias("min_str"),
                F.col(f"{name}__max").alias("max_str"),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


@q(
    "csv_export_roundtrip",
    """
    SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
           n_name || ', "' || CAST(n_nationkey AS VARCHAR) || '", ' AS note,
           CAST(n_regionkey AS VARCHAR) AS n_regionkey
    FROM nation
    """,
)
def csv_export_roundtrip(spark, sf_dir):
    # The consumer-facing export half of "exporting Bridge data to
    # Parquet/CSV" (reference README.md:3), certified end-to-end: nation
    # written as region-partitioned CSV, read back through the declared
    # schema, compared against the source table. The synthesized note
    # column carries commas, quotes, and a trailing separator — a pass
    # proves RFC-4180 quoting/escaping survives the round trip. Partition
    # values come back as catalog-typed strings (the engine-wide
    # partition contract), hence the oracle's CAST.
    import os
    import tempfile

    from pyspark.sql import types as T

    from bridgedownstream_spark.sources.csv_export import (
        read_csv_dataset,
        write_csv_dataset,
    )

    base = os.path.join(
        tempfile.gettempdir(),
        # PID-suffixed: concurrent processes at the same sf must not race
        # on each other's files (a lazily-read DataFrame scans at action
        # time); PID keeps the dir stable within a process so repeated
        # builds overwrite rather than accumulate.
        f"bds_csv_{os.path.basename(sf_dir.rstrip('/')) or 'sf'}_{os.getpid()}",
    )
    nation = tbl(spark, sf_dir, "nation").select(
        "n_nationkey",
        "n_name",
        F.expr(
            "n_name || ', \"' || CAST(n_nationkey AS STRING) || '\", '"
        ).alias("note"),
        "n_regionkey",
    )
    path = write_csv_dataset(
        nation,
        base,
        "nation",
        partition_cols=["n_regionkey"],
        mode="overwrite",
    )
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.LongType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("note", T.StringType()),
            T.StructField("n_regionkey", T.StringType()),
        ]
    )
    return read_csv_dataset(spark, path, schema)


@q(
    "orc_export_roundtrip",
    """
    SELECT s_suppkey, s_name, s_acctbal,
           CAST(s_nationkey AS VARCHAR) AS s_nationkey
    FROM supplier
    """,
)
def orc_export_roundtrip(spark, sf_dir):
    # The third columnar consumer surface after Parquet and CSV: supplier
    # written as a nation-partitioned ORC dataset, read back through the
    # declared schema, compared against the source table — certifies
    # Spark's native ORC sink/source end-to-end (double columns must
    # round-trip bit-exact; partition values come back as catalog-typed
    # strings, the engine-wide partition contract, hence the oracle CAST).
    import os
    import tempfile

    from pyspark.sql import types as T

    base = os.path.join(
        tempfile.gettempdir(),
        f"bds_orc_{os.path.basename(sf_dir.rstrip('/')) or 'sf'}",
    )
    supplier = tbl(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    path = os.path.join(base, "supplier")
    supplier.write.mode("overwrite").partitionBy("s_nationkey").orc(path)
    schema = T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_acctbal", T.DoubleType()),
            T.StructField("s_nationkey", T.StringType()),
        ]
    )
    return spark.read.schema(schema).orc(path)


def _profile_sql(source: str) -> str:
    return (
        "("
        + " UNION ALL ".join(
            f"""
            SELECT '{c}' AS col_name, count(*) AS n_rows,
                   count(*) - count({c}) AS n_nulls,
                   count(DISTINCT {c}) AS n_distinct,
                   CAST(min({c}) AS VARCHAR) AS min_str,
                   CAST(max({c}) AS VARCHAR) AS max_str
            FROM {source}
            """
            for c, _t in _PROFILE_COLS
        )
        + ")"
    )


@q(
    "profile_drift",
    f"""
    WITH cur AS (SELECT * FROM {_profile_sql("customer")}),
    prev AS (SELECT * FROM {_profile_sql(
        "(SELECT * FROM customer WHERE c_custkey % 10 <> 0)")})
    SELECT c.col_name,
           c.n_rows AS n_rows_cur,
           p.n_rows AS n_rows_prev,
           c.n_rows - p.n_rows AS rows_added,
           round(c.n_nulls::DOUBLE / c.n_rows
                 - p.n_nulls::DOUBLE / p.n_rows, 6) AS null_rate_delta,
           c.n_distinct - p.n_distinct AS distinct_delta,
           (c.min_str <> p.min_str OR c.max_str <> p.max_str) AS minmax_changed
    FROM cur c JOIN prev p ON c.col_name = p.col_name
    ORDER BY c.col_name
    """,
)
def profile_drift(spark, sf_dir):
    """Snapshot-over-snapshot stats drift: profile the current table and
    the previous load (here a deterministic 90% subset standing in for
    yesterday's snapshot), join per column, and report row growth,
    null-rate movement, cardinality change, and min/max boundary shifts —
    the report that catches a bad upstream export before queries do.

    Scale shape (r9): the previous snapshot is a deterministic SUBSET of
    the current scan, so both profiles fold into ONE pass — every prev
    statistic is the cur aggregate gated on the subset predicate
    (count/min/max over ``CASE WHEN prev THEN col END``; distincts share
    one Expand). One scan, one aggregate chain, and the per-column
    deltas compute on the single wide row — the broadcast join between
    the two reports disappears. At 100 TB the previous profile is read
    from the last run's persisted report rather than recomputed, making
    drift detection O(one scan) per load either way; this removes the
    second scan the simulation was paying."""
    prev_cond = F.col("c_custkey") % 10 != 0
    tagged = tbl(spark, sf_dir, "customer").select(
        *[name for name, _t in _PROFILE_COLS],
        F.explode(
            F.when(prev_cond, F.array(F.lit("cur"), F.lit("prev"))).otherwise(
                F.array(F.lit("cur"))
            )
        ).alias("snap"),
    )
    aggs = [F.count("*").cast("bigint").alias("n_rows")]
    for name, _t in _PROFILE_COLS:
        aggs += [
            (F.count("*") - F.count(name)).cast("bigint").alias(f"{name}__n"),
            F.countDistinct(name).cast("bigint").alias(f"{name}__d"),
            F.min(name).cast("string").alias(f"{name}__min"),
            F.max(name).cast("string").alias(f"{name}__max"),
        ]
    # 2-row checkpoint: cur/prev both slice this frame — without it the
    # scan+aggregate would run once per slice
    wide = tagged.groupBy("snap").agg(*aggs).localCheckpoint(eager=False)
    cur = wide.where(F.col("snap") == "cur").drop("snap")
    prev = wide.where(F.col("snap") == "prev").drop("snap")
    prev = prev.select(
        *[F.col(c).alias(f"p_{c}") for c in prev.columns]
    )
    joined = cur.crossJoin(F.broadcast(prev))
    rows = []
    for name, _t in _PROFILE_COLS:
        # raw here; the stabilizing round(…,6) wraps the OUTPUT alias in
        # the final projection so the float-guard sees it on the column
        null_rate_delta = (
            F.col(f"{name}__n").cast("double") / F.col("n_rows")
            - F.col(f"p_{name}__n").cast("double") / F.col("p_n_rows")
        )
        rows.append(
            F.struct(
                F.lit(name).alias("col_name"),
                F.col("n_rows").alias("n_rows_cur"),
                F.col("p_n_rows").alias("n_rows_prev"),
                (F.col("n_rows") - F.col("p_n_rows")).alias("rows_added"),
                null_rate_delta.alias("null_rate_delta"),
                (F.col(f"{name}__d") - F.col(f"p_{name}__d")).alias(
                    "distinct_delta"
                ),
                (
                    (F.col(f"{name}__min") != F.col(f"p_{name}__min"))
                    | (F.col(f"{name}__max") != F.col(f"p_{name}__max"))
                ).alias("minmax_changed"),
            )
        )
    return (
        joined.select(F.explode(F.array(*rows)).alias("p"))
        .select(
            "p.col_name",
            "p.n_rows_cur",
            "p.n_rows_prev",
            "p.rows_added",
            F.round("p.null_rate_delta", 6).alias("null_rate_delta"),
            "p.distinct_delta",
            "p.minmax_changed",
        )
        .orderBy("col_name")
    )


@q(
    "dq_constraint_report",
    """
    WITH m AS (
      SELECT count(*) AS n,
             count(o_custkey) AS nn_cust,
             count(DISTINCT o_orderkey) AS d_ok,
             min(o_totalprice) AS min_tp,
             sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END)
                 AS in_set
      FROM orders
    ),
    ri AS (
      -- NULL foreign keys are a completeness violation, not a referential
      -- one: exclude them so each constraint flags exactly its own defect
      SELECT count(*) AS orphans
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL
    )
    SELECT 'completeness:o_custkey' AS constraint_id,
           round(CAST(nn_cust AS DOUBLE) / n, 6) AS metric,
           nn_cust = n AS passed FROM m
    UNION ALL
    SELECT 'uniqueness:o_orderkey', round(CAST(d_ok AS DOUBLE) / n, 6),
           d_ok = n FROM m
    UNION ALL
    SELECT 'min_range:o_totalprice>0', round(min_tp, 2), min_tp > 0 FROM m
    UNION ALL
    SELECT 'membership:o_orderstatus', round(CAST(in_set AS DOUBLE) / n, 6),
           in_set = n FROM m
    UNION ALL
    SELECT 'referential:o_custkey->customer', CAST(orphans AS DOUBLE),
           orphans = 0 FROM ri
    """,
)
def dq_constraint_report(spark, sf_dir):
    """Declarative data-quality constraint report (Deequ-style): one pass
    computes completeness, uniqueness, range, and set-membership metrics
    over orders, plus a referential-integrity probe against customer; each
    constraint emits (id, metric, passed). The pre-publish validation gate
    a lake pipeline runs on every batch.

    Scale shape: the four column constraints share ONE scan/aggregate
    (count/count-distinct/min/conditional-sum fuse into a single partial
    agg); referential integrity is one anti-join keyed on the foreign key.
    Metrics are ratios of exact counts (plus one min passthrough), so the
    report is bit-deterministic at any parallelism.
    """
    o = tbl(spark, sf_dir, "orders")
    c = tbl(spark, sf_dir, "customer")
    m = o.agg(
        F.count("*").alias("n"),
        F.count("o_custkey").alias("nn_cust"),
        F.countDistinct("o_orderkey").alias("d_ok"),
        F.min("o_totalprice").alias("min_tp"),
        F.sum(F.col("o_orderstatus").isin("O", "F", "P").cast("bigint")).alias(
            "in_set"
        ),
    )
    # NULL FKs are completeness's defect, not referential's — exclude them
    orphans = (
        o.select("o_custkey")
        .where(F.col("o_custkey").isNotNull())
        .join(c.select("c_custkey"), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count("*").alias("orphans"))
    )
    ratio = lambda a, b: F.round(F.col(a).cast("double") / F.col(b), 6)  # noqa: E731
    rows = [
        m.select(
            F.lit("completeness:o_custkey").alias("constraint_id"),
            ratio("nn_cust", "n").alias("metric"),
            (F.col("nn_cust") == F.col("n")).alias("passed"),
        ),
        m.select(
            F.lit("uniqueness:o_orderkey").alias("constraint_id"),
            ratio("d_ok", "n").alias("metric"),
            (F.col("d_ok") == F.col("n")).alias("passed"),
        ),
        m.select(
            F.lit("min_range:o_totalprice>0").alias("constraint_id"),
            F.round("min_tp", 2).alias("metric"),
            (F.col("min_tp") > 0).alias("passed"),
        ),
        m.select(
            F.lit("membership:o_orderstatus").alias("constraint_id"),
            ratio("in_set", "n").alias("metric"),
            (F.col("in_set") == F.col("n")).alias("passed"),
        ),
        orphans.select(
            F.lit("referential:o_custkey->customer").alias("constraint_id"),
            F.col("orphans").cast("double").alias("metric"),
            (F.col("orphans") == 0).alias("passed"),
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


@q(
    "hot_key_report",
    """
    WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
    t AS (SELECT sum(n) AS total, count(*) AS n_keys, max(n) AS max_n FROM c)
    SELECT CAST(row_number() OVER (ORDER BY c.n DESC, c.user_id) AS INT) AS rank,
           c.user_id,
           CAST(c.n AS INT) AS n,
           CAST((10000 * c.n) // t.total AS INT) AS share_bp,
           round(CAST(t.max_n AS DOUBLE) * t.n_keys / t.total, 4)
               AS skew_factor
    FROM c CROSS JOIN t
    ORDER BY c.n DESC, c.user_id
    LIMIT 10
    """,
)
def hot_key_report(spark, sf_dir):
    """Shuffle-skew diagnostic: the 10 hottest grouping keys with their
    row share (basis points) and the distribution's skew factor
    (max/mean ratio — 1.0 is uniform; >>1 means one reducer drags the
    stage). This is the "measure before you salt" companion to
    skew_salted_agg and operators/skew.py: run it on a candidate shuffle
    key, and salt only when the factor says so.

    Plan: one partial-agg count per key, a REAL TakeOrdered top-10 cut
    BEFORE any window (ranking millions of per-key counts through a
    global row_number would funnel them into one task — the exact
    bottleneck this report diagnoses), then a 1-row global total
    broadcast onto the 10 surviving rows for the share/rank columns.
    Nothing wider than (key, count) ever shuffles.
    """
    e = tbl(spark, sf_dir, "events")
    c = e.groupBy("user_id").agg(F.count("*").alias("n"))
    t = c.agg(
        F.sum("n").alias("total"),
        F.count("*").alias("n_keys"),
        F.max("n").alias("max_n"),
    )
    top10 = c.orderBy(F.desc("n"), F.asc("user_id")).limit(10)
    return (
        top10.crossJoin(F.broadcast(t))
        .select(
            # window over exactly the 10 surviving rows — bounded by LIMIT
            F.row_number()
            .over(W.orderBy(F.desc("n"), F.asc("user_id")))
            .cast("int")
            .alias("rank"),
            "user_id",
            F.col("n").cast("int").alias("n"),
            F.expr("CAST((10000 * n) div total AS INT)").alias("share_bp"),
            F.round(
                F.col("max_n").cast("double") * F.col("n_keys") / F.col("total"),
                4,
            ).alias("skew_factor"),
        )
        .orderBy("rank")
    )


@q(
    "adaptive_skew_join",
    """
    WITH f AS (
      SELECT event_id,
             CASE WHEN event_id % 4 = 0 THEN 'burst'
                  ELSE 'u' || CAST(user_id AS VARCHAR) END AS k
      FROM events
    ),
    d AS (SELECT k, min(event_id) AS first_seen, count(*) AS n_k
          FROM f GROUP BY 1),
    t AS (SELECT sum(n_k) AS total FROM d)
    SELECT f.event_id, f.k, d.first_seen,
           (10000 * d.n_k) >= (1000 * t.total) AS took_salted_path
    FROM f JOIN d USING (k) CROSS JOIN t
    """,
)
def adaptive_skew_join(spark, sf_dir):
    """Diagnose-then-salt as ONE operator (operators/skew.py::
    adaptive_salted_join — VERDICT r3 #8): a fact table where one key
    ('burst', 25% of rows) dwarfs a long tail of per-user keys joins a
    per-key dim. Keys over 1000 bp are detected by hot_join_keys and
    routed through the salted join (dim rows replicated salt×, fact rows
    spread by hash); the cold tail takes the plain hash join; the union
    is provably identical to the unsalted join — which is exactly what
    the oracle computes, plus the hot/cold routing decision itself
    (took_salted_path), recomputed in SQL from the share threshold."""
    from bridgedownstream_spark.operators.skew import adaptive_salted_join

    ev = tbl(spark, sf_dir, "events")
    fact = ev.select(
        "event_id",
        F.when(F.col("event_id") % 4 == 0, F.lit("burst"))
        .otherwise(F.concat(F.lit("u"), F.col("user_id").cast("string")))
        .alias("k"),
    )
    dim = fact.groupBy("k").agg(F.min("event_id").alias("first_seen"))
    return adaptive_salted_join(
        fact,
        dim,
        on=["k"],
        salt=8,
        min_share_bp=1000,
        tag_col="took_salted_path",
    )


@q(
    "fixed_width_roundtrip",
    """
    SELECT s_suppkey, s_name, CAST(s_nationkey AS BIGINT) AS s_nationkey,
           CAST(round(s_acctbal * 100) AS BIGINT) AS acctbal_cents
    FROM supplier
    """,
)
def fixed_width_roundtrip(spark, sf_dir):
    """Fixed-width text round trip — the mainframe/SAS-feed sibling of
    csv_export_roundtrip: supplier exported as constant-width lines
    (zero-padded keys, space-padded names, sign+digits account balance in
    integer CENTS — no float ever touches the wire) and read back through
    the declared field spec. The oracle states the lossless contract
    directly from the source table, so a padding, slicing, or sign bug
    anywhere in sources/fixed_width.py breaks the hash.

    Both directions are pure whole-stage-codegen projections (concat/
    lpad/rpad out, substring/trim/cast back): zero shuffles, and the text
    files split by line at any scale. Overflow raises at write time
    rather than truncating (pytest pins this)."""
    import os
    import tempfile

    from bridgedownstream_spark.sources.fixed_width import (
        read_fixed_width,
        write_fixed_width,
    )

    spec = [
        ("s_suppkey", 8, "int"),
        ("s_name", 20, "str"),
        ("s_nationkey", 4, "int"),
        ("acctbal_cents", 12, "sint"),
    ]
    base = os.path.join(
        tempfile.gettempdir(),
        # PID-suffixed for the same concurrent-process-race reason as the
        # CSV round trip above.
        f"bds_fw_{os.path.basename(sf_dir.rstrip('/')) or 'sf'}_{os.getpid()}",
    )
    sup = tbl(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_name",
        F.col("s_nationkey").cast("bigint").alias("s_nationkey"),
        F.round(F.col("s_acctbal") * 100)
        .cast("bigint")
        .alias("acctbal_cents"),
    )
    write_fixed_width(sup, base, spec)
    return read_fixed_width(spark, base, spec)
