"""Property tests: adaptive_salted_join is extensionally identical to the
plain join on arbitrary keyed data (any skew profile, any threshold), and
the sweep-line peak concurrency agrees with a brute-force point-in-interval
count on arbitrary interval sets."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_key = st.sampled_from(["hot", "warm", "c1", "c2", "c3"])
_fact_rows = st.lists(st.tuples(_key, st.integers(0, 99)), min_size=1, max_size=40)
_dim_keys = st.lists(_key, min_size=0, max_size=5, unique=True)
_bp = st.sampled_from([0, 500, 2000, 10000])


@pytest.fixture(scope="module")
def sparkmod(spark):
    return spark


@given(fact=_fact_rows, dim=_dim_keys, bp=_bp, how=st.sampled_from(["inner", "left"]))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_adaptive_join_extensionally_plain(sparkmod, fact, dim, bp, how):
    from bridgedownstream_spark.operators.skew import adaptive_salted_join

    spark = sparkmod
    f = spark.createDataFrame(fact, "k string, v int")
    d = spark.createDataFrame(
        [(k, f"L{k}") for k in dim] or [("__none__", "x")], "k string, label string"
    )
    plain = sorted(map(tuple, f.join(d, ["k"], how).collect()))
    adaptive = sorted(
        map(
            tuple,
            adaptive_salted_join(f, d, ["k"], salt=3, min_share_bp=bp, how=how)
            .select("k", "v", "label")
            .collect(),
        )
    )
    # column order normalization: plain join emits (k, v, label) too
    assert adaptive == plain


_iv_rows = st.lists(
    st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 50)),
    min_size=1,
    max_size=25,
)


@given(rows=_iv_rows)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_sweep_peak_matches_bruteforce(sparkmod, rows):
    """Each (type, t) opens [t, t+5); the sweep's per-type max must equal
    the brute-force max over all start points of intervals covering them
    (the peak of a union of half-open intervals is attained at a start)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    spark = sparkmod
    span = 5
    df = spark.createDataFrame(rows, "typ string, t long")
    deltas = df.select(
        "typ",
        F.explode(
            F.expr(f"array(struct(t AS p, 1 AS delta), struct(t + {span} AS p, -1 AS delta))")
        ).alias("e"),
    ).select("typ", "e.p", "e.delta")
    w = (
        W.partitionBy("typ")
        .orderBy("p", "delta")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    got = {
        r["typ"]: r["peak"]
        for r in deltas.select("typ", F.sum("delta").over(w).alias("live"))
        .groupBy("typ")
        .agg(F.max("live").alias("peak"))
        .collect()
    }
    by_type: dict[str, list[int]] = {}
    for typ, t in rows:
        by_type.setdefault(typ, []).append(t)
    for typ, starts in by_type.items():
        brute = max(
            sum(1 for s in starts if s <= p < s + span) for p in starts
        )
        assert got[typ] == brute, (typ, sorted(starts))
