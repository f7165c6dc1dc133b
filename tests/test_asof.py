"""asof_join operator: <= boundary semantics, null for no-predecessor,
multi-key grouping, and the column-clash guard."""

from __future__ import annotations

import pytest

from bridgedownstream_spark.operators.asof import asof_join


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [("u1", 10, "p1"), ("u1", 20, "p2"), ("u1", 5, "p0"), ("u2", 10, "p3")],
        "k string, ts int, pid string",
    )
    right = spark.createDataFrame(
        [("u1", 10, "c1"), ("u1", 15, "c2"), ("u2", 99, "c3")],
        "k string, ts int, cid string",
    )
    out = {
        r["pid"]: r["asof_cid"]
        for r in asof_join(left, right, ["k"], "ts", "ts", ["cid"]).collect()
    }
    assert out == {
        "p0": None,   # no click at/before ts=5
        "p1": "c1",   # boundary tie: right AT left ts matches (<=)
        "p2": "c2",   # most recent of {c1, c2}
        "p3": None,   # u2's only click is later
    }


def test_asof_clash_guard(spark):
    df = spark.createDataFrame([("a", 1, "x")], "k string, ts int, v string")
    with pytest.raises(ValueError, match="collide"):
        asof_join(df, df, ["k"], "ts", "ts", ["v"], prefix="")


def test_asof_null_value_column_carries_whole_row(spark):
    """The match is the latest right ROW, even when that row holds NULLs:
    per-column last(ignorenulls) would skip the NULL and splice in an
    older row's value — a mixed row no right record ever contained."""
    left = spark.createDataFrame([("u1", 30, "p1")], "k string, ts int, pid string")
    right = spark.createDataFrame(
        [("u1", 1, 5, 7), ("u1", 2, None, 9)],
        "k string, ts int, a int, b int",
    )
    row = asof_join(left, right, ["k"], "ts", "ts", ["a", "b"]).collect()[0]
    # latest right row is (ts=2, a=NULL, b=9) — a must be NULL, not 5
    assert row["asof_a"] is None
    assert row["asof_b"] == 9
