"""Property test: asof_join agrees with pandas merge_asof (an independent
reference implementation of backward as-of semantics) on arbitrary keyed
timestamp data."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bridgedownstream_spark.operators.asof import asof_join

_key = st.sampled_from(["k1", "k2", "k3"])
_ts = st.integers(min_value=0, max_value=30)
_left_rows = st.lists(st.tuples(_key, _ts), min_size=1, max_size=8)
# unique (key, ts) on the right keeps the expected winner unambiguous
# without a tiebreak column
_right_rows = st.lists(
    st.tuples(_key, _ts), min_size=0, max_size=8, unique_by=lambda r: (r[0], r[1])
)


@pytest.fixture(scope="module")
def sparkmod(spark):
    return spark


@given(left=_left_rows, right=_right_rows)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_matches_pandas_merge_asof(sparkmod, left, right):
    spark = sparkmod
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k string, ts long, lid long"
    )
    rvals = [(k, t, k + ":" + str(t)) for k, t in right]
    rdf = spark.createDataFrame(
        rvals or [("__none__", -1, "sentinel")], "k string, ts long, rv string"
    )
    got = {
        r["lid"]: r["asof_rv"]
        for r in asof_join(ldf, rdf, ["k"], "ts", "ts", ["rv"]).collect()
    }

    lp = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], columns=["k", "ts", "lid"]
    ).sort_values("ts", kind="stable")
    rp = pd.DataFrame(
        rvals or [("__none__", -1, "sentinel")], columns=["k", "ts", "rv"]
    ).sort_values("ts", kind="stable")
    merged = pd.merge_asof(
        lp, rp, on="ts", by="k", direction="backward", allow_exact_matches=True
    )
    want = {
        int(r.lid): (None if pd.isna(r.rv) else r.rv)
        for r in merged.itertuples(index=False)
    }
    assert got == want
