"""Property test for the SCD2 interval build: for ANY event stream, the
derived intervals must partition each user's timeline — every event's state
is recoverable by looking up the interval containing its timestamp, runs
collapse (no two consecutive intervals share a state), and exactly one
interval per user is open/current."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import bridgedownstream_spark.queries.advanced as adv
import bridgedownstream_spark.queries.util as util

# small state alphabet + minute-granularity times on a 1-day range so
# same-timestamp collisions across users are common (tie-break exercised)
_event = st.tuples(
    st.integers(min_value=1, max_value=3),          # user_id
    st.integers(min_value=0, max_value=300),        # minutes offset
    st.sampled_from(["a", "b", "c"]),               # state
)
_stream = st.lists(_event, min_size=1, max_size=25)


def _run(spark, events):
    rows = [
        (i, datetime(2024, 1, 1) + timedelta(minutes=m), u, s, 1.0, "{}")
        for i, (u, m, s) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    orig = util.tbl
    util.tbl = adv.tbl = lambda spark, sf_dir, name: df
    try:
        return rows, adv.scd2_intervals(spark, "ignored").collect()
    finally:
        util.tbl = adv.tbl = orig


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_stream)
def test_scd2_intervals_partition_each_timeline(spark, events):
    rows, out = _run(spark, events)
    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert set(by_user) == {r[2] for r in rows}
    for u, ivs in by_user.items():
        ivs.sort(key=lambda r: r["valid_from"])
        # chained: each valid_to equals the next valid_from; last is open
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert not a["is_current"]
        assert ivs[-1]["is_current"] and ivs[-1]["valid_to"] is None
        # runs collapsed: consecutive intervals never share a state
        for a, b in zip(ivs, ivs[1:]):
            assert a["state"] != b["state"]
        # every event's state is the interval covering its (ts, event_id)
        # position: replay the stream in (ts, event_id) order and check the
        # interval sequence matches the run-length-encoded state sequence
        seq = [
            s
            for (_, ts, uu, s, _, _) in sorted(rows, key=lambda r: (r[1], r[0]))
            if uu == u
        ]
        rle = [s for i, s in enumerate(seq) if i == 0 or s != seq[i - 1]]
        assert [r["state"] for r in ivs] == rle
