"""Stream-stream interval join — watermarked two-sided event correlation.

The reference correlates its two stages asynchronously: stage-1 output is
reconciled against stage-2 output by hourly batch anti-joins
(SURVEY §3.3). Streaming-native, the same correlation is a **stream-stream
inner join with watermarks on both sides and a time-range predicate**:
each side buffers only the rows inside its watermark horizon, the state
store evicts rows once the interval condition can no longer match, and the
join emits exactly-once per matched pair. This is Spark's canonical
impression⋈click shape, applied to record⋈confirmation correlation.

State sizing at 100 TB: per-side state = (rows/sec × interval window), not
history — the watermark bound is what makes an unbounded join feasible.
Both sides shuffle on the join key once; the time predicate is evaluated
inside the joined state store, never as a post-filter over a cartesian.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "interval_join_streams",
    "interval_left_join_streams",
    "interval_full_join_streams",
]


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance: str = "10 minutes",
    watermark: str = "10 minutes",
    right_prefix: str = "r_",
) -> DataFrame:
    """Join two streams on ``key`` where the right event lands within
    ``[left_ts, left_ts + tolerance]``.

    Right-side columns are prefixed to keep the output unambiguous. Both
    sides carry a watermark so the state store can discard expired rows;
    without one, Spark (correctly) refuses the stream-stream inner join
    as unbounded.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    rw = rw.select([F.col(c).alias(f"{right_prefix}{c}") for c in rw.columns])
    rkey, rts = f"{right_prefix}{key}", f"{right_prefix}{right_ts}"
    cond = (
        (F.col(key) == F.col(rkey))
        & (F.col(rts) >= F.col(left_ts))
        & (F.col(rts) <= F.col(left_ts) + F.expr(f"INTERVAL {tolerance}"))
    )
    return lw.join(rw, cond, "inner").drop(rkey)


def interval_left_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance: str = "10 minutes",
    watermark: str = "10 minutes",
    right_prefix: str = "r_",
) -> DataFrame:
    """LEFT OUTER sibling of :func:`interval_join_streams`: every left
    row emits exactly once — joined rows as matches arrive, unmatched
    rows with NULL right columns once the WATERMARK proves no partner
    can still arrive (state for a left row is releasable only when the
    global watermark passes ``left_ts + tolerance``). This is the
    correlation shape where absence is data: records whose confirmation
    never landed, impressions that never clicked.

    Unlike the inner join (where an oversized watermark merely buffers
    more), the outer side NEEDS watermark progress to emit at all — a
    finite availableNow drain must end with batches that advance event
    time past every real row's expiry, or the unmatched tail stays in
    state forever (the sentinel-batch protocol of the e2e fixture).
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    rw = rw.select([F.col(c).alias(f"{right_prefix}{c}") for c in rw.columns])
    rkey, rts = f"{right_prefix}{key}", f"{right_prefix}{right_ts}"
    cond = (
        (F.col(key) == F.col(rkey))
        & (F.col(rts) >= F.col(left_ts))
        & (F.col(rts) <= F.col(left_ts) + F.expr(f"INTERVAL {tolerance}"))
    )
    return lw.join(rw, cond, "leftOuter").drop(rkey)


def interval_full_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance: str = "10 minutes",
    watermark: str = "10 minutes",
    right_prefix: str = "r_",
) -> DataFrame:
    """FULL OUTER sibling: every row of BOTH streams emits exactly once —
    matched pairs as they meet in state, unmatched rows from either side
    with NULL partner columns once the watermark proves no partner can
    still arrive. Completes the interval-join matrix (inner / left /
    full): the reconciliation shape where BOTH absences are data —
    records without confirmations AND confirmations without records
    (the reference's two anti-join directions, SURVEY §3.3, in one
    streaming operator).

    State/expiry semantics follow the left join: a LEFT row is
    releasable when the watermark passes ``left_ts + tolerance``; a
    RIGHT row when it passes ``right_ts`` (its join window is
    ``[right_ts - tolerance, right_ts]`` on the left timeline). The
    join key is NOT dropped from the right side — an unmatched right
    row carries the only non-null copy, so callers coalesce.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    rw = rw.select([F.col(c).alias(f"{right_prefix}{c}") for c in rw.columns])
    rkey, rts = f"{right_prefix}{key}", f"{right_prefix}{right_ts}"
    cond = (
        (F.col(key) == F.col(rkey))
        & (F.col(rts) >= F.col(left_ts))
        & (F.col(rts) <= F.col(left_ts) + F.expr(f"INTERVAL {tolerance}"))
    )
    return lw.join(rw, cond, "fullOuter")
