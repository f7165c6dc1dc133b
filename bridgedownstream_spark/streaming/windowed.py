"""Watermarked event-time windowed aggregation.

The reference's "streams" are micro-batched workflow runs with no
event-time semantics (SURVEY §2.11) — late data is handled by an hourly
reconciliation anti-join. A Spark-native deployment gets the stronger
primitive directly: **tumbling event-time windows with a watermark**, so
per-window aggregates finalize once the watermark passes and
later-than-watermark events are dropped deterministically instead of
waiting for the next reconciliation sweep.

This module is the engine's windowed-aggregation surface for streams; the
same call shape works for session or sliding windows (swap the
``F.window`` spec).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["session_counts", "windowed_counts"]


def windowed_counts(
    stream: DataFrame,
    ts_col: str,
    group_col: str,
    window_duration: str = "10 minutes",
    watermark: str = "5 minutes",
    sum_col: str | None = "value",
) -> DataFrame:
    """Count events per (event-time window, group) with a watermark;
    ``sum_col`` (optional) adds a ``total_value`` sum — pass ``None`` for
    streams without a numeric value column.

    In append output mode a window's row emits exactly once, when the
    watermark (max event time seen minus ``watermark``) passes the window
    end; events arriving after that are dropped by the state store — the
    deterministic late-data contract.
    """
    sum_col = sum_col if sum_col in stream.columns else None
    aggs = [F.count("*").alias("n")]
    if sum_col is not None:
        aggs.append(F.sum(sum_col).alias("total_value"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration), F.col(group_col))
        .agg(*aggs)
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            group_col,
            "n",
            *(["total_value"] if sum_col is not None else []),
        )
    )


def session_counts(
    stream: DataFrame,
    ts_col: str,
    group_col: str,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming sessionization: per-key sessions that close after ``gap``
    of inactivity (``F.session_window`` — the state store grows each
    key's open session while events keep arriving and finalizes it once
    the watermark passes session-end + gap).

    The streaming twin of the batch gaps-and-islands operator
    (queries/advanced.py::sessionize): same session semantics, expressed
    as a dynamic window whose end extends with each event instead of a
    lag/cumsum window pair. State per key = one open session, not event
    history."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(group_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            group_col,
            "n_events",
        )
    )
