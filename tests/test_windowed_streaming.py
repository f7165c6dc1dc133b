"""Watermarked windowed aggregation: windows finalize once per append-mode
emission; later-than-watermark events are dropped."""

from __future__ import annotations

import json
import os

from bridgedownstream_spark.streaming.windowed import windowed_counts

SCHEMA = "ts timestamp, event_type string, value double"


def _drain(spark, src, sink, cp):
    stream = spark.readStream.schema(SCHEMA).json(src)
    agg = windowed_counts(stream, "ts", "event_type")
    q = (
        agg.writeStream.outputMode("append")
        .foreachBatch(lambda b, _id: b.write.mode("append").parquet(sink))
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _write(src, name, rows):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        for ts, et, v in rows:
            f.write(json.dumps({"ts": ts, "event_type": et, "value": v}) + "\n")


def test_windowed_counts_with_late_data(spark, tmp_path):
    src, sink, cp = str(tmp_path / "s"), str(tmp_path / "o"), str(tmp_path / "cp")
    # batch 1: two events in the 10:00 window, then an event far ahead that
    # advances the watermark beyond 10:10 + 5min → the 10:00 window closes
    _write(
        src,
        "b1.ndjson",
        [
            ("2024-01-01 10:01:00", "click", 1.0),
            ("2024-01-01 10:04:00", "click", 2.0),
            ("2024-01-01 11:00:00", "view", 5.0),
        ],
    )
    _drain(spark, src, sink, cp)
    out = spark.read.parquet(sink)
    rows = {(r["window_start"].strftime("%H:%M"), r["event_type"]): r for r in out.collect()}
    assert ("10:00", "click") in rows
    assert rows[("10:00", "click")]["n"] == 2
    assert rows[("10:00", "click")]["total_value"] == 3.0

    # batch 2: a LATE click for the already-finalized 10:00 window → must
    # be dropped (no second emission, counts unchanged)
    _write(src, "b2.ndjson", [("2024-01-01 10:02:00", "click", 100.0)])
    _drain(spark, src, sink, cp)
    out2 = spark.read.parquet(sink)
    clicks = [r for r in out2.collect() if r["event_type"] == "click"]
    assert len(clicks) == 1 and clicks[0]["n"] == 2  # late event dropped


def test_session_window_counts(spark, tmp_path):
    from bridgedownstream_spark.streaming.windowed import session_counts

    src, sink, cp = str(tmp_path / "s2"), str(tmp_path / "o2"), str(tmp_path / "cp2")
    # u1: two events 10 min apart (one session, gap=30m), then one 2 h
    # later (second session); a far-future event advances the watermark so
    # every session finalizes within the drain
    _write(
        src,
        "b1.ndjson",
        [
            ("2024-01-01 10:00:00", "u1", 1.0),
            ("2024-01-01 10:10:00", "u1", 1.0),
            ("2024-01-01 12:00:00", "u1", 1.0),
            ("2024-01-02 00:00:00", "u2", 1.0),
        ],
    )
    stream = spark.readStream.schema(SCHEMA).json(src)
    agg = session_counts(stream, "ts", "event_type", gap="30 minutes")
    q = (
        agg.writeStream.outputMode("append")
        .foreachBatch(lambda b, _id: b.write.mode("append").parquet(sink))
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(
        (r["event_type"], r["session_start"].strftime("%H:%M"), r["n_events"])
        for r in spark.read.parquet(sink).collect()
    )
    # u1's sessions both closed; u2's stays open (watermark hasn't passed)
    assert rows == [("u1", "10:00", 2), ("u1", "12:00", 1)]


def test_session_boundary_event_extends_the_session(spark):
    """An event landing EXACTLY at last_event + gap EXTENDS the session:
    measured on this Spark version, session_window's gap test is
    inclusive (an advisory review claimed half-open [start, last+gap) —
    empirically FALSE here: the three events below collapse to ONE
    session). Pins the boundary the stream_sessionize_e2e oracle mirrors
    with its strictly-> break condition (a >= would split these)."""
    from datetime import datetime

    from pyspark.sql import functions as F

    t0 = datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0),
        (1, datetime(2024, 1, 1, 0, 30, 0)),   # exactly t0 + gap
        (1, datetime(2024, 1, 1, 0, 59, 59)),  # inside session 2
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = (
        df.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n"))
        .select("session_window.start", "n")
        .orderBy("start")
        .collect()
    )
    assert [(r["start"], r["n"]) for r in out] == [
        (t0, 3),  # boundary event merges; the 59:59 event rides the
                  # extended window ([t0+30min, +30min) reaches 01:00)
    ]
