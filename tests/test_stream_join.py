"""Stream-stream interval join: matches inside the tolerance window join
exactly once; outside-tolerance and wrong-key rows never join."""

from __future__ import annotations

import json
import os

from bridgedownstream_spark.streaming.joins import interval_join_streams

SCHEMA = "ts timestamp, recordid string, kind string"


def _write(src, name, rows):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        for ts, rid, kind in rows:
            f.write(json.dumps({"ts": ts, "recordid": rid, "kind": kind}) + "\n")


def test_interval_join_streams(spark, tmp_path):
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    sink, cp = str(tmp_path / "o"), str(tmp_path / "cp")
    _write(
        lsrc,
        "uploads.ndjson",
        [
            ("2024-01-01 10:00:00", "rec1", "upload"),
            ("2024-01-01 10:00:00", "rec2", "upload"),
            ("2024-01-01 10:00:00", "rec3", "upload"),
        ],
    )
    _write(
        rsrc,
        "confirms.ndjson",
        [
            ("2024-01-01 10:05:00", "rec1", "confirm"),  # in tolerance → joins
            ("2024-01-01 10:20:00", "rec2", "confirm"),  # too late → dropped
            ("2024-01-01 10:01:00", "recX", "confirm"),  # unknown key → dropped
        ],
    )
    left = spark.readStream.schema(SCHEMA).json(lsrc)
    right = spark.readStream.schema(SCHEMA).json(rsrc)
    joined = interval_join_streams(left, right, key="recordid")
    q = (
        joined.writeStream.outputMode("append")
        .foreachBatch(lambda b, _id: b.write.mode("append").parquet(sink))
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = spark.read.parquet(sink).collect()
    assert len(rows) == 1
    assert rows[0]["recordid"] == "rec1"
    assert rows[0]["r_kind"] == "confirm"


def test_interval_left_join_emits_unmatched_on_watermark(spark, tmp_path):
    """LEFT OUTER variant: rec1 joins its in-tolerance confirm; rec2's
    confirm is too late and rec3 has none — both MUST still emit, with
    NULL right columns, once the sentinel batch advances the watermark
    past their expiry. Without the sentinel the unmatched tail would
    stay in state forever (append-mode outer semantics)."""
    import time as _time

    from bridgedownstream_spark.streaming.joins import (
        interval_left_join_streams,
    )

    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    sink, cp = str(tmp_path / "o"), str(tmp_path / "cp")
    _write(
        lsrc,
        "00_uploads.ndjson",
        [
            ("2024-01-01 10:00:00", "rec1", "upload"),
            ("2024-01-01 10:00:00", "rec2", "upload"),
            ("2024-01-01 10:00:00", "rec3", "upload"),
        ],
    )
    _write(
        rsrc,
        "00_confirms.ndjson",
        [
            ("2024-01-01 10:05:00", "rec1", "confirm"),
            ("2024-01-01 10:20:00", "rec2", "confirm"),  # outside tolerance
        ],
    )
    # sentinel batch on BOTH sides, far past expiry of every real row
    now = _time.time()
    for src, name, rid in (
        (lsrc, "01_sent.ndjson", "zzL"),
        (rsrc, "01_sent.ndjson", "zzR"),
    ):
        _write(src, name, [("2024-01-01 12:00:00", rid, "sentinel")])
        os.utime(os.path.join(src, name), (now + 60, now + 60))
    left = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(lsrc)
        .where("kind <> 'x'")
    )
    right = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(rsrc)
    )
    joined = interval_left_join_streams(
        left, right, key="recordid", tolerance="10 minutes",
        watermark="1 minute",
    )
    q = (
        joined.writeStream.outputMode("append")
        .foreachBatch(lambda b, _id: b.write.mode("append").parquet(sink))
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        (r.recordid, r.r_kind)
        for r in spark.read.parquet(sink).collect()
        if r.kind != "sentinel"
    }
    assert got == {("rec1", "confirm"), ("rec2", None), ("rec3", None)}


def test_interval_full_join_emits_both_unmatched_tails(spark, tmp_path):
    """FULL OUTER variant: rec1 joins; rec2's confirm is outside
    tolerance so BOTH its upload (left-unmatched) and its confirm
    (right-unmatched) must emit; rec3 has no confirm (left-unmatched);
    recX's confirm has no upload (right-unmatched). All four outer rows
    flush once the sentinel batches advance both watermarks."""
    import time as _time

    from bridgedownstream_spark.streaming.joins import (
        interval_full_join_streams,
    )

    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    sink, cp = str(tmp_path / "o"), str(tmp_path / "cp")
    _write(
        lsrc,
        "00_uploads.ndjson",
        [
            ("2024-01-01 10:00:00", "rec1", "upload"),
            ("2024-01-01 10:00:00", "rec2", "upload"),
            ("2024-01-01 10:00:00", "rec3", "upload"),
        ],
    )
    _write(
        rsrc,
        "00_confirms.ndjson",
        [
            ("2024-01-01 10:05:00", "rec1", "confirm"),
            ("2024-01-01 10:20:00", "rec2", "confirm"),  # outside tolerance
            ("2024-01-01 10:01:00", "recX", "confirm"),  # no upload
        ],
    )
    now = _time.time()
    for src, name, rid in (
        (lsrc, "01_sent.ndjson", "zzL"),
        (rsrc, "01_sent.ndjson", "zzR"),
    ):
        _write(src, name, [("2024-01-01 12:00:00", rid, "sentinel")])
        os.utime(os.path.join(src, name), (now + 60, now + 60))
    left = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(lsrc)
    )
    right = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(rsrc)
    )
    joined = interval_full_join_streams(
        left, right, key="recordid", tolerance="10 minutes",
        watermark="1 minute",
    )
    q = (
        joined.writeStream.outputMode("append")
        .foreachBatch(lambda b, _id: b.write.mode("append").parquet(sink))
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        (r.recordid, r.r_recordid)
        for r in spark.read.parquet(sink).collect()
        if (r.kind or r.r_kind) != "sentinel"
    }
    assert got == {
        ("rec1", "rec1"),   # matched pair
        ("rec2", None),     # left row whose confirm was late
        (None, "rec2"),     # the late confirm itself, right-unmatched
        ("rec3", None),     # never confirmed
        (None, "recX"),     # confirm without upload
    }
