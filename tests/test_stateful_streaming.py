"""Stateful streaming dedup: first occurrence wins across micro-batches,
re-deliveries drop, state survives via the checkpoint."""

from __future__ import annotations

import json
import os

from bridgedownstream_spark.streaming.stateful import dedup_stream

SCHEMA = "recordid string, payload string"


def _drain(spark, src, sink, cp):
    stream = spark.readStream.schema(SCHEMA).json(src)
    deduped = dedup_stream(stream, "recordid")
    q = (
        deduped.writeStream.outputMode("update")
        .foreachBatch(
            lambda batch, _id: batch.write.mode("append").parquet(sink)
        )
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _write(src, name, rows):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        for rid, payload in rows:
            f.write(json.dumps({"recordid": rid, "payload": payload}) + "\n")


def test_dedup_stream_across_batches(spark, tmp_path):
    src, sink, cp = str(tmp_path / "src"), str(tmp_path / "sink"), str(tmp_path / "cp")
    # batch 1: r1 twice (in-batch dup) + r2
    _write(src, "b1.ndjson", [("r1", "a"), ("r1", "b"), ("r2", "c")])
    _drain(spark, src, sink, cp)
    out = spark.read.parquet(sink)
    assert out.count() == 2
    assert {r["recordid"] for r in out.collect()} == {"r1", "r2"}

    # batch 2: r2 re-delivered (cross-batch dup) + new r3
    _write(src, "b2.ndjson", [("r2", "dup"), ("r3", "d")])
    _drain(spark, src, sink, cp)
    out = spark.read.parquet(sink)
    assert out.count() == 3
    got = {r["recordid"]: r["payload"] for r in out.collect()}
    assert got["r2"] == "c"  # the original, not the re-delivery
    assert got["r3"] == "d"


def test_dedup_stream_with_ttl_path(spark, tmp_path):
    """TTL variant: within the horizon it behaves identically (dup
    dropped, state refreshed); actual expiry is wall-clock-driven and
    exercised here only as far as determinism allows (a generous TTL
    that cannot fire mid-test)."""
    import time

    src, sink, cp = str(tmp_path / "src"), str(tmp_path / "sink"), str(tmp_path / "cp")

    def drain(expected_rows):
        # a query holding processing-time timers never self-terminates
        # (it stays up to fire expirations), so availableNow alone won't
        # return: poll the sink for the expected output, then stop.
        stream = spark.readStream.schema(SCHEMA).json(src)
        deduped = dedup_stream(stream, "recordid", ttl_ms=3_600_000)
        q = (
            deduped.writeStream.outputMode("update")
            .foreachBatch(lambda b, _id: b.write.mode("append").parquet(sink))
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        deadline = time.time() + 90
        while time.time() < deadline:
            try:
                if spark.read.parquet(sink).count() >= expected_rows:
                    break
            except Exception:  # noqa: BLE001 — sink not created yet
                pass
            time.sleep(1)
        q.stop()
        q.awaitTermination(30)

    _write(src, "b1.ndjson", [("r1", "a"), ("r2", "b")])
    drain(2)
    _write(src, "b2.ndjson", [("r1", "redelivered"), ("r3", "c")])
    drain(3)
    out = {r["recordid"]: r["payload"] for r in spark.read.parquet(sink).collect()}
    assert out == {"r1": "a", "r2": "b", "r3": "c"}
