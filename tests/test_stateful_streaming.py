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
