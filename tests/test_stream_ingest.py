"""Streaming stage-1 ingest: archives drain through the checkpointed
binaryFile stream exactly once; late-arriving archives are picked up by a
re-run without reprocessing the old ones."""

from __future__ import annotations

import json
import zipfile

from bridgedownstream_spark.streaming import stream_ingest

EVENTS_SCHEMA = {
    "$id": "schemas/v1/EventList",
    "type": "array",
    "items": {
        "type": "object",
        "required": ["event_id"],
        "properties": {"event_id": {"type": "integer"}},
    },
}
ARCHIVE_MAP = {
    "assessments": [
        {
            "assessmentIdentifier": "events",
            "assessmentRevision": 1,
            "files": [
                {"filename": "events.json", "jsonSchema": "https://example.org/events"}
            ],
        }
    ],
    "apps": [],
    "anyOf": [],
}
SCHEMA_STORE = {"https://example.org/events": EVENTS_SCHEMA}
SCHEMA_MAPPING = {"schemas/v1/EventList": "eventlist_v1"}


def _zip(path, events):
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("events.json", json.dumps(events))
    return str(path)


def _manifest(spark, rows):
    return spark.createDataFrame(
        rows,
        "path string, recordid string, assessmentid string, "
        "assessmentrevision string, uploadedon string, clientinfo string",
    )


def _meta(path, rid):
    return (path, rid, "events", "1", "2024-03-04T00:00:00.000Z", "ios")


def _lake_recordids(spark, json_root) -> list[str]:
    df = (
        spark.read.schema("event_id bigint, recordid string")
        .json(f"{json_root}/dataset=eventlist_v1")
    )
    return sorted(r["recordid"] for r in df.select("recordid").collect())


def test_stream_ingest_is_incremental(spark, tmp_path):
    arch = tmp_path / "archives"
    arch.mkdir()
    rows = [
        _meta(_zip(arch / "r1.zip", [{"event_id": 1}, {"event_id": 2}]), "r1"),
        _meta(_zip(arch / "r2.zip", [{"event_id": 3}]), "r2"),
    ]
    json_root = str(tmp_path / "json")
    ck = str(tmp_path / "ck")

    def drain(manifest_rows):
        stream_ingest(
            spark,
            archive_path=str(arch / "*.zip"),
            manifest=_manifest(spark, manifest_rows),
            archive_map=ARCHIVE_MAP,
            schema_store=SCHEMA_STORE,
            schema_mapping=SCHEMA_MAPPING,
            dataset_mapping=None,
            json_root=json_root,
            checkpoint_root=ck,
            timeout_sec=120,
        )

    drain(rows)
    assert _lake_recordids(spark, json_root) == ["r1", "r1", "r2"]

    # a third archive arrives; the same checkpoint must ingest ONLY it —
    # were r1/r2 reprocessed, their rows would double in the append lake
    rows.append(_meta(_zip(arch / "r3.zip", [{"event_id": 4}]), "r3"))
    drain(rows)
    assert _lake_recordids(spark, json_root) == ["r1", "r1", "r2", "r3"]

    # an immediate re-run with nothing new is a no-op
    drain(rows)
    assert _lake_recordids(spark, json_root) == ["r1", "r1", "r2", "r3"]
