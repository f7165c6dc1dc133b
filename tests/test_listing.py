"""Listing/manifest source tests (S9/S10) + representative sampling."""

from __future__ import annotations

import json

from bridgedownstream_spark.operators.reconcile import representative_sample
from bridgedownstream_spark.sources.listing import (
    list_lake_files,
    manifest_from_messages,
)


def test_list_lake_files(spark, tmp_path):
    (tmp_path / "dataset=d1").mkdir()
    (tmp_path / "dataset=d1" / "rec1.ndjson").write_text('{"a":1}\n')
    (tmp_path / "dataset=d1" / "rec2.ndjson").write_text('{"a":2}\n')
    out = list_lake_files(spark, str(tmp_path))
    rows = {r["object_name"]: r for r in out.collect()}
    assert set(rows) == {"rec1.ndjson", "rec2.ndjson"}
    assert rows["rec1.ndjson"]["record_stem"] == "rec1"
    assert rows["rec1.ndjson"]["length"] == len('{"a":1}\n')
    assert rows["rec1.ndjson"]["path"].startswith("/")


def test_manifest_from_messages(spark):
    messages = json.dumps(
        [
            {
                "path": "/tmp/a.zip",
                "recordid": "r1",
                "assessmentid": "spelling",
                "assessmentrevision": 3,
                "uploadedon": "2022-09-02T10:11:12.000Z",
                "clientinfo": "iPhone",
            }
        ]
    )
    m = manifest_from_messages(spark, messages)
    r = m.collect()[0]
    assert r["path"] == "/tmp/a.zip" and r["assessmentrevision"] == "3"
    assert m.columns == [
        "path", "recordid", "assessmentid", "assessmentrevision",
        "uploadedon", "clientinfo",
    ]


def test_representative_sample_deterministic(spark):
    df = spark.createDataFrame(
        [(t, i) for t in ("a", "b") for i in range(20)], "grp string, id bigint"
    )
    s1 = {(r["grp"], r["id"]) for r in representative_sample(df, "grp", seed=7, order_key="id").collect()}
    s2 = {(r["grp"], r["id"]) for r in representative_sample(df, "grp", seed=7, order_key="id").collect()}
    s3 = {(r["grp"], r["id"]) for r in representative_sample(df, "grp", seed=8, order_key="id").collect()}
    assert s1 == s2  # same seed → same sample
    assert len(s1) == 2 and {g for g, _ in s1} == {"a", "b"}
    assert s3 != s1 or True  # different seed may differ; only determinism is contractual
