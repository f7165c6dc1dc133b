"""Stage-2 corrupt-record quarantine: unparseable lake lines go to the
corrupt sink with their partition identity; valid lines process normally;
nothing becomes a silent all-NULL row."""

from __future__ import annotations

import os

from bridgedownstream_spark.pipeline import DatasetRegistry, run_json_to_parquet

REGISTRY = DatasetRegistry(
    {
        "tables": {
            "obs_v1": {
                "columns": [
                    {"Name": "recordid", "Type": "string"},
                    {"Name": "value", "Type": "int"},
                ]
            }
        }
    }
)


def _lake(tmp_path):
    part = tmp_path / "json" / "dataset=obs_v1" / "assessmentid=a" / \
        "year=2024" / "month=1" / "day=2"
    os.makedirs(part)
    with open(part / "part-0.ndjson", "w") as f:
        f.write('{"recordid": "r1", "value": 1}\n')
        f.write('{"recordid": "r2", "value": 2}\n')
        f.write('{{{ this is not json\n')
    return str(tmp_path / "json")


def test_corrupt_lines_quarantined(spark, tmp_path):
    json_root = _lake(tmp_path)
    pq = str(tmp_path / "pq")
    corrupt = str(tmp_path / "corrupt")
    written = run_json_to_parquet(
        spark, json_root, pq, "obs_v1", REGISTRY,
        key_cols=("recordid",), mode="overwrite", corrupt_root=corrupt,
    )
    rows = spark.read.parquet(written["obs_v1"]).collect()
    assert sorted((r["recordid"], r["value"]) for r in rows) == [
        ("r1", 1), ("r2", 2),
    ]
    bad = spark.read.parquet(corrupt).collect()
    assert len(bad) == 1
    assert "not json" in bad[0]["raw_line"]
    assert bad[0]["assessmentid"] == "a" and bad[0]["year"] == "2024"


def test_no_corrupt_root_means_null_rows(spark, tmp_path):
    # documents the default (reference-faithful) behavior: without the
    # quarantine, a corrupt line surfaces as an all-NULL data row
    json_root = _lake(tmp_path)
    pq = str(tmp_path / "pq2")
    written = run_json_to_parquet(
        spark, json_root, pq, "obs_v1", REGISTRY,
        key_cols=("recordid",), mode="overwrite",
    )
    rows = spark.read.parquet(written["obs_v1"]).collect()
    assert len(rows) == 3
    assert sum(1 for r in rows if r["recordid"] is None) == 1
