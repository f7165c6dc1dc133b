"""Schema-change protocol loop: archive → evolve schema → reset bookmark →
rebuild (docs/schema_change_protocol.md §3, as library operations)."""

from __future__ import annotations

import os

from bridgedownstream_spark.pipeline import DatasetRegistry, run_json_to_parquet
from bridgedownstream_spark.pipeline.archive import (
    archive_dataset,
    descendant_tables,
    next_update_number,
)
from bridgedownstream_spark.pipeline.ledger import FileLedger
from bridgedownstream_spark.pipeline.registry import is_compatible_evolution
from bridgedownstream_spark.sources import write_ndjson_dataset

V1 = DatasetRegistry(
    {
        "tables": {
            "ds_v1": {
                "columns": [
                    {"Name": "recordid", "Type": "string"},
                    {"Name": "items", "Type": "array<struct<v:int>>"},
                ]
            }
        }
    }
)
V1_ADD = DatasetRegistry(
    {
        "tables": {
            "ds_v1": {
                "columns": [
                    {"Name": "recordid", "Type": "string"},
                    {"Name": "items", "Type": "array<struct<v:int>>"},
                    {"Name": "extra", "Type": "double"},
                ]
            }
        }
    }
)


def test_schema_change_protocol_loop(spark, tmp_path):
    json_root, pq, led = str(tmp_path / "j"), str(tmp_path / "p"), str(tmp_path / "l")
    df = spark.createDataFrame(
        [("r1", [(1,)], "a1", "2022", "09", "01")],
        "recordid string, items array<struct<v:int>>, "
        "assessmentid string, year string, month string, day string",
    )
    write_ndjson_dataset(df, json_root, "ds_v1")
    ledger = FileLedger(spark, led)
    run_json_to_parquet(spark, json_root, pq, "ds_v1", V1, ledger=ledger)
    assert descendant_tables(pq, "ds_v1") == ["ds_v1", "ds_v1_items"]

    # 1. the change is compatible (additive) → in-place rebuild allowed
    assert is_compatible_evolution(V1["ds_v1"], V1_ADD["ds_v1"])

    # 2. archive the old parquet (both descendant tables, update number 1)
    moved = archive_dataset(pq, "ds_v1")
    assert set(os.path.basename(d) for d in moved.values()) == {
        "ds_v1_1",
        "ds_v1_items_1",
    }
    assert next_update_number(os.path.join(pq, "archive"), "ds_v1") == 2

    # 3. reset the bookmark and rebuild with the evolved schema
    ledger.reset("ds_v1")
    import shutil

    for t in descendant_tables(pq, "ds_v1"):
        shutil.rmtree(os.path.join(pq, t))
    written = run_json_to_parquet(spark, json_root, pq, "ds_v1", V1_ADD, ledger=ledger)
    rebuilt = spark.read.parquet(written["ds_v1"])
    assert "extra" in rebuilt.columns  # evolved schema materialized
    assert rebuilt.collect()[0]["extra"] is None  # old data: NULL-filled
    # archived copy still readable
    old = spark.read.parquet(os.path.join(pq, "archive", "ds_v1_1"))
    assert old.count() == 1
