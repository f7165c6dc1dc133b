"""Incremental-processing tests: the processed-files ledger (bookmark
equivalent) and the checkpointed streaming stage-2. Idempotency is the
contract: re-running over the same input must write zero new rows
(reference bookmarks, json_s3_to_parquet.py:74,103,233; reset protocol
docs/schema_change_protocol.md §3e)."""

from __future__ import annotations

import pytest

from bridgedownstream_spark.pipeline import DatasetRegistry, run_json_to_parquet
from bridgedownstream_spark.pipeline.ledger import FileLedger
from bridgedownstream_spark.sources import write_ndjson_dataset
from bridgedownstream_spark.streaming import stream_json_to_parquet

REGISTRY = DatasetRegistry(
    {
        "tables": {
            "inc_v1": {
                "columns": [
                    {"Name": "recordid", "Type": "string"},
                    {"Name": "items", "Type": "array<struct<v:int>>"},
                ]
            }
        }
    }
)


def _write_batch(spark, root, records):
    rows = [
        (rid, [(v,) for v in vals], "a1", "2022", "09", "01")
        for rid, vals in records
    ]
    df = spark.createDataFrame(
        rows,
        "recordid string, items array<struct<v:int>>, "
        "assessmentid string, year string, month string, day string",
    )
    write_ndjson_dataset(df, root, "inc_v1")


def test_ledger_idempotent_rerun(spark, tmp_path):
    json_root, pq, led = str(tmp_path / "j"), str(tmp_path / "p"), str(tmp_path / "l")
    ledger = FileLedger(spark, led)
    _write_batch(spark, json_root, [("r1", [1, 2]), ("r2", [3])])

    w1 = run_json_to_parquet(spark, json_root, pq, "inc_v1", REGISTRY, ledger=ledger)
    assert spark.read.parquet(w1["inc_v1"]).count() == 2
    assert spark.read.parquet(w1["inc_v1_items"]).count() == 3

    # same input, second run: ledger filters everything → zero new rows
    w2 = run_json_to_parquet(spark, json_root, pq, "inc_v1", REGISTRY, ledger=ledger)
    assert w2 == {}
    assert spark.read.parquet(w1["inc_v1"]).count() == 2
    assert spark.read.parquet(w1["inc_v1_items"]).count() == 3


def test_ledger_processes_only_new_files(spark, tmp_path):
    json_root, pq, led = str(tmp_path / "j"), str(tmp_path / "p"), str(tmp_path / "l")
    ledger = FileLedger(spark, led)
    _write_batch(spark, json_root, [("r1", [1])])
    run_json_to_parquet(spark, json_root, pq, "inc_v1", REGISTRY, ledger=ledger)

    _write_batch(spark, json_root, [("r3", [7, 8, 9])])
    run_json_to_parquet(spark, json_root, pq, "inc_v1", REGISTRY, ledger=ledger)
    root = spark.read.parquet(f"{pq}/inc_v1")
    assert {r["recordid"] for r in root.collect()} == {"r1", "r3"}
    assert spark.read.parquet(f"{pq}/inc_v1_items").count() == 4  # 1 + 3, no dupes


def test_ledger_reset_reprocesses(spark, tmp_path):
    json_root, pq, led = str(tmp_path / "j"), str(tmp_path / "p"), str(tmp_path / "l")
    ledger = FileLedger(spark, led)
    _write_batch(spark, json_root, [("r1", [1])])
    run_json_to_parquet(spark, json_root, pq, "inc_v1", REGISTRY, ledger=ledger)
    ledger.reset("inc_v1")
    w = run_json_to_parquet(spark, json_root, pq, "inc_v1", REGISTRY, ledger=ledger)
    assert w != {}  # reprocessed after reset
    # append mode: the rerun after reset duplicates (the protocol archives
    # the old parquet first — docs/schema_change_protocol.md §3)
    assert spark.read.parquet(f"{pq}/inc_v1").count() == 2


def test_ledger_commit_dataframe_and_introspection(spark, tmp_path):
    ledger = FileLedger(spark, str(tmp_path / "l"))
    paths = spark.createDataFrame([("f1",), ("f2",)], "file_path string")
    assert ledger.commit(paths, "ds") == 2
    assert ledger.commit(["f2", "f3"], "ds") == 1  # dup filtered
    # the bookmark is introspectable as a plain table (unlike Glue's,
    # which needed its own script to read)
    assert {r["file_path"] for r in ledger.processed_files("ds").collect()} == {
        "f1", "f2", "f3",
    }


def test_streaming_availablenow_incremental(spark, tmp_path):
    json_root, pq, cp = str(tmp_path / "j"), str(tmp_path / "p"), str(tmp_path / "cp")
    _write_batch(spark, json_root, [("r1", [1, 2])])
    stream_json_to_parquet(spark, json_root, pq, "inc_v1", REGISTRY, cp)
    assert spark.read.parquet(f"{pq}/inc_v1").count() == 1
    assert spark.read.parquet(f"{pq}/inc_v1_items").count() == 2

    # new records arrive; the checkpoint makes the second drain incremental
    _write_batch(spark, json_root, [("r2", [5, 6, 7])])
    stream_json_to_parquet(spark, json_root, pq, "inc_v1", REGISTRY, cp)
    assert spark.read.parquet(f"{pq}/inc_v1").count() == 2
    assert spark.read.parquet(f"{pq}/inc_v1_items").count() == 5

    # third drain with nothing new: no growth (idempotent)
    stream_json_to_parquet(spark, json_root, pq, "inc_v1", REGISTRY, cp)
    assert spark.read.parquet(f"{pq}/inc_v1").count() == 2


def test_ledger_file_level_pruning_with_empty_file(spark, tmp_path):
    # file-level bookmark pruning: an empty file in a mixed batch is
    # processed without error, contributes no rows, and the subsequent
    # run is a metadata-only no-op
    json_root, pq, led = str(tmp_path / "j"), str(tmp_path / "p"), str(tmp_path / "l")
    ledger = FileLedger(spark, led)
    _write_batch(spark, json_root, [("r1", [1, 2])])
    run_json_to_parquet(spark, json_root, pq, "inc_v1", REGISTRY, ledger=ledger)

    # drop an empty (zero-byte) visible file into the partition dir next
    # to a real new batch
    _write_batch(spark, json_root, [("r2", [3])])
    import glob
    import os

    part_dir = os.path.dirname(
        glob.glob(f"{json_root}/dataset=inc_v1/**/*", recursive=True)[0]
    )
    open(os.path.join(part_dir, "empty-extra.json"), "w").close()

    run_json_to_parquet(spark, json_root, pq, "inc_v1", REGISTRY, ledger=ledger)
    got = {r["recordid"] for r in spark.read.parquet(f"{pq}/inc_v1").collect()}
    assert got == {"r1", "r2"}

    # third run: nothing new (the empty file is ledgered too) → no-op
    assert run_json_to_parquet(
        spark, json_root, pq, "inc_v1", REGISTRY, ledger=ledger
    ) == {}
    assert spark.read.parquet(f"{pq}/inc_v1").count() == 2
