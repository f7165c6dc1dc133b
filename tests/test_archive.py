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


def test_prune_archives_keeps_newest_whole_updates(tmp_path):
    """Retention removes the oldest whole update sets, keeps the newest
    keep_last, never touches a sibling dataset — including one whose name
    extends the pruned dataset's."""
    import pytest

    from bridgedownstream_spark.pipeline.archive import prune_archives

    root = str(tmp_path / "archive")
    dirs = [
        "ds_v1_1", "ds_v1_items_1",
        "ds_v1_2", "ds_v1_items_2",
        "ds_v1_3",
        "other_v1_1",          # sibling dataset
        "ds_v1b_1",            # sibling whose name extends ds_v1 without a
                               # '_' separator: must not match ds_v1's pattern
    ]
    for d in dirs:
        os.makedirs(os.path.join(root, d))

    removed = prune_archives(root, "ds_v1", keep_last=2)
    # updates 1 pruned entirely (both tables), 2 and 3 kept
    assert removed == ["ds_v1_1", "ds_v1_items_1"]
    left = sorted(os.listdir(root))
    assert "ds_v1_2" in left and "ds_v1_items_2" in left and "ds_v1_3" in left
    assert "other_v1_1" in left
    # keep_last >= number of updates: no-op
    assert prune_archives(root, "other_v1", keep_last=5) == []
    assert prune_archives(str(tmp_path / "missing"), "ds_v1", 1) == []
    with pytest.raises(ValueError):
        prune_archives(root, "ds_v1", keep_last=0)


def test_prune_archives_underscore_sibling_protection(tmp_path):
    """ADVICE r3: pruning 'gait' must not delete 'gait_v2' (a sibling
    dataset whose name extends the pruned one with an underscore). Without
    explicit table names the sibling's no-matching-root signature raises;
    with tables= the match is exact and the sibling survives."""
    import pytest

    from bridgedownstream_spark.pipeline.archive import prune_archives

    root = str(tmp_path / "archive")
    dirs = [
        "gait_1", "gait_steps_1",
        "gait_2", "gait_steps_2",
        "gait_3",
        "gait_v2_7", "gait_v2_8",  # sibling dataset, own update numbering
    ]
    for d in dirs:
        os.makedirs(os.path.join(root, d))

    # wildcard mode: gait_v2_7 has no gait_7 root -> sibling signature
    with pytest.raises(ValueError, match="SIBLING"):
        prune_archives(root, "gait", keep_last=1)
    assert sorted(os.listdir(root)) == sorted(dirs)  # nothing deleted

    # exact mode: only the listed tables' update sets are touched
    removed = prune_archives(
        root, "gait", keep_last=1, tables=["gait", "gait_steps"]
    )
    assert removed == ["gait_1", "gait_2", "gait_steps_1", "gait_steps_2"]
    left = sorted(os.listdir(root))
    assert left == ["gait_3", "gait_v2_7", "gait_v2_8"]

    # overlapping update numbers: exact mode still never matches a sibling
    os.makedirs(os.path.join(root, "gait_v2_3"))
    assert prune_archives(root, "gait", keep_last=1, tables=["gait"]) == []
    assert os.path.isdir(os.path.join(root, "gait_v2_3"))
