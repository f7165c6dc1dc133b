"""Small-file compaction: fragmented partitions collapse to the target
file count, healthy partitions are left byte-identical, and no row is
lost or duplicated."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from bridgedownstream_spark.pipeline.compact import (
    compact_dataset,
    partition_file_stats,
)

SF = "/root/testdata/sf0.001"


def _files_per_partition(path):
    out = {}
    for f in glob.glob(os.path.join(path, "*", "*.parquet")):
        out.setdefault(os.path.basename(os.path.dirname(f)), []).append(f)
    return {k: sorted(v) for k, v in out.items()}


def test_compact_fragmented_partitions(spark, tmp_path):
    table = str(tmp_path / "events_lake")
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id", "value", "event_type"
    )
    # fragment: 12 appends → 12 slivers per partition
    for _ in range(12):
        ev.limit(200).write.mode("append").partitionBy("event_type").parquet(table)

    before = _files_per_partition(table)
    assert all(len(v) >= 12 for v in before.values())
    expect = spark.read.parquet(table)
    expect_sum = expect.agg(
        F.count("*").alias("n"), F.sum("event_id").alias("s")
    ).first()

    done = compact_dataset(
        spark, table, ["event_type"], target_file_bytes=1 << 30
    )
    assert done  # every partition was fragmented
    after = _files_per_partition(table)
    assert set(after) == set(before)
    for part, files in after.items():
        assert len(files) == 1, (part, files)  # 1 GB target ⇒ single file

    # no rows lost, none duplicated
    got = spark.read.parquet(table).agg(
        F.count("*").alias("n"), F.sum("event_id").alias("s")
    ).first()
    assert (got["n"], got["s"]) == (expect_sum["n"], expect_sum["s"])

    # second pass: nothing fragmented anymore → no-op
    assert compact_dataset(spark, table, ["event_type"], 1 << 30) == {}


def test_compact_leaves_healthy_partitions_alone(spark, tmp_path):
    table = str(tmp_path / "mixed_lake")
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id", "value", "event_type"
    )
    types = sorted(r[0] for r in ev.select("event_type").distinct().collect())
    healthy_t, frag_t = types[0], types[1]
    healthy = ev.where(F.col("event_type") == healthy_t).coalesce(1)
    healthy.write.partitionBy("event_type").parquet(table)
    frag = ev.where(F.col("event_type") == frag_t)
    for _ in range(5):
        frag.limit(100).write.mode("append").partitionBy("event_type").parquet(table)

    before = _files_per_partition(table)
    healthy_files = before[f"event_type={healthy_t}"]
    done = compact_dataset(spark, table, ["event_type"], target_file_bytes=1 << 30)
    assert list(done) and all(frag_t in p for p in done)
    after = _files_per_partition(table)
    # healthy partition: same files, untouched mtimes
    assert after[f"event_type={healthy_t}"] == healthy_files
    assert len(after[f"event_type={frag_t}"]) == 1


def test_partition_file_stats_counts(spark, tmp_path):
    table = str(tmp_path / "stats_lake")
    ev = spark.read.parquet(f"{SF}/events.parquet").select("event_id", "event_type")
    for _ in range(3):
        ev.limit(50).write.mode("append").partitionBy("event_type").parquet(table)
    stats = {
        r["partition"]: r["n_files"]
        for r in partition_file_stats(spark, table).collect()
    }
    real = _files_per_partition(table)
    assert stats == {k: len(v) for k, v in real.items()}
