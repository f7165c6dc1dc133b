"""Data-layout operators: Z-order + total-order writes and their
file-skipping payoff, measured against the real per-file min/max stats."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from bridgedownstream_spark.pipeline.layout import (
    file_minmax,
    write_sorted,
    write_zordered,
)

SF = "/root/testdata/sf0.001"


def _events(spark):
    return (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("event_id", "user_id", "event_type", "value")
    )


def _box_files(stats, lo_u, hi_u, lo_v, hi_v) -> int:
    """Files whose [min,max] box intersects the predicate box — exactly
    the files a scan with those predicates must read."""
    return stats.where(
        (F.col("min_user_id") <= hi_u)
        & (F.col("max_user_id") >= lo_u)
        & (F.col("min_value") <= hi_v)
        & (F.col("max_value") >= lo_v)
    ).count()


def test_zorder_roundtrip_and_skipping(spark, tmp_path):
    ev = _events(spark)
    zpath = os.path.join(tmp_path, "z")
    npath = os.path.join(tmp_path, "naive")
    write_zordered(ev, zpath, ["user_id", "value"], bits=6, num_files=16)
    # naive layout: same data, same file count, arrival order
    ev.repartition(16).write.parquet(npath)

    back = spark.read.parquet(zpath)
    assert back.count() == ev.count()
    assert back.exceptAll(ev).count() == 0 and ev.exceptAll(back).count() == 0

    zstats = file_minmax(spark, zpath, ["user_id", "value"])
    nstats = file_minmax(spark, npath, ["user_id", "value"])
    assert zstats.count() == 16
    # a box covering ~1/5 of each dimension (~1/25 of the plane);
    # sf0.001 spans user_id 0..14, value 0..~330
    z_files = _box_files(zstats, 4, 6, 50, 130)
    n_files = _box_files(nstats, 4, 6, 50, 130)
    # hash layout spreads every value range across every file: no skipping
    assert n_files == 16
    # Z-order confines the box to a small neighbourhood of files
    assert z_files <= 6, f"z-order box touched {z_files}/16 files"


def test_zorder_single_column_degenerates_to_sort(spark, tmp_path):
    ev = _events(spark)
    path = os.path.join(tmp_path, "z1")
    write_zordered(ev, path, ["user_id"], bits=6, num_files=8)
    stats = (
        file_minmax(spark, path, ["user_id"])
        .orderBy("min_user_id")
        .collect()
    )
    # single clustered column: files must cover disjoint (or touching at a
    # shared bucket boundary) key ranges, like a plain sorted write
    for prev, cur in zip(stats, stats[1:]):
        assert prev["max_user_id"] <= cur["min_user_id"] + 1


def test_write_sorted_total_order_across_files(spark, tmp_path):
    ev = _events(spark)
    path = os.path.join(tmp_path, "s")
    write_sorted(ev, path, "event_id", num_files=8)
    stats = (
        file_minmax(spark, path, ["event_id"])
        .orderBy("min_event_id")
        .collect()
    )
    assert len(stats) >= 2  # range partitioner actually split the data
    for prev, cur in zip(stats, stats[1:]):
        assert prev["max_event_id"] <= cur["min_event_id"]
    # content preserved
    back = spark.read.parquet(path)
    assert back.exceptAll(ev).count() == 0 and ev.exceptAll(back).count() == 0


def test_skipping_scan_prunes_files_exactly(spark, tmp_path):
    """Manifest-driven file skipping: result identical to the full-scan
    filter, while the manifest's intersection really drops files."""
    from bridgedownstream_spark.pipeline.layout import (
        skipping_scan,
        write_stats_manifest,
    )

    ev = _events(spark)
    path = os.path.join(tmp_path, "z")
    mpath = os.path.join(tmp_path, "manifest")
    write_zordered(ev, path, ["user_id", "value"], bits=6, num_files=16)
    n_files = write_stats_manifest(spark, path, ["user_id", "value"], mpath)
    assert n_files >= 8

    preds = {"user_id": (40, 60), "value": (50.0, 150.0)}
    out = skipping_scan(spark, path, mpath, preds)
    full = (
        spark.read.parquet(path)
        .where(F.col("user_id").between(40, 60) & F.col("value").between(50.0, 150.0))
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, full.collect()))

    # the clustered layout + tight box must actually SKIP files
    m = spark.read.parquet(mpath)
    kept = m.where(
        (F.col("max_user_id") >= 40) & (F.col("min_user_id") <= 60)
        & (F.col("max_value") >= 50.0) & (F.col("min_value") <= 150.0)
    ).count()
    assert kept < n_files

    # disjoint box: empty result, schema preserved, zero files read
    empty = skipping_scan(spark, path, mpath, {"user_id": (10**9, 10**9 + 1)})
    assert empty.count() == 0
    assert empty.columns == spark.read.parquet(path).columns


def test_skipping_scan_guards(spark, tmp_path):
    """Empty predicates raise a clear error; a manifest that predates new
    data files fails loudly instead of silently dropping them."""
    import pytest

    from bridgedownstream_spark.pipeline.layout import (
        skipping_scan,
        write_sorted,
        write_stats_manifest,
    )

    ev = _events(spark)
    path = os.path.join(tmp_path, "s")
    mpath = os.path.join(tmp_path, "manifest")
    write_sorted(ev, path, "user_id", num_files=4)
    write_stats_manifest(spark, path, ["user_id"], mpath)

    with pytest.raises(ValueError, match="empty predicates"):
        skipping_scan(spark, path, mpath, {})

    # append new files WITHOUT rebuilding the manifest -> stale
    ev.limit(10).write.mode("append").parquet(path)
    with pytest.raises(ValueError, match="stale manifest"):
        skipping_scan(spark, path, mpath, {"user_id": (0, 100)})
    # verify=False opts out for callers that own freshness
    out = skipping_scan(
        spark, path, mpath, {"user_id": (0, 100)}, verify=False
    )
    assert out.count() >= 0

    # rebuilt manifest is fresh again
    write_stats_manifest(spark, path, ["user_id"], mpath)
    full = spark.read.parquet(path).where(F.col("user_id").between(0, 100))
    out = skipping_scan(spark, path, mpath, {"user_id": (0, 100)})
    assert out.count() == full.count()


def test_bloom_pruned_scan_skips_files_and_stays_exact(spark, tmp_path):
    """Bloom-manifest point lookup: result identical to the full-scan IN
    filter (false positives cost I/O only), the probe really skips files
    in a layout where min/max on the probe column could prune nothing,
    an absent value returns empty, and a stale manifest fails loudly."""
    import pytest

    from bridgedownstream_spark.pipeline.layout import (
        bloom_pruned_scan,
        write_bloom_manifest,
        write_sorted,
    )

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    path = os.path.join(tmp_path, "lake")
    mpath = os.path.join(tmp_path, "bloom")
    # time-sorted layout: o_custkey is uncorrelated with the sort key, so
    # every file's custkey [min,max] spans ~the whole domain
    write_sorted(orders, path, "o_orderdate", num_files=32)
    n_files = write_bloom_manifest(spark, path, "o_custkey", mpath)
    assert n_files >= 16

    probes = [7, 99]
    out = bloom_pruned_scan(spark, path, mpath, "o_custkey", probes)
    full = spark.read.parquet(path).where(F.col("o_custkey").isin(probes))
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, full.collect()))

    # the two probed custkeys appear in far fewer than all 32 files; the
    # bloom candidate set must reflect that (allowing a few FPs)
    touched = (
        spark.read.parquet(path)
        .where(F.col("o_custkey").isin(probes))
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    assert touched < n_files // 2  # layout really scatters the keys
    n_read = len(set(out.inputFiles())) if out.inputFiles() else 0
    assert n_read < n_files  # pruning happened

    # absent value: empty result, schema preserved
    empty = bloom_pruned_scan(spark, path, mpath, "o_custkey", [10**12])
    assert empty.count() == 0
    assert empty.columns == orders.columns

    with pytest.raises(ValueError, match="empty probe"):
        bloom_pruned_scan(spark, path, mpath, "o_custkey", [])

    orders.limit(5).write.mode("append").parquet(path)
    with pytest.raises(ValueError, match="stale manifest"):
        bloom_pruned_scan(spark, path, mpath, "o_custkey", probes)
