"""Data-layout operators: Z-order clustering and total-order writes.

At 100 TB the cheapest query is the one that never reads the file: parquet
keeps per-file (and per-row-group) min/max stats, and Spark prunes files
whose stats exclude the predicate. That only works if rows are *clustered*
so each file covers a narrow value range. Two layouts:

- :func:`write_sorted` — total order on ONE key: ``repartitionByRange``
  (sampled range boundaries, skew-resistant) + ``sortWithinPartitions``.
  File k's max ≤ file k+1's min, so a point/range predicate on the key
  touches a contiguous handful of files.
- :func:`write_zordered` — interleaved-bit (Morton) order on SEVERAL keys:
  each key is bucketized onto a 2^bits grid, the bucket bits are
  interleaved into one integer, and the data is range-partitioned + sorted
  by that Z-key. Each file then covers a small *rectangle* in key space, so
  predicates on ANY clustered column (or any combination) skip most files —
  the property a single-column sort cannot give.

Both run ONE shuffle (the range exchange). Bucket boundaries come from
driver-side ``approxQuantile`` over a sample — equi-depth buckets, so
skewed keys still spread evenly across the grid (same sampling strategy
``repartitionByRange`` itself uses).

The reference's lake (dataset=/assessmentid=/year=/… Hive dirs,
json_s3_to_parquet.py:179-233) prunes on partition *columns* only; these
operators add intra-partition skipping for the high-cardinality keys
(recordid, timestamps, metrics) that can never be directory keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "zorder_key",
    "write_zordered",
    "write_sorted",
    "file_minmax",
    "write_stats_manifest",
    "skipping_scan",
    "write_bloom_manifest",
    "bloom_pruned_scan",
]


def _file_key(uri: str) -> str:
    """Scheme/escape-insensitive identity for a data file: input_file_name()
    and inputFiles() disagree on URI escaping, but within one dataset the
    part-file basenames are globally unique (UUID-suffixed)."""
    from urllib.parse import unquote

    return unquote(uri).rsplit("/", 1)[-1]


def _bucket_cols(df: DataFrame, cols: list[str], bits: int) -> list[Column]:
    """Equi-depth bucket ids in [0, 2^bits) for every ``cols`` entry, from
    sampled quantile boundaries — ONE approxQuantile job covers all
    dimensions."""
    n = (1 << bits) - 1
    probs = [i / (n + 1) for i in range(1, n + 1)]
    # 1% error at the cuts: boundary wobble moves rows one grid cell at
    # most — harmless for clustering, cheap on a 100 TB sample
    doubled = df.select(
        *[F.col(c).cast("double").alias(f"_q{i}") for i, c in enumerate(cols)]
    )
    all_cuts = doubled.approxQuantile(
        [f"_q{i}" for i in range(len(cols))], probs, 0.01
    )
    out: list[Column] = []
    for col, cuts in zip(cols, all_cuts):
        # strictly-increasing unique cuts; duplicates appear on
        # low-cardinality or heavily-skewed columns and would create empty
        # buckets (harmless) but bloat the literal array
        uniq: list[float] = []
        for c in cuts:
            if not uniq or c > uniq[-1]:
                uniq.append(c)
        arr = "array(" + ", ".join(f"{c!r}D" for c in uniq) + ")"
        # bucket = number of boundaries ≤ value: a constant-folded literal
        # array + one filter HOF per row, no join, no shuffle
        out.append(
            F.expr(
                f"size(filter({arr}, b -> b <= CAST({col} AS DOUBLE)))"
            ).cast("long")
        )
    return out


def zorder_key(df: DataFrame, cols: list[str], bits: int = 8) -> Column:
    """Morton (Z-curve) key: interleave the ``bits``-wide equi-depth bucket
    ids of ``cols`` into one long. Rows close on the Z-key are close in
    EVERY clustered dimension."""
    if not 1 <= len(cols) * bits <= 63:
        raise ValueError("zorder_key: need 1 <= len(cols)*bits <= 63")
    buckets = _bucket_cols(df, cols, bits)
    ndim = len(cols)
    z = F.lit(0).cast("long")
    for d, b in enumerate(buckets):
        for i in range(bits):
            # bit i of dim d lands at interleaved position i*ndim + d
            z = z.bitwiseOR(
                b.bitwiseAND(F.lit(1 << i)).cast("long")
                * F.lit(1 << (i * (ndim - 1) + d))
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered on the Z-key of ``cols``.

    One range exchange (sampled boundaries on the Z-key) + in-partition
    sort; the Z-key is a derived expression, never a stored column."""
    z = zorder_key(df, cols, bits=bits)
    (
        df.repartitionByRange(num_files, z)
        .sortWithinPartitions(z)
        .write.mode(mode)
        .parquet(path)
    )


def write_sorted(
    df: DataFrame,
    path: str,
    col: str,
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Total-order parquet write on one key: global order across files via
    range partitioning, order within files via the partition sort."""
    (
        df.repartitionByRange(num_files, F.col(col))
        .sortWithinPartitions(col)
        .write.mode(mode)
        .parquet(path)
    )


def file_minmax(spark, path: str, cols: list[str]) -> DataFrame:
    """Per-file min/max of ``cols`` for a parquet dataset — the same stats
    the scan's file-skipping consults, surfaced as a DataFrame so layout
    quality is measurable (files whose [min,max] box intersects a predicate
    box = files a query must read)."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(*aggs)
    )


def write_stats_manifest(
    spark, path: str, cols: list[str], manifest_path: str
) -> int:
    """Persist :func:`file_minmax` as the dataset's data-skipping manifest
    (the Iceberg/Delta manifest idea on plain parquet): per-file [min,max]
    boxes for ``cols``, written once per layout rewrite, consulted by
    :func:`skipping_scan` at query time. Returns the file count.

    At 100 TB the manifest is the difference between planning costing a
    LISTING (+ every footer) and costing a scan of a table 6-8 orders of
    magnitude smaller than the data; rebuild it whenever the layout is
    rewritten (compaction / z-order), exactly as table formats version
    their manifests."""
    stats = file_minmax(spark, path, cols)
    stats.write.mode("overwrite").parquet(manifest_path)
    return spark.read.parquet(manifest_path).count()


def skipping_scan(
    spark,
    path: str,
    manifest_path: str,
    predicates: dict[str, tuple],
    verify: bool = True,
) -> DataFrame:
    """Manifest-pruned scan: read ONLY the files whose stats box intersects
    every ``{col: (lo, hi)}`` closed interval, then re-apply the exact
    predicates to the surviving rows (stats prune files, they never decide
    row membership — same contract as parquet row-group skipping).

    The planning side touches the manifest only: its intersection filter
    collects a FILE LIST (bounded by the file count — the same object
    every query planner materializes), never data rows. A file whose
    stats are NULL for a predicate column holds only NULL values there
    and cannot satisfy a range predicate, so dropping it is exact.

    ``verify=True`` (default) lists the dataset and raises if the manifest
    file set diverges — a manifest older than the data would otherwise
    silently exclude every file written after it. The check costs one
    directory LISTING (no footer reads — the same listing a plain scan
    performs anyway); pass ``verify=False`` only when the caller owns
    manifest freshness (e.g. the compaction job that just rebuilt it).
    """
    if not predicates:
        raise ValueError(
            "skipping_scan: empty predicates dict — nothing to prune on; "
            "use spark.read.parquet(path) for a full scan"
        )
    m = spark.read.parquet(manifest_path)
    if verify:
        _verify_manifest(spark, path, m, manifest_path)
    cond = None
    for c, (lo, hi) in predicates.items():
        p = (F.col(f"max_{c}") >= F.lit(lo)) & (F.col(f"min_{c}") <= F.lit(hi))
        cond = p if cond is None else cond & p
    files = [r["file"] for r in m.where(cond).select("file").collect()]
    if not files:
        # preserve the dataset schema for downstream plans
        return spark.read.parquet(path).limit(0)
    df = spark.read.parquet(*files)
    for c, (lo, hi) in predicates.items():
        df = df.where(F.col(c).between(F.lit(lo), F.lit(hi)))
    return df


def _verify_manifest(spark, path: str, m: DataFrame, manifest_path: str):
    """Raise if the manifest's file set diverges from the dataset listing
    (shared stale-manifest guard for min/max and bloom manifests)."""
    actual = {_file_key(f) for f in spark.read.parquet(path).inputFiles()}
    listed = {
        _file_key(r["file"]) for r in m.select("file").distinct().collect()
    }
    if actual != listed:
        missing = sorted(actual - listed)[:5]
        gone = sorted(listed - actual)[:5]
        raise ValueError(
            f"stale manifest {manifest_path!r}: dataset has "
            f"{len(actual)} files, manifest lists {len(listed)}. "
            f"Unlisted files the scan would silently drop: {missing}; "
            f"listed files no longer present: {gone}. Rebuild the "
            "manifest after every layout rewrite."
        )


def _bloom_positions(col: Column, bits: int, k: int) -> Column:
    """Array of ``k`` bloom bit positions for a value: xxhash64 with k
    distinct seed columns, pmod onto the [0, bits) bit space."""
    return F.array(
        *[
            F.pmod(F.xxhash64(col, F.lit(s)), F.lit(bits))
            for s in range(k)
        ]
    )


def write_bloom_manifest(
    spark,
    path: str,
    col: str,
    manifest_path: str,
    bits: int = 32768,
    k: int = 3,
) -> int:
    """Per-FILE Bloom filter manifest for point lookups on a
    high-cardinality column (the Delta/Iceberg bloom-index idea on plain
    parquet): each data file's distinct ``col`` values set ``k`` bits in a
    ``bits``-wide filter, stored as (file, word_idx, word) 64-bit rows.

    Min/max boxes (:func:`write_stats_manifest`) only prune when the
    layout CLUSTERS the predicate column; a bloom manifest prunes point
    lookups on any column regardless of layout — the complement that
    covers "find these ids in a lake sorted by time".

    Sizing: with n distinct keys per file, FP rate ≈ (1-e^(-k·n/bits))^k;
    the 32768/3 default gives <1% at n≈2000. The manifest is
    files × bits/64 rows — still orders of magnitude below the data.
    Returns the data file count. NULLs are not indexed (a NULL never
    equals a probe value).
    """
    e = (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("file"), F.col(col).alias("v"))
        .where(F.col("v").isNotNull())
        .distinct()
    )
    words = (
        e.select(
            "file",
            F.explode(_bloom_positions(F.col("v"), bits, k)).alias("pos"),
        )
        .select(
            "file",
            F.expr("pos div 64").alias("word_idx"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("file", "word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )
    words.write.mode("overwrite").parquet(manifest_path)
    return spark.read.parquet(manifest_path).select("file").distinct().count()


def bloom_pruned_scan(
    spark,
    path: str,
    manifest_path: str,
    col: str,
    values: list,
    bits: int = 32768,
    k: int = 3,
    verify: bool = True,
) -> DataFrame:
    """Bloom-manifest-pruned point lookup: read ONLY the files whose bloom
    filter claims at least one probe value, then re-apply the exact
    ``col IN values`` filter (the bloom decides file membership with
    false POSITIVES only — never row membership, and never false
    negatives, so the result is exact).

    Planning touches the manifest and a k×|values| probe list only; the
    candidate file list is bounded by the file count. ``bits``/``k`` must
    match the manifest build. ``verify`` as in :func:`skipping_scan`.
    """
    if not values:
        raise ValueError(
            "bloom_pruned_scan: empty probe list — nothing to look up"
        )
    m = spark.read.parquet(manifest_path)
    if verify:
        _verify_manifest(spark, path, m, manifest_path)
    dtype = dict(spark.read.parquet(path).dtypes)[col]
    probes = (
        spark.createDataFrame([(v,) for v in values], f"v {dtype}")
        .select(
            "v",
            F.explode(_bloom_positions(F.col("v"), bits, k)).alias("pos"),
        )
        .select(
            "v",
            F.expr("pos div 64").alias("word_idx"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("bit"),
        )
    )
    hits = (
        m.join(F.broadcast(probes), "word_idx")
        .where(F.col("word").bitwiseAND(F.col("bit")) == F.col("bit"))
        .groupBy("file", "v")
        .agg(F.count("*").alias("n_set"))
        .where(F.col("n_set") == k)
        .select("file")
        .distinct()
    )
    files = [r["file"] for r in hits.collect()]
    if not files:
        return spark.read.parquet(path).where(F.lit(False))
    return spark.read.parquet(*files).where(F.col(col).isin(values))
