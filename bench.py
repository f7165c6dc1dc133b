"""Benchmark harness: run every ``queries()`` entry at the configured scale
factor and print ONE JSON line the driver parses into ``BENCH_r{N}.json``.

Usage::

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py [query ...]

Environment:
- ``SPARK_GRAFT_SF_DIR`` — testdata dir (default ``/root/testdata/sf0.1``)
- ``SPARK_GRAFT_CPUS``   — local[] parallelism / shuffle partitions (default 32)

Each query is timed end-to-end (plan build + execution); results are
materialized with a cheap count-style action so driver-side result transfer
(``collect``) doesn't dominate the measurement for wide results. The metric
is total wall seconds across all queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bridgedownstream_spark.queries import REGISTRY  # noqa: E402
from bridgedownstream_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or list(REGISTRY)
    # sf for the report: parse the trailing sfX.Y path component if present.
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        sf = float(base.replace("sf", "")) if base.startswith("sf") else None
    except ValueError:
        sf = None

    spark = get_spark("bench")
    # Warm up the session (JVM, parquet footer reads) outside the timed region
    # with the cheapest table so query 1 isn't charged the startup cost.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    per_query: dict[str, float] = {}
    failures: dict[str, str] = {}
    for name in names:
        fn = REGISTRY[name][0]
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            # Force full execution of every operator in the plan without
            # shipping the result to the driver: count over all columns'
            # worth of rows. AQE may prune, so use the write-less action
            # foreach-noop via count on the un-projected frame.
            df.count()
            per_query[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001
            failures[name] = f"{type(e).__name__}: {e}"

    total = round(sum(per_query.values()), 3)
    report = {
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
        "n_queries": len(per_query),
    }
    if failures:
        report["failures"] = failures
    print(json.dumps(report))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
