"""Per-query profiling: split wall time into DataFrame build (Python +
analysis), planning (explain), and execution (the bench materialize), and
optionally dump ``explain("formatted")`` to a file per query.

Usage::

    python tools/profile_queries.py [--plans DIR --suffix _before] \
        [--reps N] [sf_dir] query [query ...]

Writes one line per query: build_s, explain_s, exec_s (min over reps).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bridgedownstream_spark.queries import REGISTRY  # noqa: E402
from bridgedownstream_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    plans_dir = None
    suffix = ""
    reps = 1
    while args and args[0].startswith("--"):
        if args[0] == "--plans":
            plans_dir = args[1]
            args = args[2:]
        elif args[0] == "--suffix":
            suffix = args[1]
            args = args[2:]
        elif args[0] == "--reps":
            reps = int(args[1])
            args = args[2:]
        else:
            raise SystemExit(f"unknown flag {args[0]}")
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    names = args or list(REGISTRY)

    import bench

    spark = get_spark("profile")
    # identical warmup to bench.py so first-query costs match
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", sf_dir)
    sys.argv = ["bench.py", names[0]]  # subset → BENCH_LAST, not BENCH_FULL

    from pyspark.sql import functions as F

    for t in ("region", "lineitem", "documents", "embeddings", "events",
              "orders", "customer", "part", "supplier", "nation"):
        try:
            df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
            df.agg(*[F.count(c).alias(f"c{i}") for i, c in enumerate(df.columns)]).collect()
        except Exception:  # noqa: BLE001
            pass

    def _noop(batches):
        for b in batches:
            yield b

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(cpus * 4, numPartitions=cpus).mapInPandas(_noop, schema="id long").count()
    # (r9: no ANN/LSH index pre-builds — bench.py dropped them as
    # cross-run result caching; the profile mirrors the bench protocol)
    from bridgedownstream_spark.queries import pipeline_q as _pq_mod

    for nm in dir(_pq_mod):
        if nm.startswith("_build_"):
            try:
                getattr(_pq_mod, nm)(spark, sf_dir)
            except Exception as e:  # noqa: BLE001
                print(f"warmup {nm}: {e!r}", file=sys.stderr)

    print(f"{'query':35s} {'build':>7s} {'explain':>8s} {'exec':>7s}")
    for name in names:
        fn = REGISTRY[name][0]
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            t2 = time.perf_counter()
            bench.materialize(df)
            t3 = time.perf_counter()
            row = (t1 - t0, t2 - t1, t3 - t2)
            if best is None or sum(row) < sum(best):
                best = row
        print(f"{name:35s} {best[0]:7.2f} {best[1]:8.2f} {best[2]:7.2f}")
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            with open(os.path.join(plans_dir, f"{name}{suffix}.txt"), "w") as fh:
                fh.write(plan)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
