"""Reproducible 10x/100x scale-up harness for SCALE.md's measured table.

Builds a deterministic Nx replica of the sf0.1 testdata under /tmp
(keys shifted per copy so cardinalities grow honestly; document texts
word-salted per copy so near-dup structure stays PER-COPY instead of
creating N-way cross-copy duplicate cliques that no real corpus growth
would produce), then the caller times the headline queries with bench.py
against both directories:

    python tools/scaleup_bench.py          # build 10x replica, print dir
    python tools/scaleup_bench.py 100      # build 100x replica, print dir
    for i in 1 2 3; do
        SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py <queries>
        SPARK_GRAFT_SF_DIR=$(python tools/scaleup_bench.py) python bench.py <queries>
    done

Take the min per config per query (the SCALE.md methodology). The 100x
replica (~60 M lineitem rows / ~500 k documents) is where shuffle
partition counts, Pregel round counts, and the LSH band-index size first
bind — the 10x point mostly measures idle-core absorption on local[32].
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"

#: per-table key columns to shift by copy_index * stride (stride chosen
#: past each key's sf0.1 range so copies never collide)
SHIFTS = {
    "lineitem": {
        "l_orderkey": 10_000_000,
        "l_partkey": 1_000_000,
        "l_suppkey": 1_000_000,
    },
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "customer": {"c_custkey": 1_000_000},
    "part": {"p_partkey": 1_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "events": {"event_id": 100_000_000, "user_id": 100_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
    # nation/region are bounded dims: copied once, never replicated
}


def build() -> str:
    if os.path.exists(os.path.join(DST, "_DONE")):
        return DST
    from pyspark.sql import functions as F

    from bridgedownstream_spark.session import get_spark

    spark = get_spark("scaleup-build")
    os.makedirs(DST, exist_ok=True)
    for t in ("region", "nation"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )
    for t, shifts in SHIFTS.items():
        src = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = []
        for i in range(COPIES):
            d = src
            for col, stride in shifts.items():
                if col in d.columns:
                    d = d.withColumn(col, F.col(col) + F.lit(i * stride))
            if t == "documents" and i > 0:
                # salt every 5th word: cross-copy jaccard drops below any
                # near-dup threshold while per-copy dup structure survives
                d = d.withColumn(
                    "text",
                    F.expr(
                        f"array_join(transform(split(text, ' '), (w, j) -> "
                        f"CASE WHEN j % 5 = 0 THEN concat('s{i}', w) "
                        f"ELSE w END), ' ')"
                    ),
                )
            if t == "part" and i > 0:
                # distinct name space per copy: unsalted clones would give
                # the fuzzy-ER query 10 identical copies of every name
                # inside one block (100x candidate pairs by construction —
                # degenerate structure no real catalog growth produces,
                # same rationale as the documents word-salt). Salted at
                # BOTH ends: prefix-only salting leaves the name SUFFIX
                # shared across copies, which degenerates the two-pass
                # matcher's suffix block the same way (measured 3.3x).
                d = d.withColumn(
                    "p_name", F.expr(f"concat('c{i} ', p_name, ' c{i}')")
                )
            if t == "embeddings" and i > 0:
                # rotate the vector by i positions per copy: preserves the
                # norm while decorrelating copies — unrotated clones would
                # hand every ANN/PQ query 10 exact duplicates of its own
                # vector, degenerate structure no real corpus growth has
                d = d.withColumn(
                    "embedding",
                    F.expr(
                        f"concat(slice(embedding, {i + 1}, "
                        f"size(embedding) - {i}), slice(embedding, 1, {i}))"
                    ),
                )
            parts.append(d)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
    open(os.path.join(DST, "_DONE"), "w").close()
    return DST


if __name__ == "__main__":
    print(build())
