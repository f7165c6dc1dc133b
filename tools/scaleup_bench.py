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


def build(
    copies: int = 10, tables: list[str] | None = None, jitter: bool = False
) -> str:
    """Build (or reuse) the ``copies``x replica; returns its directory.

    ``tables`` limits replication to the named fact tables (dims are
    always copied) — the 100x build replicates only what its target
    queries read, so the build stays minutes, not an hour.

    ``jitter`` additionally perturbs CONTINUOUS measure columns per copy
    (events.value += i * 1e-7) so distinct-VALUE counts scale with rows.
    The plain copier keeps count(distinct value) constant, which makes
    any "bounded by the value domain" scale argument untestable by the
    gate's own methodology (the r8 verdict's blind spot: ks_two_sample /
    mann_whitney_u carried a corpus-proportional single-task window that
    plain 100x copies could never expose). Jittered replicas live in a
    separate directory; key shifts and salts are identical.
    """
    dst = f"/tmp/bds_scaleup_sf0.1_x{copies}" + ("_jit" if jitter else "")
    done = os.path.join(dst, "_DONE")
    wanted = SHIFTS if tables is None else {
        t: SHIFTS[t] for t in tables if t in SHIFTS
    }
    if os.path.exists(done):
        content = open(done).read().split()
        # legacy marker (empty file) predates per-table tracking: it was
        # only ever written after a full-SHIFTS build
        built = set(content) if content else set(SHIFTS)
        if set(wanted) <= built:
            return dst
    else:
        built = set()
    from pyspark.sql import functions as F

    from bridgedownstream_spark.session import get_spark

    spark = get_spark("scaleup-build")
    os.makedirs(dst, exist_ok=True)
    for t in ("region", "nation"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
    # vector rotation must stay within the embedding dimensionality
    emb_dim = len(
        spark.read.parquet(f"{SRC}/embeddings.parquet").first()["embedding"]
    )
    for t, shifts in wanted.items():
        if t in built:
            continue
        src = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = []
        for i in range(copies):
            d = src
            for col, stride in shifts.items():
                if col in d.columns:
                    d = d.withColumn(col, F.col(col) + F.lit(i * stride))
            if jitter and t == "events" and i > 0:
                # distinct-value domain grows ~linearly with copies: each
                # copy's value set is disjoint from every other's (shifts
                # of 1e-7 are exactly representable next to O(1..1e4)
                # magnitudes and far below any bucket width, so bucketed
                # statistics barely move while distinct counts multiply)
                d = d.withColumn("value", F.col("value") + F.lit(i * 1e-7))
            if t == "documents" and i > 0:
                # salt every 5th word with the copy index: cross-copy
                # jaccard drops below any near-dup threshold while
                # per-copy dup structure survives
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
                # the fuzzy-ER query `copies` identical versions of every
                # name inside one block (copies^2 candidate pairs by
                # construction — degenerate structure no real catalog
                # growth produces, same rationale as the documents
                # word-salt). Salted at BOTH ends: prefix-only salting
                # leaves the name SUFFIX shared across copies, which
                # degenerates the two-pass matcher's suffix block the
                # same way (measured 3.3x).
                d = d.withColumn(
                    "p_name", F.expr(f"concat('c{i} ', p_name, ' c{i}')")
                )
            if t == "embeddings" and i > 0:
                # rotate the vector by i (mod dim) positions per copy:
                # preserves the norm while decorrelating copies —
                # unrotated clones would hand every ANN/PQ query exact
                # duplicates of its own vector, degenerate structure no
                # real corpus growth has
                rot = i % emb_dim
                if rot:
                    d = d.withColumn(
                        "embedding",
                        F.expr(
                            f"concat(slice(embedding, {rot + 1}, "
                            f"size(embedding) - {rot}), "
                            f"slice(embedding, 1, {rot}))"
                        ),
                    )
            parts.append(d)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        built.add(t)
        with open(done, "w") as f:
            f.write(" ".join(sorted(built)))
    return dst


if __name__ == "__main__":
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    tables = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    print(build(copies, tables))
