"""connected_components: transitive closure to min-label, chains and
separate components, convergence within diameter rounds."""

from __future__ import annotations

from bridgedownstream_spark.operators.components import connected_components


def test_chain_and_islands(spark):
    # 1-2-3-4 chain (diameter 3), {10,11} pair, {20,21,22} triangle
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "src long, dst long",
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_direction_irrelevant(spark):
    fwd = spark.createDataFrame([(5, 1), (1, 9)], "src long, dst long")
    rev = spark.createDataFrame([(1, 5), (9, 1)], "src long, dst long")
    a = sorted(tuple(r) for r in connected_components(fwd).collect())
    b = sorted(tuple(r) for r in connected_components(rev).collect())
    assert a == b == [(1, 1), (5, 1), (9, 1)]
