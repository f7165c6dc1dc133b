"""Composition tests for the quality-aware dedup resolution and the
dedup-graph triangle metric: the full LSH → components → election stack on
planted duplicate families."""

from __future__ import annotations

import pytest

from bridgedownstream_spark.queries import similarity


@pytest.fixture(scope="module")
def dup_docs_dir(spark, tmp_path_factory):
    """Planted families: {3,10} near-identical with doc 10 RICHER (more
    distinct tokens — the higher id must win the election); {20,21,22}
    an exact-duplicate triangle; 5 a singleton."""
    path = str(tmp_path_factory.mktemp("dupbest") / "lake")
    base = " ".join(f"w{i}" for i in range(30))
    tri = " ".join(f"t{i}" for i in range(25))
    rows = [
        (3, base, "en", "s", 0),
        (10, base + " extra1 extra2", "en", "s", 0),
        (5, " ".join(f"solo{i}" for i in range(20)), "en", "s", 0),
        (20, tri, "en", "s", 0),
        (21, tri, "en", "s", 0),
        (22, tri, "en", "s", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    return path


def test_keep_best_elects_richest_not_lowest_id(spark, dup_docs_dir):
    out = {r.doc_id: r for r in similarity.near_dup_keep_best(spark, dup_docs_dir).collect()}
    assert 5 not in out                       # singleton: not in any cluster
    assert out[3].component == out[10].component == 3
    assert out[10].keep and not out[3].keep   # richer doc wins despite higher id
    assert out[10].uq == 32 and out[3].uq == 30
    # exact-duplicate triangle: identical quality -> lowest id breaks the tie
    assert out[20].keep and not out[21].keep and not out[22].keep
    assert sum(r.keep for r in out.values()) == 2


def test_triangle_metric_counts_cliques_once(spark, dup_docs_dir):
    r = similarity.dedup_graph_triangles(spark, dup_docs_dir).collect()[0]
    assert r.n_nodes == 5                     # {3,10} + {20,21,22}
    assert r.n_edges == 4                     # 1 pair edge + 3 triangle edges
    assert r.n_triangles == 1                 # the clique counted exactly once
