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


def test_jaccard_prefix_join_exact_pairs(spark, dup_docs_dir):
    """On the planted families: the exact-duplicate triangle {20,21,22}
    yields all three pairs at jac_bp=10000; {3,10} (28 shared of 30
    union shingles, J=0.933 >= 0.8) passes with exact integer counts;
    the singleton appears in no pair, and nothing else does either."""
    got = {
        (r.doc_a, r.doc_b): (r.inter, r.uni, r.jac_bp)
        for r in similarity.jaccard_prefix_join(spark, dup_docs_dir).collect()
    }
    assert (20, 21) in got and (20, 22) in got and (21, 22) in got
    assert got[(20, 21)] == (23, 23, 10000)  # 25 words -> 23 shingles
    # {3, 10}: base has 28 shingles, richer doc 30; all 28 shared
    assert got[(3, 10)] == (28, 30, 10000 * 28 // 30)
    assert all(5 not in p for p in got)
    assert set(got) == {(20, 21), (20, 22), (21, 22), (3, 10)}


def test_prefix_filter_prunes_but_loses_no_pair(spark):
    """On real sf0.001 documents, the prefix-shingle candidate join must
    generate strictly fewer pairs than the brute-force any-shared-shingle
    join (the pruning is real), while every surviving >=0.8 pair of the
    brute-force path appears in the query output (the pruning is safe)."""
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    sh = similarity._shingled(spark, sf)
    e = sh.select("doc_id", F.explode("sh").alias("s")).distinct()
    ea, eb = e.alias("ea"), e.alias("eb")
    brute_pairs = (
        ea.join(
            eb,
            (F.col("ea.s") == F.col("eb.s"))
            & (F.col("ea.doc_id") < F.col("eb.doc_id")),
        )
        .select("ea.doc_id", "eb.doc_id")
        .distinct()
    )
    n_brute = brute_pairs.count()

    shd = sh.select("doc_id", F.array_distinct("sh").alias("sh"))
    sa, sb = shd.alias("sa"), shd.alias("sb")
    truth = {
        (r.doc_a, r.doc_b)
        for r in sa.join(sb, F.col("sa.doc_id") < F.col("sb.doc_id"))
        .select(
            F.col("sa.doc_id").alias("doc_a"),
            F.col("sb.doc_id").alias("doc_b"),
            F.size(F.array_intersect("sa.sh", "sb.sh")).alias("i"),
            F.size(F.array_union("sa.sh", "sb.sh")).alias("u"),
        )
        .where(F.col("i") * 5 >= F.col("u") * 4)
        .collect()
    }
    got = {
        (r.doc_a, r.doc_b)
        for r in similarity.jaccard_prefix_join(spark, sf).collect()
    }
    assert got == truth
    # sanity: the brute-force candidate space is non-trivial, so the
    # exact-match above actually exercised pruning decisions
    assert n_brute > len(got)


def test_semdedup_rank_one_always_kept_and_prunes_are_justified(spark):
    """SemDeDup invariants on the real sf0.001 embeddings: (a) every
    cell's most-typical member (rank 1) is kept — pruning is strictly
    toward earlier ranks, so a cell can never empty itself; (b) at least
    one prune fires (the corpus has same-label near-dups); (c) output
    covers every vector exactly once."""
    out = similarity.semdedup_prune(spark, "/root/testdata/sf0.001").collect()
    n_emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).count()
    assert len(out) == n_emb
    assert len({r.vec_id for r in out}) == n_emb
    assert all(r.kept for r in out if r.typicality_rank == 1)
    assert any(not r.kept for r in out)


def test_semdedup_plan_pairs_on_cell_never_all_pairs(spark):
    """The pair stage must be an equi-join on cell id (hash join), never a
    cartesian: the ONLY nested-loop allowed is the Theta(cells) centroid
    assignment broadcast."""
    from bridgedownstream_spark.queries import REGISTRY

    df = REGISTRY["semdedup_prune"][0](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the pair stage keys on cell id — any equi strategy is fine, a
    # nested-loop over vector pairs is not
    assert (
        "SortMergeJoin [cell" in plan
        or "BroadcastHashJoin [cell" in plan
        or "ShuffledHashJoin [cell" in plan
    )
    # zero nested-loops in the search plan: the Theta(cells) centroid
    # assignment broadcast lives INSIDE the checkpointed ranked frame and
    # runs once — if it reappears here, a consumer is recomputing it
    assert plan.count("BroadcastNestedLoopJoin") == 0


@pytest.fixture(scope="module")
def agree_dir(spark, tmp_path_factory):
    """Planted disagreement corpus for the MinHash-vs-SemDeDup audit:
    docs 0/1 are lexically identical but embedded ORTHOGONALLY (text-dup
    only — the boilerplate case); docs 2/3 are lexically unrelated but
    embedded identically (semantic-dup only — the paraphrase case).
    n=4 -> stride=2 -> centroids {0, 2}."""
    path = str(tmp_path_factory.mktemp("agree") / "lake")
    same = " ".join(f"boiler{i}" for i in range(20))
    rows = [
        (0, same, "en", "s", 0),
        (1, same, "en", "s", 0),
        (2, " ".join(f"alpha{i}" for i in range(20)), "en", "s", 0),
        (3, " ".join(f"beta{i}" for i in range(20)), "en", "s", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    embs = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.0, 1.0, 0.0, 0.0], 0),   # orthogonal to its text twin
        (2, [0.0, 0.0, 1.0, 0.0], 1),
        (3, [0.0, 0.0, 1.0, 0.0], 1),   # identical to lexically-unrelated 2
    ]
    spark.createDataFrame(
        embs, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/embeddings.parquet")
    return path


def test_dedup_agreement_audit_separates_the_two_stacks(spark, agree_dir):
    """The audit's whole point: the two dedup stacks disagree on exactly
    the planted rows. Text flags {0,1}; SemDeDup prunes exactly one of
    {2,3} (the less typical same-cell twin) and keeps rank-1 members."""
    out = {
        (r.text_dup, r.sem_pruned): r.n_docs
        for r in similarity.dedup_agreement_audit(spark, agree_dir).collect()
    }
    # docs 0,1: text-dup, never sem-pruned (orthogonal embeddings)
    assert out.get((True, False)) == 2
    assert (True, True) not in out
    # one of docs 2,3 pruned semantically, the other kept
    assert out.get((False, True)) == 1
    assert out.get((False, False)) == 1


def test_matryoshka_curve_full_dim_anchor(spark):
    """dim = 64 is the curve's built-in truth anchor: the coarse rank IS
    the full rank, so recall@3 must be exactly 1.0; every other dim's
    recall is a valid fraction and the curve covers exactly the declared
    dims."""
    rows = {
        r.trunc_dim: r
        for r in similarity.ann_matryoshka_curve(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert sorted(rows) == [8, 16, 32, 64]
    assert rows[64].n_hits == 15 and rows[64].recall == 1.0
    for d, r in rows.items():
        assert 0 <= r.n_hits <= 15 and 0.0 <= r.recall <= 1.0
