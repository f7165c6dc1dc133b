"""Connected components by iterative min-label propagation.

The last step of near-duplicate removal: LSH emits *pairs*, but dedup
needs *clusters* (a≈b, b≈c ⇒ {a,b,c} keeps one representative). That is
connected components — an inherently iterative computation (the brief's
"iterative algorithms" class; no single SQL pass expresses transitive
closure).

Spark-first shape: Pregel-style label propagation as a driver-side loop
over DataFrame joins. Each node starts labeled with itself; each round
every node takes the min of its own and its neighbors' labels; the loop
stops when a round changes nothing. Convergence: labels are monotonically
non-increasing and bounded by the component min, and the fixpoint is
reached within graph-diameter rounds — for near-dup graphs the diameter
is tiny (clusters are cliques-ish), so 2–4 rounds in practice.

Scale notes: per round = one join on dst + one groupBy on src — both
shuffle on node id; ``localCheckpoint`` truncates the growing lineage so
round N's plan doesn't replay rounds 1..N-1 (the classic iterative-Spark
trap); the convergence probe is a count per round, amortized against the
round's own shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 20
) -> DataFrame:
    """``(node, component)`` for every node in ``edges``; ``component`` is
    the smallest node id in the node's connected component.

    Edges are treated as undirected (symmetrized internally). Raises if
    the fixpoint is not reached within ``max_iter`` rounds — a graph with
    that diameter needs the alternating large/small-star variant, not a
    bigger limit.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # Materialize the (symmetrized) edge list ONCE: every round joins
    # against it, and without this the whole upstream plan (e.g. the
    # MinHash+LSH pipeline that produced the pairs) re-executes per round.
    sym = e.union(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        # Carry the previous label through the checkpoint so the
        # convergence probe is a scan+count of the materialized result,
        # not another join against the old labels.
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.a, "left")
            .select(
                "node",
                F.col("label").alias("prev"),
                F.least(
                    "label", F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)  # truncate iterative lineage
        )
        changed = new_labels.where(F.col("prev") != F.col("label")).count()
        labels = new_labels.select("node", "label")
        if changed == 0:
            return labels.select(F.col("node"), F.col("label").alias("component"))
    raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
