"""Graph analytics over candidate-pair graphs: PageRank centrality.

Beyond-reference LLM-pipeline surface (the reference has no graph ops; its
nearest relative is the joins_sides pairing loop, analyzer.py's eager
dicts). Near-dup candidate pairs (x02) form a graph whose structure
carries curation signal beyond connectivity (x14's components): a doc
that is LSH-similar to many well-connected docs is template/boilerplate
mass, and PageRank is the standard centrality for "how much duplication
gravity does this node have".

Execution model mirrors dedup.connected_components: per-iteration
equi-join + key-shuffled aggregate, lineage truncated each round with
localCheckpoint so the plan stays flat; no driver-side data beyond the
loop counter. Cost per round is |edges| shuffled on key — at 100 TB the
edge set is the LSH candidate output (already bucket-bounded), and
iterations are a fixed small constant, so the whole thing is
O(iters x |edges|) with no quadratic term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    pairs: DataFrame, iters: int = 5, damping: float = 0.85
) -> DataFrame:
    """Fixed-iteration PageRank over the undirected pair graph:
    `(id, rank)` after `iters` synchronous power iterations.

    rank_0 = 1.0; rank_{t+1}(v) = (1 - damping) + damping * sum over
    neighbors u of rank_t(u) / deg(u). Every node in a pair has deg >= 1
    and (undirected symmetry) receives mass each round, so the node set
    is stable across iterations. Fixed iteration count (not
    convergence-tested) keeps the result an exact closed form both
    engines can replay — the driver oracle unrolls the same recurrence
    as chained SQL CTEs.

    Ranks are sums of O(|edges|) doubles; cross-engine agreement is to
    ~1e-15 per iteration, far inside the 6-decimal output rounding.
    """
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
                    F.struct(F.col("id_b").alias("src"), F.col("id_a").alias("dst")),
                )
            ).alias("e")
        )
        .select(F.col("e.src").alias("src"), F.col("e.dst").alias("dst"))
        .distinct()
    )
    # out-degree rides along on every edge: one join before the loop, so
    # each iteration is exactly one join + one aggregate
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("__dg"))
    contrib_edges = edges.join(deg, on="src").persist()
    ranks = (
        contrib_edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.lit(1.0).alias("rank"))
        .localCheckpoint(eager=True)
    )
    try:
        for _ in range(iters):
            ranks = (
                contrib_edges.join(
                    ranks.select(F.col("id").alias("src"), "rank"), on="src"
                )
                .groupBy("dst")
                .agg(
                    (
                        F.lit(1.0 - damping)
                        + F.lit(damping) * F.sum(F.col("rank") / F.col("__dg"))
                    ).alias("rank")
                )
                .select(F.col("dst").alias("id"), "rank")
                .localCheckpoint(eager=True)
            )
        return ranks
    finally:
        contrib_edges.unpersist()
