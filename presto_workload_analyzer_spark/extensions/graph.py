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

from presto_workload_analyzer_spark.materialize import materialize


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


def triangle_counts(pairs: DataFrame) -> DataFrame:
    """Per-node triangle counts over the undirected candidate-pair graph:
    `(id, n_triangles)` for every node appearing in at least one triangle.

    Triangle density separates clique-like template clusters (mutual
    near-dups — safe to collapse to one survivor) from star/chain
    artifacts of banding (a hub doc LSH-adjacent to many docs that are
    NOT adjacent to each other — collapse would over-delete), the
    standard graph refinement between raw pairs (x02) and connected
    components (x14).

    Algorithm: degree-ordered edge orientation (the MapReduce triangle
    formulation of Suri & Vassilvitskii, WWW'11 "Counting Triangles and
    the Curse of the Last Reducer" — public literature). Every edge is
    directed from its (degree, id)-smaller endpoint to the larger; each
    triangle then has exactly one pivot with two out-edges, so a
    self-join of out-edges on the pivot enumerates every candidate wedge
    exactly once and an equi-join against the oriented edges closes it.
    The orientation caps out-degree at O(sqrt(|E|)) REGARDLESS of raw
    degree — a viral hub with a million neighbors contributes wedges
    only through its low-degree endpoints, so the "last reducer"
    quadratic of the naive neighbor self-join never happens. Cost: two
    degree aggregations + one wedge equi-join + one closing equi-join,
    all key-shuffled; no driver state.
    """
    # canonicalize so a duplicate edge reported in both orientations
    # cannot double a degree (same robustness contract as pagerank)
    # localCheckpoint: `e` is referenced twice (degree count + orientation
    # join) and `orient` three times (both wedge sides + the closing edge);
    # without materialization each reference re-plans — and on first touch
    # re-executes — the entire upstream pair pipeline, which the r15 plan
    # audit measured as a 371-Exchange plan for x100 over a 255-row edge
    # set. Edge-grain frames, the same storage class as the pair silver
    # itself (pagerank/kcore set the precedent).
    e = (
        pairs.select(
            F.least("id_a", "id_b").alias("a"), F.greatest("id_a", "id_b").alias("b")
        )
        .distinct()
        .transform(materialize)
    )
    und = e.select(F.col("a").alias("id")).unionAll(e.select(F.col("b").alias("id")))
    deg = und.groupBy("id").agg(F.count(F.lit(1)).alias("dg"))
    ed = e.join(deg.select(F.col("id").alias("a"), F.col("dg").alias("dga")), "a").join(
        deg.select(F.col("id").alias("b"), F.col("dg").alias("dgb")), "b"
    )
    lt = (F.col("dga") < F.col("dgb")) | (
        (F.col("dga") == F.col("dgb")) & (F.col("a") < F.col("b"))
    )
    orient = ed.select(
        F.when(lt, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(lt, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(lt, F.col("dgb")).otherwise(F.col("dga")).alias("dg_dst"),
    ).transform(materialize)
    e1 = orient.select("src", F.col("dst").alias("d1"), F.col("dg_dst").alias("g1"))
    e2 = orient.select("src", F.col("dst").alias("d2"), F.col("dg_dst").alias("g2"))
    # wedge endpoints ordered by the SAME (degree, id) key as the
    # orientation, so the closing edge is oriented d1 -> d2 by construction
    wedges = e1.join(e2, "src").filter(
        (F.col("g1") < F.col("g2"))
        | ((F.col("g1") == F.col("g2")) & (F.col("d1") < F.col("d2")))
    )
    closing = orient.select(F.col("src").alias("d1"), F.col("dst").alias("d2"))
    tris = wedges.join(closing, ["d1", "d2"])
    nodes = (
        tris.select(F.col("src").alias("id"))
        .unionAll(tris.select(F.col("d1").alias("id")))
        .unionAll(tris.select(F.col("d2").alias("id")))
    )
    return nodes.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )


def kcore_nodes(pairs: DataFrame, k: int = 3, max_rounds: int = 12) -> DataFrame:
    """Nodes of the k-core of the undirected pair graph: the maximal
    subgraph where every node keeps degree >= k — the standard density
    refinement above triangles: a template cluster is a high-k core,
    while banding chains/stars peel away entirely. Returns (id, degree)
    with the degree INSIDE the core.

    Algorithm: synchronous peeling — drop all nodes with degree < k,
    recompute degrees on the induced subgraph, repeat to fixpoint. Each
    round is one semi-join + one degree aggregate on the surviving edge
    set (shrinking monotonically), lineage truncated with
    localCheckpoint; rounds needed = longest peel chain, small for
    near-dup graphs. Raises RuntimeError if `max_rounds` does not reach
    the fixpoint — a half-peeled "core" is a wrong answer, never
    returned silently. The oracle unrolls the same synchronous rounds as
    chained CTEs (the x83 PageRank move), so the whole trajectory is
    hash-checked.
    """
    e = pairs.select(
        F.least("id_a", "id_b").alias("a"), F.greatest("id_a", "id_b").alias("b")
    ).distinct().localCheckpoint(eager=True)
    prev_n = None
    for _ in range(max_rounds):
        deg = (
            e.select(F.col("a").alias("id"))
            .unionAll(e.select(F.col("b").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("dg"))
        )
        keep = deg.filter(F.col("dg") >= k).select("id")
        n = keep.count()
        if n == prev_n:
            return deg.filter(F.col("dg") >= k).select(
                "id", F.col("dg").cast("long").alias("degree")
            )
        prev_n = n
        e = (
            e.join(keep.withColumnRenamed("id", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("id", "b"), "b", "left_semi")
            .localCheckpoint(eager=True)
        )
    raise RuntimeError(
        f"kcore_nodes: no fixpoint after {max_rounds} rounds — raise max_rounds"
    )
