"""Skew stress for the dup-graph operator family (round-5 verdict item 6).

The round-5 scaling campaign measured the graph family (x83 PageRank,
x100 triangles, x123 k-core) on replica-decorrelated data, where dup
clusters stay small and uniform. A real crawl is power-law: one viral
template can put 10% of the corpus into a SINGLE near-dup component with
a hub node of enormous degree — the "curse of the last reducer" input.
This tool plants exactly that graph shape and MEASURES the operators on
it at two scales, proving (not arguing) that:

  * triangle_counts' degree-ordered orientation caps the max out-degree
    at O(sqrt(|E|)) even though the raw hub degree is n/10 — the wedge
    join never sees a quadratic hub;
  * the per-node triangle counts stay EXACTLY right under skew (the
    planted clique's closed form C(59,2) per member, zero from the star
    and the tree tail);
  * pagerank and kcore_nodes scale linearly in |E| — their per-round
    cost is a key-shuffled join/aggregate, and a hub key is an AQE
    skew-partition problem, never an algorithmic blow-up.

Planted graph (deterministic, no RNG):
  * mega-star: node 0 adjacent to nodes 1..n/10 — ONE component holding
    10% of all nodes, hub degree n/10 (the viral-template cluster);
  * clique: nodes [n/2, n/2+60) fully connected — 34,220 triangles with
    a closed-form per-node count;
  * tree tail: every other node i attaches to i // 7 — power-law-ish
    old-node preference, zero triangles by construction.

Usage: python tools/skew_graph.py [n] [mult]   (defaults: 20000, 10)
Prints per-operator wall at n and n*mult and the slope, plus the
measured max oriented out-degree vs sqrt(|E|).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

CLIQUE = 60


def planted_edges(spark, n: int) -> DataFrame:
    """The planted skew graph as an (id_a, id_b) pair DataFrame, built
    executor-side from range() — no driver-side edge list."""
    hub = (
        spark.range(1, n // 10 + 1)
        .select(F.lit(0).cast("long").alias("id_a"), F.col("id").alias("id_b"))
    )
    c0 = n // 2
    cl = (
        spark.range(c0, c0 + CLIQUE)
        .select(F.col("id").alias("id_a"))
        .join(
            spark.range(c0, c0 + CLIQUE).select(F.col("id").alias("id_b")),
            F.col("id_a") < F.col("id_b"),
        )
    )
    # tree children start ABOVE the hub range and skip the clique range,
    # so no tree edge has both endpoints inside a planted dense structure
    # — the only triangles in the whole graph are the clique's (closed
    # form), keeping the correctness assertion exact under skew
    tree = (
        spark.range(n // 10 + 1, n)
        .filter((F.col("id") < c0) | (F.col("id") >= c0 + CLIQUE))
        .select((F.col("id") / 7).cast("long").alias("id_a"), F.col("id").alias("id_b"))
        .filter(F.col("id_a") != F.col("id_b"))
    )
    return hub.unionByName(cl).unionByName(tree).distinct()


def max_oriented_outdegree(pairs: DataFrame) -> tuple[int, int]:
    """(max out-degree after (degree, id) orientation, |E|) — the bound
    triangle_counts relies on. Replicates the orientation exactly."""
    e = pairs.select(
        F.least("id_a", "id_b").alias("a"), F.greatest("id_a", "id_b").alias("b")
    ).distinct()
    und = e.select(F.col("a").alias("id")).unionAll(e.select(F.col("b").alias("id")))
    deg = und.groupBy("id").agg(F.count(F.lit(1)).alias("dg"))
    ed = e.join(deg.select(F.col("id").alias("a"), F.col("dg").alias("dga")), "a").join(
        deg.select(F.col("id").alias("b"), F.col("dg").alias("dgb")), "b"
    )
    lt = (F.col("dga") < F.col("dgb")) | (
        (F.col("dga") == F.col("dgb")) & (F.col("a") < F.col("b"))
    )
    src = ed.select(F.when(lt, F.col("a")).otherwise(F.col("b")).alias("src"))
    row = src.groupBy("src").agg(F.count(F.lit(1)).alias("od")).agg(
        F.max("od").alias("m"), F.count(F.lit(1)).alias("nsrc")
    ).collect()[0]
    return int(row.m), int(e.count())


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from presto_workload_analyzer_spark.session import get_spark
    from presto_workload_analyzer_spark.extensions import graph as G

    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    results: dict[str, dict[int, float]] = {}
    expected_tri_sum = 3 * (CLIQUE * (CLIQUE - 1) * (CLIQUE - 2) // 6)

    for size in (n, n * mult):
        pairs = planted_edges(spark, size).persist()
        n_edges = pairs.count()  # materialize before timing operators
        od, ecnt = max_oriented_outdegree(pairs)
        sqrt_e = ecnt ** 0.5
        print(
            f"[n={size}] |E|={n_edges} hub_raw_degree={size // 10} "
            f"max_oriented_outdeg={od} sqrt(E)={sqrt_e:.0f} "
            f"ratio={od / sqrt_e:.2f}"
        )
        assert od <= 2 * sqrt_e, (
            f"orientation bound violated: out-degree {od} > 2*sqrt(E) {2 * sqrt_e:.0f}"
        )

        t = time.time()
        tri = G.triangle_counts(pairs)
        tri_sum = tri.agg(F.sum("n_triangles")).collect()[0][0]
        results.setdefault("triangles", {})[size] = time.time() - t
        assert tri_sum == expected_tri_sum, (
            f"triangle sum {tri_sum} != planted {expected_tri_sum}"
        )

        t = time.time()
        G.pagerank(pairs, iters=5).agg(F.sum("rank")).collect()
        results.setdefault("pagerank", {})[size] = time.time() - t

        t = time.time()
        G.kcore_nodes(pairs, k=3, max_rounds=30).count()
        results.setdefault("kcore", {})[size] = time.time() - t

        pairs.unpersist()

    print(f"\nslopes at {mult}x nodes (planted mega-star holds 10% of nodes):")
    for op, walls in results.items():
        lo, hi = walls[n], walls[n * mult]
        print(f"  {op}: {lo:.2f}s -> {hi:.2f}s  slope {hi / lo:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
