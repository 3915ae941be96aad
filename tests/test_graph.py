"""PageRank over candidate-pair graphs: hand-checked recurrence, shape
invariants, damping behavior."""

import pytest
from pyspark.sql import Row

from presto_workload_analyzer_spark.extensions import graph


def _reference_pagerank(edges, iters=5, damping=0.85):
    """Plain-python twin of the recurrence for hand verification."""
    und = set()
    for a, b in edges:
        und.add((a, b))
        und.add((b, a))
    nodes = {s for s, _ in und}
    deg = {n: sum(1 for s, _ in und if s == n) for n in nodes}
    rank = {n: 1.0 for n in nodes}
    for _ in range(iters):
        nxt = {}
        for n in nodes:
            incoming = sum(rank[s] / deg[s] for s, d in und if d == n)
            nxt[n] = (1 - damping) + damping * incoming
        rank = nxt
    return rank


@pytest.mark.parametrize("iters", [1, 3, 5])
def test_pagerank_matches_reference_on_star(spark, iters):
    edges = [(0, 1), (0, 2), (0, 3)]
    pairs = spark.createDataFrame([Row(id_a=a, id_b=b) for a, b in edges])
    got = {r.id: r.rank for r in graph.pagerank(pairs, iters=iters).collect()}
    want = _reference_pagerank(edges, iters=iters)
    assert set(got) == set(want)
    for n in want:
        assert abs(got[n] - want[n]) < 1e-9
    # hub strictly outranks leaves
    assert got[0] > got[1]


def test_pagerank_regular_graph_is_uniform_fixed_point(spark):
    # triangle: every node degree 2 -> rank 1.0 is the exact fixed point
    pairs = spark.createDataFrame(
        [Row(id_a=1, id_b=2), Row(id_a=2, id_b=3), Row(id_a=1, id_b=3)]
    )
    got = graph.pagerank(pairs, iters=4).collect()
    assert len(got) == 3
    assert all(abs(r.rank - 1.0) < 1e-12 for r in got)


def test_pagerank_components_independent(spark):
    # two disjoint components: ranks must equal the per-component runs
    pairs = spark.createDataFrame(
        [Row(id_a=1, id_b=2), Row(id_a=10, id_b=11), Row(id_a=10, id_b=12)]
    )
    got = {r.id: r.rank for r in graph.pagerank(pairs, iters=3).collect()}
    want = _reference_pagerank([(1, 2), (10, 11), (10, 12)], iters=3)
    assert set(got) == set(want)
    for n in want:
        assert abs(got[n] - want[n]) < 1e-9


def test_pagerank_duplicate_pairs_collapse(spark):
    # the same edge reported twice (both orientations) must not double mass
    once = spark.createDataFrame([Row(id_a=1, id_b=2)])
    twice = spark.createDataFrame([Row(id_a=1, id_b=2), Row(id_a=2, id_b=1)])
    g1 = {r.id: r.rank for r in graph.pagerank(once, iters=2).collect()}
    g2 = {r.id: r.rank for r in graph.pagerank(twice, iters=2).collect()}
    assert g1 == g2
