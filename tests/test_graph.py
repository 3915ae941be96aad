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


def test_triangle_counts_planted_shapes(spark):
    """K4 (every node in C(3,2)=3 triangles), a star (zero triangles —
    the banding-hub shape), and a chain (zero) in one graph."""
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    star = [(100, x) for x in (101, 102, 103, 104)]
    chain = [(200, 201), (201, 202), (202, 203)]
    pairs = spark.createDataFrame(
        [Row(id_a=a, id_b=b) for a, b in k4 + star + chain]
    )
    got = {r.id: r.n_triangles for r in graph.triangle_counts(pairs).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}  # star/chain nodes absent


def test_triangle_counts_orientation_robust_to_duplicates(spark):
    """An edge reported in both orientations must not fabricate wedges."""
    tri = [(1, 2), (2, 3), (1, 3)]
    doubled = tri + [(b, a) for a, b in tri]
    g1 = {
        r.id: r.n_triangles
        for r in graph.triangle_counts(
            spark.createDataFrame([Row(id_a=a, id_b=b) for a, b in tri])
        ).collect()
    }
    g2 = {
        r.id: r.n_triangles
        for r in graph.triangle_counts(
            spark.createDataFrame([Row(id_a=a, id_b=b) for a, b in doubled])
        ).collect()
    }
    assert g1 == {1: 1, 2: 1, 3: 1}
    assert g2 == g1


def test_triangle_counts_hub_no_blowup_and_correct(spark):
    """A hub of degree 40 fused with K5: counts must come out exactly
    right even though the naive neighbor self-join would enumerate
    C(40,2) = 780 wedges through the hub — the orientation routes every
    wedge through low-degree endpoints instead."""
    hub = [(0, x) for x in range(1, 41)]
    k5 = [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]  # nodes 1..5
    pairs = spark.createDataFrame(
        [Row(id_a=a, id_b=b) for a, b in hub + k5]
    )
    got = {r.id: r.n_triangles for r in graph.triangle_counts(pairs).collect()}
    # triangles: C(5,3)=10 inside K5, plus hub+each K5 edge = 10 more.
    # hub: 10; each K5 node: C(4,2)=6 inside + 4 with the hub = 10.
    assert got[0] == 10
    assert all(got[n] == 10 for n in range(1, 6))
    assert set(got) == {0, 1, 2, 3, 4, 5}


def test_kcore_peeling(spark):
    """Chain peels to nothing at k=2; a triangle with a pendant keeps
    only the triangle; K4 survives at k=3 with in-core degrees."""
    chain = [(1, 2), (2, 3), (3, 4)]
    tri_pendant = [(10, 11), (11, 12), (10, 12), (12, 13)]
    k4 = [(a, b) for a in range(20, 24) for b in range(a + 1, 24)]
    pairs = spark.createDataFrame(
        [Row(id_a=a, id_b=b) for a, b in chain + tri_pendant + k4]
    )
    core2 = {r.id: r.degree for r in graph.kcore_nodes(pairs, k=2).collect()}
    assert all(n not in core2 for n in (1, 2, 3, 4, 13))  # chain + pendant gone
    assert core2[10] == core2[11] == core2[12] == 2       # triangle survives
    assert all(core2[n] == 3 for n in range(20, 24))      # K4 intact
    core3 = {r.id: r.degree for r in graph.kcore_nodes(pairs, k=3).collect()}
    assert set(core3) == {20, 21, 22, 23}


def test_kcore_cascading_peel(spark):
    """Peeling must CASCADE: a star of triangles hanging off one path —
    removing the ends re-exposes inner nodes round after round."""
    # path 1-2-3-4-5 where each inner node also closes a triangle with
    # its successor via a helper node; at k=2 the path endpoints peel,
    # then nothing else (triangles hold) — but a bare path 1..5 cascades
    # to empty in ceil(len/2) rounds
    path = [(i, i + 1) for i in range(1, 9)]
    pairs = spark.createDataFrame([Row(id_a=a, id_b=b) for a, b in path])
    assert graph.kcore_nodes(pairs, k=2).count() == 0
