"""Hot-cell skew stress for the ANN SERVING family (round-8: the fifth
quadrant of the skew-evidence matrix — batch pair generators, dup-graph,
text-dedup chain and stateful streaming all have measured gates; this
measures the persisted-IVF probe path).

A real embedding corpus is clumpy: one viral near-duplicate family can own
half of all vectors, and the IVF assignment puts that whole family in ONE
cell — so the probe join (keyed on cell_id, a low-cardinality key by
construction) funnels the family into one inverted list. The serving
contract makes that safe-by-shape: queries are a BOUNDED set (the x126
serving chain), each probing n_probe cells, so the hot cell costs
|queries probing it| x |cell| — linear in the corpus, never quadratic.
(Self-kNN over an un-deduped viral family IS quadratic by problem
statement; the engine's documented posture is dedup-first — the x51 chain
— before self-similarity. SCALE.md carries this boundary.)

This tool plants exactly that corpus and MEASURES the claim:

  * 50% of vectors in a tight cone (0.02 perturbations around a fixed
    direction) — one k-means cell / one inverted list;
  * 50% spread across direction space (sin-mixed coordinates);
  * 64 fixed queries, each an EXACT duplicate of a planted corpus member
    (32 aimed at the hot family, 32 at the spread) — so rank-1 has a
    closed form: the duplicated member at cosine 1.0, found only if cell
    routing + partition pruning + scoring are all correct;
  * index built and persisted at n and mult*n; the QUERY wall must scale
    at most linearly (<= mult * 1.5) even though the hot cell also grew
    mult-fold.

Usage: python tools/skew_ann.py [n] [mult]   (defaults: 100000, 10)
Exit 1 on a correctness miss, a missing hot cell, or a superlinear wall.
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

DIMS = 16
N_CELLS = 16
N_PROBE = 2
K = 10
N_QUERIES = 64
QUERY_ID_BASE = 10_000_000


def _vec_expr(id_col, hot):
    """Deterministic unit vector as a pure Column expression of the id.

    hot: 1 + 0.02*sin(id*(j+1)) per coordinate — a tight all-positive cone
    (pairwise cosines ~1-1e-4, the near-duplicate family). spread:
    sin(id*7919 + (j+1)*104729) — sign-mixed directions. Normalized so
    exact-duplicate rank-1 cosine is 1.0 to fp.
    """
    if hot:
        raw = [1.0 + 0.02 * F.sin(id_col * (j + 1)) for j in range(DIMS)]
    else:
        raw = [F.sin(id_col * 7919 + (j + 1) * 104729) for j in range(DIMS)]
    arr = F.array(*[c.cast("double") for c in raw])
    nrm = F.sqrt(F.aggregate(arr, F.lit(0.0), lambda a, x: a + x * x))
    return F.transform(arr, lambda x: x / nrm)


def planted_corpus(spark, n: int):
    """50% hot cone + 50% spread, ids 0..n-1 (hot iff id < n//2)."""
    half = n // 2
    hot = spark.range(half).select(
        F.col("id").alias("vec_id"), _vec_expr(F.col("id"), True).alias("embedding")
    )
    uni = spark.range(half, n).select(
        F.col("id").alias("vec_id"), _vec_expr(F.col("id"), False).alias("embedding")
    )
    return hot.unionByName(uni)


def planted_queries(spark, n: int):
    """64 exact duplicates of corpus members: 32 hot, 32 spread."""
    half, step = n // 2, max(n // 2 // 32, 1)
    m_hot = [i * step for i in range(32)]
    m_uni = [half + i * step for i in range(32)]
    rows = [(QUERY_ID_BASE + qi, m, m < half) for qi, m in enumerate(m_hot + m_uni)]
    base = spark.createDataFrame(rows, "vec_id LONG, member LONG, hot BOOLEAN")
    return base.select(
        "vec_id",
        "member",
        F.when(F.col("hot"), _vec_expr(F.col("member"), True))
        .otherwise(_vec_expr(F.col("member"), False))
        .alias("embedding"),
    )


def run_once(spark, n: int, tmp: str) -> tuple[float, float, float]:
    """Build + persist the index, run the 64-query probe; returns
    (build_wall, query_wall, hot_cell_share). Asserts rank-1 closed form."""
    from presto_workload_analyzer_spark.extensions.similarity import (
        build_ivf_index,
        ivf_topk_indexed,
    )

    path = os.path.join(tmp, f"ivf_{n}")
    corpus = planted_corpus(spark, n)

    t0 = time.time()
    build_ivf_index(corpus, path, n_cells=N_CELLS)
    build_wall = time.time() - t0

    sizes = (
        spark.read.parquet(f"{path}/corpus").groupBy("cell_id").count().collect()
    )
    hot_share = max(r["count"] for r in sizes) / float(n)

    queries = planted_queries(spark, n)
    t0 = time.time()
    out = ivf_topk_indexed(
        spark, path, queries, n_probe=N_PROBE, k=K
    ).collect()
    query_wall = time.time() - t0

    # closed form: every query's rank-1 neighbor is its duplicated member
    # at cosine 1.0 (fp); misses mean broken routing/pruning/scoring
    member = {
        r.vec_id: r.member for r in queries.select("vec_id", "member").collect()
    }
    rank1 = {r.query_id: r for r in out if r.rank == 1}
    assert len(rank1) == N_QUERIES, f"{len(rank1)} rank-1 rows != {N_QUERIES}"
    for qid, r in rank1.items():
        assert r.neighbor_id == member[qid], (
            f"query {qid}: rank-1 {r.neighbor_id} != duplicated member {member[qid]}"
        )
        assert math.isclose(r.cosine, 1.0, abs_tol=1e-9), (qid, r.cosine)
    n_rows = len(out)
    assert n_rows == N_QUERIES * K, f"{n_rows} rows != {N_QUERIES * K}"
    return build_wall, query_wall, hot_share


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from presto_workload_analyzer_spark.session import get_spark

    spark = get_spark(app_name="skew-ann-stress")
    tmp = tempfile.mkdtemp(prefix="skew_ann_")
    ok = True
    try:
        # warmup: discard a small run so JVM/MLlib init doesn't flatter the
        # slope (the skew_stream lesson: cold first measurement -> 0.73x)
        run_once(spark, max(n // 10, 2_000), tmp)

        walls = []
        for scale in (n, n * mult):
            build_wall, query_wall, hot_share = run_once(spark, scale, tmp)
            print(
                f"[n={scale}] hot_cell_share={hot_share:.2f} "
                f"build={build_wall:.2f}s query={query_wall:.2f}s "
                f"(64 queries, rank-1 closed form exact)"
            )
            if hot_share < 0.3:
                print("  FAIL: planted mega-cell missing (kmeans split it)")
                ok = False
            walls.append(query_wall)

        slope = walls[1] / max(walls[0], 1e-9)
        print(
            f"\nquery wall slope at {mult}x corpus (hot cell also {mult}x): "
            f"{slope:.2f}x (bound {mult * 1.5:.1f}x)"
        )
        if slope > mult * 1.5:
            print("FAIL: superlinear under hot-cell skew")
            ok = False
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print("skew_ann: PASS" if ok else "skew_ann: FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
