"""Semantic-dedup (SemDeDup / xs1) skew stress — the 6th row of the
skew-evidence matrix (round-9 verdict item 6).

SemDeDup's scale contract is that the quadratic cosine comparison is
bounded by the CLUSTERING GRAIN: k grows with n, so cluster size stays
~constant. The worst real input violates exactly that — a viral embedding
family (one duplicated asset, one templated page) puts half the corpus
into a SINGLE k-means cell, and the per-cluster Gram matmul owes
~(n/2)^2 / 2 cosines in one task. This tool plants exactly that corpus
and MEASURES xs1's production path (cluster_scoped_cosine_pairs
impl='blas' -> connected components -> min-id survivors) at two scales
with the mega-cluster star guard ON (`max_cluster_size`), proving:

  * guarded pair counts stay exactly linear — the mega cluster emits its
    root star (n/2 - 1 edges, every one cosine-verified at 1.0) instead
    of the closed-form owed quadratic (never enumerated at scale);
  * survivor semantics stay exact under skew: the planted family
    resolves to ONE component rooted at id 0, every tail vector
    survives, exactly one exemplar represents the family;
  * end-to-end wall scales ~linearly at 10x vectors even though the hot
    cluster also grows 10x (the star is O(cluster) work and the group's
    Arrow batch is cluster_rows x dims, never rows x rows);
  * the guard-OFF contrast is measured at a small scale where the full
    Gram is still materializable, with the owed-pair closed form printed
    for the scales where it is not.

Planted corpus (deterministic, no RNG, built executor-side from range()):
  * mega cluster: ids [0, n/2) share label 0 and ONE constant vector —
    identical embeddings, the worst case (every within-cluster pair
    passes any threshold);
  * orthogonal tail: ids [n/2, n) packed d-per-cluster with one-hot
    vectors, so NO tail pair reaches any positive threshold — every pair
    the kernel emits is the planted family's.

Usage: python tools/skew_semdedup.py [n] [mult]   (defaults: 20000, 10)
Exit 1 if the guarded wall slope exceeds mult * 1.5, if any exact
correctness assertion fails, or if the guard fails to bind.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

DIMS = 64
GUARD = 256
THRESHOLD = 0.9


def planted_corpus(spark, n: int) -> DataFrame:
    """(vec_id, embedding, label): ids [0, n/2) = one identical vector in
    label 0; the tail is one-hot, d vectors per label, mutually orthogonal
    within every cluster — zero non-family pairs by construction."""
    half = n // 2
    mega = spark.range(0, half).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(1.0)] * DIMS).alias("embedding"),
        F.lit(0).cast("long").alias("label"),
    )
    local = F.col("id") - half
    dim = (local % DIMS).cast("int")
    tail = spark.range(half, n).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                F.when(dim == j, F.lit(1.0)).otherwise(F.lit(0.0))
                for j in range(DIMS)
            ]
        ).alias("embedding"),
        (F.lit(1) + (local / F.lit(DIMS)).cast("long")).alias("label"),
    )
    return mega.unionByName(tail)


def run_chain(spark, emb: DataFrame, n: int, guard: int | None) -> dict:
    """Guarded blas pairs -> CC -> survivors; measured counts + wall."""
    from presto_workload_analyzer_spark.extensions import dedup

    t0 = time.time()
    pairs = dedup.cluster_scoped_cosine_pairs(
        emb, "vec_id", "embedding", "label",
        threshold=THRESHOLD, max_cluster_size=guard, impl="blas",
    ).persist()
    n_pairs = pairs.count()
    min_cos = pairs.agg(F.min("cosine").alias("m")).collect()[0].m
    kept = dedup.drop_near_duplicates(emb, "vec_id", pairs).persist()
    n_kept = kept.count()
    mega_kept = [
        r.vec_id for r in kept.filter(F.col("vec_id") < n // 2).collect()
    ]
    wall = time.time() - t0
    pairs.unpersist()
    kept.unpersist()
    return {
        "n": n,
        "pairs": n_pairs,
        "min_cos": min_cos,
        "kept": n_kept,
        "mega_kept": mega_kept,
        "wall": wall,
    }


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from presto_workload_analyzer_spark.session import get_spark

    spark = get_spark(app_name="skew-semdedup-stress")
    # warmup chain (JVM/codegen), discarded — a cold first measurement
    # flatters the slope (same protocol as skew_corpus/skew_stream)
    run_chain(spark, planted_corpus(spark, max(n // 10, 1000)),
              max(n // 10, 1000), GUARD)

    ok = True

    # guard-OFF contrast at a scale where the full Gram still fits: the
    # mega cluster's exact path owes fam*(fam-1)/2 enumerated cosines
    small = max(n // 5, 1000)
    fam_s = small // 2
    r_off = run_chain(spark, planted_corpus(spark, small), small, None)
    owed_s = fam_s * (fam_s - 1) // 2
    print(
        f"[guard OFF, n={small}] pairs={r_off['pairs']:,} "
        f"(exact quadratic: {owed_s:,}) wall={r_off['wall']:.2f}s"
    )
    if r_off["pairs"] != owed_s:
        print(f"  FAIL: exact pairs {r_off['pairs']} != owed {owed_s}")
        ok = False
    if r_off["kept"] != (small - fam_s) + 1:
        print(f"  FAIL: exact survivors {r_off['kept']}")
        ok = False

    results = []
    for scale in (n, n * mult):
        fam = scale // 2
        r = run_chain(spark, planted_corpus(spark, scale), scale, GUARD)
        owed = fam * (fam - 1) // 2
        print(
            f"[guard ON,  n={scale}] family={fam} star_pairs={r['pairs']:,} "
            f"(unguarded closed-form owes {owed:,} cosines) "
            f"survivors={r['kept']:,} wall={r['wall']:.2f}s"
        )
        # the guard must BIND: exactly the root star, every edge verified
        if r["pairs"] != fam - 1:
            print(f"  FAIL: star pairs {r['pairs']} != {fam - 1}")
            ok = False
        if r["min_cos"] is None or r["min_cos"] < 0.999999:
            print(f"  FAIL: min emitted cosine {r['min_cos']}")
            ok = False
        # exact survivor semantics under skew: one exemplar (min id 0)
        # for the family, the whole orthogonal tail untouched
        if r["mega_kept"] != [0]:
            print(f"  FAIL: family survivors {r['mega_kept'][:5]}, want [0]")
            ok = False
        if r["kept"] != (scale - fam) + 1:
            print(f"  FAIL: survivors {r['kept']}, want {(scale - fam) + 1}")
            ok = False
        results.append(r)

    wall_slope = results[1]["wall"] / max(results[0]["wall"], 1e-9)
    pair_slope = results[1]["pairs"] / max(results[0]["pairs"], 1)
    print(
        f"\nslopes at {mult}x vectors (hot cluster also {mult}x): "
        f"pairs {pair_slope:.2f}x wall {wall_slope:.2f}x "
        f"(bound {mult * 1.5:.1f}x)"
    )
    if wall_slope > mult * 1.5 or pair_slope > mult * 1.5:
        print("FAIL: superlinear under planted mega-cluster")
        ok = False
    print("skew_semdedup: PASS" if ok else "skew_semdedup: FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
