"""Corpus-level skew stress for the TEXT dedup chain (round-7 extension
of tools/skew_graph.py, which covers the dup-GRAPH operators).

A real crawl is power-law in duplication: one viral template can put 10%
of all documents into a SINGLE near-dup family. For the minhash pipeline
that is the worst input shape — every band bucket the family touches
holds n/10 members, so the unguarded candidate self-join owes
~(n/10)^2 / 2 pairs per band while the true dedup answer needs only the
family's connectivity. This tool plants exactly that corpus and MEASURES
the full production chain at two scales with the mega-bucket star guard
ON (`max_bucket_size`), proving (not arguing) that:

  * guarded candidate-pair counts stay ~linear in n — the mega family
    contributes n-1 star edges instead of ~n^2/200 bucket pairs (the
    unguarded owed-pair count is computed in closed form for contrast,
    never enumerated);
  * connected_components + survivor materialization stay correct under
    skew: the planted family resolves to ONE cluster rooted at its min
    id, every unique doc survives, and exactly one survivor represents
    the family — asserted exactly at both scales;
  * end-to-end wall (pairs -> CC -> survivors) scales ~linearly at 10x
    rows despite the hub family also growing 10x.

Planted corpus (deterministic, no RNG, built executor-side from range()):
  * mega family: docs [0, n/10) share one verbatim template text — the
    viral-template cluster (identical text is the worst case for LSH
    buckets: EVERY band collides);
  * unique tail: docs [n/10, n) get index-derived distinct token strings
    with no shared shingles across docs (id-salted tokens), so the only
    candidate pairs in the corpus are the family's — the measured pair
    count isolates the skew effect.

Usage: python tools/skew_corpus.py [n] [mult]   (defaults: 20000, 10)
Exit 1 if the guarded pair slope exceeds mult * 1.5, if correctness
assertions fail, or if the guard fails to bind.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

TEMPLATE = (
    "breaking update the viral template body everyone reposts verbatim "
    "with the exact same wording every single time across every mirror"
)
GUARD = 64
K = 3  # shingle width (words)


def planted_corpus(spark, n: int) -> DataFrame:
    """(doc_id, text): docs [0, n/10) share TEMPLATE; the tail is unique.

    Tail texts use id-salted tokens (u{id}a ... u{id}f) so no two tail
    docs — and no tail/family pair — share a single k-word shingle:
    every candidate pair the pipeline finds is the planted family's.
    """
    fam = spark.range(0, n // 10).select(
        F.col("id").alias("doc_id"), F.lit(TEMPLATE).alias("text")
    )
    tail = spark.range(n // 10, n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[F.concat(F.lit(f"u{s}"), F.col("id").cast("string")) for s in "abcdef"],
        ).alias("text"),
    )
    return fam.unionByName(tail)


def run_chain(spark, docs: DataFrame, n: int) -> dict:
    """Guarded pairs -> CC -> survivors; returns measured counts + wall."""
    from presto_workload_analyzer_spark.extensions import dedup

    t0 = time.time()
    pairs = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", k=K, num_hashes=16, bands=4, mode="xxhash64",
        max_bucket_size=GUARD,
    ).persist()
    n_pairs = pairs.count()
    cc = dedup.connected_components(pairs).persist()
    fam_clusters = (
        cc.filter(F.col("id") < n // 10).select("cluster_id").distinct().collect()
    )
    survivors = dedup.drop_near_duplicates(docs, "doc_id", pairs)
    n_surv = survivors.count()
    wall = time.time() - t0
    pairs.unpersist()
    cc.unpersist()
    return {
        "n": n,
        "pairs": n_pairs,
        "fam_clusters": [r.cluster_id for r in fam_clusters],
        "survivors": n_surv,
        "wall": wall,
    }


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from presto_workload_analyzer_spark.session import get_spark

    spark = get_spark(app_name="skew-corpus-stress")
    # discard a small warmup chain: the first Spark job pays JVM/codegen
    # warmup, which otherwise lands entirely in the small-scale wall and
    # makes the measured slope flattering (a 10x run read 0.73x before
    # this was added)
    run_chain(spark, planted_corpus(spark, max(n // 10, 1000)), max(n // 10, 1000))
    ok = True
    results = []
    for scale in (n, n * mult):
        r = run_chain(spark, planted_corpus(spark, scale), scale)
        fam = scale // 10
        # unguarded owed pairs for the family bucket, per band, closed form
        owed = 4 * fam * (fam - 1) // 2
        print(
            f"[n={scale}] family={fam} guarded_pairs={r['pairs']} "
            f"(unguarded closed-form owes ~{owed:,} bucket pairs) "
            f"survivors={r['survivors']} wall={r['wall']:.2f}s"
        )
        # correctness under skew: one family cluster rooted at min id 0;
        # every unique doc + exactly one family representative survive
        if r["fam_clusters"] != [0]:
            print(f"  FAIL: family clusters = {r['fam_clusters']}, want [0]")
            ok = False
        want_surv = (scale - fam) + 1
        if r["survivors"] != want_surv:
            print(f"  FAIL: survivors = {r['survivors']}, want {want_surv}")
            ok = False
        # the guard must BIND: linear star edges, never bucket quadratics
        if not (fam - 1 <= r["pairs"] < 4 * fam):
            print(f"  FAIL: guarded pairs {r['pairs']} not ~linear in family size")
            ok = False
        results.append(r)

    pair_slope = results[1]["pairs"] / max(results[0]["pairs"], 1)
    wall_slope = results[1]["wall"] / max(results[0]["wall"], 1e-9)
    print(
        f"\nslopes at {mult}x rows: pairs {pair_slope:.2f}x "
        f"wall {wall_slope:.2f}x (bound {mult * 1.5:.1f}x)"
    )
    if pair_slope > mult * 1.5 or wall_slope > mult * 1.5:
        print("FAIL: superlinear under planted corpus skew")
        ok = False
    print("skew_corpus: PASS" if ok else "skew_corpus: FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
