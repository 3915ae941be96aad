"""Hot-digest skew stress for cross-document duplicated-LINE removal
(the 7th skew-matrix row; rounds 7-10 added graph / corpus-chain /
stream / ANN / semdedup gates — this one covers the round-11
dedup.duplicated_line_removal surface before its xs15 registration).

A real crawl's worst line-grain shape is viral BOILERPLATE: one
navigation/license line appearing on half of all pages. That makes ONE
line digest own 50% of the corpus's duplicated-line occurrences — the
hottest possible key for the digest-grain shuffle. SCALE.md argues the
shape is safe (the canonical aggregate per digest is (count, min) only
— constant state, map-side partial — and the join back fans the hot
digest's single canonical row OUT to its occurrences, never funneling
them into one task); this tool converts the argument into a measured
gate:

  * exactness under skew at both scales: the viral line keeps exactly
    its globally first occurrence (doc 0, line 0) and drops the other
    n/2 - 1; every unique line passes; per-doc cleaned md5 digests
    match closed-form hashlib replays for a canonical-holder, a
    non-canonical viral doc and a clean doc;
  * end-to-end wall scales ~linearly at 10x docs with the hot line's
    occurrence count ALSO 10x.

Planted corpus (deterministic, no RNG, built executor-side from
range()): every doc has 10 lines; docs [0, n/2) carry the viral line as
line 0, the rest of every doc is (id, position)-salted unique text, so
the viral digest is the ONLY duplicated one — the measurement isolates
the hot key.

Usage: python tools/skew_linededup.py [n] [mult]  (defaults: 20000, 10)
Exit 1 if wall slope exceeds mult * 1.5 or any exactness assert fails.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

VIRAL = "copyright notice all rights reserved click here to subscribe"
N_LINES = 10


def planted_corpus(spark, n: int) -> DataFrame:
    """(doc_id, text): 10 lines per doc; docs [0, n/2) lead with VIRAL."""
    uniq = [
        F.concat(
            F.lit(f"u{j} body "), F.col("id").cast("string"), F.lit(f" p{j}")
        )
        for j in range(1, N_LINES)
    ]
    first = F.when(F.col("id") < n // 2, F.lit(VIRAL)).otherwise(
        F.concat(F.lit("u0 body "), F.col("id").cast("string"), F.lit(" p0"))
    )
    return spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws("\n", first, *uniq).alias("text"),
    )


def doc_lines(doc_id: int, n: int) -> list[str]:
    first = (
        VIRAL if doc_id < n // 2 else f"u0 body {doc_id} p0"
    )
    return [first] + [f"u{j} body {doc_id} p{j}" for j in range(1, N_LINES)]


def run(spark, n: int) -> dict:
    from presto_workload_analyzer_spark.extensions import dedup

    t0 = time.time()
    out = dedup.duplicated_line_removal(
        planted_corpus(spark, n), "doc_id", "text"
    ).persist()
    agg = out.agg(
        F.sum("n_dropped").alias("dropped"),
        F.sum((F.col("n_dropped") > 0).cast("long")).alias("docs_hit"),
        F.count(F.lit(1)).alias("docs"),
    ).collect()[0]
    probe = {
        r.id: r.cleaned_digest
        for r in out.filter(F.col("id").isin(0, 1, n - 1)).collect()
    }
    wall = time.time() - t0
    out.unpersist()
    return {
        "n": n,
        "dropped": agg.dropped,
        "docs_hit": agg.docs_hit,
        "docs": agg.docs,
        "probe": probe,
        "wall": wall,
    }


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from presto_workload_analyzer_spark.session import get_spark

    spark = get_spark(app_name="skew-linededup-stress")
    # warmup chain: first job pays JVM/codegen warmup (the r7 lesson —
    # a cold small-scale wall flatters the measured slope)
    run(spark, max(n // 10, 1000))
    ok = True
    walls = []
    for scale in (n, n * mult):
        r = run(spark, scale)
        hot = scale // 2
        print(
            f"[n={scale}] lines={scale * N_LINES} hot_line_occurrences={hot} "
            f"dropped={r['dropped']} docs_hit={r['docs_hit']} "
            f"wall={r['wall']:.2f}s"
        )
        if r["dropped"] != hot - 1:
            print(f"  FAIL: dropped={r['dropped']}, want {hot - 1}")
            ok = False
        if r["docs_hit"] != hot - 1:
            print(f"  FAIL: docs_hit={r['docs_hit']}, want {hot - 1}")
            ok = False
        md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
        want = {
            0: md5("\n".join(doc_lines(0, scale))),       # canonical holder
            1: md5("\n".join(doc_lines(1, scale)[1:])),   # viral line dropped
            scale - 1: md5("\n".join(doc_lines(scale - 1, scale))),  # clean
        }
        for did, dig in want.items():
            if r["probe"].get(did) != dig:
                print(f"  FAIL: doc {did} cleaned_digest mismatch")
                ok = False
        walls.append(r["wall"])
    slope = walls[1] / walls[0]
    bound = mult * 1.5
    print(f"wall slope at {mult}x docs (hot line also {mult}x): "
          f"{slope:.2f}x (bound {bound:.1f}x)")
    if slope > bound:
        print("  FAIL: superlinear under hot-digest skew")
        ok = False
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
