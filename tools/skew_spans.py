"""Hot-gram skew stress for maximal-duplicate-span dedup (the 8th
skew-matrix row; rounds 7-11 added graph / corpus-chain / stream / ANN /
semdedup / line-dedup gates — this one covers the round-12
dedup.maximal_duplicate_spans / exactsubstr_removal surface before the
xs20/xs23 registration).

A real crawl's worst span-grain shape is viral BOILERPLATE at span
scale: one 12-token license/navigation block pasted into half of all
pages. Every trigram inside that block then owns n/2 positioned
instances — ten simultaneously-hot keys for the gram-grain shuffle (the
one corpus-sized shuffle the pipeline pays). SCALE.md argues the shape
is safe: the per-gram aggregate is a count (map-side partial, constant
state), the dup-flag join fans each hot gram's single flag row OUT to
its instances (instances of one gram do co-locate in the join task, but
the per-row work is constant and AQE splits oversized partitions), and
everything downstream is doc-grain (a doc's dup positions are bounded
by ITS length, never the corpus's). This tool converts the argument
into a measured gate:

  * exactness under skew at both scales: every viral doc reports
    EXACTLY one maximal span [0, 11] (the block, merged from its ten
    overlapping hot trigrams — not ten fragments), span digests equal
    the closed-form md5 of the block, removal drops exactly 12 tokens
    from every viral doc and 0 from every clean doc, and per-doc
    cleaned md5 digests match hashlib replays;
  * end-to-end wall scales ~linearly at 10x docs with every hot gram's
    occurrence count ALSO 10x.

Planted corpus (deterministic, no RNG, built executor-side from
range()): docs [0, n/2) lead with the 12-token viral block, every other
token in every doc is (doc, position)-salted unique text, so the block's
internal trigrams are the ONLY duplicated ones — the measurement
isolates the hot keys.

Usage: python tools/skew_spans.py [n] [mult]  (defaults: 20000, 10)
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

BLOCK = "copyright notice all rights reserved click here to subscribe and share today"
K = 3
MIN_LEN = 10
N_TAIL = 8  # salted unique tokens after the leader


def planted_corpus(spark, n: int) -> DataFrame:
    """(doc_id, text): docs [0, n/2) lead with the 12-token BLOCK, the
    rest lead with a salted unique stand-in; all tails are salted."""
    sid = F.col("id").cast("string")
    tail = [F.concat(F.lit(f"t{j}x"), sid, F.lit(f"y{j}")) for j in range(N_TAIL)]
    lead = F.when(F.col("id") < n // 2, F.lit(BLOCK)).otherwise(
        F.concat(F.lit("u0z"), sid, F.lit(" u1z"), sid, F.lit(" u2z"), sid)
    )
    return spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", lead, *tail).alias("text"),
    )


def doc_tokens(doc_id: int, n: int) -> list[str]:
    lead = (
        BLOCK.split()
        if doc_id < n // 2
        else [f"u0z{doc_id}", f"u1z{doc_id}", f"u2z{doc_id}"]
    )
    return lead + [f"t{j}x{doc_id}y{j}" for j in range(N_TAIL)]


def run(spark, n: int) -> dict:
    from presto_workload_analyzer_spark.extensions import dedup

    t0 = time.time()
    corpus = planted_corpus(spark, n)
    spans = dedup.maximal_duplicate_spans(
        corpus, "doc_id", "text", k=K, min_len=MIN_LEN
    ).persist()
    sagg = spans.agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.countDistinct("id").alias("n_docs"),
        F.countDistinct("span_digest").alias("n_digests"),
        F.sum(
            ((F.col("span_start") == 0) & (F.col("span_end") == 11)).cast("long")
        ).alias("n_exact"),
    ).collect()[0]
    first_digest = spans.select("span_digest").limit(1).collect()
    spans.unpersist()
    removed = dedup.exactsubstr_removal(
        corpus, "doc_id", "text", k=K, min_len=MIN_LEN
    ).persist()
    ragg = removed.agg(
        F.sum("n_removed").alias("removed"),
        F.sum((F.col("n_removed") > 0).cast("long")).alias("docs_hit"),
        F.count(F.lit(1)).alias("docs"),
    ).collect()[0]
    probe = {
        r.id: r.cleaned_digest
        for r in removed.filter(F.col("id").isin(0, n - 1)).collect()
    }
    wall = time.time() - t0
    removed.unpersist()
    return {
        "n": n,
        "spans": sagg,
        "span_digest": first_digest[0].span_digest if first_digest else None,
        "removed": ragg,
        "probe": probe,
        "wall": wall,
    }


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from presto_workload_analyzer_spark.session import get_spark

    spark = get_spark(app_name="skew-spans-stress")
    # warmup chain: first job pays JVM/codegen warmup (the r7 lesson —
    # a cold small-scale wall flatters the measured slope)
    run(spark, max(n // 10, 1000))
    ok = True
    walls = []
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    for scale in (n, n * mult):
        r = run(spark, scale)
        hot = scale // 2
        s = r["spans"]
        print(
            f"[n={scale}] hot_gram_occurrences={hot} spans={s.n_spans} "
            f"exact=[0,11]x{s.n_exact} removed={r['removed'].removed} "
            f"docs_hit={r['removed'].docs_hit} wall={r['wall']:.2f}s"
        )
        if not (s.n_spans == s.n_docs == s.n_exact == hot and s.n_digests == 1):
            print(f"  FAIL: span census {s} != one [0,11] span per viral doc")
            ok = False
        if r["span_digest"] != md5(BLOCK):
            print("  FAIL: span digest != md5(BLOCK)")
            ok = False
        if r["removed"].removed != hot * 12 or r["removed"].docs_hit != hot:
            print(f"  FAIL: removal {r['removed']} != 12 tokens x {hot} docs")
            ok = False
        want = {
            0: md5(" ".join(doc_tokens(0, scale)[12:])),  # block stripped
            scale - 1: md5(" ".join(doc_tokens(scale - 1, scale))),  # clean
        }
        for did, dig in want.items():
            if r["probe"].get(did) != dig:
                print(f"  FAIL: doc {did} cleaned_digest mismatch")
                ok = False
        walls.append(r["wall"])
    slope = walls[1] / walls[0]
    bound = mult * 1.5
    print(
        f"wall slope at {mult}x docs (every hot gram also {mult}x): "
        f"{slope:.2f}x (bound {bound:.1f}x)"
    )
    if slope > bound:
        print("  FAIL: superlinear under hot-gram skew")
        ok = False
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
