"""Mergeable frequency sketches: count-min term counting and certified
heavy hitters.

Beyond-reference LLM-pipeline surface (the reference's only sketch is
Bokeh-side binning; its counting is eager dicts, analyzer.py's per-query
loops). Count-min is the standard bounded-memory answer to "how often does
term X occur in a 100 TB corpus" when the distinct-term set is unbounded:
the sketch is depth x width counters (constant size), each shard's sketch
is the same groupBy aggregation (map-side combined), and shard sketches
merge by cell-wise addition — exactly what Spark's partial aggregation
does for free. Estimates are one-sided: est(t) >= count(t) always, with
overshoot bounded by ||counts||_1 * e / width at probability 1 - (1/2)^depth
(Cormode & Muthukrishnan 2005).

Hash modes mirror dedup.py's MinHash convention: `md5` is the
engine-portable oracle mode (DuckDB reproduces substr(md5(..)) slices),
`xxhash64` is the production mode (JVM codegen, no hex round-trip);
equivalence of the two shapes is pinned in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from presto_workload_analyzer_spark.extensions.textstats import tokens


def _cell_expr(term: Column, d: int, width: int, mode: str) -> Column:
    """Column position of `term` in sketch row d — in [0, width)."""
    if mode == "md5":
        # 4 hex chars = 16 bits, then mod width: the oracle reproduces the
        # identical arithmetic with strpos-based hex digits (DuckDB has no
        # conv()), so width must be <= 65536 in md5 mode.
        if width > 1 << 16:
            raise ValueError(f"md5 mode supports width <= 65536, got {width}")
        h4 = F.substring(F.md5(F.concat(F.lit(f"{d}#"), term)), 1, 4)
        return (F.conv(h4, 16, 10).cast("long") % width).cast("int")
    if mode == "xxhash64":
        return F.pmod(F.xxhash64(F.lit(d), term), F.lit(width)).cast("int")
    raise ValueError(f"unknown hash mode {mode!r}")


def countmin_sketch(
    terms: DataFrame, term_col: str, width: int = 4096, depth: int = 4,
    mode: str = "xxhash64",
) -> DataFrame:
    """Fold a term multiset into a count-min sketch: (d, pos, n) with at
    most depth*width rows.

    One pass: each input row explodes to its `depth` cells and a single
    groupBy(d, pos) counts them. Group cardinality is bounded by
    depth*width BY CONSTRUCTION, so map-side combine collapses each task's
    contribution to <= depth*width rows before the (tiny) shuffle — the
    same aggregated-grain argument as bloom_bitmap. No skew risk: a hot
    term is one cell per row, and cells are bounded.
    """
    c = F.col(term_col)
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("d"), _cell_expr(c, d, width, mode).alias("pos")
                )
                for d in range(depth)
            ]
        )
    ).alias("__cell")
    return (
        terms.where(c.isNotNull())
        .select(cells)
        .groupBy(F.col("__cell.d").alias("d"), F.col("__cell.pos").alias("pos"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cms_estimate(
    sketch: DataFrame, terms: DataFrame, term_col: str,
    width: int = 4096, depth: int = 4, mode: str = "xxhash64",
) -> DataFrame:
    """Estimated count for each (distinct) term: min over the sketch's
    depth rows of the term's cell — `(term_col, est)`.

    The sketch broadcasts (<= depth*width rows by construction), so the
    probe is a broadcast equi-join on (d, pos) — the query set never
    re-scans the corpus, which is the whole point: build once, answer any
    term-count question from 128 K counters. Terms absent from the corpus
    coalesce to 0 (their cells may be missing from the sparse sketch).
    """
    c = F.col(term_col)
    probes = terms.select(
        term_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), _cell_expr(c, d, width, mode).alias("pos")
                    )
                    for d in range(depth)
                ]
            )
        ).alias("__cell"),
    ).select(term_col, F.col("__cell.d").alias("d"), F.col("__cell.pos").alias("pos"))
    return (
        probes.join(F.broadcast(sketch), on=["d", "pos"], how="left")
        .groupBy(term_col)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("est"))
    )


def cms_heavy_hitters(
    docs: DataFrame, text_col: str, top: int = 20, margin: int = 4,
    width: int = 4096, depth: int = 4, mode: str = "xxhash64",
) -> DataFrame:
    """CERTIFIED-exact top-`top` whitespace tokens via a count-min sketch:
    `(term, n)` with n the EXACT count, ordered (n desc, term).

    The sketch prunes the exact-count pass to a candidate set instead of
    every distinct term:
      1. sketch the token multiset (constant memory);
      2. estimate every distinct term from the broadcast sketch and keep
         the top margin*top by (est desc, term) as CANDIDATES;
      3. exact-count candidates only (tokens left-semi broadcast-joined to
         the candidate list — the groupBy now runs on margin*top keys, not
         the unbounded vocabulary);
      4. CERTIFY: since est(t) >= count(t) for every term, the exact top-k
         is provably inside the candidate set if the k-th candidate's
         exact count is STRICTLY greater than the max estimate among
         NON-candidates (an outside term can then never reach the k-th
         count; at equality it could TIE on count and win the (n desc,
         term asc) order, so >= would certify a potentially-wrong list).
         A loud assert_true fails the job when the margin was too small —
         a silent near-miss top-k would be a wrong answer.

    At 100 TB the vocabulary-wide groupBy of a naive top-k is the
    bottleneck (billions of distinct terms, skewed); here the wide
    aggregations are both bounded: the sketch by depth*width, the exact
    pass by margin*top. The distinct-term estimate pass shuffles one row
    per distinct term per doc-partition (map-side distinct), the cheapest
    full-vocabulary statement that can be made.
    """
    toks = docs.select(F.explode(tokens(text_col)).alias("term")).where(
        F.col("term") != ""
    )
    sketch = countmin_sketch(toks, "term", width=width, depth=depth, mode=mode)
    vocab = toks.distinct()
    est = cms_estimate(sketch, vocab, "term", width=width, depth=depth, mode=mode)

    n_cand = margin * top
    cand = est.orderBy(F.col("est").desc(), "term").limit(n_cand)

    exact = (
        toks.join(F.broadcast(cand.select("term")), on="term", how="left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )

    # certification bound: max estimate outside the candidate set (1 row)
    max_out = (
        est.join(F.broadcast(cand.select("term")), on="term", how="left_anti")
        .agg(F.coalesce(F.max("est"), F.lit(0)).alias("__max_out"))
    )
    topk = exact.orderBy(F.col("n").desc(), "term").limit(top)
    kth = topk.agg(F.coalesce(F.min("n"), F.lit(0)).alias("__kth"))

    return (
        topk.crossJoin(F.broadcast(kth))
        .crossJoin(F.broadcast(max_out))
        .select(
            "term",
            F.coalesce(
                F.assert_true(
                    F.col("__kth") > F.col("__max_out"),
                    F.lit(
                        "cms_heavy_hitters: certification failed — the k-th "
                        "candidate's exact count is below an outside term's "
                        "estimate; raise `margin` (or width/depth)"
                    ),
                ).cast("long"),
                F.col("n"),
            ).alias("n"),
        )
    )
