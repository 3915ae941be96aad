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

from pyspark.sql import Column, DataFrame, Window, functions as F

from presto_workload_analyzer_spark.materialize import materialize

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


def kmv_sketch(
    df: DataFrame, group_col: str, term_col: str, k: int = 256, mode: str = "md5"
) -> DataFrame:
    """K-minimum-values distinct sketch per group: the k smallest distinct
    term hashes — `(group_col, h, rank)` with rank in [1, k].

    KMV (Bar-Yossef et al. 2002) is the mergeable distinct-count /
    set-similarity sketch: keeping the k smallest hash values of a set
    fixes sketch size at k rows per group regardless of corpus size, and
    the k-th smallest value estimates the distinct count as (k-1)/h_k for
    uniform h in (0,1). Build shape: distinct (group, term) -> hash ->
    per-group bottom-k. The distinct pass is map-side combined; the
    bottom-k window runs over per-group DISTINCT HASHES, not raw rows
    (grain = vocabulary of the group, and only the k smallest survive).

    md5 mode hashes to fixed-width lowercase hex so lexicographic order ==
    numeric order and DuckDB reproduces the identical sketch; xxhash64 is
    the production mode (zero-padded hex of the unsigned value preserves
    order JVM-side).

    The bottom-k is HIERARCHICAL (the pack_bins pattern): a first
    row_number over (group, shard) — shard = hash prefix mod n_shards —
    prunes each group to <= n_shards*k survivors in parallel tasks, and
    only the survivors (bounded BY CONSTRUCTION, not by data) flow into
    the per-group final rank. A single per-group window would sort each
    group's whole vocabulary (~1e8 distinct tokens/source at 100 TB)
    through one task.
    """
    c = F.col(term_col)
    if mode == "md5":
        h = F.md5(c)
    elif mode == "xxhash64":
        # map signed 64-bit to order-preserving fixed-width hex: flipping
        # the sign bit (XOR min-long) makes two's-complement hex sort in
        # signed order — no subtraction, no ANSI overflow
        h = F.lpad(
            F.hex(F.xxhash64(c).bitwiseXOR(F.lit(-9223372036854775808))), 16, "0"
        )
    else:
        raise ValueError(f"unknown hash mode {mode!r}")
    n_shards = 32
    hashes = (
        df.where(c.isNotNull())
        .select(F.col(group_col), h.alias("h"))
        .distinct()
        .withColumn("__shard", F.pmod(F.crc32(F.col("h")), F.lit(n_shards)))
    )
    w_local = Window.partitionBy(group_col, "__shard").orderBy("h")
    pruned = (
        hashes.withColumn("__lr", F.row_number().over(w_local))
        .filter(F.col("__lr") <= k)
    )
    w = Window.partitionBy(group_col).orderBy("h")
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(group_col, "h", "rank")
    )


def kmv_pairwise_jaccard(
    sketch: DataFrame, group_col: str, k: int = 256
) -> DataFrame:
    """Estimated pairwise Jaccard between every two groups from their KMV
    sketches: `(group_a, group_b, est_jaccard)` for group_a < group_b.

    The k smallest hashes of A ∪ B are a uniform sample of the union
    (Beyer et al. 2007), so |{h in bottom-k(A ∪ B) : h in A and h in B}|
    / k' is an unbiased Jaccard estimate (k' = min(k, |union sketch|)).
    Build: union both sketches' rows, per-pair bottom-k' window over at
    most 2k rows per pair, count rows present in both. Everything after
    the sketches is sketch-grain — pairs x 2k rows — so the all-pairs
    shape is affordable even with thousands of groups (pairs are
    quadratic in GROUPS, never in corpus size; 10^3 sources -> 5*10^5
    pairs x 2k rows, one modest shuffle).

    When k >= the union's distinct-hash count for every pair, the sketch
    IS the full set and the estimate is EXACTLY the Jaccard — the
    exactness reduction the driver oracle uses (same pattern as IVF
    n_probe == n_cells).
    """
    # materialize the sketch once: five references below (both sides of
    # the intersection join, both sides of the union, and the group list)
    # would otherwise each re-execute the full upstream gram-explode +
    # bottom-k chain (r15 plan-audit discipline). Sketch grain is
    # groups x k rows — bounded at any corpus scale.
    sketch = sketch.transform(materialize)
    a = sketch.select(
        F.col(group_col).alias("ga"), F.col("h").alias("h")
    )
    b = sketch.select(
        F.col(group_col).alias("gb"), F.col("h").alias("h")
    )
    # every (pair, h) with a flag for which side(s) contributed
    pairs = (
        a.join(b, on="h")
        .filter(F.col("ga") < F.col("gb"))
        .select("ga", "gb", "h", F.lit(1).alias("in_both"))
    )
    # union of the two sketches per pair: all hashes from either sketch
    ga = sketch.select(F.col(group_col).alias("ga"), "h")
    gb = sketch.select(F.col(group_col).alias("gb"), "h")
    groups = sketch.select(F.col(group_col).alias("g")).distinct()
    pair_frame = (
        groups.select(F.col("g").alias("ga"))
        .join(F.broadcast(groups.select(F.col("g").alias("gb"))))
        .filter(F.col("ga") < F.col("gb"))
    )
    union = (
        pair_frame.join(ga, on="ga")
        .select("ga", "gb", "h")
        .unionByName(pair_frame.join(gb, on="gb").select("ga", "gb", "h"))
        .distinct()
    )
    w = Window.partitionBy("ga", "gb").orderBy("h")
    bottom = union.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
    joined = bottom.join(pairs, on=["ga", "gb", "h"], how="left")
    return (
        joined.groupBy("ga", "gb")
        .agg(
            F.count(F.lit(1)).alias("__kprime"),
            F.sum(F.coalesce(F.col("in_both"), F.lit(0))).alias("__shared"),
        )
        .select(
            "ga",
            "gb",
            F.round(F.col("__shared") / F.col("__kprime"), 6).alias("est_jaccard"),
        )
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


def histogram_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    resolution: int = 100,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Mergeable fixed-resolution histogram quantiles per group:
    `(group_col, n, p50, p90, ...)` — the production shape for
    percentile dashboards over metrics with a known resolution (latencies
    in ms, money in cents): bin = round(value * resolution), the
    histogram is ONE map-side-combinable groupBy bounded by the value
    range x resolution (not the row count), histograms merge by cell
    addition across shards/days for free, and the quantile readout is
    "smallest bin whose cumulative count reaches ceil(q * n)" —
    EXACT at the resolution grain (quantile_disc of the rounded values),
    not an approximation.

    The cumulative window partitions by the group over AGGREGATED bins
    (cardinality = range x resolution, a schema constant — e.g. <= 49 K
    cells for a 0..490 metric at centi-resolution), never raw rows; this
    is the aggregated-grain pattern the engine's plan lint enforces.
    At 100 TB the histogram build is scan + tiny shuffle, and the
    readout cost is independent of the corpus entirely.
    """
    # NULL values are unmeasurable, not bin cells: every percentile
    # implementation (SQL percentile_cont/disc included) ignores them,
    # and a NULL bin would otherwise cumulate NULLS-FIRST here but
    # NULLS-LAST in ANSI engines, shifting every readout
    bins = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            group_col,
            F.round(F.col(value_col) * resolution, 0).cast("long").alias("__bin"),
        )
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return histogram_readout(bins, group_col, resolution=resolution, qs=qs)


def histogram_readout(
    bins: DataFrame,
    group_col: str,
    resolution: int = 100,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Quantile readout over an already-built `(group, __bin, __n)` cell
    frame — the merge-then-read half of histogram_quantiles, reusable on
    histograms accumulated elsewhere (a streaming complete-mode agg, a
    union of per-day histograms, a parquet-persisted sketch store). The
    cumulative window runs over AGGREGATED cells only."""
    w = (
        Window.partitionBy(group_col)
        .orderBy("__bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # total via an unbounded partition window rather than a groupBy +
    # self-join: one pass over the (aggregated) cells, and no conflicting
    # self-references when the cell frame is an externally-materialized
    # table (e.g. a drained streaming memory sink)
    w_tot = Window.partitionBy(group_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    j = bins.withColumn("__cum", F.sum("__n").over(w)).withColumn(
        "__tot", F.sum("__n").over(w_tot)
    )
    aggs = [F.max("__tot").cast("long").alias("n")]
    for q in qs:
        label = f"p{round(q * 100):d}"
        aggs.append(
            F.round(
                F.min(
                    F.when(
                        F.col("__cum") >= F.ceil(F.lit(q) * F.col("__tot")),
                        F.col("__bin"),
                    )
                )
                / resolution,
                6,
            ).alias(label)
        )
    return j.groupBy(group_col).agg(*aggs)


def cms_inner_product(sk_a: DataFrame, sk_b: DataFrame) -> DataFrame:
    """Equi-join cardinality estimate from two count-min sketches: one row
    `(est,)` = min over depth rows of the cell-wise inner product.

    The classic sketch identity (Cormode & Muthukrishnan 2005, §4.2):
    sum_w cms_A[d][w] * cms_B[d][w] >= |A join B on key| for every d,
    with overshoot bounded by n_A * n_B * e / width — so the min over
    depth is a one-sided join-size estimate from CONSTANT-size state.
    This is what a cost-based optimizer consults before picking a join
    strategy at 100 TB: both sides' sketches are built in one scan each
    (mergeable across shards), and the estimate itself joins depth x
    width cells — microseconds, no data movement.

    A-side cells missing from B contribute zero (left join + coalesce);
    depth rows always exist on the A side, so an empty-overlap row
    correctly yields est = 0 rather than vanishing from the min.
    """
    b = sk_b.select("d", "pos", F.col("n").alias("__nb"))
    per_d = (
        sk_a.join(b, on=["d", "pos"], how="left")
        .groupBy("d")
        .agg(
            F.sum(F.col("n") * F.coalesce(F.col("__nb"), F.lit(0))).alias("__ip")
        )
    )
    return per_d.agg(F.min("__ip").cast("long").alias("est"))


def hll_registers(
    terms: DataFrame, group_col: str, term_col: str, p: int = 8
) -> DataFrame:
    """HyperLogLog registers per group: (group, reg, mx) with at most
    2^p rows per group — the constant-size mergeable distinct sketch
    (Flajolet et al., public literature), laid out engine-portably:
    register = first p/4 hex digits of md5(term), rho = 17 - len(bin(s))
    over the next 16 hash bits (bin() drops leading zeros identically in
    Spark and DuckDB, so the rank function replays bit-for-bit — no
    platform popcount/clz dependence). Merge across shards/partitions is
    max per (group, reg): map-side combinable, constant state."""
    assert p == 8, "portable layout fixed at p=8 (256 registers)"
    h = F.md5(F.col(term_col).cast("string"))
    reg = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    s = F.conv(F.substring(h, 3, 4), 16, 10).cast("long")
    rho = F.when(s == 0, F.lit(17)).otherwise(
        17 - F.length(F.bin(s))
    ).cast("int")
    return (
        terms.select(F.col(group_col).alias("g"), reg.alias("reg"), rho.alias("rho"))
        .groupBy("g", "reg")
        .agg(F.max("rho").alias("mx"))
    )


def hll_estimate(registers: DataFrame, p: int = 8) -> DataFrame:
    """Distinct-count estimate per group from hll_registers output:
    (g, est) via the standard raw harmonic-mean estimator with the
    small-range linear-counting correction (E < 5/2 m and V > 0 ->
    m ln(m/V)). Absent registers count as zero-valued (the 2^0 = 1 sum
    term and the V tally) through a generated full register frame, so
    the estimate is exact over the sketch regardless of sparsity."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    groups = registers.select("g").distinct()
    full = groups.crossJoin(
        F.broadcast(
            registers.sparkSession.range(m).select(F.col("id").cast("int").alias("reg"))
        )
    )
    j = full.join(registers, ["g", "reg"], "left").select(
        "g", F.coalesce(F.col("mx"), F.lit(0)).alias("mx")
    )
    agg = j.groupBy("g").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("__z"),
        F.sum((F.col("mx") == 0).cast("long")).alias("__v"),
    )
    raw = F.lit(alpha * m * m) / F.col("__z")
    est = F.when(
        (raw < 2.5 * m) & (F.col("__v") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("__v")),
    ).otherwise(raw)
    return agg.select("g", F.round(est + 1e-9, 6).alias("est"))
