"""STAGED driver queries — implemented, oracle-paired, locally verified,
NOT yet registered.

The staging cadence (proven over rounds 7-12): implement the operator in
extensions/, pair it with an exact DuckDB oracle here, get
tests/test_staged_queries.py green at BOTH sf0.001 and sf0.01 (the same
spark-vs-DuckDB compare the local gate applies to registered queries,
plus the plan lint's core bans and the oracle dtype ban), then register
next round by moving the (name, fn, sql) triple into
driver_queries._register — a move, not a debugging session.

Registration history: xs1-xs5 (round 9, registry 222 -> 227),
xs6-xs13 + s18 (round 11, 227 -> 236), xs14-xs19 + s19 + s20
(round 12, 236 -> 244), xs20-xs27 (round 13, 244 -> 252),
xs28-xs34 + s21 (round 14, 252 -> 260), xs35/xs36 + s22 (round 15,
260 -> 263).

Staging tiers live here so each round's registration stays <= 8
(the driver window must cover gate + new + stale in one round):
`STAGED` (xs20-xs27), `STAGED_NEXT` (xs28-xs34 + s21), and
`STAGED_TIER3` (xs35/xs36 + s22) registered in rounds 13/14/15 and are
now empty; `STAGED_TIER4` (xs37-xs39 + s23, the k-means
clustering surface) in round 16; `STAGED_TIER5` (xs40-xs43 + s24, the
context-budget / repeat-epochs / readability-curriculum surface, staged
in round 14 after the tier-2 batch drained) in round 17; `STAGED_TIER6`
(xs44-xs47: distinct-n diversity, exact stratified split, dup-leakage
matrix, term burstiness — also staged round 14) in round 18;
`STAGED_TIER7` (xs48/xs49 + s25: PMI collocations, trigram backoff
pressure, streaming term-moments — also staged round 14) in round 19.
All tiers gate identically in tests/test_staged_queries.py.

Registration checklist for each entry:
  * move (name, fn, sql) into driver_queries._register;
  * if the plan uses a declared Arrow surface (mapInPandas etc.), add the
    name to tests/test_plan_lint._ALLOWED_PANDAS — this batch is pure
    Column/join/window plans and needs no exemption;
  * column names aliased identically on both sides, integer aggregates
    cast to BIGINT, floats rounded to 6 after scaling, no
    HUGEINT/DECIMAL/UHUGEINT anywhere in the oracle's DESCRIBE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# (xs20-xs27 registered in round 13 — moved verbatim into
# driver_queries; this tier is empty until the next batch stages.)
STAGED: dict[str, tuple] = {}


# (xs28-xs34 + s21 registered in round 14 — moved verbatim into
# driver_queries; this tier is empty until the next batch stages.)
STAGED_NEXT: dict[str, tuple] = {}


# (xs35/xs36 + s22 registered in round 15 — moved verbatim into
# driver_queries with the byte-identical oracle assert; this tier is
# empty until the next batch stages.)
STAGED_TIER3: dict[str, tuple] = {}


# ---------------------------------------------------------------------------
# TIER-4 staging (the round-16 pipeline; registers after STAGED_TIER3 so
# every round's registration stays <= 8). The batch lands the corpus
# CLUSTERING surface the published curation pipelines actually run on —
# D4 (Tirumala et al. 2023) and SemDeDup (Abbas et al. 2023) both
# k-means the corpus embeddings before pruning — at exact-replay grade
# (the x119/xs32 falsifiability pattern), plus the tokenizer-sizing
# coverage table:
#
#   * xs37_kmeans_lloyd      — Lloyd's k-means (k=4, 3 updates), seeds =
#                              k lowest ids, rounded-distance argmin with
#                              lowest-index ties, 6dp-rounded centroid
#                              means; the full trajectory replays in
#                              sequential SQL — one wrong argmin /
#                              tie-break / mean anywhere is a hash
#                              mismatch. The exact-replay grade of the
#                              MLlib KMeans inside ivf_topk.
#   * xs38_kmeans_prototypes — D4 prototypicality over the k-means
#                              cells (the paper's ACTUAL cluster grain;
#                              xs29 ranks within near-dup CC clusters):
#                              cosine to the assigned final centroid,
#                              rank 1 = most prototypical (pruned first).
#   * xs39_vocab_coverage    — tokenizer-sizing coverage table: share of
#                              corpus tokens covered by the top-V
#                              vocabulary at V = 2/4/8/16 (corpus-
#                              calibrated; 32k-256k in production — the
#                              decision table behind vocab-size choices;
#                              the cumulative companion of x55's Zipf
#                              slope). Hierarchical two-level rank —
#                              no task ever sorts the whole vocabulary.
#   * s23_stream_kmeans_assign — the STREAMING seam of xs37: arriving
#                              embeddings assign against the STATIC
#                              final centroids (stateless literal-expr
#                              map — the serving-side shape) feeding a
#                              stateful per-cell count/dist-mass
#                              aggregation (state grain = k cells).
#
# Shared trajectory silver (r14, per the r13 registration note):
# xs37/xs38/s23 all consume shared_kmeans_centroids below — the
# centroid trajectory (iters+1 scans, 3 bounded collects) is computed
# once per (process, corpus) and memoized, the shared_dedup_clusters
# economics for driver-held state (a k x dims list, not a DataFrame).
# At the r16 registration the memo + accessor move to driver_queries
# with the batch.
#
# Pre-registration scale posture (measured, .bench_sf/sf1 = 10x rows):
# xs37 4.2 -> 8.1 s (1.9x), xs38 5.0 -> 9.7 s (2.0x), xs39 1.3 -> 1.9 s
# (1.5x), s23 4.8 -> 9.0 s (1.9x) — fixed per-iteration job overhead
# dominates; the data-dependent term is the scan-speed assignment pass.
#
# Calibration pinned by tests (test_extensions.py): cluster sizes
# non-degenerate at all three SFs; assignment argmin margins and
# centroid rounding-boundary margins clear cross-engine fp drift by
# >= 10x the drift bound; iterations genuinely move assignments;
# coverage strictly increases in V and discriminates at the small end.
# ---------------------------------------------------------------------------

_XS37_K = 4
_XS37_ITERS = 3
_XS37_DIM = 64

# (corpus path + parquet file fingerprint) -> final centroids;
# deterministic data (kmeans_centroids' exact-replay contract), so a
# process-lifetime memo is safe across Spark sessions — and keying on
# the file's (mtime_ns, size) means an in-process corpus regeneration
# (tools/make_sf.py rewriting .bench_sf or testdata between checks)
# invalidates the entry instead of silently serving stale centroids.
_KMEANS_CENTS_CACHE: dict[tuple, list] = {}


def _corpus_fingerprint(path: str) -> tuple:
    import os

    try:
        st = os.stat(path)
        return (path, st.st_mtime_ns, st.st_size)
    except OSError:
        # non-local paths (hdfs/s3 in production) fall back to the
        # path-only key — document the regeneration hazard there
        return (path,)


def shared_kmeans_centroids(spark: SparkSession, sf: str) -> list:
    """The trained-centroid silver all three k-means consumers read
    (xs37 assignment, xs38 prototypicality, s23 streaming cell monitor):
    similarity.kmeans_centroids' exact-replay trajectory, computed once
    per (process, corpus file-version) — k x dims driver-held floats,
    the bounded state class of BPE's merge list. Sharing it means the
    driver bench pays the iteration cost (iters+1 scans) once, not
    three times, and the three queries hash the SAME centroids by
    construction."""
    key = _corpus_fingerprint(f"{sf}/embeddings.parquet")
    if key not in _KMEANS_CENTS_CACHE:
        from presto_workload_analyzer_spark.extensions import similarity
        from presto_workload_analyzer_spark.sources import read_table

        emb = read_table(spark, f"{sf}/embeddings.parquet")
        _KMEANS_CENTS_CACHE[key] = similarity.kmeans_centroids(
            emb, "vec_id", "embedding", k=_XS37_K, iters=_XS37_ITERS
        )
    return _KMEANS_CENTS_CACHE[key]


def _kmeans_sql_chain(k: int = _XS37_K, iters: int = _XS37_ITERS,
                      dim: int = _XS37_DIM) -> str:
    """The shared Lloyd's trajectory CTE chain, ending at the final
    assignment `a{iters+1}(vec_id, cl, d)` and final centroids
    `c{iters}(cl, cv)` — xs37/xs38/s23 all splice it so the three
    contracts cannot drift. MATERIALIZED pins per stage (the xs32/xs34
    lesson: un-materialized, each c{t} reference re-expands the whole
    upstream chain — exponential plan text + one parquet re-open per
    inlined scan)."""

    def dsel(cent: str) -> str:
        return (
            f" SELECT e.vec_id, {cent}.cl,"
            f" round((list_dot_product(e.v, e.v)"
            f" - 2*list_dot_product(e.v, {cent}.cv))"
            f" + list_dot_product({cent}.cv, {cent}.cv) + 1e-9, 6) AS d"
            f" FROM e, {cent}"
        )

    parts = [
        "e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings)",
        f"sd AS MATERIALIZED (SELECT vec_id, v FROM e ORDER BY vec_id"
        f" LIMIT {k})",
        "c0 AS MATERIALIZED (SELECT CAST(row_number() OVER (ORDER BY vec_id)"
        " - 1 AS BIGINT) AS cl,"
        " list_transform(v, x -> round(x + 1e-9, 6)) AS cv FROM sd)",
    ]
    for t in range(1, iters + 2):
        prev = f"c{t - 1}"
        parts.append(
            f"a{t} AS MATERIALIZED (SELECT vec_id, cl, d FROM ("
            f" SELECT vec_id, cl, d, row_number() OVER (PARTITION BY vec_id"
            f" ORDER BY d, cl) AS rn FROM ({dsel(prev)}) dd) rr WHERE rn = 1)"
        )
        if t <= iters:
            parts.append(
                f"m{t} AS (SELECT a{t}.cl, u.pos, avg(e.v[u.pos]) AS m"
                f" FROM a{t} JOIN e USING (vec_id),"
                f" UNNEST(range(1, {dim + 1})) AS u(pos) GROUP BY 1, 2)"
            )
            parts.append(
                f"c{t} AS MATERIALIZED (SELECT cl,"
                f" list(round(m + 1e-9, 6) ORDER BY pos) AS cv FROM m{t}"
                f" GROUP BY cl)"
            )
    return "WITH " + ", ".join(parts)


def xs37_kmeans_lloyd(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-replay Lloyd's k-means over the corpus embeddings — the
    clustering step D4/SemDeDup-style curation pipelines run before
    per-cluster pruning, at hash-gated grade (similarity.kmeans_lloyd
    has the determinism contract and the 100 TB shuffle audit: centroids
    are a driver-held k x dims table, each iteration one scan-speed
    assignment pass + a (k x dims)-grain mean, iters+1 scans total).
    The trajectory itself comes from the shared_kmeans_centroids silver
    (computed once per corpus, shared with xs38/s23)."""
    from presto_workload_analyzer_spark.extensions import similarity
    from presto_workload_analyzer_spark.sources import read_table

    emb = read_table(spark, f"{sf}/embeddings.parquet")
    return similarity.kmeans_lloyd(
        emb, "vec_id", "embedding", k=_XS37_K, iters=_XS37_ITERS,
        cents=shared_kmeans_centroids(spark, sf),
    ).withColumnRenamed("id", "vec_id")


def xs37_sql() -> str:
    return (
        _kmeans_sql_chain()
        + f" SELECT vec_id, cl AS cluster, d AS dist FROM a{_XS37_ITERS + 1}"
    )


def xs38_kmeans_prototypes(spark: SparkSession, sf: str) -> DataFrame:
    """D4 prototypicality at the paper's ACTUAL cluster grain: members
    of each k-means cell ranked by cosine to the cell's final centroid
    (rank 1 = most prototypical = pruned first). xs29 emits the same
    signal over near-dup CC clusters; this is the k-means-cell version,
    sharing xs37's trajectory so the two queries hash the SAME centroids
    (any drift between the clustering and the ranking is a mismatch).
    Output: (vec_id, cluster, cluster_size, cos_centroid, proto_rank);
    the rank window partitions by cluster (group grain, k cells)."""
    from pyspark.sql import Window

    from presto_workload_analyzer_spark.extensions import similarity
    from presto_workload_analyzer_spark.sources import read_table

    emb = read_table(spark, f"{sf}/embeddings.parquet")
    cents = shared_kmeans_centroids(spark, sf)
    cen = spark.createDataFrame(
        [(j, cents[j]) for j in range(len(cents))],
        "cluster LONG, __cv ARRAY<DOUBLE>",
    )
    df = emb.select(
        "vec_id", similarity._to_double(F.col("embedding")).alias("__v")
    )
    cl, _d = similarity._kmeans_assign_cols(F.col("__v"), cents)
    mem = df.select("vec_id", "__v", cl.alias("cluster")).join(
        F.broadcast(cen), "cluster"
    )
    cos = F.round(
        similarity.cosine_expr(F.col("__v"), F.col("__cv")) + F.lit(1e-9), 6
    )
    sized = mem.select("cluster", "vec_id", cos.alias("cos_centroid")).join(
        F.broadcast(
            mem.groupBy("cluster").agg(
                F.count(F.lit(1)).cast("long").alias("cluster_size")
            )
        ),
        "cluster",
    )
    w = Window.partitionBy("cluster").orderBy(
        F.desc("cos_centroid"), F.asc("vec_id")
    )
    return sized.select(
        "vec_id",
        "cluster",
        "cluster_size",
        "cos_centroid",
        F.row_number().over(w).cast("long").alias("proto_rank"),
    )


def xs38_sql() -> str:
    it = _XS37_ITERS
    cos = (
        "list_dot_product(e.v, c.cv) / (sqrt(list_dot_product(e.v, e.v))"
        " * sqrt(list_dot_product(c.cv, c.cv)))"
    )
    return (
        _kmeans_sql_chain()
        + f", mem AS (SELECT a.vec_id, a.cl,"
        f"   round({cos} + 1e-9, 6) AS cos_centroid"
        f"  FROM a{it + 1} a JOIN e ON e.vec_id = a.vec_id"
        f"   JOIN c{it} c ON c.cl = a.cl),"
        " sz AS (SELECT cl, CAST(count(*) AS BIGINT) AS cluster_size"
        "  FROM mem GROUP BY 1)"
        " SELECT mem.vec_id, mem.cl AS cluster, sz.cluster_size,"
        "  mem.cos_centroid,"
        "  CAST(row_number() OVER (PARTITION BY mem.cl"
        "   ORDER BY mem.cos_centroid DESC, mem.vec_id) AS BIGINT)"
        "   AS proto_rank"
        " FROM mem JOIN sz ON sz.cl = mem.cl"
    )


def s23_stream_kmeans_assign(spark: SparkSession, sf: str) -> DataFrame:
    """The STREAMING seam of xs37 — the serving-side deployment of a
    trained clustering: embeddings arrive continuously, each assigns
    against the STATIC final centroids (a stateless literal-expression
    map — the same _kmeans_assign_cols the batch side runs, so the two
    contracts cannot drift) feeding a stateful per-cell aggregation
    (count + distance mass; state grain = k cells, never corpus rows) —
    the cell-population / drift monitor an embedding-ingest pipeline
    publishes per trigger. Complete-mode memory drain in the gate; the
    production sink is the foreachBatch upsert path. Oracle: xs37's own
    chain aggregated to cell grain."""
    import uuid

    from presto_workload_analyzer_spark.extensions import similarity
    from presto_workload_analyzer_spark.streaming import (
        run_to_memory,
        state_partitions,
        stream_sf_table,
    )

    cents = shared_kmeans_centroids(spark, sf)
    v = similarity._to_double(F.col("embedding"))
    cl, d = similarity._kmeans_assign_cols(v, cents)
    agg = (
        stream_sf_table(spark, sf, "embeddings")
        .select(cl.alias("cluster"), d.alias("__d"))
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.round(F.sum("__d") + F.lit(1e-9), 6).alias("dist_mass"),
            F.round(F.avg("__d") + F.lit(1e-9), 6).alias("mean_dist"),
        )
    )
    name = f"s23_mem_{uuid.uuid4().hex[:8]}"
    with state_partitions(spark, 8):
        q = run_to_memory(agg, name, output_mode="complete")
        q.awaitTermination(300)
    tbl = spark.table(name)
    return spark.createDataFrame(tbl.collect(), tbl.schema)


def s23_sql() -> str:
    it = _XS37_ITERS
    return (
        _kmeans_sql_chain()
        + f" SELECT cl AS cluster, CAST(count(*) AS BIGINT) AS n_vecs,"
        f"  round(sum(d) + 1e-9, 6) AS dist_mass,"
        f"  round(avg(d) + 1e-9, 6) AS mean_dist"
        f" FROM a{it + 1} GROUP BY 1"
    )


# V calibrated to the synthetic corpus's 31-word vocabulary (the
# template generator draws from a fixed word list): 2/4/8/16 span
# coverage 0.14 -> 0.55 at every SF, so the curve genuinely
# discriminates; production corpora run the same operator at
# 32k-256k. max(V) also bounds the per-shard rank prune.
_XS39_SIZES = (2, 4, 8, 16)


def xs39_vocab_coverage(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenizer-SIZING coverage table: the share of corpus tokens
    covered by the top-V vocabulary at V = 2/4/8/16 (_XS39_SIZES,
    corpus-calibrated — the synthetic corpus has a 31-word vocabulary;
    production corpora run the same operator at 32k-256k) — the
    decision table behind every vocab-size choice (and the cumulative
    companion of x55's Zipf slope: the slope says how fast the tail
    thins, this says what a budget of V types actually buys). Token
    stream is the engine's standard (lowercased, empty-dropped).

    100 TB shape: everything past the one corpus-grain token count lives
    at VOCABULARY grain. The global frequency rank runs two-level,
    sharded by -floor(log2(count)) (monotone between shards under
    (count DESC, word ASC) — x55's convention), so no task ever sorts
    the whole vocabulary; shard offsets come from a triangular join over
    the ~25 shard CELLS (log2 of the count range — bounded by
    construction), so there is NO unpartitioned window anywhere, not
    even a single-reducer one; a local rank prune at max(V) bounds the
    rows carried forward. Totals broadcast as one scalar row."""
    from pyspark.sql import Window

    from presto_workload_analyzer_spark.extensions.textstats import tokens
    from presto_workload_analyzer_spark.sources import read_table

    docs = read_table(spark, f"{sf}/documents.parquet")
    toks = (
        docs.filter(F.col("text").isNotNull())
        .select(
            F.explode(
                F.transform(tokens("text"), lambda t: F.lower(t))
            ).alias("w")
        )
        .filter(F.col("w") != "")
    )
    counts = toks.groupBy("w").agg(F.count(F.lit(1)).alias("__c"))
    totals = counts.agg(
        F.sum("__c").cast("long").alias("__tot"),
        F.count(F.lit(1)).cast("long").alias("__vocab"),
    )
    rows = counts.withColumn(
        "__shard", (-F.floor(F.log2("__c"))).cast("long")
    )
    w_local = Window.partitionBy("__shard").orderBy(
        F.col("__c").desc(), F.col("w").asc()
    )
    local = rows.withColumn("__lrn", F.row_number().over(w_local)).filter(
        F.col("__lrn") <= max(_XS39_SIZES)
    )
    cells = rows.groupBy("__shard").agg(F.count(F.lit(1)).alias("__n"))
    a, b = cells.alias("a"), cells.alias("b")
    offs = (
        a.join(b, F.col("b.__shard") < F.col("a.__shard"), "left")
        .groupBy(F.col("a.__shard").alias("__shard"))
        .agg(F.coalesce(F.sum("b.__n"), F.lit(0)).alias("__off"))
    )
    ranked = local.join(F.broadcast(offs), "__shard").select(
        "__c", "w", (F.col("__off") + F.col("__lrn")).alias("__rank")
    )
    sizes = F.array(*[F.lit(v) for v in _XS39_SIZES])
    hits = (
        ranked.select("__c", "__rank", F.explode(sizes).alias("vocab_size"))
        .filter(F.col("__rank") <= F.col("vocab_size"))
        .groupBy("vocab_size")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("__c").cast("long").alias("covered_tokens"),
        )
    )
    return hits.join(F.broadcast(totals)).select(
        F.col("vocab_size").cast("long").alias("vocab_size"),
        "n_words",
        "covered_tokens",
        F.col("__tot").alias("total_tokens"),
        F.round(
            F.col("covered_tokens") / F.col("__tot") + F.lit(1e-9), 6
        ).alias("coverage"),
    )


def xs39_sql() -> str:
    sizes = ", ".join(str(v) for v in _XS39_SIZES)
    return (
        "WITH u AS (SELECT w FROM (SELECT unnest(list_transform("
        "   string_split_regex(trim(text), '\\s+'), t -> lower(t))) AS w"
        "  FROM documents WHERE text IS NOT NULL) q0 WHERE w <> ''),"
        " c AS (SELECT w, count(*) AS cnt FROM u GROUP BY 1),"
        " tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot,"
        "   CAST(count(*) AS BIGINT) AS vocab FROM c),"
        " r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, w ASC)"
        "   AS rank FROM c),"
        f" vv AS (SELECT unnest([{sizes}]) AS vocab_size),"
        " hit AS (SELECT vocab_size, CAST(count(*) AS BIGINT) AS n_words,"
        "   CAST(sum(cnt) AS BIGINT) AS covered_tokens"
        "  FROM r JOIN vv ON r.rank <= vv.vocab_size GROUP BY 1)"
        " SELECT CAST(vocab_size AS BIGINT) AS vocab_size, n_words,"
        "  covered_tokens, tot AS total_tokens,"
        "  round(covered_tokens / (1.0 * tot) + 1e-9, 6) AS coverage"
        " FROM hit, tot"
    )


STAGED_TIER4: dict[str, tuple] = {
    "xs37_kmeans_lloyd": (xs37_kmeans_lloyd, xs37_sql()),
    "xs38_kmeans_prototypes": (xs38_kmeans_prototypes, xs38_sql()),
    "xs39_vocab_coverage": (xs39_vocab_coverage, xs39_sql()),
    "s23_stream_kmeans_assign": (s23_stream_kmeans_assign, s23_sql()),
}


# ---------------------------------------------------------------------------
# TIER-5 staging (the round-17 pipeline; staged in round 14 after the
# tier-2 batch drained, keeping every round's registration <= 8). Four
# batch entries + one streaming seam, four families the registry does
# not yet cover:
#
#   * xs40_context_budget   — the max-sequence-length DECISION TABLE:
#                             per candidate context length L, docs
#                             truncated / tokens kept / tokens lost /
#                             loss share — the measurement behind every
#                             "train at 2k or 8k?" budget choice (the
#                             decision-table companion of x39/xs17's
#                             packing, which assume L already chosen).
#   * xs41_repeat_epochs    — data-constrained epoch allocation with
#                             diminishing repeat value (Muennighoff et
#                             al. 2023 arXiv:2305.16264 shape): greedy
#                             over (source, epoch) marginal-value cells
#                             under a token budget, geometric decay —
#                             the repeats-aware upgrade of the xs6/xs9
#                             single-epoch mixers.
#   * xs42_readability      — Flesch-Kincaid-style readability battery
#                             per source over the reconstructed
#                             multi-line corpus (pooled EXACT-integer
#                             sums; grade from one fixed expression) —
#                             the curriculum-difficulty signal.
#   * xs43_curriculum_order — easy-first curriculum SCHEDULE at doc
#                             grain: per-doc grade -> decile (sketch
#                             boundaries, xs30's shape) -> global
#                             position via the hierarchical two-level
#                             rank (no unpartitioned window) with a
#                             within-decile md5 shuffle.
#   * s24_stream_context_budget — xs40's streaming seam: stateless
#                             per-doc token count feeding a stateful
#                             per-L aggregation (state grain = |L|
#                             cells); the ingest-side context-budget
#                             monitor.
#
# Calibration (corpus-measured): token lengths run 10-100 (median ~55),
# so _XS40_LENS = (16, 32, 64, 96) spans truncate-everything ->
# truncate-the-tail (production: 2k-32k). The synthesized multi-line
# corpus (xs14's _chunk_lines convention — this corpus has no native
# punctuation) gives FK grades 0-10.6, median ~5.5 -> _XS42_EASY = 5.5
# splits genuinely; n_sentences runs 1-9. The xs41 grid: 20 sources x
# K=8 epochs, budget 60000 ~ 2.2 corpus epochs at sf0.001/0.01 and
# ~0.2 at sf0.1 — both shapes non-degenerate (asserted per SF).
# ---------------------------------------------------------------------------

_XS40_LENS = (16, 32, 64, 96)
_XS41_BUDGET = 60_000.0
_XS41_DECAY = 0.5
_XS41_EPOCHS = 8
_XS42_EASY = 5.5
_XS43_DECILES = tuple(i / 10.0 for i in range(1, 10))


def xs40_context_budget(spark: SparkSession, sf: str) -> DataFrame:
    """Context-length budget table: for each candidate max sequence
    length L, how many documents would truncate and how much token mass
    the cut loses — the decision table behind the max-seq-len choice
    (packing ops x39/xs17 take L as GIVEN; this measures what each L
    costs). Token grain is the engine's token_count (x39's convention).

    100 TB: one corpus scan; the explode multiplies rows by |L| (4) but
    every row is one integer — the aggregate is map-side combinable to
    |L| cells, so the shuffle is constant-size at any corpus."""
    from presto_workload_analyzer_spark.extensions import textstats
    from presto_workload_analyzer_spark.sources import read_table

    docs = read_table(spark, f"{sf}/documents.parquet")
    nt = docs.filter(F.col("text").isNotNull()).select(
        textstats.token_count("text").cast("long").alias("__n")
    )
    sizes = F.array(*[F.lit(v) for v in _XS40_LENS])
    x = nt.select("__n", F.explode(sizes).alias("seq_len"))
    kept = F.sum(F.least(F.col("__n"), F.col("seq_len")))
    lost = F.sum(F.greatest(F.col("__n") - F.col("seq_len"), F.lit(0)))
    return (
        x.groupBy("seq_len")
        .agg(
            F.sum((F.col("__n") > F.col("seq_len")).cast("long"))
            .cast("long")
            .alias("n_docs_truncated"),
            kept.cast("long").alias("tokens_kept"),
            lost.cast("long").alias("tokens_lost"),
        )
        .select(
            F.col("seq_len").cast("long").alias("seq_len"),
            "n_docs_truncated",
            "tokens_kept",
            "tokens_lost",
            F.round(
                F.col("tokens_lost")
                / (F.col("tokens_kept") + F.col("tokens_lost"))
                + F.lit(1e-9),
                6,
            ).alias("loss_share"),
        )
    )


def xs40_sql() -> str:
    lens = ", ".join(str(v) for v in _XS40_LENS)
    return (
        "WITH nt AS (SELECT len(string_split_regex(trim(text), '\\s+')) AS n"
        "  FROM documents WHERE text IS NOT NULL),"
        f" l AS (SELECT unnest([{lens}]) AS seq_len),"
        " x AS (SELECT seq_len, n FROM nt, l)"
        " SELECT CAST(seq_len AS BIGINT) AS seq_len,"
        "  CAST(sum(CASE WHEN n > seq_len THEN 1 ELSE 0 END) AS BIGINT)"
        "   AS n_docs_truncated,"
        "  CAST(sum(least(n, seq_len)) AS BIGINT) AS tokens_kept,"
        "  CAST(sum(greatest(n - seq_len, 0)) AS BIGINT) AS tokens_lost,"
        "  round(sum(greatest(n - seq_len, 0))"
        "   / (1.0 * sum(n)) + 1e-9, 6) AS loss_share"
        " FROM x GROUP BY 1"
    )


def xs41_repeat_epochs(spark: SparkSession, sf: str) -> DataFrame:
    """Data-constrained epoch allocation (Muennighoff et al. 2023
    shape): spread a token budget over (source, epoch) cells whose
    marginal value decays geometrically in the epoch index — the
    repeats-aware mixer beside the single-epoch allocators (xs6 UniMax,
    xs9 temperature). sampling.repeat_decay_mix has the determinism
    contract (exact-literal decay powers, greedy order, fractional
    boundary cell) and the 100 TB audit (bounded grid, broadcast
    triangular join, no window)."""
    from presto_workload_analyzer_spark.extensions import sampling, textstats
    from presto_workload_analyzer_spark.sources import read_table

    docs = read_table(spark, f"{sf}/documents.parquet")
    per = docs.groupBy("source").agg(
        F.sum(textstats.token_count("text").cast("long")).alias("__tok")
    )
    return sampling.repeat_decay_mix(
        per,
        "source",
        "__tok",
        budget=_XS41_BUDGET,
        decay=_XS41_DECAY,
        max_epochs=_XS41_EPOCHS,
    )


def xs41_sql() -> str:
    from presto_workload_analyzer_spark.extensions.sampling import (
        repeat_decay_powers,
    )

    b, k = _XS41_BUDGET, _XS41_EPOCHS
    pows = repeat_decay_powers(_XS41_DECAY, k)
    geo = [0.0]
    for i in range(k):
        geo.append(geo[-1] + pows[i])
    plist = ", ".join(repr(p) for p in pows)
    glist = ", ".join(repr(g) for g in geo)
    return (
        "WITH per AS (SELECT source,"
        "   CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)"
        "    AS t FROM documents GROUP BY 1),"
        f" g AS (SELECT source, t, u.k AS k, t * ([{plist}][u.k]) AS val"
        f"  FROM per, UNNEST(range(1, {k + 1})) AS u(k)),"
        " w AS (SELECT a.source, a.t, a.k,"
        "   coalesce(sum(b.t), 0) AS cum"
        "  FROM g a LEFT JOIN g b ON (b.val > a.val)"
        "   OR (b.val = a.val AND (b.source < a.source"
        "    OR (b.source = a.source AND b.k < a.k)))"
        "  GROUP BY 1, 2, 3),"
        f" c AS (SELECT source, t,"
        f"   CASE WHEN cum + t <= {b!r} THEN 1 ELSE 0 END AS fl,"
        f"   CASE WHEN cum + t > {b!r} AND cum < {b!r}"
        f"    THEN ({b!r} - cum) / t ELSE 0.0 END AS fr FROM w),"
        " s AS (SELECT source, t, CAST(sum(fl) AS BIGINT) AS m, max(fr) AS f"
        "  FROM c GROUP BY 1, 2)"
        " SELECT source, t AS tokens_available, m AS epochs_full,"
        "  round(f + 1e-9, 6) AS epoch_fraction,"
        "  round(t * (m + f) + 1e-9, 6) AS tokens_allocated,"
        f"  round(t * (([{glist}][m + 1]) + f * ([{plist}][m + 1]))"
        "   + 1e-9, 6) AS effective_tokens"
        " FROM s"
    )


def _synth_sentence_docs(spark: SparkSession, sf: str) -> DataFrame:
    """The reconstructed multi-line corpus (xs14's _chunk_lines
    convention, markers=True — the deterministic terminal '.' on
    (doc_id + i) % 3 != 0 lines is what gives this corpus sentence
    structure), joined with ' ' so sentence splits run on one string."""
    from presto_workload_analyzer_spark.driver_queries import _chunk_lines, _toked
    from presto_workload_analyzer_spark.sources import read_table

    docs = read_table(spark, f"{sf}/documents.parquet")
    return _toked(docs, "doc_id", "source").select(
        "doc_id",
        "source",
        F.array_join(_chunk_lines(markers=True), " ").alias("text"),
    )


def _synth_sentence_sql() -> str:
    from presto_workload_analyzer_spark.driver_queries import _chunk_lines_sql

    return (
        _chunk_lines_sql(markers=True)
        + ", synth AS (SELECT ln.doc_id, d.source,"
        "   array_to_string(ln.lines, ' ') AS text"
        "  FROM ln JOIN documents d ON d.doc_id = ln.doc_id)"
    )


def _readability_perdoc_sql() -> str:
    """The oracle twin of textstats.readability_stats over `synth`,
    ending at perdoc(doc_id, source, ns, nw, nsyl, gr) — gr the RAW
    double from the one fixed expression (identical operands on both
    engines)."""
    return (
        _synth_sentence_sql()
        + ", rd AS (SELECT doc_id, source,"
        "   greatest(len(list_filter(string_split_regex(text, '[.!?]+'),"
        "    x -> trim(x) <> '')), 1) AS ns,"
        "   list_transform(list_filter(string_split_regex(trim(lower(text)),"
        "    '\\s+'), w -> w <> ''),"
        "    w -> greatest(len(regexp_extract_all(w, '[aeiouy]+')), 1)) AS syl"
        "  FROM synth),"
        " perdoc AS (SELECT doc_id, source, ns,"
        "   len(syl) AS nw, CAST(list_sum(syl) AS BIGINT) AS nsyl,"
        "   0.39 * (len(syl) / ns) + 11.8 * (CAST(list_sum(syl) AS BIGINT)"
        "    / len(syl)) - 15.59 AS gr"
        "  FROM rd WHERE len(syl) > 0)"
    )


def xs42_readability(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source readability report over the reconstructed multi-line
    corpus — the curriculum-difficulty signal (Flesch 1948 / Kincaid et
    al. 1975 formula family; textstats.readability_stats has the
    engine-twinned component definitions). Per-source values POOL the
    exact integer sums (one division each — no order-dependent float
    summation anywhere); p_easy counts docs whose per-doc grade (one
    fixed expression over exact ints — identical doubles on both
    engines) clears the corpus-calibrated threshold.

    100 TB: readability is scan-speed Column math; the rollup is one
    source-grain aggregate of integer partials."""
    from presto_workload_analyzer_spark.extensions import textstats

    synth = _synth_sentence_docs(spark, sf)
    r = textstats.readability_stats(synth, "doc_id", "text").join(
        synth.select(F.col("doc_id").alias("id"), "source"), "id"
    )
    w, s, y = F.sum("n_words"), F.sum("n_sentences"), F.sum("n_syllables")
    pooled = 0.39 * (w / s) + 11.8 * (y / w) - 15.59
    return r.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        s.cast("long").alias("total_sentences"),
        w.cast("long").alias("total_words"),
        y.cast("long").alias("total_syllables"),
        F.round(w / s + F.lit(1e-9), 6).alias("words_per_sentence"),
        F.round(y / w + F.lit(1e-9), 6).alias("syllables_per_word"),
        F.round(pooled + F.lit(1e-9), 6).alias("fk_grade"),
        F.round(
            F.avg((F.col("fk_grade") <= _XS42_EASY).cast("double"))
            + F.lit(1e-9),
            6,
        ).alias("p_easy"),
    )


def xs42_sql() -> str:
    tau = _XS42_EASY
    return (
        _readability_perdoc_sql()
        + " SELECT source, CAST(count(*) AS BIGINT) AS n_docs,"
        "  CAST(sum(ns) AS BIGINT) AS total_sentences,"
        "  CAST(sum(nw) AS BIGINT) AS total_words,"
        "  CAST(sum(nsyl) AS BIGINT) AS total_syllables,"
        "  round(sum(nw) / (1.0 * sum(ns)) + 1e-9, 6) AS words_per_sentence,"
        "  round(sum(nsyl) / (1.0 * sum(nw)) + 1e-9, 6) AS syllables_per_word,"
        "  round(0.39 * (sum(nw) / (1.0 * sum(ns)))"
        "   + 11.8 * (sum(nsyl) / (1.0 * sum(nw))) - 15.59 + 1e-9, 6)"
        "   AS fk_grade,"
        f"  round(avg(CASE WHEN gr <= {tau!r} THEN 1.0 ELSE 0.0 END)"
        "   + 1e-9, 6) AS p_easy"
        " FROM perdoc GROUP BY 1"
    )


def xs43_curriculum_order(spark: SparkSession, sf: str) -> DataFrame:
    """Easy-first curriculum SCHEDULE (curriculum learning's data-order
    emission — Bengio et al. 2009 ordering, built from the cheap
    readability difficulty): per-doc grade -> difficulty decile (sketch
    boundaries broadcast back, xs30's approx_percentile shape) ->
    global training position = decile-ascending with a deterministic
    md5 shuffle inside each decile.

    100 TB: the rank inside a decile runs TWO-LEVEL
    (sampling._hierarchical_row_number — local rank per md5-prefix
    shard, bounded offset table) and decile offsets come from a
    9-cell broadcast triangular join, so there is NO unpartitioned and
    NO low-cardinality-over-raw-rows window anywhere in the plan."""
    from presto_workload_analyzer_spark.extensions import textstats
    from presto_workload_analyzer_spark.extensions.sampling import (
        _hierarchical_row_number,
    )

    synth = _synth_sentence_docs(spark, sf)
    # (doc_id, grade) — two columns per doc, a sliver of the corpus it
    # summarizes. The rank/bounds/counts machinery below references this
    # frame 4+ times; localCheckpoint materializes the expensive
    # readability scan ONCE (the dedup/graph iteration convention) so
    # the schedule costs one corpus pass, not one per plan reference.
    lg = (
        textstats.readability_stats(synth, "doc_id", "text")
        .select(
            F.col("id").alias("doc_id"),
            F.round(F.col("fk_grade") + F.lit(1e-9), 6).alias("__g"),
        )
        .localCheckpoint(eager=True)
    )
    accuracy = min(max(1_000_000, 10 * lg.count()), 10_000_000)
    pcts = ", ".join(f"{p}D" for p in _XS43_DECILES)
    bounds = lg.select(
        F.expr(f"approx_percentile(__g, array({pcts}), {accuracy})").alias("qb")
    )
    decile = F.lit(1)
    for i in range(len(_XS43_DECILES)):
        decile = decile + (F.col("__g") > F.col("qb")[i]).cast("int")
    bu = (
        lg.join(F.broadcast(bounds))
        .withColumn("__dec", decile.cast("long"))
        .withColumn("__h", F.md5(F.col("doc_id").cast("string")))
    )
    ranked = _hierarchical_row_number(
        bu,
        ["__dec"],
        [F.col("__h"), F.col("doc_id")],
        F.conv(F.substring("__h", 1, 2), 16, 10).cast("long"),
        "__rk",
    )
    cnt = ranked.groupBy("__dec").agg(F.count(F.lit(1)).alias("__n"))
    a, b = cnt.alias("a"), cnt.alias("b")
    offs = (
        a.join(F.broadcast(b), F.col("b.__dec") < F.col("a.__dec"), "left")
        .groupBy(F.col("a.__dec").alias("__dec"))
        .agg(F.coalesce(F.sum("b.__n"), F.lit(0)).alias("__off"))
    )
    return (
        ranked.join(F.broadcast(offs), "__dec")
        .select(
            "doc_id",
            F.col("__dec").alias("decile"),
            (F.col("__off") + F.col("__rk")).cast("long").alias("position"),
        )
    )


def xs43_sql() -> str:
    pcts = ", ".join(repr(p) for p in _XS43_DECILES)
    bucket = " + ".join(
        f"CAST(g > qb[{i + 1}] AS INT)" for i in range(len(_XS43_DECILES))
    )
    return (
        _readability_perdoc_sql()
        + ", lg AS (SELECT doc_id, round(gr + 1e-9, 6) AS g FROM perdoc),"
        f" bnd AS (SELECT quantile_disc(g, [{pcts}]) AS qb FROM lg),"
        f" bu AS (SELECT doc_id, 1 + {bucket} AS dec FROM lg, bnd)"
        " SELECT doc_id, CAST(dec AS BIGINT) AS decile,"
        "  CAST(row_number() OVER (ORDER BY dec,"
        "   md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS position"
        " FROM bu"
    )


def s24_stream_context_budget(spark: SparkSession, sf: str) -> DataFrame:
    """xs40's STREAMING seam — the ingest-side context-budget monitor:
    documents arrive continuously, a stateless per-doc token count
    explodes over the candidate lengths and feeds a stateful per-L
    aggregation (truncated docs, kept/lost token mass — state grain =
    |L| cells, never corpus rows). Complete-mode memory drain in the
    gate; the production sink is the foreachBatch upsert path. Oracle:
    xs40's own SQL — after a full drain the cells equal the batch
    table exactly."""
    import uuid

    from presto_workload_analyzer_spark.extensions import textstats
    from presto_workload_analyzer_spark.streaming import (
        run_to_memory,
        state_partitions,
        stream_sf_table,
    )

    sizes = F.array(*[F.lit(v) for v in _XS40_LENS])
    nt = (
        stream_sf_table(spark, sf, "documents")
        .filter(F.col("text").isNotNull())
        .select(textstats.token_count("text").cast("long").alias("__n"))
        .select("__n", F.explode(sizes).alias("seq_len"))
    )
    agg = (
        nt.groupBy("seq_len")
        .agg(
            F.sum((F.col("__n") > F.col("seq_len")).cast("long"))
            .cast("long")
            .alias("n_docs_truncated"),
            F.sum(F.least(F.col("__n"), F.col("seq_len")))
            .cast("long")
            .alias("tokens_kept"),
            F.sum(F.greatest(F.col("__n") - F.col("seq_len"), F.lit(0)))
            .cast("long")
            .alias("tokens_lost"),
        )
        .select(
            F.col("seq_len").cast("long").alias("seq_len"),
            "n_docs_truncated",
            "tokens_kept",
            "tokens_lost",
            F.round(
                F.col("tokens_lost")
                / (F.col("tokens_kept") + F.col("tokens_lost"))
                + F.lit(1e-9),
                6,
            ).alias("loss_share"),
        )
    )
    name = f"s24_mem_{uuid.uuid4().hex[:8]}"
    with state_partitions(spark, 8):
        q = run_to_memory(agg, name, output_mode="complete")
        q.awaitTermination(300)
    tbl = spark.table(name)
    return spark.createDataFrame(tbl.collect(), tbl.schema)


STAGED_TIER5: dict[str, tuple] = {
    "xs40_context_budget": (xs40_context_budget, xs40_sql()),
    "xs41_repeat_epochs": (xs41_repeat_epochs, xs41_sql()),
    "xs42_readability": (xs42_readability, xs42_sql()),
    "xs43_curriculum_order": (xs43_curriculum_order, xs43_sql()),
    "s24_stream_context_budget": (s24_stream_context_budget, xs40_sql()),
}


# ---------------------------------------------------------------------------
# TIER-6 staging (the round-18 pipeline; staged in round 14 behind
# TIER5, keeping every round's registration <= 8). Four entries, four
# families the registry does not yet cover:
#
#   * xs44_distinct_ngrams   — distinct-n DIVERSITY ratios per source
#                              (n = 1/2/3): distinct n-grams / total
#                              n-grams, the Texygen/self-BLEU-adjacent
#                              repetitiveness audit (Li et al. 2016
#                              "distinct-1/2") synthetic-data pipelines
#                              report; the WITHIN-source companion of
#                              x82's first-seen novelty.
#   * xs45_stratified_split  — EXACT largest-remainder stratified
#                              eval split: per-source val quotas =
#                              floor(frac*n) + largest-remainder
#                              top-up to the exact global target, val
#                              picks = per-source smallest-md5 docs
#                              (consistent hashing) — the exact-count
#                              upgrade of x16's proportional-in-
#                              expectation hash split.
#   * xs46_dup_leakage_matrix — source x source near-duplicate LEAKAGE
#                              matrix over the shared minhash-CC
#                              silver: for each ordered pair (a, b),
#                              clusters shared and docs of a exposed —
#                              the cross-SOURCE companion of x66's
#                              corpus x benchmark contamination matrix.
#   * xs47_term_burstiness   — per-term burstiness (variance-to-mean
#                              ratio of per-doc counts, zeros included;
#                              Church & Gale 1995's deviation-from-
#                              Poisson signal) from EXACT integer
#                              moments — the term-level corpus-health
#                              audit beside x55's Zipf slope.
#
# Calibration (corpus-measured): unigram distinct-ratio ~0.02 at the
# 31-word vocabulary (n=2/3 discriminate more); VMR at df >= 50 spreads
# 1.20-1.57 (everything bursty — template generator — but genuinely
# varied); frac=0.15 over ~25-doc sources makes the largest-remainder
# top-up real (floor sums undershoot the global target).
# ---------------------------------------------------------------------------

_XS44_NS = (1, 2, 3)
_XS45_FRAC = 0.15
_XS47_MIN_DF = 50


def xs44_distinct_ngrams(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct-n diversity ratios per source (Li et al. 2016's
    distinct-1/2 convention, extended to n=3): total n-gram incidences,
    distinct n-grams, and their ratio — the repetitiveness audit
    generated/synthetic corpora are screened with (a template-heavy
    source shows a LOW ratio at n >= 2). Token stream: lowercased
    whitespace split of the trimmed text, grams via dedup.gram_array
    over the lowercased text (no empty-drop on either side — the split
    artifact only arises on whitespace-only docs, identically on both
    engines).

    100 TB: gram-grain groupBys (map-side combinable); distinct counts
    shuffle (source, n, gram) — vocabulary-grain per n, never doc-grain
    state. |n| = 3 fixed frames union at the plan level."""
    from presto_workload_analyzer_spark.extensions import dedup
    from presto_workload_analyzer_spark.sources import read_table

    docs = read_table(spark, f"{sf}/documents.parquet")
    frames = []
    for n in _XS44_NS:
        g = docs.select(
            "source",
            F.explode(dedup.gram_array(F.lower(F.col("text")), n)).alias(
                "__g"
            ),
        )
        frames.append(
            g.groupBy("source").agg(
                F.lit(n).cast("long").alias("n"),
                F.count(F.lit(1)).cast("long").alias("total_ngrams"),
                F.countDistinct("__g").cast("long").alias("distinct_ngrams"),
            )
        )
    out = frames[0]
    for f_ in frames[1:]:
        out = out.unionByName(f_)
    return out.select(
        "source",
        "n",
        "total_ngrams",
        "distinct_ngrams",
        F.round(
            F.col("distinct_ngrams") / F.col("total_ngrams") + F.lit(1e-9), 6
        ).alias("distinct_ratio"),
    )


def xs44_sql() -> str:
    ns = ", ".join(str(n) for n in _XS44_NS)
    return (
        "WITH t AS (SELECT source,"
        "   string_split_regex(trim(lower(text)), '\\s+') AS toks"
        "  FROM documents),"
        f" g AS (SELECT source, nn.n AS n,"
        "   array_to_string(toks[ii.i+1:ii.i+nn.n], ' ') AS gram"
        f"  FROM t, UNNEST([{ns}]) AS nn(n),"
        "   UNNEST(range(0, greatest(len(toks) - nn.n + 1, 0))) AS ii(i))"
        " SELECT source, CAST(n AS BIGINT) AS n,"
        "  CAST(count(*) AS BIGINT) AS total_ngrams,"
        "  CAST(count(DISTINCT gram) AS BIGINT) AS distinct_ngrams,"
        "  round(count(DISTINCT gram) / (1.0 * count(*)) + 1e-9, 6)"
        "   AS distinct_ratio"
        " FROM g GROUP BY 1, 2"
    )


def xs45_stratified_split(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT stratified eval split by largest remainder (the Hare quota /
    Hamilton apportionment convention): the validation set holds EXACTLY
    round(frac * N) docs globally, each source contributing
    floor(frac * n_s) plus one top-up doc for the largest fractional
    remainders (ties: source ASC) until the global target is met. Val
    picks inside a source = the smallest-md5 docs (consistent hashing,
    x16's portability convention) — so membership is stable under
    corpus growth elsewhere. The exact-count upgrade of x16's
    proportional-in-expectation split; output one row per doc:
    (doc_id, source, split).

    100 TB: per-source ranks run TWO-LEVEL (_hierarchical_row_number,
    md5-prefix shards — no low-cardinality window over raw rows); the
    quota arithmetic lives on the #sources-grain table (broadcast
    triangular join for the remainder rank, 1-row totals cross join)."""
    from presto_workload_analyzer_spark.extensions.sampling import (
        _hierarchical_row_number,
    )
    from presto_workload_analyzer_spark.sources import read_table

    frac = _XS45_FRAC
    docs = read_table(spark, f"{sf}/documents.parquet").select(
        "doc_id", "source"
    )
    per = docs.groupBy("source").agg(F.count(F.lit(1)).alias("__n"))
    tot = per.agg(
        F.sum("__n").alias("__ntot"),
        F.sum(F.floor(F.lit(frac) * F.col("__n"))).alias("__base_sum"),
    )
    quota = per.select(
        "source",
        "__n",
        F.floor(F.lit(frac) * F.col("__n")).alias("__base"),
        (F.lit(frac) * F.col("__n") - F.floor(F.lit(frac) * F.col("__n"))).alias(
            "__rem"
        ),
    )
    rhs = F.broadcast(
        quota.select(
            F.col("source").alias("__src2"),
            F.col("__rem").alias("__rem2"),
        )
    )
    before = (F.col("__rem2") > F.col("__rem")) | (
        (F.col("__rem2") == F.col("__rem")) & (F.col("__src2") < F.col("source"))
    )
    ranked = (
        quota.join(rhs, before, "left")
        .groupBy("source", "__n", "__base", "__rem")
        .agg((F.coalesce(F.count("__src2"), F.lit(0)) + 1).alias("__rrank"))
    )
    caps = ranked.crossJoin(F.broadcast(tot)).select(
        "source",
        (
            F.col("__base")
            + (
                F.col("__rrank")
                <= F.floor(F.lit(frac) * F.col("__ntot") + F.lit(0.5))
                - F.col("__base_sum")
            ).cast("long")
        ).alias("__cap"),
    )
    h = F.md5(F.col("doc_id").cast("string"))
    rows = docs.withColumn("__h", h)
    rk = _hierarchical_row_number(
        rows,
        ["source"],
        [F.col("__h"), F.col("doc_id")],
        F.conv(F.substring("__h", 1, 2), 16, 10).cast("long"),
        "__rk",
    )
    return rk.join(F.broadcast(caps), "source").select(
        "doc_id",
        "source",
        F.when(F.col("__rk") <= F.col("__cap"), F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def xs45_sql() -> str:
    frac = _XS45_FRAC
    return (
        "WITH d AS (SELECT doc_id, source FROM documents),"
        " per AS (SELECT source, count(*) AS n FROM d GROUP BY 1),"
        " tot AS (SELECT sum(n) AS N,"
        f"   sum(floor({frac!r} * n)) AS base_sum FROM per),"
        f" q AS (SELECT source, n, floor({frac!r} * n) AS base,"
        f"   {frac!r} * n - floor({frac!r} * n) AS rem FROM per),"
        " r AS (SELECT a.source, a.base,"
        "   1 + count(b.source) AS rrank"
        "  FROM q a LEFT JOIN q b ON (b.rem > a.rem)"
        "   OR (b.rem = a.rem AND b.source < a.source)"
        "  GROUP BY 1, 2),"
        " caps AS (SELECT r.source,"
        f"   base + CASE WHEN rrank <= floor({frac!r} * N + 0.5) - base_sum"
        "    THEN 1 ELSE 0 END AS cap"
        "  FROM r, tot),"
        " rk AS (SELECT doc_id, source,"
        "   row_number() OVER (PARTITION BY source"
        "    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk FROM d)"
        " SELECT rk.doc_id, rk.source,"
        "  CASE WHEN rk.rk <= caps.cap THEN 'val' ELSE 'train' END AS split"
        " FROM rk JOIN caps ON caps.source = rk.source"
    )


def xs46_dup_leakage_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """Source x source near-duplicate LEAKAGE matrix over the shared
    minhash-CC silver: for each ordered source pair (a, b), how many
    dup clusters the two sources share and how many of a's docs sit in
    such a cluster — the cross-source companion of x66's corpus x
    benchmark contamination matrix (train/eval SPLITS leak through
    exactly this structure when splits follow sources).

    100 TB: membership is (cluster, doc, source) at dup-doc grain (only
    clustered docs — a sliver of the corpus); the pair join runs on the
    DISTINCT (cluster, source) frame, bounded per cluster by the source
    enum, never |cluster|^2 docs."""
    from presto_workload_analyzer_spark.driver_queries import (
        shared_dedup_clusters,
    )
    from presto_workload_analyzer_spark.sources import read_table

    docs = read_table(spark, f"{sf}/documents.parquet").select(
        F.col("doc_id").alias("id"), "source"
    )
    mem = shared_dedup_clusters(spark, sf).join(docs, "id")
    cs = mem.select("cluster_id", "source").distinct()
    other = cs.select(
        F.col("cluster_id"), F.col("source").alias("source_b")
    )
    return (
        mem.join(other, "cluster_id")
        .filter(F.col("source") != F.col("source_b"))
        .groupBy(F.col("source").alias("source_a"), "source_b")
        .agg(
            F.countDistinct("cluster_id").cast("long").alias(
                "n_shared_clusters"
            ),
            F.countDistinct("id").cast("long").alias("n_docs_exposed"),
        )
    )


def xs46_sql() -> str:
    from presto_workload_analyzer_spark.driver_queries import (
        _X02_BANDS,
        _X14_CC_SQL,
    )

    return (
        _X14_CC_SQL.format(bands=_X02_BANDS)
        + ", mem AS (SELECT cc.cluster_id, cc.id, d.source"
        "  FROM cc JOIN documents d ON d.doc_id = cc.id),"
        " cs AS (SELECT DISTINCT cluster_id, source FROM mem)"
        " SELECT mem.source AS source_a, cs.source AS source_b,"
        "  CAST(count(DISTINCT mem.cluster_id) AS BIGINT)"
        "   AS n_shared_clusters,"
        "  CAST(count(DISTINCT mem.id) AS BIGINT) AS n_docs_exposed"
        " FROM mem JOIN cs ON cs.cluster_id = mem.cluster_id"
        "  AND cs.source <> mem.source"
        " GROUP BY 1, 2"
    )


def xs47_term_burstiness(spark: SparkSession, sf: str) -> DataFrame:
    """Per-term burstiness: the variance-to-mean ratio of per-document
    counts, zeros included (Church & Gale 1995's deviation-from-Poisson
    — VMR 1 = Poisson scatter, >> 1 = the term clumps into few docs) for
    every term with document frequency >= the calibrated floor. Both
    engines compute VMR from the SAME exact integer moments
    (N * sum(c^2) - T^2) / (N * T) in one fixed expression — no float
    accumulation on the hash path. Token stream: the engine's standard
    (lowercased, empty-dropped).

    100 TB: (word, doc) counts are one map-side-combinable shuffle; the
    moment rollup is vocabulary-grain; N broadcasts as one scalar."""
    from presto_workload_analyzer_spark.extensions.textstats import tokens
    from presto_workload_analyzer_spark.sources import read_table

    docs = read_table(spark, f"{sf}/documents.parquet")
    toks = (
        docs.filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.explode(F.transform(tokens("text"), lambda t: F.lower(t))).alias(
                "w"
            ),
        )
        .filter(F.col("w") != "")
    )
    pc = toks.groupBy("w", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    st = pc.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("__c").cast("long").alias("total_count"),
        F.sum(F.col("__c") * F.col("__c")).cast("long").alias("__s2"),
    )
    nd = docs.agg(F.count(F.lit(1)).cast("long").alias("__nd"))
    vmr = (
        F.col("__nd") * F.col("__s2") - F.col("total_count") * F.col("total_count")
    ) / (F.col("__nd") * F.col("total_count"))
    return (
        st.filter(F.col("df") >= _XS47_MIN_DF)
        .crossJoin(F.broadcast(nd))
        .select(
            F.col("w").alias("word"),
            "df",
            "total_count",
            F.round(vmr + F.lit(1e-9), 6).alias("vmr"),
        )
    )


def xs47_sql() -> str:
    return (
        "WITH u AS (SELECT doc_id, w FROM ("
        "   SELECT doc_id, unnest(list_transform("
        "    string_split_regex(trim(text), '\\s+'), t -> lower(t))) AS w"
        "   FROM documents WHERE text IS NOT NULL) q0 WHERE w <> ''),"
        " pc AS (SELECT w, doc_id, CAST(count(*) AS BIGINT) AS c"
        "  FROM u GROUP BY 1, 2),"
        " st AS (SELECT w, CAST(count(*) AS BIGINT) AS df,"
        "   CAST(sum(c) AS BIGINT) AS t, CAST(sum(c * c) AS BIGINT) AS s2"
        "  FROM pc GROUP BY 1),"
        " nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)"
        " SELECT w AS word, df, t AS total_count,"
        "  round((n * s2 - t * t) / (1.0 * n * t) + 1e-9, 6) AS vmr"
        f" FROM st, nd WHERE df >= {_XS47_MIN_DF}"
    )


STAGED_TIER6: dict[str, tuple] = {
    "xs44_distinct_ngrams": (xs44_distinct_ngrams, xs44_sql()),
    "xs45_stratified_split": (xs45_stratified_split, xs45_sql()),
    "xs46_dup_leakage_matrix": (xs46_dup_leakage_matrix, xs46_sql()),
    "xs47_term_burstiness": (xs47_term_burstiness, xs47_sql()),
}


# ---------------------------------------------------------------------------
# TIER-7 staging (the round-19 pipeline; staged in round 14 behind
# TIER6). Two batch entries + one streaming seam, closing out the
# corpus-statistics families:
#
#   * xs48_pmi_collocations — adjacent-bigram pointwise mutual
#                             information (Church & Hanks 1990's
#                             association measure): the collocation
#                             mining table (which word pairs co-occur
#                             far above chance) beside xs47's
#                             burstiness and x55's Zipf slope.
#   * xs49_backoff_rate     — n-gram LM BACKOFF pressure: the share of
#                             held-out trigram incidences unseen in the
#                             train slice (the rate a trigram LM falls
#                             back to lower orders — the KenLM/CCNet
#                             hygiene stat), per source. Held-out slice
#                             = md5 hash split (doc_id % k correlates
#                             with `source` on this corpus — measured:
#                             %5 leaves only 4 sources held out).
#   * s25_stream_burstiness — xs47's streaming seam: per-doc word
#                             counts computed ROW-LOCALLY (in-row
#                             distinct+fold — no (word, doc)-grain
#                             state), feeding a stateful
#                             vocabulary-grain sufficient-statistics
#                             aggregation (df, total, sum of squares —
#                             mergeable; VMR = a read-time division
#                             needing the separate doc-count scalar).
#
# Calibration (corpus-measured): 916 bigram types, PMI spread -0.7 to
# +4.9, ~870 pairs at count >= 20; trigram backoff over the md5 slice
# covers 19/20 sources with rates 0.21-0.53.
# ---------------------------------------------------------------------------

_XS48_MIN = 20
_XS49_K = 3
# held-out docs: first md5 hex digit in 0-2 (~19% of docs, source-independent)
_XS49_HO = ("0", "1", "2")


def xs48_pmi_collocations(spark: SparkSession, sf: str) -> DataFrame:
    """Adjacent-bigram PMI (Church & Hanks 1990): ln(p(a,b) / (p(a)p(b)))
    with p from the corpus bigram/unigram incidence totals — the
    collocation-mining table (template phrases and fixed expressions
    surface as high-PMI pairs; anti-collocations go negative). Both
    engines compute the SAME sum-of-logs expression
    ln(n_pair) + 2*ln(T_uni) - ln(T_bi) - ln(n_w1) - ln(n_w2) over exact
    integer counts (the product form would overflow BIGINT at corpus
    scale), so the doubles are identical. Emitted at pair count >= 20.

    100 TB: unigram and bigram count tables are vocabulary-grain
    (map-side combinable); totals broadcast as 1-row frames; the PMI
    join is vocab-grain x 2 lookups."""
    from presto_workload_analyzer_spark.extensions.textstats import tokens
    from presto_workload_analyzer_spark.sources import read_table

    docs = read_table(spark, f"{sf}/documents.parquet")
    t = docs.filter(F.col("text").isNotNull()).select(
        F.filter(
            F.transform(tokens("text"), lambda x: F.lower(x)),
            lambda w: w != "",
        ).alias("__toks")
    )
    uni = (
        t.select(F.explode("__toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    tu = uni.agg(F.sum("c").alias("__tu"))
    # slice length clamped at 0: a doc whose text tokenizes to zero
    # non-empty tokens would otherwise pass length -1 and throw
    # (INVALID_PARAMETER_VALUE.LENGTH); the oracle's
    # range(0, greatest(len-1, 0)) yields zero rows for the same doc
    n_bi = F.greatest(F.size("__toks") - 1, F.lit(0))
    bi = (
        t.select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("__toks"), 1, n_bi),
                    F.slice(F.col("__toks"), 2, n_bi),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
    )
    tb = bi.agg(F.sum("n_pair").alias("__tb"))
    j = (
        bi.filter(F.col("n_pair") >= _XS48_MIN)
        .join(uni.select(F.col("w").alias("w1"), F.col("c").alias("n_w1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("n_w2")), "w2")
        .crossJoin(F.broadcast(tu))
        .crossJoin(F.broadcast(tb))
    )
    pmi = (
        F.log("n_pair")
        + 2 * F.log("__tu")
        - F.log("__tb")
        - F.log("n_w1")
        - F.log("n_w2")
    )
    return j.select(
        "w1",
        "w2",
        "n_pair",
        "n_w1",
        "n_w2",
        F.round(pmi + F.lit(1e-9), 6).alias("pmi"),
    )


def xs48_sql() -> str:
    return (
        "WITH t AS (SELECT list_filter(list_transform("
        "   string_split_regex(trim(text), '\\s+'), x -> lower(x)),"
        "   w -> w <> '') AS toks"
        "  FROM documents WHERE text IS NOT NULL),"
        " uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM ("
        "   SELECT unnest(toks) AS w FROM t) q0 GROUP BY 1),"
        " tu AS (SELECT sum(c) AS T FROM uni),"
        " bc AS (SELECT toks[i+1] AS w1, toks[i+2] AS w2,"
        "   CAST(count(*) AS BIGINT) AS n_pair"
        "  FROM t, UNNEST(range(0, greatest(len(toks) - 1, 0))) AS ii(i)"
        "  GROUP BY 1, 2),"
        " tb AS (SELECT sum(n_pair) AS TB FROM bc)"
        " SELECT bc.w1, bc.w2, bc.n_pair,"
        "  a.c AS n_w1, b.c AS n_w2,"
        "  round(ln(n_pair) + 2 * ln(T) - ln(TB) - ln(a.c) - ln(b.c)"
        "   + 1e-9, 6) AS pmi"
        " FROM bc JOIN uni a ON a.w = bc.w1 JOIN uni b ON b.w = bc.w2,"
        "  tu, tb"
        f" WHERE bc.n_pair >= {_XS48_MIN}"
    )


def xs49_backoff_rate(spark: SparkSession, sf: str) -> DataFrame:
    """n-gram LM backoff pressure per source: the share of held-out
    TRIGRAM incidences whose trigram never occurs in the train slice —
    how often a trigram model falls back to lower orders on this
    source's text (the KenLM-family hygiene stat; CCNet's LM filtering
    inherits it). The held-out slice is an md5 HASH split (x16's
    portability convention) because doc_id % k slices correlate with
    `source` on this corpus (measured: %5 leaves only 4 held-out
    sources).

    100 TB: train trigram types are vocabulary-grain distinct; the
    membership check is one gram-grain left join; per-source rollup is
    integer sums until one division."""
    from presto_workload_analyzer_spark.extensions import dedup
    from presto_workload_analyzer_spark.sources import read_table

    k = _XS49_K
    docs = read_table(spark, f"{sf}/documents.parquet")
    base = docs.filter(F.col("text").isNotNull()).select(
        "source",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
        .isin(*_XS49_HO)
        .alias("__ho"),
        F.explode(dedup.gram_array(F.lower(F.col("text")), k)).alias("__g"),
    )
    train = base.filter(~F.col("__ho")).select("__g").distinct()
    held = base.filter(F.col("__ho"))
    j = held.join(
        train.withColumn("__seen", F.lit(1)), "__g", "left"
    )
    miss = F.sum((F.col("__seen").isNull()).cast("long"))
    return j.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        miss.cast("long").alias("n_unseen"),
        F.round(
            miss / F.count(F.lit(1)) + F.lit(1e-9), 6
        ).alias("backoff_rate"),
    )


def xs49_sql() -> str:
    k = _XS49_K
    ho = ", ".join(f"'{h}'" for h in _XS49_HO)
    return (
        "WITH t AS (SELECT source,"
        "   substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)"
        f"    IN ({ho}) AS ho,"
        "   string_split_regex(trim(lower(text)), '\\s+') AS toks"
        "  FROM documents WHERE text IS NOT NULL),"
        f" g AS (SELECT source, ho, array_to_string(toks[i+1:i+{k}], ' ')"
        "   AS gram"
        f"  FROM t, UNNEST(range(0, greatest(len(toks) - {k - 1}, 0)))"
        "   AS ii(i)),"
        " trn AS (SELECT DISTINCT gram FROM g WHERE NOT ho),"
        " j AS (SELECT g.source,"
        "   CASE WHEN trn.gram IS NULL THEN 1 ELSE 0 END AS miss"
        "  FROM g LEFT JOIN trn ON trn.gram = g.gram WHERE g.ho)"
        " SELECT source, CAST(count(*) AS BIGINT) AS n_grams,"
        "  CAST(sum(miss) AS BIGINT) AS n_unseen,"
        "  round(sum(miss) / (1.0 * count(*)) + 1e-9, 6) AS backoff_rate"
        " FROM j GROUP BY 1"
    )


def s25_stream_burstiness(spark: SparkSession, sf: str) -> DataFrame:
    """xs47's STREAMING seam — the term-statistics monitor at ingest:
    per-document word counts are computed ROW-LOCALLY (distinct + an
    in-row fold over the token array — NO (word, doc)-grain state,
    which would grow with the stream), feeding a stateful
    VOCABULARY-grain sufficient-statistics aggregation: df, total
    count, sum of squared per-doc counts — exactly the mergeable
    moments xs47's VMR divides (the division itself is read-time: it
    needs the separate doc-count scalar, so the monitor publishes the
    sufficient statistics, the established sketch-dashboard shape).
    Emitted at the xs47 df floor. Oracle: xs47's own moment chain.

    Row-local cost is one O(doc_len log doc_len) sorted-run pass
    (textstats.row_local_term_counts) — a 100k-token doc with a 20k
    in-doc vocabulary costs ~1.7M comparisons, not the ~2x10^9 the
    earlier array_distinct-x-rescan formulation paid."""
    import uuid

    from presto_workload_analyzer_spark.extensions.textstats import (
        row_local_term_counts,
        tokens,
    )
    from presto_workload_analyzer_spark.streaming import (
        run_to_memory,
        state_partitions,
        stream_sf_table,
    )

    toks = F.filter(
        F.transform(tokens("text"), lambda x: F.lower(x)), lambda w: w != ""
    )
    counts = row_local_term_counts(toks)
    rows = (
        stream_sf_table(spark, sf, "documents")
        .filter(F.col("text").isNotNull())
        .select(F.explode(counts).alias("p"))
        .select("p.w", "p.c")
    )
    agg = (
        rows.groupBy("w")
        .agg(
            F.count(F.lit(1)).cast("long").alias("df"),
            F.sum("c").cast("long").alias("total_count"),
            F.sum(F.col("c") * F.col("c")).cast("long").alias("sum_csq"),
        )
        .filter(F.col("df") >= _XS47_MIN_DF)
        .select(F.col("w").alias("word"), "df", "total_count", "sum_csq")
    )
    name = f"s25_mem_{uuid.uuid4().hex[:8]}"
    with state_partitions(spark, 8):
        q = run_to_memory(agg, name, output_mode="complete")
        q.awaitTermination(300)
    tbl = spark.table(name)
    return spark.createDataFrame(tbl.collect(), tbl.schema)


def s25_sql() -> str:
    return (
        "WITH u AS (SELECT doc_id, w FROM ("
        "   SELECT doc_id, unnest(list_transform("
        "    string_split_regex(trim(text), '\\s+'), t -> lower(t))) AS w"
        "   FROM documents WHERE text IS NOT NULL) q0 WHERE w <> ''),"
        " pc AS (SELECT w, doc_id, CAST(count(*) AS BIGINT) AS c"
        "  FROM u GROUP BY 1, 2)"
        " SELECT w AS word, CAST(count(*) AS BIGINT) AS df,"
        "  CAST(sum(c) AS BIGINT) AS total_count,"
        "  CAST(sum(c * c) AS BIGINT) AS sum_csq"
        f" FROM pc GROUP BY 1 HAVING count(*) >= {_XS47_MIN_DF}"
    )


STAGED_TIER7: dict[str, tuple] = {
    "xs48_pmi_collocations": (xs48_pmi_collocations, xs48_sql()),
    "xs49_backoff_rate": (xs49_backoff_rate, xs49_sql()),
    "s25_stream_burstiness": (s25_stream_burstiness, s25_sql()),
}
