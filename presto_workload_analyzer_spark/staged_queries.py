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
xs28-xs34 + s21 (round 14, 252 -> 260).

Staging tiers live here so each round's registration stays <= 8
(the driver window must cover gate + new + stale in one round):
`STAGED` (xs20-xs27) and `STAGED_NEXT` (xs28-xs34 + s21) registered in
rounds 13/14 and are now empty; `STAGED_TIER3` (xs35/xs36 + s22)
registers in round 15; `STAGED_TIER4` (xs37-xs39 + s23, the k-means
clustering surface) in round 16. All tiers gate identically in
tests/test_staged_queries.py.

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


# ---------------------------------------------------------------------------
# TIER-3 staging (the round-15 pipeline; registers after STAGED_NEXT so
# every round's registration stays <= 8). Three entries, three families
# the registry does not yet cover:
#
#   * xs35_contrastive_pairs — training-PAIR generation: positive pairs
#                              mined from the minhash-CC duplicate
#                              clusters (the SimCSE/E5-style "near-dup
#                              = positive, negatives in-batch" mining
#                              convention), deterministic ring pick.
#   * xs36_kneser_ney_filter — held-out scoring under interpolated
#                              KNESER-NEY (the KenLM/CCNet smoothing
#                              family) beside the Jelinek-Mercer score,
#                              per-doc, with the JM-minus-KN delta —
#                              which docs the two smoothings disagree on.
#   * s22_stream_source_kl   — the STREAMING seam of xs33: stateful
#                              (source, word)-grain counts at ingest
#                              (state bounded by vocab x sources, never
#                              corpus rows), KL readout over the drained
#                              state — the mixing-drift monitor running
#                              continuously.
# ---------------------------------------------------------------------------


def xs35_contrastive_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Contrastive POSITIVE-pair mining from the duplicate clusters —
    the training-data-generation step embedding-model pipelines publish
    (SimCSE/E5-style: near-duplicate documents form positive pairs;
    negatives come free in-batch at training time, so the mining op
    emits only (anchor, positive)). Every member of an x14 minhash-CC
    cluster pairs with the NEXT member in doc_id order, wrapping to the
    first (a deterministic ring: every member appears exactly once as
    anchor and once as positive, no member pairs with itself in
    clusters >= 2 — which CC guarantees, since membership requires an
    edge). Consumes the shared dedup-CC silver; windows partition by
    cluster (group grain)."""
    from presto_workload_analyzer_spark.driver_queries import (
        shared_dedup_clusters,
    )
    from pyspark.sql import Window

    cc = shared_dedup_clusters(spark, sf)
    w = Window.partitionBy("cluster_id").orderBy("id")
    return cc.select(
        F.col("id").alias("anchor_id"),
        F.coalesce(F.lead("id").over(w), F.first("id").over(w)).alias(
            "positive_id"
        ),
        "cluster_id",
        F.count(F.lit(1))
        .over(Window.partitionBy("cluster_id"))
        .cast("long")
        .alias("cluster_size"),
    )


def xs35_sql() -> str:
    from presto_workload_analyzer_spark.driver_queries import (
        _X02_BANDS,
        _X14_CC_SQL,
    )

    return (
        _X14_CC_SQL.format(bands=_X02_BANDS)
        + " SELECT id AS anchor_id,"
        "  coalesce(lead(id) OVER (PARTITION BY cluster_id ORDER BY id),"
        "   first_value(id) OVER (PARTITION BY cluster_id ORDER BY id))"
        "   AS positive_id,"
        " cluster_id,"
        "  CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT)"
        "   AS cluster_size"
        " FROM cc"
    )


_XS36_D = 0.75


def xs36_kneser_ney_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Held-out per-doc perplexity under interpolated KNESER-NEY beside
    the Jelinek-Mercer score (xs7/xs12's LM), same slices, same token
    stream — the smoothing-family upgrade the published perplexity
    filters actually ship (CCNet's KenLM is modified-KN), emitted as a
    per-doc comparison so the gate hashes which documents the two
    smoothings DISAGREE on (jm_minus_kn_nll > 0 = KN considers the doc
    more natural than JM does). Both scores share one oracle CTE chain
    (the _xs7_perdoc_sql token stream), so a drift in either smoothing
    — or in the shared tokenization — is a hash mismatch."""
    from presto_workload_analyzer_spark.driver_queries import _XS7_LAM
    from presto_workload_analyzer_spark.extensions import textstats
    from presto_workload_analyzer_spark.sources import read_table

    docs = read_table(spark, f"{sf}/documents.parquet")
    ho = F.col("doc_id") % 5 == 0
    # the FUSED scorer: one held-bigram stream, one join tree, both
    # smoothings (equality to the standalone scorers pinned by
    # test_fused_lm_scorer_equals_standalones)
    both = textstats.heldout_jm_kn_nll(
        docs, "doc_id", "text", holdout=ho, lam=_XS7_LAM, discount=_XS36_D
    )
    j = both.select(
        F.col("id").alias("doc_id"),
        F.col("n_scored").alias("n_tokens"),
        (F.col("sum_nll_jm") / F.col("n_scored")).alias("__jm"),
        (F.col("sum_nll_kn") / F.col("n_scored")).alias("__kn"),
    )
    return j.select(
        "doc_id",
        "n_tokens",
        F.round(F.exp(F.col("__kn")) + F.lit(1e-9), 6).alias("kn_ppl"),
        F.round(F.exp(F.col("__jm")) + F.lit(1e-9), 6).alias("jm_ppl"),
        F.round(F.col("__jm") - F.col("__kn") + F.lit(1e-9), 6).alias(
            "jm_minus_kn_nll"
        ),
    )


def xs36_sql() -> str:
    from presto_workload_analyzer_spark.driver_queries import _xs7_perdoc_sql

    d = _XS36_D
    p_cont = "((coalesce(rgt.n1r, 0.0) + 1.0) / (t + v + 1.0))"
    return (
        _xs7_perdoc_sql()
        + ", lft AS (SELECT w_prev, CAST(sum(c2) AS DOUBLE) AS cl,"
        "   CAST(count(*) AS DOUBLE) AS n1l FROM bi GROUP BY 1),"
        " rgt AS (SELECT w, CAST(count(*) AS DOUBLE) AS n1r"
        "  FROM bi GROUP BY 1),"
        " kt AS (SELECT CAST(sum(n1r) AS DOUBLE) AS t FROM rgt),"
        " ksb AS (SELECT id, -ln(CASE WHEN coalesce(lft.cl, 0.0) > 0 THEN"
        f"   greatest(coalesce(b.c2, 0) - {d!r}, 0.0) / lft.cl"
        f"   + ({d!r} * lft.n1l / lft.cl) * {p_cont}"
        f"  ELSE {p_cont} END) AS nll"
        "  FROM bh LEFT JOIN bi b USING (w_prev, w)"
        "   LEFT JOIN lft USING (w_prev)"
        "   LEFT JOIN rgt ON rgt.w = bh.w, kt, scal),"
        " kfst AS (SELECT id,"
        f"  -ln((coalesce(n1r, 0.0) + 1.0) / (t + v + 1.0)) AS nll"
        "  FROM (SELECT id, toks[1] AS w FROM hd"
        "    WHERE len(toks) >= 1 AND toks[1] <> '') f"
        "   LEFT JOIN rgt USING (w), kt, scal),"
        " knper AS (SELECT id, count(*) AS ns, sum(nll) AS snll"
        "  FROM (SELECT * FROM ksb UNION ALL SELECT * FROM kfst) a"
        "  GROUP BY 1)"
        " SELECT p.id AS doc_id, CAST(p.ns AS BIGINT) AS n_tokens,"
        "  round(exp(k.snll / k.ns) + 1e-9, 6) AS kn_ppl,"
        "  round(exp(p.snll / p.ns) + 1e-9, 6) AS jm_ppl,"
        "  round(p.snll / p.ns - k.snll / k.ns + 1e-9, 6) AS jm_minus_kn_nll"
        " FROM perdoc p JOIN knper k ON k.id = p.id"
    )


def s22_stream_source_kl(spark: SparkSession, sf: str) -> DataFrame:
    """The STREAMING seam of xs33's domain-drift monitor: documents
    arrive continuously, a stateful (source, word)-grain count runs at
    ingest (state bounded by vocabulary x sources — never corpus rows),
    and the KL readout computes over the DRAINED state: per-source
    KL(source ‖ corpus) where the corpus distribution is the sum of the
    state itself — so after a full drain the readout equals xs33's batch
    answer exactly, which is what the oracle hashes. This is the one
    streaming shape no other s-query exercises: a stateful aggregation
    whose CONSUMER is a batch computation over the drained state table
    (the production deployment reads the state store per trigger via
    foreachBatch and publishes the KL time-series). Token stream is
    xs33's verbatim (lowercased, empty-dropped)."""
    import uuid

    from presto_workload_analyzer_spark.extensions.textstats import tokens
    from presto_workload_analyzer_spark.streaming import (
        run_to_memory,
        state_partitions,
        stream_sf_table,
    )

    counts = (
        stream_sf_table(spark, sf, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "source",
            F.explode(F.transform(tokens("text"), lambda t: F.lower(t))).alias(
                "w"
            ),
        )
        .filter(F.col("w") != "")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("double").alias("cs"))
    )
    name = f"s22_mem_{uuid.uuid4().hex[:8]}"
    with state_partitions(spark, 8):
        q = run_to_memory(counts, name, output_mode="complete")
        q.awaitTermination(300)
    # materialize the drained state before self-joining it (deriving
    # multiple join branches from a live memory-sink table trips a
    # Spark-internal plan error; every s-query materializes its drain)
    tbl = spark.table(name)
    st = spark.createDataFrame(tbl.collect(), tbl.schema)

    corpus = st.groupBy("w").agg(F.sum("cs").alias("c"))
    scal = corpus.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).cast("double").alias("v")
    )
    stot = st.groupBy("source").agg(F.sum("cs").alias("ns"))
    x = (
        corpus.join(F.broadcast(stot))
        .join(st, ["source", "w"], "left")
        .join(F.broadcast(scal))
        .withColumn("__cs", F.coalesce(F.col("cs"), F.lit(0.0)))
    )
    p = (F.col("__cs") + F.lit(1.0)) / (F.col("ns") + F.col("v"))
    q_ = F.col("c") / F.col("n")
    out = x.groupBy("source").agg(
        F.min("ns").cast("long").alias("n_tokens"),
        F.min("v").cast("long").alias("corpus_vocab"),
        F.round(F.sum(p * F.log(p / q_)) + F.lit(1e-9), 6).alias("kl_nats"),
    )
    return spark.createDataFrame(out.collect(), out.schema)


def _xs33_sql_for_s22() -> str:
    # s22's oracle IS its batch twin's (xs33 registered in round 14):
    # after a full drain the stateful readout equals the batch KL table.
    from presto_workload_analyzer_spark.driver_queries import xs33_sql

    return xs33_sql()


STAGED_TIER3: dict[str, tuple] = {
    "xs35_contrastive_pairs": (xs35_contrastive_pairs, xs35_sql()),
    "xs36_kneser_ney_filter": (xs36_kneser_ney_filter, xs36_sql()),
    "s22_stream_source_kl": (s22_stream_source_kl, _xs33_sql_for_s22()),
}


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

# (sf dir or other corpus key) -> final centroids; deterministic data
# (kmeans_centroids' exact-replay contract), so a process-lifetime memo
# is safe across Spark sessions reading the same corpus.
_KMEANS_CENTS_CACHE: dict[str, list] = {}


def shared_kmeans_centroids(spark: SparkSession, sf: str) -> list:
    """The trained-centroid silver all three k-means consumers read
    (xs37 assignment, xs38 prototypicality, s23 streaming cell monitor):
    similarity.kmeans_centroids' exact-replay trajectory, computed once
    per (process, corpus) — k x dims driver-held floats, the bounded
    state class of BPE's merge list. Sharing it means the driver bench
    pays the iteration cost (iters+1 scans) once, not three times, and
    the three queries hash the SAME centroids by construction."""
    if sf not in _KMEANS_CENTS_CACHE:
        from presto_workload_analyzer_spark.extensions import similarity
        from presto_workload_analyzer_spark.sources import read_table

        emb = read_table(spark, f"{sf}/embeddings.parquet")
        _KMEANS_CENTS_CACHE[sf] = similarity.kmeans_centroids(
            emb, "vec_id", "embedding", k=_XS37_K, iters=_XS37_ITERS
        )
    return _KMEANS_CENTS_CACHE[sf]


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
