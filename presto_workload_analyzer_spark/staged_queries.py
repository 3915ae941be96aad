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
(round 12, 236 -> 244), xs20-xs27 (round 13, 244 -> 252).

THREE staging tiers live here so each round's registration stays <= 8
(the driver window must cover gate + new + stale in one round):
`STAGED` (xs20-xs27) registered in round 13 and is now empty;
`STAGED_NEXT` (xs28-xs34 + s21) registers in round 14; `STAGED_TIER3`
(xs35/xs36 + s22) in round 15; `STAGED_TIER4` (xs37-xs39 + s23, the
k-means clustering surface) in round 16. All tiers gate identically in
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


# ---------------------------------------------------------------------------
# TIER-2 staging (the round-14 pipeline; registered AFTER the xs20-xs27
# batch above lands in round 13, keeping each round's registration <= 8).
# Same contract as the batch above: exact DuckDB oracle, both gate SFs,
# plan-lint clean, calibration pinned by tests. Families this batch adds:
#
#   * xs28_ccnet_ppl_buckets  — CCNet's published OUTPUT structure
#                               (Wenzek et al. 2019 §4.3): per-language
#                               head/middle/tail perplexity tertiles of
#                               the held-out slice — the bucketing the
#                               xs12 threshold filter is usually shipped
#                               as.
#   * xs29_d4_prototypes      — D4 prototypicality (Tirumala et al.
#                               2023): rank members of each embedding
#                               near-dup cluster by cosine to the
#                               cluster centroid — the "drop the most
#                               prototypical" signal beside SemDeDup's
#                               keep-min (xs1/x64).
#   * xs30_quality_calibration — decile calibration of the cheap
#                               quality classifier (x43's logit)
#                               against held-out LM perplexity (xs7's
#                               chain): does the scan-speed score track
#                               the expensive signal — the validation
#                               step every published classifier-filter
#                               pipeline reports.
#   * xs31_cluster_purity     — embedding-cluster label purity/entropy
#                               (majority share + label entropy per
#                               near-dup cluster): the cluster-coherence
#                               check SemDeDup-style pipelines run
#                               before trusting semantic dedup.
#   * xs32_kcenter_coreset    — greedy k-center coreset selection
#                               (Sener & Savarese 2018): max-min
#                               diversity subset with the full greedy
#                               trajectory replayed in sequential SQL
#                               (the x119 BPE-replay falsifiability
#                               pattern).
#   * xs33_source_unigram_kl  — per-source unigram KL(source ‖ corpus)
#                               drift monitor (add-1 smoothed over the
#                               corpus vocabulary) — the domain-shift
#                               measurement DoReMi/DSIR-style mixers
#                               consume.
#   * xs34_mmr_rerank         — Maximal Marginal Relevance rerank
#                               (Carbonell & Goldstein 1998) over an
#                               exact top-16 retrieval pool: the
#                               diversity-aware serving-side sibling of
#                               the dedup stack, greedy trajectory
#                               replayed in sequential SQL.
#   * s21_stream_decontaminate — the STREAMING seam of xs25: arriving
#                               pool documents' k-grams hit the static
#                               broadcast eval-gram set; a stateful
#                               per-doc count keeps each contaminated
#                               doc's overlap mass (state grain =
#                               contaminated docs, benchmark-bounded).
# ---------------------------------------------------------------------------

_XS28_BUCKETS = ("head", "middle", "tail")


def xs28_ccnet_ppl_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet's published corpus layout (Wenzek et al. 2019 §4.3): the
    held-out slice bucketed into per-LANGUAGE head/middle/tail
    perplexity tertiles under the train-slice bigram LM — the shape the
    perplexity filter (xs12) ships as when the pipeline keeps all three
    tiers instead of hard-dropping. Tertile rank runs per language
    (partitioned window — group grain, never a global sort); rows are
    (lang, tertile): doc count, token mass, ppl range.

    100 TB: the LM count tables are vocabulary-grain (xs7's shape); the
    tertile window partitions by language, so the sort is per-language —
    with skewed languages the inner ORDER BY key is the rounded ppl,
    mergeable by range partitioning within the language. Oracle: the
    shared _xs7_perdoc_sql chain + the identical NTILE(3)."""
    from presto_workload_analyzer_spark.driver_queries import _XS7_LAM
    from presto_workload_analyzer_spark.extensions import textstats
    from presto_workload_analyzer_spark.sources import read_table
    from pyspark.sql import Window

    docs = read_table(spark, f"{sf}/documents.parquet")
    nll = textstats.heldout_bigram_nll(
        docs, "doc_id", "text", holdout=F.col("doc_id") % 5 == 0, lam=_XS7_LAM
    )
    ppl = F.round(F.exp(F.col("sum_nll") / F.col("n_scored")) + 1e-9, 6)
    scored = nll.select(
        F.col("id").alias("doc_id"),
        F.col("n_scored").alias("__nt"),
        ppl.alias("__ppl"),
    ).join(docs.select("doc_id", "lang"), "doc_id")
    w = Window.partitionBy("lang").orderBy("__ppl", "doc_id")
    names = F.array(*[F.lit(n) for n in _XS28_BUCKETS])
    return (
        scored.withColumn("__b", F.ntile(3).over(w))
        .groupBy("lang", "__b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__nt").cast("long").alias("n_tokens"),
            F.min("__ppl").alias("ppl_min"),
            F.max("__ppl").alias("ppl_max"),
        )
        .select(
            "lang",
            F.col("__b").cast("long").alias("bucket_idx"),
            F.element_at(names, F.col("__b")).alias("bucket"),
            "n_docs",
            "n_tokens",
            "ppl_min",
            "ppl_max",
        )
    )


def xs28_sql() -> str:
    from presto_workload_analyzer_spark.driver_queries import _xs7_perdoc_sql

    names = ", ".join(f"'{n}'" for n in _XS28_BUCKETS)
    return (
        _xs7_perdoc_sql()
        + ", lng AS (SELECT p.id, d.lang, p.ns,"
        "   round(exp(p.snll / p.ns) + 1e-9, 6) AS ppl"
        "  FROM perdoc p JOIN documents d ON d.doc_id = p.id),"
        " bk AS (SELECT lang, id, ns, ppl,"
        "   ntile(3) OVER (PARTITION BY lang ORDER BY ppl, id) AS b FROM lng)"
        " SELECT lang, CAST(b AS BIGINT) AS bucket_idx,"
        f"  ([{names}])[b] AS bucket,"
        "  CAST(count(*) AS BIGINT) AS n_docs,"
        "  CAST(sum(ns) AS BIGINT) AS n_tokens,"
        "  min(ppl) AS ppl_min, max(ppl) AS ppl_max"
        " FROM bk GROUP BY 1, 2, 3"
    )


def _emb_cc_sql_head() -> str:
    """The embedding near-dup connected-components CTE chain (x33's
    deterministic md5-hyperplane banding + exact cosine verify at 0.25 +
    recursive hash-min CC), ending at `cc(id, cluster_id)` — the exact
    splice _x64_sql performs, factored so xs29/xs31 consume the SAME
    cluster definition their Spark sides read from the
    shared_embedding_clusters silver."""
    from presto_workload_analyzer_spark.driver_queries import _x33_sql

    base = _x33_sql()
    head, tail = base.split(" SELECT id_a, id_b,", 1)
    assert tail.endswith("WHERE cosine > 0.25")
    return (
        "WITH RECURSIVE "
        + head[len("WITH "):]
        + ", prs AS (SELECT id_a, id_b FROM scored WHERE cosine > 0.25),"
        " edges AS (SELECT id_a AS src, id_b AS dst FROM prs"
        "  UNION SELECT id_b, id_a FROM prs),"
        " walk(id, lab) AS ("
        "  SELECT src, src FROM edges"
        "  UNION"
        "  SELECT e2.src, w.lab FROM walk w JOIN edges e2 ON e2.dst = w.id),"
        " cc AS (SELECT id, min(lab) AS cluster_id FROM walk GROUP BY id)"
    )


def xs29_d4_prototypes(spark: SparkSession, sf: str) -> DataFrame:
    """D4 prototypicality (Tirumala et al. 2023, public paper: "D4:
    Improving LLM Pretraining via Document De-Duplication and
    Diversification"): within each embedding near-dup cluster, rank
    members by cosine similarity to the CLUSTER CENTROID — rank 1 is the
    most prototypical member, the one D4 prunes first (SemDeDup keeps
    min-id, x64; this emits the signal that lets the keep rule be
    quality- or prototypicality-aware). Consumes the shared embedding-CC
    silver; the centroid is a (clusters x dims)-grain aggregate
    (label_centroids — map-side partial avg, shuffle independent of
    corpus rows), components rounded to 6dp on BOTH sides so the cosine
    is computed from identical doubles.

    Output: (vec_id, cluster_id, cluster_size, cos_centroid, proto_rank);
    rank window partitions by cluster (group grain)."""
    from presto_workload_analyzer_spark.driver_queries import (
        shared_embedding_clusters,
    )
    from presto_workload_analyzer_spark.extensions import similarity
    from presto_workload_analyzer_spark.sources import read_table
    from pyspark.sql import Window

    emb = read_table(spark, f"{sf}/embeddings.parquet")
    cc = shared_embedding_clusters(spark, sf)
    mem = emb.join(
        cc.select(F.col("id").alias("vec_id"), "cluster_id"), "vec_id"
    )
    cen = similarity.label_centroids(mem, "cluster_id", "embedding").select(
        F.col("label").alias("cluster_id"),
        F.col("n").alias("cluster_size"),
        F.transform(
            F.col("centroid"), lambda v: F.round(v + F.lit(1e-9), 6)
        ).alias("__cv"),
    )
    cos = F.round(
        similarity.cosine_expr(F.col("embedding"), F.col("__cv")) + F.lit(1e-9),
        6,
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("cos_centroid"), F.asc("vec_id")
    )
    return (
        mem.join(F.broadcast(cen), "cluster_id")
        .select(
            "vec_id", "cluster_id", "cluster_size", cos.alias("cos_centroid")
        )
        .withColumn("proto_rank", F.row_number().over(w).cast("long"))
    )


def xs29_sql() -> str:
    cos = (
        "list_dot_product(mem.ev, cv) / (sqrt(list_dot_product(mem.ev, mem.ev))"
        " * sqrt(list_dot_product(cv, cv)))"
    )
    # reuses _x33_sql's `e(vec_id, v)` DOUBLE[] CTE (aliased to ev here)
    return (
        _emb_cc_sql_head()
        + ", mem AS (SELECT cc.id AS vec_id, cc.cluster_id, e.v AS ev"
        "  FROM cc JOIN e ON e.vec_id = cc.id),"
        " dim AS (SELECT cluster_id, u.pos AS pos, ev[u.pos] AS vv"
        "  FROM mem, UNNEST(range(1, len(ev) + 1)) AS u(pos)),"
        " m AS (SELECT cluster_id, pos, avg(vv) AS mv FROM dim GROUP BY 1, 2),"
        " cen AS (SELECT cluster_id, list(round(mv + 1e-9, 6) ORDER BY pos)"
        "   AS cv FROM m GROUP BY 1),"
        " sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size"
        "  FROM mem GROUP BY 1),"
        " sc AS (SELECT mem.vec_id, mem.cluster_id, sz.cluster_size,"
        f"   round({cos} + 1e-9, 6) AS cos_centroid"
        "  FROM mem JOIN cen USING (cluster_id) JOIN sz USING (cluster_id))"
        " SELECT vec_id, cluster_id, cluster_size, cos_centroid,"
        "  CAST(row_number() OVER (PARTITION BY cluster_id"
        "   ORDER BY cos_centroid DESC, vec_id) AS BIGINT) AS proto_rank"
        " FROM sc"
    )


_XS30_DECILES = tuple(i / 10.0 for i in range(1, 10))


def xs30_quality_calibration(spark: SparkSession, sf: str) -> DataFrame:
    """Calibration of the scan-speed quality classifier against the
    expensive LM signal — the validation table every published
    classifier-filter pipeline reports before trusting the cheap score
    (FineWeb-edu, RedPajama-2, DCLM all publish some form): held-out
    docs bucketed into DECILES of the x43 logistic quality score, each
    decile's held-out perplexity under the train-slice bigram LM beside
    it. A calibrated classifier shows monotone-ish ppl across deciles;
    a flat profile means the cheap score carries no LM signal.

    100 TB shape is x31's: decile BOUNDARIES from approx_percentile (a
    mergeable sketch, accuracy derived from the slice row count so the
    gate stays rank-exact, capped at 1e7 so sketch memory never scales
    with the corpus), broadcast back over the scan — no global sort, no
    unpartitioned window. Oracle: quantile_disc + the shared
    _xs7_perdoc_sql chain."""
    from presto_workload_analyzer_spark.driver_queries import _XS7_LAM
    from presto_workload_analyzer_spark.extensions import textstats
    from presto_workload_analyzer_spark.sources import read_table

    docs = read_table(spark, f"{sf}/documents.parquet")
    hold = docs.filter(F.col("doc_id") % 5 == 0)
    lg = hold.select(
        "doc_id",
        F.round(textstats.quality_logit("text") + F.lit(1e-9), 6).alias("__q"),
    )
    accuracy = min(max(1_000_000, 10 * lg.count()), 10_000_000)
    pcts = ", ".join(f"{p}D" for p in _XS30_DECILES)
    bounds = lg.select(
        F.expr(f"approx_percentile(__q, array({pcts}), {accuracy})").alias("qb")
    )
    decile = F.lit(1)
    for i in range(len(_XS30_DECILES)):
        decile = decile + (F.col("__q") > F.col("qb")[i]).cast("int")
    nll = textstats.heldout_bigram_nll(
        docs, "doc_id", "text", holdout=F.col("doc_id") % 5 == 0, lam=_XS7_LAM
    )
    j = (
        lg.join(F.broadcast(bounds))
        .withColumn("__d", decile)
        .join(
            nll.select(F.col("id").alias("doc_id"), "n_scored", "sum_nll"),
            "doc_id",
        )
    )
    avg_nll = F.sum("sum_nll") / F.sum("n_scored")
    return (
        j.groupBy("__d")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.avg("__q") + F.lit(1e-9), 6).alias("mean_logit"),
            F.round(avg_nll + F.lit(1e-9), 6).alias("avg_nll"),
            F.round(F.exp(avg_nll) + F.lit(1e-9), 6).alias("ppl"),
        )
        .select(
            F.col("__d").cast("long").alias("decile"),
            "n_docs",
            "mean_logit",
            "avg_nll",
            "ppl",
        )
    )


def xs30_sql() -> str:
    from presto_workload_analyzer_spark.driver_queries import (
        _X43_Z,
        _xs7_perdoc_sql,
    )

    pcts = ", ".join(repr(p) for p in _XS30_DECILES)
    bucket = " + ".join(
        f"CAST(q > qb[{i + 1}] AS INT)" for i in range(len(_XS30_DECILES))
    )
    return (
        _xs7_perdoc_sql()
        + f", lg AS (SELECT doc_id, round(1.0 / (1.0 + exp(-{_X43_Z})) + 1e-9, 6)"
        "   AS q FROM documents WHERE doc_id % 5 = 0),"
        f" bnd AS (SELECT quantile_disc(q, [{pcts}]) AS qb FROM lg),"
        f" bu AS (SELECT doc_id, q, 1 + {bucket} AS dec FROM lg, bnd),"
        " j AS (SELECT dec, q, ns, snll FROM bu"
        "  JOIN perdoc ON perdoc.id = bu.doc_id)"
        " SELECT CAST(dec AS BIGINT) AS decile,"
        "  CAST(count(*) AS BIGINT) AS n_docs,"
        "  round(avg(q) + 1e-9, 6) AS mean_logit,"
        "  round(sum(snll) / sum(ns) + 1e-9, 6) AS avg_nll,"
        "  round(exp(sum(snll) / sum(ns)) + 1e-9, 6) AS ppl"
        " FROM j GROUP BY 1"
    )


def xs31_cluster_purity(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cluster LABEL coherence — the sanity check
    SemDeDup-style pipelines run before trusting semantic dedup: if
    near-dup clusters mix unrelated labels, the encoder (or the
    threshold) is wrong and the dedup would delete non-duplicates. Per
    shared-CC cluster: member count, distinct labels, majority-label
    share, and label entropy in bits (0 = pure). Entropy uses the
    algebraic one-pass form H = log2(S) - sum(c*log2(c))/S on BOTH
    sides, so a single aggregation computes it without a second
    grouping pass (counts shuffle at (cluster, label) grain only)."""
    from presto_workload_analyzer_spark.driver_queries import (
        shared_embedding_clusters,
    )
    from presto_workload_analyzer_spark.sources import read_table

    emb = read_table(spark, f"{sf}/embeddings.parquet")
    cc = shared_embedding_clusters(spark, sf)
    mem = emb.select("vec_id", "label").join(
        cc.select(F.col("id").alias("vec_id"), "cluster_id"), "vec_id"
    )
    cnt = mem.groupBy("cluster_id", "label").agg(
        F.count(F.lit(1)).cast("double").alias("__c")
    )
    s = F.sum("__c")
    return cnt.groupBy("cluster_id").agg(
        s.cast("long").alias("cluster_size"),
        F.count(F.lit(1)).cast("long").alias("n_labels"),
        F.round(F.max("__c") / s + F.lit(1e-9), 6).alias("majority_share"),
        F.round(
            F.log2(s) - F.sum(F.col("__c") * F.log2("__c")) / s + F.lit(1e-9), 6
        ).alias("label_entropy"),
    )


def xs31_sql() -> str:
    return (
        _emb_cc_sql_head()
        + ", mem AS (SELECT cc.id AS vec_id, cc.cluster_id, emb.label"
        "  FROM cc JOIN embeddings emb ON emb.vec_id = cc.id),"
        " cnt AS (SELECT cluster_id, label, CAST(count(*) AS DOUBLE) AS c"
        "  FROM mem GROUP BY 1, 2)"
        " SELECT cluster_id, CAST(sum(c) AS BIGINT) AS cluster_size,"
        "  CAST(count(*) AS BIGINT) AS n_labels,"
        "  round(max(c) / sum(c) + 1e-9, 6) AS majority_share,"
        "  round(log2(sum(c)) - sum(c * log2(c)) / sum(c) + 1e-9, 6)"
        "   AS label_entropy"
        " FROM cnt GROUP BY 1"
    )


_XS32_K = 8


def xs32_kcenter_coreset(spark: SparkSession, sf: str) -> DataFrame:
    """Greedy k-center coreset selection over the corpus embeddings
    (similarity.kcenter_coreset — Sener & Savarese 2018): the max-min
    diversity subset, k=8, seeded at the min id. The reported dist is
    the covering radius at each pick (non-increasing by round — pinned
    by test). The oracle replays the FULL greedy trajectory in
    sequential SQL (the x119 BPE-replay pattern): one divergence at any
    round — wrong argmax, wrong tie-break, wrong running min — is a
    hash mismatch."""
    from presto_workload_analyzer_spark.extensions import similarity
    from presto_workload_analyzer_spark.sources import read_table

    emb = read_table(spark, f"{sf}/embeddings.parquet")
    rows = similarity.kcenter_coreset(emb, "vec_id", "embedding", k=_XS32_K)
    return spark.createDataFrame(
        rows, "pick_round LONG, vec_id LONG, dist DOUBLE"
    )


def xs32_sql() -> str:
    k = _XS32_K

    def cos(a: str, b: str) -> str:
        return (
            f"list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
            f" * sqrt(list_dot_product({b}, {b})))"
        )

    # MATERIALIZED pins: each s{r} is one row but inlines the whole
    # m{r-1} chain; without materialization the m-chain re-expands at
    # every reference (exponential plan text + one parquet re-open per
    # inlined scan — fd exhaustion on deep chains).
    parts = [
        "e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings)",
        "s1 AS MATERIALIZED (SELECT min(vec_id) AS id FROM e)",
        "v1 AS (SELECT e.v FROM e JOIN s1 ON e.vec_id = s1.id)",
        f"m1 AS (SELECT e.vec_id, round(1.0 - {cos('e.v', 'v1.v')} + 1e-9, 6)"
        " AS d FROM e, v1)",
    ]
    for r in range(2, k + 1):
        parts.append(
            f"s{r} AS MATERIALIZED (SELECT vec_id AS id, d FROM m{r - 1}"
            " ORDER BY d DESC, vec_id LIMIT 1)"
        )
        if r < k:
            parts.append(
                f"v{r} AS (SELECT e.v FROM e JOIN s{r} ON e.vec_id = s{r}.id)"
            )
            parts.append(
                f"m{r} AS (SELECT m.vec_id,"
                f" least(m.d, round(1.0 - {cos('e.v', f'v{r}.v')} + 1e-9, 6))"
                f" AS d FROM m{r - 1} m JOIN e ON e.vec_id = m.vec_id, v{r})"
            )
    sel = [
        "SELECT CAST(1 AS BIGINT) AS pick_round,"
        " (SELECT id FROM s1) AS vec_id, 0.0 AS dist"
    ]
    for r in range(2, k + 1):
        sel.append(f"SELECT CAST({r} AS BIGINT), id, d FROM s{r}")
    return "WITH " + ", ".join(parts) + " " + " UNION ALL ".join(sel)


def xs33_source_unigram_kl(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source unigram KL divergence from the corpus distribution —
    the domain-DRIFT monitor mixture pipelines consume (DoReMi/DSIR
    measure domain fit with exactly this family of statistics): for each
    source, KL(p_source ‖ p_corpus) in nats, p_source add-1 smoothed
    over the corpus vocabulary (so sources missing vocabulary words pay
    for the mass they lack), p_corpus the MLE (every vocab word has
    corpus support, so the ratio is finite by construction).

    100 TB shape: everything lives at vocabulary grain — corpus counts,
    per-source counts, and the (vocab x sources) term table built by
    BROADCASTING the tiny per-source-total frame over the vocab scan
    (never the reverse; vocab is the big side). One shuffle per count
    table, all map-side combinable; the KL rollup shuffles source-grain
    partials only."""
    from presto_workload_analyzer_spark.extensions.textstats import tokens
    from presto_workload_analyzer_spark.sources import read_table

    docs = read_table(spark, f"{sf}/documents.parquet")
    toks = (
        docs.filter(F.col("text").isNotNull())
        .select(
            "source",
            F.explode(F.transform(tokens("text"), lambda t: F.lower(t))).alias(
                "w"
            ),
        )
        .filter(F.col("w") != "")
    )
    corpus = toks.groupBy("w").agg(F.count(F.lit(1)).cast("double").alias("c"))
    scal = corpus.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).cast("double").alias("v")
    )
    srcc = toks.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("double").alias("cs")
    )
    stot = srcc.groupBy("source").agg(F.sum("cs").alias("ns"))
    x = (
        corpus.join(F.broadcast(stot))
        .join(srcc, ["source", "w"], "left")
        .join(F.broadcast(scal))
        .withColumn("__cs", F.coalesce(F.col("cs"), F.lit(0.0)))
    )
    p = (F.col("__cs") + F.lit(1.0)) / (F.col("ns") + F.col("v"))
    q = F.col("c") / F.col("n")
    return x.groupBy("source").agg(
        F.min("ns").cast("long").alias("n_tokens"),
        F.min("v").cast("long").alias("corpus_vocab"),
        F.round(F.sum(p * F.log(p / q)) + F.lit(1e-9), 6).alias("kl_nats"),
    )


def xs33_sql() -> str:
    return (
        "WITH b AS (SELECT source,"
        "   list_transform(string_split_regex(trim(text), '\\s+'),"
        "    t -> lower(t)) AS toks"
        "  FROM documents WHERE text IS NOT NULL),"
        " u AS (SELECT source, w FROM ("
        "   SELECT source, unnest(toks) AS w FROM b) q0 WHERE w <> ''),"
        " corpus AS (SELECT w, CAST(count(*) AS DOUBLE) AS c"
        "  FROM u GROUP BY 1),"
        " scal AS (SELECT CAST(sum(c) AS DOUBLE) AS n,"
        "   CAST(count(*) AS DOUBLE) AS v FROM corpus),"
        " srcc AS (SELECT source, w, CAST(count(*) AS DOUBLE) AS cs"
        "  FROM u GROUP BY 1, 2),"
        " stot AS (SELECT source, sum(cs) AS ns FROM srcc GROUP BY 1),"
        " x AS (SELECT st.source, co.c,"
        "   coalesce(sc.cs, 0.0) AS cs, st.ns, scal.n, scal.v"
        "  FROM corpus co CROSS JOIN stot st"
        "   LEFT JOIN srcc sc ON sc.source = st.source AND sc.w = co.w,"
        "   scal)"
        " SELECT source, CAST(min(ns) AS BIGINT) AS n_tokens,"
        "  CAST(min(v) AS BIGINT) AS corpus_vocab,"
        "  round(sum(((cs + 1.0) / (ns + v))"
        "   * ln(((cs + 1.0) / (ns + v)) / (c / n))) + 1e-9, 6) AS kl_nats"
        " FROM x GROUP BY 1"
    )


_XS34_POOL = 16
_XS34_K = 8
_XS34_LAM = 0.7
_XS34_QUERY = 0


def xs34_mmr_rerank(spark: SparkSession, sf: str) -> DataFrame:
    """Maximal Marginal Relevance rerank (Carbonell & Goldstein 1998)
    over an exact top-16 retrieval pool for query vec 0: the
    diversity-aware serving-side rerank (lam=0.7), picking 8. The
    distributed work is the pool: exact top-16 cosine retrieval plus the
    in-engine pairwise-cosine table over the pool (both rounded to 6dp,
    so the driver-side greedy — pool-sized state, MMR's own sequential
    dependency — does IEEE-double arithmetic on engine-identical
    operands and replays exactly in sequential SQL; the pick margins are
    pinned >= 1e-9 by test so no engine can flip a round). Both sides
    use the max-sim-floor-at-0.0 convention (similarity.mmr_rerank's
    documented deviation from literal Carbonell-Goldstein for
    negative-cosine pools): Python seeds maxsim = 0.0, the oracle's
    m{r+1} takes greatest(ms, coalesce(s, 0.0)) from a 0.0 seed.

    Output: (pick_rank, vec_id, relevance, mmr_score)."""
    from presto_workload_analyzer_spark.extensions import similarity
    from presto_workload_analyzer_spark.sources import read_table

    emb = read_table(spark, f"{sf}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == _XS34_QUERY)
    top = similarity.cosine_topk(emb, q, k=_XS34_POOL).select(
        "neighbor_id", F.round(F.col("cosine") + F.lit(1e-9), 6).alias("rel")
    )
    pool = emb.join(
        F.broadcast(top.select(F.col("neighbor_id").alias("vec_id"))), "vec_id"
    )
    a = pool.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = pool.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    pairs = a.join(F.broadcast(b), F.col("id_a") < F.col("id_b")).select(
        "id_a",
        "id_b",
        F.round(
            similarity.cosine_expr(F.col("va"), F.col("vb")) + F.lit(1e-9), 6
        ).alias("s"),
    )
    rel = {r["neighbor_id"]: r["rel"] for r in top.collect()}
    psim = {(r["id_a"], r["id_b"]): r["s"] for r in pairs.collect()}
    picks = similarity.mmr_rerank(rel, psim, k=_XS34_K, lam=_XS34_LAM)
    out = spark.createDataFrame(
        picks, "pick_rank LONG, vec_id LONG, relevance DOUBLE, __raw DOUBLE"
    )
    return out.select(
        "pick_rank",
        "vec_id",
        "relevance",
        F.round(F.col("__raw") + F.lit(1e-9), 6).alias("mmr_score"),
    )


def xs34_sql() -> str:
    lam, k, pool, qid = _XS34_LAM, _XS34_K, _XS34_POOL, _XS34_QUERY
    om = 1.0 - lam  # embedded via repr: 0.7 -> 0.30000000000000004 in IEEE

    def cos(a: str, b: str) -> str:
        return (
            f"list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
            f" * sqrt(list_dot_product({b}, {b})))"
        )

    # MATERIALIZED pins: cand/ps/g{r} are pool-sized (or one-row) but
    # inline the whole upstream chain per reference; un-materialized,
    # the m-chain's 4 references per level expand exponentially (plan
    # blowup + one parquet re-open per inlined scan — fd exhaustion).
    parts = [
        "e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v"
        " FROM embeddings)",
        f"qv AS (SELECT v FROM e WHERE vec_id = {qid})",
        f"sc AS (SELECT e.vec_id, {cos('e.v', 'qv.v')} AS c"
        f" FROM e, qv WHERE e.vec_id <> {qid})",
        "rk AS (SELECT vec_id, c,"
        " row_number() OVER (ORDER BY c DESC, vec_id) AS r FROM sc)",
        f"cand AS MATERIALIZED (SELECT vec_id, round(c + 1e-9, 6) AS rel"
        f" FROM rk WHERE r <= {pool})",
        "ps AS MATERIALIZED (SELECT a.vec_id AS id_a, b.vec_id AS id_b,"
        f" round({cos('ea.v', 'eb.v')} + 1e-9, 6) AS s"
        " FROM cand a JOIN cand b ON a.vec_id < b.vec_id"
        " JOIN e ea ON ea.vec_id = a.vec_id"
        " JOIN e eb ON eb.vec_id = b.vec_id)",
        "m1 AS (SELECT vec_id, rel, 0.0 AS ms FROM cand)",
    ]
    sel = []
    for r in range(1, k + 1):
        parts.append(
            f"g{r} AS MATERIALIZED (SELECT vec_id, rel, ms,"
            f" {lam!r} * rel - {om!r} * ms AS score"
            f" FROM m{r} ORDER BY score DESC, vec_id LIMIT 1)"
        )
        if r < k:
            # the one-row g{r} cross-joins in first so the LEFT JOIN
            # condition sees plain columns (DuckDB rejects subqueries
            # in non-inner join conditions)
            parts.append(
                f"m{r + 1} AS (SELECT m.vec_id, m.rel,"
                " greatest(m.ms, coalesce(p.s, 0.0)) AS ms"
                f" FROM m{r} m CROSS JOIN g{r} g"
                " LEFT JOIN ps p ON (p.id_a = m.vec_id AND p.id_b = g.vec_id)"
                "  OR (p.id_b = m.vec_id AND p.id_a = g.vec_id)"
                " WHERE m.vec_id <> g.vec_id)"
            )
        sel.append(
            f"SELECT CAST({r} AS BIGINT) AS pick_rank, vec_id,"
            f" rel AS relevance, round(score + 1e-9, 6) AS mmr_score"
            f" FROM g{r}"
        )
    return "WITH " + ", ".join(parts) + " " + " UNION ALL ".join(sel)



def s21_stream_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """The STREAMING seam of xs25's benchmark decontamination: pool
    documents arrive continuously; each micro-batch's k-grams hit the
    STATIC broadcast eval-gram set (stream-static equi-join — stateless)
    and a stateful per-doc count accumulates each contaminated doc's
    overlap mass. State grain = contaminated docs only (the set sharing
    grams with a benchmark — benchmark-bounded, NOT corpus-bounded), the
    same economics as the batch twin's broadcast semi-join. Complete-mode
    memory drain in the gate; the production sink is the foreachBatch
    upsert path. Oracle: xs25's own chain, hit rows only — spliced from
    xs25_sql so the two contracts cannot drift."""
    import uuid

    from presto_workload_analyzer_spark.driver_queries import _xs25_grams
    from presto_workload_analyzer_spark.sources import read_table
    from presto_workload_analyzer_spark.streaming import (
        run_to_memory,
        state_partitions,
        stream_sf_table,
    )

    docs = read_table(spark, f"{sf}/documents.parquet")
    ev = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select(F.explode(_xs25_grams()).alias("gram"))
        .distinct()
    )
    hits = (
        stream_sf_table(spark, sf, "documents")
        .filter(F.col("doc_id") % 10 != 0)
        .select("doc_id", F.explode(_xs25_grams()).alias("gram"))
        .join(F.broadcast(ev), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap_grams"))
    )
    name = f"s21_mem_{uuid.uuid4().hex[:8]}"
    with state_partitions(spark, 8):
        q = run_to_memory(hits, name, output_mode="complete")
        q.awaitTermination(300)
    tbl = spark.table(name)
    return spark.createDataFrame(tbl.collect(), tbl.schema)


def s21_sql() -> str:
    from presto_workload_analyzer_spark.driver_queries import xs25_sql

    base = xs25_sql()
    head, _ = base.split(" SELECT d.doc_id,", 1)
    return head + " SELECT doc_id, n AS n_overlap_grams FROM hit"


STAGED_NEXT: dict[str, tuple] = {
    "xs28_ccnet_ppl_buckets": (xs28_ccnet_ppl_buckets, xs28_sql()),
    "xs29_d4_prototypes": (xs29_d4_prototypes, xs29_sql()),
    "xs30_quality_calibration": (xs30_quality_calibration, xs30_sql()),
    "xs31_cluster_purity": (xs31_cluster_purity, xs31_sql()),
    "xs32_kcenter_coreset": (xs32_kcenter_coreset, xs32_sql()),
    "xs33_source_unigram_kl": (xs33_source_unigram_kl, xs33_sql()),
    "xs34_mmr_rerank": (xs34_mmr_rerank, xs34_sql()),
    "s21_stream_decontaminate": (s21_stream_decontaminate, s21_sql()),
}


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


STAGED_TIER3: dict[str, tuple] = {
    "xs35_contrastive_pairs": (xs35_contrastive_pairs, xs35_sql()),
    "xs36_kneser_ney_filter": (xs36_kneser_ney_filter, xs36_sql()),
    "s22_stream_source_kl": (s22_stream_source_kl, xs33_sql()),
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
# Registration note (r16): xs37/xs38/s23 each recompute the centroid
# trajectory (3 bounded collects); at registration, lift it into a
# shared per-session silver (the shared_dedup_clusters convention) so
# the driver bench pays the iteration cost once, not three times.
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
    assignment pass + a (k x dims)-grain mean, iters+1 scans total)."""
    from presto_workload_analyzer_spark.extensions import similarity
    from presto_workload_analyzer_spark.sources import read_table

    emb = read_table(spark, f"{sf}/embeddings.parquet")
    return similarity.kmeans_lloyd(
        emb, "vec_id", "embedding", k=_XS37_K, iters=_XS37_ITERS
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
    cents = similarity.kmeans_centroids(
        emb, "vec_id", "embedding", k=_XS37_K, iters=_XS37_ITERS
    )
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
    from presto_workload_analyzer_spark.sources import read_table
    from presto_workload_analyzer_spark.streaming import (
        run_to_memory,
        state_partitions,
        stream_sf_table,
    )

    emb = read_table(spark, f"{sf}/embeddings.parquet")
    cents = similarity.kmeans_centroids(
        emb, "vec_id", "embedding", k=_XS37_K, iters=_XS37_ITERS
    )
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
