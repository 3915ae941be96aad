"""STAGED driver queries — implemented, oracle-paired, locally verified,
NOT yet registered.

The staging cadence (proven over rounds 7-9): implement the operator in
extensions/, pair it with an exact DuckDB oracle here, get
tests/test_staged_queries.py green at BOTH sf0.001 and sf0.01 (the same
spark-vs-DuckDB compare the local gate applies to registered queries,
plus the plan lint's core bans and the oracle dtype ban), then register
next round by moving the (name, fn, sql) triple into
driver_queries._register — a move, not a debugging session.

Rounds 7-8 staged xs1-xs5 (SemDeDup, DSIR weights, DSIR mix, MJPEG frame
pipeline, guard-ON LSH); round 9 registered them (driver_queries.py, the
"Round-9 unfreeze" section). This module stages the xs6+ batch (round-9
verdict item 2) — the remaining published data-mixing / quality-filter
methods:

  * xs6_unimax_mix          — UniMax epoch-capped uniform source mixing
                              (Chung et al. 2023) as an exact closed-form
                              planner op beside x95's rate planner.
  * xs7_heldout_perplexity  — per-source held-out perplexity under an
                              interpolated bigram LM fit on the Rest of
                              the corpus (the perplexity-filter scoring
                              stage; extends x63's Jelinek-Mercer).
  * xs8_cluster_balanced_sample — dedup-aware sampling: at most m
                              deterministic (md5-pick) representatives
                              per x14 duplicate cluster, singletons pass.
  * xs9_temperature_mix     — temperature-based source sampling
                              (w_s ∝ tokens^(1/T)), the strategy UniMax
                              was published against; completes the
                              mixing trio beside x95 and xs6.
  * xs10_gopher_rules       — the Gopher hard-filter rule battery
                              (Rae et al. 2021 Table A1): per-doc rule
                              values + flags + keep conjunction; the
                              third quality-filter shape beside x08/x43.
  * xs11_gopher_repetition  — the Gopher repetition battery: top-n-gram
                              char fraction (n=2,3,4) + positional
                              duplicate-n-gram coverage (n=5,10), paper
                              thresholds; completes the Gopher filter.
  * xs12_perplexity_filter  — the doc-grain KEEP decision of the
                              perplexity filter xs7 diagnoses at source
                              grain (CCNet-style loop), margin-pinned
                              threshold.
  * s18_stream_quality_gate — xs10's rule battery running unchanged on
                              the ingestion stream (stateless Column
                              map, availableNow drain); same oracle.
  * xs13_dsir_resample      — DSIR's importance-RESAMPLING step
                              end-to-end: xs2's weights -> A-ES keys
                              (x99's hash-replaces-RNG) -> per-source
                              top-K; completes the DSIR chain.

Registration checklist for each entry:
  * move (name, fn, sql) into driver_queries._register;
  * if the plan uses a declared Arrow surface (mapInPandas etc.), add the
    name to tests/test_plan_lint._ALLOWED_PANDAS — the xs6-xs13 batch is
    pure Column/join/window plans and needs no exemption; s18 is a
    streaming query (s-prefix: exempt from batch-lint construction like
    every other s-query, stateless so it has no state-store surface);
  * column names aliased identically on both sides, integer aggregates
    cast to BIGINT, floats rounded to 6 after scaling, no
    HUGEINT/DECIMAL/UHUGEINT anywhere in the oracle's DESCRIBE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# Calibrated to the synthetic corpus: per-source token totals sit at
# 1.1-1.7k per source at the gate SFs (20 sources, ~27k total tokens), so
# with epoch cap 1.0 a 26k budget splits the sorted source list mid-range
# — 7 capped / 13 uniform at sf0.001, 9/11 at sf0.01 — exercising BOTH
# branches of the closed form (min |L_i - B| >= 18 tokens, and every L_i
# is an exact integer in double, so the strict < threshold can't flip).
# At sf0.1 sources are ~10x bigger and nothing caps: pure uniform split.
_XS6_BUDGET = 26_000.0
_XS6_EPOCH_CAP = 1.0


def xs6_unimax_mix(spark: SparkSession, sf: str) -> DataFrame:
    """UniMax source mixing (Chung et al. 2023, arXiv:2304.09151): spread
    a total token budget as uniformly as possible over sources, capped at
    `epoch_cap` epochs per source — the fairness-motivated alternative to
    temperature sampling, and the allocation step beside x95's rate
    planner. The greedy walk has a closed form (capping is monotone in
    the source-size order — sampling.unimax_mix docstring derives it), so
    the whole op is ONE corpus-grain token aggregate followed by
    arithmetic on #sources rows (broadcast self-join for rank/prefix sum,
    1-row broadcast cross joins for the scalars — no window, no global
    sort)."""
    from presto_workload_analyzer_spark.extensions import sampling
    from presto_workload_analyzer_spark.extensions import textstats
    from presto_workload_analyzer_spark.sources import read_table

    docs = read_table(spark, f"{sf}/documents.parquet")
    per = docs.groupBy("source").agg(
        F.sum(textstats.token_count("text").cast("long")).alias("__tok")
    )
    return sampling.unimax_mix(
        per, "source", "__tok", budget=_XS6_BUDGET, epoch_cap=_XS6_EPOCH_CAP
    )


def xs6_sql() -> str:
    b, e = _XS6_BUDGET, _XS6_EPOCH_CAP
    return (
        "WITH per AS (SELECT source,"
        "   CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS t"
        "  FROM documents GROUP BY 1),"
        " r AS (SELECT source, t,"
        "   CAST(count(*) OVER (ORDER BY t, source) AS BIGINT) AS rnk,"
        "   CAST(sum(t) OVER (ORDER BY t, source) AS BIGINT) AS cum_le,"
        "   CAST(count(*) OVER () AS BIGINT) AS n"
        "  FROM per),"
        f" c AS (SELECT *, {e!r} * (t * (n - rnk + 1) + (cum_le - t)) < {b!r}"
        "    AS capped FROM r),"
        " g AS (SELECT CAST(sum(CASE WHEN capped THEN t ELSE 0 END) AS BIGINT)"
        "    AS ct,"
        "   CAST(sum(CASE WHEN capped THEN 1 ELSE 0 END) AS BIGINT) AS nc"
        "  FROM c)"
        " SELECT source, t AS tokens_available, capped,"
        f"  round(CASE WHEN capped THEN {e!r} * t"
        f"   ELSE ({b!r} - {e!r} * ct) / (n - nc) END + 1e-9, 6)"
        "   AS tokens_allocated,"
        f"  round((CASE WHEN capped THEN {e!r} * t"
        f"   ELSE ({b!r} - {e!r} * ct) / (n - nc) END) / t + 1e-9, 6) AS epochs"
        " FROM c, g"
    )


# 20% deterministic held-out slice; lam mirrors x63's Jelinek-Mercer mix.
_XS7_LAM = 0.7


def xs7_heldout_perplexity(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source held-out perplexity under an interpolated bigram LM fit
    on the TRAIN slice only (textstats.heldout_bigram_nll) — the scoring
    stage of a perplexity quality filter: fit a reference LM, score
    candidate text, drop the high-perplexity tail. Extends x63 (which
    fits and scores on the same corpus) with an honest train/held-out
    split (doc_id % 5 = 0 held out) and add-1 OOV flooring, then rolls
    the doc-grain sums up to source grain — the grain a mixing decision
    reads. Count tables at vocabulary grain, unseen keys LEFT-join to 0,
    scalars broadcast: x63's exact shuffle shape."""
    from presto_workload_analyzer_spark.extensions import textstats
    from presto_workload_analyzer_spark.sources import read_table

    docs = read_table(spark, f"{sf}/documents.parquet")
    nll = textstats.heldout_bigram_nll(
        docs, "doc_id", "text", holdout=F.col("doc_id") % 5 == 0, lam=_XS7_LAM
    )
    src = docs.filter(F.col("doc_id") % 5 == 0).select(
        F.col("doc_id").alias("id"), "source"
    )
    return (
        nll.join(src, "id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_scored").cast("long").alias("n_tokens"),
            (F.sum("sum_nll") / F.sum("n_scored")).alias("__avg"),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(F.col("__avg") + 1e-9, 6).alias("avg_nll"),
            F.round(F.exp(F.col("__avg")) + 1e-9, 6).alias("ppl"),
        )
    )


def xs7_sql() -> str:
    lam = _XS7_LAM
    return (
        "WITH base AS (SELECT doc_id AS id, source, (doc_id % 5 = 0) AS ho,"
        "   list_transform(string_split_regex(trim(text), '\\s+'),"
        "    t -> lower(t)) AS toks"
        "  FROM documents WHERE text IS NOT NULL),"
        " tr AS (SELECT * FROM base WHERE NOT ho),"
        " hd AS (SELECT * FROM base WHERE ho),"
        " uni AS (SELECT w, count(*) AS c1 FROM ("
        "   SELECT unnest(toks) AS w FROM tr) u WHERE w <> '' GROUP BY 1),"
        " scal AS (SELECT CAST(sum(c1) AS DOUBLE) AS n,"
        "   CAST(count(*) AS DOUBLE) AS v FROM uni),"
        " bi AS (SELECT w_prev, w, count(*) AS c2 FROM ("
        "   SELECT toks[i] AS w_prev, toks[i+1] AS w"
        "   FROM tr, UNNEST(range(1, greatest(len(toks)-1, 0)+1)) AS t(i)"
        "   WHERE len(toks) >= 2) b GROUP BY 1, 2),"
        " bh AS (SELECT id, toks[i] AS w_prev, toks[i+1] AS w"
        "  FROM hd, UNNEST(range(1, greatest(len(toks)-1, 0)+1)) AS t(i)"
        "  WHERE len(toks) >= 2),"
        f" sb AS (SELECT id, -ln({lam!r} * (CASE WHEN coalesce(cp.c1, 0) > 0"
        "     THEN CAST(coalesce(b.c2, 0) AS DOUBLE) / cp.c1 ELSE 0.0 END)"
        f"   + {1.0 - lam!r} * (coalesce(u.c1, 0) + 1.0) / (n + v + 1.0)) AS nll"
        "  FROM bh LEFT JOIN bi b USING (w_prev, w)"
        "   LEFT JOIN uni cp ON cp.w = bh.w_prev"
        "   LEFT JOIN uni u ON u.w = bh.w, scal),"
        " fst AS (SELECT id, -ln((coalesce(c1, 0) + 1.0) / (n + v + 1.0)) AS nll"
        "  FROM (SELECT id, toks[1] AS w FROM hd"
        "    WHERE len(toks) >= 1 AND toks[1] <> '') f"
        "   LEFT JOIN uni USING (w), scal),"
        " perdoc AS (SELECT id, count(*) AS ns, sum(nll) AS snll"
        "  FROM (SELECT * FROM sb UNION ALL SELECT * FROM fst) a GROUP BY 1)"
        " SELECT source, CAST(count(*) AS BIGINT) AS n_docs,"
        "  CAST(sum(ns) AS BIGINT) AS n_tokens,"
        "  round(sum(snll) / sum(ns) + 1e-9, 6) AS avg_nll,"
        "  round(exp(sum(snll) / sum(ns)) + 1e-9, 6) AS ppl"
        " FROM perdoc JOIN (SELECT id, source FROM hd) s USING (id)"
        " GROUP BY 1"
    )


# T=3 sits in the published multilingual-mixing range (T in [1, 5]);
# 1/T = 1/3 keeps the exponent exactly representable-by-division on both
# engines (the round-6 armor absorbs libm pow ulp either way).
_XS9_TEMPERATURE = 3.0
_XS9_BUDGET = 26_000.0


def xs9_temperature_mix(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-based source sampling — the standard alternative UniMax
    (xs6) was published against: sampling weight w_s ∝ tokens_s^(1/T),
    T>1 flattens the source distribution toward uniform without UniMax's
    hard epoch cap (T=1 is proportional, T→∞ is uniform). The third
    mixing strategy beside x95's rate planner and xs6 — together they
    cover the source-mixing design space every published pretraining
    recipe picks from. One corpus-grain token aggregate; the power-law
    normalization folds in via a 1-row broadcast cross join (source-grain
    arithmetic, no window, no sort)."""
    from presto_workload_analyzer_spark.extensions import sampling
    from presto_workload_analyzer_spark.extensions import textstats
    from presto_workload_analyzer_spark.sources import read_table

    docs = read_table(spark, f"{sf}/documents.parquet")
    per = docs.groupBy("source").agg(
        F.sum(textstats.token_count("text").cast("long")).alias("__tok")
    )
    return sampling.temperature_mix(
        per, "source", "__tok",
        budget=_XS9_BUDGET, temperature=_XS9_TEMPERATURE,
    )


def xs9_sql() -> str:
    b, t = _XS9_BUDGET, _XS9_TEMPERATURE
    return (
        "WITH per AS (SELECT source,"
        "   CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)"
        "    AS tok"
        "  FROM documents GROUP BY 1),"
        f" p AS (SELECT source, tok, power(tok, 1.0 / {t!r}) AS pw FROM per),"
        " z AS (SELECT sum(pw) AS zt FROM p)"
        " SELECT source, tok AS tokens_available,"
        "  round(pw / zt + 1e-9, 6) AS weight,"
        f"  round({b!r} * pw / zt + 1e-9, 6) AS tokens_allocated,"
        f"  round({b!r} * pw / zt / tok + 1e-9, 6) AS epochs"
        " FROM p, z"
    )


_XS8_M = 2


def xs8_cluster_balanced_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Dedup-aware (cluster-balanced) sampling over x14's duplicate
    clusters: keep at most m=2 md5-deterministic representatives per
    connected component of the minhash-LSH dup graph, singletons pass
    through — the mixing step that stops a viral template family from
    dominating a sampled corpus while still representing it
    (sampling.cluster_balanced_sample). Consumes the shared dedup-CC
    silver, so the pair pipeline is paid once per session across all
    clustering consumers; the pick rank runs hierarchically
    (hash-prefix shards, local_prune=m) so even a viral mega-family
    never funnels through one sorting task."""
    from presto_workload_analyzer_spark.extensions import sampling
    from presto_workload_analyzer_spark.driver_queries import (
        shared_dedup_clusters,
    )
    from presto_workload_analyzer_spark.sources import read_table

    docs = read_table(spark, f"{sf}/documents.parquet")
    cc = shared_dedup_clusters(spark, sf)
    return sampling.cluster_balanced_sample(docs, "doc_id", cc, m=_XS8_M).select(
        "doc_id", "cluster_id", "cluster_size", "pick_rank"
    )


def xs8_sql() -> str:
    from presto_workload_analyzer_spark.driver_queries import (
        _X02_BANDS,
        _X14_CC_SQL,
    )

    return (
        _X14_CC_SQL.format(bands=_X02_BANDS)
        + ", funi AS (SELECT doc_id AS fid,"
        "   coalesce(cc.cluster_id, doc_id) AS cluster_id"
        "  FROM documents LEFT JOIN cc ON cc.id = documents.doc_id),"
        " rr AS (SELECT fid, cluster_id,"
        "   CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT)"
        "    AS cluster_size,"
        "   CAST(row_number() OVER (PARTITION BY cluster_id"
        "    ORDER BY md5(CAST(fid AS VARCHAR)), fid) AS BIGINT) AS pick_rank"
        "  FROM funi)"
        " SELECT fid AS doc_id, cluster_id, cluster_size, pick_rank"
        f" FROM rr WHERE pick_rank <= {_XS8_M}"
    )


def xs10_gopher_rules(spark: SparkSession, sf: str) -> DataFrame:
    """The Gopher hard-filter rule battery (Rae et al. 2021, Table A1)
    over the documents corpus — the third published quality-filter SHAPE
    beside x08's weighted score and x43's logistic head: per document,
    every rule's measured value, its boolean flag, and the conjunction.
    On this synthetic corpus the discriminating rules are word count
    (docs span 10-99 tokens across the 50 boundary) and the 8-stopword
    requirement; the symbol/bullet/ellipsis/alpha rules hold uniformly
    (single-line, punctuation-free text) but are computed faithfully.
    Pure Column expressions — whole-stage codegen, no explode/join."""
    from presto_workload_analyzer_spark.extensions import textstats
    from presto_workload_analyzer_spark.sources import read_table

    docs = read_table(spark, f"{sf}/documents.parquet")
    return textstats.gopher_rules(docs, "doc_id", "text").withColumnRenamed(
        "id", "doc_id"
    )


def xs10_sql() -> str:
    bullets = " OR ".join(
        f"starts_with(trim(l), '{g}')" for g in ("•", "‣", "▶", "-", "*")
    )
    stops = " + ".join(
        f"CAST(list_contains(lt, '{w}') AS INT)"
        for w in ("the", "be", "to", "of", "and", "that", "have", "with")
    )
    return (
        "WITH base AS (SELECT doc_id, text,"
        "   string_split_regex(trim(text), '\\s+') AS toks,"
        "   string_split(text, chr(10)) AS lines,"
        "   list_transform(string_split_regex(trim(text), '\\s+'),"
        "    t -> lower(t)) AS lt"
        "  FROM documents),"
        " m AS (SELECT doc_id,"
        "   CAST(len(toks) AS BIGINT) AS n_words,"
        "   round(CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE)"
        "    / len(toks) + 1e-9, 6) AS mean_word_len,"
        "   round(CAST((len(text) - len(replace(text, '#', '')))"
        "    + (len(string_split(text, '...')) - 1) AS DOUBLE)"
        "    / len(toks) + 1e-9, 6) AS symbol_ratio,"
        f"   round(CAST(len(list_filter(lines, l -> {bullets})) AS DOUBLE)"
        "    / len(lines) + 1e-9, 6) AS bullet_frac,"
        "   round(CAST(len(list_filter(lines, l -> ends_with(trim(l), '...')"
        "    OR ends_with(trim(l), '…'))) AS DOUBLE)"
        "    / len(lines) + 1e-9, 6) AS ellipsis_frac,"
        "   round(CAST(len(list_filter(toks,"
        "    t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE)"
        "    / len(toks) + 1e-9, 6) AS alpha_word_frac,"
        f"   CAST({stops} AS BIGINT) AS n_stopwords"
        "  FROM base)"
        " SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,"
        "  ellipsis_frac, alpha_word_frac, n_stopwords,"
        "  (n_words >= 50 AND n_words <= 100000) AS ok_word_count,"
        "  (mean_word_len >= 3.0 AND mean_word_len <= 10.0)"
        "   AS ok_mean_word_len,"
        "  (symbol_ratio <= 0.1) AS ok_symbol_ratio,"
        "  (bullet_frac <= 0.9) AS ok_bullets,"
        "  (ellipsis_frac <= 0.3) AS ok_ellipsis,"
        "  (alpha_word_frac >= 0.8) AS ok_alpha_words,"
        "  (n_stopwords >= 2) AS ok_stopwords,"
        "  (n_words >= 50 AND n_words <= 100000"
        "   AND mean_word_len >= 3.0 AND mean_word_len <= 10.0"
        "   AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9"
        "   AND ellipsis_frac <= 0.3 AND alpha_word_frac >= 0.8"
        "   AND n_stopwords >= 2) AS keep"
        " FROM m"
    )


# Calibrated to the synthetic corpus: held-out per-doc perplexities sit
# in [28.9, 34.4] at the gate SFs; 30.21 bifurcates (26% kept at
# sf0.001, 29% at sf0.01) and the closest doc ppl is 0.0178 away — seven
# orders of magnitude above cross-engine exp/ln drift, and pinned by
# test_xs12_threshold_margin_on_corpus so a regenerated fixture fails
# loudly instead of flipping the keep flag sporadically.
_XS12_PPL_THRESHOLD = 30.21


def xs12_perplexity_filter(spark: SparkSession, sf: str) -> DataFrame:
    """The perplexity filter's KEEP decision at document grain — the
    filter xs7 diagnoses at source grain: fit the bigram LM on the
    reference slice (doc_id % 5 != 0), score every candidate doc
    (doc_id % 5 = 0), keep those under the ppl threshold. This is the
    published quality-filter loop (CCNet-style: reference LM ->
    candidate perplexity -> threshold) with this engine's exact-oracle
    discipline: the keep flag compares the ROUNDED perplexity so the
    boundary cannot flip across engines, and the threshold's distance
    to the corpus is margin-pinned by test."""
    from presto_workload_analyzer_spark.extensions import textstats
    from presto_workload_analyzer_spark.sources import read_table

    docs = read_table(spark, f"{sf}/documents.parquet")
    nll = textstats.heldout_bigram_nll(
        docs, "doc_id", "text", holdout=F.col("doc_id") % 5 == 0, lam=_XS7_LAM
    )
    ppl = F.round(F.exp(F.col("sum_nll") / F.col("n_scored")) + 1e-9, 6)
    return nll.select(
        F.col("id").alias("doc_id"),
        F.col("n_scored").alias("n_tokens"),
        ppl.alias("ppl"),
        (ppl < _XS12_PPL_THRESHOLD).alias("keep"),
    )


def xs12_sql() -> str:
    t = _XS12_PPL_THRESHOLD
    perdoc = xs7_sql().split(" SELECT source,")[0]
    return (
        perdoc
        + " SELECT id AS doc_id, CAST(ns AS BIGINT) AS n_tokens,"
        "  round(exp(snll / ns) + 1e-9, 6) AS ppl,"
        f"  (round(exp(snll / ns) + 1e-9, 6) < {t!r}) AS keep"
        " FROM perdoc"
    )


# Gopher Table A1 repetition thresholds for the implemented rules.
_XS11_THRESHOLDS = {
    "top2": 0.20, "top3": 0.18, "top4": 0.16, "dup5": 0.15, "dup10": 0.10,
}


def xs11_gopher_repetition(spark: SparkSession, sf: str) -> DataFrame:
    """The Gopher REPETITION battery (Rae et al. 2021, Table A1) — the
    within-document companion of xs10's rule battery: top-n-gram
    character fraction (n = 2, 3, 4) and positional duplicate-n-gram
    character coverage (family endpoints n = 5, 10), each with the
    paper's threshold flag and the keep conjunction. On this corpus the
    top-n rules discriminate (top2 spans 0.005-0.36 across the 0.20
    threshold); no doc repeats a 5-gram, so the dup rules hold uniformly
    but run the full positional-coverage kernel. Group-bys and
    equi-joins at (doc, gram) / (doc, position) grain — no window, no
    UDF (textstats.gopher_repetition)."""
    from presto_workload_analyzer_spark.extensions import textstats
    from presto_workload_analyzer_spark.sources import read_table

    docs = read_table(spark, f"{sf}/documents.parquet")
    out = textstats.gopher_repetition(docs, "doc_id", "text")
    flags = {
        f"ok_{k}": F.col(f"{k}_frac") <= t for k, t in _XS11_THRESHOLDS.items()
    }
    keep = None
    for c in flags.values():
        keep = c if keep is None else (keep & c)
    return out.select(
        F.col("id").alias("doc_id"),
        "top2_frac", "top3_frac", "top4_frac", "dup5_frac", "dup10_frac",
        *[c.alias(n) for n, c in flags.items()],
        keep.alias("keep"),
    )


def xs11_sql() -> str:
    th = _XS11_THRESHOLDS

    def top_cte(n: int) -> str:
        return (
            f" g{n} AS (SELECT id, array_to_string(toks[i:i+{n - 1}], ' ') AS g"
            f"  FROM base, UNNEST(range(1, greatest(len(toks)-{n - 1}, 0)+1))"
            "   AS t(i)),"
            f" c{n} AS (SELECT id, g, count(*) AS c FROM g{n} GROUP BY 1, 2),"
            f" t{n} AS (SELECT id, c, len(g) - {n - 1} AS glen FROM"
            f"  (SELECT *, row_number() OVER (PARTITION BY id"
            f"    ORDER BY c DESC, g) AS rn FROM c{n}) r WHERE rn = 1),"
        )

    def dup_cte(n: int) -> str:
        return (
            f" gi{n} AS (SELECT id, i, array_to_string(toks[i:i+{n - 1}], ' ')"
            "   AS g"
            f"  FROM base, UNNEST(range(1, greatest(len(toks)-{n - 1}, 0)+1))"
            "   AS t(i)),"
            f" d{n} AS (SELECT id, g FROM gi{n} GROUP BY 1, 2"
            "   HAVING count(*) >= 2),"
            f" cov{n} AS (SELECT DISTINCT id, i + o AS tp"
            f"  FROM gi{n} JOIN d{n} USING (id, g),"
            f"   UNNEST(range(0, {n})) AS u(o)),"
            f" cc{n} AS (SELECT id, sum(tl) AS cc"
            f"  FROM cov{n} JOIN tk USING (id, tp) GROUP BY 1),"
        )

    frac = "round(coalesce(1.0 * {num} / chars, 0.0) + 1e-9, 6)"
    tops = {n: frac.format(num=f"t{n}.c * t{n}.glen") for n in (2, 3, 4)}
    dups = {n: frac.format(num=f"cc{n}.cc") for n in (5, 10)}
    flags = (
        f"(top2_frac <= {th['top2']!r}) AS ok_top2,"
        f" (top3_frac <= {th['top3']!r}) AS ok_top3,"
        f" (top4_frac <= {th['top4']!r}) AS ok_top4,"
        f" (dup5_frac <= {th['dup5']!r}) AS ok_dup5,"
        f" (dup10_frac <= {th['dup10']!r}) AS ok_dup10,"
        f" (top2_frac <= {th['top2']!r} AND top3_frac <= {th['top3']!r}"
        f"  AND top4_frac <= {th['top4']!r} AND dup5_frac <= {th['dup5']!r}"
        f"  AND dup10_frac <= {th['dup10']!r}) AS keep"
    )
    return (
        "WITH base AS (SELECT doc_id AS id,"
        "   list_transform(string_split_regex(trim(text), '\\s+'),"
        "    t -> lower(t)) AS toks"
        "  FROM documents),"
        " tot AS (SELECT id, CAST(list_sum(list_transform(toks, t -> len(t)))"
        "   AS BIGINT) AS chars FROM base),"
        " tk AS (SELECT id, i AS tp, len(toks[i]) AS tl"
        "  FROM base, UNNEST(range(1, len(toks)+1)) AS t(i)),"
        + top_cte(2) + top_cte(3) + top_cte(4) + dup_cte(5) + dup_cte(10)
        + " m AS (SELECT tot.id AS doc_id,"
        f"  {tops[2]} AS top2_frac, {tops[3]} AS top3_frac,"
        f"  {tops[4]} AS top4_frac,"
        f"  {dups[5]} AS dup5_frac, {dups[10]} AS dup10_frac"
        "  FROM tot"
        "  LEFT JOIN t2 ON t2.id = tot.id LEFT JOIN t3 ON t3.id = tot.id"
        "  LEFT JOIN t4 ON t4.id = tot.id LEFT JOIN cc5 ON cc5.id = tot.id"
        "  LEFT JOIN cc10 ON cc10.id = tot.id)"
        f" SELECT doc_id, top2_frac, top3_frac, top4_frac, dup5_frac,"
        f"  dup10_frac, {flags} FROM m"
    )


def s18_stream_quality_gate(spark: SparkSession, sf: str) -> DataFrame:
    """The Gopher rule battery running UNCHANGED on the ingestion
    stream — the production shape of a quality filter (documents arrive
    continuously; gating them at ingest avoids a second corpus pass).
    gopher_rules is pure stateless Column expressions, so the streaming
    plan is a map over micro-batches: no state store, no watermark,
    exactly-once trivially (same row in = same flags out, any batching).
    Drained via the availableNow memory sink like every s-query's test
    harness; the production sink is the foreachBatch parquet path
    (streaming/ingest.py). Oracle: identical to xs10's — a stateless
    stream drain IS the batch result."""
    import uuid

    from presto_workload_analyzer_spark.extensions import textstats
    from presto_workload_analyzer_spark.streaming import (
        run_to_memory,
        stream_sf_table,
    )

    docs = stream_sf_table(spark, sf, "documents")
    gated = textstats.gopher_rules(docs, "doc_id", "text").withColumnRenamed(
        "id", "doc_id"
    )
    name = f"s18_mem_{uuid.uuid4().hex[:8]}"
    q = run_to_memory(gated, name, output_mode="append")
    q.awaitTermination(300)
    tbl = spark.table(name)
    return spark.createDataFrame(tbl.collect(), tbl.schema)


_XS13_K = 5


def xs13_dsir_resample(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR's RESAMPLING step, end-to-end: the importance weights xs2
    computes are only useful once they select a corpus, and the
    published recipe is importance resampling — draw documents with
    probability tied to their target-likeness. Deterministic
    formulation: Efraimidis-Spirakis A-ES keys ln(u) / w with
    w = exp(log_w / n_tokens) (the per-token-normalized importance the
    dsir_log_weights docstring prescribes) and a 24-bit md5-derived u
    (x99's hash-replaces-RNG trick, salt 'dsir|'), top K=5 per source —
    source-balanced importance resampling, the mixing-aware variant of
    a global draw. The per-source top-K runs hierarchically (x99's
    range-sharded rank, local_prune=K); everything upstream is xs2's
    broadcast-ratio scoring pass."""
    from presto_workload_analyzer_spark.extensions import sampling
    from presto_workload_analyzer_spark.sources import read_table

    docs = read_table(spark, f"{sf}/documents.parquet")
    target = docs.filter(F.col("doc_id") % 10 == 0)
    dw = sampling.dsir_log_weights(docs, target, "doc_id", "text", mode="md5")
    keyed = dw.join(docs.select("doc_id", "source"), "doc_id").select(
        "source",
        "doc_id",
        "n_tokens",
        "log_w",
        (
            F.log(
                (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit("dsir|"),
                                    F.col("doc_id").cast("string"),
                                )
                            ),
                            1,
                            6,
                        ),
                        16,
                        10,
                    ).cast("double")
                    + 0.5
                )
                / F.lit(16777216.0)
            )
            / F.exp(F.col("log_w") / F.col("n_tokens"))
        ).alias("__key"),
    )
    ranked = sampling._hierarchical_row_number(
        keyed,
        ["source"],
        [F.col("__key").desc(), F.col("doc_id")],
        F.floor(-F.col("__key") * 1024).cast("long"),
        "__rk",
        local_prune=F.lit(_XS13_K),
    )
    return ranked.filter(F.col("__rk") <= _XS13_K).select(
        "source",
        "doc_id",
        "n_tokens",
        "log_w",
        F.col("__rk").cast("long").alias("sample_rank"),
    )


def xs13_sql() -> str:
    from presto_workload_analyzer_spark.driver_queries import _xs2_sql

    u24 = (
        "(((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 1048576"
        " + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 65536"
        " + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 4096"
        " + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) * 256"
        " + (strpos('0123456789abcdef', substr(h, 5, 1)) - 1) * 16"
        " + (strpos('0123456789abcdef', substr(h, 6, 1)) - 1) * 1) + 0.5)"
    )
    return (
        "WITH dw AS (" + _xs2_sql() + "),"
        " b AS (SELECT d.source, dw.doc_id, dw.n_tokens, dw.log_w,"
        "   md5('dsir|' || CAST(dw.doc_id AS VARCHAR)) AS h"
        "  FROM dw JOIN documents d USING (doc_id)),"
        f" k AS (SELECT source, doc_id, n_tokens, log_w, ln({u24}"
        "    / 16777216.0) / exp(log_w / n_tokens) AS key FROM b),"
        " r AS (SELECT source, doc_id, n_tokens, log_w,"
        "   row_number() OVER (PARTITION BY source"
        "    ORDER BY key DESC, doc_id) AS rk FROM k)"
        " SELECT source, doc_id, n_tokens, log_w,"
        "  CAST(rk AS BIGINT) AS sample_rank"
        f" FROM r WHERE rk <= {_XS13_K}"
    )


STAGED: dict[str, tuple] = {
    "xs6_unimax_mix": (xs6_unimax_mix, xs6_sql()),
    "xs7_heldout_perplexity": (xs7_heldout_perplexity, xs7_sql()),
    "xs8_cluster_balanced_sample": (xs8_cluster_balanced_sample, xs8_sql()),
    "xs9_temperature_mix": (xs9_temperature_mix, xs9_sql()),
    "xs10_gopher_rules": (xs10_gopher_rules, xs10_sql()),
    "xs11_gopher_repetition": (xs11_gopher_repetition, xs11_sql()),
    "xs12_perplexity_filter": (xs12_perplexity_filter, xs12_sql()),
    "s18_stream_quality_gate": (s18_stream_quality_gate, xs10_sql()),
    "xs13_dsir_resample": (xs13_dsir_resample, xs13_sql()),
}
