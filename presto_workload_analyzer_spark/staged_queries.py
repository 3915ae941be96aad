"""STAGED driver queries — implemented, oracle-paired, locally verified,
NOT yet registered.

The staging cadence (proven over rounds 7-11): implement the operator in
extensions/, pair it with an exact DuckDB oracle here, get
tests/test_staged_queries.py green at BOTH sf0.001 and sf0.01 (the same
spark-vs-DuckDB compare the local gate applies to registered queries,
plus the plan lint's core bans and the oracle dtype ban), then register
next round by moving the (name, fn, sql) triple into
driver_queries._register — a move, not a debugging session.

Rounds 7-8 staged xs1-xs5 (registered round 9, registry 222 -> 227);
round 10 staged xs6-xs13 + s18 (registered round 11, registry
227 -> 236). This module stages the xs14+ batch (round-10 verdict item
4) — the remaining published corpus-cleaning shapes plus a retrieval
scorer:

  * xs14_c4_line_filters  — the C4 line-level cleaning battery (Raffel
                            et al. 2020 §2.2: terminal-punctuation line
                            keep, >= 3-word line, 'javascript' line
                            drop; page-grain lorem-ipsum / curly-brace
                            / >= 5-kept-lines rules) — the line-grain
                            companion of xs10's doc-grain Gopher set.
  * xs15_ccnet_line_dedup — CCNet-style cross-document duplicated-LINE
                            removal (Wenzek et al. 2020 §3.1): hash
                            every line corpus-wide, keep the globally
                            first occurrence of each duplicated line —
                            the line-grain twin of x47's k-gram spans,
                            with a byte-exact cleaned-doc md5 witness.
  * xs16_bm25_scores      — Okapi BM25 scores against a fixed query
                            (retrieval-based data selection; the
                            lexical twin of the embedding selectors).
  * xs17_bfd_packing      — Best-Fit-Decreasing sequence packing (Ding
                            et al. 2024), the packing-quality upgrade
                            of x39's running-total bins; the sequential
                            walk is shard-bounded and its exact DuckDB
                            twin replays every decision with a
                            recursive CTE. Registration note: the plan
                            is a declared Arrow surface
                            (FlatMapGroupsInPandas) — add the name to
                            tests/test_plan_lint._ALLOWED_PANDAS.
  * xs18_curation_mix_chain — composition capstone for the round-11
                            operators (the x51/x146 pattern): dedup
                            survivors (x14 CC keep-min) ∧ C4 page keep
                            (xs14's battery + synthesis) -> per-source
                            token totals -> UniMax allocations (xs6's
                            closed form), ONE plan, so contract drift
                            between the new operators is hash-caught.
  * xs19_dup_weighted_sampling — removal-free ("soft") dedup: sampling
                            weight 1/|dup cluster| over the x14
                            components, so each duplicate FAMILY
                            contributes one unit of expected mass —
                            the reweight alternative beside keep-one
                            (x15) and keep-best (x59).
  * s19_stream_line_dedup — xs15's production INGEST shape: incoming
                            documents' lines left-join the STATIC
                            corpus line-digest table (stateless
                            stream-static join, no state store /
                            watermark — s10's shape at line grain),
                            flagging boilerplate lines already known
                            to the corpus at arrival time.
  * s20_stream_curated_source_stats — stream-static join FOLLOWED BY a
                            stateful aggregation in one streaming plan
                            (a state-machine composition no other
                            s-query covers: s19 is join-only, s10
                            aggregates the raw stream): novel-line
                            counts and token mass per source, the
                            running mixing-denominator a continuous
                            curation pipeline feeds to its planner.

Line grain on this corpus: the synthetic documents are single-line, so
xs14/xs15 first RECONSTRUCT a deterministic multi-line document from
each doc's own tokens (8-token lines; xs14 additionally injects the
paper's trigger markers and terminal punctuation on doc_id/line-index
arithmetic) — the xs4 precedent (synthesized AVI payloads), replayed
identically in the oracle, so the rules genuinely discriminate instead
of holding uniformly: at sf0.01 the C4 page filter keeps 245/500 docs
(n_kept_lines spans 1-9 across the >= 5 boundary, 14 lorem docs, 22
curly docs), and the line dedup drops 328 occurrences of 153
corpus-duplicated lines that exist in the RAW corpus (template
families align at 8-token boundaries) — no injection needed there.

Registration checklist for each entry:
  * move (name, fn, sql) into driver_queries._register;
  * if the plan uses a declared Arrow surface (mapInPandas etc.), add the
    name to tests/test_plan_lint._ALLOWED_PANDAS — this batch is pure
    Column/join plans and needs no exemption;
  * column names aliased identically on both sides, integer aggregates
    cast to BIGINT, floats rounded to 6 after scaling, no
    HUGEINT/DECIMAL/UHUGEINT anywhere in the oracle's DESCRIBE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

# Shared 8-token line grain for the xs14/xs15 reconstruction.
_LINE_WIDTH = 8


def _chunk_lines(markers: bool) -> Column:
    """doc text -> array of 8-token lines, optionally with the C4 trigger
    markers ('lorem ipsum ' prefix on line 0 of doc_id%37==0 docs, ' {'
    on line 1 of %23 docs, ' javascript' on line 2 of %29 docs) and the
    deterministic terminal '.' on lines with (doc_id + i) % 3 != 0 —
    arithmetic on (doc_id, line index) only, replayed verbatim in SQL."""
    from presto_workload_analyzer_spark.extensions import textstats

    toks = textstats.tokens("text")
    n_lines = F.ceil(F.size(toks) / F.lit(float(_LINE_WIDTH)))
    did = F.col("doc_id")

    def line(i: Column) -> Column:
        core = F.array_join(F.slice(toks, i * _LINE_WIDTH + 1, _LINE_WIDTH), " ")
        if markers:
            core = F.when(
                (did % 37 == 0) & (i == 0), F.concat(F.lit("lorem ipsum "), core)
            ).otherwise(core)
            core = F.when(
                (did % 23 == 0) & (i == 1), F.concat(core, F.lit(" {"))
            ).otherwise(core)
            core = F.when(
                (did % 29 == 0) & (i == 2), F.concat(core, F.lit(" javascript"))
            ).otherwise(core)
            core = F.when(
                ((did + i) % 3) != 0, F.concat(core, F.lit("."))
            ).otherwise(core)
        return core

    return F.transform(F.sequence(F.lit(0), (n_lines - 1).cast("long")), line)


def _chunk_lines_sql(markers: bool) -> str:
    inj = (
        "(CASE WHEN doc_id % 37 = 0 AND i = 0 THEN 'lorem ipsum ' ELSE '' END)"
        " || {core}"
        " || (CASE WHEN doc_id % 23 = 0 AND i = 1 THEN ' {{' ELSE '' END)"
        " || (CASE WHEN doc_id % 29 = 0 AND i = 2 THEN ' javascript' ELSE '' END)"
        " || (CASE WHEN (doc_id + i) % 3 <> 0 THEN '.' ELSE '' END)"
        if markers
        else "{core}"
    )
    w = _LINE_WIDTH
    expr = inj.format(core=f"array_to_string(toks[{w}*i+1:{w}*i+{w}], ' ')")
    return (
        "WITH t AS (SELECT doc_id,"
        "   string_split_regex(trim(text), '\\s+') AS toks FROM documents),"
        " ln AS (SELECT doc_id,"
        f"   list_transform(range(0, CAST(ceil(len(toks)/{float(w)!r})"
        f"    AS BIGINT)), i -> {expr}) AS lines"
        "  FROM t)"
    )


def xs14_c4_line_filters(spark: SparkSession, sf: str) -> DataFrame:
    """The C4 line-level cleaning battery (Raffel et al. 2020, §2.2) over
    the reconstructed multi-line corpus — the line-grain companion of
    xs10's doc-grain Gopher battery: C4 cleans INSIDE a page (terminal-
    punctuation line keep, >= 3-word line, 'javascript' line drop)
    before judging the page (>= 5 kept lines, no 'lorem ipsum', no curly
    brace). Line reconstruction + marker injection are deterministic
    doc_id/line-index arithmetic (_chunk_lines docstring), replayed
    verbatim in the oracle; the battery itself is
    textstats.c4_line_stats — pure Column expressions, no explode, no
    join, whole-stage codegen at scan speed."""
    from presto_workload_analyzer_spark.extensions import textstats
    from presto_workload_analyzer_spark.sources import read_table

    docs = read_table(spark, f"{sf}/documents.parquet")
    synth = docs.select(
        "doc_id", F.array_join(_chunk_lines(markers=True), "\n").alias("text")
    )
    return textstats.c4_line_stats(synth, "doc_id", "text").withColumnRenamed(
        "id", "doc_id"
    )


def xs14_sql() -> str:
    term = " OR ".join(
        f"ends_with(trim(l), '{p}')" for p in (".", "!", "?")
    ) + " OR ends_with(trim(l), '\"')"
    return (
        _chunk_lines_sql(markers=True)
        + ", d2 AS (SELECT doc_id, array_to_string(lines, chr(10)) AS text2"
        "   FROM ln),"
        " m AS (SELECT doc_id, string_split(text2, chr(10)) AS ls, text2"
        "   FROM d2),"
        " k AS (SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_lines,"
        f"   CAST(len(list_filter(ls, l -> ({term})"
        "     AND len(string_split_regex(trim(l), '\\s+')) >= 3"
        "     AND NOT contains(lower(l), 'javascript'))) AS BIGINT)"
        "    AS n_kept_lines,"
        "   contains(lower(text2), 'lorem ipsum') AS has_lorem_ipsum,"
        "   contains(text2, '{') AS has_curly_brace"
        "  FROM m)"
        " SELECT doc_id, n_lines, n_kept_lines,"
        "  round(CAST(n_kept_lines AS DOUBLE) / n_lines + 1e-9, 6)"
        "   AS kept_frac,"
        "  has_lorem_ipsum, has_curly_brace,"
        "  (n_kept_lines >= 5) AS ok_min_lines,"
        "  (n_kept_lines >= 5 AND NOT has_lorem_ipsum AND NOT has_curly_brace)"
        "   AS keep"
        " FROM k"
    )


def xs15_ccnet_line_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet-style cross-document duplicated-LINE removal (Wenzek et al.
    2020, §3.1) over the reconstructed 8-token-line corpus — NO marker
    injection here: the raw corpus's template families align at 8-token
    boundaries, so 153 genuinely duplicated lines (328 occurrences at
    sf0.01) exist without any synthesis beyond the chunking. Keeps the
    globally first occurrence of each duplicated line, passes unique
    lines through, and emits a byte-exact md5 witness of each cleaned
    document (dedup.duplicated_line_removal docstring has the 100 TB
    shuffle-shape audit: one line-digest-grain shuffle + a digest-grain
    canonical table, no window)."""
    from presto_workload_analyzer_spark.extensions import dedup
    from presto_workload_analyzer_spark.sources import read_table

    docs = read_table(spark, f"{sf}/documents.parquet")
    synth = docs.select(
        "doc_id", F.array_join(_chunk_lines(markers=False), "\n").alias("text")
    )
    return dedup.duplicated_line_removal(synth, "doc_id", "text").withColumnRenamed(
        "id", "doc_id"
    )


def xs15_sql() -> str:
    return (
        _chunk_lines_sql(markers=False)
        + ", l AS (SELECT doc_id, i, lines[i+1] AS line"
        "   FROM ln, UNNEST(range(0, len(lines))) AS u(i)),"
        " h AS (SELECT doc_id, i, line, md5(line) AS dig FROM l),"
        " g1 AS (SELECT dig, count(*) AS df, min(doc_id) AS m_doc FROM h"
        "   GROUP BY 1),"
        " g2 AS (SELECT dig, min(i) AS m_idx FROM h JOIN g1 USING (dig)"
        "   WHERE h.doc_id = g1.m_doc GROUP BY 1),"
        " k AS (SELECT doc_id, i, line,"
        "   (df = 1 OR (doc_id = m_doc AND i = m_idx)) AS keep"
        "  FROM h JOIN g1 USING (dig) JOIN g2 USING (dig))"
        " SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,"
        "  CAST(sum(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,"
        "  round(sum(CASE WHEN keep THEN 1.0 ELSE 0.0 END) / count(*)"
        "   + 1e-9, 6) AS kept_frac,"
        "  md5(coalesce(string_agg(CASE WHEN keep THEN line END, chr(10)"
        "   ORDER BY i), '')) AS cleaned_digest"
        " FROM k GROUP BY 1"
    )


# Query-term set for the BM25 gate: three high-frequency corpus words
# with very different document frequencies, so idf and tf both move the
# ranking; k1/b are the textbook Okapi defaults.
_XS16_TERMS = ("spark", "join", "filter")
_XS16_K1 = 1.2
_XS16_B = 0.75


def xs16_bm25_scores(spark: SparkSession, sf: str) -> DataFrame:
    """Okapi BM25 document scores for a fixed query — retrieval-based
    data selection (score the corpus against a target description, keep
    the top of the ranking): the lexical twin of the embedding-cosine
    selectors (x06 etc.) and the retrieval-grade upgrade of the tf-idf
    statistics (x110). textstats.bm25_scores: the exploded token stream
    is filtered to the query vocabulary BEFORE the (id, term) groupBy,
    df is query-term-grain broadcast, N/avgdl one broadcast row."""
    from presto_workload_analyzer_spark.extensions import textstats
    from presto_workload_analyzer_spark.sources import read_table

    docs = read_table(spark, f"{sf}/documents.parquet")
    return textstats.bm25_scores(
        docs, "doc_id", "text", _XS16_TERMS, k1=_XS16_K1, b=_XS16_B
    ).withColumnRenamed("id", "doc_id")


def xs16_sql() -> str:
    k1, b = _XS16_K1, _XS16_B
    terms = ", ".join(f"'{t}'" for t in _XS16_TERMS)
    return (
        "WITH t AS (SELECT doc_id,"
        "   list_transform(string_split_regex(trim(text), '\\s+'),"
        "    w -> lower(w)) AS toks FROM documents),"
        " dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t),"
        " s AS (SELECT CAST(count(*) AS DOUBLE) AS n,"
        "   avg(dl) AS avgdl FROM dl),"
        " tf AS (SELECT doc_id, w AS term, CAST(count(*) AS BIGINT) AS tf"
        "  FROM (SELECT doc_id, unnest(toks) AS w FROM t) u"
        f"  WHERE w IN ({terms}) GROUP BY 1, 2),"
        " dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf"
        "   GROUP BY 1),"
        " sc AS (SELECT doc_id,"
        "   ln(1.0 + (n - df + 0.5) / (df + 0.5))"
        f"   * tf * {k1 + 1.0!r}"
        f"   / (tf + {k1!r} * ({1.0 - b!r} + {b!r} * dl / avgdl)) AS sco"
        "  FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id), s)"
        " SELECT doc_id, round(sum(sco) + 1e-9, 6) AS bm25"
        " FROM sc GROUP BY 1"
    )

# Calibrated to the synthetic corpus: budget 200 over 8-token docs of
# 10-99 tokens makes best-fit genuinely diverge from first-fit (8 of 40
# (source, shard) groups at sf0.001, 4 of 40 at sf0.01 assign at least
# one doc differently), so the gate hashes the BEST-fit decision rule,
# not just any greedy packing; max 5 bins per group keeps the oracle's
# recursive walk shallow.
_XS17_BUDGET = 200
_XS17_SHARD = 256


def xs17_bfd_packing(spark: SparkSession, sf: str) -> DataFrame:
    """Best-Fit-Decreasing sequence packing over the documents corpus
    (Ding et al. 2024, "Fewer Truncations Improve Language Modeling"):
    items in (size DESC, id ASC) order, each into the open bin with the
    smallest remaining capacity that fits, ties to the lowest bin index
    — the packing-QUALITY upgrade of x39's greedy running-total bins
    (fewer bins, less padding, no truncation). Sequential by nature, so
    the kernel packs within (source, doc_id-range shard) groups — the
    published group-bounded practice and x39's exact shard split — via
    one Arrow applyInPandas with a bisect-sorted open-bin list
    (textstats.best_fit_decreasing_pack docstring has the 100 TB
    posture). The oracle replays every decision with a recursive CTE."""
    from presto_workload_analyzer_spark.extensions import textstats
    from presto_workload_analyzer_spark.sources import read_table

    docs = read_table(spark, f"{sf}/documents.parquet")
    sized = docs.select(
        "source", "doc_id", textstats.token_count("text").cast("long").alias("sz")
    )
    out = textstats.best_fit_decreasing_pack(
        sized, "source", "doc_id", "sz",
        budget=_XS17_BUDGET, shard_size=_XS17_SHARD,
    )
    return out.select(
        F.col("part").alias("source"),
        "shard",
        F.col("id").alias("doc_id"),
        F.col("size").alias("n_tokens"),
        "bin",
    )


def xs17_sql() -> str:
    b, sh = _XS17_BUDGET, _XS17_SHARD
    return (
        "WITH RECURSIVE sized AS ("
        f"  SELECT source, doc_id, CAST(doc_id // {sh} AS BIGINT) AS shard,"
        "    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS sz"
        "  FROM documents),"
        " items AS ("
        "  SELECT source, shard, doc_id, sz,"
        "    row_number() OVER (PARTITION BY source, shard"
        "     ORDER BY sz DESC, doc_id) AS rk"
        "  FROM sized),"
        " grp AS (SELECT source, shard, CAST(max(rk) AS BIGINT) AS m"
        "   FROM items GROUP BY 1, 2),"
        " walk AS ("
        "  SELECT source, shard, CAST(0 AS BIGINT) AS step,"
        "    CAST([] AS BIGINT[]) AS bins, CAST([] AS BIGINT[]) AS asg"
        "  FROM grp"
        "  UNION ALL"
        "  SELECT w.source, w.shard, w.step + 1,"
        f"    CASE WHEN fitrem IS NULL THEN list_append(w.bins, {b} - i.sz)"
        "      ELSE list_transform(range(1, len(w.bins) + 1),"
        "        j -> CASE WHEN j = list_position(w.bins, fitrem)"
        "             THEN w.bins[j] - i.sz ELSE w.bins[j] END) END,"
        "    list_append(w.asg, CASE WHEN fitrem IS NULL"
        "      THEN CAST(len(w.bins) AS BIGINT)"
        "      ELSE CAST(list_position(w.bins, fitrem) - 1 AS BIGINT) END)"
        "  FROM walk w"
        "  JOIN items i ON i.source = w.source AND i.shard = w.shard"
        "   AND i.rk = w.step + 1"
        "  CROSS JOIN LATERAL (SELECT list_min(list_filter(w.bins,"
        "    r -> r >= i.sz)) AS fitrem) f"
        " ),"
        " fin AS (SELECT w.source, w.shard, w.asg FROM walk w JOIN grp g"
        "   ON g.source = w.source AND g.shard = w.shard AND w.step = g.m)"
        " SELECT i.source, i.shard, i.doc_id, i.sz AS n_tokens,"
        "  CAST(f.asg[i.rk] AS BIGINT) AS bin"
        " FROM items i JOIN fin f"
        "  ON f.source = i.source AND f.shard = i.shard"
    )




# Calibrated to the synthetic corpus: after the dedup + C4 gates the
# surviving per-source token totals sit at ~500-1400 (gate SFs); with
# epoch cap 1.0 a 14k budget caps 4 of 20 sources at BOTH gate SFs
# (min |L_i - B| = 71 tokens at sf0.001, 693 at sf0.01 — exact-integer
# L_i in double, so the strict < threshold cannot flip); at sf0.1
# nothing caps (sources ~10x bigger): pure uniform split.
_XS18_BUDGET = 14_000.0
_XS18_EPOCH_CAP = 1.0


def xs18_curation_mix_chain(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end CURATION -> MIXING chain over the round-11 operators —
    the composition-capstone pattern (x51 curation, x126 serving, x146
    privacy): minhash-CC dedup survivors (keep the min-id exemplar per
    x14 duplicate cluster, via the shared CC silver) intersected with
    the C4 page keep (xs14's line battery over the reconstructed
    multi-line corpus), rolled up to per-source token totals of the
    ORIGINAL text, then UniMax epoch-capped allocations (xs6's closed
    form) over the surviving corpus — the actual decision sequence a
    pretraining data pipeline runs, chained as ONE plan so contract
    drift between the dedup, quality and mixing operators (id/keep
    column shapes, survivor semantics, allocation arithmetic) is a hash
    mismatch, not a silent skew. Oracle replays every stage."""
    from presto_workload_analyzer_spark.driver_queries import (
        shared_dedup_clusters,
    )
    from presto_workload_analyzer_spark.extensions import sampling, textstats
    from presto_workload_analyzer_spark.sources import read_table

    docs = read_table(spark, f"{sf}/documents.parquet")
    cc = shared_dedup_clusters(spark, sf)
    losers = cc.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias("doc_id")
    )
    synth = docs.select(
        "doc_id", F.array_join(_chunk_lines(markers=True), "\n").alias("text")
    )
    quality = (
        textstats.c4_line_stats(synth, "doc_id", "text")
        .filter(F.col("keep"))
        .select(F.col("id").alias("doc_id"))
    )
    surv = (
        docs.join(losers, "doc_id", "left_anti")
        .join(quality, "doc_id")
        .groupBy("source")
        .agg(F.sum(textstats.token_count("text").cast("long")).alias("__tok"))
    )
    return sampling.unimax_mix(
        surv, "source", "__tok", budget=_XS18_BUDGET, epoch_cap=_XS18_EPOCH_CAP
    )


def xs18_sql() -> str:
    from presto_workload_analyzer_spark.driver_queries import (
        _X02_BANDS,
        _X14_CC_SQL,
    )

    b, e = _XS18_BUDGET, _XS18_EPOCH_CAP
    return (
        _X14_CC_SQL.format(bands=_X02_BANDS)
        + ", c4 AS (" + xs14_sql() + "),"
        " per AS (SELECT d.source,"
        "   CAST(sum(len(string_split_regex(trim(d.text), '\\s+'))) AS BIGINT)"
        "    AS t"
        "  FROM documents d JOIN c4 ON c4.doc_id = d.doc_id AND c4.keep"
        "  WHERE d.doc_id NOT IN (SELECT id FROM cc WHERE id <> cluster_id)"
        "  GROUP BY 1),"
        " r AS (SELECT source, t,"
        "   CAST(count(*) OVER (ORDER BY t, source) AS BIGINT) AS rnk,"
        "   CAST(sum(t) OVER (ORDER BY t, source) AS BIGINT) AS cum_le,"
        "   CAST(count(*) OVER () AS BIGINT) AS n"
        "  FROM per),"
        f" cx AS (SELECT *, {e!r} * (t * (n - rnk + 1) + (cum_le - t)) < {b!r}"
        "    AS capped FROM r),"
        " g AS (SELECT CAST(sum(CASE WHEN capped THEN t ELSE 0 END) AS BIGINT)"
        "    AS ct,"
        "   CAST(sum(CASE WHEN capped THEN 1 ELSE 0 END) AS BIGINT) AS nc"
        "  FROM cx)"
        " SELECT source, t AS tokens_available, capped,"
        f"  round(CASE WHEN capped THEN {e!r} * t"
        f"   ELSE ({b!r} - {e!r} * ct) / (n - nc) END + 1e-9, 6)"
        "   AS tokens_allocated,"
        f"  round((CASE WHEN capped THEN {e!r} * t"
        f"   ELSE ({b!r} - {e!r} * ct) / (n - nc) END) / t + 1e-9, 6) AS epochs"
        " FROM cx, g"
    )


def xs19_dup_weighted_sampling(spark: SparkSession, sf: str) -> DataFrame:
    """Removal-free ("soft") deduplication: instead of DROPPING a
    duplicate family's non-canonical members (x15) or keeping the best
    one (x59), give every member sampling weight 1 / |cluster| so each
    duplicate FAMILY contributes exactly one unit of expected training
    mass — the down-weight-don't-delete trade published for pretraining
    corpora (soft dedup: reweighting preserves coverage of duplicated
    content while removing its frequency advantage). Singletons weigh
    1.0; weights within a family are uniform over the x14 minhash-CC
    clusters (the shared CC silver — the same component definition every
    other dedup consumer uses, so the three strategies compose). Output:
    (doc_id, cluster_id, cluster_size, weight)."""
    from presto_workload_analyzer_spark.driver_queries import (
        shared_dedup_clusters,
    )
    from presto_workload_analyzer_spark.sources import read_table

    docs = read_table(spark, f"{sf}/documents.parquet")
    cc = shared_dedup_clusters(spark, sf)
    mem = docs.select("doc_id").join(
        cc.select(F.col("id").alias("doc_id"), "cluster_id"), "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
    )
    size = mem.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return mem.join(size, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        F.round(F.lit(1.0) / F.col("cluster_size") + 1e-9, 6).alias("weight"),
    )


def xs19_sql() -> str:
    from presto_workload_analyzer_spark.driver_queries import (
        _X02_BANDS,
        _X14_CC_SQL,
    )

    return (
        _X14_CC_SQL.format(bands=_X02_BANDS)
        + ", mem AS (SELECT doc_id,"
        "   coalesce(cc.cluster_id, doc_id) AS cluster_id"
        "  FROM documents LEFT JOIN cc ON cc.id = documents.doc_id),"
        " sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size"
        "  FROM mem GROUP BY 1)"
        " SELECT doc_id, cluster_id, cluster_size,"
        "  round(1.0 / cluster_size + 1e-9, 6) AS weight"
        " FROM mem JOIN sz USING (cluster_id)"
    )


def s19_stream_line_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Duplicated-line removal at INGEST time — the streaming production
    shape of xs15 (CCNet dedups new shards against the existing corpus):
    each arriving document's lines (the deterministic 8-token chunking)
    left-join the STATIC corpus line-digest table, and a line whose
    digest the corpus already holds is flagged dropped on arrival. A
    stream-static join is stateless (no state store, no watermark; the
    static side re-plans per micro-batch, picking up corpus updates for
    free — s10's shape, here at line grain with the digest as the join
    key). Split: even doc_ids play the existing corpus, odd doc_ids play
    the arriving stream (83 of 1,859 arriving lines hit the corpus at
    sf0.01 — the decision genuinely bifurcates). Oracle: the identical
    batch join."""
    import uuid

    from presto_workload_analyzer_spark.sources import read_table
    from presto_workload_analyzer_spark.streaming import (
        run_to_memory,
        stream_sf_table,
    )

    corpus = (
        read_table(spark, f"{sf}/documents.parquet")
        .filter(F.col("doc_id") % 2 == 0)
        .select(F.explode(_chunk_lines(markers=False)).alias("__line"))
        .select(F.md5("__line").alias("dig"))
        .distinct()
        .withColumn("__hit", F.lit(True))
    )
    incoming = (
        stream_sf_table(spark, sf, "documents")
        .filter(F.col("doc_id") % 2 == 1)
        .select(
            "doc_id",
            F.posexplode(_chunk_lines(markers=False)).alias("idx", "__line"),
        )
        .select(
            "doc_id",
            F.col("idx").cast("long").alias("line_idx"),
            F.md5("__line").alias("dig"),
        )
    )
    flagged = incoming.join(corpus, "dig", "left").select(
        "doc_id",
        "line_idx",
        "dig",
        F.coalesce(F.col("__hit"), F.lit(False)).alias("dropped"),
    )
    name = f"s19_mem_{uuid.uuid4().hex[:8]}"
    q = run_to_memory(flagged, name, output_mode="append")
    q.awaitTermination(300)
    tbl = spark.table(name)
    return spark.createDataFrame(tbl.collect(), tbl.schema)


def s19_sql() -> str:
    return (
        _chunk_lines_sql(markers=False)
        + ", l AS (SELECT doc_id, CAST(i AS BIGINT) AS line_idx,"
        "   md5(lines[i+1]) AS dig"
        "  FROM ln, UNNEST(range(0, len(lines))) AS u(i)),"
        " corpus AS (SELECT DISTINCT dig FROM l WHERE doc_id % 2 = 0)"
        " SELECT doc_id, line_idx, dig,"
        "  (dig IN (SELECT dig FROM corpus)) AS dropped"
        " FROM l WHERE doc_id % 2 = 1"
    )


def s20_stream_curated_source_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming CURATION STATS — the composition s19 feeds: arriving
    documents' lines anti-join the static corpus digests (novel lines
    only), then a STATEFUL per-source aggregation keeps the running
    novel-line count and token mass — the mixing denominator (xs6/xs9
    read exactly this per-source token total) maintained continuously
    at ingest. Structurally this is the one streaming state machine no
    other s-query exercises: a stream-static join FEEDING a stateful
    aggregation (s19 stops at the stateless join; s10 aggregates the
    raw stream) — the join's micro-batch output becomes the agg's
    input, so update correctness across that seam is what the oracle
    hashes. Complete-mode memory drain in the gate (10 source rows);
    the production sink is foreachBatch upsert. Oracle: the identical
    batch join + group-by."""
    import uuid

    from presto_workload_analyzer_spark.sources import read_table
    from presto_workload_analyzer_spark.streaming import (
        run_to_memory,
        state_partitions,
        stream_sf_table,
    )

    corpus = (
        read_table(spark, f"{sf}/documents.parquet")
        .filter(F.col("doc_id") % 2 == 0)
        .select(F.explode(_chunk_lines(markers=False)).alias("__line"))
        .select(F.md5("__line").alias("dig"))
        .distinct()
    )
    novel = (
        stream_sf_table(spark, sf, "documents")
        .filter(F.col("doc_id") % 2 == 1)
        .select(
            "source",
            F.explode(_chunk_lines(markers=False)).alias("__line"),
        )
        .withColumn("dig", F.md5("__line"))
        .join(corpus, "dig", "left_anti")
    )
    agg = novel.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept_lines"),
        F.sum(F.size(F.split(F.col("__line"), " ")).cast("long"))
        .cast("long")
        .alias("kept_tokens"),
    )
    name = f"s20_mem_{uuid.uuid4().hex[:8]}"
    with state_partitions(spark, 8):
        q = run_to_memory(agg, name, output_mode="complete")
        q.awaitTermination(300)
    tbl = spark.table(name)
    return spark.createDataFrame(tbl.collect(), tbl.schema)


def s20_sql() -> str:
    return (
        _chunk_lines_sql(markers=False).replace(
            "WITH t AS (SELECT doc_id,",
            "WITH t AS (SELECT doc_id, source,",
        ).replace(
            " ln AS (SELECT doc_id,",
            " ln AS (SELECT doc_id, source,",
        )
        + ", l AS (SELECT doc_id, source, lines[i+1] AS line"
        "   FROM ln, UNNEST(range(0, len(lines))) AS u(i)),"
        " corpus AS (SELECT DISTINCT md5(line) AS dig FROM l"
        "   WHERE doc_id % 2 = 0)"
        " SELECT source, CAST(count(*) AS BIGINT) AS n_kept_lines,"
        "  CAST(sum(len(string_split(line, ' '))) AS BIGINT) AS kept_tokens"
        " FROM l WHERE doc_id % 2 = 1"
        "  AND md5(line) NOT IN (SELECT dig FROM corpus)"
        " GROUP BY 1"
    )


STAGED: dict[str, tuple] = {
    "xs14_c4_line_filters": (xs14_c4_line_filters, xs14_sql()),
    "xs15_ccnet_line_dedup": (xs15_ccnet_line_dedup, xs15_sql()),
    "xs16_bm25_scores": (xs16_bm25_scores, xs16_sql()),
    "xs17_bfd_packing": (xs17_bfd_packing, xs17_sql()),
    "xs18_curation_mix_chain": (xs18_curation_mix_chain, xs18_sql()),
    "xs19_dup_weighted_sampling": (xs19_dup_weighted_sampling, xs19_sql()),
    "s19_stream_line_dedup": (s19_stream_line_dedup, s19_sql()),
    "s20_stream_curated_source_stats": (s20_stream_curated_source_stats, s20_sql()),
}
