"""Skew stress for the inverted-index join family (round-4 verdict item 3).

A hot term/shingle landing in 30%+ of documents is the classic posting-list
skew: every (doc, term) row with that term hashes to ONE shuffle partition.
The engine's defenses, each asserted here on a planted-hot-token corpus:

  * tfidf_cosine_pairs (x34's kernel) — the only QUADRATIC join in the
    family (posting-list SELF-join on term) — prunes terms with
    df > max_df_ratio * N before the join. The test proves the bound
    actually BINDS: with the hot term in 60% of docs, the pair output is
    identical to a corpus with the hot term stripped from the text
    entirely (the hot posting list never reaches the self-join).
  * duplicate_ngram_fraction / tfidf_top_terms (x42/x22's kernels) join
    postings against a ONE-row-per-key aggregate — linear in postings, so
    a hot key is shuffle-partition imbalance (AQE skew-join territory),
    never a quadratic blow-up. The tests assert they complete on the
    skewed corpus with exactly-right values for the hot key.
  * the session enables AQE skew-join handling (pinned so a config
    regression fails loudly, not as a mystery straggler at scale).
"""

import pytest
from pyspark.sql import Row, functions as F

from presto_workload_analyzer_spark.extensions import textstats

N_DOCS = 1200
HOT = "hottoken"


def _corpus(spark, hot_share: float, with_hot: bool = True):
    """N_DOCS synthetic docs; `hot_share` of them contain the hot token
    exactly once; every doc also has 5 unique-ish filler tokens."""
    rows = []
    for i in range(N_DOCS):
        toks = [f"w{i}a", f"w{i}b", f"w{i}c", f"common{i % 7}", f"tail{i % 31}"]
        if with_hot and i < int(N_DOCS * hot_share):
            toks.insert(2, HOT)
        rows.append(Row(doc_id=i, text=" ".join(toks)))
    return spark.createDataFrame(rows)


def test_session_enables_aqe_skew_join(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_max_df_prune_binds_on_hot_term(spark):
    """With the hot term in 60% of docs (> max_df_ratio 0.5), the posting
    self-join must never see it: pair output == corpus with the hot term
    removed from the text. This is the skew bound doing its job — the
    hottest key is pruned as a stop term BEFORE the quadratic join."""
    skewed = _corpus(spark, hot_share=0.6, with_hot=True)
    stripped = _corpus(spark, hot_share=0.6, with_hot=False)
    got = {
        (r["id_a"], r["id_b"]): round(r["cosine"], 9)
        for r in textstats.tfidf_cosine_pairs(
            skewed, "doc_id", "text", threshold=0.05, max_df_ratio=0.5
        ).collect()
    }
    want = {
        (r["id_a"], r["id_b"]): round(r["cosine"], 9)
        for r in textstats.tfidf_cosine_pairs(
            stripped, "doc_id", "text", threshold=0.05, max_df_ratio=0.5
        ).collect()
    }
    assert got == want
    # sanity: the corpus DOES produce pairs (common/tail tokens shared)
    assert len(got) > 0


def test_max_df_prune_spares_sub_threshold_terms(spark):
    """At 30% document frequency (< max_df_ratio 0.5) the hot term is NOT
    pruned — it contributes pairs. The bound is a skew cap, not a
    drop-anything-warm hammer."""
    skewed = _corpus(spark, hot_share=0.3, with_hot=True)
    stripped = _corpus(spark, hot_share=0.3, with_hot=False)
    # docs 0 and 1 share ONLY the hot term (different common/tail groups):
    # the pair exists iff the hot term survives the prune
    pair = F.col("id_a") == 0, F.col("id_b") == 1
    n_with = (
        textstats.tfidf_cosine_pairs(
            skewed, "doc_id", "text", threshold=0.005, max_df_ratio=0.5
        )
        .filter(pair[0] & pair[1])
        .count()
    )
    n_without = (
        textstats.tfidf_cosine_pairs(
            stripped, "doc_id", "text", threshold=0.005, max_df_ratio=0.5
        )
        .filter(pair[0] & pair[1])
        .count()
    )
    assert (n_with, n_without) == (1, 0)


def test_duplicate_ngram_fraction_survives_hot_shingle(spark):
    """30% of docs share one 3-gram (planted as a common 3-token prefix).
    The postings ⨝ doc-frequency join is linear in postings (one row per
    shingle on the frequency side), so the skewed corpus completes and the
    hot-shingle docs report exactly their shared-prefix grams as dup."""
    hot_prefix = "alpha beta gamma"
    rows = [
        Row(
            doc_id=i,
            text=(
                f"{hot_prefix} u{i}x u{i}y u{i}z"
                if i < int(N_DOCS * 0.3)
                else f"v{i}a v{i}b v{i}c v{i}d v{i}e v{i}f"
            ),
        )
        for i in range(N_DOCS)
    ]
    df = spark.createDataFrame(rows)
    out = {
        r["id"]: (r["n_shingles"], r["n_dup"])
        for r in textstats.duplicate_ngram_fraction(df, "doc_id", "text", k=3).collect()
    }
    assert len(out) == N_DOCS
    # hot docs: 4 shingles ("alpha beta gamma" + 3 unique tails), 1 dup
    assert out[0] == (4, 1)
    assert out[int(N_DOCS * 0.3) - 1] == (4, 1)
    # cold docs: 4 unique shingles, 0 dup
    assert out[N_DOCS - 1] == (4, 0)


def test_tfidf_top_terms_survives_hot_term(spark):
    """The tf ⨝ df join on the skewed corpus: hot term ranks LAST among a
    doc's terms (lowest idf), unique terms first — the join completes and
    scores stay correct under skew."""
    skewed = _corpus(spark, hot_share=0.3, with_hot=True)
    top = textstats.tfidf_top_terms(skewed, "doc_id", "text", k=6)
    doc0 = {r["term"]: r["rank"] for r in top.filter(F.col("id") == 0).collect()}
    assert HOT in doc0
    # hot term's idf (ln(1/0.3)) is far below any unique term's ln(N)
    assert doc0[HOT] == max(doc0.values())


# ---------------------------------------------------------------- salted_agg
# (restored: the round-5 rewrite of this file dropped the salted_agg suite;
# the salt-distribution property in particular has no other coverage)


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    from presto_workload_analyzer_spark.sources.tables import read_sf_table

    return read_sf_table(spark, sf_dir, "lineitem").cache()


def test_salted_agg_matches_plain(spark, lineitem):
    from presto_workload_analyzer_spark.operators.skew import salted_agg

    salted = salted_agg(
        lineitem,
        ["l_returnflag"],
        {
            "qty": ("sum", "l_quantity"),
            "n": ("count", "l_orderkey"),
            "lo": ("min", "l_extendedprice"),
            "hi": ("max", "l_extendedprice"),
        },
        buckets=8,
    )
    plain = lineitem.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("qty"),
        F.count("l_orderkey").alias("n"),
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    )
    s = {r.l_returnflag: r for r in salted.collect()}
    p = {r.l_returnflag: r for r in plain.collect()}
    assert set(s) == set(p)
    for k in p:
        assert s[k].n == p[k].n
        assert s[k].lo == p[k].lo and s[k].hi == p[k].hi
        assert s[k].qty == pytest.approx(p[k].qty, rel=1e-12)


def test_salted_agg_deterministic(lineitem):
    from presto_workload_analyzer_spark.operators.skew import salted_agg

    a = salted_agg(lineitem, ["l_returnflag"], {"qty": ("sum", "l_quantity")}).collect()
    b = salted_agg(lineitem, ["l_returnflag"], {"qty": ("sum", "l_quantity")}).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_salt_spreads_hot_key(spark, lineitem):
    """The salted partial phase must actually split the hot key across
    buckets (that is the whole point)."""
    salted = lineitem.withColumn(
        "__salt", F.pmod(F.xxhash64(*lineitem.columns), F.lit(8))
    )
    n_partials = (
        salted.groupBy("l_returnflag", "__salt").count()
        .groupBy("l_returnflag").count()
        .agg(F.min("count")).collect()[0][0]
    )
    assert n_partials == 8


# ---------------------------------------------------------------------------
# Round 7: the LSH mega-bucket guard (lsh_candidate_pairs max_bucket_size).
# Sum-of-bucket^2 is quadratic in the LARGEST bucket; a viral template
# duplicated n times puts all n copies in one bucket of every band. The
# guard replaces the all-pairs join with a bucket-min star for oversized
# buckets — these tests prove the three contract points: edge output is
# bounded, connectivity (what dedup consumes) is IDENTICAL, and
# sub-threshold buckets keep the exact pair enumeration.
# ---------------------------------------------------------------------------


def _mega_corpus(spark, n_mega: int = 400, n_normal: int = 120):
    """n_mega identical docs (one near-dup family: every band bucket holds
    all of them) + n_normal docs in small natural near-dup pairs."""
    rows = [
        Row(doc_id=i, text="the viral template body repeated verbatim everywhere")
        for i in range(n_mega)
    ]
    for i in range(n_normal):
        base = 10_000 + i - (i % 2)  # consecutive ids share a text => pairs
        rows.append(
            Row(
                doc_id=10_000 + i,
                text=f"unique document number {base} with its own words "
                     f"alpha{base} beta{base} gamma{base} delta{base}",
            )
        )
    return spark.createDataFrame(rows)


def test_lsh_bucket_guard_bounds_edges_and_preserves_components(spark):
    from presto_workload_analyzer_spark.extensions import dedup

    docs = _mega_corpus(spark)
    exact = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", k=3, num_hashes=16, bands=4, mode="xxhash64"
    )
    guarded = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", k=3, num_hashes=16, bands=4, mode="xxhash64",
        max_bucket_size=50,
    )
    n_exact, n_guarded = exact.count(), guarded.count()
    # the mega family alone is 400*399/2 = 79,800 exact pairs; the star
    # emits 399 — the guard must cut the total by orders of magnitude
    assert n_exact > 50_000
    assert n_guarded < 1_000
    # connectivity is the dedup contract: identical component labels
    cc_exact = {
        (r.id, r.cluster_id) for r in dedup.connected_components(exact).collect()
    }
    cc_guarded = {
        (r.id, r.cluster_id) for r in dedup.connected_components(guarded).collect()
    }
    assert cc_exact == cc_guarded
    # the mega family collapses to one component rooted at min id 0
    mega_labels = {c for (i, c) in cc_guarded if i < 10_000}
    assert mega_labels == {0}


def test_lsh_bucket_guard_exact_below_threshold(spark):
    """With the cap ABOVE every bucket size, the guarded pair set is the
    exact enumeration — the guard is a no-op until it needs to bind."""
    from presto_workload_analyzer_spark.extensions import dedup

    docs = _mega_corpus(spark, n_mega=30, n_normal=60)
    exact = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", k=3, num_hashes=16, bands=4, mode="xxhash64"
    )
    guarded = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", k=3, num_hashes=16, bands=4, mode="xxhash64",
        max_bucket_size=10_000,
    )
    assert {(r.id_a, r.id_b) for r in exact.collect()} == {
        (r.id_a, r.id_b) for r in guarded.collect()
    }


def test_simhash_bucket_guard_on_identical_family(spark):
    """400 identical docs: every band bucket holds all of them. The guard
    keeps full connectivity for the identical family (hamming 0 through
    the bucket root) with n-1 star pairs; below-cap corpora are exact."""
    from presto_workload_analyzer_spark.extensions import dedup

    docs = _mega_corpus(spark, n_mega=400, n_normal=0)
    guarded = dedup.simhash_near_dup_pairs(
        docs, "doc_id", "text", max_hamming=1, bands=4, max_bucket_size=50
    )
    rows = guarded.collect()
    # star: 0 paired with 1..399, hamming 0 everywhere (identical text)
    assert {(r.id_a, r.id_b) for r in rows} == {(0, i) for i in range(1, 400)}
    assert all(r.hamming == 0 for r in rows)

    small = _mega_corpus(spark, n_mega=20, n_normal=40)
    exact = dedup.simhash_near_dup_pairs(small, "doc_id", "text", max_hamming=1, bands=4)
    noop = dedup.simhash_near_dup_pairs(
        small, "doc_id", "text", max_hamming=1, bands=4, max_bucket_size=10_000
    )
    assert {(r.id_a, r.id_b, r.hamming) for r in exact.collect()} == {
        (r.id_a, r.id_b, r.hamming) for r in noop.collect()
    }


def test_embedding_bucket_guard_on_identical_family(spark):
    """300 identical vectors land in one hyperplane bucket per band; the
    guard emits the root star, cosine verify keeps all (cosine == 1), and
    a below-cap run equals the exact enumeration."""
    from pyspark.sql import Row as R

    from presto_workload_analyzer_spark.extensions import dedup

    mega = [R(vec_id=i, embedding=[1.0, 0.5, -0.25, 0.125]) for i in range(300)]
    other = [
        R(vec_id=1000 + i, embedding=[float((i % 7) - 3), 1.0, float(i % 5), -1.0])
        for i in range(40)
    ]
    emb = spark.createDataFrame(mega + other)
    guarded = dedup.blocked_embedding_near_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.99, n_planes=4, n_bands=2,
        n_dims=4, max_bucket_size=50,
    )
    rows = guarded.collect()
    mega_pairs = {(r.id_a, r.id_b) for r in rows if r.id_b < 1000}
    assert mega_pairs == {(0, i) for i in range(1, 300)}
    assert all(abs(r.cosine - 1.0) < 1e-9 for r in rows if r.id_b < 1000)

    small = spark.createDataFrame(mega[:20] + other)
    exact = dedup.blocked_embedding_near_dup_pairs(
        small, "vec_id", "embedding", threshold=0.99, n_planes=4, n_bands=2, n_dims=4
    )
    noop = dedup.blocked_embedding_near_dup_pairs(
        small, "vec_id", "embedding", threshold=0.99, n_planes=4, n_bands=2,
        n_dims=4, max_bucket_size=10_000,
    )
    assert {(r.id_a, r.id_b) for r in exact.collect()} == {
        (r.id_a, r.id_b) for r in noop.collect()
    }


def test_winnowing_max_df_drops_boilerplate_fingerprints(spark):
    """A verbatim footer pasted into 60% of otherwise-unique docs yields
    hot fingerprints whose posting lists square in the overlap self-join.
    With max_df set, the output equals the no-footer corpus (the bound
    binds); genuine two-doc overlaps (below max_df) survive unchanged."""
    from presto_workload_analyzer_spark.extensions import textstats

    footer = "this report is confidential property of the example corporation"
    shared_run = "the quick brown fox jumps over the lazy sleeping dog today"
    rows = []
    for i in range(200):
        body = f"doc {i} body " + " ".join(f"tok{i}_{j}" for j in range(10))
        if i < 120:
            body += " " + footer
        if i in (150, 151):  # one genuine overlapping pair, no footer
            body += " " + shared_run
        rows.append(Row(doc_id=i, text=body))
    docs = spark.createDataFrame(rows)

    guarded = textstats.winnowing_overlap_pairs(
        docs, "doc_id", "text", k=5, w=4, mode="xxhash64", max_df=20
    )
    pairs = {(r.id_a, r.id_b) for r in guarded.collect()}
    # the footer family (120 docs -> 7,140 pairs) is gone; the true pair stays
    assert (150, 151) in pairs
    assert all(not (a < 120 and b < 120) for a, b in pairs)

    # below-threshold df: guard is a no-op vs the exact enumeration
    exact = textstats.winnowing_overlap_pairs(
        docs, "doc_id", "text", k=5, w=4, mode="xxhash64"
    )
    noop = textstats.winnowing_overlap_pairs(
        docs, "doc_id", "text", k=5, w=4, mode="xxhash64", max_df=10_000
    )
    assert {(r.id_a, r.id_b, r.n_shared) for r in exact.collect()} == {
        (r.id_a, r.id_b, r.n_shared) for r in noop.collect()
    }


def test_drop_exact_duplicates_mega_family_no_window_funnel(spark):
    """Round 7: the min-id survivor must come from a map-side-combinable
    aggregate, not a window partitioned by the text — a window co-locates
    a 10M-copy family's full documents in one task. Assert the plan has
    NO Window operator and partial aggregation feeds the exchange, and
    that a 2,000-copy planted family still resolves to its min id."""
    from pyspark.sql import Row as R

    from presto_workload_analyzer_spark.extensions import dedup

    rows = [R(doc_id=i, text="the same viral body") for i in range(2000)]
    rows += [R(doc_id=10_000 + i, text=f"unique {i}") for i in range(50)]
    docs = spark.createDataFrame(rows)
    out = dedup.drop_exact_duplicates(docs, ["text"], "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_min" in plan  # map-side combine on the survivor agg
    got = sorted(r.doc_id for r in out.collect())
    assert got == [0] + [10_000 + i for i in range(50)]


def test_bucket_guards_prune_both_join_sides(spark):
    """The guard must anti-join the oversized bucket keys out of BOTH
    sides of the small-bucket self-join: pruning only the a-side still
    shuffles the mega bucket's b-rows into ONE join partition (sorted
    there to match zero rows) — exactly the funnel the guard exists to
    remove. Pinned structurally: two LeftAnti joins in the plan (one per
    side), for both the minhash and simhash guards."""
    from presto_workload_analyzer_spark.extensions import dedup

    docs = _mega_corpus(spark, n_mega=60, n_normal=30)

    lsh = dedup.minhash_lsh_pairs(
        docs, "doc_id", "text", k=3, num_hashes=16, bands=4, mode="xxhash64",
        max_bucket_size=10,
    )
    assert lsh._jdf.queryExecution().executedPlan().toString().count("LeftAnti") >= 2

    sim = dedup.simhash_near_dup_pairs(
        docs, "doc_id", "text", max_hamming=1, bands=4, max_bucket_size=10
    )
    assert sim._jdf.queryExecution().executedPlan().toString().count("LeftAnti") >= 2


def test_ann_hot_cell_rank1_closed_form(spark, tmp_path):
    """Correctness half of the ANN skew gate (tools/skew_ann.py runs the
    measured slope at round close): a corpus whose hot near-dup family
    owns 50% of vectors lands in ONE IVF cell, and 64 exact-duplicate
    queries must each find their duplicated member at rank 1 with cosine
    1.0 through the persisted index (cell routing + partition pruning +
    scoring all correct under the planted skew)."""
    import tools.skew_ann as SA

    build_wall, query_wall, hot_share = SA.run_once(spark, 2_000, str(tmp_path))
    assert hot_share >= 0.3  # the planted mega-cell exists


def test_registered_guard_query_actually_fires(spark):
    """xs5_guarded_lsh_pairs (registered r9) is only a guard-on gate if
    oversized buckets EXIST at test scale: guard-on must emit strictly
    fewer pairs than the exact x02 enumeration (stars replace all-pairs)
    and never invent a pair outside the exact universe. If this breaks
    after a fixture regeneration or shingle/hash parameter change, the
    likely cause is that no bucket exceeds the cap any more — the assert
    message carries the observed max bucket size so that case
    self-diagnoses (ADVICE r8 item 3)."""
    from presto_workload_analyzer_spark import driver_queries
    from presto_workload_analyzer_spark.extensions import dedup
    from presto_workload_analyzer_spark.sources import read_table

    sf_dir = "/root/testdata/sf0.001"
    docs = read_table(spark, sf_dir + "/documents.parquet")
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", k=3, num_hashes=16, bands=4, mode="md5"
        ).collect()
    }
    guarded = {
        (r.id_a, r.id_b)
        for r in driver_queries._QUERIES["xs5_guarded_lsh_pairs"](
            spark, sf_dir
        ).collect()
    }
    cap = driver_queries._XS5_MAX_BUCKET
    # strict subset <=> at least one bucket exceeded the cap AND the star
    # pairs stayed inside the exact universe
    assert guarded <= exact, sorted(guarded - exact)[:5]
    if not guarded < exact:
        sh = dedup.shingles(docs, "doc_id", "text", 3, distinct=False)
        sig = dedup.minhash_signatures(sh, num_hashes=16, mode="md5")
        bands = dedup.lsh_bands(sig, bands=4, rows_per_band=4, mode="md5")
        max_bucket = (
            bands.groupBy("band", "band_hash")
            .count()
            .agg(F.max("count").alias("mx"))
            .collect()[0]["mx"]
        )
        raise AssertionError(
            f"guard did not fire: guarded == exact ({len(exact)} pairs); "
            f"max observed bucket size = {max_bucket}, cap = {cap} — the "
            "corpus or shingle/hash parameters no longer produce an "
            "oversized bucket at this SF"
        )


def test_cluster_balanced_sample_pick_is_sharded(spark):
    """Structural pin for the mega-family pick: cluster_balanced_sample's
    rank window must partition by (cluster, shard) — never by the
    cluster alone, which would funnel a viral dup family through one
    sorting task. Asserted on the physical plan: every ordered Window's
    partition spec lists two keys (the second being the shard)."""
    from pyspark.sql import Row as R

    from presto_workload_analyzer_spark.extensions import sampling

    docs = spark.createDataFrame([R(doc_id=i) for i in range(300)])
    cc = spark.createDataFrame([R(id=i, cluster_id=0) for i in range(250)])
    df = sampling.cluster_balanced_sample(docs, "doc_id", cc, m=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    saw_ranked_window = False
    for line in plan.splitlines():
        if "Window " not in line or "row_number()" not in line:
            continue
        saw_ranked_window = True
        spec = line.split("windowspecdefinition(", 1)[1]
        parts = spec.split(",")
        # partition keys precede the first ordered key (ASC/DESC marker)
        n_part = 0
        for p in parts:
            if " ASC" in p or " DESC" in p:
                break
            n_part += 1
        assert n_part >= 2, f"pick window not sharded: {line}"
    assert saw_ranked_window
    # and the result still keeps exactly m=2 of the 250-member family
    fam = [r for r in df.collect() if r.cluster_id == 0]
    assert len(fam) == 2 and {r.pick_rank for r in fam} == {1, 2}
