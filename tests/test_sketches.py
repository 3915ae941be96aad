"""Count-min sketch + Bloom-filter incremental dedup: planted-answer
semantics, mode equivalence, certification failure, and plan shape."""

import pytest
from pyspark.sql import Row, functions as F
from pyspark.sql.utils import AnalysisException

from presto_workload_analyzer_spark.extensions import dedup, sketches


@pytest.fixture(scope="module")
def term_docs(spark):
    # counts: alpha 5, beta 3, gamma 2, delta 1
    rows = [
        Row(doc_id=1, text="alpha alpha beta gamma"),
        Row(doc_id=2, text="alpha beta delta"),
        Row(doc_id=3, text="alpha alpha beta gamma"),
        Row(doc_id=4, text=None),
        Row(doc_id=5, text="   "),  # whitespace-only -> one '' artifact, filtered
    ]
    return spark.createDataFrame(rows)


# ---------------------------------------------------------------- count-min


@pytest.mark.parametrize("mode", ["md5", "xxhash64"])
def test_cms_estimates_upper_bound_and_exact_when_wide(spark, term_docs, mode):
    toks = term_docs.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("term")
    ).where(F.col("term") != "")
    sk = sketches.countmin_sketch(toks, "term", width=1024, depth=4, mode=mode)
    # total mass is preserved per depth row
    per_row = sk.groupBy("d").agg(F.sum("n").alias("s")).collect()
    assert {r.d for r in per_row} == {0, 1, 2, 3}
    assert all(r.s == 11 for r in per_row)

    est = sketches.cms_estimate(
        sk, toks.distinct(), "term", width=1024, depth=4, mode=mode
    )
    got = {r.term: r.est for r in est.collect()}
    true = {"alpha": 5, "beta": 3, "gamma": 2, "delta": 1}
    # one-sided error: est >= true always
    assert all(got[t] >= n for t, n in true.items())
    # at width >> vocab, collisions are (almost surely) absent -> exact
    assert got == true


def test_cms_estimate_absent_term_zero_floor(spark, term_docs):
    toks = term_docs.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("term")
    ).where(F.col("term") != "")
    sk = sketches.countmin_sketch(toks, "term", width=1024, depth=4)
    probe = spark.createDataFrame([Row(term="omega")])
    est = sketches.cms_estimate(sk, probe, "term", width=1024, depth=4)
    # absent term: cells may be missing from the sparse sketch -> est 0
    # (or a small collision value; with width 1024 and 4 terms, 0)
    assert est.collect()[0].est == 0


def test_cms_mode_equivalence_shape(spark, term_docs):
    """md5 and xxhash64 place terms differently but the ESTIMATES agree
    whenever both are collision-free — the engine-portability pin."""
    toks = term_docs.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("term")
    ).where(F.col("term") != "")
    outs = []
    for mode in ("md5", "xxhash64"):
        sk = sketches.countmin_sketch(toks, "term", width=4096, depth=4, mode=mode)
        est = sketches.cms_estimate(
            sk, toks.distinct(), "term", width=4096, depth=4, mode=mode
        )
        outs.append({(r.term, r.est) for r in est.collect()})
    assert outs[0] == outs[1]


def test_cms_md5_width_guard(spark, term_docs):
    with pytest.raises(ValueError, match="width"):
        sketches.countmin_sketch(
            term_docs.select(F.col("text").alias("term")),
            "term",
            width=1 << 17,
            mode="md5",
        )


def test_cms_heavy_hitters_exact_and_ordered(spark, term_docs):
    out = sketches.cms_heavy_hitters(
        term_docs, "text", top=3, margin=2, width=1024, depth=4
    ).collect()
    assert [(r.term, r.n) for r in out] == [("alpha", 5), ("beta", 3), ("gamma", 2)]


def test_cms_heavy_hitters_certification_fails_loud(spark):
    """Tiny width + margin 1 on a flat distribution: many terms collide so
    an outside term's estimate exceeds the k-th candidate's exact count —
    the assert_true must fire rather than return a silent near-miss."""
    rows = [Row(doc_id=i, text=f"t{i} t{i} common") for i in range(40)]
    df = spark.createDataFrame(rows)
    try:
        out = sketches.cms_heavy_hitters(
            df, "text", top=1, margin=1, width=2, depth=1
        ).collect()
    except Exception as exc:  # Py4J wraps the SparkRuntimeException
        assert "certification failed" in str(exc)
    else:
        # with width=2 the collision layout is data-dependent; if the cut
        # happened to be certified, the answer must then be exact
        assert [(r.term, r.n) for r in out] == [("common", 40)]


def test_cms_plan_stays_jvm(spark, term_docs):
    plan = sketches.cms_heavy_hitters(
        term_docs, "text", top=3, margin=2, width=1024, depth=4
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan


# ------------------------------------------------------------------- bloom


@pytest.fixture(scope="module")
def split_docs(spark):
    corpus = spark.createDataFrame(
        [Row(doc_id=i, text=f"corpus document number {i}") for i in range(50)]
    )
    new = spark.createDataFrame(
        [Row(doc_id=100, text="corpus document number 7")]   # dup of corpus
        + [Row(doc_id=101, text="corpus document number 23")]  # dup
        + [Row(doc_id=102, text="a genuinely new document")]
        + [Row(doc_id=103, text=None)]                         # NULL kept
        + [Row(doc_id=104, text="another brand new one")]
    )
    return corpus, new


def test_bloom_bitmap_bounded_and_nonempty(spark, split_docs):
    corpus, _ = split_docs
    words = dedup.bloom_bitmap(corpus, "text", m_bits=1 << 12, k_hashes=5).collect()
    assert 0 < len(words) <= (1 << 12) // 64
    assert all(0 <= r.word_idx < (1 << 12) // 64 for r in words)


def test_bloom_incremental_exact(spark, split_docs):
    corpus, new = split_docs
    kept = dedup.bloom_incremental_exact_dedup(
        corpus, new, "doc_id", "text", m_bits=1 << 12, k_hashes=5
    )
    assert sorted(r.doc_id for r in kept.collect()) == [102, 103, 104]
    # schema passes through untouched
    assert kept.columns == new.columns


def test_bloom_exact_even_when_saturated(spark, split_docs):
    """An absurdly small bitmap (every probe collides) must still give the
    exact answer — the verify anti-join owns correctness, m only owns
    cost. This is the undersized-m guarantee the docstring promises."""
    corpus, new = split_docs
    kept = dedup.bloom_incremental_exact_dedup(
        corpus, new, "doc_id", "text", m_bits=64, k_hashes=2
    )
    assert sorted(r.doc_id for r in kept.collect()) == [102, 103, 104]


def test_bloom_m_bits_guard(spark, split_docs):
    corpus, _ = split_docs
    with pytest.raises(ValueError, match="multiple of 64"):
        dedup.bloom_bitmap(corpus, "text", m_bits=100, k_hashes=3)


def test_bloom_plan_broadcasts_bitmap(spark, split_docs):
    corpus, new = split_docs
    plan = (
        dedup.bloom_incremental_exact_dedup(
            corpus, new, "doc_id", "text", m_bits=1 << 12, k_hashes=5
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan


# ------------------------------------------------- sorted neighborhood (SNM)


def test_sorted_neighborhood_window_semantics(spark):
    # keys sort as d1 d2 d3 d4 d5 (normalized text ascending)
    rows = [Row(doc_id=i, text=f"doc {i:02d} body") for i in range(1, 6)]
    df = spark.createDataFrame(rows)
    pairs = {
        (r.id_a, r.id_b)
        for r in dedup.sorted_neighborhood_pairs(
            df, "doc_id", "text", window=3
        ).collect()
    }
    # window 3: pairs within rank distance <= 2
    expect = {(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (3, 5), (4, 5)}
    assert pairs == expect


def test_sorted_neighborhood_no_duplicate_pairs_and_full_window(spark):
    rows = [Row(doc_id=i, text=f"entry {i:03d}") for i in range(60)]
    df = spark.createDataFrame(rows)
    out = dedup.sorted_neighborhood_pairs(df, "doc_id", "text", window=10).collect()
    pairs = [(r.id_a, r.id_b) for r in out]
    assert len(pairs) == len(set(pairs)), "bucket probe emitted a pair twice"
    # exact pair count for n=60, w=10: sum over gap g=1..9 of (60-g)
    assert len(pairs) == sum(60 - g for g in range(1, 10))


def test_sorted_neighborhood_finds_planted_neighbors(spark):
    rows = [
        Row(doc_id=1, text="alpha document about spark"),
        Row(doc_id=2, text="Alpha  document about spark!"),  # normalizes adjacent to 1
        Row(doc_id=3, text="zzz totally elsewhere"),
    ]
    df = spark.createDataFrame(rows)
    pairs = {
        (r.id_a, r.id_b)
        for r in dedup.sorted_neighborhood_pairs(
            df, "doc_id", "text", window=2
        ).collect()
    }
    assert (1, 2) in pairs          # normalization collapses case/punct/space
    assert (1, 3) not in pairs      # outside the window after sorting
    with pytest.raises(ValueError, match="window"):
        dedup.sorted_neighborhood_pairs(df, "doc_id", "text", window=1)


# -------------------------------------------------------------- snapshot diff


def test_snapshot_diff_statuses_and_null_semantics(spark):
    from presto_workload_analyzer_spark.extensions import profile

    old = spark.createDataFrame(
        [
            Row(id=1, txt="same", src="a"),
            Row(id=2, txt="before", src="a"),
            Row(id=3, txt="bye", src="b"),
            Row(id=4, txt=None, src="b"),     # NULL on both sides -> unchanged
            Row(id=5, txt=None, src="b"),     # NULL -> value -> changed
        ]
    )
    new = spark.createDataFrame(
        [
            Row(id=1, txt="same", src="a"),
            Row(id=2, txt="after", src="a"),
            Row(id=4, txt=None, src="b"),
            Row(id=5, txt="filled", src="b"),
            Row(id=6, txt="hello", src="c"),  # added
        ]
    )
    got = {
        (r.src, r.status): r.n
        for r in profile.snapshot_diff(old, new, "id", ["txt"], group_col="src").collect()
    }
    assert got == {
        ("a", "unchanged"): 1,
        ("a", "changed"): 1,
        ("b", "removed"): 1,
        ("b", "unchanged"): 1,
        ("b", "changed"): 1,
        ("c", "added"): 1,
    }
    with pytest.raises(ValueError, match="cols"):
        profile.snapshot_diff(old, new, "id", [])


def test_snapshot_diff_ungrouped(spark):
    from presto_workload_analyzer_spark.extensions import profile

    old = spark.createDataFrame([Row(id=1, txt="x"), Row(id=2, txt="y")])
    new = spark.createDataFrame([Row(id=1, txt="x"), Row(id=3, txt="z")])
    got = {r.status: r.n for r in profile.snapshot_diff(old, new, "id", ["txt"]).collect()}
    assert got == {"unchanged": 1, "removed": 1, "added": 1}


# ------------------------------------------------------------------ z-order


def test_zorder_key_interleave_and_guards(spark):
    from presto_workload_analyzer_spark.extensions.profile import zorder_key

    df = spark.createDataFrame(
        [Row(a=0, b=0), Row(a=1, b=0), Row(a=0, b=1), Row(a=3, b=3), Row(a=5, b=2)]
    )
    got = {
        (r.a, r.b): r.z
        for r in df.select("a", "b", zorder_key(["a", "b"], bits=3).alias("z")).collect()
    }

    def ref(a, b, bits=3):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
        return z

    assert got == {(a, b): ref(a, b) for (a, b) in got}
    # locality: the four cells of a 2x2 quadrant are contiguous in key space
    quad = sorted(ref(a, b) for a in (0, 1) for b in (0, 1))
    assert quad == [0, 1, 2, 3]
    with pytest.raises(ValueError, match="exceeds a long"):
        zorder_key(["a", "b"], bits=32)
    with pytest.raises(ValueError, match="at least one"):
        zorder_key([])
    # out-of-range value fails loud, never aliases
    bad = spark.createDataFrame([Row(a=9, b=0)])
    with pytest.raises(Exception, match="outside"):
        bad.select(zorder_key(["a", "b"], bits=3)).collect()


# ---------------------------------------------------------------- KMV


def _md5(s: str) -> str:
    import hashlib

    return hashlib.md5(s.encode()).hexdigest()


def test_kmv_sketch_is_true_bottom_k(spark):
    rows = [Row(g="a", t=w) for w in ["w1", "w2", "w3", "w4", "w5"]] + [
        Row(g="b", t=w) for w in ["w1", "w9"]
    ]
    df = spark.createDataFrame(rows)
    sk = sketches.kmv_sketch(df, "g", "t", k=3, mode="md5").collect()
    got_a = sorted((r.h, r.rank) for r in sk if r.g == "a")
    expect_a = sorted(_md5(w) for w in ["w1", "w2", "w3", "w4", "w5"])[:3]
    assert [h for h, _ in got_a] == expect_a
    assert [r for _, r in got_a] == [1, 2, 3]
    # group smaller than k keeps its whole (distinct) set
    assert len([r for r in sk if r.g == "b"]) == 2


def test_kmv_dedups_terms_and_skips_null(spark):
    rows = [Row(g="a", t="w1"), Row(g="a", t="w1"), Row(g="a", t=None)]
    sk = sketches.kmv_sketch(spark.createDataFrame(rows), "g", "t", k=5).collect()
    assert len(sk) == 1 and sk[0].rank == 1


def test_kmv_pairwise_exact_when_k_covers_union(spark):
    # |A ∪ B| = 6, |A ∩ B| = 2 -> Jaccard = 1/3; k >= union -> exact
    a = ["x1", "x2", "x3", "x4"]
    b = ["x3", "x4", "x5", "x6"]
    rows = [Row(g="a", t=w) for w in a] + [Row(g="b", t=w) for w in b]
    sk = sketches.kmv_sketch(spark.createDataFrame(rows), "g", "t", k=64)
    out = sketches.kmv_pairwise_jaccard(sk, "g", k=64).collect()
    assert len(out) == 1
    assert out[0].ga == "a" and out[0].gb == "b"
    assert abs(out[0].est_jaccard - 1 / 3) < 1e-6  # output is round()ed to 6


def test_kmv_pairwise_estimates_within_tolerance(spark):
    # 200-element sets with 100 shared -> Jaccard = 100/300; k=64 sketch
    shared = [f"s{i}" for i in range(100)]
    a = shared + [f"a{i}" for i in range(100)]
    b = shared + [f"b{i}" for i in range(100)]
    rows = [Row(g="a", t=w) for w in a] + [Row(g="b", t=w) for w in b]
    sk = sketches.kmv_sketch(spark.createDataFrame(rows), "g", "t", k=64)
    est = sketches.kmv_pairwise_jaccard(sk, "g", k=64).collect()[0].est_jaccard
    true = 100 / 300
    # k=64 -> se ~ sqrt(J(1-J)/k) ~ 0.06; 3 sigma
    assert abs(est - true) < 0.18


def test_kmv_zero_overlap_pair_present(spark):
    rows = [Row(g="a", t="x1"), Row(g="b", t="y1")]
    sk = sketches.kmv_sketch(spark.createDataFrame(rows), "g", "t", k=8)
    out = sketches.kmv_pairwise_jaccard(sk, "g", k=8).collect()
    assert len(out) == 1 and out[0].est_jaccard == 0.0


def test_kmv_xxhash_mode_shape_and_range(spark):
    rows = [Row(g="a", t=f"w{i}") for i in range(10)] + [
        Row(g="b", t=f"w{i}") for i in range(5, 15)
    ]
    sk = sketches.kmv_sketch(spark.createDataFrame(rows), "g", "t", k=4, mode="xxhash64")
    rowsc = sk.collect()
    assert all(len(r.h) == 16 for r in rowsc)  # fixed-width hex: order-safe
    assert sorted(r.rank for r in rowsc if r.g == "a") == [1, 2, 3, 4]
    est = sketches.kmv_pairwise_jaccard(sk, "g", k=4).collect()[0].est_jaccard
    assert 0.0 <= est <= 1.0


def test_kmv_mode_guard(spark):
    df = spark.createDataFrame([Row(g="a", t="w")])
    with pytest.raises(ValueError, match="hash mode"):
        sketches.kmv_sketch(df, "g", "t", k=4, mode="sha9")


# ------------------------------------------------------ histogram quantiles


def test_histogram_quantiles_hand_computed(spark):
    # group a: values 1..10 (resolution-exact) -> p50 = 5, p90 = 9, p99 = 10
    rows = [Row(g="a", v=float(i)) for i in range(1, 11)]
    out = sketches.histogram_quantiles(
        spark.createDataFrame(rows), "g", "v", resolution=100
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n == 10 and r.p50 == 5.0 and r.p90 == 9.0 and r.p99 == 10.0


def test_histogram_quantiles_resolution_grain(spark):
    # sub-resolution values collapse into one bin: quantiles snap to it
    rows = [Row(g="a", v=0.001), Row(g="a", v=0.004)]
    r = sketches.histogram_quantiles(
        spark.createDataFrame(rows), "g", "v", resolution=100
    ).collect()[0]
    assert r.p50 == 0.0 and r.p99 == 0.0  # both round to bin 0 at centi-res

    r2 = sketches.histogram_quantiles(
        spark.createDataFrame(rows), "g", "v", resolution=1000
    ).collect()[0]
    assert r2.p50 == 0.001 and r2.p99 == 0.004  # milli-res separates them


def test_histogram_quantiles_duplicates_and_groups(spark):
    rows = [Row(g="a", v=1.0)] * 99 + [Row(g="a", v=100.0)] + [
        Row(g="b", v=7.0)
    ]
    got = {
        r.g: r
        for r in sketches.histogram_quantiles(
            spark.createDataFrame(rows), "g", "v", resolution=100
        ).collect()
    }
    # 99% of mass at 1.0: p50/p90 = 1, p99 hits ceil(.99*100)=99th row = 1.0
    assert got["a"].p50 == 1.0 and got["a"].p90 == 1.0 and got["a"].p99 == 1.0
    assert got["b"].n == 1 and got["b"].p50 == 7.0


# --------------------------------------------------- CMS join-size estimate


def test_cms_inner_product_upper_bound_and_exact_when_wide(spark):
    # A keys: 1 x3, 2 x2, 3 x1 ; B keys: 1 x2, 3 x5, 4 x9
    # exact |A join B| = 3*2 + 1*5 = 11
    a = spark.createDataFrame([Row(term=t) for t in ["1"] * 3 + ["2"] * 2 + ["3"]])
    b = spark.createDataFrame(
        [Row(term=t) for t in ["1"] * 2 + ["3"] * 5 + ["4"] * 9]
    )
    for mode in ("md5", "xxhash64"):
        sa = sketches.countmin_sketch(a, "term", width=1024, depth=4, mode=mode)
        sb = sketches.countmin_sketch(b, "term", width=1024, depth=4, mode=mode)
        est = sketches.cms_inner_product(sa, sb).collect()[0].est
        assert est >= 11          # one-sided always
        assert est == 11          # collision-free at width >> keys


def test_cms_inner_product_disjoint_keys_zero(spark):
    a = spark.createDataFrame([Row(term="x")])
    b = spark.createDataFrame([Row(term="y")])
    sa = sketches.countmin_sketch(a, "term", width=1024, depth=4)
    sb = sketches.countmin_sketch(b, "term", width=1024, depth=4)
    assert sketches.cms_inner_product(sa, sb).collect()[0].est == 0


def test_hll_estimate_accuracy_and_merge(spark):
    """HLL at p=8 should land within ~10% on a 2k-distinct set (std err
    1.04/sqrt(256) ~ 6.5%), and register frames must merge by max."""
    from pyspark.sql import functions as F

    from presto_workload_analyzer_spark.extensions.sketches import (
        hll_estimate,
        hll_registers,
    )

    df = spark.range(2000).select(
        F.lit("g").alias("grp"), F.concat(F.lit("t"), F.col("id")).alias("w")
    )
    regs = hll_registers(df, "grp", "w")
    est = hll_estimate(regs).collect()[0]["est"]
    assert abs(est - 2000) / 2000 < 0.10

    # merge = max per register: sketch(A ∪ B) == merge(sketch A, sketch B)
    a = df.filter(F.col("w") < "t1")          # ids 0, 10..19, 100..199, 1000..1999
    b = df.subtract(a)
    ra, rb = hll_registers(a, "grp", "w"), hll_registers(b, "grp", "w")
    merged = (
        ra.unionByName(rb).groupBy("g", "reg").agg(F.max("mx").alias("mx"))
    )
    e_union = hll_estimate(regs).collect()[0]["est"]
    e_merged = hll_estimate(merged).collect()[0]["est"]
    assert e_union == e_merged
