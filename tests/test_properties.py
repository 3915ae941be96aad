"""Property tests (SURVEY.md §5.3): unit-parsing round-trips across every
suffix × magnitude, Python-vs-Column parser agreement on one generated
batch, and pie/histogram kernel invariants."""

import math
import random

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from presto_workload_analyzer_spark.functions.pyunits import parse_size_py, parse_time_py
from presto_workload_analyzer_spark.functions.units import (
    SIZE_UNITS,
    TIME_UNITS,
    parse_size,
    parse_time,
)
from presto_workload_analyzer_spark.operators.kernels import pie_collapse, selectivity_histogram

_TIME_SUFFIXES = [s for s, _ in TIME_UNITS]
_SIZE_SUFFIXES = [s for s, _ in SIZE_UNITS]

magnitudes = st.floats(
    min_value=0.0, max_value=1e15, allow_nan=False, allow_infinity=False
)


@given(x=magnitudes, suffix=st.sampled_from(_TIME_SUFFIXES))
@settings(max_examples=300, deadline=None)
def test_time_roundtrip(x, suffix):
    factor = dict(TIME_UNITS)[suffix]
    assert parse_time_py(f"{x!r}{suffix}") == pytest.approx(x * factor, rel=1e-12)


@given(x=magnitudes, suffix=st.sampled_from(_SIZE_SUFFIXES))
@settings(max_examples=300, deadline=None)
def test_size_roundtrip(x, suffix):
    factor = dict(SIZE_UNITS)[suffix]
    assert parse_size_py(f"{x!r}{suffix}") == pytest.approx(x * factor, rel=1e-12)


@given(x=magnitudes)
@settings(max_examples=100, deadline=None)
def test_bare_float_fallthrough(x):
    # suffix-less strings fall through to float() (reference extract.py:55)
    assert parse_time_py(repr(x)) == pytest.approx(x)
    assert parse_size_py(repr(x)) == pytest.approx(x)


def test_none_and_garbage():
    assert parse_time_py(None) is None
    assert parse_size_py(None) is None
    assert parse_time_py("not a number") is None
    assert parse_size_py("12 bananas") is None


def test_suffix_order_ms_before_s():
    # '5ms' must parse as milliseconds, never strip the trailing 's' first
    assert parse_time_py("5ms") == 0.005
    assert parse_time_py("5s") == 5.0
    assert parse_size_py("5kB") == 5 * 1024.0
    assert parse_size_py("5B") == 5.0


def test_column_parser_agrees_with_python(spark):
    """One generated batch through both the Column-expression parser (the
    DataFrame path) and the plain-Python twin (the mapInPandas path)."""
    rng = random.Random(20240813)
    cases = [None, "", "garbage", "1.5", "0"]
    for _ in range(200):
        mag = rng.choice([0, 1, 0.001, 3.25, 17.0, 1e6, 1e12, rng.random() * 1e4])
        suffix = rng.choice(_TIME_SUFFIXES + _SIZE_SUFFIXES + [""])
        cases.append(f"{mag}{suffix}")
    df = spark.createDataFrame([(c,) for c in cases], ["raw"]).coalesce(1)
    out = df.select(
        "raw",
        parse_time(F.col("raw")).alias("t"),
        parse_size(F.col("raw")).alias("b"),
    ).collect()
    for r in out:
        pt, pb = parse_time_py(r.raw), parse_size_py(r.raw)
        for got, want in ((r.t, pt), (r.b, pb)):
            if want is None:
                assert got is None, r.raw
            else:
                assert got == pytest.approx(want, rel=1e-12), r.raw


def test_pie_invariants(spark):
    """pct sums to exactly 100.00, at most `top` slices, 'All the rest'
    present iff something was dropped — over several generated inputs."""
    rng = random.Random(7)
    for case in range(4):
        n = rng.choice([1, 5, 25, 60])
        rows = [(f"label_{i}", rng.random() * (10 ** rng.randint(0, 4))) for i in range(n)]
        df = spark.createDataFrame(rows, ["label", "val"])
        out = pie_collapse(df).collect()
        assert 0 < len(out) <= 20
        assert round(sum(r.pct for r in out), 2) == 100.0
        labels = [r.label for r in out]
        if n > 20:
            assert labels[-1] == "All the rest"
        assert math.isclose(
            sum(r.val for r in out), sum(v for _, v in rows), rel_tol=1e-9
        )


def test_histogram_invariants(spark):
    """Every scaffold bin present even when empty; percentages sum to 100;
    'Above' holds the overflow mass."""
    rng = random.Random(11)
    rows = [(min(rng.random() * 1.2, 1.3), rng.random() * 100) for _ in range(300)]
    df = spark.createDataFrame(rows, ["sel", "w"])
    for bins, max_sel in ((10, 1.0), (100, 0.2)):
        out = selectivity_histogram(df, "sel", "w", bins=bins, max_selectivity=max_sel).collect()
        labels = [r.bin for r in out]
        assert len(labels) == len(set(labels))
        # scaffold: every step-bin label below max_sel is present
        step = 1.0 / bins
        expected = {f"{i * step:.2f}" for i in range(math.ceil(max_sel / step))}
        assert expected <= set(labels)
        assert round(sum(r.wall_pct for r in out), 6) == pytest.approx(100.0)
        if max_sel < 1.0:
            assert "Above" in labels


def test_chunking_invariants(spark):
    """Every token covered; chunk i == tokens[i*stride : i*stride+chunk];
    chunk ids contiguous from 0; n_tokens matches the slice."""
    from presto_workload_analyzer_spark.extensions.textstats import chunk_documents

    rng = random.Random(7)
    chunk, overlap = 12, 5
    stride = chunk - overlap
    docs = {
        i: [f"t{i}_{j}" for j in range(rng.randint(1, 60))] for i in range(40)
    }
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs.items()], ["doc_id", "text"]
    )
    out = chunk_documents(df, "doc_id", "text", chunk_tokens=chunk, overlap=overlap)
    by_doc: dict[int, dict[int, tuple[str, int]]] = {}
    for r in out.collect():
        by_doc.setdefault(r.id, {})[r.chunk_id] = (r.chunk_text, r.n_tokens)
    assert set(by_doc) == set(docs)
    for i, toks in docs.items():
        chunks = by_doc[i]
        assert sorted(chunks) == list(range(len(chunks)))  # contiguous ids
        covered = []
        for cid in sorted(chunks):
            text, n = chunks[cid]
            expect = toks[cid * stride : cid * stride + chunk]
            assert text.split(" ") == expect
            assert n == len(expect)
            covered.extend(expect)
        assert set(covered) == set(toks)  # nothing dropped


def test_containment_vs_jaccard_invariants(spark):
    """containment in (0,1]; containment >= jaccard on every scored pair;
    containment == 1 iff the smaller shingle set is a subset of the larger."""
    from presto_workload_analyzer_spark.extensions.dedup import (
        ngram_jaccard,
        shingle_containment,
        shingles,
    )

    rng = random.Random(11)
    vocab = [f"w{j}" for j in range(12)]  # small vocab -> real overlaps
    docs = {i: " ".join(rng.choices(vocab, k=rng.randint(3, 25))) for i in range(25)}
    df = spark.createDataFrame(list(docs.items()), ["doc_id", "text"])
    sh = shingles(df, "doc_id", "text", k=3)
    sets = {}
    for r in sh.collect():
        sets.setdefault(r.id, set()).add(r.shingle)
    cont = {(r.id_a, r.id_b): r.containment for r in shingle_containment(sh).collect()}
    jac = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard(sh).collect()}
    assert cont and set(cont) == set(jac)  # same candidate pairs scored
    for pair, c in cont.items():
        assert 0.0 < c <= 1.0 + 1e-12
        assert c >= jac[pair] - 1e-12
        a, b = sets[pair[0]], sets[pair[1]]
        small, big = (a, b) if len(a) <= len(b) else (b, a)
        assert (abs(c - 1.0) < 1e-12) == small.issubset(big)


@pytest.fixture(scope="module")
def spark_pp(spark):
    return spark


@given(data=st.data())
@settings(max_examples=8, deadline=None)
def test_prefix_filter_join_equals_brute_force(spark_pp, data):
    """prefix_filter_jaccard_join is LOSSLESS for arbitrary corpora and
    thresholds: its output must equal the all-pairs k-shingle Jaccard
    computed independently in Python — completeness, soundness, and
    exact scores, under adversarially shared vocabularies."""
    from itertools import combinations

    from presto_workload_analyzer_spark.extensions.dedup import (
        prefix_filter_jaccard_join,
    )

    words = ["aa", "bb", "cc", "dd", "ee", "ff"]
    n_docs = data.draw(st.integers(min_value=2, max_value=10))
    texts = {
        i: " ".join(
            data.draw(
                st.lists(st.sampled_from(words), min_size=2, max_size=8)
            )
        )
        for i in range(n_docs)
    }
    threshold = data.draw(st.sampled_from([0.34, 0.5, 0.75]))
    df = spark_pp.createDataFrame(
        [(i, t) for i, t in texts.items()], ["doc_id", "text"]
    )
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in prefix_filter_jaccard_join(
            df, "doc_id", "text", k=2, threshold=threshold
        ).collect()
    }

    def sh(t):
        w = t.split()
        return {" ".join(w[i : i + 2]) for i in range(len(w) - 1)}

    expect = {}
    for a, b in combinations(sorted(texts), 2):
        sa, sb = sh(texts[a]), sh(texts[b])
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            expect[(a, b)] = round(j, 6)
    assert got == expect


# ---------------------------------------------------------------------------
# Codec round-trip properties (pure Python, no Spark): the "real codec"
# claim is only as strong as its behavior on ARBITRARY pixel buffers, not
# the fixed gradients the unit tests use.
# ---------------------------------------------------------------------------


@given(data=st.data())
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_any_pixels(data):
    """_encode_png -> _decode_png_pixels is bit-exact identity for every
    channel count and arbitrary sample bytes (8-bit, filter-0 encode; the
    decoder must reproduce width/height/channels and the raw buffer)."""
    from presto_workload_analyzer_spark.extensions.multimodal import (
        _decode_png_pixels,
        _encode_png,
    )

    w = data.draw(st.integers(min_value=1, max_value=12))
    h = data.draw(st.integers(min_value=1, max_value=12))
    ch = data.draw(st.sampled_from([1, 2, 3, 4]))
    samples = bytes(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=255),
                min_size=w * h * ch,
                max_size=w * h * ch,
            )
        )
    )
    got = _decode_png_pixels(_encode_png(w, h, ch, samples))
    assert got is not None
    gw, gh, gch, buf = got
    assert (gw, gh, gch) == (w, h, ch)
    assert bytes(buf) == samples


@given(data=st.data())
@settings(max_examples=40, deadline=None)
def test_gif_roundtrip_palette_pixels(data):
    """encode_gif -> decode_gif_pixels is exact identity whenever the
    source already sits on the encoder's 4x4x4 palette ({0,85,170,255}
    per channel), for arbitrary sizes and both row orders (sequential
    and 4-pass interlace)."""
    from presto_workload_analyzer_spark.extensions.gifcodec import (
        decode_gif_pixels,
        encode_gif,
    )

    w = data.draw(st.integers(min_value=1, max_value=16))
    h = data.draw(st.integers(min_value=1, max_value=16))
    interlace = data.draw(st.booleans())
    rgb = bytes(
        data.draw(
            st.lists(
                st.sampled_from([0, 85, 170, 255]),
                min_size=w * h * 3,
                max_size=w * h * 3,
            )
        )
    )
    got = decode_gif_pixels(encode_gif(w, h, rgb, interlace=interlace))
    assert got is not None
    gw, gh, gch, buf = got
    assert (gw, gh, gch) == (w, h, 3)
    assert bytes(buf) == rgb


@given(data=st.data())
@settings(max_examples=80, deadline=None)
def test_gif_lzw_raw_roundtrip(data):
    """_lzw_encode -> _lzw_decode is identity for arbitrary index streams
    at every GIF min-code-size, including streams long enough to cross
    the encoder's clear-flush boundaries and the decoder's width bumps."""
    from presto_workload_analyzer_spark.extensions.gifcodec import (
        _lzw_decode,
        _lzw_encode,
    )

    mcs = data.draw(st.integers(min_value=2, max_value=7))
    n = data.draw(st.integers(min_value=0, max_value=600))
    indices = bytes(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=(1 << mcs) - 1),
                min_size=n,
                max_size=n,
            )
        )
    )
    out = _lzw_decode(mcs, _lzw_encode(mcs, indices), max_pixels=10_000)
    assert out is not None
    assert bytes(out) == indices


@given(data=st.data())
@settings(max_examples=80, deadline=None)
def test_avi_walker_roundtrip_and_rec_invariance(data):
    """encode_avi_mjpeg -> _iter_avi_mjpeg_frames is identity (indices
    0..n-1, payloads bit-exact) for arbitrary JPEG-SOI-prefixed frame
    payloads, and the walk is INVARIANT under rewrapping any contiguous
    runs of movi chunks into LIST('rec ') interleave groups — the layout
    standard muxers emit. Stride k yields exactly every k-th frame."""
    import struct

    from presto_workload_analyzer_spark.extensions.multimodal import (
        _iter_avi_mjpeg_frames,
        encode_avi_mjpeg,
    )

    n = data.draw(st.integers(min_value=0, max_value=8))
    frames = [
        b"\xff\xd8"
        + bytes(data.draw(st.lists(st.integers(0, 255), min_size=0, max_size=40)))
        for _ in range(n)
    ]
    avi = encode_avi_mjpeg(frames, fps=data.draw(st.integers(1, 60)))
    assert list(_iter_avi_mjpeg_frames(avi)) == list(enumerate(frames))

    step = data.draw(st.integers(min_value=1, max_value=4))
    assert list(_iter_avi_mjpeg_frames(avi, step=step)) == [
        (i, f) for i, f in enumerate(frames) if i % step == 0
    ]

    # rewrap a random partition of the frame sequence into rec groups
    def chunk(cid, body):
        pad = b"\0" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    groups = []
    i = 0
    while i < n:
        size = data.draw(st.integers(min_value=1, max_value=n - i))
        wrap = data.draw(st.booleans())
        run = b"".join(chunk(b"00dc", f) for f in frames[i : i + size])
        groups.append(chunk(b"LIST", b"rec " + run) if wrap else run)
        i += size
    movi_at = avi.find(b"LIST", avi.find(b"movi") - 12)
    head = avi[12:movi_at]
    body = b"AVI " + head + chunk(b"LIST", b"movi" + b"".join(groups))
    rewrapped = b"RIFF" + struct.pack("<I", len(body)) + body
    assert list(_iter_avi_mjpeg_frames(rewrapped)) == list(enumerate(frames))


@given(buf=st.binary(min_size=0, max_size=200))
@settings(max_examples=120, deadline=None)
def test_avi_walker_never_throws_on_garbage(buf):
    """The RIFF walk yields nothing (and never raises) on arbitrary
    buffers, including ones that start with valid RIFF/AVI magic."""
    from presto_workload_analyzer_spark.extensions.multimodal import (
        _iter_avi_mjpeg_frames,
    )

    for prefix in (b"", b"RIFF", b"RIFF\x10\x00\x00\x00AVI "):
        out = list(_iter_avi_mjpeg_frames(prefix + buf))
        assert all(isinstance(i, int) and isinstance(f, bytes) for i, f in out)


# --- UniMax closed form vs the paper's sequential greedy -------------------

source_sets = st.dictionaries(
    keys=st.text(alphabet="abcdefghij", min_size=1, max_size=4),
    values=st.integers(min_value=1, max_value=1_000_000),
    min_size=1,
    max_size=30,
)


@given(
    sizes=source_sets,
    budget_frac=st.floats(min_value=0.01, max_value=2.0),
    epoch_cap=st.floats(min_value=0.1, max_value=8.0),
)
@settings(max_examples=300, deadline=None)
def test_unimax_closed_form_is_the_sequential_greedy(
    sizes, budget_frac, epoch_cap
):
    """sampling.unimax_mix's closed form must equal the published
    sequential greedy on ANY input: walk sources by ascending size, cap
    any source whose uniform share of the remaining budget exceeds
    E * tokens, redistribute the remainder evenly. The Spark operator
    implements the same formula as unimax_allocations_py (pinned by the
    hand-computed + adversarial Spark tests); this pits the formula
    itself against the greedy."""
    from presto_workload_analyzer_spark.extensions.sampling import (
        unimax_allocations_py,
    )

    total = sum(sizes.values())
    budget = budget_frac * epoch_cap * total

    order = sorted(sizes.items(), key=lambda kv: (kv[1], kv[0]))
    remaining, left = budget, len(order)
    greedy = {}
    for src, t in order:
        share = remaining / left
        greedy[src] = epoch_cap * t if epoch_cap * t < share else share
        remaining -= greedy[src]
        left -= 1

    closed = unimax_allocations_py(sizes, budget, epoch_cap)
    assert set(closed) == set(greedy)
    scale = max(budget, 1.0)
    for src in greedy:
        assert math.isclose(
            closed[src], greedy[src], rel_tol=1e-9, abs_tol=1e-9 * scale
        ), (src, sizes, budget, epoch_cap)
    # budget conservation: total allocation = min(B, E * total tokens)
    assert math.isclose(
        sum(closed.values()),
        min(budget, epoch_cap * total),
        rel_tol=1e-9,
        abs_tol=1e-6 * scale,
    )
