"""Kernel tests: pie collapse + selectivity histogram vs hand-computed
reference semantics (analyze.py:460-515, 622-686)."""

import math

import numpy
import pytest
from pyspark.sql import Row

from presto_workload_analyzer_spark.operators.kernels import (
    REST_LABEL,
    pie_collapse,
    selectivity_histogram,
    top_k_keys,
)


def _pie_reference(keys, values, top=20):
    """Faithful reimplementation of reference pie_chart data path (analyze.py:460-476)."""
    values = numpy.array(values, dtype=float)
    total = values.sum()
    if not total:
        return []
    percent = 100 * values / total
    relevant = (percent > 0.1) & (numpy.arange(len(keys)) < top - 1)
    out_keys = [t for r, t in zip(relevant, keys) if r]
    if numpy.any(~relevant):
        out_keys.append(REST_LABEL)
        values = numpy.concatenate((values[relevant], [values[~relevant].sum()]))
    else:
        values = values[relevant]
    percent = 100 * values / values.sum()
    percent = percent.round(2)
    percent[-1] += 100 - percent.sum()
    return list(zip(out_keys, values.tolist(), percent.tolist()))


def _run_pie(spark, pairs, top=20):
    df = spark.createDataFrame([Row(label=k, val=float(v)) for k, v in pairs])
    return [(r.label, r.val, r.pct) for r in pie_collapse(df, top=top).collect()]


def test_pie_basic(spark):
    pairs = [("a", 50.0), ("b", 30.0), ("c", 20.0)]
    got = _run_pie(spark, pairs)
    expected = _pie_reference(["a", "b", "c"], [50, 30, 20])
    assert got == expected
    assert math.isclose(sum(p for _, _, p in got), 100.0)


def test_pie_collapse_topk_and_suppression(spark):
    # 25 labels: forces the top-19 cut; plus a sub-0.1% label
    pairs = [(f"u{i:02d}", 1000.0 - i * 10) for i in range(25)]
    pairs.append(("tiny", 0.01))
    # reference input is sorted desc by value at every call site
    ref_sorted = sorted(pairs, key=lambda kv: -kv[1])
    expected = _pie_reference([k for k, _ in ref_sorted], [v for _, v in ref_sorted])
    got = _run_pie(spark, pairs)
    assert [(g[0], g[1]) for g in got] == [(e[0], e[1]) for e in expected]
    # pct matches numpy up to summation-order fp noise (kernel re-rounds the residual)
    for g, e in zip(got, expected):
        assert math.isclose(g[2], e[2], abs_tol=1e-9), (g, e)
    assert got[-1][0] == REST_LABEL
    assert math.isclose(sum(p for _, _, p in got), 100.0, abs_tol=1e-9)


def test_pie_no_collapse_when_all_relevant(spark):
    pairs = [("a", 60.0), ("b", 40.0)]
    got = _run_pie(spark, pairs)
    assert [g[0] for g in got] == ["a", "b"]


def test_pie_zero_total_empty(spark):
    got = _run_pie(spark, [("a", 0.0), ("b", 0.0)])
    assert got == []


def test_pie_rest_even_when_rest_sums_zero(spark):
    # a zero-valued label is not 'relevant' (0% share) -> rest row with val 0
    got = _run_pie(spark, [("a", 10.0), ("z", 0.0)])
    assert got[-1] == (REST_LABEL, 0.0, 0.0)


@pytest.mark.parametrize("bins,max_sel", [(10, 1.0), (100, 0.2)])
def test_histogram_matches_reference_semantics(spark, bins, max_sel):
    sels = [0.015, 0.12, 0.33, 0.77, 0.997, 1.0, 0.101, 0.499]
    walls = [10.0, 5.0, 2.0, 40.0, 1.0, 7.0, 3.0, 9.0]
    # reference arithmetic (analyze.py:636-650)
    step = 1.0 / bins
    wall = numpy.array(walls)
    b = numpy.abs(numpy.round(numpy.array(sels) - step / 2, 1))
    wall = numpy.append(wall, numpy.zeros(bins))
    b = numpy.append(b, numpy.arange(0, max_sel, step))
    labels = numpy.array(["%0.2f" % x if x <= max_sel + 1e-9 else "Above" for x in b])
    pct = wall / wall.sum() * 100
    expected = {}
    for lab, p in zip(labels, pct):
        expected[lab] = expected.get(lab, 0.0) + p

    df = spark.createDataFrame(
        [Row(selectivity=s, wall=w) for s, w in zip(sels, walls)]
    )
    got = {
        r.bin: r.wall_pct
        for r in selectivity_histogram(
            df, "selectivity", "wall", bins=bins, max_selectivity=max_sel
        ).collect()
    }
    assert set(got) == set(expected)
    for k in expected:
        assert math.isclose(got[k], expected[k], rel_tol=1e-9), (k, got[k], expected[k])
    assert math.isclose(sum(got.values()), 100.0, rel_tol=1e-9)


def test_top_k_keys(spark):
    df = spark.createDataFrame(
        [Row(t="a", v=1.0), Row(t="a", v=5.0), Row(t="b", v=4.0), Row(t="c", v=3.0)]
    )
    got = sorted(r.t for r in top_k_keys(df, "t", "v", 2).collect())
    assert got == ["a", "b"]
