"""Salted two-phase aggregation: equivalence with a plain groupBy and
determinism across runs."""

import pytest
from pyspark.sql import functions as F

from presto_workload_analyzer_spark.operators.skew import salted_agg
from presto_workload_analyzer_spark.sources.tables import read_sf_table


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return read_sf_table(spark, sf_dir, "lineitem").cache()


def test_salted_agg_matches_plain(spark, lineitem):
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
