"""The staged (not-yet-registered) queries must already pass the exact
spark-vs-DuckDB comparison the local gate applies to registered ones, so
their future registration is a move, not a debugging session."""

import os

import duckdb
import pandas as pd
import pytest

from presto_workload_analyzer_spark import staged_queries

SF_DIR = os.environ.get("SPARK_GRAFT_TINY_SF", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"{SF_DIR} not present")
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(staged_queries.STAGED))
def test_staged_query_matches_oracle_exactly(spark, con, name):
    fn, sql = staged_queries.STAGED[name]
    sdf = _normalize(fn(spark, SF_DIR).toPandas())
    odf = _normalize(con.sql(sql).df())
    assert list(sdf.columns) == list(odf.columns)
    assert len(sdf) == len(odf) and len(sdf) > 0
    pd.testing.assert_frame_equal(sdf, odf, check_exact=True)


def test_xs5_guard_actually_fires(spark, con):
    """xs5 is only a guard-on gate if oversized buckets EXIST at test
    scale: guard-on must emit strictly fewer pairs than the exact x02
    enumeration (stars replace all-pairs), and every guard-on pair must
    be a subset member plus-or-minus nothing outside the x02 universe."""
    fn, _ = staged_queries.STAGED["xs5_guarded_lsh_pairs"]
    from presto_workload_analyzer_spark.extensions import dedup
    from presto_workload_analyzer_spark.sources import read_table

    docs = read_table(spark, SF_DIR + "/documents.parquet")
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", k=3, num_hashes=16, bands=4, mode="md5"
        ).collect()
    }
    guarded = {(r.id_a, r.id_b) for r in fn(spark, SF_DIR).collect()}
    assert guarded < exact  # strict subset: the star prune fired


@pytest.mark.parametrize("name", sorted(staged_queries.STAGED))
def test_staged_query_plan_is_lintclean(spark, name):
    """Staged queries escape the registered plan lint until registration;
    apply its two core bans here so they arrive lint-clean: no
    row-at-a-time Python eval, no CartesianProduct. (xs3's rank window is
    source-grain — partitioned, so the unpartitioned-window lint's target
    shape cannot occur; asserted by requiring every Window to carry a
    partition spec in the plan's windowspecdefinition.)"""
    fn, _ = staged_queries.STAGED[name]
    plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    for line in plan.splitlines():
        if "Window " in line:
            assert "windowspecdefinition(" in line
            spec = line.split("windowspecdefinition(", 1)[1]
            # a partitioned spec lists partition cols before the ORDER key
            # (which carries ASC/DESC); an unpartitioned one starts there
            first = spec.split(",", 1)[0]
            assert " ASC" not in first and " DESC" not in first, line
