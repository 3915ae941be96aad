"""The staged (not-yet-registered) queries must already pass the exact
spark-vs-DuckDB comparison the local gate applies to registered ones, so
their future registration is a move, not a debugging session.

(When the staging module is empty between batches, the parametrized
tests collect as skips — the harness stays in place for the next batch.)
"""

import os

import duckdb
import pandas as pd
import pytest

from presto_workload_analyzer_spark import staged_queries

# All staging tiers gate identically; STAGED registers next round,
# STAGED_NEXT the round after, then STAGED_TIER3, then STAGED_TIER4
# (each round's registration stays <= 8).
ALL_STAGED = {
    **staged_queries.STAGED,
    **staged_queries.STAGED_NEXT,
    **staged_queries.STAGED_TIER3,
    **staged_queries.STAGED_TIER4,
    **staged_queries.STAGED_TIER5,
    **staged_queries.STAGED_TIER6,
    **staged_queries.STAGED_TIER7,
}

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


@pytest.mark.parametrize("name", sorted(ALL_STAGED) or [None])
def test_staged_query_matches_oracle_exactly(spark, con, name):
    if name is None:
        pytest.skip("staging module empty between batches")
    fn, sql = ALL_STAGED[name]
    sdf = _normalize(fn(spark, SF_DIR).toPandas())
    odf = _normalize(con.sql(sql).df())
    assert list(sdf.columns) == list(odf.columns)
    assert len(sdf) == len(odf) and len(sdf) > 0
    pd.testing.assert_frame_equal(sdf, odf, check_exact=True)


@pytest.mark.parametrize("name", sorted(ALL_STAGED) or [None])
def test_staged_query_plan_is_lintclean(spark, name):
    """Staged queries escape the registered plan lint until registration;
    apply its two core bans here so they arrive lint-clean: no
    row-at-a-time Python eval, no CartesianProduct; every Window must
    carry a partition spec (group-grain, never a global sort)."""
    if name is None:
        pytest.skip("staging module empty between batches")
    fn, _ = ALL_STAGED[name]
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


def test_registration_rehearsal_window_and_names():
    """Dry-run of the next-round registration: add the staged entries to
    a COPY of the live registry and assert (a) no staged name collides
    with a registered one, (b) the rotation scheduler still produces a
    well-formed full ordering, and (c) every staged entry lands in the
    driver's 50-slot verification window (never-verified tier priority)
    — so the actual move is verified-by-construction, not a gamble on
    window composition."""
    from presto_workload_analyzer_spark import driver_queries as dq

    assert not set(ALL_STAGED) & set(dq._QUERIES), (
        "staged name collides with a registered query"
    )
    tiers = [
        set(staged_queries.STAGED),
        set(staged_queries.STAGED_NEXT),
        set(staged_queries.STAGED_TIER3),
        set(staged_queries.STAGED_TIER4),
        set(staged_queries.STAGED_TIER5),
        set(staged_queries.STAGED_TIER6),
        set(staged_queries.STAGED_TIER7),
    ]
    for i, a in enumerate(tiers):
        for b in tiers[i + 1:]:
            assert not a & b, "two staging tiers share a name"
    augmented = dict(dq._QUERIES)
    for name, (fn, _sql) in ALL_STAGED.items():
        augmented[name] = fn
    ordered = dq._ordered(augmented)
    assert list(ordered) and set(ordered) == set(augmented)
    window = list(ordered)[:50]
    missing = [n for n in ALL_STAGED if n not in window]
    assert missing == [], (
        f"staged entries outside the 50-slot window at registration: {missing}"
    )
