"""Bucketed silver layer: the operators ⨝ plan_nodes attribution join must
be co-located (zero shuffle on either join input) when both tables are
bucketed by query_id — the 100 TB posture for the report pipeline."""

import json
import pathlib

import pytest
from pyspark.sql import functions as F

from presto_workload_analyzer_spark.operators import analyzers as A
from presto_workload_analyzer_spark.pipeline import (
    build_silver,
    read_silver_bucketed,
    write_silver_bucketed,
)
from presto_workload_analyzer_spark.sources.queryinfo import extract_queryinfo

from queryinfo_fixtures import fixtures


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("bucketed_corpus")
    for i, doc in enumerate(fixtures()):
        (d / f"q{i:03d}.json").write_text(json.dumps(doc))
    silver = build_silver(extract_queryinfo(spark, str(d)))
    write_silver_bucketed(silver, prefix="pwa_test", buckets=4)
    yield read_silver_bucketed(spark, prefix="pwa_test")
    spark.sql("DROP TABLE IF EXISTS pwa_test_operators")
    spark.sql("DROP TABLE IF EXISTS pwa_test_plan_nodes")


def test_bucketed_join_no_shuffle(spark, bucketed):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the sort-merge path (what a 100 TB run would take)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed["operators"].join(
            bucketed["plan_nodes"], on=["query_id", "node_id"]
        )
        joined.count()  # materialize so executedPlan is final
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # either shuffle-free strategy is the point (SMJ by default;
        # ShuffledHashJoin when AQE's maxShuffledHashJoinLocalMapThreshold
        # rewrite fires — both consume the bucketed partitioning without
        # an exchange)
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)
        # both scans read bucketed; no hash-repartition exchange feeds the join
        assert plan.count("Bucketed: true") == 2
        assert "Exchange hashpartitioning" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_results_match_unbucketed(spark, bucketed):
    out = A.wall_by_table_scan(bucketed["operators"], bucketed["plan_nodes"])
    rows = {r["label"]: r["val"] for r in out.collect()}
    assert "hive.web.logs" in rows
    assert all(v >= 0 for v in rows.values())
    # totals line up with a direct (unbucketed) aggregation over operators
    direct = (
        bucketed["operators"]
        .join(bucketed["plan_nodes"], on=["query_id", "node_id"])
        .filter(F.col("op_type").contains("Scan"))
        .agg(F.sum(F.col("input_wall") + F.col("output_wall") + F.col("finish_wall")))
        .collect()[0][0]
    )
    assert sum(rows.values()) == pytest.approx(direct)


def test_date_partitioned_silver_prunes(spark, tmp_path_factory):
    """write_silver's partitionBy(query_date) must turn a date predicate
    into PartitionFilters on the scan (time-range pruning is the main
    lever at 100 TB: a one-day report reads one directory, not history)."""
    import shutil

    from presto_workload_analyzer_spark.pipeline import write_silver

    d = tmp_path_factory.mktemp("dated_corpus")
    for i, doc in enumerate(fixtures()):
        (d / f"q{i:03d}.json").write_text(json.dumps(doc))
    silver = build_silver(extract_queryinfo(spark, str(d)))
    out = str(tmp_path_factory.mktemp("silver_out"))
    write_silver(silver, out)

    q = spark.read.parquet(f"{out}/queries")
    days = sorted(r.query_date for r in q.select("query_date").distinct().collect())
    assert days, "fixture corpus must span at least one date"
    one_day = q.filter(F.col("query_date") == F.lit(days[0]))
    one_day.count()
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "query_date" in plan.split("PartitionFilters", 1)[1][:200]
    # and the predicate must NOT appear as a post-scan data filter
    assert "PushedFilters: []" in plan or "query_date" not in plan.split("PushedFilters", 1)[1][:120]


def test_append_silver_incremental_idempotent(spark, tmp_path_factory):
    """Day-partitioned incremental ingest: appending per-day batches equals
    a full rebuild, and re-appending a day replaces it (no duplicates)."""
    from presto_workload_analyzer_spark.pipeline import append_silver, read_silver

    d = tmp_path_factory.mktemp("incr_corpus")
    for i, doc in enumerate(fixtures()):
        (d / f"q{i:03d}.json").write_text(json.dumps(doc))
    full = build_silver(extract_queryinfo(spark, str(d)))
    days = sorted(
        r.d for r in full["queries"].select(F.to_date("query_ts").alias("d")).distinct().collect()
    )
    assert len(days) >= 2, "fixture corpus must span 2+ days for this test"

    out = str(tmp_path_factory.mktemp("incr_silver"))
    for day in days:  # one append per day, as a daily ingest would
        batch = {
            "queries": full["queries"].filter(F.to_date("query_ts") == F.lit(day)),
            "operators": full["operators"],
            "plan_nodes": full["plan_nodes"],
            "tasks": full["tasks"],
        }
        # child tables filter by their own query_id-derived date
        from presto_workload_analyzer_spark.functions.timeutil import query_timestamp
        for name in ("operators", "plan_nodes", "tasks"):
            batch[name] = batch[name].filter(
                F.to_date(query_timestamp("query_id")) == F.lit(day)
            )
        append_silver(batch, out)

    got = read_silver(spark, out)
    for name in ("queries", "operators", "plan_nodes", "tasks"):
        assert got[name].count() == full[name].count(), name

    # idempotence: re-append the last day -> counts unchanged
    last = days[-1]
    rebatch = {
        "queries": full["queries"].filter(F.to_date("query_ts") == F.lit(last)),
        "operators": full["operators"].filter(
            F.to_date(query_timestamp("query_id")) == F.lit(last)
        ),
        "plan_nodes": full["plan_nodes"].filter(
            F.to_date(query_timestamp("query_id")) == F.lit(last)
        ),
        "tasks": full["tasks"].filter(
            F.to_date(query_timestamp("query_id")) == F.lit(last)
        ),
    }
    append_silver(rebatch, out)
    got2 = read_silver(spark, out)
    for name in ("queries", "operators", "plan_nodes", "tasks"):
        assert got2[name].count() == full[name].count(), f"{name} duplicated on re-append"


def test_min_row_parallelism_is_noop_when_scan_is_wide(spark):
    """The repartition must vanish exactly where it would be expensive:
    an input already at >= core-count partitions passes through
    IDENTICALLY (same plan object — no exchange added), while a
    single-split input comes back at core-count partitions."""
    from presto_workload_analyzer_spark.sources import min_row_parallelism

    target = spark.sparkContext.defaultParallelism
    wide = spark.range(1000).repartition(target)
    assert min_row_parallelism(wide) is wide

    wider = spark.range(1000).repartition(target + 4)
    assert min_row_parallelism(wider) is wider

    narrow = spark.range(1000).coalesce(1)
    out = min_row_parallelism(narrow)
    assert out is not narrow
    assert out.rdd.getNumPartitions() == target
    # row set unchanged
    assert out.count() == 1000
