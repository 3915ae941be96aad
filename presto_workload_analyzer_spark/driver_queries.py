"""Driver-gate queries: every SURVEY.md §2 operator as (Spark, oracle-SQL) pair.

The round driver runs each `queries()[name](spark, sf_dir)` and the matching
`oracle_sql()[name]` through DuckDB on the same parquet tables and compares
row-count + schema + order-insensitive value hash (see __spark_entry__.py).

Strategy: the engine's real input is a Presto workload log, which the driver
tables don't contain — so a thin ADAPTER layer maps the synthetic tables
onto the engine's silver-table contracts (events -> queries corpus,
lineitem -> operator summaries, lineitem x part -> plan-node scan
attribution, orders -> join nodes + probe/build operator pairs), and each
driver query then runs the REAL analyzer from operators/analyzers.py on the
adapted frames. The oracle SQL reproduces adapter + analyzer in ANSI SQL.
This hash-checks the genuine engine lineage, not a parallel reimplementation.

Determinism rules (Spark vs DuckDB must agree bit-for-bit):
  * derived columns use identical fp expressions on both sides (exact);
  * aggregate sums are order-dependent in the last ulp -> every aggregated
    double output is rounded to 6 decimals AFTER scaling to O(1..1e3)
    magnitude, on both sides;
  * double->long conversions: Spark CAST truncates, DuckDB CAST rounds ->
    oracle uses CAST(trunc(x) AS BIGINT);
  * no output column is named a DuckDB reserved word (user, update, ...).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from presto_workload_analyzer_spark.functions import parse_size, parse_time, query_timestamp
from presto_workload_analyzer_spark.operators import analyzers as A
from presto_workload_analyzer_spark.sources.tables import read_sf_table

# --------------------------------------------------------------------------
# Adapters: synthetic tables -> engine silver contracts
# --------------------------------------------------------------------------


def workload_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> the `queries` silver contract (one synthetic query per event).

    Deterministic arithmetic only; the FAILED filter (reference
    analyze.py:1233-1234) and the query_ts derivation from query_id
    (analyze.py:62-63) both run through the real engine code paths.
    """
    ev = read_sf_table(spark, sf_dir, "events")
    df = ev.select(
        F.concat(
            F.date_format("ts", "yyyyMMdd_HHmmss"),
            F.lit("_"),
            F.lpad((F.col("event_id") % 100000).cast("string"), 5, "0"),
            F.lit("_aaaaa"),
        ).alias("query_id"),
        F.concat(F.lit("user_"), (F.col("user_id") % 30).cast("string")).alias("user"),
        F.when(F.col("event_type") == "error", "FAILED").otherwise("FINISHED").alias("state"),
        F.when(F.col("event_type") == "purchase", "INSERT")
        .when(F.col("event_type") == "signup", "CREATE TABLE")
        .alias("update"),
        (F.col("value") * 1.5).alias("elapsed_time"),
        (F.col("value") * 0.6).alias("cpu_time"),
        F.col("value").alias("scheduled_time"),
        (F.col("value") * 0.1).alias("blocked_time"),
        (F.col("value") * 1e9).alias("input_size"),
        (F.col("value") * 1e7).alias("output_size"),
        (F.col("value") * 1000).cast("long").alias("input_rows"),
        (F.col("value") * 10).cast("long").alias("output_rows"),
        (F.col("value") * 2e8).alias("peak_mem"),
    )
    return df.withColumn("query_ts", query_timestamp("query_id")).filter(
        F.col("state") != "FAILED"
    )


_WORKLOAD_SQL = """
workload AS (
  SELECT
    strftime(ts, '%Y%m%d_%H%M%S') || '_' ||
      lpad(CAST(event_id % 100000 AS VARCHAR), 5, '0') || '_aaaaa' AS query_id,
    'user_' || CAST(user_id % 30 AS VARCHAR) AS user_name,
    CASE WHEN event_type = 'error' THEN 'FAILED' ELSE 'FINISHED' END AS state,
    CASE WHEN event_type = 'purchase' THEN 'INSERT'
         WHEN event_type = 'signup' THEN 'CREATE TABLE' END AS update_type,
    value * 1.5 AS elapsed_time,
    value * 0.6 AS cpu_time,
    value AS scheduled_time,
    value * 0.1 AS blocked_time,
    value * 1e9 AS input_size,
    value * 1e7 AS output_size,
    CAST(trunc(value * 1000) AS BIGINT) AS input_rows,
    CAST(trunc(value * 10) AS BIGINT) AS output_rows,
    value * 2e8 AS peak_mem
  FROM events
),
queries AS (
  SELECT *, strptime(substr(query_id, 1, 15), '%Y%m%d_%H%M%S') AS query_ts
  FROM workload WHERE state <> 'FAILED'
)
"""


def workload_operators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem -> the `operators` silver contract (one operator per lineitem).

    op_type cycles through six Presto operator names keyed on l_linenumber;
    input_rows is a prime constant (997) so selectivities 10*qty/997 never
    sit on a 0.1-rounding boundary (keeps the histogram quirk fp-stable
    across engines); a sparse l_partkey stripe sets input_rows=0 to exercise
    the reference's input_rows>0 guards (analyze.py:631-632, 774-777).
    """
    li = read_sf_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").cast("string").alias("query_id"),
        F.col("l_linenumber").cast("string").alias("node_id"),
        F.when(F.col("l_linenumber") % 6 == 0, "TableScanOperator")
        .when(F.col("l_linenumber") % 6 == 1, "ScanFilterAndProjectOperator")
        .when(F.col("l_linenumber") % 6 == 2, "FilterAndProjectOperator")
        .when(F.col("l_linenumber") % 6 == 3, "HashAggregationOperator")
        .when(F.col("l_linenumber") % 6 == 4, "LookupJoinOperator")
        .otherwise("TaskOutputOperator")
        .alias("op_type"),
        F.col("l_extendedprice").alias("input_size"),
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("output_size"),
        F.when(F.col("l_partkey") % 97 == 0, F.lit(0))
        .otherwise(F.lit(997))
        .cast("long")
        .alias("input_rows"),
        (F.col("l_quantity") * 10).cast("long").alias("output_rows"),
        F.col("l_tax").alias("input_wall"),
        F.col("l_discount").alias("output_wall"),
        (F.col("l_tax") * 0.5).alias("finish_wall"),
    )


_OPS_SQL = """
ops AS (
  SELECT
    CAST(l_orderkey AS VARCHAR) AS query_id,
    CAST(l_linenumber AS VARCHAR) AS node_id,
    CASE CAST(l_linenumber % 6 AS INT)
      WHEN 0 THEN 'TableScanOperator'
      WHEN 1 THEN 'ScanFilterAndProjectOperator'
      WHEN 2 THEN 'FilterAndProjectOperator'
      WHEN 3 THEN 'HashAggregationOperator'
      WHEN 4 THEN 'LookupJoinOperator'
      ELSE 'TaskOutputOperator' END AS op_type,
    l_extendedprice AS input_size,
    l_extendedprice * (1.0 - l_discount) AS output_size,
    CAST(CASE WHEN l_partkey % 97 = 0 THEN 0 ELSE 997 END AS BIGINT) AS input_rows,
    CAST(trunc(l_quantity * 10) AS BIGINT) AS output_rows,
    l_tax AS input_wall,
    l_discount AS output_wall,
    l_tax * 0.5 AS finish_wall
  FROM lineitem
)
"""


def workload_plan_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem x part -> plan_nodes rows carrying deepest_scan_table.

    Mirrors the flatten stage's output contract (SURVEY.md §4.3): the
    deepest-scan table identity is precomputed per (query_id, node_id).
    25 distinct p_brand values give a top-K-worthy table population.
    """
    li = read_sf_table(spark, sf_dir, "lineitem")
    pa = read_sf_table(spark, sf_dir, "part")
    return li.join(pa, li.l_partkey == pa.p_partkey).select(
        F.col("l_orderkey").cast("string").alias("query_id"),
        F.col("l_linenumber").cast("string").alias("node_id"),
        F.lit("tablescan").alias("node_type"),
        F.concat(F.lit("tpch."), F.lower(F.col("p_brand"))).alias("deepest_scan_table"),
    )


_PNODES_SQL = """
pnodes AS (
  SELECT
    CAST(l_orderkey AS VARCHAR) AS query_id,
    CAST(l_linenumber AS VARCHAR) AS node_id,
    'tablescan' AS node_type,
    'tpch.' || lower(p_brand) AS deepest_scan_table
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
"""


def workload_join_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders -> join-typed plan_nodes (one physical join per order).

    o_orderstatus picks the join kind exercised (reference
    analyze.py:1055-1066): 'O' -> hash join (criteria=1, INNER),
    'F' -> cross join (criteria=0, INNER), 'P' -> semijoin.
    """
    o = read_sf_table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").cast("string").alias("query_id"),
        F.lit("jn").alias("node_id"),
        F.when(F.col("o_orderstatus") == "P", "semijoin").otherwise("join").alias("node_type"),
        F.when(F.col("o_orderstatus") == "P", F.lit(None).cast("string"))
        .otherwise(F.lit("INNER"))
        .alias("join_type"),
        F.when(F.col("o_orderstatus") == "F", 0).otherwise(1).alias("criteria_count"),
        F.when(F.col("o_orderkey") % 2 == 0, "PARTITIONED")
        .otherwise("REPLICATED")
        .alias("distribution_type"),
    )


_JNODES_SQL = """
jnodes AS (
  SELECT
    CAST(o_orderkey AS VARCHAR) AS query_id,
    'jn' AS node_id,
    CASE WHEN o_orderstatus = 'P' THEN 'semijoin' ELSE 'join' END AS node_type,
    CASE WHEN o_orderstatus = 'P' THEN NULL ELSE 'INNER' END AS join_type,
    CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END AS criteria_count,
    CASE WHEN o_orderkey % 2 = 0 THEN 'PARTITIONED' ELSE 'REPLICATED' END AS distribution_type
  FROM orders
)
"""


def workload_join_operators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders -> probe + build operator rows matching workload_join_nodes.

    A sparse stripe (o_orderkey % 97 == 0) emits NO operators, exercising
    the reference's skip-on-missing-operator path (analyze.py:1049-1053).
    """
    o = read_sf_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 97 != 0)
    probe = o.select(
        F.col("o_orderkey").cast("string").alias("query_id"),
        F.lit("jn").alias("node_id"),
        F.when(F.col("o_orderstatus") == "P", "HashSemiJoinOperator")
        .when(F.col("o_orderstatus") == "F", "NestedLoopJoinOperator")
        .otherwise("LookupJoinOperator")
        .alias("op_type"),
        (F.col("o_totalprice") * 2.0).alias("input_size"),
        F.col("o_totalprice").alias("output_size"),
        F.col("o_totalprice").cast("long").alias("input_rows"),
        (F.col("o_totalprice") / 2.0).cast("long").alias("output_rows"),
    )
    build = o.select(
        F.col("o_orderkey").cast("string").alias("query_id"),
        F.lit("jn").alias("node_id"),
        F.when(F.col("o_orderstatus") == "P", "SetBuilderOperator")
        .when(F.col("o_orderstatus") == "F", "NestedLoopBuildOperator")
        .otherwise("HashBuilderOperator")
        .alias("op_type"),
        (F.col("o_totalprice") * 0.25).alias("input_size"),
        (F.col("o_totalprice") * 0.125).alias("output_size"),
        ((F.col("o_custkey") * 7) % 50000).cast("long").alias("input_rows"),
        F.col("o_custkey").cast("long").alias("output_rows"),
    )
    return probe.unionByName(build)


_JOPS_SQL = """
jorders AS (SELECT * FROM orders WHERE o_orderkey % 97 <> 0),
jprobe AS (
  SELECT CAST(o_orderkey AS VARCHAR) AS query_id, 'jn' AS node_id,
    o_totalprice * 2.0 AS input_size, o_totalprice AS output_size,
    CAST(trunc(o_totalprice) AS BIGINT) AS input_rows,
    CAST(trunc(o_totalprice / 2.0) AS BIGINT) AS output_rows,
    o_orderstatus
  FROM jorders
),
jbuild AS (
  SELECT CAST(o_orderkey AS VARCHAR) AS query_id, 'jn' AS node_id,
    o_totalprice * 0.25 AS input_size, o_totalprice * 0.125 AS output_size,
    CAST((o_custkey * 7) % 50000 AS BIGINT) AS input_rows,
    CAST(o_custkey AS BIGINT) AS output_rows,
    o_orderstatus
  FROM jorders
)
"""

_ALL_CTES = (
    "WITH "
    + ",".join(
        s.strip().rstrip(",")
        for s in [_WORKLOAD_SQL, _OPS_SQL, _PNODES_SQL, _JNODES_SQL, _JOPS_SQL]
    )
    + "\n"
)


def _pie_sql(src_select: str, top: int = 20) -> str:
    """SQL mirror of kernels.pie_collapse (reference analyze.py:460-515)."""
    return f"""
, pie_src AS ({src_select})
, pie_tot AS (
    SELECT label, val,
           row_number() OVER (ORDER BY val DESC, label) AS rnk,
           sum(val) OVER () AS total
    FROM pie_src)
, pie_base AS (
    SELECT *, (100.0 * val / total > 0.1 AND rnk < {top}) AS keep
    FROM pie_tot WHERE total > 0)
, pie_kept AS (SELECT label, val, rnk AS ord FROM pie_base WHERE keep)
, pie_rest AS (
    SELECT 'All the rest' AS label, coalesce(sum(val), 0.0) AS val,
           2000000000 AS ord
    FROM pie_base WHERE NOT keep HAVING count(*) > 0)
, pie_all AS (SELECT * FROM pie_kept UNION ALL SELECT * FROM pie_rest)
, pie_fin AS (
    SELECT label, val,
           round(100.0 * val / (sum(val) OVER ()), 2) AS pct_raw,
           row_number() OVER (ORDER BY ord DESC) AS revord
    FROM pie_all)
SELECT label, round(val, 6) AS val,
       CASE WHEN revord = 1
            THEN round(100.0 - (sum(pct_raw) OVER () - pct_raw), 2)
            ELSE pct_raw END AS pct
FROM pie_fin
"""


def _hist_sql(bins: int, max_sel: float) -> str:
    """SQL mirror of kernels.selectivity_histogram (reference analyze.py:622-686)."""
    step = 1.0 / bins
    return f"""
, hsrc AS (
    SELECT CAST(output_rows AS DOUBLE) / input_rows AS sel,
           input_wall + output_wall + finish_wall AS w
    FROM ops WHERE op_type LIKE '%Scan%' AND input_rows > 0)
, hbin AS (
    -- + 0.0 normalizes DuckDB's abs(-0.0) = -0.0 (printf would emit '-0.00')
    SELECT abs(round(sel - {step / 2!r}, 1)) + 0.0 AS bin, w FROM hsrc
    UNION ALL
    SELECT i * {step!r} AS bin, 0.0 AS w FROM range({bins}) t(i) WHERE i * {step!r} < {max_sel!r})
, hlab AS (
    SELECT CASE WHEN bin <= {max_sel!r} + 1e-9 THEN printf('%.2f', bin)
                ELSE 'Above' END AS bin_label,
           100.0 * w / (SELECT sum(w) FROM hbin) AS pct
    FROM hbin)
SELECT bin_label AS bin, round(sum(pct), 6) AS wall_pct
FROM hlab GROUP BY bin_label ORDER BY bin_label
"""


def _round6(df: DataFrame, *cols: str) -> DataFrame:
    for c in cols:
        df = df.withColumn(c, F.round(F.col(c), 6))
    return df


def _pie_round(df: DataFrame) -> DataFrame:
    return df.select("label", F.round("val", 6).alias("val"), "pct")


# --------------------------------------------------------------------------
# The query registry
# --------------------------------------------------------------------------

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def _register(name: str, fn: Callable[[SparkSession, str], DataFrame], sql: str | None) -> None:
    _QUERIES[name] = fn
    if sql is not None:
        _ORACLES[name] = sql


# -- time series (analyzers 1-6) --

_register(
    "a01_scheduled_by_date",
    lambda spark, sf: _round6(A.scheduled_by_date(workload_queries(spark, sf)), "scheduled_days"),
    _ALL_CTES
    + "SELECT CAST(query_ts AS DATE) AS bucket,"
    "  round(sum(scheduled_time) / 86400.0, 6) AS scheduled_days"
    " FROM queries GROUP BY 1 ORDER BY 1",
)

_register(
    "a02_scheduled_by_hour",
    lambda spark, sf: _round6(A.scheduled_by_hour(workload_queries(spark, sf)), "scheduled_hours"),
    _ALL_CTES
    + "SELECT date_trunc('hour', query_ts) AS bucket,"
    "  round(sum(scheduled_time) / 3600.0, 6) AS scheduled_hours"
    " FROM queries GROUP BY 1 ORDER BY 1",
)

_register(
    "a03_input_by_date",
    lambda spark, sf: _round6(A.input_by_date(workload_queries(spark, sf)), "input_tb"),
    _ALL_CTES
    + "SELECT CAST(query_ts AS DATE) AS bucket,"
    "  round(sum(input_size) / 1e12, 6) AS input_tb"
    " FROM queries GROUP BY 1 ORDER BY 1",
)

_register(
    "a04_input_by_hour",
    lambda spark, sf: _round6(A.input_by_hour(workload_queries(spark, sf)), "input_tb"),
    _ALL_CTES
    + "SELECT date_trunc('hour', query_ts) AS bucket,"
    "  round(sum(input_size) / 1e12, 6) AS input_tb"
    " FROM queries GROUP BY 1 ORDER BY 1",
)

_register(
    "a05_queries_by_date",
    lambda spark, sf: A.queries_by_date(workload_queries(spark, sf)),
    _ALL_CTES
    + "SELECT CAST(query_ts AS DATE) AS bucket, count(*) AS n_queries"
    " FROM queries GROUP BY 1 ORDER BY 1",
)

_register(
    "a06_queries_by_hour",
    lambda spark, sf: A.queries_by_hour(workload_queries(spark, sf)),
    _ALL_CTES
    + "SELECT date_trunc('hour', query_ts) AS bucket, count(*) AS n_queries"
    " FROM queries GROUP BY 1 ORDER BY 1",
)

# -- per-query scatters (7-9, 14-16) --

_register(
    "a07_peak_mem_by_query",
    lambda spark, sf: A.peak_mem_by_query(workload_queries(spark, sf)),
    _ALL_CTES + "SELECT query_ts, peak_mem, query_id FROM queries",
)

_register(
    "a08_input_size_by_query",
    lambda spark, sf: A.input_size_by_query(workload_queries(spark, sf)),
    _ALL_CTES + "SELECT query_ts, input_size, query_id FROM queries",
)

_register(
    "a09_elapsed_time_by_query",
    lambda spark, sf: A.elapsed_time_by_query(workload_queries(spark, sf)),
    _ALL_CTES + "SELECT query_ts, elapsed_time, query_id FROM queries",
)

_register(
    "a14_output_vs_input",
    lambda spark, sf: A.output_vs_input(workload_queries(spark, sf)),
    _ALL_CTES + "SELECT input_size, output_size, query_id FROM queries",
)

_register(
    "a15_scheduled_vs_input",
    lambda spark, sf: A.scheduled_vs_input(workload_queries(spark, sf)),
    _ALL_CTES + "SELECT input_size, scheduled_time, query_id FROM queries",
)

_register(
    "a16_elapsed_vs_input",
    lambda spark, sf: A.elapsed_vs_input(workload_queries(spark, sf)),
    _ALL_CTES + "SELECT input_size, elapsed_time, query_id FROM queries",
)

# -- per-query pies (10-13) --

_register(
    "a10_queries_by_user",
    lambda spark, sf: _pie_round(A.queries_by_user(workload_queries(spark, sf))),
    _ALL_CTES
    + _pie_sql("SELECT user_name AS label, CAST(count(*) AS DOUBLE) AS val FROM queries GROUP BY 1"),
)

_register(
    "a11_scheduled_by_user",
    lambda spark, sf: _pie_round(A.scheduled_by_user(workload_queries(spark, sf))),
    _ALL_CTES
    + _pie_sql("SELECT user_name AS label, sum(scheduled_time) / 86400.0 AS val FROM queries GROUP BY 1"),
)

_register(
    "a12_scheduled_by_update",
    lambda spark, sf: _pie_round(A.scheduled_by_update(workload_queries(spark, sf))),
    _ALL_CTES
    + _pie_sql(
        "SELECT coalesce(update_type, 'SELECT') AS label,"
        " sum(scheduled_time) / 86400.0 AS val FROM queries GROUP BY 1"
    ),
)

_register(
    "a13_input_by_user",
    lambda spark, sf: _pie_round(A.input_by_user(workload_queries(spark, sf))),
    _ALL_CTES
    + _pie_sql("SELECT user_name AS label, sum(input_size) / 1e12 AS val FROM queries GROUP BY 1"),
)

# -- operator analyzers (17, 19-21, 25, 26) --

_register(
    "a17_operator_wall",
    lambda spark, sf: _pie_round(A.operator_wall(workload_operators(spark, sf))),
    _ALL_CTES
    + _pie_sql(
        "SELECT replace(op_type, 'Operator', '') AS label,"
        " sum(input_wall + output_wall + finish_wall) AS val FROM ops GROUP BY 1"
    ),
)

_register(
    "a19_wall_by_selectivity_10",
    lambda spark, sf: _round6(A.wall_by_selectivity_10(workload_operators(spark, sf)), "wall_pct"),
    _ALL_CTES + _hist_sql(bins=10, max_sel=1.0),
)

_register(
    "a20_wall_by_selectivity_100_first_20",
    lambda spark, sf: _round6(
        A.wall_by_selectivity_100_first_20(workload_operators(spark, sf)), "wall_pct"
    ),
    _ALL_CTES + _hist_sql(bins=100, max_sel=0.2),
)

_register(
    "a21_filter_selectivity",
    lambda spark, sf: A.filter_selectivity_1(workload_operators(spark, sf)),
    _ALL_CTES
    + "SELECT input_rows, output_rows, query_id FROM ops WHERE op_type LIKE '%Filter%'",
)

_register(
    "a25_operator_input",
    lambda spark, sf: _pie_round(
        A.operator_input(
            # scale bytes->MB-ish before the pie so the summed magnitude stays
            # round-stable; same scaling in the oracle
            workload_operators(spark, sf).withColumn("input_size", F.col("input_size") / 1e3)
        )
    ),
    _ALL_CTES
    + _pie_sql("SELECT op_type AS label, sum(input_size / 1e3) AS val FROM ops GROUP BY 1"),
)

_register(
    "a26_operator_rows",
    lambda spark, sf: _pie_round(A.operator_rows(workload_operators(spark, sf))),
    _ALL_CTES
    + _pie_sql("SELECT op_type AS label, CAST(sum(input_rows) AS DOUBLE) AS val FROM ops GROUP BY 1"),
)

# -- plan-attribution analyzers (18, 22-24) --

_register(
    "a18_wall_by_table_scan",
    lambda spark, sf: _pie_round(
        A.wall_by_table_scan(workload_operators(spark, sf), workload_plan_nodes(spark, sf))
    ),
    _ALL_CTES
    + _pie_sql(
        "SELECT deepest_scan_table AS label,"
        " sum(input_wall + output_wall + finish_wall) AS val"
        " FROM ops JOIN pnodes USING (query_id, node_id)"
        " WHERE op_type LIKE '%Scan%' GROUP BY 1"
    ),
)

_register(
    "a24_input_size_by_table_scan",
    lambda spark, sf: _pie_round(
        A.input_size_by_table_scan(
            workload_operators(spark, sf).withColumn("input_size", F.col("input_size") / 1e3),
            workload_plan_nodes(spark, sf),
        )
    ),
    _ALL_CTES
    + _pie_sql(
        "SELECT deepest_scan_table AS label, sum(input_size / 1e3) AS val"
        " FROM ops JOIN pnodes USING (query_id, node_id)"
        " WHERE op_type LIKE '%Scan%' GROUP BY 1"
    ),
)

_TOPK_SCANFILTER_SQL = """
, sfops AS (
    SELECT CAST(o.output_rows AS DOUBLE) / o.input_rows AS selectivity,
           o.input_wall + o.output_wall + o.finish_wall AS wall,
           o.input_rows,
           p.deepest_scan_table AS table_name,
           o.query_id
    FROM ops o JOIN pnodes p USING (query_id, node_id)
    WHERE o.op_type LIKE '%ScanFilter%' AND o.input_rows > 0)
, topk AS (
    SELECT table_name FROM (
      SELECT table_name, sum(wall) AS w,
             row_number() OVER (ORDER BY sum(wall) DESC, table_name) AS rnk
      FROM sfops GROUP BY table_name) WHERE rnk <= 5)
"""

_register(
    "a22_walltime_vs_selectivity",
    lambda spark, sf: A.walltime_vs_selectivity(
        workload_operators(spark, sf), workload_plan_nodes(spark, sf)
    ),
    _ALL_CTES
    + _TOPK_SCANFILTER_SQL
    + "SELECT selectivity, wall, table_name, query_id FROM sfops"
    " WHERE table_name IN (SELECT table_name FROM topk)",
)

_register(
    "a23_inputrows_vs_selectivity",
    lambda spark, sf: A.inputrows_vs_selectivity(
        workload_operators(spark, sf), workload_plan_nodes(spark, sf)
    ),
    _ALL_CTES
    + _TOPK_SCANFILTER_SQL
    + "SELECT selectivity, input_rows, table_name, query_id FROM sfops"
    " WHERE table_name IN (SELECT table_name FROM topk)",
)

# -- join analyzers (27, 28) --

_register(
    "a27_joins_sides",
    lambda spark, sf: A.joins_sides(
        workload_join_operators(spark, sf), workload_join_nodes(spark, sf)
    ),
    _ALL_CTES
    + "SELECT b.input_size AS build_input_size, p.input_size AS probe_input_size,"
    " n.distribution_type, n.query_id"
    " FROM jnodes n JOIN jprobe p USING (query_id) JOIN jbuild b USING (query_id)",
)

_register(
    "a28_joins_selectivity",
    lambda spark, sf: A.joins_selectivity(
        workload_join_operators(spark, sf), workload_join_nodes(spark, sf)
    ),
    _ALL_CTES
    + "SELECT greatest(p.input_rows, b.input_rows) AS max_input_rows,"
    " p.output_rows AS output_rows, n.query_id"
    " FROM jnodes n JOIN jprobe p USING (query_id) JOIN jbuild b USING (query_id)",
)

# -- corpus metrics --

_register(
    "a00_collect_metrics",
    lambda spark, sf: _round6(
        A.collect_metrics(workload_queries(spark, sf)), "cpu_days", "scheduled_days", "input_tb"
    ),
    _ALL_CTES
    + "SELECT count(*) AS n_queries,"
    " round(sum(cpu_time) / 86400.0, 6) AS cpu_days,"
    " round(sum(scheduled_time) / 86400.0, 6) AS scheduled_days,"
    " CAST(sum(input_rows) AS BIGINT) AS input_rows,"
    " round(sum(input_size) / 1e12, 6) AS input_tb,"
    " count(DISTINCT CAST(query_ts AS DATE)) AS n_days,"
    " count(DISTINCT user_name) AS n_users"
    " FROM queries",
)

# -- scalar kernel checks: unit parsing driven through real data ------------

_TIME_SUFFIXES = ["ns", "us", "ms", "s", "m", "h", "d"]
_TIME_FACTORS = [1e-9, 1e-6, 1e-3, 1.0, 60.0, 3600.0, 86400.0]
_SIZE_SUFFIXES = ["B", "kB", "MB", "GB", "TB"]
_SIZE_FACTORS = [1.0, 1024.0, 1024.0**2, 1024.0**3, 1024.0**4]


def _k01(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_sf_table(spark, sf_dir, "events")
    suffix = F.element_at(
        F.array(*[F.lit(s) for s in _TIME_SUFFIXES]), (F.col("event_id") % 7 + 1).cast("int")
    )
    s = F.concat(F.col("value").cast("string"), suffix)
    return ev.select(F.col("event_id"), parse_time(s).alias("seconds"))


_register(
    "k01_parse_time_units",
    _k01,
    "SELECT event_id, value * (CASE CAST(event_id % 7 AS INT) "
    + " ".join(f"WHEN {i} THEN {f!r}" for i, f in enumerate(_TIME_FACTORS))
    + " END) AS seconds FROM events",
)


def _k02(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_sf_table(spark, sf_dir, "events")
    suffix = F.element_at(
        F.array(*[F.lit(s) for s in _SIZE_SUFFIXES]), (F.col("event_id") % 5 + 1).cast("int")
    )
    s = F.concat(F.col("value").cast("string"), suffix)
    return ev.select(F.col("event_id"), parse_size(s).alias("nbytes"))


_register(
    "k02_parse_size_units",
    _k02,
    "SELECT event_id, value * (CASE CAST(event_id % 5 AS INT) "
    + " ".join(f"WHEN {i} THEN {f!r}" for i, f in enumerate(_SIZE_FACTORS))
    + " END) AS nbytes FROM events",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
