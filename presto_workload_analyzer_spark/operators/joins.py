"""Join-node -> (probe, build) operator pairing.

The reference walks each query's plan tree, and for every node whose type
ends with 'join' picks the expected (probe, build) physical-operator pair by
the node's attributes, then looks both up in a dict of that query's
operators (reference analyze.py:1040-1080):

    node_type == 'join' and (criteria non-empty or type != 'INNER')
        -> ('LookupJoinOperator', 'HashBuilderOperator')     # hash equi/outer
    node_type == 'join' and criteria empty and type == 'INNER'
        -> ('NestedLoopJoinOperator', 'NestedLoopBuildOperator')  # cross
    node_type == 'semijoin'
        -> ('HashSemiJoinOperator', 'SetBuilderOperator')

Here the dict probes become two equi-joins of the join-typed `plan_nodes`
rows against `operators` on (query_id, node_id, expected op type). Inner
join semantics drop nodes with no matching operator — the reference logs and
skips those (analyze.py:1049-1053) or raises on a half-missing pair
(analyze.py:1068-1076); we drop both silently (documented deviation: at
100 TB a driver-side raise on one malformed query is not acceptable; the
dropped rows are countable by anti-join if needed). Queries with an empty
operators list (DDLs, LIMIT 0) drop out naturally (analyze.py:1042-1043).

Scale: plan_nodes join rows are few per query while operators is the big
side; Catalyst/AQE picks broadcast for the small side. Both joins share the
(query_id, node_id) key so the shuffle, if any, is reused.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def join_pairs(operators: DataFrame, plan_nodes: DataFrame) -> DataFrame:
    """One row per physical join: plan-node attrs + probe_* / build_* metrics.

    `plan_nodes` needs: query_id, node_id, node_type, join_type,
    criteria_count, distribution_type. `operators` needs: query_id, node_id,
    op_type and the metric columns (input_size, input_rows, output_rows, ...).
    """
    joins = plan_nodes.filter(F.col("node_type").endswith("join")).select(
        "query_id",
        "node_id",
        "node_type",
        "join_type",
        "criteria_count",
        "distribution_type",
        F.when(
            (F.col("node_type") == "join")
            & ((F.col("criteria_count") > 0) | (F.col("join_type") != "INNER")),
            F.lit("LookupJoinOperator"),
        )
        .when(F.col("node_type") == "join", F.lit("NestedLoopJoinOperator"))
        .when(F.col("node_type") == "semijoin", F.lit("HashSemiJoinOperator"))
        .alias("__probe_type"),
        F.when(
            (F.col("node_type") == "join")
            & ((F.col("criteria_count") > 0) | (F.col("join_type") != "INNER")),
            F.lit("HashBuilderOperator"),
        )
        .when(F.col("node_type") == "join", F.lit("NestedLoopBuildOperator"))
        .when(F.col("node_type") == "semijoin", F.lit("SetBuilderOperator"))
        .alias("__build_type"),
    )

    def side(name: str) -> DataFrame:
        return operators.select(
            F.col("query_id").alias(f"__{name}_qid"),
            F.col("node_id").alias(f"__{name}_nid"),
            F.col("op_type").alias(f"__{name}_match"),
            F.col("input_size").alias(f"{name}_input_size"),
            F.col("output_size").alias(f"{name}_output_size"),
            F.col("input_rows").alias(f"{name}_input_rows"),
            F.col("output_rows").alias(f"{name}_output_rows"),
        )

    probe = side("probe")
    build = side("build")
    out = joins.join(
        probe,
        on=(F.col("query_id") == F.col("__probe_qid"))
        & (F.col("node_id") == F.col("__probe_nid"))
        & (F.col("__probe_type") == F.col("__probe_match")),
    ).join(
        build,
        on=(F.col("query_id") == F.col("__build_qid"))
        & (F.col("node_id") == F.col("__build_nid"))
        & (F.col("__build_type") == F.col("__build_match")),
    )
    return out.drop(*[c for c in out.columns if c.startswith("__")])
