"""Miniature QueryInfo documents covering every analyzer branch.

Scenario matrix from FIXTURES.md §A: scan+agg, hash join PARTITIONED /
REPLICATED, cross join, semijoin, deep exchange, PrestoDB FQCN naming +
table-handle variants, INSERT, DDL-no-ops, FAILED, varada-internal, and
raw unit-string variants.
"""

from __future__ import annotations


def make_op(node_id: str, op_type: str, **over) -> dict:
    op = {
        "planNodeId": node_id,
        "operatorType": op_type,
        "rawInputDataSize": "1kB",
        "inputDataSize": "1kB",
        "outputDataSize": "512B",
        "rawInputPositions": 1000,
        "inputPositions": 1000,
        "outputPositions": 500,
        "addInputCpu": "10ms",
        "getOutputCpu": "5ms",
        "finishCpu": "1ms",
        "addInputWall": "20ms",
        "getOutputWall": "10ms",
        "finishWall": "2ms",
        "blockedWall": "0ms",
        "peakTotalMemoryReservation": "1MB",
    }
    op.update(over)
    return op


def make_queryinfo(
    query_id: str,
    user: str = "alice",
    state: str = "FINISHED",
    update: str | None = None,
    query: str = "SELECT 1",
    stats_over: dict | None = None,
    operators: list[dict] | None = None,
    plan_root: dict | None = None,
    substage_tasks: bool = False,
    internal: bool = False,
    error_code: dict | None = None,
) -> dict:
    stats = {
        "elapsedTime": "2.0s",
        "totalCpuTime": "1.0s",
        "totalScheduledTime": "1.5s",
        "totalBlockedTime": "100ms",
        "rawInputDataSize": "1kB",
        "outputDataSize": "512B",
        "rawInputPositions": 1000,
        "outputPositions": 100,
        "peakTotalMemoryReservation": "2MB",
        "operatorSummaries": operators or [],
    }
    stats.update(stats_over or {})
    doc = {
        "queryId": query_id,
        "query": query,
        "state": state,
        "session": {"user": user},
        "queryStats": stats,
        "inputs": [],
    }
    if update:
        doc["updateType"] = update
    if error_code:
        doc["errorCode"] = error_code
    if internal:
        doc["session"]["catalogProperties"] = {"varada": {"internal_query": "true"}}
    if plan_root is not None:
        stage: dict = {"plan": {"id": "0", "root": plan_root}, "subStages": []}
        if substage_tasks:
            stage["subStages"] = [
                {
                    "plan": {"id": "1", "root": {"@type": "values", "id": "v0"}},
                    "tasks": [
                        {
                            "taskStatus": {
                                "taskId": f"{query_id}.1.0",
                                "state": "FINISHED",
                                "self": "http://w1/task",
                            },
                            "stats": {
                                "totalScheduledTime": "1.0s",
                                "totalCpuTime": "500ms",
                                "totalBlockedTime": "0ms",
                            },
                        }
                    ],
                    "subStages": [],
                }
            ]
        doc["outputStage"] = stage
    return doc


def hive_table(schema: str, table: str, connector: str = "hive") -> dict:
    return {
        "connectorId": connector,
        "connectorHandle": {"schemaTableName": {"schema": schema, "table": table}},
    }


def scan_node(node_id: str, table: dict, attype: str = "tablescan") -> dict:
    return {"@type": attype, "id": node_id, "table": table}


def fixtures() -> list[dict]:
    docs = []

    # --- q_scan_agg: scan -> aggregation -> output; tablescan leaf
    docs.append(
        make_queryinfo(
            "20240101_080000_00001_aaaaa",
            user="alice",
            query="SELECT count(*) FROM web.logs",
            operators=[
                make_op("2", "ScanFilterAndProjectOperator", outputPositions=100),
                make_op("1", "HashAggregationOperator"),
                make_op("0", "TaskOutputOperator"),
            ],
            plan_root={
                "@type": "output",
                "id": "0",
                "source": {
                    "@type": "aggregation",
                    "id": "1",
                    "source": scan_node("2", hive_table("web", "logs")),
                },
            },
            substage_tasks=True,
        )
    )

    # --- q_inner_hash_join: criteria non-empty, INNER, PARTITIONED
    def join_doc(qid: str, criteria: list, join_type: str, dist: str, probe: str, build: str, hour: str):
        return make_queryinfo(
            qid,
            user="bob",
            query="SELECT * FROM a JOIN b USING (k)",
            operators=[
                make_op("3", probe, rawInputDataSize="4kB", inputDataSize="4kB"),
                make_op("3", build, rawInputDataSize="2kB", inputDataSize="2kB"),
                make_op("4", "TableScanOperator"),
                make_op("6", "TableScanOperator"),
            ],
            plan_root={
                "@type": "output",
                "id": "7",
                "source": {
                    "@type": "join",
                    "id": "3",
                    "criteria": criteria,
                    "type": join_type,
                    "distributionType": dist,
                    "left": scan_node("4", hive_table("web", "probe_t")),
                    "right": {
                        "@type": "exchange",
                        "id": "5",
                        "sources": [scan_node("6", hive_table("web", "build_t"))],
                    },
                },
            },
        )

    docs.append(
        join_doc(
            "20240101_090000_00002_aaaaa",
            [{"left": "k", "right": "k"}],
            "INNER",
            "PARTITIONED",
            "LookupJoinOperator",
            "HashBuilderOperator",
            "09",
        )
    )
    # --- q_broadcast_join: REPLICATED
    docs.append(
        join_doc(
            "20240101_100000_00003_aaaaa",
            [{"left": "k", "right": "k"}],
            "INNER",
            "REPLICATED",
            "LookupJoinOperator",
            "HashBuilderOperator",
            "10",
        )
    )
    # --- q_cross_join: empty criteria, INNER -> NestedLoop pair
    docs.append(
        join_doc(
            "20240102_090000_00004_aaaaa",
            [],
            "INNER",
            "REPLICATED",
            "NestedLoopJoinOperator",
            "NestedLoopBuildOperator",
            "09",
        )
    )

    # --- q_semijoin
    docs.append(
        make_queryinfo(
            "20240102_100000_00005_aaaaa",
            user="carol",
            query="SELECT * FROM a WHERE k IN (SELECT k FROM b)",
            operators=[
                make_op("8", "HashSemiJoinOperator"),
                make_op("8", "SetBuilderOperator"),
            ],
            plan_root={
                "@type": "output",
                "id": "9",
                "source": {
                    "@type": "semijoin",
                    "id": "8",
                    "distributionType": "PARTITIONED",
                    "source": scan_node("10", hive_table("web", "semi_t")),
                },
            },
        )
    )

    # --- q_exchange_deep: multi-source exchange, deepest = LAST source
    docs.append(
        make_queryinfo(
            "20240102_110000_00006_aaaaa",
            user="alice",
            query="SELECT * FROM u1 UNION ALL SELECT * FROM u2",
            operators=[make_op("11", "ScanFilterAndProjectOperator", outputPositions=0)],
            plan_root={
                "@type": "exchange",
                "id": "11",
                "sources": [
                    scan_node("12", hive_table("web", "u1")),
                    scan_node("13", hive_table("web", "u2")),
                ],
            },
        )
    )

    # --- q_prestodb_naming: FQCN @type + schemaName/tableName handle
    docs.append(
        make_queryinfo(
            "20240102_120000_00007_aaaaa",
            user="dave",
            query="SELECT * FROM legacy.t",
            operators=[make_op("14", "ScanFilterAndProjectOperator")],
            plan_root={
                "@type": "com.facebook.presto.sql.planner.plan.TableScanNode",
                "id": "14",
                "table": {
                    "connectorId": "hive",
                    "connectorHandle": {"schemaName": "legacy", "tableName": "t"},
                },
            },
        )
    )

    # --- q_memory_handle: MemoryTableHandle id-only fallback
    docs.append(
        make_queryinfo(
            "20240102_130000_00008_aaaaa",
            user="dave",
            query="SELECT * FROM memtable",
            operators=[make_op("15", "ScanFilterAndProjectOperator")],
            plan_root={
                "@type": "tablescan",
                "id": "15",
                "table": {
                    "catalogName": "memory",
                    "connectorHandle": {"@type": "memory", "id": 42},
                },
            },
        )
    )

    # --- q_jmx_handle: JMX dict-valued tableName
    docs.append(
        make_queryinfo(
            "20240102_140000_00009_aaaaa",
            user="dave",
            query="SELECT * FROM jmx.current.x",
            operators=[make_op("16", "ScanFilterAndProjectOperator")],
            plan_root={
                "@type": "tablescan",
                "id": "16",
                "table": {
                    "catalogName": "jmx",
                    "connectorHandle": {
                        "tableName": {"schema": "current", "table": "java.lang:memory"}
                    },
                },
            },
        )
    )

    # --- q_insert: updateType + written size
    docs.append(
        make_queryinfo(
            "20240103_080000_00010_aaaaa",
            user="etl",
            update="INSERT",
            query="INSERT INTO t SELECT 1",
            stats_over={"rawWrittenDataSize": "1MB"},
        )
    )

    # --- q_ddl_no_ops: empty operators, no outputStage
    docs.append(
        make_queryinfo(
            "20240103_090000_00011_aaaaa",
            user="etl",
            update="CREATE TABLE",
            query="CREATE TABLE t (x int)",
        )
    )

    # --- q_failed: dropped at analysis time
    docs.append(
        make_queryinfo(
            "20240103_100000_00012_aaaaa",
            user="alice",
            state="FAILED",
            error_code={"code": 131075, "name": "EXCEEDED_MEMORY_LIMIT"},
        )
    )

    # --- q_internal: varada internal, dropped at extract time
    docs.append(
        make_queryinfo("20240103_110000_00013_aaaaa", internal=True)
    )

    # --- q_units: exotic unit suffixes + missing optional keys + coalesces
    docs.append(
        make_queryinfo(
            "20240103_120000_00014_aaaaa",
            user="units",
            stats_over={
                "elapsedTime": "1.5m",
                "totalCpuTime": "2500us",
                "totalScheduledTime": "1h",
                "totalBlockedTime": "1d",
                "rawInputDataSize": "0B",  # falsy -> falls through to inputDataSize
                "inputDataSize": "2GB",
                "outputDataSize": "1.5TB",
                "peakTotalMemoryReservation": "3MB",
            },
            operators=[
                # no rawInputDataSize -> inputDataSize; no peak key -> 0
                {
                    "planNodeId": "20",
                    "operatorType": "FilterAndProjectOperator",
                    "inputDataSize": "1MB",
                    "outputDataSize": "1kB",
                    "inputPositions": 10,
                    "outputPositions": 5,
                    "addInputCpu": "1ns",
                    "getOutputCpu": "0ns",
                    "finishCpu": "0ns",
                    "addInputWall": "1us",
                    "getOutputWall": "0ns",
                    "finishWall": "0ns",
                    "blockedWall": "0ns",
                },
            ],
        )
    )

    return docs


def golden_corpus() -> list[dict]:
    """THE report-golden corpus — the single source both the golden test
    (tests/test_report.py) and the regenerator (tools/regen_golden_report.py)
    build from, so the checked-in digest can never drift from the corpus
    the test actually constructs."""
    docs = fixtures()
    # one user with a >30-char name to exercise label shortening
    docs.append(
        make_queryinfo(
            "20240104_080000_00020_aaaaa",
            user="a_very_long_user_name_that_exceeds_thirty_chars",
        )
    )
    return docs


def wide_corpus() -> list[dict]:
    """A 1215-query / 45-user corpus that exercises the pie-collapse kernel
    paths the small golden corpus never reaches: the top-20 rank cap (45
    users > 20), the >0.1%-share drop (five 1-query users at 0.082%), the
    'All the rest' merge row, and the rounding-residual push into the last
    slice. Table names cycle over 27 values so the table-scan pies collapse
    too. Everything is a deterministic formula of the query index.

    Wall times use quadratic residues ((qi*qi) mod primes), NOT plain
    qi-mod cycles: periodic walls summed over the 27 aligned table
    classes produce EXACTLY equal per-table totals, and a top-K selection
    tie at the rank boundary is unstable across engines (fp summation
    order differs in the last ulp, so ref and Spark can legitimately keep
    different tables). Real corpora don't have perfectly symmetric table
    walls; the fixtures shouldn't either."""
    docs = []
    counts = [700] + [50] * 9 + [2] * 30 + [1] * 5  # 45 users, skewed
    qi = 0
    for u, cnt in enumerate(counts):
        for _ in range(cnt):
            qi += 1
            day = 1 + qi % 3
            in_rows = 1 + (qi * 13) % 1000
            out_rows = (qi * 7) % (in_rows + 1)
            table = hive_table(f"s{qi % 5}", f"t{qi % 27}")
            docs.append(
                make_queryinfo(
                    f"2024020{day}_{qi % 24:02d}{qi % 60:02d}{(qi * 3) % 60:02d}_{qi:05d}_bbbbb",
                    user=f"user_{u}",
                    update=[None, "INSERT", None, "CREATE TABLE"][qi % 4],
                    query=f"SELECT * FROM t{qi % 27}",
                    stats_over={
                        "elapsedTime": f"{(qi % 50) / 10}s",
                        "totalCpuTime": f"{qi % 30}s",
                        "totalScheduledTime": f"{qi % 40}m",
                        "totalBlockedTime": f"{qi % 9}s",
                        "rawInputDataSize": f"{qi % 17}GB",
                        "outputDataSize": f"{qi % 5}MB",
                        "peakTotalMemoryReservation": f"{1 + qi % 9}GB",
                        "rawInputPositions": (qi * 13) % 10000,
                        "outputPositions": qi % 97,
                    },
                    operators=[
                        make_op(
                            "2",
                            "ScanFilterAndProjectOperator",
                            rawInputPositions=in_rows,
                            inputPositions=in_rows,
                            outputPositions=out_rows,
                            rawInputDataSize=f"{qi % 23}MB",
                            inputDataSize=f"{qi % 23}MB",
                            addInputWall=f"{(qi * qi) % 199}ms",
                            getOutputWall=f"{(qi * qi * 3) % 83}ms",
                            finishWall=f"{qi % 4}ms",
                        ),
                        make_op(
                            "1",
                            "HashAggregationOperator",
                            rawInputPositions=out_rows,
                            inputPositions=out_rows,
                            outputPositions=max(out_rows // 2, 1),
                            addInputWall=f"{qi % 11}ms",
                        ),
                    ],
                    plan_root={
                        "@type": "output",
                        "id": "0",
                        "source": {
                            "@type": "aggregation",
                            "id": "1",
                            "source": scan_node("2", table),
                        },
                    },
                )
            )
    return docs
