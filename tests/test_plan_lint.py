"""Engine-wide plan lint: no driver query may fall off the JVM fast path.

"UDFs are the slow path" is an architectural rule here, not a convention:
every batch query's physical plan is checked for Python-eval operators.
Row-at-a-time Python (`BatchEvalPython`) is banned outright; Arrow-batched
Pandas surfaces (`MapInPandas` / `ArrowEvalPython` / pandas group apply)
are allowed only for the explicitly declared operators that need them
(multimodal decode, the BLAS cosine path, MLlib internals). A regression
that sneaks a Python UDF into an analyzer fails here, not in a profiler
six months later.

Streaming queries (s*) are exempt from construction (building them runs a
full availableNow drain); their one declared Python surface
(applyInPandasWithState sessionization) has its own tests.
"""

import pytest

from presto_workload_analyzer_spark import driver_queries

SF_DIR = "/root/testdata/sf0.001"

# query -> Arrow-batched operators it is allowed to plan
_ALLOWED_PANDAS = {
    "x11_multimodal_meta",      # mapInPandas decode plumbing (declared surface)
    "x13_ivf_ann_topk",         # MLlib KMeans internals + assignment UDF
    "x19_cosine_topk_pandas",   # Arrow/BLAS matmul variant (declared surface)
}

_PANDAS_MARKERS = (
    "MapInPandas",
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
    "AggregateInPandas",
)


def _batch_query_names():
    return [n for n in sorted(driver_queries.queries()) if not n.startswith("s")]


@pytest.mark.parametrize("name", _batch_query_names())
def test_no_python_row_eval_in_plan(spark, name):
    df = driver_queries.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, f"{name} plans a row-at-a-time Python UDF"
    if name not in _ALLOWED_PANDAS:
        for marker in _PANDAS_MARKERS:
            assert marker not in plan, (
                f"{name} plans {marker} but is not a declared Pandas-UDF surface"
            )


# queries allowed to plan an unblocked pair join: x06 is the exact all-pairs
# oracle twin, explicitly capped (its scale path is x33, which is linted)
_ALLOWED_CARTESIAN = {"x06_embedding_near_dups"}


@pytest.mark.parametrize("name", _batch_query_names())
def test_no_unpartitioned_window_or_cartesian(spark, name):
    """Two 100 TB scale-killers, asserted structurally on every batch plan:

    1. A window function with no PARTITION BY funnels the whole input
       through ONE task (`Exchange SinglePartition` directly feeding a
       Sort+Window). Global aggregates also plan SinglePartition but only
       move pre-aggregated partials, so the lint keys on the Window
       operator, not the exchange alone.
    2. `CartesianProduct` is the unblocked all-pairs join. (Broadcast
       nested-loop joins are NOT banned: broadcasting a tiny bounds row —
       e.g. x31's percentile boundaries — is the intended pattern.)
    """
    df = driver_queries.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()

    def _depth(line: str) -> int:
        # tree glyphs (space, :, +, -, *, parens of codegen ids) precede the
        # operator name; depth = index of its first alphanumeric character
        for idx, ch in enumerate(line):
            if ch.isalnum():
                return idx
        return len(line)

    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Window " not in line:
            continue
        # walk the window's INPUT subtree (strictly deeper lines) until the
        # tree dedents back past the window — not a fixed line budget; a
        # chain of Projects/Filters must not hide the single-partition
        # exchange from the lint
        d = _depth(line)
        for j in range(i + 1, len(lines)):
            if _depth(lines[j]) <= d:
                break
            if "Window " in lines[j]:
                break  # nested window: it gets its own check
            if "Exchange SinglePartition" not in lines[j]:
                continue
            # single-reducer window: acceptable ONLY over pre-aggregated
            # input (cardinality = #groups, e.g. the pie kernel's share-of-
            # total over per-label sums) — an Aggregate must feed the
            # exchange. Over raw corpus rows (the round-1 global-ntile
            # shape) it is THE scale-killer this lint exists to catch.
            feeds = "\n".join(lines[j + 1 : j + 5])
            assert "Aggregate(" in feeds, (
                f"{name} plans an unpartitioned window over non-aggregated "
                f"input (whole dataset through one reducer):\n"
                + "\n".join(lines[i : j + 5])
            )
            break
    if name not in _ALLOWED_CARTESIAN:
        assert "CartesianProduct" not in plan, (
            f"{name} plans an unblocked CartesianProduct join"
        )
