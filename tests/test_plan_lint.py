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
