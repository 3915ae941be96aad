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


@pytest.fixture(autouse=True)
def _full_dataflow_plans(monkeypatch):
    """The lint must see the FULL dataflow: materialize.py's lazy
    localCheckpoints truncate plans at RDD-scan leaves, which would hide
    a banned shape (cartesian / BatchEvalPython / raw-input window)
    inside a checkpointed subtree. Same kill-switch + silver-cache clear
    as test_plan_pushdown."""
    monkeypatch.setenv("PWA_NO_MATERIALIZE", "1")
    driver_queries._ADAPTER_CACHE.clear()
    yield
    driver_queries._ADAPTER_CACHE.clear()

# query -> Arrow-batched operators it is allowed to plan
_ALLOWED_PANDAS = {
    "x11_multimodal_meta",      # mapInPandas decode plumbing (declared surface)
    "x13_ivf_ann_topk",         # MLlib KMeans internals + assignment UDF
    "x19_cosine_topk_pandas",   # Arrow/BLAS matmul variant (declared surface)
    "x133_audio_meta_pipeline", # WAV synth + RIFF parse kernels (declared surface)
    "x134_video_meta_pipeline", # MP4 synth + box-walk kernels (declared surface)
    "x135_audio_quality_gate",  # PCM synth + feature kernels (declared surface)
    "x136_png_decode_pipeline", # PNG encode + real-decode kernels (declared surface)
    "x137_dhash_pipeline",      # PNG synth + perceptual-hash kernels (declared surface)
    "x138_gif_decode_pipeline", # GIF synth + LZW-decode kernels (declared surface)
    "x139_resize_pipeline",     # PNG synth + resize + decode chain (declared surface)
    "xs4_mjpeg_frame_pipeline", # AVI synth + MJPEG frame decode (declared surface)
    "xs1_semantic_dedup",       # per-cluster Gram-matmul cosine (declared surface,
                                # same class as x19's BLAS path; expr twin tested)
    "xs17_bfd_packing",         # best-fit-decreasing shard walk: sequential by
                                # nature, one FlatMapGroupsInPandas per
                                # (source, shard) group (declared surface;
                                # python-twin equivalence tested)
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


# Corpus columns whose cardinality does NOT grow with the data (enum-ish
# schema facts): a rank/prefix-sum window partitioned ONLY by these funnels
# each group's entire row set through one task at 100 TB — the round-3
# verdict's x39 finding (the unpartitioned-window killer wearing a
# low-cardinality key). High-cardinality shard keys (doc_id ranges, hash
# prefixes) added by the hierarchical formulations make the key compound
# and exempt the window.
_LOW_CARDINALITY_COLS = {
    "source", "lang", "pred_lang", "event_type", "update_type", "split",
    "quartile", "advisory", "bin",
}


def _window_partition_cols(line: str) -> list[list[str]]:
    """Base column names of every windowspecdefinition's PARTITION BY on a
    plan line: arguments before the first sort-order marker, stripped of
    exprId suffixes."""
    import re

    specs = []
    for spec in re.findall(r"windowspecdefinition\(([^)]*)", line):
        cols = []
        for arg in spec.split(","):
            arg = arg.strip()
            if " ASC" in arg or " DESC" in arg or "windowframe" in arg:
                break
            m = re.match(r"(\w+)#\d+", arg)
            if m:
                cols.append(m.group(1))
        specs.append(cols)
    return specs


def _lint_low_cardinality_windows(plan: str, name: str) -> None:
    """Raise AssertionError for any window partitioned only by enum-ish
    columns over raw (non-aggregated) input — see the parametrized test."""

    def _depth(line: str) -> int:
        for idx, ch in enumerate(line):
            if ch.isalnum():
                return idx
        return len(line)

    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Window " not in line:
            continue
        flagged = [
            cols
            for cols in _window_partition_cols(line)
            if cols and all(c in _LOW_CARDINALITY_COLS for c in cols)
        ]
        if not flagged:
            continue
        # walk the window's input subtree in pre-order: aggregated input
        # means an Aggregate appears before any file scan
        d = _depth(line)
        verdict = None
        for j in range(i + 1, len(lines)):
            if _depth(lines[j]) <= d:
                break
            if "Aggregate(" in lines[j]:
                verdict = "aggregated"
                break
            if "Scan " in lines[j] or "FileScan" in lines[j]:
                verdict = "raw"
                break
        assert verdict == "aggregated", (
            f"{name} plans a window partitioned only by low-cardinality "
            f"columns {flagged} over raw (non-aggregated) rows — each "
            f"group funnels through ONE task at scale:\n"
            + "\n".join(lines[i : i + 6])
        )


@pytest.mark.parametrize("name", _batch_query_names())
def test_no_low_cardinality_window_over_raw_rows(spark, name):
    """A window whose partition key consists ONLY of enum-ish columns must
    run over pre-AGGREGATED input (cardinality = #groups — e.g. x37's
    share-of-total over confusion cells, or the hierarchical rankers'
    per-shard offset windows over (group, shard) counts). Over raw corpus
    rows it is the per-group single-task sort: the hierarchical
    formulations (sampling._hierarchical_row_number, textstats.pack_bins)
    exist precisely so no driver query ever plans that shape."""
    df = driver_queries.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    _lint_low_cardinality_windows(plan, name)


def test_low_cardinality_lint_catches_naive_shape(spark):
    """Negative control: the round-3 x39 formulation (running-sum window
    partitioned by `source` alone over raw documents) must trip the lint —
    and the hierarchical pack_bins replacement must not."""
    from pyspark.sql import Window, functions as F

    from presto_workload_analyzer_spark.extensions.textstats import (
        pack_bins,
        token_count,
    )
    from presto_workload_analyzer_spark.sources import read_table

    docs = read_table(spark, f"{SF_DIR}/documents.parquet").select(
        "source", "doc_id", token_count("text").cast("long").alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    naive = docs.withColumn(
        "bin",
        (F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / 2000).cast("long"),
    )
    with pytest.raises(AssertionError, match="low-cardinality"):
        _lint_low_cardinality_windows(
            naive._jdf.queryExecution().executedPlan().toString(), "naive_x39"
        )
    fixed = pack_bins(docs, "source", "doc_id", "n_tokens", 2000, shard_size=128)
    _lint_low_cardinality_windows(
        fixed._jdf.queryExecution().executedPlan().toString(), "pack_bins"
    )


def test_pack_bins_top_window_is_doubly_aggregated(spark):
    """Round-4 verdict item 4: the only window pack_bins partitions by the
    source column ALONE must run over shard-of-shards totals — TWO
    Aggregates between it and the file scan — so its input cardinality is
    n_rows / shard_size² per group (a constant-bounded single-task frame
    at any scale), not n_rows / shard_size."""
    from presto_workload_analyzer_spark.extensions.textstats import (
        pack_bins,
        token_count,
    )
    from presto_workload_analyzer_spark.sources import read_table

    docs = read_table(spark, f"{SF_DIR}/documents.parquet").select(
        "source", "doc_id", token_count("text").cast("long").alias("n_tokens")
    )
    plan = (
        pack_bins(docs, "source", "doc_id", "n_tokens", 2000, shard_size=128)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )

    def _depth(line):
        for idx, ch in enumerate(line):
            if ch.isalnum():
                return idx
        return len(line)

    lines = plan.splitlines()
    checked = 0
    for i, line in enumerate(lines):
        if "Window " not in line:
            continue
        specs = [c for c in _window_partition_cols(line) if c == ["source"]]
        if not specs:
            continue
        # count Aggregates in the window's input subtree down to the scan
        d = _depth(line)
        n_aggs = 0
        for j in range(i + 1, len(lines)):
            if _depth(lines[j]) <= d:
                break
            if "Aggregate(" in lines[j]:
                n_aggs += 1
            if "Scan " in lines[j] or "FileScan" in lines[j]:
                break
        assert n_aggs >= 2, (
            f"source-only window over input aggregated only {n_aggs}x:\n"
            + "\n".join(lines[i : i + 8])
        )
        checked += 1
    assert checked >= 1, "expected at least one source-only window in pack_bins"
