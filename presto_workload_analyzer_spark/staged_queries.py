"""STAGED driver queries — implemented, oracle-paired, locally verified,
NOT yet registered.

The staging cadence (proven over rounds 7-11): implement the operator in
extensions/, pair it with an exact DuckDB oracle here, get
tests/test_staged_queries.py green at BOTH sf0.001 and sf0.01 (the same
spark-vs-DuckDB compare the local gate applies to registered queries,
plus the plan lint's core bans and the oracle dtype ban), then register
next round by moving the (name, fn, sql) triple into
driver_queries._register — a move, not a debugging session.

Rounds 7-8 staged xs1-xs5 (SemDeDup, DSIR weights, DSIR mix, MJPEG frame
pipeline, guard-ON LSH); round 9 registered them. Round 10 staged
xs6-xs13 + s18 (UniMax mixing, held-out bigram perplexity,
cluster-balanced sampling, temperature mixing, the Gopher rule +
repetition batteries, the perplexity-filter keep decision, a streaming
quality gate, DSIR importance resampling); round 11 registered them
(driver_queries.py, the "Round-11 registration" section; registry
227 -> 236).

Registration checklist for each entry:
  * move (name, fn, sql) into driver_queries._register;
  * if the plan uses a declared Arrow surface (mapInPandas etc.), add the
    name to tests/test_plan_lint._ALLOWED_PANDAS;
  * column names aliased identically on both sides, integer aggregates
    cast to BIGINT, floats rounded to 6 after scaling, no
    HUGEINT/DECIMAL/UHUGEINT anywhere in the oracle's DESCRIBE.

(While this dict is empty between batches, test_staged_queries'
parametrized tests collect as skips — the harness stays in place for the
next batch.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: F401

STAGED: dict[str, tuple] = {}
