"""STAGED driver queries — implemented, oracle-paired, locally verified,
NOT yet registered.

The staging cadence (proven over rounds 7-12): implement the operator in
extensions/, pair it with an exact DuckDB oracle here, get
tests/test_staged_queries.py green at BOTH sf0.001 and sf0.01 (the same
spark-vs-DuckDB compare the local gate applies to registered queries,
plus the plan lint's core bans and the oracle dtype ban), then register
next round by moving the (name, fn, sql) triple into
driver_queries._register — a move, not a debugging session.

Registration history: xs1-xs5 (round 9, registry 222 -> 227),
xs6-xs13 + s18 (round 11, 227 -> 236), xs14-xs19 + s19 + s20
(round 12, 236 -> 244).

The staging area is currently EMPTY between batches — the parametrized
tests in tests/test_staged_queries.py collect as skips, and the harness
stays in place for the next batch.

Registration checklist for each future entry:
  * move (name, fn, sql) into driver_queries._register;
  * if the plan uses a declared Arrow surface (mapInPandas etc.), add the
    name to tests/test_plan_lint._ALLOWED_PANDAS;
  * column names aliased identically on both sides, integer aggregates
    cast to BIGINT, floats rounded to 6 after scaling, no
    HUGEINT/DECIMAL/UHUGEINT anywhere in the oracle's DESCRIBE.
"""

from __future__ import annotations

STAGED: dict[str, tuple] = {}
