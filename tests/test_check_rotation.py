"""The driver verifies the FIRST 50 registered queries, so queries() order
is the verification schedule. These tests pin the scheduling rule without
any Spark session: gate block always first, never-verified queries next
(hint order), already-verified queries yield their window slot."""

from presto_workload_analyzer_spark import driver_queries as dq


def test_gate_always_leads():
    names = list(dq.queries())
    assert names[: len(dq._GATE)] == dq._GATE


def test_rotation_hint_inside_window_when_unverified():
    window = set(list(dq.queries())[:50])
    verified = dq._verified_names()
    for name in dq._ROTATION_HINT:
        if name not in verified:
            assert name in window, name


def test_verified_queries_yield_window_slots(monkeypatch):
    # simulate a future round where this round's rotation has been verified:
    # every remaining never-checked query must slide into the window
    simulated = dq._verified_names() | set(dq._ROTATION_HINT)
    monkeypatch.setattr(dq, "_verified_names", lambda: simulated)
    names = list(dq.queries())
    never = [n for n in names if n not in simulated and n not in dq._GATE]
    window = names[:50]
    for n in never:
        assert n in window, f"{n} still starved of a verification slot"
    # and verified non-gate names come after every never-checked one
    last_never = max(names.index(n) for n in never) if never else 0
    first_done = min(
        names.index(n) for n in names if n in simulated and n not in dq._GATE
    )
    assert first_done > last_never


def test_all_registered_queries_survive_reordering():
    assert set(dq.queries()) == set(dq._QUERIES)
    oracles = dq.oracle_sql()
    assert set(oracles) == set(dq._ORACLES)
