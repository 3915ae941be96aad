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
    # the never-checked queries must fill EVERY free window slot (when more
    # remain than slots, the overflow waits exactly one more round — the
    # round-robin, not starvation), and every verified non-gate name sorts
    # after every never-checked one
    simulated = dq._verified_names() | set(dq._ROTATION_HINT)
    monkeypatch.setattr(dq, "_verified_names", lambda: simulated)
    names = list(dq.queries())
    never = [n for n in names if n not in simulated and n not in dq._GATE]
    free_slots = 50 - len(dq._GATE)
    window_tail = names[len(dq._GATE) : 50]
    expected_in_window = min(len(never), free_slots)
    assert sum(1 for n in window_tail if n in never) == expected_in_window
    last_never = max(names.index(n) for n in never) if never else 0
    first_done = min(
        names.index(n) for n in names if n in simulated and n not in dq._GATE
    )
    assert first_done > last_never


def test_all_registered_queries_survive_reordering():
    assert set(dq.queries()) == set(dq._QUERIES)
    oracles = dq.oracle_sql()
    assert set(oracles) == set(dq._ORACLES)
