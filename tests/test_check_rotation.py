"""The driver verifies the FIRST 50 registered queries, so queries() order
is the verification schedule. These tests pin the scheduling rule without
any Spark session: sentinel gate first, queries never hash-verified in ANY
recorded round next (first-ever verification outranks freshness), then
expired passes, then the latest round's passes at the back."""

from presto_workload_analyzer_spark import driver_queries as dq

WINDOW = 50


def test_gate_always_leads():
    names = list(dq.queries())
    assert names[: len(dq._GATE)] == dq._GATE
    # the gate is a SMALL sentinel set by design: shrinking it is what
    # freed the window for first-ever verification of late-round queries
    assert len(dq._GATE) <= 12


def test_never_verified_lead_the_window():
    """Every query no round has ever hash-verified must land inside the
    50-slot window (or fill every free slot when there are more of them
    than slots — round-robin, not starvation)."""
    names = list(dq.queries())
    _, ever = dq._verified_names()
    never = [n for n in names if n not in ever and n not in dq._GATE]
    window = names[:WINDOW]
    free_slots = WINDOW - len(dq._GATE)
    expected = min(len(never), free_slots)
    assert sum(1 for n in window if n in never) == expected
    # with the current registry/record state they must ALL fit — this is
    # the round-4 contract: no never-verified query waits another round
    if len(never) <= free_slots:
        assert all(n in window for n in never)


def test_group_order_never_then_expired_then_latest():
    names = list(dq.queries())
    latest, ever = dq._verified_names()
    pos = {n: i for i, n in enumerate(names)}
    non_gate = [n for n in names if n not in dq._GATE]
    never = [n for n in non_gate if n not in ever]
    expired = [n for n in non_gate if n in ever and n not in latest]
    done = [n for n in non_gate if n in latest]
    if never and expired:
        assert max(pos[n] for n in never) < min(pos[n] for n in expired)
    if expired and done:
        assert max(pos[n] for n in expired) < min(pos[n] for n in done)


def test_new_registrations_auto_front(monkeypatch):
    """A query registered this round (absent from every CORRECTNESS file)
    must sort ahead of every expired-verified name with no hint-list edit —
    the round-3 advisory: brand-new operators were deferred behind expired
    passes because the old hint list didn't know them."""
    fake = object.__getattribute__(dq, "_QUERIES").copy()
    fake["z99_brand_new"] = lambda spark, sf: None
    monkeypatch.setattr(dq, "_QUERIES", fake)
    names = list(dq._ordered(fake))
    latest, ever = dq._verified_names()
    expired_or_done = [n for n in names if n in ever]
    assert names.index("z99_brand_new") < min(
        names.index(n) for n in expired_or_done if n not in dq._GATE
    )


def test_round_verified_ignores_stale_no_oracle(monkeypatch):
    """A rows-only (no_oracle) record counts as verified ONLY while the
    registry still has no oracle for that name: once an oracle ships, the
    query re-enters the never-verified front group for a first real run."""
    rows = {
        "q_still_rows_only": {"hash_match": None, "err": "no_oracle"},
        "q_gained_oracle": {"hash_match": None, "err": "no_oracle"},
        "q_hash_ok": {"hash_match": True, "err": None},
    }
    oracles = dq._ORACLES.copy()
    oracles["q_still_rows_only"] = None
    oracles["q_gained_oracle"] = "SELECT 1"
    monkeypatch.setattr(dq, "_ORACLES", oracles)
    got = dq._round_verified(rows)
    assert got == {"q_still_rows_only", "q_hash_ok"}


def test_correctness_rounds_tolerates_bad_shapes(tmp_path, monkeypatch):
    """A CORRECTNESS file whose top level is a JSON array (or junk) must be
    skipped, not crash every queries()/oracle_sql() call."""
    (tmp_path / "pkg").mkdir()
    (tmp_path / "CORRECTNESS_r01.json").write_text("[1, 2, 3]")
    (tmp_path / "CORRECTNESS_r02.json").write_text("not json at all")
    (tmp_path / "CORRECTNESS_r03.json").write_text('{"q": {"hash_match": true}}')
    import os

    real_dirname = os.path.dirname

    def fake_dirname(p):
        # _correctness_rounds derives the repo root by double-dirname of
        # the module file; point it at tmp_path instead
        return str(tmp_path) if p == real_dirname(dq.__file__) else real_dirname(p)

    monkeypatch.setattr(os.path, "dirname", fake_dirname)
    rounds = dq._correctness_rounds()
    assert rounds == [{"q": {"hash_match": True}}]


def test_expired_sorted_oldest_green_first(monkeypatch):
    """Round-4 verdict item 1: within the expired group, a query last
    hash-verified two rounds ago must outrank one verified last round
    (oldest-green-first), so the window always covers the longest-stale
    queries — never-verified-first alone starved already-verified-but-stale
    names for two rounds."""
    rounds = [
        {"q_old": {"hash_match": True}},                                  # r1
        {"q_mid": {"hash_match": True}},                                  # r2
        {"q_fresh": {"hash_match": True}},                                # r3 (latest)
    ]
    monkeypatch.setattr(dq, "_correctness_rounds", lambda: rounds)
    fake = {
        "q_mid": lambda s, d: None,    # registered BEFORE q_old on purpose:
        "q_old": lambda s, d: None,    # staleness must beat registration order
        "q_fresh": lambda s, d: None,
    }
    names = list(dq._ordered(fake))
    assert names == ["q_old", "q_mid", "q_fresh"]


def test_staleness_bound_live():
    """With the real registry + recorded rounds: every non-gate query whose
    latest green row is the OLDEST recorded stale round must sit inside the
    50-slot window (the concrete round-5 goal: no query's latest driver row
    older than 2 rounds once this window runs)."""
    latest, last_round = dq._verified_names()
    if not last_round:
        return
    stale = {n: r for n, r in last_round.items() if n not in latest}
    if not stale:
        return
    oldest = min(stale.values())
    oldest_names = [n for n, r in stale.items() if r == oldest and n not in dq._GATE]
    window = set(list(dq.queries())[:WINDOW])
    never = [n for n in dq._QUERIES if n not in last_round and n not in dq._GATE]
    free = WINDOW - len(dq._GATE) - len(never)
    # all oldest-stale names that can fit must be in the window
    assert sum(1 for n in oldest_names if n in window) == min(len(oldest_names), max(free, 0))


def test_all_registered_queries_survive_reordering():
    assert set(dq.queries()) == set(dq._QUERIES)
    oracles = dq.oracle_sql()
    assert set(oracles) == set(dq._ORACLES)


def test_every_query_has_an_oracle():
    """Round-4 invariant: ZERO rows-only queries — every registered query
    carries a real DuckDB oracle (x13 via the IVF exactness reduction,
    x20 via the verified-LSH formulation). A new rows-only registration
    is a deliberate decision, not a default: fail here first."""
    missing = [n for n, sql in dq._ORACLES.items() if sql is None]
    assert missing == []
    assert set(dq._ORACLES) == set(dq._QUERIES)
