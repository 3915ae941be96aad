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


def test_never_verified_fill_their_quota():
    """Never-hash-verified queries fill every window slot NOT reserved
    for the gate or the oldest-green quota (round-5 verdict: the quota
    stops a registration burst from starving the stale tier)."""
    names = list(dq.queries())
    latest, ever = dq._verified_names()
    never = [n for n in names if n not in ever and n not in dq._GATE]
    expired = [
        n for n in names
        if n in ever and n not in latest and n not in dq._GATE
    ]
    window = names[:WINDOW]
    reserved = min(len(expired), dq._EXPIRED_QUOTA)
    free_slots = WINDOW - len(dq._GATE) - reserved
    expected = min(len(never), free_slots)
    # LOWER bound, not equality: these assertions read the repo's live
    # CORRECTNESS_r*.json state, which changes whenever a driver artifact
    # lands. The scheduler may legitimately admit MORE names than the
    # floor (e.g. the stale drain self-raises once the never tier
    # underfills) — pin the invariant, not a snapshot (round-7 verdict).
    assert sum(1 for n in window if n in never) >= expected
    # when the backlog fits, every never-verified query is in the window
    if len(never) <= free_slots:
        assert all(n in window for n in never)


def test_expired_quota_reserved_in_window():
    """At least min(quota, len(expired)) oldest-green names sit INSIDE the
    50-slot window even when the never-verified backlog alone could fill
    it — the round-5 fix for the three-rounds-stale x02–x19 block."""
    names = list(dq.queries())
    latest, ever = dq._verified_names()
    expired = [
        n for n in names
        if n in ever and n not in latest and n not in dq._GATE
    ]
    window = set(names[:WINDOW])
    expect = min(len(expired), dq._EXPIRED_QUOTA)
    assert sum(1 for n in expired if n in window) >= expect
    # and the ones in the window are the OLDEST ones
    if expired:
        oldest_round = min(ever[n] for n in expired)
        oldest = [n for n in expired if ever[n] == oldest_round]
        in_win = sum(1 for n in oldest if n in window)
        # >= not ==: once the never-verified tier underfills its slots the
        # scheduler correctly lets EXTRA oldest-green names flow into the
        # window beyond the quota floor (round-7 verdict item 1 — the
        # r07 artifact landing shrank the never tier to 17 and 13 extra
        # stale names entered the window; that is the desired drain).
        assert in_win >= min(len(oldest), expect)


def test_group_order_never_then_expired_then_latest():
    """Outside the quota head, tier order still holds: never-verified
    tail before expired tail before latest-verified. The quota carves
    exactly _EXPIRED_QUOTA expired names into the window head; every
    OTHER expired name must still follow every never-verified name."""
    names = list(dq.queries())
    latest, ever = dq._verified_names()
    pos = {n: i for i, n in enumerate(names)}
    non_gate = [n for n in names if n not in dq._GATE]
    never = [n for n in non_gate if n not in ever]
    expired = [n for n in non_gate if n in ever and n not in latest]
    done = [n for n in non_gate if n in latest]
    expired_tail = sorted(expired, key=lambda n: pos[n])[dq._EXPIRED_QUOTA:]
    if never and expired_tail:
        assert max(pos[n] for n in never) < min(pos[n] for n in expired_tail)
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
    pos = {n: i for i, n in enumerate(names)}
    # ahead of every expired name OUTSIDE the reserved quota head, and of
    # every latest-verified name (the quota itself may legitimately sit
    # ahead of a new registration that overflows the never tier's slots)
    expired = sorted(
        (n for n in names if n in ever and n not in latest and n not in dq._GATE),
        key=lambda n: pos[n],
    )
    after_quota = expired[dq._EXPIRED_QUOTA:] + [
        n for n in names if n in latest and n not in dq._GATE
    ]
    if after_quota:
        assert pos["z99_brand_new"] < min(pos[n] for n in after_quota)


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
    """With the real registry + recorded rounds: the quota guarantees the
    OLDEST stale names drain at >= _EXPIRED_QUOTA per round regardless of
    the never-verified backlog (the round-5 fix)."""
    latest, last_round = dq._verified_names()
    if not last_round:
        return
    stale = {n: r for n, r in last_round.items() if n not in latest}
    stale = {n: r for n, r in stale.items() if n not in dq._GATE and n in dq._QUERIES}
    if not stale:
        return
    oldest = min(stale.values())
    oldest_names = [n for n, r in stale.items() if r == oldest]
    window = set(list(dq.queries())[:WINDOW])
    expect = min(len(oldest_names), dq._EXPIRED_QUOTA)
    assert sum(1 for n in oldest_names if n in window) >= expect


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


def test_window_composition_bounded(monkeypatch):
    """ADVICE r8 item 2: the >= floors alone would let a scheduler bug
    flood the window past the tier quotas and starve the latest tier.
    Complement them with the composition invariants that DO hold as
    equalities for any CORRECTNESS state:

      * the window is exactly WINDOW names (when the registry is bigger);
      * gate/never/expired/done partition the registry (disjoint, total);
      * no latest-verified (done) name occupies a window slot while ANY
        never-verified or expired name sits outside the window — the
        freshest tier only ever receives RESIDUAL slots.

    Asserted on the live artifact state and on two synthetic extremes
    (all-never flood, all-expired flood)."""

    def check():
        names = list(dq.queries())
        latest, ever = dq._verified_names()
        window = names[:WINDOW]
        assert len(window) == min(WINDOW, len(names))
        gate = [n for n in dq._GATE if n in dq._QUERIES]
        non_gate = [n for n in names if n not in gate]
        never = {n for n in non_gate if n not in ever}
        expired = {n for n in non_gate if n in ever and n not in latest}
        done = {n for n in non_gate if n in latest}
        # partition: disjoint and total
        assert never | expired | done == set(non_gate)
        assert not (never & expired or never & done or expired & done)
        # upper bound on freshest-tier admission: a done name in the
        # window implies every never/expired name is also in the window
        outside = set(names[WINDOW:])
        if (never | expired) & outside:
            assert not (done & set(window))

    check()  # live artifact state
    # synthetic extreme 1: huge never tier (registration burst)
    names = list(dq._QUERIES)
    monkeypatch.setattr(dq, "_verified_names", lambda: (set(), {}))
    check()
    # synthetic extreme 2: everything expired (stale flood)
    monkeypatch.setattr(
        dq,
        "_verified_names",
        lambda: (set(dq._GATE), {n: 1 for n in names}),
    )
    check()


def test_window_fills_with_expired_once_backlog_clears(monkeypatch):
    """When the never-verified tier empties (the round-8 state), the
    50-slot window must fill with gate + oldest-green names — the
    expired quota is a FLOOR, not a cap: tail order puts expired-rest
    right after the (empty) never tier, so the drain rate becomes
    ~(window - gate) per round."""
    names = list(dq._QUERIES)
    # everything verified once in round 1; only the gate is latest-green
    last = {n: 1 for n in names}
    latest = set(dq._GATE)
    monkeypatch.setattr(dq, "_verified_names", lambda: (latest, last))
    ordered = list(dq._ordered(dq._QUERIES))
    window = ordered[:50]
    assert window[: len(dq._GATE)] == [n for n in dq._GATE if n in dq._QUERIES]
    expired = [n for n in names if n not in latest]
    # every non-gate window slot is an expired name (registration order
    # within the same staleness round)
    assert all(n in expired for n in window[len(dq._GATE):])
    assert len(window) == 50
