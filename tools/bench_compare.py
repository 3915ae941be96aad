"""Bench adjudication: compare a bench_detail.json against a control.

The repeatable form of the protocol BASELINE.md rounds 10-13 ran by
hand each time a bench total moved: on an episodic host the RAW TOTAL
is the least trustworthy statistic — the robust ones are

  * the per-query MEDIAN ratio vs the committed control (a uniform host
    factor moves the median; a regression moves specific queries);
  * the episode window: a co-tenant incident inflates a CONTIGUOUS
    execution-order run of queries (bench.py records `ended_at` for
    exactly this), while a real regression follows code, not the clock;
  * the tail movers list, pre-filtered to queries big enough to measure
    (ratios of 0.2 s walls are noise).

Usage:
    python tools/bench_compare.py CANDIDATE.json [CONTROL.json]
    # CONTROL defaults to the committed bench_detail.json (git show HEAD:)

Exit code 0 always — this is an adjudication aid, not a gate; the value
gates (tools/check_correctness.py) are the pass/fail machinery.
"""

from __future__ import annotations

import argparse
import json
import statistics
import subprocess
import sys

# a mover must be at least this big in the control to be reportable
MIN_CONTROL_WALL = 0.5
# a mover must move at least this much to be reportable
MOVER_RATIO = 1.5
# windowing: a run of >= this many consecutive (by ended_at) inflated
# queries is flagged as an episode window
WINDOW_MIN_RUN = 4
WINDOW_RATIO = 1.4


def load(path: str) -> dict:
    if path.startswith("git:"):
        out = subprocess.run(
            ["git", "show", path[4:]], capture_output=True, text=True
        )
        if out.returncode != 0:
            sys.exit(f"git show failed: {out.stderr.strip()}")
        return json.loads(out.stdout)
    with open(path) as fh:
        return json.load(fh)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("candidate", help="bench_detail.json to adjudicate")
    ap.add_argument(
        "control",
        nargs="?",
        default="git:HEAD:bench_detail.json",
        help="control detail (default: the committed bench_detail.json;"
        " use git:<rev>:bench_detail.json for another revision)",
    )
    args = ap.parse_args()
    cand, ctrl = load(args.candidate), load(args.control)
    for tag, d in (("candidate", cand), ("control", ctrl)):
        if not isinstance(d.get("queries"), dict):
            sys.exit(f"{tag} detail has no 'queries' map — not a bench_detail.json")
        if not isinstance(d.get("value"), (int, float)) or d["value"] <= 0:
            sys.exit(
                f"{tag} detail lacks a positive 'value' (got {d.get('value')!r})"
                " — truncated or malformed bench_detail.json"
            )

    shared = [
        k
        for k, v in ctrl["queries"].items()
        if k in cand["queries"] and v >= MIN_CONTROL_WALL
    ]
    if not shared:
        sys.exit("no shared queries above the measurement floor")
    ratios = {k: cand["queries"][k] / ctrl["queries"][k] for k in shared}
    med = statistics.median(ratios.values())
    print(
        f"totals: candidate {cand['value']} vs control {ctrl['value']}"
        f"  (raw ratio {cand['value'] / ctrl['value']:.3f})"
    )
    print(
        f"per-query MEDIAN ratio over {len(shared)} measurable shared"
        f" queries: {med:.3f}"
        f"  -> host-normalized candidate ≈ {cand['value'] / med:.1f}"
    )
    for tag, d in (("candidate", cand), ("control", ctrl)):
        c = d.get("calibration", {})
        print(
            f"{tag} calibration: cpu {c.get('ratio')} io {c.get('io_ratio')}"
        )

    new = sorted(set(cand["queries"]) - set(ctrl["queries"]))
    if new:
        mass = sum(cand["queries"][k] for k in new)
        print(f"new queries (not in control): {len(new)}, {mass:.1f}s total")
    # symmetric coverage: a lost/renamed/errored query's control-side mass
    # must not vanish from the raw-total comparison unnoticed
    missing = sorted(set(ctrl["queries"]) - set(cand["queries"]))
    if missing:
        mass = sum(ctrl["queries"][k] for k in missing)
        print(
            f"MISSING queries (in control, absent from candidate):"
            f" {len(missing)}, {mass:.1f}s control-side mass —"
            f" {', '.join(missing[:10])}"
            + (" …" if len(missing) > 10 else "")
        )

    # episode window: consecutive inflated queries in EXECUTION order
    ended = cand.get("ended_at") or {}
    order = sorted((t, k) for k, t in ended.items() if k in ratios)
    run: list[str] = []
    windows: list[list[str]] = []
    for _t, k in order:
        if ratios[k] >= WINDOW_RATIO * med:
            run.append(k)
        else:
            if len(run) >= WINDOW_MIN_RUN:
                windows.append(run)
            run = []
    if len(run) >= WINDOW_MIN_RUN:
        windows.append(run)
    for w in windows:
        span = f"{ended[w[0]]:.0f}s-{ended[w[-1]]:.0f}s"
        print(
            f"EPISODE WINDOW ({len(w)} consecutive queries, {span}):"
            f" {w[0]} .. {w[-1]} — contiguous-run inflation is the"
            " co-tenant signature, re-measure warm-solo before reading"
            " these as regressions"
        )
    windowed = {k for w in windows for k in w}

    movers = sorted(
        (
            (r, k)
            for k, r in ratios.items()
            if r >= MOVER_RATIO * med and k not in windowed
        ),
        reverse=True,
    )
    if movers:
        print("movers OUTSIDE episode windows (warm-solo these):")
        for r, k in movers[:15]:
            print(
                f"  {r:5.2f}x  {k}: {cand['queries'][k]} vs"
                f" {ctrl['queries'][k]}"
            )
    else:
        print(
            "no movers outside episode windows — same distribution"
            " modulo the host factor"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
