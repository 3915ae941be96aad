"""The bench adjudication aid must reproduce the BASELINE protocol on a
synthetic incident: a uniform host factor moves the MEDIAN (not the
movers list), a contiguous execution-order inflation run is detected as
an episode window, and a lone structural mover outside the window is
reported for warm-solo follow-up."""

import json
import subprocess
import sys


def _run(tmp_path, cand, ctrl):
    cp, kp = tmp_path / "cand.json", tmp_path / "ctrl.json"
    cp.write_text(json.dumps(cand))
    kp.write_text(json.dumps(ctrl))
    out = subprocess.run(
        [sys.executable, "tools/bench_compare.py", str(cp), str(kp)],
        capture_output=True,
        text=True,
    )
    assert out.returncode == 0, out.stderr
    return out.stdout


def test_window_median_and_mover_detection(tmp_path):
    names = [f"q{i:02d}" for i in range(30)]
    ctrl = {
        "value": 30.0,
        "calibration": {"ratio": 0.4, "io_ratio": 0.4},
        "queries": {n: 1.0 for n in names},
    }
    # uniform 1.2x host factor; queries 10-15 in a 3x episode window;
    # q25 a lone 4x structural mover; q29 new (absent from control)
    cand_q = {n: 1.2 for n in names}
    for i in range(10, 16):
        cand_q[names[i]] = 3.6
    cand_q["q25"] = 4.8
    cand_q["q29_new"] = 2.0
    del cand_q["q29"]
    cand = {
        "value": sum(cand_q.values()),
        "calibration": {"ratio": 0.5, "io_ratio": 0.6},
        "queries": cand_q,
        "ended_at": {n: float(i) for i, n in enumerate(sorted(cand_q))},
    }
    out = _run(tmp_path, cand, ctrl)
    assert "MEDIAN ratio" in out and "1.200" in out
    assert "EPISODE WINDOW (6 consecutive queries" in out
    assert "q10 .. q15" in out
    assert "q25" in out.split("movers OUTSIDE")[1]
    assert "new queries (not in control): 1" in out


def test_clean_run_reports_no_movers(tmp_path):
    names = [f"q{i:02d}" for i in range(10)]
    ctrl = {"value": 10.0, "queries": {n: 1.0 for n in names}}
    cand = {
        "value": 10.5,
        "queries": {n: 1.05 for n in names},
        "ended_at": {n: float(i) for i, n in enumerate(names)},
    }
    out = _run(tmp_path, cand, ctrl)
    assert "no movers outside episode windows" in out
