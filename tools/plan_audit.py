"""Plan-size audit: detect duplicated-subtree monster plans.

For every batch query (s-family skipped: their fn() drains a stream
eagerly), build the DataFrame in bench order and record the PHYSICAL
plan's size — total operator lines, Exchange count, Join count. A query
whose plan has hundreds of exchanges on kilobyte inputs is paying
driver-side planning/AQE cost for duplicated subtrees (a frame
referenced N times re-plans its upstream N times) — the xs43/x119
lesson, detectable without executing anything.

Usage: python tools/plan_audit.py [--sf-dir DIR] [--min-exchanges N]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from presto_workload_analyzer_spark.session import get_spark  # noqa: E402
from presto_workload_analyzer_spark import driver_queries  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--min-exchanges", type=int, default=12)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    spark = get_spark(app_name="pwa-plan-audit")
    rows = []
    names = sorted(driver_queries.queries())
    if args.only:
        names = [n for n in names if n in set(args.only.split(","))]
    for name in names:
        if name.startswith("s") and not name.startswith("x"):
            continue  # streaming fn() executes eagerly; skip
        fn = driver_queries.queries()[name]
        t0 = time.time()
        try:
            df = fn(spark, args.sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:
            print(f"{name:40s} ERROR {type(exc).__name__}: {exc}", flush=True)
            continue
        n_ex = plan.count("Exchange")
        n_join = plan.count("Join")
        n_scan = plan.count("Scan parquet")
        rows.append((name, len(plan), n_ex, n_join, n_scan, time.time() - t0))
    rows.sort(key=lambda r: -r[2])
    print(f"\n{'query':42s} {'plan_chars':>10s} {'Exch':>6s} {'Join':>6s} {'Scan':>5s} {'build_s':>8s}")
    for name, sz, ex, jo, sc, bt in rows:
        if ex >= args.min_exchanges:
            print(f"{name:42s} {sz:10d} {ex:6d} {jo:6d} {sc:5d} {bt:8.2f}")


if __name__ == "__main__":
    main()
