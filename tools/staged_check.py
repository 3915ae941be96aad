#!/usr/bin/env python
"""Three-SF exact verification of STAGED queries (the pre-registration
gate the round cadence requires: every staged entry must MATCH its
DuckDB oracle frame-exactly at sf0.001, sf0.01 AND sf0.1 before it is
called staged — the single-scale gate has been green by corpus luck
before; see BASELINE round 12).

Usage:
    python tools/staged_check.py                 # every tier, all 3 SFs
    python tools/staged_check.py --tier TIER5    # one tier
    python tools/staged_check.py --sf 0.01 0.1   # chosen SFs
    python tools/staged_check.py --only xs43_curriculum_order

Exit code = number of failures (0 = all MATCH). Do not run while
another Spark/pytest job is active if you also read the walls (~30%
inflation); values are unaffected.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

from presto_workload_analyzer_spark import staged_queries as sq  # noqa: E402
from presto_workload_analyzer_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

TIERS = [
    "STAGED", "STAGED_NEXT", "STAGED_TIER3", "STAGED_TIER4",
    "STAGED_TIER5", "STAGED_TIER6", "STAGED_TIER7",
]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", choices=TIERS, help="one staging tier only")
    ap.add_argument("--sf", nargs="+", default=["0.001", "0.01", "0.1"])
    ap.add_argument("--only", help="comma-separated staged query names")
    ap.add_argument("--sf-dir", help="explicit corpus dir (e.g. the"
                    " degenerate corpus) instead of the --sf testdata list")
    args = ap.parse_args()

    tiers = [args.tier] if args.tier else TIERS
    entries: dict[str, tuple] = {}
    for t in tiers:
        entries.update(getattr(sq, t, {}))
    if args.only:
        keep = set(args.only.split(","))
        unknown = keep - set(entries)
        if unknown:
            sys.exit(f"unknown staged names: {sorted(unknown)}")
        entries = {k: v for k, v in entries.items() if k in keep}
    if not entries:
        print("staging tiers empty — nothing to check")
        return 0

    spark = get_spark()
    fail = 0
    legs = ([(args.sf_dir, args.sf_dir)] if args.sf_dir
            else [(sf, f"/root/testdata/sf{sf}") for sf in args.sf])
    for sf, d in legs:
        if not os.path.isdir(d):
            print(f"sf{sf}: {d} missing, skipped")
            continue
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM"
                f" read_parquet('{d}/{t}.parquet')"
            )
        for name, (fn, sql) in sorted(entries.items()):
            t0 = time.time()
            try:
                sdf = _normalize(fn(spark, d).toPandas())
                odf = _normalize(con.sql(sql).df())
                assert list(sdf.columns) == list(odf.columns), (
                    list(sdf.columns), list(odf.columns))
                assert len(sdf) == len(odf) and len(sdf) > 0, (
                    len(sdf), len(odf))
                pd.testing.assert_frame_equal(sdf, odf, check_exact=True)
                print(f"MATCH sf{sf} {name} ({time.time() - t0:.1f}s,"
                      f" {len(sdf)} rows)")
            except Exception as e:  # noqa: BLE001 — report and count
                fail += 1
                print(f"FAIL  sf{sf} {name}: {str(e)[:300]}")
    print(f"\n{'OK' if not fail else 'FAILURES'}: {fail}")
    return fail


if __name__ == "__main__":
    sys.exit(main())
