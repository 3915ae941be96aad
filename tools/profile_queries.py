"""Per-query profiling harness for the optimization rounds.

For each named query (or --top N slowest from bench_detail.json):
  * time fn(spark, sf_dir) separately from the noop-sink execution
    (plan-construction + any eager work vs engine execution);
  * run the noop sink twice (first-touch vs warm) — shared-silver
    materialization and JIT land in the first number;
  * count Spark jobs launched per query via the status tracker delta;
  * optionally dump explain("formatted") to plans/<round>/<name>_<tag>.txt.

Usage:
  python tools/profile_queries.py --only x51_pipeline_e2e,x100_dup_triangles
  python tools/profile_queries.py --top 25 --plans plans/r15 --tag before
"""

from __future__ import annotations

import argparse
import json
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
    ap.add_argument("--only", default=None, help="comma-separated query names")
    ap.add_argument("--top", type=int, default=0, help="profile the N slowest per bench_detail.json")
    ap.add_argument("--plans", default=None, help="directory for explain dumps")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    qmap = driver_queries.queries()
    if args.only:
        names = [n.strip() for n in args.only.split(",") if n.strip()]
    elif args.top:
        detail = json.load(open(os.path.join(REPO, "bench_detail.json")))
        ranked = sorted(detail["queries"].items(), key=lambda kv: -kv[1])
        names = [n for n, _ in ranked[: args.top]]
    else:
        names = sorted(qmap)

    spark = get_spark(app_name="pwa-profile")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # same warm-up as bench.py
    spark.read.parquet(os.path.join(args.sf_dir, "lineitem.parquet")).count()

    def _ident(batches):
        yield from batches

    (
        spark.range(256)
        .repartition(sc.defaultParallelism)
        .mapInPandas(_ident, "id long")
        .mapInPandas(_ident, "id long")  # 2-deep pool, same as bench.py
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    for _name, _fn in qmap.items():
        if _name.startswith("s") and any(n.startswith("s") for n in names):
            try:
                _fn(spark, "/root/testdata/sf0.001")
            except Exception:
                pass
            break  # one stream warms the machinery

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)

    results = {}
    for name in names:
        fn = qmap[name]
        sc.setJobDescription(f"profile:{name}")
        jobs0 = len(tracker.getJobIdsForGroup() or [])
        t0 = time.time()
        df = fn(spark, args.sf_dir)
        t_build = time.time() - t0
        runs = []
        for _ in range(args.repeats):
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t1, 3))
        n_jobs = len(tracker.getJobIdsForGroup() or []) - jobs0
        if args.plans:
            try:
                import io
                import contextlib

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                with open(
                    os.path.join(args.plans, f"{name}_{args.tag}.txt"), "w"
                ) as fh:
                    fh.write(buf.getvalue())
            except Exception as exc:  # plan dump must not fail the profile
                print(f"  [plan dump failed for {name}: {exc}]", file=sys.stderr)
        results[name] = {
            "build_s": round(t_build, 3),
            "runs_s": runs,
            "n_jobs": n_jobs,
        }
        print(
            f"{name:40s} build {t_build:6.2f}s  runs {runs}  jobs {n_jobs}",
            flush=True,
        )
        sc.setJobDescription(None)

    if args.json:
        with open(args.json, "w") as fh:
            json.dump(results, fh, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
