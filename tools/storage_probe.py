"""Diagnostic: run the bench sweep and sample block-manager storage state.

Verifies (or falsifies) the r16 hypothesis that localCheckpoint blocks
accumulate across the 263-query session — the driver JVM rarely GCs a
mostly-idle 16g heap, so ContextCleaner never processes the weak-ref
queue and checkpointed RDD blocks are never unpersisted — producing the
positional drift measured between the r14 and r15 bench controls
(median per-query ratio 0.957 in the first ended_at quartile rising to
1.161 in the last).

Usage: python tools/storage_probe.py [--every 20] [--limit N] [--gc]
  --gc additionally calls System.gc() on the driver after each sample,
       modeling spark.cleaner.periodicGC / an explicit cleanup hook.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from presto_workload_analyzer_spark.session import get_spark  # noqa: E402
from presto_workload_analyzer_spark import driver_queries  # noqa: E402


def sample(spark) -> tuple[int, float, float]:
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    n = len(infos)
    mem = sum(i.memSize() for i in infos) / 1e6
    disk = sum(i.diskSize() for i in infos) / 1e6
    return n, mem, disk


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--every", type=int, default=20)
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--gc", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark(app_name="pwa-storage-probe")
    sf_dir = args.sf_dir
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    qmap = dict(sorted(driver_queries.queries().items()))
    names = list(qmap)
    if args.limit:
        names = names[: args.limit]
    t_all = time.time()
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            df = qmap[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        except Exception as exc:  # keep probing
            print(f"ERR {name}: {exc}", file=sys.stderr)
        dt = time.time() - t0
        if i % args.every == 0 or i == len(names) - 1:
            n, mem, disk = sample(spark)
            print(
                f"[{i:3d}] {name:40s} {dt:6.2f}s  persistedRDDs={n:4d} "
                f"mem={mem:8.1f}MB disk={disk:8.1f}MB",
                flush=True,
            )
            if args.gc:
                spark.sparkContext._jvm.System.gc()
    print(f"total {time.time() - t_all:.1f}s over {len(names)} queries")


if __name__ == "__main__":
    main()
