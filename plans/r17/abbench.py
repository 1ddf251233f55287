"""Round-17 optimization scratch harness: run a SUBSET of catalog
entries under an optionally-overridden conf, min-of-N, print per-entry
seconds + job counts. NOT part of the bench contract — a measurement
tool for the optimization round (kept under plans/r17 for the record).

Usage:
    python plans/r17/abbench.py q1 q2 ... [--reps 2] [--conf k=v ...]
    python plans/r17/abbench.py --top 20           # top-20 from BENCH_DETAIL
"""
from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--conf", action="append", default=[])
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from vector_search_spark.queries import get_catalog
    from vector_search_spark.session import get_spark

    extra = dict(kv.split("=", 1) for kv in args.conf)
    spark = get_spark(app_name="r17-abbench", extra_conf=extra or None)
    catalog = get_catalog()
    names = list(args.names)
    if args.top:
        d = json.load(open(os.path.join(REPO, "BENCH_DETAIL.json")))
        names += [k for k, _ in sorted(d["queries"].items(), key=lambda kv: -kv[1])[: args.top] if k not in names]
    sc = spark.sparkContext

    # same warmup as bench.py
    catalog["knn_exact"].fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    from pyspark.sql import functions as F
    tiny = spark.range(64).withColumn("g", F.col("id") % 8)
    (tiny.groupBy("g").applyInPandas(lambda p: p, "id long, g long")
        .localCheckpoint().groupBy("g").count())

    out = {}
    for name in names:
        best, jobs, walls = float("inf"), 0, []
        for r in range(args.reps):
            group = f"ab:{name}:{r}"
            sc.setJobGroup(group, group)
            t0 = time.perf_counter()
            catalog[name].fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            walls.append(round(dt, 3))
            if dt < best:
                best = dt
                jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            spark.catalog.clearCache()
            gc.collect()
        out[name] = {"min": round(best, 3), "jobs": jobs, "reps": walls}
        print(f"{name:34s} min={best:7.3f} jobs={jobs:3d} reps={walls}", flush=True)
    print(json.dumps({"conf": extra, "results": out}))


if __name__ == "__main__":
    main()
