"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is materialized with a full-result noop write (no driver
collect — measures the distributed plan, not result serialization).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_ROOT)

# Headline set: one per operator family; kept in sync with the catalog.
HEADLINE = [
    "knn_exact",
    "knn_cosine",
    "knn_graph",
    "ivf_knn",
    "tpch_q1",
]


def _materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from vector_search_spark.queries import get_catalog
    from vector_search_spark.session import get_spark

    spark = get_spark(app_name="vss-bench")
    catalog = get_catalog()

    # JVM/codegen/python-worker warm-up on the tiniest SF so per-query
    # timings measure the plan, not first-call compilation or daemon
    # startup: one gemm-path query (mapInPandas + window), one grouped
    # pandas pass + checkpoint (applyInPandas worker pool + local
    # checkpoint store), one shuffle agg.
    from pyspark.sql import functions as F

    _materialize(catalog["knn_exact"].fn(spark, "/root/testdata/sf0.001"))
    tiny = spark.range(64).withColumn("g", F.col("id") % 8)
    _materialize(
        tiny.groupBy("g")
        .applyInPandas(lambda p: p, "id long, g long")
        .localCheckpoint()
        .groupBy("g")
        .count()
    )

    names = [n for n in HEADLINE if n in catalog]
    names += [n for n in sorted(catalog) if n not in names]

    import gc

    timings: dict[str, float] = {}
    total = 0.0
    for name in names:
        t0 = time.perf_counter()
        try:
            _materialize(catalog[name].fn(spark, sf_dir))
            dt = time.perf_counter() - t0
        except Exception as e:  # a failing query must not kill the bench
            print(f"bench: {name} FAILED: {e}", file=sys.stderr)
            dt = float("nan")
        timings[name] = round(dt, 3)
        if dt == dt:
            total += dt
        # Queries are independent: drop caches/checkpoint RDDs between
        # them (outside the timer) so earlier queries' pinned blocks
        # don't tax later ones' GC.
        spark.catalog.clearCache()
        gc.collect()

    print(
        json.dumps(
            {
                "metric": "total_headline_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
