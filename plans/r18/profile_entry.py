"""Job-trace profiler for catalog entries: run NAME [NAME...] once at
sf0.1 (after warmup), then dump every scheduled job (description, stage
count, task count, duration) from the UI REST API. Guide §1.1/§1.5.

Usage: python plans/r18/profile_entry.py dedup_groups kmeans_train
"""
import json
import os
import sys
import time
import urllib.request

REPO_ROOT = "/root/repo"
sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    names = sys.argv[1:]
    from pyspark.sql import functions as F

    from vector_search_spark.queries import get_catalog
    from vector_search_spark.session import get_spark

    spark = get_spark(
        app_name="vss-profile-entry",
        extra_conf={"spark.ui.enabled": "true"},
    )
    sc = spark.sparkContext
    cat = get_catalog()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warmup (same as bench)
    noop(cat["knn_exact"].fn(spark, "/root/testdata/sf0.001"))
    tiny = spark.range(64).withColumn("g", F.col("id") % 8)
    noop(
        tiny.groupBy("g")
        .applyInPandas(lambda p: p, "id long, g long")
        .localCheckpoint()
        .groupBy("g")
        .count()
    )

    walls = {}
    for name in names:
        sc.setJobGroup(f"prof:{name}", name)
        t0 = time.perf_counter()
        noop(cat[name].fn(spark, SF_DIR))
        walls[name] = time.perf_counter() - t0
        spark.catalog.clearCache()

    ui = sc.uiWebUrl
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    jobs = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/jobs"
        )
    )
    byg = {}
    for j in jobs:
        grp = j.get("jobGroup", "") or ""
        if grp.startswith("prof:"):
            byg.setdefault(grp[5:], []).append(j)
    for name in names:
        js = sorted(byg.get(name, []), key=lambda x: x["jobId"])
        print(f"\n===== {name}: wall={walls[name]:.3f}s jobs={len(js)} =====")
        for j in js:
            dur = ""
            if j.get("submissionTime") and j.get("completionTime"):
                pass
            print(
                f"  {j['jobId']:5d} st={len(j['stageIds']):2d} "
                f"t={j['numTasks']:4d} {(j.get('name') or '')[:100]}"
            )


if __name__ == "__main__":
    main()
