"""Per-phase job/wall profile of hnsw_knn + hnsw_adc_knn at sf0.1.

Replays q_hnsw_knn / q_hnsw_adc_knn step by step with a job group per
phase, so every scheduled Spark job is attributed to the pipeline stage
that submitted it (guide §1.5). Run on an idle box.
"""
import os
import sys
import time

REPO_ROOT = "/root/repo"
sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    from pyspark.sql import functions as F

    from vector_search_spark import tables
    from vector_search_spark.operators import graph as gr
    from vector_search_spark.operators import kmeans, pq
    from vector_search_spark.session import get_spark

    spark = get_spark(app_name="vss-profile-hnsw")
    sc = spark.sparkContext

    # warmup (same as bench)
    from vector_search_spark.queries import get_catalog
    cat = get_catalog()
    cat["knn_exact"].fn(spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    tiny = spark.range(64).withColumn("g", F.col("id") % 8)
    tiny.groupBy("g").applyInPandas(
        lambda p: p, "id long, g long"
    ).localCheckpoint().groupBy("g").count().write.format("noop").mode(
        "overwrite"
    ).save()

    phases = []

    def phase(name, fn):
        group = f"prof:{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        nj = len(sc.statusTracker().getJobIdsForGroup(group))
        phases.append((name, round(dt, 3), nj))
        print(f"PHASE {name}: {dt:.3f}s {nj} jobs", flush=True)
        return out

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for variant in ("raw", "adc"):
        print(f"===== {variant} =====", flush=True)
        phases.append((f"== {variant} ==", 0, 0))
        emb = tables.load(spark, SF_DIR, "embeddings")
        C = phase(f"{variant}:train_coarse",
                  lambda: kmeans.train_coarse(emb, k=8, seed=42))
        efc = 32 if variant == "raw" else 16
        hg = phase(f"{variant}:hnsw_build",
                   lambda: gr.hnsw_build(emb, C, m=8, ef_construction=efc,
                                         seed=42))
        if variant == "adc":
            model, _ = phase(
                f"{variant}:train_pq",
                lambda: pq.train_pq(emb, m=8, k=16, seed=42, max_iter=5))
            codes = pq.encode(emb, model)
        queries = emb.filter(F.col("vec_id") < 20)
        seeds = phase(f"{variant}:descend_entry_points",
                      lambda: gr.descend_entry_points(hg, emb, queries))
        if variant == "raw":
            out = phase(
                f"{variant}:greedy_build_plan",
                lambda: gr.greedy_search(hg, emb, queries, k=10, ef=48,
                                         max_hops=1, seeds=seeds, expand=5,
                                         early_stop=False))
        else:
            out = phase(
                f"{variant}:greedy_build_plan",
                lambda: gr.greedy_search_adc(hg, codes, queries, model,
                                             k=10, ef=48, max_hops=1,
                                             seeds=seeds, expand=5,
                                             early_stop=False))
        phase(f"{variant}:final_materialize", lambda: noop(out))
        spark.catalog.clearCache()

    print("\n==== summary ====")
    for name, dt, nj in phases:
        print(f"{name:40s} {dt:8.3f}s {nj:4d} jobs")
    total_raw = sum(nj for n, _, nj in phases if n.startswith("raw:"))
    total_adc = sum(nj for n, _, nj in phases if n.startswith("adc:"))
    print(f"raw total jobs: {total_raw}; adc total jobs: {total_adc}")

    # per-job detail from the UI REST API: description + stage count
    import json
    import urllib.request

    ui = sc.uiWebUrl
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    jobs = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded"
        )
    )
    print("\n==== per-job detail (jobId, group, stages, tasks, name) ====")
    for j in sorted(jobs, key=lambda x: x["jobId"]):
        grp = j.get("jobGroup", "")
        if not grp.startswith("prof:"):
            continue
        name = (j.get("name") or "")[:90]
        print(
            f"{j['jobId']:5d} {grp:35s} st={len(j['stageIds']):2d} "
            f"t={j['numTasks']:4d} {name}"
        )


if __name__ == "__main__":
    main()
