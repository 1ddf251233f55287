"""Skew measurement for the per-cell applyInPandas groups (guide §2.5,
r17 verdict "What's wrong #5"): max/median cell sizes for
knn_graph_blocked's routed relation (nng_blocked entry config) and
dedup.embedding_near_dup's routed relation, at sf0.1.

The per-cell gemm group size is what bounds one task's work; this
records the measured balance so the salting decision is evidence-based.
"""
import os
import sys

REPO_ROOT = "/root/repo"
sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    import numpy as np
    from pyspark.sql import functions as F

    from vector_search_spark import tables
    from vector_search_spark.operators import graph as gr
    from vector_search_spark.operators import kmeans
    from vector_search_spark.session import get_spark

    spark = get_spark(app_name="vss-measure-skew")
    emb = tables.load(spark, SF_DIR, "embeddings")
    n = emb.count()
    print(f"embeddings rows: {n}")

    # --- nng_blocked / knn_graph_blocked config (queries_vector.py) ---
    from vector_search_spark.queries_vector import (
        NNG_NC,
        NNG_NPROBE,
    )

    C = kmeans.init_first_k(emb, NNG_NC)
    routed = gr.route_to_cells(emb, C, NNG_NPROBE)
    stats = (
        routed.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("routed"),
            F.sum(
                F.when(F.col("probe_rank") == 0, 1).otherwise(0)
            ).alias("home"),
        )
        .toPandas()
    )
    r = stats["routed"].to_numpy()
    h = stats["home"].to_numpy()
    work = r * h  # per-cell gemm tile rows x cols
    print(
        "knn_graph_blocked (NC=%d, nprobe=%d): cells=%d\n"
        "  routed rows per cell: max=%d median=%.0f ratio=%.2f\n"
        "  home rows per cell:   max=%d median=%.0f ratio=%.2f\n"
        "  gemm work (r*h): max=%d median=%.0f ratio=%.2f; "
        "max share of total=%.3f"
        % (
            NNG_NC, NNG_NPROBE, len(stats),
            r.max(), np.median(r), r.max() / np.median(r),
            h.max(), np.median(h), h.max() / np.median(h),
            work.max(), np.median(work), work.max() / np.median(work),
            work.max() / work.sum(),
        )
    )

    # --- embedding_near_dup config (dedup_embedding entry) ---
    from vector_search_spark.queries_text import EMB_NC, EMB_NPROBE

    C2 = kmeans.init_first_k(emb, EMB_NC)
    routed2 = gr.route_to_cells(emb, C2, EMB_NPROBE)
    stats2 = (
        routed2.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("routed"),
            F.sum(
                F.when(F.col("probe_rank") == 0, 1).otherwise(0)
            ).alias("home"),
        )
        .toPandas()
    )
    r2 = stats2["routed"].to_numpy()
    h2 = stats2["home"].to_numpy()
    work2 = r2 * h2
    print(
        "embedding_near_dup (NC=%d, nprobe=%d): cells=%d\n"
        "  routed rows per cell: max=%d median=%.0f ratio=%.2f\n"
        "  home rows per cell:   max=%d median=%.0f ratio=%.2f\n"
        "  gemm work (r*h): max=%d median=%.0f ratio=%.2f; "
        "max share of total=%.3f"
        % (
            EMB_NC, EMB_NPROBE, len(stats2),
            r2.max(), np.median(r2), r2.max() / np.median(r2),
            h2.max(), np.median(h2), h2.max() / np.median(h2),
            work2.max(), np.median(work2), work2.max() / np.median(work2),
            work2.max() / work2.sum(),
        )
    )


if __name__ == "__main__":
    main()
