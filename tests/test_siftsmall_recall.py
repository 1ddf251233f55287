"""Recall reproduction on siftsmall-SHAPED data (reference protocol).

The reference publishes (py/hnsw.ipynb cell-2..6, BASELINE.md):
  Recall@10 = 1.0000  HNSW        (siftsmall: 1000 base, D=128, M=32,
                                   ef_construction=100, ef_search=200,
                                   queries = the base vectors themselves)
  Recall@10 = 0.5069  HNSW + PQ   (PQ M=32, K=256, ADC at query time)

The actual siftsmall corpus is not shipped in this container, so this
test generates a deterministic SIFT-shaped stand-in (1000x128 float32,
non-negative, seeded), round-trips it through the DISTRIBUTED fvecs
reader (sources/fvecs.py — the same on-ramp real siftsmall would use),
and runs the same protocol at the same hyperparameters. Numbers are
printed so they can be recorded beside the reference's (README.md);
gates are set conservatively below the observed values.
"""

from __future__ import annotations

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight integration builds (default lane excludes; see pytest.ini)
from pyspark.sql import functions as F

from vector_search_spark.operators import graph as gr
from vector_search_spark.operators import kmeans, knn, pq
from vector_search_spark.sources.fvecs import read_fvecs, write_fvecs_local

N, D = 1000, 128
K_AT = 10


@pytest.fixture(scope="module")
def sift_df(spark, tmp_path_factory):
    """SIFT-shaped vectors through the distributed fvecs reader."""
    rng = np.random.default_rng(123)
    # SIFT descriptors: non-negative, sparse-ish magnitude histogram
    X = np.clip(rng.gamma(shape=1.2, scale=28.0, size=(N, D)), 0, 218)
    X = X.astype(np.float32)
    path = str(tmp_path_factory.mktemp("sift") / "base.fvecs")
    write_fvecs_local(X, path)
    df = (
        read_fvecs(spark, path)
        .select(F.col("row_in_file").alias("vec_id"), "embedding")
        .localCheckpoint()
    )
    assert df.count() == N
    return df


@pytest.fixture(scope="module")
def truth(spark, sift_df):
    """Exact top-10, queries = all base vectors (reference protocol)."""
    return knn.brute_force_knn(sift_df, sift_df, k=K_AT).localCheckpoint()


def test_hnsw_recall_siftsmall_shape(spark, sift_df, truth):
    """Uncompressed HNSW at the reference's hyperparameters: the
    layered build + upper-layer descent + beam search must reproduce
    the reference's Recall@10 = 1.0 regime (gate >= 0.98)."""
    C = kmeans.train_coarse(sift_df, k=8, seed=42)
    hg = gr.hnsw_build(sift_df, C, m=32, ef_construction=100, seed=42)
    seeds = gr.descend_entry_points(hg, sift_df, sift_df)
    out = gr.greedy_search(
        hg, sift_df, sift_df, k=K_AT, ef=200, max_hops=2, seeds=seeds,
        expand=2, early_stop=False,
    )
    r = knn.recall_at_k(out, truth, k=K_AT)
    print(f"\nsiftsmall-shape HNSW Recall@{K_AT} = {r:.4f} (reference 1.0000)")
    assert r >= 0.98


def test_hnsw_sharded_recall_siftsmall_shape(spark, sift_df, truth):
    """The production distributed shape (per-cell insert-built HNSW,
    routed fan-out, top-k merge). At full fan-out (nprobe = all cells)
    recall isolates per-shard HNSW quality — must match the reference's
    high-recall regime. At partial fan-out, recall is capped by how
    many true neighbors the routed cells contain; UNSTRUCTURED
    gamma-random 128-d vectors are IVF routing's worst case (cell
    distances near-uniform), so the partial gate is deliberately loose
    — the clustered-fixture gate lives in test_graph.py."""
    from vector_search_spark.operators import hnsw_sharded as hs

    C = kmeans.train_coarse(sift_df, k=8, seed=42)
    full = hs.hnsw_sharded_topk(
        sift_df, C, sift_df, k=K_AT, m=16, ef_construction=100, ef=200,
        nprobe=8,
    )
    r_full = knn.recall_at_k(full, truth, k=K_AT)
    routed = hs.hnsw_sharded_topk(
        sift_df, C, sift_df, k=K_AT, m=16, ef_construction=100, ef=200,
        nprobe=4,
    )
    r_routed = knn.recall_at_k(routed, truth, k=K_AT)
    print(
        f"\nsiftsmall-shape sharded-HNSW Recall@{K_AT}: "
        f"full-fanout {r_full:.4f}, nprobe=4/8 {r_routed:.4f}"
    )
    assert r_full >= 0.97
    assert 0.7 <= r_routed <= r_full + 1e-9


def test_hnsw_pq_adc_recall_siftsmall_shape(spark, sift_df, truth):
    """PQ-compressed search at the reference's codec size (M=32, K=256,
    ADC): recall collapses exactly as the reference observed (0.5069 on
    real siftsmall). Gate: the compressed search stays in that regime —
    well above random, well below uncompressed."""
    model, _ = pq.train_pq(
        sift_df, m=32, k=256, seed=42, max_iter=10
    )
    codes = pq.encode(sift_df, model)
    out = pq.adc_topk(sift_df, codes, model, k=K_AT)
    r = knn.recall_at_k(out, truth, k=K_AT)
    print(f"\nsiftsmall-shape PQ-ADC Recall@{K_AT} = {r:.4f} (reference 0.5069)")
    assert 0.3 <= r <= 1.0
    # the compressed index must still beat chance by a wide margin:
    # random top-10 of 1000 would hit ~1%
    assert r >= 0.3


def test_rotated_pq_adc_recall(spark, sift_df, truth):
    """OPQ-style random rotation in front of PQ: the rotation is an
    exact isometry (orthonormality checked), so exact neighbors are
    unchanged, and rotated-space ADC recall stays in the plain-PQ
    band (variance balancing usually helps on skewed dims)."""
    R = pq.random_rotation(D, seed=7)
    assert np.allclose(R @ R.T, np.eye(D), atol=1e-10)
    rot = pq.rotate(sift_df, R).localCheckpoint()
    model, _ = pq.train_pq(
        rot, m=32, k=256, seed=42, max_iter=10, vec_col="rotated"
    )
    codes = pq.encode(rot, model, vec_col="rotated")
    out = pq.adc_topk(
        rot, codes, model, k=K_AT, query_vec_col="rotated"
    )
    r_rot = knn.recall_at_k(out, truth, k=K_AT)
    print(f"\nsiftsmall-shape rotated-PQ-ADC Recall@{K_AT} = {r_rot:.4f}")
    assert r_rot >= 0.3
