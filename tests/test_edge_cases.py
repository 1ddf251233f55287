"""Edge-case behavior pinned down (reference parity: py/test_hnsw.py
TestEdgeCases :384-447, py/test_pq.py validation :18-30): empty inputs,
k beyond N, empty documents, degenerate clusters. Where the reference
would crash (it never validates HNSW dims, SURVEY §1), we pin an
explicit error or a sane total behavior instead."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_search_spark.operators import knn


def test_empty_query_set_raises(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="empty query set"):
        knn.brute_force_knn(emb.filter("vec_id < 0"), emb, k=3).collect()


def test_k_larger_than_base_caps_at_n(spark):
    emb = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(3)],
        "vec_id long, embedding array<float>",
    )
    out = knn.brute_force_knn(emb.limit(1), emb, k=100)
    assert out.count() == 3


def test_single_point_kmeans_and_empty_cluster_keep(spark):
    import numpy as np

    from vector_search_spark.operators import kmeans

    one = spark.createDataFrame(
        [(0, [5.0, 5.0])], "vec_id long, embedding array<float>"
    )
    init = np.array([[5.0, 5.0], [100.0, 100.0]])
    res = kmeans.lloyd(one, init, max_iter=3)
    # empty cluster 1 keeps its old centroid (reference py/pq.py:181-183)
    assert res.centroids[1].tolist() == [100.0, 100.0]
    assert res.centroids[0].tolist() == [5.0, 5.0]


def test_empty_text_documents_flow_through_text_ops(spark):
    from vector_search_spark.operators import textstats

    docs = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, "real words here")],
        "doc_id long, text string",
    )
    # token_counts must not crash and must report 0 for empty docs
    out = {r.doc_id: r.ws_tokens for r in textstats.token_counts(docs).collect()}
    assert out[0] == 0 and out[1] == 0 and out[2] == 3
    # chunking yields no chunks for empty docs, not an error
    chunks = textstats.chunk_tokens(docs, chunk_size=2)
    assert chunks.filter(F.col("doc_id") < 2).count() == 0


def test_zero_vector_cosine_defined(spark):
    from vector_search_spark.functions import distance as D

    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 1.0])], "a array<float>, b array<float>"
    )
    [r] = df.select(D.cosine_similarity("a", "b").alias("c")).collect()
    assert r.c == 0.0  # zero-norm guard, not NaN


def test_semantic_dedup_single_row_cluster(spark):
    import numpy as np

    from vector_search_spark.operators import dedup

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    out = dedup.semantic_dedup(emb, np.array([[1.0, 0.0]]), 0.5).collect()
    assert len(out) == 1 and out[0].kept
