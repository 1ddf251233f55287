"""Physical-plan regression tests: pushdown, pruning, broadcast."""

from __future__ import annotations

from pyspark.sql import functions as F

import pytest

from tests.conftest import SF_ORACLE
from vector_search_spark import plans, tables
from vector_search_spark.operators import knn


@pytest.fixture(autouse=True)
def _fresh_scans(spark):
    # Other modules cache() the embeddings table; the CacheManager would
    # then substitute InMemoryTableScan for the parquet scan and hide the
    # PushedFilters/ReadSchema properties these tests pin down.
    spark.catalog.clearCache()
    yield


def test_knn_expr_path_broadcasts_queries(spark):
    # The Catalyst-expression path must broadcast the (small) query side;
    # the default gemm path broadcasts an ndarray instead (no join node).
    emb = tables.load(spark, SF_ORACLE, "embeddings")
    out = knn.brute_force_knn(emb.filter(F.col("vec_id") < 10), emb, k=5, impl="expr")
    assert plans.has_broadcast_join(out), "query side must broadcast"


def test_knn_gemm_path_has_no_join(spark):
    # gemm path = single streaming pass over base + window top-k: the
    # only shuffle should be the final per-query rank, never a join.
    emb = tables.load(spark, SF_ORACLE, "embeddings")
    out = knn.brute_force_knn(emb.filter(F.col("vec_id") < 10), emb, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan


def test_knn_scan_projects_two_columns(spark):
    emb = tables.load(spark, SF_ORACLE, "embeddings")
    out = knn.brute_force_knn(emb.filter(F.col("vec_id") < 10), emb, k=5)
    for cols in plans.read_schema_columns(out):
        assert "label" not in cols, f"label should be pruned, got {cols}"


def test_filter_pushdown_reaches_scan(spark):
    emb = tables.load(spark, SF_ORACLE, "embeddings")
    filtered = emb.filter(F.col("vec_id") < 10).select("vec_id")
    pushed = plans.pushed_filters(filtered)
    assert any("vec_id" in p for p in pushed), f"no pushdown: {pushed}"
