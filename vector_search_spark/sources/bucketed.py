"""Bucketed tables: shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-fact equi-join (orders x lineitem,
codes x edges) is the shuffle of BOTH sides on the join key. Bucketing
pre-shuffles at WRITE time: each table is hash-partitioned into N
buckets on the key and (optionally) sorted within buckets, so a later
sort-merge join consumes matching buckets directly — no Exchange, and
with sorted buckets no Sort either. One write-time shuffle is amortized
over every subsequent join/aggregation on that key.

Spark's bucketing lives in the table catalog (saveAsTable), not plain
parquet paths — bucket metadata must survive in the metastore for the
planner to trust it. ``spark.sql.sources.bucketing.enabled`` (default
true) and matching bucket counts on both sides are required for the
exchange-free plan; AQE leaves bucketed joins alone.

The reference has no storage layer at all (in-memory lists,
py/hnsw.py:178); this is part of the engine's scale surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "cobucketed_join"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key with a
    sort-merge hint (broadcast would hide the bucketing at test sizes).
    With matching bucket counts the physical plan has NO Exchange —
    asserted in tests/test_plans.py."""
    lt = spark.table(left_table).hint("merge")
    rt = spark.table(right_table).hint("merge")
    return lt.join(rt, on, how)
