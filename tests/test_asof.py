"""Unit semantics for the merge-shaped as-of join (operators/asof.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_search_spark.operators import asof


def _ts(s: str):
    return f"timestamp'{s}'"


def test_asof_backward_basic_ties_and_misses(spark):
    left = spark.createDataFrame(
        [(1, 1, "2024-01-01 10:00:00"),   # after r10/r11 tie -> id 11
         (2, 1, "2024-01-01 09:00:00"),   # before any right -> null
         (3, 2, "2024-01-01 12:00:00"),   # exact-equal ts -> inclusive
         (4, 3, "2024-01-01 12:00:00")],  # key with no right rows
        "lid int, k int, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(10, 1, "2024-01-01 09:30:00", "a"),
         (11, 1, "2024-01-01 09:30:00", "b"),   # tie: greater id wins
         (12, 1, "2024-01-01 11:00:00", "c"),   # later than left 1
         (13, 2, "2024-01-01 12:00:00", "d")],
        "rid int, k int, ts string, val string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    out = asof.asof_join_backward(
        left, right, key="k", left_ts="ts", right_ts="ts",
        right_id="rid", right_cols=["val"],
    )
    got = {r.lid: (r.asof_id, r.asof_val) for r in out.collect()}
    assert got[1] == (11, "b"), "greatest id wins the equal-ts tie"
    assert got[2] == (None, None), "no prior right row -> null match"
    assert got[3] == (13, "d"), "equal timestamps are inclusive (<=)"
    assert got[4] == (None, None), "unseen key -> null match"
    assert out.count() == left.count(), "left-outer: every left row kept"


def test_asof_no_pair_blowup_plan(spark):
    """The plan must be union+window (one shuffle on the key), not a
    join: 'Join' should not appear in the executed plan."""
    left = spark.range(10).select(
        F.col("id").alias("lid"),
        (F.col("id") % 3).alias("k"),
        F.timestamp_seconds(F.col("id") * 100).alias("ts"),
    )
    right = spark.range(10).select(
        (F.col("id") + 100).alias("rid"),
        (F.col("id") % 3).alias("k"),
        F.timestamp_seconds(F.col("id") * 90).alias("ts"),
        F.lit("x").alias("val"),
    )
    out = asof.asof_join_backward(
        left, right, key="k", left_ts="ts", right_ts="ts",
        right_id="rid", right_cols=["val"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
