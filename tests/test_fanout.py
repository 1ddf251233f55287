"""fanout_small (functions/fanout.py) — the scale-adaptive fan-out for
compute-dense stages over small inputs (optimization round 17).

Contract under test:
- identity at scale: a relation whose size estimate clears the
  threshold is returned UNCHANGED (same plan object semantics — no
  exchange added);
- fan-out on small scans: a tiny parquet scan is repartitioned to
  defaultParallelism;
- values identical either way (round-robin repartition only moves
  rows);
- env kill-switch: bytes_per_slot=0 disables the device.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from vector_search_spark.functions.fanout import fanout_small, plan_size_estimate


def _docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet")


def test_small_scan_fans_out_to_default_parallelism(spark):
    docs = _docs(spark)
    out = fanout_small(docs)
    assert (
        out.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )


def test_large_estimate_is_identity(spark):
    docs = _docs(spark)
    est = plan_size_estimate(docs)
    assert est is not None and est > 0
    # a threshold the estimate always clears -> identity (same object)
    out = fanout_small(docs, bytes_per_slot=1)
    assert out is docs


def test_zero_threshold_disables(spark):
    docs = _docs(spark)
    assert fanout_small(docs, bytes_per_slot=0) is docs


def test_values_unchanged(spark):
    docs = _docs(spark).select("doc_id", F.length("text").alias("n"))
    a = sorted(map(tuple, docs.collect()))
    b = sorted(map(tuple, fanout_small(docs).collect()))
    assert a == b


# ---- coalesce_small (r18): the inverse device for pinned artifacts ----


def test_coalesce_small_compacts_tiny_relation(spark):
    from vector_search_spark.functions.fanout import coalesce_small

    docs = _docs(spark).repartition(16)
    out = coalesce_small(docs)
    assert out.rdd.getNumPartitions() == 1
    # values identical (coalesce only merges partitions)
    a = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    assert a == b


def test_coalesce_small_identity_above_gate_and_kill_switch(spark):
    from vector_search_spark.functions.fanout import coalesce_small

    docs = _docs(spark)
    # a threshold the estimate always clears -> identity (same object)
    assert coalesce_small(docs, bytes_per_part=1) is docs
    # kill switch
    assert coalesce_small(docs, bytes_per_part=0) is docs
    # precomputed-estimate form: a big est forces identity even when
    # the plan's own estimate is tiny (the hnsw_build call shape)
    assert coalesce_small(docs, est=10**12) is docs
