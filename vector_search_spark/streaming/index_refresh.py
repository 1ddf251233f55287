"""Micro-batch incremental index refresh.

The reference maintains its index with a per-row ``Insert``
(py/hnsw.py:337-392) — mutate a shared in-memory graph per vector. At
cluster scale the idiomatic equivalent is append-oriented micro-batch
maintenance: each arriving batch of vectors is coarse-routed (IVF cell),
PQ-encoded, and appended to the cell-partitioned parquet index that
operators/ivf.py queries. No shared mutable state, no index-wide lock;
the partition layout (cluster_id=...) stays query-prunable throughout.

Model staleness is the accepted trade (classic IVF practice): centroids
and codebooks are retrained offline when drift warrants; the stream only
encodes against the broadcast current model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import numpy as np

from vector_search_spark.operators import ivf, pq

__all__ = ["incremental_pq_refresh", "encode_batch", "streaming_upsert"]


def encode_batch(
    batch: DataFrame, centroids: np.ndarray, model: "pq.PQModel"
) -> DataFrame:
    """Route + encode one micro-batch: (vec_id, cluster_id, code)."""
    assigned = ivf.assign_clusters(batch, centroids)
    codes = pq.encode(assigned, model)
    return codes.join(
        assigned.select("vec_id", "cluster_id"), "vec_id"
    ).select("vec_id", "cluster_id", "code")


def incremental_pq_refresh(
    stream: DataFrame,
    centroids: np.ndarray,
    model: "pq.PQModel",
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start the refresh stream: every micro-batch is encoded and
    appended to the cell-partitioned index at ``out_dir``. Exactly-once
    comes from the checkpoint + append-only parquet sink contract."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        (
            encode_batch(batch_df, centroids, model)
            .withColumn("batch_id", F.lit(batch_id))
            .write.partitionBy("cluster_id")
            .mode("append")
            .parquet(out_dir)
        )

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_upsert(
    stream: DataFrame,
    centroids: np.ndarray,
    index_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Live UPSERT maintenance of a raw-vector IVF index: every
    micro-batch folds into the on-disk index via ivf.upsert_index —
    replaced ids are rewritten in place (including cell moves), new ids
    appended, and only the batch's touched cells are rewritten.

    This is the streaming twin of the reference's per-row Insert for
    the mutable-id case (append-only ingest should prefer
    :func:`incremental_pq_refresh`: appends never rewrite). Upsert
    rewrites whole cells, so micro-batch cadence — not per-row — is
    what makes it affordable; exactly-once comes from the checkpoint
    plus the idempotence of upserting the same batch again.
    """

    def process(batch_df: DataFrame, batch_id: int) -> None:
        ivf.upsert_index(
            batch_df.sparkSession, index_path, batch_df, centroids
        )

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
