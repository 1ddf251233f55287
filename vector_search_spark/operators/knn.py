"""Exact brute-force kNN and batch kNN-graph construction.

Covers the reference's exact-search surface:
- ``BruteForce.RunSearch`` (reference py/bruteforce.py:11-19): all-pairs
  scoring + exact top-k per query (SURVEY.md §2 #12, #21, #38).
- the all-pairs/graph build step used by batch index construction
  (neighbor lists, SURVEY.md §2 #33).

Spark formulation
-----------------
``queries × base`` is a broadcast nested-loop join with the *small* side
(queries) broadcast: one streaming pass over the base table, no shuffle
of the N×Q score rows at all until top-k reduction. The distance kernel
is a pure Catalyst expression (functions/distance.py), so scoring stays
inside whole-stage codegen.

Top-k reduction has two modes:

- ``window``: `row_number() OVER (PARTITION BY query_id ORDER BY dist)`.
  One shuffle of the scored rows, exact, fine when N×Q is modest.
- ``partial``: map-side per-Arrow-batch top-k (Pandas, vectorized)
  *before* the window. Each executor emits at most k rows per query per
  batch, so the shuffle input collapses from N×Q rows to
  ~(batches × Q × k) — this is the mode that survives a 1000-executor
  100 TB scan, equivalent to a partial aggregation / combiner for the
  (non-algebraic) top-k function that Catalyst does not supply natively.

At true scale, exact all-pairs is the *oracle*, not the serving path —
``operators/ivf.py`` is the pruned search that avoids N×Q entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_search_spark.functions.distance import as_double_array, distance


def score_pairs(
    queries: DataFrame,
    base: DataFrame,
    metric: str = "l2_sqr",
    query_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
    base_id_col: str = "vec_id",
    base_vec_col: str = "embedding",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Cross-score every query against every base row.

    Returns ``(query_id, vec_id, dist)``. Column pruning happens here:
    only id+vector columns reach the join, so the parquet scan reads a
    2-column projection regardless of the input schema width.
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        as_double_array(query_vec_col).alias("_qv"),
    )
    b = base.select(
        F.col(base_id_col).alias("vec_id"),
        as_double_array(base_vec_col).alias("_bv"),
    )
    if broadcast_queries:
        q = F.broadcast(q)
    return b.crossJoin(q).select(
        "query_id",
        "vec_id",
        distance(metric, "_qv", "_bv").alias("dist"),
    )


def _partial_topk(scored: DataFrame, k: int, group_col: str = "query_id") -> DataFrame:
    """Map-side combiner: per Arrow batch, keep only top-k rows per group.

    Correct as a *partial* reduction — the exact window pass afterwards
    re-ranks the union of partial winners; anything a batch drops could
    never appear in that batch's (hence the global) top-k.
    """
    schema = scored.schema

    def fn(batches):
        for pdf in batches:
            if len(pdf):
                yield (
                    pdf.sort_values("dist", kind="stable")
                    .groupby(group_col, sort=False)
                    .head(k)
                )

    return scored.mapInPandas(fn, schema)


def topk_per_query(
    scored: DataFrame,
    k: int,
    group_col: str = "query_id",
    id_col: str = "vec_id",
    mode: str = "window",
) -> DataFrame:
    """Exact top-k smallest ``dist`` per group, deterministic tie-break on id.

    ``mode='partial'`` prepends the map-side combiner (see module doc).
    """
    if mode == "partial":
        scored = _partial_topk(scored, k, group_col)
    elif mode != "window":
        raise ValueError(f"unknown mode {mode!r}")
    w = Window.partitionBy(group_col).orderBy(F.col("dist").asc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def brute_force_knn(
    queries: DataFrame,
    base: DataFrame,
    k: int = 10,
    metric: str = "l2_sqr",
    mode: str = "window",
    **cols,
) -> DataFrame:
    """Exact kNN: mirror of BruteForce.RunSearch (py/bruteforce.py:11-19).

    Returns ``(query_id, vec_id, dist, rank)`` with rank 1..k ascending
    by distance (ties broken by vec_id — deterministic, matching the
    reference's stable full-sort at py/bruteforce.py:17).
    """
    scored = score_pairs(queries, base, metric=metric, **cols)
    return topk_per_query(scored, k, mode=mode)


def knn_graph(
    base: DataFrame,
    k: int = 10,
    metric: str = "l2_sqr",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "window",
) -> DataFrame:
    """Batch kNN graph: top-k neighbors per node, self-edges excluded.

    This is the batch replacement for the reference's incremental
    neighbor wiring during Insert (py/hnsw.py:369-379): compute the
    neighbor lists for *all* nodes in one job. Returns
    ``(src, dst, dist, rank)``.

    Scale path: for large N, feed candidate pairs from IVF cells
    (operators/ivf.py) instead of the full self-join — same downstream
    top-k per src.
    """
    scored = (
        score_pairs(
            base,
            base,
            metric=metric,
            query_id_col=id_col,
            query_vec_col=vec_col,
            base_id_col=id_col,
            base_vec_col=vec_col,
        )
        .filter(F.col("query_id") != F.col("vec_id"))
    )
    out = topk_per_query(scored, k, mode=mode)
    return out.select(
        F.col("query_id").alias("src"),
        F.col("vec_id").alias("dst"),
        "dist",
        "rank",
    )


def recall_at_k(result: DataFrame, truth: DataFrame, k: int = 10) -> float:
    """Recall@k of ``result`` against exact ``truth`` (both knn outputs).

    Mirrors the reference's notebook evaluation (py/hnsw.ipynb cell-6):
    |approx ∩ exact| / |exact| over the top-k sets per query.
    """
    r = result.filter(F.col("rank") <= k).select("query_id", "vec_id")
    t = truth.filter(F.col("rank") <= k).select("query_id", "vec_id")
    hit = r.join(t, ["query_id", "vec_id"], "inner").count()
    total = t.count()
    return hit / total if total else 0.0
