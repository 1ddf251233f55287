"""Vector-engine catalog queries: k-means, PQ, IVF, ANN.

Registered into vector_search_spark.queries.CATALOG on import.

Determinism strategy for oracle-paired entries: anything that would
normally be "trained" (centroids, codebooks) is derived from the data
itself in a SQL-expressible way (first-k rows / subvector slices), so
DuckDB can reproduce the whole pipeline — assignment, encode, ADC/SDC,
IVF routing — exactly. The *real* trainers (seeded k-means++, Lloyd to
tolerance, PQ training) are exposed as rows-only entries and tested via
invariants + recall in tests/ (SURVEY.md §5: RNG parity across engines
is impossible; test semantics, not bit-parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_search_spark import tables
from vector_search_spark.operators import kmeans
from vector_search_spark.queries import register, rnd

_L2 = "list_sum(list_transform(range(1, len({a})+1), j -> ({a}[j]-{b}[j])^2))"

KM_K = 8
KM_ITERS = 3


def _assign_sql(pts: str, cents: str, out_dist: bool) -> str:
    dist_col = f", (ROUND(d, 6) + 0.0) AS dist" if out_dist else ""
    return f"""
  SELECT vec_id, cluster_id{dist_col} FROM (
    SELECT p.vec_id, c.cluster_id, {_L2.format(a="p.v", b="c.cv")} AS d
    FROM {pts} p CROSS JOIN {cents} c)
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cluster_id) = 1
"""


def _lloyd_oracle(k: int, iters: int) -> str:
    sql = f"""
WITH pts AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c0 AS (SELECT CAST(vec_id AS INT) AS cluster_id, v AS cv FROM pts WHERE vec_id < {k})"""
    for i in range(1, iters + 1):
        prev = f"c{i-1}"
        sql += f""",
a{i} AS ({_assign_sql("pts", prev, out_dist=False)}),
m{i} AS (
  SELECT cluster_id, list(mv ORDER BY pos) AS cv FROM (
    SELECT cluster_id, pos, avg(val) AS mv FROM (
      SELECT a.cluster_id, generate_subscripts(p.v, 1) AS pos, unnest(p.v) AS val
      FROM a{i} a JOIN pts p USING (vec_id)
    ) GROUP BY cluster_id, pos
  ) GROUP BY cluster_id
),
c{i} AS (
  SELECT c.cluster_id, COALESCE(m.cv, c.cv) AS cv
  FROM {prev} c LEFT JOIN m{i} m USING (cluster_id)
)"""
    sql += f"\nSELECT * FROM ({_assign_sql('pts', f'c{iters}', out_dist=True)})"
    return sql


@register(
    "kmeans_assign",
    f"""
WITH pts AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c0 AS (SELECT CAST(vec_id AS INT) AS cluster_id, v AS cv FROM pts WHERE vec_id < {KM_K})
SELECT * FROM ({_assign_sql("pts", "c0", out_dist=True)})
""",
    "vector",
    "kmeans",
)
def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmin centroid assignment (reference py/pq.py:161-171), centroids
    fixed to the first-k embeddings so the oracle can reproduce them."""
    emb = tables.load(spark, sf_dir, "embeddings")
    C = kmeans.init_first_k(emb, KM_K)
    out = kmeans.assign(emb, C)
    return out.select("vec_id", "cluster_id", rnd("dist").alias("dist"))


@register("kmeans_lloyd", _lloyd_oracle(KM_K, KM_ITERS), "vector", "kmeans")
def q_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three full Lloyd iterations (assign -> mean, empty keeps old,
    reference py/pq.py:158-204) from deterministic init; the oracle is
    the same recurrence unrolled in SQL — a genuine end-to-end check of
    the distributed training loop."""
    emb = tables.load(spark, sf_dir, "embeddings")
    C = kmeans.init_first_k(emb, KM_K)
    res = kmeans.lloyd(emb, C, max_iter=KM_ITERS, tol=0.0)
    out = kmeans.assign(emb, res.centroids)
    return out.select("vec_id", "cluster_id", rnd("dist").alias("dist"))


@register("kmeans_train", None, "vector", "kmeans", "rows-only")
def q_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full seeded training (k-means++ init, Lloyd to tol=1e-6 / 100
    iters — reference defaults py/pq.py:140,197). RNG cannot match any
    SQL oracle; correctness is covered by invariant tests + the
    kmeans_lloyd oracle above. Returns per-cluster size and inertia."""
    emb = tables.load(spark, sf_dir, "embeddings")
    init = kmeans.kmeans_plus_plus(emb, k=10, seed=42)
    res = kmeans.lloyd(emb, init, max_iter=100, tol=1e-6)
    out = kmeans.assign(emb, res.centroids)
    return (
        out.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("size"),
            rnd(F.sum("dist"), 4).alias("inertia"),
        )
        .orderBy("cluster_id")
    )
