"""Random-hyperplane LSH for approximate nearest neighbor.

The LSH-bucketed variant of similarity search (brief §similarity;
complements IVF in operators/ivf.py): each vector gets, per hash table,
a B-bit signature whose bit b is the sign of a dot product with a fixed
random hyperplane (Charikar 2002 SimHash for angles, applied here as a
bucketing device). Candidates = pairs sharing a (table, signature)
bucket in ANY of the T tables; exact re-rank inside the candidate set.

Scale shape: signatures are one narrow map pass; the bucket join is an
equi-join on (table, signature) — shuffle-partitioned by bucket, no N^2
anywhere; the re-rank touches only bucket collisions. Deterministic by
construction (integer hyperplanes from a seeded RNG, no float literal
drift), so the whole pipeline is value-checked against DuckDB — the SQL
oracle inlines the SAME hyperplane constants (exact as doubles) and
replays signature, bucketing, and re-rank.

Reference parity: the reference has no LSH; its bucketing role is played
by HNSW's graph locality (py/hnsw.py). This operator is part of the
mandated extension surface.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_search_spark.functions.distance import as_double_array

__all__ = [
    "hyperplanes",
    "lsh_signatures",
    "lsh_topk",
    "signature_sql",
    "lsh_probe_signatures",
    "lsh_multiprobe_topk",
    "probe_signature_sql",
]


def hyperplanes(
    dim: int, n_bits: int = 8, n_tables: int = 4, seed: int = 7
) -> np.ndarray:
    """(T, B, dim) INTEGER hyperplane bank in [-1000, 1000]. Integer
    entries are exact doubles, so a SQL literal of the same value
    computes bit-identical dot products (up to summation order)."""
    rng = np.random.default_rng(seed)
    H = rng.integers(-1000, 1001, size=(n_tables, n_bits, dim))
    return H.astype(np.float64)


def lsh_signatures(
    points: DataFrame,
    H: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, t, sig): per-table packed signature. One gemm per Arrow
    batch against the (T*B, dim) hyperplane matrix; bit b set iff
    dot(v, H[t, b]) >= 0."""
    T, B, D = H.shape
    spark = points.sparkSession
    bc = spark.sparkContext.broadcast(H.reshape(T * B, D))
    src = points.select(
        F.col(id_col).alias("vec_id"), as_double_array(vec_col).alias("v")
    )
    weights = (1 << np.arange(B, dtype=np.int64))

    def fn(batches):
        M = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
            bits = (X @ M.T) >= 0.0  # (n, T*B)
            sigs = bits.reshape(len(X), T, B) @ weights  # (n, T)
            vids = pdf["vec_id"].to_numpy(dtype=np.int64)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(vids, T),
                    "t": np.tile(np.arange(T, dtype=np.int32), len(X)),
                    "sig": sigs.reshape(-1).astype(np.int64),
                }
            )

    return src.mapInPandas(fn, "vec_id long, t int, sig long")


def lsh_topk(
    points: DataFrame,
    queries: DataFrame,
    H: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucket-join candidate generation + exact re-rank:
    (query_id, vec_id, dist, rank<=k) over candidates sharing any
    (table, signature) bucket with the query. Queries with fewer than k
    bucket-mates return fewer rows — the honest LSH contract."""
    from vector_search_spark.functions import distance as dist

    base_sigs = lsh_signatures(points, H, id_col, vec_col)
    q_sigs = lsh_signatures(queries, H, id_col, vec_col).select(
        F.col("vec_id").alias("query_id"), "t", "sig"
    )
    cand = (
        q_sigs.join(base_sigs, ["t", "sig"])
        .select("query_id", "vec_id")
        .distinct()
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("qv")
    )
    bv = points.select(
        F.col(id_col).alias("vec_id"), as_double_array(vec_col).alias("bv")
    )
    w = Window.partitionBy("query_id").orderBy("dist", "vec_id")
    return (
        cand.join(F.broadcast(qv), "query_id")
        .join(bv, "vec_id")
        .select(
            "query_id",
            "vec_id",
            dist.l2_sqr("qv", "bv").alias("dist"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def signature_sql(H: np.ndarray, src: str = "pts") -> str:
    """DuckDB SQL producing the identical (vec_id, t, sig) table from
    view ``src(vec_id, v)`` — the oracle half of lsh_signatures. The
    hyperplane constants are inlined as integers (exact doubles), so
    both engines compute the same dot-product signs."""
    T, B, D = H.shape
    selects = []
    for t in range(T):
        bits = []
        for b in range(B):
            dot = " + ".join(
                f"v[{i + 1}]*({int(H[t, b, i])})" for i in range(D)
            )
            bits.append(f"(CASE WHEN ({dot}) >= 0 THEN {1 << b} ELSE 0 END)")
        selects.append(
            f"SELECT vec_id, {t} AS t, ({' + '.join(bits)}) AS sig FROM {src}"
        )
    return " UNION ALL ".join(selects)


def lsh_probe_signatures(
    queries: DataFrame,
    H: np.ndarray,
    n_flip: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe LSH probe set (Lv et al., VLDB 2007): per table, the
    home signature PLUS ``n_flip`` one-bit perturbations flipping the
    LEAST-CONFIDENT bits (smallest |dot| — the bits most likely to
    differ for a true near neighbor). Returns (query_id, t, sig); the
    home row plus n_flip probe rows per (query, table).

    Multi-probe is the table-budget trade: probing 1+n_flip buckets per
    table recovers the recall of ~(1+n_flip)x as many tables at 1x the
    signature storage and 1x the base-side shuffle — the base relation
    is untouched; only the (tiny) query probe set fans out.

    Portability: dots accumulate STRICTLY left-to-right per dimension,
    matching the SQL oracle's ``v[1]*h1 + v[2]*h2 + ...`` chain
    bit-for-bit, so the |dot| ranking (tie-broken by bit index) is
    engine-exact — the probe SEQUENCE, not just the signatures, is
    value-checked.
    """
    T, B, D = H.shape
    if not 0 <= n_flip <= B:
        raise ValueError(f"n_flip must be in [0, {B}], got {n_flip}")
    spark = queries.sparkSession
    bc = spark.sparkContext.broadcast(H.reshape(T * B, D))
    src = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("v")
    )
    weights = (1 << np.arange(B, dtype=np.int64))

    def fn(batches):
        M = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
            n = len(X)
            # strict left-to-right accumulation (see docstring)
            dots = np.zeros((n, M.shape[0]))
            for i in range(D):
                dots += X[:, i : i + 1] * M[:, i][None, :]
            dots = dots.reshape(n, T, B)
            bits = dots >= 0.0
            sigs = bits @ weights  # (n, T)
            # least-confident bit order: |dot| asc, bit index tie-break
            order = np.lexsort(
                (np.broadcast_to(np.arange(B), dots.shape), np.abs(dots)),
                axis=2,
            )[:, :, :n_flip]  # (n, T, n_flip)
            qids = pdf["query_id"].to_numpy(dtype=np.int64)
            out_q = [np.repeat(qids, T)]
            out_t = [np.tile(np.arange(T, dtype=np.int32), n)]
            out_s = [sigs.reshape(-1).astype(np.int64)]
            for j in range(n_flip):
                flipped = sigs ^ (1 << order[:, :, j]).astype(np.int64)
                out_q.append(np.repeat(qids, T))
                out_t.append(np.tile(np.arange(T, dtype=np.int32), n))
                out_s.append(flipped.reshape(-1).astype(np.int64))
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "t": np.concatenate(out_t),
                    "sig": np.concatenate(out_s),
                }
            )

    return src.mapInPandas(fn, "query_id long, t int, sig long")


def lsh_multiprobe_topk(
    points: DataFrame,
    queries: DataFrame,
    H: np.ndarray,
    k: int = 10,
    n_flip: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """lsh_topk with multi-probe candidate generation: candidates share
    a (table, signature) bucket with the query's home OR probe
    signatures. Same exact re-rank; strictly more candidates than
    single-probe at the same table count, so recall can only improve
    (gated in tests)."""
    from vector_search_spark.functions import distance as dist

    base_sigs = lsh_signatures(points, H, id_col, vec_col)
    q_probes = lsh_probe_signatures(queries, H, n_flip, id_col, vec_col)
    cand = (
        q_probes.join(base_sigs, ["t", "sig"])
        .select("query_id", "vec_id")
        .distinct()
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("qv")
    )
    bv = points.select(
        F.col(id_col).alias("vec_id"), as_double_array(vec_col).alias("bv")
    )
    w = Window.partitionBy("query_id").orderBy("dist", "vec_id")
    return (
        cand.join(F.broadcast(qv), "query_id")
        .join(bv, "vec_id")
        .select(
            "query_id",
            "vec_id",
            dist.l2_sqr("qv", "bv").alias("dist"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def probe_signature_sql(H: np.ndarray, n_flip: int, src: str = "q") -> str:
    """DuckDB SQL producing the identical (query_id, t, sig) probe set
    from view ``src(query_id, v)`` — the oracle half of
    lsh_probe_signatures. Per-bit dots are emitted as one UNION ALL
    relation; home signatures aggregate the sign bits; probes XOR the
    n_flip least-|dot| bits (row_number over (abs(dot), b))."""
    T, B, D = H.shape
    dot_selects = []
    for t in range(T):
        for b in range(B):
            dot = " + ".join(
                f"v[{i + 1}]*({int(H[t, b, i])})" for i in range(D)
            )
            dot_selects.append(
                f"SELECT query_id, {t} AS t, {b} AS b, ({dot}) AS dot "
                f"FROM {src}"
            )
    dots = " UNION ALL ".join(dot_selects)
    return f"""
dots AS ({dots}),
homes AS (
  SELECT query_id, t,
         SUM(CASE WHEN dot >= 0 THEN (1::BIGINT << b) ELSE 0 END) AS sig
  FROM dots GROUP BY query_id, t
),
flips AS (
  SELECT query_id, t, b
  FROM (SELECT query_id, t, b,
               row_number() OVER (PARTITION BY query_id, t
                                  ORDER BY abs(dot), b) AS r
        FROM dots)
  WHERE r <= {n_flip}
),
probes AS (
  SELECT query_id, t, CAST(sig AS BIGINT) AS sig FROM homes
  UNION ALL
  SELECT f.query_id, f.t, CAST(xor(h.sig, (1::BIGINT << f.b)) AS BIGINT)
  FROM flips f JOIN homes h ON h.query_id = f.query_id AND h.t = f.t
)"""
