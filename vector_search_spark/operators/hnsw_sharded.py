"""Segment-sharded HNSW: one small in-memory HNSW graph per coarse
cell, built and searched cell-locally in a single cogrouped shuffle.

This is the production-shaped distributed ANN architecture (what
Lucene/Elasticsearch do per segment and Milvus per sealed segment): the
global index is a PARTITIONING of the base into shards that each fit an
executor, with a real insert-based HNSW per shard. Queries route to
their ``nprobe`` nearest shards (coarse-quantizer semi-join), each shard
answers from its local graph, and a window top-k merges shard results.

At 100 TB that means: 1000 executors × many cells each, zero sequential
driver iteration, one shuffle for routing + one for the merge. The
set-oriented batch traversal over a single global edge artifact lives in
``operators/graph.py`` (greedy_search) as the faithful demonstrator of
the reference's SearchLayer loop (reference py/hnsw.py:240-277); this
module is the path you would actually deploy.

Algorithm per shard follows Malkov & Yashunin (arXiv 1603.09320):
insert-based construction with geometric level draw (Alg. 1), greedy
layered descent (Alg. 2/5), and the diversity-pruning neighbor
selection (Alg. 4). Paper-faithful where the reference deviates
(SURVEY.md §2.8 ⚠): the level multiplier sits OUTSIDE the log, and
M_max0 applies at layer 0, not when the new element's level is 0.
Distances are numpy-vectorized over candidate batches rather than the
reference's per-pair Python loops (py/hnsw.py:191-203).
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_search_spark.operators.graph import route_to_cells

__all__ = ["LocalHNSW", "build_local", "hnsw_sharded_topk"]


class LocalHNSW:
    """In-memory HNSW over a (n, d) matrix — one shard's index.

    Adjacency is ``layers[l][node] -> list[int]``; nodes are row
    positions into ``X``. Kept deliberately small: this runs inside one
    executor task per shard.
    """

    def __init__(self, X: np.ndarray, m: int, ef_construction: int,
                 m_l: float, seed: int):
        self.X = X
        self.m = m
        self.m_max0 = 2 * m
        self.ef_c = ef_construction
        self.layers: list[dict[int, list[int]]] = []
        self.ep = -1
        self.top = -1
        rng = np.random.default_rng(seed)
        # paper Alg.1 line 4: l = floor(-ln(U(0,1)) * mL)
        self.levels = np.floor(
            -np.log(rng.uniform(1e-300, 1.0, len(X))) * m_l
        ).astype(np.int64)
        for i in range(len(X)):
            self._insert(i)

    # -- distance helpers (vectorized over candidate id arrays) --------
    def _d(self, q: np.ndarray, ids) -> np.ndarray:
        V = self.X[np.asarray(ids, dtype=np.int64)]
        diff = V - q
        return (diff * diff).sum(axis=1)

    # -- paper Alg.2: best-first search at one layer -------------------
    def _search_layer(self, q: np.ndarray, eps: list[int], ef: int,
                      layer: int) -> list[tuple[float, int]]:
        adj = self.layers[layer]
        dists = self._d(q, eps)
        visited = set(eps)
        cand = [(float(d), e) for d, e in zip(dists, eps)]
        heapq.heapify(cand)
        res = [(-float(d), e) for d, e in zip(dists, eps)]
        heapq.heapify(res)
        while len(res) > ef:
            heapq.heappop(res)
        while cand:
            d_c, c = heapq.heappop(cand)
            if d_c > -res[0][0]:
                break
            fresh = [u for u in adj.get(c, ()) if u not in visited]
            if not fresh:
                continue
            visited.update(fresh)
            for d_u, u in zip(self._d(q, fresh), fresh):
                d_u = float(d_u)
                if len(res) < ef or d_u < -res[0][0]:
                    heapq.heappush(cand, (d_u, u))
                    heapq.heappush(res, (-d_u, u))
                    if len(res) > ef:
                        heapq.heappop(res)
        return sorted((-d, u) for d, u in res)

    # -- paper Alg.4: diversity-pruning neighbor selection -------------
    def _select(self, cands: list[tuple[float, int]], m: int) -> list[int]:
        out: list[int] = []
        for d_c, c in sorted(cands):
            if len(out) >= m:
                break
            if all(
                d_c <= float(((self.X[c] - self.X[r]) ** 2).sum())
                for r in out
            ):
                out.append(c)
        return out

    def _link(self, layer: int, a: int, b: int) -> None:
        nb = self.layers[layer].setdefault(a, [])
        if b not in nb:
            nb.append(b)

    def _insert(self, i: int) -> None:
        l_i = int(self.levels[i])
        while len(self.layers) <= l_i:
            self.layers.append({})
        if self.ep < 0:
            self.ep, self.top = i, l_i
            for l in range(l_i + 1):
                self.layers[l].setdefault(i, [])
            return
        q = self.X[i]
        ep = [self.ep]
        for l in range(self.top, l_i, -1):
            ep = [self._search_layer(q, ep, 1, l)[0][1]]
        for l in range(min(self.top, l_i), -1, -1):
            cands = self._search_layer(q, ep, self.ef_c, l)
            m_max = self.m_max0 if l == 0 else self.m
            for nb in self._select(cands, self.m):
                self._link(l, i, nb)
                self._link(l, nb, i)
                over = self.layers[l][nb]
                if len(over) > m_max:
                    pruned = self._select(
                        list(zip(self._d(self.X[nb], over), over)), m_max
                    )
                    self.layers[l][nb] = pruned
            self.layers[l].setdefault(i, [])
            ep = [u for _, u in cands]
        if l_i > self.top:
            self.ep, self.top = i, l_i

    def search(self, q: np.ndarray, k: int, ef: int) -> list[tuple[float, int]]:
        """Paper Alg.5: greedy descent to layer 1, beam at layer 0."""
        if self.ep < 0:
            return []
        ep = [self.ep]
        for l in range(self.top, 0, -1):
            ep = [self._search_layer(q, ep, 1, l)[0][1]]
        return self._search_layer(q, ep, max(ef, k), 0)[:k]


def build_local(X: np.ndarray, m: int = 8, ef_construction: int = 32,
                m_l: float | None = None, seed: int = 42) -> LocalHNSW:
    if m_l is None:
        m_l = 1.0 / np.log(m)
    return LocalHNSW(X, m, ef_construction, m_l, seed)


def hnsw_sharded_topk(
    points: DataFrame,
    centroids: np.ndarray,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    ef_construction: int = 32,
    ef: int = 48,
    nprobe: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k ANN via per-cell HNSW: base rows live in their home cell,
    queries fan out to ``nprobe`` cells, one cogrouped applyInPandas
    builds + searches each shard, a window merges shard answers.

    Returns (query_id, vec_id, dist, rank<=k). The whole operator is two
    map passes (routing), one cogroup shuffle keyed by cell, and one
    top-k window — no driver iteration, no broadcast of index state, so
    the plan shape is invariant to table size; only cell count grows.
    """
    base = route_to_cells(points, centroids, 1, id_col, vec_col).select(
        "cell", "vec_id", "v"
    )
    qs = route_to_cells(queries, centroids, nprobe, id_col, vec_col).select(
        "cell", F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )

    def per_cell(bdf: pd.DataFrame, qdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"query_id": [], "vec_id": [], "dist": []}).astype(
            {"query_id": np.int64, "vec_id": np.int64, "dist": np.float64}
        )
        if not len(bdf) or not len(qdf):
            return empty
        ids = bdf["vec_id"].to_numpy(dtype=np.int64)
        X = np.vstack(bdf["v"].to_numpy()).astype(np.float64)
        # shard-stable seed: same cell content -> same graph
        idx = build_local(
            X, m=m, ef_construction=ef_construction,
            seed=seed + int(bdf["cell"].iat[0]),
        )
        out_q, out_v, out_d = [], [], []
        for qid, qv in zip(
            qdf["query_id"].to_numpy(dtype=np.int64), qdf["qv"].to_numpy()
        ):
            for d, pos in idx.search(np.asarray(qv, dtype=np.float64), k, ef):
                out_q.append(qid)
                out_v.append(ids[pos])
                out_d.append(d)
        return pd.DataFrame(
            {
                "query_id": np.asarray(out_q, dtype=np.int64),
                "vec_id": np.asarray(out_v, dtype=np.int64),
                "dist": np.asarray(out_d, dtype=np.float64),
            }
        )

    shard_hits = (
        base.groupby("cell")
        .cogroup(qs.groupby("cell"))
        .applyInPandas(per_cell, "query_id long, vec_id long, dist double")
    )
    w = Window.partitionBy("query_id").orderBy("dist", "vec_id")
    return (
        shard_hits.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
