"""Drop-in API compatibility with the reference library.

A user of renanGit/Vector-Search holds three classes:
``BruteForce`` (py/bruteforce.py:1-19), ``ProductQuantizer``
(py/pq.py:5-381), and ``HNSWIndex`` (py/hnsw.py:147-410). This module
re-exposes the same class names, method names, argument orders, return
shapes, and error messages, backed by this engine:

- dataset-scale calls (``TrainPQ``, ``RunSearch``, the build behind
  ``KNNSearch``) run distributed through the DataFrame operators;
- single-item calls (``Encode``, ``Decode``, ``ComputeAsymmetric/
  SymmetricDistance``) are driver-side numpy — they touch only the
  model, and a Spark job per vector would be absurd;
- ``HNSWIndex.Insert`` is an O(1) append; the graph is (re)built
  lazily at the first ``KNNSearch`` after new inserts (batch
  construction is the Spark-appropriate form of the reference's
  per-row mutation — SURVEY.md §2.8 #36). Amortized over a batch of
  inserts the work is the same; a lone Insert+search pays one build.

Semantics notes:
- RNG streams cannot match the reference across engines, so trained
  codebooks/graphs differ run-to-run from the reference's — contracts
  (shapes, orderings, invariants, recall) match, bit-streams don't.
- HNSW + compression: the reference stores PQ codes and searches with
  asymmetric distance (py/hnsw.py:185,217-226). For the L2 kernel,
  ADC(query, code) == L2Sqr(query, Decode(code)) exactly (sum of
  per-subspace centroid distances), so this shim searches over decoded
  vectors — identical distances, one less code path.

This is the switch-without-rewriting layer; new code should call the
operators directly (they take DataFrames and never collect).
"""

from __future__ import annotations

import numpy as np

__all__ = ["BruteForce", "ProductQuantizer", "HNSWIndex", "Graph", "Item"]


def _spark():
    from vector_search_spark.session import get_spark

    return get_spark(app_name="vss-compat")


def _to_df(spark, vectors):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vectors)],
        "vec_id long, embedding array<double>",
    )


class BruteForce:
    """Reference py/bruteforce.py:1-19."""

    def __init__(self, dataset: list):
        self.dataset = list(dataset)

    def L2Sqr(self, p: list, q: list) -> float:
        a = np.asarray(p, dtype=np.float64)
        b = np.asarray(q, dtype=np.float64)
        return float(((a - b) ** 2).sum())

    def RunSearch(self, queryset: list, topk: int) -> list:
        """Exact top-k per query: list (per query) of ascending
        (distance, index) tuples — the reference's return shape."""
        from vector_search_spark.operators import knn

        spark = _spark()
        base = _to_df(spark, self.dataset)
        queries = _to_df(spark, queryset).withColumnRenamed(
            "vec_id", "query_id"
        )
        out = knn.brute_force_knn(
            queries,
            base,
            k=topk,
            query_id_col="query_id",
            query_vec_col="embedding",
        )
        rows = out.orderBy("query_id", "rank").collect()
        res: list[list[tuple[float, int]]] = [[] for _ in queryset]
        for r in rows:
            res[r.query_id].append((float(r.dist), int(r.vec_id)))
        return res


class ProductQuantizer:
    """Reference py/pq.py:5-381 (same ctor args, methods, errors)."""

    def __init__(
        self,
        M: int,
        K: int,
        D: int,
        seed: int = 42,
        n_threads: int | None = None,
    ):
        if D % M != 0:
            raise ValueError(f"D ({D}) must be divisible by M ({M})")
        self.M, self.K, self.D = M, K, D
        self.D_ = D // M
        self.seed = seed
        # reference fans training out over a thread pool (py/pq.py:49-50);
        # Spark tasks replace threads — accepted and ignored
        self.n_threads = n_threads
        self.trained = False
        self._cb = np.zeros((M, K, self.D_), dtype=np.float64)

    # -- training (distributed) -------------------------------------------
    def TrainPQ(self, data_sample: list) -> None:
        if len(data_sample) == 0:
            raise ValueError("Training data cannot be empty")
        if len(data_sample[0]) != self.D:
            raise ValueError(
                f"Expected vectors of dimension {self.D}, "
                f"got {len(data_sample[0])}"
            )
        from vector_search_spark.operators import pq

        spark = _spark()
        model, _iters = pq.train_pq(
            _to_df(spark, data_sample),
            m=self.M,
            k=self.K,
            seed=self.seed,
        )
        self._cb = np.ascontiguousarray(model.codebooks, dtype=np.float64)
        self.trained = True

    # -- single-item model ops (driver-side numpy) ------------------------
    def _subs(self, vec) -> np.ndarray:
        v = np.asarray(vec, dtype=np.float64)
        return v.reshape(self.M, self.D_)

    def Encode(self, vec: list) -> list:
        if not self.trained:
            raise ValueError(
                "Product quantizer must be trained before encoding"
            )
        sub = self._subs(vec)  # (M, D')
        d = ((self._cb - sub[:, None, :]) ** 2).sum(axis=2)  # (M, K)
        return [int(i) for i in d.argmin(axis=1)]

    def Decode(self, code: list) -> list:
        if not self.trained:
            raise ValueError(
                "Product quantizer must be trained before decoding"
            )
        return [
            float(x)
            for m in range(self.M)
            for x in self._cb[m, code[m]]
        ]

    def ComputeAsymmetricDistance(self, query: list, code: list) -> float:
        if not self.trained:
            raise ValueError(
                "Product quantizer must be trained before computing distances"
            )
        sub = self._subs(query)
        cen = self._cb[np.arange(self.M), np.asarray(code, dtype=np.int64)]
        return float(((sub - cen) ** 2).sum())

    def ComputeSymmetricDistance(self, code_v: list, code_w: list) -> float:
        if not self.trained:
            raise ValueError(
                "Product quantizer must be trained before computing distances"
            )
        idx = np.arange(self.M)
        a = self._cb[idx, np.asarray(code_v, dtype=np.int64)]
        b = self._cb[idx, np.asarray(code_w, dtype=np.int64)]
        return float(((a - b) ** 2).sum())

    # -- model export/import (reference py/pq.py:351-381) -----------------
    def SetCodebooks(self, codebooks: list) -> None:
        if len(codebooks) != self.M:
            raise ValueError(
                f"Expected {self.M} codebooks, got {len(codebooks)}"
            )
        for m, cb_m in enumerate(codebooks):
            if len(cb_m) != self.K:
                raise ValueError(
                    f"Expected {self.K} centroids in codebook {m}, "
                    f"got {len(cb_m)}"
                )
            for k, cen in enumerate(cb_m):
                if len(cen) != self.D_:
                    raise ValueError(
                        f"Expected centroids of dimension {self.D_} in "
                        f"codebook {m}, got {len(cen)} for centroid {k}"
                    )
        self._cb = np.asarray(codebooks, dtype=np.float64)
        self.trained = True

    def GetCodebooks(self) -> list:
        if not self.trained:
            raise ValueError(
                "Product quantizer must be trained before accessing codebooks"
            )
        return [
            [[float(x) for x in cen] for cen in cb_m] for cb_m in self._cb
        ]


def _codec_trained(c) -> bool:
    """Trained-state probe accepting BOTH codec styles: the reference's
    ``.trained`` attribute and this repo's protocol ``is_trained()``
    method — getattr(c, 'trained', False) alone silently treated a
    trained protocol codec as untrained."""
    t = getattr(c, "trained", None)
    if t is not None:
        return bool(t)
    it = getattr(c, "is_trained", None)
    return bool(it()) if callable(it) else False


class HNSWIndex:
    """Reference py/hnsw.py:147-410: Insert + layered KNNSearch.

    Insert appends; the layered graph is built in batch at the first
    KNNSearch after new inserts (coarse-routed blocked candidates +
    diversity pruning + symmetrize — operators/graph.py), searched with
    the real upper-layer descent + layer-0 beam."""

    DEFAULT_EF_SEARCH = 200  # reference py/hnsw.py:165

    def __init__(self, M: int, ef_construction: int, compression=None):
        self.M = M
        self.ef_construction = ef_construction
        self.compression = compression
        self.vectors: list[list[float]] = []
        self._graph = None
        self._base_df = None
        self._dirty = True

    def Insert(self, q: list) -> None:
        if self.compression is not None and _codec_trained(
            self.compression
        ):
            if not (
                hasattr(self.compression, "Encode")
                and hasattr(self.compression, "Decode")
            ):
                # a DataFrame-level codec (functions/compression.py
                # VectorCompression protocol) plugs into the engine
                # operators, not this per-vector reference shim —
                # storing raw silently would break the compressed-
                # storage contract (advice-prevention, r7)
                raise TypeError(
                    "HNSWIndex compression must expose the reference's "
                    "per-vector Encode/Decode interface; got "
                    f"{type(self.compression).__name__}"
                )
            # store the quantized form, like the reference (py/hnsw.py:
            # 345-348); L2-ADC == L2 on decoded vectors, so decoded
            # storage gives bit-identical search distances
            q = self.compression.Decode(self.compression.Encode(q))
        self.vectors.append([float(x) for x in q])
        self._dirty = True

    def _build(self) -> None:
        from vector_search_spark.operators import graph as gr
        from vector_search_spark.operators import kmeans

        spark = _spark()
        self._base_df = _to_df(spark, self.vectors).localCheckpoint()
        n = len(self.vectors)
        k = max(1, min(8, n // 16 or 1))
        cents = kmeans.train_coarse(self._base_df, k=k, seed=42)
        self._graph = gr.hnsw_build(
            self._base_df,
            cents,
            m=self.M,
            ef_construction=self.ef_construction,
            seed=42,
        )
        self._dirty = False

    def KNNSearch(self, q: list, topK: int, ef_search: int = 0) -> list:
        if not self.vectors:
            return []
        if self._dirty:
            self._build()
        from vector_search_spark.operators import graph as gr

        spark = _spark()
        ef = ef_search or self.DEFAULT_EF_SEARCH
        queries = spark.createDataFrame(
            [(0, [float(x) for x in q])],
            "vec_id long, embedding array<double>",
        )
        seeds = gr.descend_entry_points(self._graph, self._base_df, queries)
        out = gr.greedy_search(
            self._graph,
            self._base_df,
            queries,
            k=topK,
            ef=ef,
            seeds=seeds,
            expand=2,
        )
        return [
            (float(r.dist), int(r.vec_id))
            for r in out.orderBy("rank").collect()
        ]


class Graph:
    """Reference py/hnsw.py:9-117: the mutable layered-graph API.

    Internally one flat edge set of (layer, src, dst) triples plus an
    initialized-height counter — the row form of the engine's edge
    DataFrame (SURVEY §1: "layers are just a column") rather than the
    reference's layer->node->set nesting. ``to_edges_df`` /
    ``from_edges_df`` bridge to the distributed artifact: a hand-built
    Graph can be searched by operators/graph.py, and an ``hnsw_build``
    artifact can be probed with these methods.
    """

    def __init__(self):
        self._edges: set[tuple[int, int, int]] = set()
        self._height = 0

    def GetHeight(self) -> int:
        return self._height

    def IsLayerEmpty(self, l_c: int) -> bool:
        if l_c > self._height - 1:
            return True
        return not any(e[0] == l_c for e in self._edges)

    def LayerNodeCnt(self, l_c: int) -> int:
        return len({e[1] for e in self._edges if e[0] == l_c})

    def LayerNodeAdjCnt(self, l_c: int, node: int) -> int:
        return len(self.GetNeighbors(l_c, node))

    def GetNeighbors(self, l_c: int, node: int) -> set:
        return {d for l, s, d in self._edges if l == l_c and s == node}

    def GetLayerNodes(self, l_c: int):
        return {s for l, s, _ in self._edges if l == l_c}

    def InitLevels(self, l_c: int) -> None:
        self._height = max(self._height, l_c + 1)

    def AddEdge(self, l_c: int, p: int, q: int) -> None:
        self._edges.add((l_c, p, q))

    def RemoveEdge(self, l_c: int, node: int, nei: int) -> None:
        self._edges.discard((l_c, node, nei))

    def PrintLayer(self, l_c: int) -> None:
        adj: dict[int, set[int]] = {}
        for l, s, d in self._edges:
            if l == l_c:
                adj.setdefault(s, set()).add(d)
        print(adj)

    # -- bridges to the distributed edge artifact -------------------------
    def to_edges_df(self, spark=None):
        """(layer int, src long, dst long) DataFrame of this graph."""
        spark = spark or _spark()
        return spark.createDataFrame(
            sorted(self._edges), "layer int, src long, dst long"
        )

    @classmethod
    def from_edges_df(cls, edges) -> "Graph":
        """Build from an edge DataFrame (e.g. HNSWGraph.edges)."""
        g = cls()
        for r in edges.select("layer", "src", "dst").collect():
            g.InitLevels(int(r.layer))
            g.AddEdge(int(r.layer), int(r.src), int(r.dst))
        return g


class Item:
    """Reference py/hnsw.py:120-144: a scored query/insert handle — a
    closure over a distance function. Search path carries the raw
    vector (idx_q < 0); insert path carries the already-stored index,
    enabling the memoized kernel. Kept for API completeness; in the
    engine a "scored item" is just a distance Column (SURVEY §1)."""

    def __init__(self, dist_fn, q: list, idx_q: int = -1):
        self.q = q
        self.idx_q = idx_q
        self.dist_fn = dist_fn

    def DistToNode(self, node: int) -> float:
        if self.idx_q < 0:
            return self.dist_fn(self.q, node)
        return self.dist_fn(self.idx_q, node)
