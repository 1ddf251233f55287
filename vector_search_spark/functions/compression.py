"""Pluggable vector-compression strategy (reference parity:
``py/vector_compression.py:5-94``).

The reference defines an ABC — Train / Encode / Decode /
ComputeAsymmetricDistance / ComputeSymmetricDistance / IsTrained /
Get-SetCodebooks — and composes an instance into HNSW so the same index
code runs raw or compressed (``py/hnsw.py:155,181-189``). The Spark
translation: a codec is an object whose methods take and return
DataFrames (encode/decode are column expressions or Arrow-batch passes,
never per-row Python), and search entry points accept any codec — the
strategy swap is plan construction, not a runtime branch.

Three implementations:

- :class:`PQCodec` — Product Quantization (operators/pq.py). ADC = the
  classic per-query M x K LUT; SDC available via pq.sdc_topk.
- :class:`SQCodec` — scalar quantization (operators/sq.py). Asymmetric
  search decodes on the fly with Catalyst expressions.
- :class:`NoCompression` — the raw-vector path (the reference's
  ``use_compression=False`` branch): encode/decode are identity,
  asymmetric search is exact brute force.

``tests/test_pq.py`` runs the same generic search harness over all
three, mirroring how ``py/test_compression.py`` exercises HNSW with and
without PQ.
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

from pyspark.sql import DataFrame

from vector_search_spark.operators import pq as _pq
from vector_search_spark.operators import sq as _sq

__all__ = ["VectorCompression", "PQCodec", "SQCodec", "NoCompression"]


@runtime_checkable
class VectorCompression(Protocol):
    """What an index needs from a codec (reference ABC method map:
    Train->train, Encode->encode, Decode->decode,
    ComputeAsymmetricDistance->asymmetric_topk, IsTrained->is_trained)."""

    def train(self, points: DataFrame) -> None: ...

    def is_trained(self) -> bool: ...

    def encode(self, points: DataFrame) -> DataFrame: ...

    def decode(self, codes: DataFrame) -> DataFrame: ...

    def asymmetric_topk(
        self, queries: DataFrame, codes: DataFrame, k: int
    ) -> DataFrame: ...


class PQCodec:
    """Product-Quantization codec. ``code`` column = M packed bytes
    (BinaryType) at K<=256, else array<smallint>; SDC (code-to-code)
    additionally via pq.sdc_topk."""

    def __init__(self, m: int = 8, k: int = 16, seed: int = 42,
                 max_iter: int = 8):
        self.m, self.k, self.seed, self.max_iter = m, k, seed, max_iter
        self.model: _pq.PQModel | None = None

    def train(self, points: DataFrame) -> None:
        self.model, _ = _pq.train_pq(
            points, m=self.m, k=self.k, seed=self.seed,
            max_iter=self.max_iter,
        )

    def is_trained(self) -> bool:
        return self.model is not None

    def _need(self) -> _pq.PQModel:
        if self.model is None:  # same contract as py/pq.py:251-252
            raise ValueError("codec is not trained")
        return self.model

    def encode(self, points: DataFrame) -> DataFrame:
        return _pq.encode(points, self._need())

    def decode(self, codes: DataFrame) -> DataFrame:
        return _pq.decode(codes, self._need())

    def asymmetric_topk(
        self, queries: DataFrame, codes: DataFrame, k: int
    ) -> DataFrame:
        return _pq.adc_topk(queries, codes, self._need(), k=k)


class SQCodec:
    """Scalar-quantization codec (int8-range per dimension)."""

    def __init__(self):
        self.model: _sq.SQModel | None = None

    def train(self, points: DataFrame) -> None:
        self.model = _sq.train_sq(points)

    def is_trained(self) -> bool:
        return self.model is not None

    def _need(self) -> _sq.SQModel:
        if self.model is None:
            raise ValueError("codec is not trained")
        return self.model

    def encode(self, points: DataFrame) -> DataFrame:
        return _sq.encode(points, self._need())

    def decode(self, codes: DataFrame) -> DataFrame:
        return _sq.decode(codes, self._need())

    def asymmetric_topk(
        self, queries: DataFrame, codes: DataFrame, k: int
    ) -> DataFrame:
        return _sq.sq_topk(queries, codes, self._need(), k=k)


class NoCompression:
    """Identity codec — the raw-vector branch of the reference's
    strategy switch (py/hnsw.py:187-189)."""

    def train(self, points: DataFrame) -> None:
        pass

    def is_trained(self) -> bool:
        return True

    def encode(self, points: DataFrame) -> DataFrame:
        return points

    def decode(self, codes: DataFrame) -> DataFrame:
        return codes

    def asymmetric_topk(
        self, queries: DataFrame, codes: DataFrame, k: int
    ) -> DataFrame:
        from vector_search_spark.operators import knn

        return knn.brute_force_knn(queries, codes, k=k)
