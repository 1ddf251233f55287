"""Scalar quantization (int8-range) — the second VectorCompression
implementation beside PQ.

Mirrors the pluggable-compression surface of the reference
(py/vector_compression.py:5-94: Train/Encode/Decode/distance hooks) with
a far simpler codec: per-dimension affine quantization to 256 levels.
code[d] = clamp(round((x[d] - min[d]) / scale[d]), 0, 255),
scale[d] = (max[d] - min[d]) / 255. 4x compression for float32 input,
trivially vectorizable, and — unlike PQ — every stage here is a pure
Catalyst expression (no UDF anywhere): train is one agg, encode/decode
are zip_with folds that inline into whole-stage codegen.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_search_spark.functions.distance import as_double_array

__all__ = ["SQModel", "train_sq", "encode", "decode", "sq_topk"]


@dataclass
class SQModel:
    mins: np.ndarray  # (D,)
    scales: np.ndarray  # (D,), never 0 (degenerate dims get scale 1)

    @property
    def dim(self) -> int:
        return len(self.mins)


def train_sq(
    points: DataFrame, vec_col: str = "embedding"
) -> SQModel:
    """Per-dimension min/max: posexplode to (pos, x) and aggregate.
    Map-side partial min/max reduces the shuffle to D rows per input
    partition regardless of N — the scalable shape (a collect_list
    fold would funnel every vector into one agg row)."""
    rows = (
        points.select(
            F.posexplode(as_double_array(vec_col)).alias("pos", "x")
        )
        .groupBy("pos")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .collect()
    )
    d = len(rows)
    mins = np.zeros(d)
    maxs = np.zeros(d)
    for r in rows:
        mins[r["pos"]] = r["mn"]
        maxs[r["pos"]] = r["mx"]
    scales = (maxs - mins) / 255.0
    scales[scales == 0.0] = 1.0
    return SQModel(mins=mins, scales=scales)


def _lit_array(vals: np.ndarray):
    return F.array(*[F.lit(float(v)) for v in vals])


def encode(
    points: DataFrame,
    model: SQModel,
    vec_col: str = "embedding",
    out_col: str = "code",
) -> DataFrame:
    """code = clamp(round((x - min) / scale), 0, 255) as array<smallint>
    (values are 0..255; smallint keeps them unambiguous)."""
    shifted = F.zip_with(
        as_double_array(vec_col), _lit_array(model.mins), lambda x, m: x - m
    )
    code = F.zip_with(
        shifted,
        _lit_array(model.scales),
        lambda v, s: F.least(
            F.greatest(F.round(v / s, 0), F.lit(0.0)), F.lit(255.0)
        ).cast("smallint"),
    )
    return points.withColumn(out_col, code)


def decode(
    coded: DataFrame,
    model: SQModel,
    code_col: str = "code",
    out_col: str = "decoded",
) -> DataFrame:
    """Reconstruction: min + code * scale (max error scale/2 per dim)."""
    dec = F.zip_with(
        F.zip_with(
            F.col(code_col).cast("array<double>"),
            _lit_array(model.scales),
            lambda c, s: c * s,
        ),
        _lit_array(model.mins),
        lambda v, m: v + m,
    )
    return coded.withColumn(out_col, dec)


def sq_topk(
    queries: DataFrame,
    coded: DataFrame,
    model: SQModel,
    k: int = 10,
    query_id_col: str = "vec_id",
    query_vec_col: str = "embedding",
    base_id_col: str = "vec_id",
    code_col: str = "code",
) -> DataFrame:
    """Asymmetric search over SQ codes: decode on the fly (expression),
    then the gemm kNN path — raw queries vs reconstructed base."""
    from vector_search_spark.operators import knn

    base = decode(coded, model, code_col=code_col, out_col="_dv").select(
        F.col(base_id_col).alias("vec_id"), F.col("_dv")
    )
    return knn.brute_force_knn(
        queries,
        base,
        k=k,
        metric="l2_sqr",
        query_id_col=query_id_col,
        query_vec_col=query_vec_col,
        base_id_col="vec_id",
        base_vec_col="_dv",
    )
