"""Vector distance kernels as Catalyst column expressions.

Mirrors the reference's scalar kernels (SURVEY.md §2.1):
- ``L2Sqr``  (reference py/hnsw.py:191-203, py/pq.py:57-61,
  py/bruteforce.py:5-9) -> :func:`l2_sqr`
- the cosine / inner-product variants its docs anticipate
  (reference py/PRODUCT_QUANTIZATION.md:276-279).

Implementation notes
--------------------
* ``zip_with`` + ``aggregate`` is a sequential in-order fold over the
  array — element order is deterministic, so two engines computing the
  same fold in double precision agree bit-for-bit (the DuckDB oracle
  uses the same index-ordered sum).
* Inputs are widened to ``array<double>`` first: float32 components are
  exactly representable in float64, so widening is lossless, while
  arithmetic staying in float32 would diverge from any double-precision
  oracle.
* These are plain Catalyst expressions: they inline into whole-stage
  codegen, so a cross join + l2_sqr + top-k pipeline runs fully JVM-side
  with zero Python involvement.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def as_double_array(c: ColumnOrName) -> Column:
    """Losslessly widen array<float> to array<double>."""
    return _col(c).cast("array<double>")


def l2_sqr(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Squared Euclidean distance between two vector columns."""
    ad, bd = as_double_array(a), as_double_array(b)
    return F.aggregate(
        F.zip_with(ad, bd, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Euclidean distance."""
    return F.sqrt(l2_sqr(a, b))


def dot(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Inner product."""
    ad, bd = as_double_array(a), as_double_array(b)
    return F.aggregate(
        F.zip_with(ad, bd, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: ColumnOrName) -> Column:
    """L2 norm of a vector column."""
    ad = as_double_array(a)
    return F.sqrt(
        F.aggregate(
            F.transform(ad, lambda x: x * x),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    d = dot(a, b)
    denom = norm(a) * norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(d / denom)


def cosine_distance(a: ColumnOrName, b: ColumnOrName) -> Column:
    """1 - cosine similarity (a proper kNN ordering key)."""
    return F.lit(1.0) - cosine_similarity(a, b)


METRICS = {
    "l2_sqr": l2_sqr,
    "l2": l2,
    "cosine": cosine_distance,
    "dot": lambda a, b: -dot(a, b),  # negated so smaller == closer
}


def distance(metric: str, a: ColumnOrName, b: ColumnOrName) -> Column:
    """Distance expression for ``metric`` where smaller is always closer."""
    try:
        return METRICS[metric](a, b)
    except KeyError:
        raise ValueError(f"unknown metric {metric!r}; one of {sorted(METRICS)}") from None
