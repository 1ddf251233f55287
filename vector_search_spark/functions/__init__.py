"""Pure-Catalyst column expression builders.

Everything in this package returns ``pyspark.sql.Column`` objects built
from built-in functions only — JVM-side, whole-stage-codegen-eligible.
No Python UDFs: that keeps the hot path vectorized and lets Catalyst
push, prune, and fold around these expressions.
"""

from vector_search_spark.functions.distance import (  # noqa: F401
    cosine_distance,
    cosine_similarity,
    dot,
    l2,
    l2_sqr,
    norm,
)
