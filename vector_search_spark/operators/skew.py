"""Skew mitigation: salted joins.

A shuffle join on a skewed key (one customer with 10^8 rows, one
boilerplate shingle in every document) sends the whole hot key to a
single reducer — the stage then runs at the speed of that one task.
AQE's skew-join splitting (enabled in session.py) handles sort-merge
skew at runtime; SALTING is the plan-level fix that also covers
aggregations and works when statistics are wrong: split the hot side's
key space into ``n_salts`` pseudo-keys, replicate the small side once
per salt, join on (key, salt), and the hot key spreads over n_salts
tasks.

Correctness: every (big, small) row pair still meets exactly once —
big row carries one salt s, and the small side has exactly one replica
with that s per key — so the salted join is row-for-row equal to the
plain join (tests/test_plans.py asserts the equality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the big side salted across ``n_salts`` sub-keys.

    ``big`` gets a uniform salt per row; ``small`` is exploded x
    n_salts (cheap when small is the dimension side — the usual skew
    shape is big-fact x modest-dim with a few hot keys). Result columns
    match ``big.join(small, on, how)``.
    """
    salted_big = big.withColumn(
        "_salt", (F.rand(seed) * n_salts).cast("int")
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_big.join(salted_small, on + ["_salt"], how).drop("_salt")
