"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The real catalog lives in ``vector_search_spark.queries`` — one
``QuerySpec`` per implemented operator from SURVEY.md §2, each pairing the
Spark builder with its DuckDB oracle SQL. This file is a thin adapter.
"""

from __future__ import annotations

import functools
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vector_search_spark.queries import get_catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: exact brute-force top-10 kNN over embeddings
    (the reference's BruteForce.RunSearch, py/bruteforce.py:11-19) at
    sf0.001. Driver checks rows>0 and a stable schema."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return get_catalog()["knn_exact"].fn(spark, "/root/testdata/sf0.001")


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    @functools.wraps(fn)
    def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return fn(spark, sf_dir)

    return runner


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2)."""
    return {name: _wrap(spec.fn) for name, spec in get_catalog().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted => rows-only check."""
    return {
        name: spec.oracle
        for name, spec in get_catalog().items()
        if spec.oracle is not None
    }
