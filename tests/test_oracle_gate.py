"""The local correctness gate: every oracle-paired catalog query must
match its DuckDB oracle exactly (the driver's check, run early and often).
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE
from tests.oracle_util import compare_frames


def _catalog():
    from vector_search_spark.queries import get_catalog

    return get_catalog()


def _names():
    return sorted(_catalog().keys())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, duck, name):
    spec = _catalog()[name]
    sdf = spec.fn(spark, SF_ORACLE)
    assert sdf.count() >= 0  # must at least execute
    if spec.oracle is None:
        pytest.skip("rows-only query (no SQL oracle)")
    problems = compare_frames(sdf, duck.sql(spec.oracle))
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", _names())
def test_query_nonempty(spark, name):
    """Every catalog query should return at least one row at test SF —
    an empty result would make the driver's value-hash check vacuous."""
    spec = _catalog()[name]
    assert spec.fn(spark, SF_ORACLE).limit(1).count() == 1
