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
def test_query_nonempty_and_scale_safe(spark, name):
    """Every catalog query should (a) return at least one row at test SF
    — an empty result would make the driver's value-hash check vacuous —
    and (b) contain NO data-sized unpartitioned Window in its optimized
    plan: every global window must sit above an Aggregate on all paths
    to a scan AND that Aggregate must group only on bounded-domain keys
    (operator-internal _shard/_g, or the query's declared
    QuerySpec.bounded_keys) — round-10 tightening: 'sits above an
    Aggregate' alone let groupBy(doc_id)+global window pass, and a
    doc_id group count IS the corpus. This is the catalog-wide version
    of tests/test_plans.py's per-query gate — a new entry (or a refactor
    of an old one) that sneaks in a corpus-sized single-task window
    fails HERE, not at 10^9 rows (undeclared grouping keys fail too:
    every exemption is an explicit bounded_keys claim at the register
    site)."""
    from vector_search_spark.plans.explain import (
        unpartitioned_windows_aggregate_bounded,
    )

    spec = _catalog()[name]
    sdf = spec.fn(spark, SF_ORACLE)
    assert unpartitioned_windows_aggregate_bounded(
        sdf, bounded_keys=spec.bounded_keys
    ), (
        f"{name}: optimized plan has an unpartitioned Window whose input "
        "is not a bounded-domain Aggregate (group keys must be "
        "operator-bounded or declared in QuerySpec.bounded_keys) — a "
        "single-task bottleneck at scale"
    )
    assert sdf.limit(1).count() == 1


def test_oracle_snippets_render_canonical():
    """Round-9 consolidation lock: the five per-module L2/dot oracle
    snippet copies were replaced by the single queries.l2_sql/dot_sql
    definitions. These literals are the EXACT pre-consolidation
    strings (from git history) — if a helper edit changes any rendered
    oracle, this fails before the driver's hash check does."""
    from vector_search_spark import queries, queries_text, queries_vector
    from vector_search_spark.queries import dot_sql, l2_sql

    l2_i = (
        "list_sum(list_transform(range(1, len({a})+1),"
        " i -> ({a}[i]-{b}[i])^2))"
    )
    dot_i = (
        "list_sum(list_transform(range(1, len({a})+1), i -> {a}[i]*{b}[i]))"
    )
    l2_j = (
        "list_sum(list_transform(range(1, len({a})+1),"
        " j -> ({a}[j]-{b}[j])^2))"
    )
    dot_j = (
        "list_sum(list_transform(range(1, len({a})+1), j -> {a}[j]*{b}[j]))"
    )
    assert l2_sql("{a}", "{b}") == l2_i
    assert dot_sql("{a}", "{b}") == dot_i
    assert queries._L2_SQL == l2_i and queries._DOT_SQL == dot_i
    assert queries_text._EL2 == l2_i and queries_text._DOT == dot_i
    assert queries_text._SEM_L2 == l2_i and queries_text._SEM_DOT == dot_i
    assert queries_text._MDOT == dot_i
    assert queries_vector._L2 == l2_j and queries_vector._DOT_SQL2 == dot_j
