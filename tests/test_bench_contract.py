"""Contracts on the bench harness itself (no Spark needed): the compact
headline must carry the top-N slowest entries AND every entry whose code
changed this round (round-9 judge ask #6 — a regression in changed code
must never hide below the top-N cut), and the changed-list must name
real catalog entries so a stale list fails loudly instead of silently
guarding nothing."""

from __future__ import annotations

import bench


def test_headline_includes_changed_even_when_fast():
    timings = {f"q{i}": float(100 - i) for i in range(30)}  # q0 slowest
    timings["changed_fast"] = 0.001  # far below any top-20 cut
    timings["changed_failed"] = float("nan")
    top = bench.headline_queries(
        timings, ["changed_fast", "changed_failed"], top_n=20
    )
    # top-N by time present
    for i in range(20):
        assert f"q{i}" in top
    # the fast changed entry is pulled in despite ranking ~31st
    assert top["changed_fast"] == 0.001
    # failed (NaN) entries stay out of the headline map — they surface
    # in failed_reps instead (NaN would also break strict JSON parsers)
    assert "changed_failed" not in top
    assert all(v == v for v in top.values())


def test_headline_is_exactly_topn_without_changed():
    timings = {f"q{i}": float(i) for i in range(25)}
    top = bench.headline_queries(timings, [], top_n=20)
    assert len(top) == 20
    assert min(top.values()) == 5.0  # the 5 fastest fell below the cut


def test_changed_this_round_names_real_catalog_entries():
    from vector_search_spark.queries import get_catalog

    cat = get_catalog()
    stale = [n for n in bench.CHANGED_THIS_ROUND if n not in cat]
    assert not stale, f"CHANGED_THIS_ROUND has stale names: {stale}"


def test_canary_names_real_catalog_entries_and_fast_subset():
    """The drift canary degrades SILENTLY at runtime by design (an
    absent name is skipped so env-subset runs don't crash) — so
    staleness must be loud HERE instead: a retired/renamed canary
    entry would otherwise quietly shrink the contention-bracketing
    instrument (r17: knn_graph's retirement is exactly this class of
    change). Also pins CANARY_FAST = CANARY minus the heavy set (one
    source; the pass0/pass1/pass2 bracket needs identical
    membership)."""
    from vector_search_spark.queries import get_catalog

    cat = get_catalog()
    stale = [n for n in bench.CANARY if n not in cat]
    assert not stale, f"CANARY has stale names: {stale}"
    assert bench.CANARY_FAST == [
        n for n in bench.CANARY if n not in bench.CANARY_HEAVY
    ]
    assert bench.CANARY_HEAVY <= set(bench.CANARY)
