"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

OUTPUT CONTRACT (round 6 — BENCH_r05 lost its official number because
the single 105-entry JSON line overran the driver's stdout-tail
capture): the LAST stdout line is a COMPACT headline JSON object —
{"metric","value","unit","sf","reps","agg","failed_reps",
"serving_latency_sec","queries" (top-20 slowest + every
CHANGED_THIS_ROUND entry — round 10: a regression in changed code
must never hide below the top-N cut),
"queries_omitted","detail_file"} — sized to survive a tail capture at
any catalog size. The FULL per-query map is written to
BENCH_DETAIL.json beside this script (file only since round 7 — the
earlier stdout copy of the full map was redundant capture risk);
cross-round per-query comparison reads the detail file, which since
round 10 also carries query_reps (all rep wall-times), query_spread
(max/min over finite reps — the within-run noise bound), and
query_jobs (Spark job count of the min rep: a cross-round wall swing
with a STABLE job count is scheduler noise, not a plan change).

"serving_latency_sec" (round 7) holds min-of-3 small-batch latencies
for the two production serving paths (ivf_topk / hnsw_sharded at
nq=1 and nq=16) against a prebuilt index — see _serving_latency for
the documented expectation.

Each query is materialized with a full-result noop write (no driver
collect — measures the distributed plan, not result serialization), and
timed REPS times (default 2, $SPARK_GRAFT_BENCH_REPS) reporting the
per-query MIN: round 3 ran the controlled experiment — identical code,
single-shot per-query swings up to 2.8x — so one sample per query is
noise, not a measurement. Since round 9, entries whose min exceeds
$SPARK_GRAFT_BENCH_HEAVY_SEC (default 1.0 s) get one extra rep
(min-of-3); since round 17 an entry where a NON-FIRST rep exceeds
$SPARK_GRAFT_BENCH_SPREAD_ESCALATE (default 1.5) x the min also gets
one extra rep — the box degraded while the entry was measured (the
r16 measurement-contamination lesson; a rep1-is-max spread is just
the designated warmup and does not escalate). See the
variance-protocol comments in main().

METHODOLOGY NOTE for cross-round comparison: BENCH_r01..r03 were
single-shot (reps=1); r04+ report min-of-reps (the "reps"/"agg" fields
record which). Totals across that boundary are not comparable — part of
any apparent r03->r04 speedup is the aggregation change. Queries where
any rep failed are listed in "failed_reps" (a surviving rep's timing is
still reported, but the query must be treated as flaky, not healthy).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_ROOT)

# Headline set: one per operator family; kept in sync with the catalog.
HEADLINE = [
    "knn_exact",
    "knn_cosine",
    # r17: knn_graph retired (rotation-slack; kernel covered by
    # knn_exact/knn_cosine) — nng_blocked represents the graph family
    "nng_blocked",
    "ivf_knn",
    "tpch_q1",
]

# Entries whose code paths changed THIS round (update every round; the
# round-9 judge's ask #6): the compact headline is top-N by time PLUS
# these, so a regression in changed code can never hide below the
# top-N cut. Checked against the catalog at startup — a stale name
# here fails loudly instead of silently guarding nothing.
CHANGED_THIS_ROUND = [
    # round 18 OPTIMIZATION (see OPTIMIZATION_r18.md) — reset per the
    # r17 verdict ask #9 (only entries whose code paths changed THIS
    # round; the headline set itself is unchanged):
    # HNSW walk family — compact edge-artifact checkpoint, shared
    # query-batch collect, ring-distinct removal + struct-min argmin,
    # deliberate hop-join build sides (edges_size_hint gate), layer-1
    # probe checkpoint removal
    "hnsw_knn",
    "hnsw_adc_knn",
    "graph_greedy_search",
    # connected components — first block is one confirmation round
    # (no pointer doubling) so the common already-converged case pays
    # one O(E) join pass instead of three
    "dedup_groups",
    "dedup_keep_canonical",
    # ADC serving family — driver-routing budget guard (nq x NC x D
    # term cap with distributed route_queries fallback); at bench
    # scale the path is bit-identical driver routing, pinned here per
    # the guard-change precedent
    "ivf_adc_knn",
    "ivf_adc_range",
    "ivf_adc_knn_refined",
    "ivf_adc_range_refined",
    "ivf_adc_margin_check",
    "adc_refine_curve",
]

TOP_N = 20

# Drift-canary membership (single source — the pass0 bookend and the
# end-of-run pass2 must stay in lockstep; r17 review): code-stable
# entries re-measured across the run to bracket contention windows.
# hnsw_knn is canary (r15: same-process attribution for its known
# wall band) but HEAVY — excluded from the pass0 bookend, whose job
# is to be cheap.
CANARY = ["tpch_q12", "tpch_q13", "tpch_q19", "knn_exact", "hnsw_knn"]
CANARY_HEAVY = {"hnsw_knn"}
CANARY_FAST = [n for n in CANARY if n not in CANARY_HEAVY]


def headline_queries(
    timings: dict[str, float],
    changed: list[str],
    top_n: int = TOP_N,
) -> dict[str, float]:
    """The compact headline's per-query map: the top-N slowest entries
    UNION every changed-this-round entry (even when fast — a regression
    in changed code must never hide below the top-N cut). NaNs (failed
    queries) are excluded here; they surface in failed_reps."""
    finite = {k: v for k, v in timings.items() if v == v}
    top = dict(sorted(finite.items(), key=lambda kv: -kv[1])[:top_n])
    for name in changed:
        if name in finite:
            top[name] = finite[name]
    return top


def _materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return 0


def _clear_job_group(sc) -> None:
    """Drop the current job-group label. PySpark 4's Python
    SparkContext exposes no clearJobGroup, so call the JVM
    JavaSparkContext's documented clearJobGroup() through the py4j
    bridge rather than leaning on the undocumented behavior of
    setJobGroup(None, None) passing nulls through (r13 advice)."""
    sc._jsc.clearJobGroup()


def _serving_latency(
    spark, sf_dir: str
) -> tuple[dict[str, float], dict[str, list[float]], dict[str, int]]:
    """Small-batch serving latency for the two production serving paths
    (round-6 judge #5): the catalog rows measure BATCH throughput; a
    100 TB deployment's second question after recall is per-query-batch
    latency at nq~1, where fixed per-job overhead (scheduling, task
    launch, python worker round-trips) dominates and is invisible in
    the throughput numbers.

    Measures min-of-3 wall-clock for nq in {1, 16} against a PREBUILT
    index (centroid train + cell assignment outside the timer — the
    serving contract). EXPECTATION, documented for cross-round reads:
    on local[32] at sf0.1, nq=1 and nq=16 should be nearly identical
    per path (~0.2-0.5 s ivf_topk, ~1-2 s hnsw_sharded, which rebuilds
    shard graphs inside the cogroup by design) — the time is fixed job
    overhead, not per-query work. A future nq=1 reading that scales
    with nq would mean a serving path lost its broadcast/pruned shape.

    Returns (min latency, all rep walls, job count of the min rep) per
    path×nq — the same attributability fields the query rows carry
    (r11 advice: r11's 0.50->0.67 s ivf nq1 swing had no serving-side
    code change and no field to prove it was scheduler noise; stable
    jobs + moving wall = noise, by the round-10 protocol).
    """
    import numpy as np  # noqa: F401 — centroid model round-trips numpy

    from pyspark.sql import functions as F

    from vector_search_spark import tables
    from vector_search_spark.operators import hnsw_sharded as hs
    from vector_search_spark.operators import ivf, kmeans

    from vector_search_spark.operators import pq as _pq

    emb = tables.load(spark, sf_dir, "embeddings").localCheckpoint()
    C = kmeans.train_coarse(emb, k=16, seed=42)
    assigned = ivf.assign_clusters(emb, C).localCheckpoint()
    # compressed serving artifacts (r15: the matrix's third path) —
    # model train + encode are index-BUILD work, outside the timer
    pq_model, _ = _pq.train_pq(emb, m=8, k=16, seed=42, max_iter=10)
    codes = (
        _pq.encode(assigned, pq_model)
        .join(assigned.select("vec_id", "cluster_id"), "vec_id")
        .localCheckpoint()
    )
    out: dict[str, float] = {}
    rep_walls: dict[str, list[float]] = {}
    jobs: dict[str, int] = {}
    sc = spark.sparkContext
    for nq in (1, 16):
        queries = emb.filter(F.col("vec_id") < nq).localCheckpoint()
        paths = {
            "ivf_topk": lambda: ivf.ivf_topk(
                queries, assigned, C, k=10, nprobe=4
            ),
            "hnsw_sharded": lambda: hs.hnsw_sharded_topk(
                emb, C, queries, k=10, m=8, ef_construction=32, ef=48,
                nprobe=3,
            ),
            # r15: compressed serving with exact re-rank — the third
            # production path (IVFPQ + IndexRefine); prebuilt codes +
            # PQ model, same serving contract as the other two
            "ivf_adc_refined": lambda: ivf.ivf_adc_topk_refined(
                queries, codes, C, pq_model, points=assigned, k=10,
                shortlist=50, nprobe=4,
            ),
        }
        for pname, fn in paths.items():
            key = f"{pname}_nq{nq}"
            best = float("inf")
            for r in range(3):
                group = f"bench:serving:{key}:{r}"
                sc.setJobGroup(group, f"serving {key} rep {r}")
                t0 = time.perf_counter()
                _materialize(fn())
                dt = time.perf_counter() - t0
                rep_walls.setdefault(key, []).append(round(dt, 3))
                if dt < best:
                    best = dt
                    jobs[key] = len(
                        sc.statusTracker().getJobIdsForGroup(group)
                    )
            out[key] = round(best, 3)
    # clear the last rep's group label so jobs submitted after the
    # probe don't inherit it (r12 advice: a future getJobIdsForGroup
    # reading after reordering would be polluted) — see
    # _clear_job_group for why the JVM bridge (r13 advice).
    _clear_job_group(sc)
    return out, rep_walls, jobs


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from vector_search_spark.queries import get_catalog
    from vector_search_spark.session import get_spark

    spark = get_spark(app_name="vss-bench")
    catalog = get_catalog()

    # JVM/codegen/python-worker warm-up on the tiniest SF so per-query
    # timings measure the plan, not first-call compilation or daemon
    # startup: one gemm-path query (mapInPandas + window), one grouped
    # pandas pass + checkpoint (applyInPandas worker pool + local
    # checkpoint store), one shuffle agg.
    from pyspark.sql import functions as F

    _materialize(catalog["knn_exact"].fn(spark, "/root/testdata/sf0.001"))
    tiny = spark.range(64).withColumn("g", F.col("id") % 8)
    _materialize(
        tiny.groupBy("g")
        .applyInPandas(lambda p: p, "id long, g long")
        .localCheckpoint()
        .groupBy("g")
        .count()
    )

    names = [n for n in HEADLINE if n in catalog]
    names += [n for n in sorted(catalog) if n not in names]

    # BOOKEND CANARY pass0 (round 17): both r17 full runs were
    # contaminated in their OPENING minutes by external intermittent
    # load — the end-of-run canary (pass1 mid-loop, pass2 at end)
    # cannot see a contention window that has already passed by the
    # time the canary entries' alphabetical slots come up. Measure the
    # FAST canary entries once right after warmup so every run brackets
    # itself: pass0 (start) vs pass1 (mid, from the main loop) vs
    # pass2 (end). hnsw_knn is excluded here — its ~8 s build would
    # double-charge the run for a probe whose job is to be cheap.
    # READING pass0: its first rep doubles as these plans' codegen
    # warmup (min-of-2 reported), so pass0 runs a touch hot even on an
    # idle box — compare pass0 ACROSS runs, and treat a pass0/pass1
    # ratio far above the usual first-touch band as opening-window
    # contention, not noise.
    import gc

    sc0 = spark.sparkContext
    canary_pass0: dict[str, dict] = {}
    for name in CANARY_FAST:
        if name not in catalog:
            continue
        best0 = float("inf")
        jobs0 = 0
        for r in range(2):
            group = f"bench:canary0:{name}:{r}"
            sc0.setJobGroup(group, f"canary0 {name} rep {r}")
            t0 = time.perf_counter()
            try:
                _materialize(catalog[name].fn(spark, sf_dir))
            except Exception as e:  # pragma: no cover — probe must not kill
                print(f"bench: canary0 {name} FAILED: {e}", file=sys.stderr)
                best0 = float("nan")
                break
            dt = time.perf_counter() - t0
            if dt < best0:
                best0 = dt
                jobs0 = len(sc0.statusTracker().getJobIdsForGroup(group))
            # same per-rep hygiene as the main loop and pass2 — the
            # three passes must measure under ONE protocol or ratio10
            # carries a protocol-difference component (r17 review)
            spark.catalog.clearCache()
            gc.collect()
        canary_pass0[name] = {
            "pass0": round(best0, 3) if best0 == best0 else None,
            "jobs0": jobs0 or None,
        }
    _clear_job_group(sc0)

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    # VARIANCE PROTOCOL (round 9, judge ask #5 — r8-vs-r7 deltas were
    # unattributable below ~25%): every query runs min-of-REPS
    # (default 2; the first rep doubles as the warmup and the min
    # discards it), and any entry whose min still exceeds HEAVY_SEC
    # (default 1.0 s — was 2.0 through r8) gets ONE extra rep, i.e.
    # min-of-3 for everything over a second. Rationale: sub-second
    # entries are dominated by fixed job overhead that min-of-2
    # already bounds; the 1-6 s entries are where same-code runs
    # disagreed up to 1.8x (r5: 3.09 vs 1.74 s) and a third sample
    # cuts the min's spread roughly by half. Cross-round comparison
    # should still read per-query mins from BENCH_DETAIL.json, never
    # totals.
    heavy_sec = float(os.environ.get("SPARK_GRAFT_BENCH_HEAVY_SEC", "1.0"))
    # SPREAD ESCALATION (round 17 — r16 judge ask #2 protocol upgrade):
    # r16's run showed 10 entries >2x vs r15 at identical job counts,
    # and min-of-2 cannot suppress a contention window that covers both
    # back-to-back reps. When the within-entry rep spread (max/min)
    # exceeds this ratio, the entry earns one extra rep regardless of
    # its absolute time — a third sample either restores the true min
    # or confirms the entry is genuinely noisy in this run.
    spread_escalate = float(
        os.environ.get("SPARK_GRAFT_BENCH_SPREAD_ESCALATE", "1.5")
    )
    missing = [n for n in CHANGED_THIS_ROUND if n not in catalog]
    if missing:  # a stale changed-list silently guards nothing — fail loud
        raise RuntimeError(f"CHANGED_THIS_ROUND not in catalog: {missing}")
    timings: dict[str, float] = {}
    # ATTRIBUTABILITY (round-9 judge ask #4): per-query rep timings and
    # spread go to the detail file so a round-over-round drift on
    # untouched code is self-evidently noise (the within-run spread
    # bounds the scheduler variance); per-query Spark JOB counts (from
    # the min rep) pin whether a swing like hnsw_knn's 6.7-9.4 s band
    # is plan change (job count moves) or scheduler noise (it doesn't).
    rep_times: dict[str, list[float | None]] = {}
    # Unrounded rep walls, kept ONLY for the spread computation: spread
    # from the display-rounded values silently dropped sub-millisecond
    # reps (x > 0 after round(dt, 3)) — exactly the fast queries where
    # noise ratios are largest (r10 advice).
    raw_times: dict[str, list[float]] = {}
    job_counts: dict[str, int] = {}
    failed_reps: dict[str, int] = {}
    sc = spark.sparkContext
    total = 0.0
    for name in names:
        best = float("nan")
        n_failed = 0
        n_reps = reps
        r = 0
        while r < n_reps:
            r += 1
            group = f"bench:{name}:{r}"
            sc.setJobGroup(group, f"bench {name} rep {r}")
            t0 = time.perf_counter()
            try:
                _materialize(catalog[name].fn(spark, sf_dir))
                dt = time.perf_counter() - t0
            except Exception as e:  # a failing query must not kill the bench
                print(f"bench: {name} FAILED: {e}", file=sys.stderr)
                dt = float("nan")
                n_failed += 1
            njobs = len(sc.statusTracker().getJobIdsForGroup(group))
            rep_times.setdefault(name, []).append(
                round(dt, 3) if dt == dt else None
            )
            if dt == dt:
                raw_times.setdefault(name, []).append(dt)
            if dt == dt and not (best == best and best <= dt):
                best = dt
                job_counts[name] = njobs
            # Queries (and reps) are independent: drop caches/checkpoint
            # RDDs between runs (outside the timer) so earlier runs'
            # pinned blocks don't tax later ones' GC.
            spark.catalog.clearCache()
            gc.collect()
            if dt != dt:
                break  # a failed query stays failed; don't re-run it
            if r == n_reps == reps:
                finite = raw_times.get(name, [])
                # Escalate ONLY when a LATER rep is the slow one: rep 1
                # is the designated codegen warmup (see the variance
                # protocol above) and a rep1-is-max spread is that
                # warmup, already discarded by the min — a third rep
                # there changes nothing (r17 review measured 29/33
                # wasted escalations under the naive max/min rule). A
                # later rep >escalate x the min means the box DEGRADED
                # while this entry was measured, so one more sample
                # defends the min against the tail of that window. (A
                # window covering ALL reps is invisible to any
                # intra-entry spread — the bookend canary is the
                # instrument for that case.)
                noisy = (
                    len(finite) >= 2
                    and min(finite) > 0
                    and max(finite[1:]) / min(finite) > spread_escalate
                )
                if best > heavy_sec or noisy:
                    # one extra rep: heavy entries against variance
                    # (round 9), degrading-spread entries against a
                    # contention window arriving mid-entry (round 17)
                    n_reps += 1
        timings[name] = round(best, 3) if best == best else float("nan")
        if n_failed:
            # A query that failed ANY rep is flaky even when a surviving
            # rep produced a timing — flag it in the JSON, not just on
            # stderr, so round-over-round comparisons can exclude it.
            failed_reps[name] = n_failed
        if best == best:
            total += best
    # symmetric with _serving_latency (r13 advice): the loop's last
    # per-rep label must not leak onto the probes below
    _clear_job_group(sc)

    # DRIFT CANARY (r13 judge "What's wrong #2"): r13's ~14% uniform
    # total drift on untouched code had stable job counts — the
    # machine-noise signature — but no same-run re-measurement to pin
    # it. Re-run a fixed set of code-stable queries (static relational
    # plans untouched since r9, the exact entries the judge cited) a
    # SECOND time at the END of the run, same min-of-reps protocol:
    # pass2/pass1 on identical code within one process IS the
    # same-code variance, measured, not inferred. Recorded to
    # BENCH_DETAIL as drift_canary; cross-round comparisons should
    # divide observed ratios by this run's canary band before calling
    # anything a regression.
    # hnsw_knn added r15: the one outside-band mover in r14 (1.21x at
    # stable jobs, untouched code) — canary membership gives it
    # same-process same-code attribution instead of a watch flag.
    # r17: each entry also carries pass0/jobs0/ratio10 from the
    # BOOKEND probe above (membership: module-level CANARY/CANARY_FAST
    # — one source) — pass0 vs pass1 vs pass2 brackets WHERE in the
    # run a contention window sat (r17's runs opened contaminated and
    # ended clean; ratio10 < 1 is that signature).
    drift_canary: dict[str, dict] = {}
    for name in CANARY:
        # r15 advice fix: a name present in catalog but absent from
        # timings (e.g. filtered out by an env subset) previously fell
        # through the NaN self-inequality check (None != None is False)
        # and crashed on timings[name] at the END of the full run.
        if (
            name not in catalog
            or name not in timings
            or timings[name] != timings[name]
        ):
            continue
        best2 = float("inf")
        jobs2 = 0
        for r in range(reps):
            group = f"bench:canary:{name}:{r}"
            sc.setJobGroup(group, f"canary {name} rep {r}")
            t0 = time.perf_counter()
            try:
                _materialize(catalog[name].fn(spark, sf_dir))
            except Exception as e:  # pragma: no cover — same policy
                print(f"bench: canary {name} FAILED: {e}", file=sys.stderr)
                best2 = float("nan")
                break
            dt = time.perf_counter() - t0
            if dt < best2:
                best2 = dt
                jobs2 = len(sc.statusTracker().getJobIdsForGroup(group))
            spark.catalog.clearCache()
            gc.collect()
        p1 = timings[name]
        p0 = canary_pass0.get(name, {}).get("pass0")
        drift_canary[name] = {
            "pass0": p0,  # start-of-run (bookend, r17); None for hnsw_knn
            "pass1": p1,
            "pass2": round(best2, 3) if best2 == best2 else None,
            "ratio": round(best2 / p1, 3) if best2 == best2 and p1 else None,
            # pass1/pass0: >1 means the box DEGRADED after the start;
            # <1 means the run OPENED under load (the r17 signature)
            "ratio10": round(p1 / p0, 3) if p0 and p1 == p1 else None,
            "jobs0": canary_pass0.get(name, {}).get("jobs0"),
            "jobs1": job_counts.get(name),
            "jobs2": jobs2 or None,
        }
    _clear_job_group(sc)

    # Small-batch serving latency (separate from the throughput rows;
    # skippable via env for quick runs)
    latency: dict[str, float] = {}
    serving_reps: dict[str, list[float]] = {}
    serving_jobs: dict[str, int] = {}
    if os.environ.get("SPARK_GRAFT_BENCH_LATENCY", "1") != "0":
        try:
            latency, serving_reps, serving_jobs = _serving_latency(
                spark, sf_dir
            )
        except Exception as e:  # pragma: no cover — must not kill bench
            print(f"bench: latency probe FAILED: {e}", file=sys.stderr)

    headline = {
        "metric": "total_headline_wall",
        "value": round(total, 3),
        "unit": "sec",
        "sf": sf,
        "reps": reps,
        "agg": "min",
        "failed_reps": failed_reps,
        "serving_latency_sec": latency,
    }
    # Full detail goes to the file ONLY (round-7: the old extra stdout
    # copy of the full map was redundant capture risk — the whole
    # reason the compact-last-line contract exists). query_reps /
    # query_spread / query_jobs are the round-10 attributability
    # fields: all rep wall-times (None = failed rep), max/min spread
    # over finite reps, and the Spark job count of the min rep.
    # Spread over UNROUNDED walls (rounded values are display-only);
    # min(f) > 0 is the only guard — perf_counter deltas are never
    # negative and a literal 0.0 wall means the clock failed anyway.
    spread = {
        k: round(max(f) / min(f), 3)
        for k, f in raw_times.items()
        if len(f) >= 2 and min(f) > 0
    }
    detail = dict(
        headline,
        queries=timings,
        n_queries=len(timings),
        query_reps=rep_times,
        query_spread=spread,
        query_jobs=job_counts,
        serving_reps=serving_reps,
        serving_jobs=serving_jobs,
        drift_canary=drift_canary,
        changed_this_round=CHANGED_THIS_ROUND,
    )
    with open(os.path.join(REPO_ROOT, "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)
    # Compact headline LAST: the top-20 slowest entries PLUS every
    # changed-this-round entry (contract: a regression in changed code
    # can't hide below the cut), sized to stay parseable inside a
    # bounded stdout-tail capture no matter how large the catalog grows.
    top = headline_queries(timings, CHANGED_THIS_ROUND)
    # RuntimeError, not assert: the stale-name startup check above and
    # this are two halves of one contract, and assert is stripped under
    # python -O (r10 advice).
    lost = [
        n
        for n in CHANGED_THIS_ROUND
        if timings.get(n) == timings.get(n) and n not in top
    ]
    if lost:
        raise RuntimeError(f"headline lost changed-this-round entries: {lost}")
    headline["queries"] = top
    headline["queries_omitted"] = len(timings) - len(top)
    headline["detail_file"] = "BENCH_DETAIL.json"
    sys.stdout.flush()
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
