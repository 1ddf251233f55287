"""BM25 + RRF hybrid retrieval (operators/ranking.py).

Value-level checks against hand-computed BM25 math plus fusion
invariants; the full-pipeline DuckDB oracles are exercised by
tests/test_oracle_gate.py via the text_bm25_search / hybrid_rrf_search
catalog entries.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vector_search_spark.operators import ranking

DOCS = [
    (0, "apple banana apple"),
    (1, "apple cherry"),
    (2, "durian durian durian"),
    (3, "banana cherry apple apple"),
]


def _bm25_ref(tf, df, dl, n_docs, avgdl, k1=1.2, b=0.75):
    idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    return idf * ((tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (dl / avgdl))))


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_bm25_hand_computed_scores(spark, docs):
    qt = spark.createDataFrame([(0, "apple")], "query_id long, term string")
    out = ranking.bm25_topk(docs, qt, k=10).collect()
    # d2 has no 'apple' -> absent
    assert {r.doc_id for r in out} == {0, 1, 3}
    n, avgdl = 4, (3 + 2 + 3 + 4) / 4.0
    expected = {
        0: _bm25_ref(tf=2, df=3, dl=3, n_docs=n, avgdl=avgdl),
        1: _bm25_ref(tf=1, df=3, dl=2, n_docs=n, avgdl=avgdl),
        3: _bm25_ref(tf=2, df=3, dl=4, n_docs=n, avgdl=avgdl),
    }
    got = {r.doc_id: r.score for r in out}
    for d, s in expected.items():
        assert got[d] == pytest.approx(s, abs=1e-12), d
    # ranks follow score desc with doc_id tie-break
    ranks = {r.doc_id: r.rank for r in out}
    order = sorted(expected, key=lambda d: (-expected[d], d))
    assert [d for d, _ in sorted(ranks.items(), key=lambda x: x[1])] == order


def test_bm25_multi_term_fold_and_rare_term_wins(spark, docs):
    # 'durian' appears in 1 doc (rare -> high idf); 'apple' in 3.
    qt = spark.createDataFrame(
        [(7, "apple"), (7, "durian")], "query_id long, term string"
    )
    out = {r.doc_id: r for r in ranking.bm25_topk(docs, qt, k=10).collect()}
    assert set(out) == {0, 1, 2, 3}
    # the durian-only doc must outrank every apple doc
    assert out[2].rank == 1
    n, avgdl = 4, 3.0
    exp2 = _bm25_ref(tf=3, df=1, dl=3, n_docs=n, avgdl=avgdl)
    assert out[2].score == pytest.approx(exp2, abs=1e-12)


def test_bm25_query_tf_ignored_and_k_cap(spark, docs):
    # duplicate query terms collapse (distinct); k caps the output
    qt = spark.createDataFrame(
        [(1, "apple"), (1, "apple")], "query_id long, term string"
    )
    out = ranking.bm25_topk(docs, qt, k=2).collect()
    assert len(out) == 2
    assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == [1, 2]


def test_rrf_fuse_exact_scores(spark):
    a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2)], "query_id long, doc_id long, rank int"
    )
    b = spark.createDataFrame(
        [(0, 11, 1), (0, 12, 2)], "query_id long, doc_id long, rank int"
    )
    out = {r.doc_id: r for r in ranking.rrf_fuse(a, b, k=10).collect()}
    assert out[11].rrf_score == pytest.approx(1 / 61 + 1 / 62, abs=0)
    assert out[10].rrf_score == pytest.approx(1 / 61, abs=0)
    assert out[12].rrf_score == pytest.approx(1 / 62, abs=0)
    # both-lists item wins; tie between single-list items broken by rank
    assert out[11].rank == 1 and out[10].rank == 2 and out[12].rank == 3


def test_rrf_fuse_per_query_isolation(spark):
    a = spark.createDataFrame(
        [(0, 1, 1), (5, 2, 1)], "query_id long, doc_id long, rank int"
    )
    b = spark.createDataFrame([], "query_id long, doc_id long, rank int")
    out = ranking.rrf_fuse(a, b, k=10)
    rows = out.collect()
    assert {(r.query_id, r.doc_id, r.rank) for r in rows} == {
        (0, 1, 1),
        (5, 2, 1),
    }


def test_bm25_plan_broadcasts_query_terms(spark, docs):
    qt = spark.createDataFrame([(0, "apple")], "query_id long, term string")
    plan = ranking.bm25_topk(docs, qt, k=10)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # postings probe never shuffles tf


# --- MMR diverse re-ranking (operators/ranking.py) ------------------------


def _mmr_fixture(spark):
    # query along +x; items: two near-identical high-rel vectors and one
    # orthogonal lower-rel vector
    rows = [
        (1, [1.0, 0.0]),       # rel 1.0
        (2, [0.9999, 0.01]),   # near-dup of 1 (cos ~0.99995)
        (3, [0.0, 1.0]),       # orthogonal
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cand = spark.createDataFrame(
        [(0, 1, 1.0), (0, 2, 0.99), (0, 3, 0.0)],
        "query_id long, vec_id long, rel double",
    )
    return cand, vecs


def test_mmr_prefers_diverse_over_near_duplicate(spark):
    from vector_search_spark.operators import ranking

    cand, vecs = _mmr_fixture(spark)
    out = (
        ranking.mmr_rerank(cand, vecs, k=2, lam=0.5)
        .orderBy("pick")
        .collect()
    )
    assert [r.vec_id for r in out] == [1, 3]
    # pick 2: item2 = .5*.99-.5*.99995 < 0; item3 = 0-.5*0 = 0 -> item3


def test_mmr_lam_one_is_pure_relevance(spark):
    from vector_search_spark.operators import ranking

    cand, vecs = _mmr_fixture(spark)
    out = (
        ranking.mmr_rerank(cand, vecs, k=3, lam=1.0)
        .orderBy("pick")
        .collect()
    )
    assert [r.vec_id for r in out] == [1, 2, 3]  # rel order untouched


def test_mmr_negative_max_sim_raises_score(spark):
    """Anti-correlated picked set must INCREASE a candidate's score
    (no zero floor on the diversity term)."""
    from vector_search_spark.operators import ranking

    rows = [(1, [1.0, 0.0]), (2, [-1.0, 0.0])]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cand = spark.createDataFrame(
        [(0, 1, 0.9), (0, 2, 0.1)],
        "query_id long, vec_id long, rel double",
    )
    [p1, p2] = (
        ranking.mmr_rerank(cand, vecs, k=2, lam=0.5)
        .orderBy("pick")
        .collect()
    )
    assert (p1.vec_id, p2.vec_id) == (1, 2)
    # mmr2 = .5*.1 - .5*(-1) = 0.55 > lam*rel = 0.05
    assert abs(p2.mmr - 0.55) < 1e-9


# ---------------------------------------------------------------------------
# MaxSim late-interaction re-ranking
# ---------------------------------------------------------------------------


def _maxsim_fixture(spark):
    """Tiny corpus + shortlist + token vecs for maxsim tests."""
    from vector_search_spark.functions import texts as T
    from vector_search_spark.operators import textstats

    corpus = [
        (0, "red apple pie with red apples"),
        (1, "green apple tart"),
        (2, "blue whale ocean deep water"),
        (3, "red apple pie with red apples extra crust"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    d_tok = docs.select(
        "doc_id", F.explode(T.tokens("text")).alias("token")
    ).distinct()
    q_tok = (
        docs.filter(F.col("doc_id") == 0)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(T.tokens("text")).alias("token"),
        )
        .distinct()
    )
    tvecs = textstats.token_trigram_embed(
        d_tok.select("token").distinct(), dim=8
    )
    return docs, q_tok, d_tok, tvecs


def test_maxsim_scores_only_shortlist_pairs(spark):
    """The re-rank is BLOCKED on the candidate shortlist: a doc absent
    from `pairs` must never appear, however similar (doc 3 is a
    near-dup of the query but is excluded from the shortlist)."""
    docs, q_tok, d_tok, tvecs = _maxsim_fixture(spark)
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2)], "query_id long, doc_id long"
    )
    out = ranking.maxsim_rerank(pairs, q_tok, d_tok, tvecs, k=10).collect()
    assert {r.doc_id for r in out} == {1, 2}


def test_maxsim_tokenless_shortlist_pair_scores_zero(spark):
    """Shortlist-coverage contract (r11 advice): a shortlisted doc with
    NO embeddable token rows (doc 9 never appears in d_tokens) must
    surface with score 0.0 and a rank — not silently vanish from the
    re-ranked output."""
    docs, q_tok, d_tok, tvecs = _maxsim_fixture(spark)
    pairs = spark.createDataFrame(
        [(0, 1), (0, 9)], "query_id long, doc_id long"
    )
    out = {
        r.doc_id: r
        for r in ranking.maxsim_rerank(
            pairs, q_tok, d_tok, tvecs, k=10
        ).collect()
    }
    assert set(out) == {1, 9}
    assert out[9].score == 0.0
    assert out[1].score > 0.0 and out[1].rank == 1 and out[9].rank == 2


def test_maxsim_self_and_duplicate_score_full_marks(spark):
    """Every NONZERO-norm query token finds itself (cos=1) in the
    query's own doc and in a superset near-duplicate, so both score
    exactly the count of such tokens (zero-norm tokens — trigram votes
    fully cancelled — contribute 0 everywhere by the cosine guard);
    rank ties break to the lower doc_id. The whale doc shares no
    tokens and must rank below both."""
    docs, q_tok, d_tok, tvecs = _maxsim_fixture(spark)
    pairs = spark.createDataFrame(
        [(0, 0), (0, 2), (0, 3)], "query_id long, doc_id long"
    )
    out = {
        r.doc_id: r
        for r in ranking.maxsim_rerank(
            pairs, q_tok, d_tok, tvecs, k=10
        ).collect()
    }
    n_eff = (
        q_tok.join(tvecs, "token").filter(F.col("tnorm") > 0).count()
    )  # query tokens that can score at all
    assert out[0].score == pytest.approx(n_eff, abs=1e-9)
    assert out[3].score == pytest.approx(n_eff, abs=1e-9)  # superset doc
    assert out[0].rank == 1 and out[3].rank == 2  # tie -> lower doc_id
    assert out[2].score < n_eff and out[2].rank == 3


def test_maxsim_matches_numpy_reference(spark):
    """Operator score == brute-force numpy MaxSim over the same token
    embeddings (Σ_t max_u cos), for every (query, candidate) pair."""
    import numpy as np

    docs, q_tok, d_tok, tvecs = _maxsim_fixture(spark)
    pairs = spark.createDataFrame(
        [(0, d) for d in range(4)], "query_id long, doc_id long"
    )
    tv = {r.token: np.array(r.tvec) for r in tvecs.collect()}
    qts = sorted(r.token for r in q_tok.collect())
    dts = {}
    for r in d_tok.collect():
        dts.setdefault(r.doc_id, []).append(r.token)

    def cos(a, b):
        na, nb = np.sqrt(a @ a), np.sqrt(b @ b)
        return 0.0 if na * nb == 0 else (a @ b) / (na * nb)

    expected = {
        d: sum(max(cos(tv[t], tv[u]) for u in dts[d]) for t in qts)
        for d in range(4)
    }
    out = ranking.maxsim_rerank(pairs, q_tok, d_tok, tvecs, k=10).collect()
    assert len(out) == 4
    for r in out:
        assert r.score == pytest.approx(expected[r.doc_id], abs=1e-9), r


def test_maxsim_plan_has_no_cartesian(spark):
    """Blocked-path plan gate: the token-pair work is assembled by
    equi-joins against the shortlist — no CartesianProduct /
    BroadcastNestedLoopJoin anywhere in the re-rank plan."""
    from vector_search_spark import plans

    docs, q_tok, d_tok, tvecs = _maxsim_fixture(spark)
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2)], "query_id long, doc_id long"
    )
    out = ranking.maxsim_rerank(pairs, q_tok, d_tok, tvecs, k=10)
    plan = plans.formatted_plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_maxsim_zero_norm_token_scores_zero(spark):
    """A token whose trigram votes fully cancel has norm 0; the cosine
    guard must score it 0 against everything instead of NaN-poisoning
    the fold (synthesized by zeroing a vector directly)."""
    q_tok = spark.createDataFrame(
        [(0, "aa"), (0, "bb")], "query_id long, token string"
    )
    d_tok = spark.createDataFrame(
        [(5, "aa"), (5, "bb")], "doc_id long, token string"
    )
    tvecs = spark.createDataFrame(
        [("aa", [1.0, 2.0], float(5 ** 0.5)), ("bb", [0.0, 0.0], 0.0)],
        "token string, tvec array<double>, tnorm double",
    )
    pairs = spark.createDataFrame([(0, 5)], "query_id long, doc_id long")
    [r] = ranking.maxsim_rerank(pairs, q_tok, d_tok, tvecs, k=10).collect()
    # 'aa' matches itself (cos 1); 'bb' is zero-norm -> contributes 0
    assert r.score == pytest.approx(1.0, abs=1e-12)


def test_maxsim_over_ivf_candidates(spark):
    """The at-scale wiring the operator is designed for: first-stage
    candidates from IVF partition-pruned search over POOLED vectors,
    MaxSim late-interaction re-rank on top. The re-ranked set must be
    exactly a (top-k) subset of the IVF candidate pairs, proving the
    generator-agnostic contract end to end."""
    import numpy as np

    from vector_search_spark.operators import ivf, textstats

    docs, q_tok, d_tok, tvecs = _maxsim_fixture(spark)
    pooled = textstats.hashing_embed(docs, dim=8).localCheckpoint()
    # two coarse cells from the pooled vectors of docs 0 and 2
    cents = np.vstack(
        [
            r.vec
            for r in pooled.filter(F.col("doc_id").isin(0, 2))
            .orderBy("doc_id")
            .collect()
        ]
    ).astype(np.float64)
    assigned = ivf.assign_clusters(
        pooled, cents, id_col="doc_id", vec_col="vec"
    )
    qs = pooled.filter(F.col("doc_id") == 0)
    cand = ivf.ivf_topk(
        qs, assigned, cents, k=3, nprobe=1,
        query_id_col="doc_id", query_vec_col="vec",
        base_id_col="doc_id", base_vec_col="vec",
    )
    pairs = cand.select("query_id", F.col("vec_id").alias("doc_id"))
    allowed = {(r.query_id, r.doc_id) for r in pairs.collect()}
    out = ranking.maxsim_rerank(pairs, q_tok, d_tok, tvecs, k=2).collect()
    assert 0 < len(out) <= 2
    assert {(r.query_id, r.doc_id) for r in out} <= allowed
    assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == list(
        range(1, len(out) + 1)
    )


# ---------------------------------------------------------------------------
# rank_eval (nDCG@k / MRR / P@k)
# ---------------------------------------------------------------------------


def test_rank_eval_hand_computed_graded(spark):
    """Graded-relevance case (the catalog entry is binary, so the
    general IDCG path is pinned here): DCG/IDCG/MRR/P@k against the
    textbook formulas."""
    run = spark.createDataFrame(
        [(0, 2, 1), (0, 1, 2), (0, 9, 3)],
        "query_id long, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [(0, 1, 3.0), (0, 2, 1.0), (0, 3, 2.0)],
        "query_id long, doc_id long, rel double",
    )
    [r] = ranking.rank_eval(run, qrels, k=3).collect()
    dcg = 1.0 / math.log2(2) + 3.0 / math.log2(3)
    idcg = 3.0 / math.log2(2) + 2.0 / math.log2(3) + 1.0 / math.log2(4)
    assert r.n_rel_ret == 2
    assert r.p_at_k == pytest.approx(2 / 3, abs=1e-12)
    assert r.rr == pytest.approx(1.0, abs=0)
    assert r.ndcg == pytest.approx(dcg / idcg, abs=1e-12)


def test_rank_eval_no_relevant_and_missed_relevant(spark):
    """A query with no positive judgments scores 0 everywhere (never
    NULL/NaN); one whose relevant docs were all MISSED scores 0 on
    ndcg/rr/p but still appears."""
    run = spark.createDataFrame(
        [(0, 5, 1), (1, 5, 1)], "query_id long, doc_id long, rank int"
    )
    qrels = spark.createDataFrame(
        [(1, 7, 1.0)], "query_id long, doc_id long, rel double"
    )
    out = {r.query_id: r for r in ranking.rank_eval(run, qrels, k=5).collect()}
    for q in (0, 1):
        r = out[q]
        assert (r.n_rel_ret, r.p_at_k, r.rr, r.ndcg) == (0, 0.0, 0.0, 0.0), r


def test_rank_eval_perfect_ranking_is_one(spark):
    """Retrieving the ideal ordering scores ndcg exactly 1.0 — the
    DCG and IDCG folds must run in the same order to cancel."""
    run = spark.createDataFrame(
        [(0, 1, 1), (0, 2, 2), (0, 3, 3)],
        "query_id long, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [(0, 1, 5.0), (0, 2, 3.0), (0, 3, 1.0)],
        "query_id long, doc_id long, rel double",
    )
    [r] = ranking.rank_eval(run, qrels, k=3).collect()
    assert r.ndcg == pytest.approx(1.0, abs=0)
    assert r.rr == 1.0 and r.n_rel_ret == 3


def test_rank_eval_k_truncates_both_folds(spark):
    """Ranks beyond k are ignored in DCG, and IDCG stops at k ideal
    slots even when more positives exist."""
    run = spark.createDataFrame(
        [(0, 1, 1), (0, 8, 2), (0, 2, 3)],
        "query_id long, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [(0, d, 1.0) for d in (1, 2, 3, 4)],
        "query_id long, doc_id long, rel double",
    )
    [r] = ranking.rank_eval(run, qrels, k=2).collect()
    # only rank<=2 counts: d1 hit, d8 miss; ideal = 2 slots
    dcg = 1.0 / math.log2(2)
    idcg = 1.0 / math.log2(2) + 1.0 / math.log2(3)
    assert r.n_rel_ret == 1 and r.p_at_k == pytest.approx(0.5, abs=0)
    assert r.ndcg == pytest.approx(dcg / idcg, abs=1e-12)


def test_maxsim_duplicate_shortlist_pairs_collapse(spark):
    """A shortlist union can carry duplicate (query, doc) pairs; the
    re-ranker must be idempotent in them — one output row with the
    UNduplicated score, not a doubled score or two ranked rows
    (r12 review fix: pairs are distinct()-ed up front)."""
    docs, q_tok, d_tok, tvecs = _maxsim_fixture(spark)
    once = spark.createDataFrame(
        [(0, 1), (0, 2)], "query_id long, doc_id long"
    )
    doubled = once.unionAll(once)
    a = {
        (r.query_id, r.doc_id): (r.score, r.rank)
        for r in ranking.maxsim_rerank(
            once, q_tok, d_tok, tvecs, k=10
        ).collect()
    }
    b = {
        (r.query_id, r.doc_id): (r.score, r.rank)
        for r in ranking.maxsim_rerank(
            doubled, q_tok, d_tok, tvecs, k=10
        ).collect()
    }
    assert a == b and len(b) == 2
