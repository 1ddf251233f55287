"""Invariant tests for the dedup / text-analysis operators.

The oracle gate (test_oracle_gate.py) checks value parity with DuckDB;
these tests check the *semantics* the oracle can't see: LSH recall
against exact ground truth, robustness of fingerprints to edits, metric
bounds.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from vector_search_spark import tables
from vector_search_spark.operators import dedup, textstats


@pytest.fixture(scope="module")
def docs(spark):
    return tables.load(spark, SF_ORACLE, "documents").cache()


def test_exact_dedup_covers_all_docs(spark, docs):
    out = dedup.exact_dedup(docs)
    assert out.count() == docs.count()
    # canonical is a member of the group and <= every member
    assert out.filter(F.col("canonical_id") > F.col("doc_id")).count() == 0


def test_minhash_lsh_recall_vs_exact(spark, docs):
    """At Jaccard >= 0.9 the (P=12, r=3, b=4) band curve gives match
    probability ~1-(1-0.9^3)^4 ~ 0.995 — demand >= 90% recall on the
    planted near-dup pairs, and zero false positives (verified pairs)."""
    exact = {
        (r.a, r.b)
        for r in dedup.ngram_jaccard_pairs(docs, 3, 0.9).collect()
    }
    assert exact, "fixture should contain planted near-dups"
    lsh = {
        (r.a, r.b)
        for r in dedup.minhash_lsh_pairs(
            docs, shingle_n=3, num_perms=12, rows_per_band=3, threshold=0.9
        ).collect()
    }
    assert lsh <= exact, "verified LSH pairs must be a subset of exact"
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall:.2f} < 0.9"


def test_minhash_similarity_estimates_jaccard(spark, docs):
    """Fraction of agreeing minhash components is an unbiased Jaccard
    estimator; with P=48 perms the planted ~0.95+ pairs must estimate
    high (>0.6) and a random low pair must estimate low."""
    sh = dedup.shingle_table(docs, 3)
    sigs = dedup.minhash_signatures(sh, 48)
    exact = dedup.ngram_jaccard_pairs(docs, 3, 0.9)
    a = sigs.select(F.col("doc_id").alias("a"), "perm", F.col("minh").alias("ma"))
    b = sigs.select(F.col("doc_id").alias("b"), "perm", F.col("minh").alias("mb"))
    est = (
        exact.join(a, "a")
        .join(b, ["b", "perm"])
        .groupBy("a", "b")
        .agg(F.avg((F.col("ma") == F.col("mb")).cast("double")).alias("est"))
    )
    bad = est.filter(F.col("est") < 0.6).count()
    assert bad == 0, "high-Jaccard pairs must have high minhash agreement"


def test_simhash_close_for_near_dups(spark, docs):
    """Planted near-dup pairs should have small SimHash Hamming distance
    (on average far below the ~16 expected for random 32-bit pairs)."""
    sh = dedup.simhash_table(docs)
    exact = dedup.ngram_jaccard_pairs(docs, 3, 0.9)
    a = sh.select(F.col("doc_id").alias("a"), F.col("simhash").alias("ha"))
    b = sh.select(F.col("doc_id").alias("b"), F.col("simhash").alias("hb"))
    ham = (
        exact.join(a, "a")
        .join(b, "b")
        .select(
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("d")
        )
    )
    avg = ham.agg(F.avg("d")).first()[0]
    assert avg < 8, f"near-dup avg hamming {avg} not < 8"


def test_embedding_near_dup_pairs_are_symmetric_canonical(spark):
    emb = tables.load(spark, SF_ORACLE, "embeddings")
    out = dedup.embedding_near_dup(emb, threshold=0.4)
    assert out.filter(F.col("a") >= F.col("b")).count() == 0
    assert out.filter((F.col("cos_sim") < 0.4) | (F.col("cos_sim") > 1.0 + 1e-9)).count() == 0


def test_quality_score_bounds(spark, docs):
    q = textstats.quality_score(docs)
    assert q.filter((F.col("quality") < 0) | (F.col("quality") > 1)).count() == 0
    assert (
        q.filter(
            (F.col("uniq_ratio") <= 0)
            | (F.col("uniq_ratio") > 1)
            | (F.col("stopword_ratio") < 0)
            | (F.col("stopword_ratio") > 1)
        ).count()
        == 0
    )


def test_token_counts_consistent(spark, docs):
    tc = textstats.token_counts(docs)
    # whitespace tokens of space-separated text == bpe alpha runs here
    # (fixture text is pure lowercase words); chars >= tokens
    assert tc.filter(F.col("chars") < F.col("ws_tokens")).count() == 0
    assert tc.filter(F.col("ws_tokens") <= 0).count() == 0


def test_winnow_fingerprint_overlap_for_near_dups(spark, docs):
    """Near-dup docs must share fingerprints (that is the point of
    winnowing); a random non-dup pair shares few."""
    fps = textstats.winnow_fingerprints(docs, 3, 4)
    exact = dedup.ngram_jaccard_pairs(docs, 3, 0.9)
    fa = fps.select(F.col("doc_id").alias("a"), "fingerprint")
    fb = fps.select(F.col("doc_id").alias("b"), "fingerprint")
    shared = (
        exact.join(fa, "a").join(fb, ["b", "fingerprint"]).groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    assert shared.count() == exact.count(), "every near-dup pair shares >= 1 fingerprint"


def test_ngram_jaccard_df_cap_drops_hot_shingles(spark):
    """A boilerplate shingle shared by every doc must not force all-pairs:
    with the cap below N the hot shingle is dropped, leaving only the
    genuinely-similar pair; without a cap every doc pairs with every
    other via the boilerplate."""
    boiler = "terms of service apply"
    rows = [(i, f"{boiler} unique{i} filler{i} body{i}") for i in range(10)]
    # plant one real near-dup pair (docs 100/101 share all content)
    rows += [
        (100, f"{boiler} shared content here exactly alike"),
        (101, f"{boiler} shared content here exactly alike"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = dedup.ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.01)
    capped = dedup.ngram_jaccard_pairs(
        docs, shingle_n=3, threshold=0.01, max_shingle_df=5
    )
    n_un, n_cap = uncapped.count(), capped.count()
    assert n_un >= 12 * 11 / 2 * 0.5, "boilerplate should pair most docs"
    assert n_cap < n_un
    capped_pairs = {(r.a, r.b) for r in capped.collect()}
    assert (100, 101) in capped_pairs, "real near-dup must survive the cap"
    # inert cap (above every df) reproduces the exact ground truth
    inert = dedup.ngram_jaccard_pairs(
        docs, shingle_n=3, threshold=0.01, max_shingle_df=1000
    )
    assert {(r.a, r.b, round(r.jaccard, 9)) for r in inert.collect()} == {
        (r.a, r.b, round(r.jaccard, 9)) for r in uncapped.collect()
    }


def test_keep_canonical_corpus(spark, docs):
    """End-to-end dedup: cluster near-dups, keep one doc per cluster.
    Survivor count = total - (clustered - n_clusters); every cluster
    keeps exactly its canonical member; untouched docs all survive."""
    pairs = dedup.minhash_lsh_pairs(
        docs, shingle_n=3, num_perms=12, rows_per_band=3, threshold=0.9
    )
    groups = dedup.connected_components(pairs).localCheckpoint()
    kept = dedup.keep_canonical(docs, groups)
    n_docs, n_kept = docs.count(), kept.count()
    n_clustered = groups.count()
    n_clusters = groups.select("canonical_id").distinct().count()
    assert n_kept == n_docs - (n_clustered - n_clusters)
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    for r in groups.collect():
        assert (r.node in kept_ids) == (r.node == r.canonical_id)


def test_embedding_near_dup_blocked_vs_exact(spark):
    """The IVF-blocked near-dup pass must (a) be a subset of the exact
    all-pairs answer and (b) recover most of it at nprobe=2 — the same
    recall contract as any IVF-pruned search."""
    from vector_search_spark import tables
    from vector_search_spark.operators import kmeans

    emb = tables.load(spark, SF_ORACLE, "embeddings")
    exact = {
        (r.a, r.b): r.cos_sim
        for r in dedup.embedding_near_dup(emb, threshold=0.4).collect()
    }
    assert exact, "fixture should contain near-dup embeddings"
    C = kmeans.train_coarse(emb, k=16, seed=42)
    blocked = {
        (r.a, r.b): r.cos_sim
        for r in dedup.embedding_near_dup(
            emb, threshold=0.4, centroids=C, nprobe=3
        ).collect()
    }
    assert set(blocked) <= set(exact)
    recall = len(blocked) / len(exact)
    assert recall >= 0.7, f"blocked recall {recall:.2f} too low"
    for k_, v in blocked.items():
        assert abs(v - exact[k_]) < 1e-9


def test_winnow_short_docs_emit_one_fingerprint(spark):
    """Documents with 0 < n_shingles < window must emit min(h) (the
    winnowing guarantee: every document with >=1 shingle is visible to
    the sketch), not vanish."""
    short = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),          # 1 shingle (n=3 tokens)
            (2, "alpha beta gamma delta"),    # 2 shingles < window=4
            (3, "a b c d e f g h i j"),       # 8 shingles >= window
        ],
        "doc_id long, text string",
    )
    fps = textstats.winnow_fingerprints(short, shingle_n=3, window=4)
    per_doc = {
        r.doc_id: r.n
        for r in fps.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_doc.get(1, 0) == 1
    assert per_doc.get(2, 0) == 1
    assert per_doc.get(3, 0) >= 1


def test_hashing_embed_shape_and_semantics(spark):
    """Fixed dim, deterministic values, identical texts -> identical
    vectors, and the vote sum of a repeated token is count x (+-1)."""
    df = spark.createDataFrame(
        [
            (1, "alpha alpha alpha"),
            (2, "alpha alpha alpha"),
            (3, "totally different words here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.vec for r in textstats.hashing_embed(df, dim=16).collect()}
    assert all(len(v) == 16 for v in out.values())
    assert out[1] == out[2]
    assert out[1] != out[3]
    # doc 1: single token x3 -> exactly one bucket holds +-3, rest 0
    nz = [v for v in out[1] if v != 0.0]
    assert nz == [3.0] or nz == [-3.0]


def test_language_id_deterministic_schema(spark, docs):
    out = textstats.language_id(docs)
    assert out.count() == docs.count()
    langs = {r.pred_lang for r in out.select("pred_lang").distinct().collect()}
    assert langs <= set(textstats.STOPWORDS)


def test_repetition_stats_known_values(spark):
    """Hand-checked Gopher-style metrics: 'a a b' has 5 chars, 3 tokens
    (2 duplicates), 2-grams {'a a', 'a b'} each once -> top is 'a a'
    (tie -> lexicographic min)."""
    from vector_search_spark.operators import textstats

    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "x y"), (2, "")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in textstats.repetition_stats(docs, ngram=2).collect()}
    r0 = out[0]
    assert r0.n_tokens == 3
    assert abs(r0.dup_token_frac - 2 / 3) < 1e-12
    assert r0.top_ngram == "a a"
    assert abs(r0.top_ngram_frac - 0.5) < 1e-12
    assert abs(r0.top_ngram_char_frac - 3 / 5) < 1e-12
    r1 = out[1]  # no repeated tokens, single 2-gram covers all
    assert r1.dup_token_frac == 0.0 and r1.top_ngram == "x y"
    assert r1.top_ngram_frac == 1.0
    r2 = out[2]  # empty doc still gets a row with zeroed metrics
    assert (r2.n_tokens, r2.top_ngram, r2.top_ngram_frac) == (0, "", 0.0)


def test_chunk_tokens_order_and_sizes(spark):
    """Chunks partition the token sequence in order; last chunk ragged;
    empty docs emit nothing."""
    from vector_search_spark.operators import textstats

    docs = spark.createDataFrame(
        [(0, "t0 t1 t2 t3 t4"), (1, "")], "doc_id long, text string"
    )
    rows = sorted(
        textstats.chunk_tokens(docs, chunk_size=2).collect(),
        key=lambda r: (r.doc_id, r.chunk_id),
    )
    assert [(r.doc_id, r.chunk_id, r.n_tokens, r.chunk_text) for r in rows] == [
        (0, 0, 2, "t0 t1"),
        (0, 1, 2, "t2 t3"),
        (0, 2, 1, "t4"),
    ]
    # reassembly invariant on real data: concatenating a doc's chunks
    # in chunk_id order reproduces its full token stream
    from tests.conftest import SF_ORACLE
    from vector_search_spark import tables
    from vector_search_spark.functions import texts as T

    real = tables.load(spark, SF_ORACLE, "documents")
    rebuilt = (
        textstats.chunk_tokens(real, chunk_size=16)
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_id", "chunk_text"))
                    ),
                    lambda s: s["chunk_text"],
                ),
                " ",
            ).alias("joined")
        )
    )
    orig = real.select(
        "doc_id", F.array_join(T.tokens("text"), " ").alias("joined")
    ).filter(F.length("joined") > 0)
    assert rebuilt.exceptAll(orig).count() == 0
    assert orig.exceptAll(rebuilt).count() == 0


def test_stratified_sample_properties(spark):
    """Rate-1.0 strata keep everything; rate-0 strata keep nothing;
    raising a rate NESTS the previous sample (draw depends on id only);
    the survivor set is partition-invariant (hash, not RNG)."""
    from tests.conftest import SF_ORACLE
    from vector_search_spark import tables
    from vector_search_spark.operators import sampling

    docs = tables.load(spark, SF_ORACLE, "documents")
    full = sampling.stratified_sample_hash(docs, {"en": 1.0}, "lang")
    n_en = docs.filter(F.col("lang") == "en").count()
    assert full.filter(F.col("lang") == "en").count() == n_en
    assert full.filter(F.col("lang") != "en").count() == 0

    lo = sampling.stratified_sample_hash(docs, {"en": 0.2}, "lang")
    hi = sampling.stratified_sample_hash(docs, {"en": 0.6}, "lang")
    lo_ids = {r.doc_id for r in lo.select("doc_id").collect()}
    hi_ids = {r.doc_id for r in hi.select("doc_id").collect()}
    assert lo_ids <= hi_ids, "samples must nest as the rate grows"
    assert 0 < len(lo_ids) < len(hi_ids) < n_en

    re_ids = {
        r.doc_id
        for r in sampling.stratified_sample_hash(
            docs.repartition(7, "lang"), {"en": 0.2}, "lang"
        ).select("doc_id").collect()
    }
    assert re_ids == lo_ids, "survivors must not depend on partitioning"


def test_connected_components_known_graph(spark):
    """Two components + a chain: labels converge to component min-id."""
    from vector_search_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12)], "a long, b long"
    )
    out = {
        r.node: (r.canonical_id, r.group_size)
        for r in dedup.connected_components(pairs).collect()
    }
    assert out == {
        1: (1, 4), 2: (1, 4), 3: (1, 4), 4: (1, 4),
        10: (10, 3), 11: (10, 3), 12: (10, 3),
    }


def test_connected_components_deep_chain(spark):
    """A 64-node path with the min id at the FAR end (labels must
    travel the whole diameter) plus a cycle: exercises multiple fused
    blocks + pointer doubling, not just the shallow near-dup shape."""
    from vector_search_spark.operators import dedup

    # path 64 <- 63 <- ... <- 1, min id 1 sits at one end
    chain = [(i, i + 1) for i in range(1, 64)]
    cycle = [(100, 101), (101, 102), (102, 103), (103, 100)]
    pairs = spark.createDataFrame(chain + cycle, "a long, b long")
    out = {
        r.node: (r.canonical_id, r.group_size)
        for r in dedup.connected_components(pairs).collect()
    }
    assert all(out[n] == (1, 64) for n in range(1, 65))
    assert all(out[n] == (100, 4) for n in (100, 101, 102, 103))


def test_approx_distinct_tolerance(spark):
    """HLL++ distinct users within 5% of exact, per event type."""
    from pyspark.sql import functions as F

    from vector_search_spark import tables
    from tests.conftest import SF_ORACLE

    ev = tables.load(spark, SF_ORACLE, "events")
    approx = {
        r.event_type: r.a
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("a"))
        .collect()
    }
    exact = {
        r.event_type: r.e
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("e"))
        .collect()
    }
    for et, e in exact.items():
        assert abs(approx[et] - e) / e <= 0.05, (et, approx[et], e)


def test_cross_corpus_ngram_overlap(spark):
    from vector_search_spark.operators import dedup as dd

    train = spark.createDataFrame(
        [
            (1, "a b c d e f g"),        # shares 5-grams 'a b c d e'.. with eval 100
            (2, "x y z w v"),            # no overlap
            (3, "c d e f g h"),          # shares 'c d e f g' with eval 100
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "a b c d e f g h")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in dd.cross_corpus_ngram_overlap(train, ev, shingle_n=5).collect()
    }
    # doc 1: 5-grams {a b c d e, b c d e f, c d e f g} all in eval
    # doc 3: {c d e f g, d e f g h} both in eval; doc 2 absent
    assert set(out) == {1, 3}
    assert out[1].n_shared_ngrams == 3 and out[1].n_eval_docs == 1
    assert out[3].n_shared_ngrams == 2
    assert out[1].sample_ngram == "a b c d e"

    # df cap drops a boilerplate shingle shared by every train doc
    train2 = spark.createDataFrame(
        [(i, "p q r s t unique%d" % i) for i in range(4)],
        "doc_id long, text string",
    )
    ev2 = spark.createDataFrame([(9, "p q r s t")], "doc_id long, text string")
    full = dd.cross_corpus_ngram_overlap(train2, ev2, shingle_n=5)
    capped = dd.cross_corpus_ngram_overlap(
        train2, ev2, shingle_n=5, max_shingle_df=3
    )
    assert full.count() == 4 and capped.count() == 0


def test_bloom_membership_exact_and_prefilter_sound(spark):
    from vector_search_spark.operators import dedup as dd
    import numpy as np

    ref = spark.createDataFrame(
        [(i, f"shared text {i % 5}") for i in range(10)],
        "doc_id long, text string",
    )
    cand = spark.createDataFrame(
        [(100 + i, f"shared text {i}") for i in range(20)],
        "doc_id long, text string",
    )
    out = dd.bloom_membership(cand, ref, fpp=0.01).collect()
    # candidates 0..4 mod-5 texts exist in ref (each appearing twice)
    got = {(r.doc_id, r.n_ref_matches) for r in out}
    assert got == {(100 + i, 2) for i in range(5)}

    # filter internals: every reference key must probe positive
    key = ref.select("doc_id", dd.F.md5(dd.T.norm_text("text")).alias("_h"))
    bits, m_bits, k = dd.build_bloom(key, key.count(), 0.01)
    h1, h2 = dd._hex_to_h1h2([r._h for r in key.collect()])
    pos = dd._bloom_positions(h1, h2, k, m_bits)
    word = bits[(pos >> np.uint64(6)).astype(np.int64)]
    hit = ((word >> (pos & np.uint64(63))) & np.uint64(1)).astype(bool)
    assert hit.all(axis=1).all()  # zero false negatives, by construction


def test_bloom_fpp_in_range(spark):
    from vector_search_spark.operators import dedup as dd
    import numpy as np

    ref = spark.createDataFrame(
        [(i, f"member {i}") for i in range(500)], "doc_id long, text string"
    )
    key = ref.select(dd.F.md5(dd.T.norm_text("text")).alias("_h"))
    bits, m_bits, k = dd.build_bloom(key, 500, 0.01)
    # probe 5000 NON-members: observed fp rate must be near nominal
    probes = [f"absent {i}" for i in range(5000)]
    import hashlib

    hh = [hashlib.md5(p.encode()).hexdigest() for p in probes]
    h1, h2 = dd._hex_to_h1h2(hh)
    pos = dd._bloom_positions(h1, h2, k, m_bits)
    word = bits[(pos >> np.uint64(6)).astype(np.int64)]
    fp = (
        ((word >> (pos & np.uint64(63))) & np.uint64(1))
        .astype(bool)
        .all(axis=1)
        .mean()
    )
    assert fp <= 0.05, f"observed fpp {fp:.4f} vs nominal 0.01"


# --- semantic dedup (SemDeDup, operators/dedup.py) ------------------------


def test_semantic_dedup_drops_higher_id_paraphrase(spark):
    import numpy as np

    from vector_search_spark.operators import dedup

    # two clusters at x=0 and x=10; ids 0/1 near-identical, id 2 opposite
    # direction (cosine < 0), id 3 alone in the far cluster
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.99, 0.01]),
        (2, [-1.0, 0.0]),
        (3, [10.0, 10.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = np.array([[1.0, 0.0], [10.0, 10.0]])
    out = {
        r.vec_id: (r.cluster_id, r.kept)
        for r in dedup.semantic_dedup(emb, cents, threshold=0.9).collect()
    }
    assert out[0] == (0, True)     # lowest id always kept
    assert out[1] == (0, False)    # cosine ~0.9999 to id 0 -> dropped
    assert out[2][1] is True       # negative cosine, kept
    assert out[3] == (1, True)     # alone in its cluster


def test_semantic_dedup_cluster_isolation(spark):
    """Identical vectors in DIFFERENT clusters are never compared —
    the cluster is the blocking unit (paper semantics)."""
    import numpy as np

    from vector_search_spark.operators import dedup

    rows = [(0, [0.9, 0.9]), (1, [1.1, 1.1])]  # same direction
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = np.array([[0.9, 0.9], [1.1, 1.1]])  # each its own cell
    out = dedup.semantic_dedup(emb, cents, threshold=0.5).collect()
    assert all(r.kept for r in out)


# --- count-min sketch (operators/sketch.py) -------------------------------


def test_cms_never_underestimates_and_exact_when_sparse(spark):
    from vector_search_spark.operators import sketch as cms

    rows = [(w,) for w, n in [("a", 5), ("b", 3), ("c", 1)] for _ in range(n)]
    items = spark.createDataFrame(rows, "g string")
    sk = cms.cms_build(items, "g", depth=4, width=64)
    probes = spark.createDataFrame([("a",), ("b",), ("c",)], "g string")
    est = {
        r.g: r.cms_est
        for r in cms.cms_estimate(sk, probes, "g", depth=4, width=64).collect()
    }
    truth = {"a": 5, "b": 3, "c": 1}
    for g, t in truth.items():
        assert est[g] >= t  # the CMS guarantee
    # 3 keys in 4x64 cells: collisions across all 4 rows are ~impossible
    assert est == truth


def test_cms_merge_equals_union(spark):
    from pyspark.sql import functions as F

    from vector_search_spark.operators import sketch as cms

    a = spark.createDataFrame([("x",)] * 4 + [("y",)] * 2, "g string")
    b = spark.createDataFrame([("x",)] * 1 + [("z",)] * 3, "g string")
    merged = (
        cms.cms_build(a, "g").unionAll(cms.cms_build(b, "g"))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    direct = cms.cms_build(a.unionAll(b), "g")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_cms_absent_key_estimates_zero_when_empty_cells(spark):
    from vector_search_spark.operators import sketch as cms

    items = spark.createDataFrame([("only",)], "g string")
    sk = cms.cms_build(items, "g", depth=4, width=1024)
    probe = spark.createDataFrame([("missing",)], "g string")
    [r] = cms.cms_estimate(sk, probe, "g", depth=4, width=1024).collect()
    assert r.cms_est == 0  # all four cells empty -> floor at zero


def test_unigram_logprob_rare_tokens_score_lower(spark):
    from vector_search_spark.operators import textstats

    rows = [
        (0, "the the the the"),       # all common tokens
        (1, "the the the zyzzyva"),   # one rare token
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.n_toks, r.avg_logprob)
        for r in textstats.unigram_logprob(docs).collect()
    }
    import math

    # p(the)=7/8, p(zyzzyva)=1/8
    assert out[0][0] == 4 and out[1][0] == 4
    assert abs(out[0][1] - math.log(7 / 8)) < 1e-9
    assert out[1][1] < out[0][1]  # rare-token doc is more surprising
    expect1 = (3 * math.log(7 / 8) + math.log(1 / 8)) / 4
    assert abs(out[1][1] - expect1) < 1e-9


def test_incremental_lsh_only_cross_pairs_and_matches_full(spark):
    from vector_search_spark import tables as tb
    from vector_search_spark.operators import dedup

    docs = tb.load(spark, "/root/testdata/sf0.001", "documents")
    split = 400
    new = docs.filter(F.col("doc_id") >= split)
    old = docs.filter(F.col("doc_id") < split)
    inc = dedup.incremental_lsh_pairs(
        new, old, shingle_n=3, num_perms=12, rows_per_band=3, threshold=0.5
    ).collect()
    assert inc  # the fixture corpus has cross-split near-dups
    assert all(r.new_id >= split > r.corpus_id for r in inc)
    # must equal the full-pipeline pairs restricted to the crossing set
    full = dedup.minhash_lsh_pairs(
        docs, shingle_n=3, num_perms=12, rows_per_band=3, threshold=0.5
    ).collect()
    want = {
        (r.b, r.a, round(r.jaccard, 9))
        for r in full
        if r.a < split <= r.b
    }
    got = {(r.new_id, r.corpus_id, round(r.jaccard, 9)) for r in inc}
    assert got == want


def test_incremental_lsh_shared_equals_two_source(spark):
    from vector_search_spark import tables as tb
    from vector_search_spark.operators import dedup

    docs = tb.load(spark, "/root/testdata/sf0.001", "documents")
    split = 400
    two = dedup.incremental_lsh_pairs(
        docs.filter(F.col("doc_id") >= split),
        docs.filter(F.col("doc_id") < split),
        shingle_n=3, num_perms=12, rows_per_band=3, threshold=0.5,
    ).collect()
    one = dedup.incremental_lsh_pairs_shared(
        docs, F.col("doc_id") >= split,
        shingle_n=3, num_perms=12, rows_per_band=3, threshold=0.5,
    ).collect()
    key = lambda rows: sorted(
        (r.new_id, r.corpus_id, round(r.jaccard, 9)) for r in rows
    )
    assert key(one) == key(two) and one


def test_incremental_lsh_updated_doc_supersedes_corpus_row(spark):
    """An id present in BOTH the new batch and the corpus is an updated
    doc: the batch version supersedes the corpus row. No self-pairs,
    and the result equals running against the corpus with the
    overlapping id removed. Regression test for double-counted
    shingles corrupting the exact-Jaccard verify."""
    from vector_search_spark.operators import dedup

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "an entirely different corpus document about spark sql"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            # id 2 UPDATED: now a near-dup of corpus doc 1
            (2, "the quick brown fox jumps over the lazy dog tonight"),
            (3, "the quick brown fox jumps over the lazy dog today"),
        ],
        "doc_id long, text string",
    )
    kw = dict(shingle_n=3, num_perms=16, rows_per_band=2, threshold=0.3)
    got = dedup.incremental_lsh_pairs(new, corpus, **kw).collect()
    assert all(r.new_id != r.corpus_id for r in got)  # no self-pairs
    want = dedup.incremental_lsh_pairs(
        new, corpus.filter(F.col("doc_id") != 2), **kw
    ).collect()
    key = lambda rows: sorted(
        (r.new_id, r.corpus_id, round(r.jaccard, 9)) for r in rows
    )
    assert key(got) == key(want) and got


def test_shared_span_pairs_hand_case_and_boilerplate_cap(spark):
    """Two docs sharing a long verbatim passage must pair with
    shared >= min_shared; a boilerplate span present in EVERY doc is
    dropped by the df cap and must not, alone, create pairs."""
    from vector_search_spark.operators import dedup

    passage = "the quick brown fox jumps over the lazy dog again and again"
    boiler = "copyright acme corp all rights reserved worldwide"
    rows = [
        (1, f"{passage} alpha beta gamma {boiler}"),
        (2, f"intro words first {passage} {boiler}"),
        (3, f"totally unrelated content about spark catalyst {boiler}"),
        (4, f"other unrelated text mentioning parquet files {boiler}"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.shared_span_pairs(
        docs, shingle_n=3, window=4, min_shared=2, max_fp_df=2
    ).collect()
    pairs = {(r.a, r.b) for r in out}
    assert (1, 2) in pairs  # the shared passage
    # boilerplate-only pairs (3,4 etc.) must not appear: its
    # fingerprints have df=4 > cap
    assert (3, 4) not in pairs
    # without the cap the boilerplate span does pair everything
    un = dedup.shared_span_pairs(
        docs, shingle_n=3, window=4, min_shared=2, max_fp_df=None
    ).collect()
    assert {(r.a, r.b) for r in un} >= {(1, 2), (3, 4)}


def test_quality_weighted_sample_monotone_nesting(spark):
    """Raising the base rate (or a row's weight) must strictly GROW the
    kept set — the per-row uniform depends only on (seed, id), never on
    the rate, so samples nest (the property mixture tuning needs)."""
    from vector_search_spark import tables as tb
    from vector_search_spark.operators import sampling

    docs = tb.load(spark, "/root/testdata/sf0.001", "documents")
    w = F.least(F.col("n_chars") / F.lit(1000.0), F.lit(2.0))
    keep = {}
    for r in (0.1, 0.3, 0.6):
        keep[r] = {
            x.doc_id
            for x in sampling.quality_weighted_sample(
                docs, weight=w, base_rate=r
            ).select("doc_id").collect()
        }
    assert keep[0.1] <= keep[0.3] <= keep[0.6]
    assert len(keep[0.1]) < len(keep[0.6])
    # doubling every weight at fixed rate also nests
    big = {
        x.doc_id
        for x in sampling.quality_weighted_sample(
            docs, weight=w * 2.0, base_rate=0.3
        ).select("doc_id").collect()
    }
    assert keep[0.3] <= big
    with pytest.raises(ValueError):
        sampling.quality_weighted_sample(docs, weight=w, base_rate=-0.1)


def test_bigram_logprob_hand_case(spark):
    """Deterministic corpus: 'a b' repeated vs 'b a' once. With add-k
    smoothing, the common transition must outscore the rare one, and
    the exact value is checkable by hand."""
    import math

    rows = [
        (1, "a b"),
        (2, "a b"),
        (3, "b a"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.n_bigrams, r.avg_logprob)
        for r in textstats.bigram_logprob(docs, k=0.5).collect()
    }
    # bigrams: (a,b) x2, (b,a) x1; contexts: a->2, b->1; V=2
    p_ab = (2 + 0.5) / (2 + 0.5 * 2)
    p_ba = (1 + 0.5) / (1 + 0.5 * 2)
    assert out[1] == out[2]
    assert out[1][0] == 1 and abs(out[1][1] - math.log(p_ab)) < 1e-12
    assert abs(out[3][1] - math.log(p_ba)) < 1e-12
    assert out[1][1] > out[3][1]


def test_lsh_band_curve_nesting_and_truth(spark):
    """Band-curve invariants: smaller r (more bands) can only ADD
    candidates — levels nest — and every level's verified-pair count is
    bounded by its candidate count and non-increasing in r."""
    from vector_search_spark import tables
    from vector_search_spark.operators import dedup

    docs = tables.load(spark, SF_ORACLE, "documents")
    rows = {
        r.rows_per_band: r
        for r in dedup.lsh_band_curve(
            docs, shingle_n=3, num_perms=12, r_values=(2, 3, 4, 6),
            threshold=0.5,
        ).collect()
    }
    assert set(rows) == {2, 3, 4, 6}
    for r in rows.values():
        assert r.n_bands == 12 // r.rows_per_band
        assert 0 <= r.n_true_pairs <= r.n_candidates
    # candidate-set containment holds only where every coarser-aligned
    # block contains a full finer-aligned band: r1 | r2 gives the
    # chains 2<-4<-6 and 3<-6, and at P=12 every level's blocks
    # (length >= 3) contain an aligned 2-band, so r=2 dominates all.
    # r=3 vs r=4 have misaligned blocks and are genuinely
    # INCOMPARABLE — asserting a full descending sort would fail on
    # correct output for some corpora (round-7 review).
    c = {r: rows[r].n_candidates for r in (2, 3, 4, 6)}
    t = {r: rows[r].n_true_pairs for r in (2, 3, 4, 6)}
    for hi, lo in [(2, 3), (2, 4), (2, 6), (3, 6), (4, 6)]:
        assert c[hi] >= c[lo], (hi, lo, c)
        assert t[hi] >= t[lo], (hi, lo, t)
    # the r=3 level must reproduce the standalone pipeline's pair count
    from vector_search_spark.operators.dedup import minhash_lsh_pairs

    n3 = minhash_lsh_pairs(
        docs, shingle_n=3, num_perms=12, rows_per_band=3, threshold=0.5
    ).count()
    assert rows[3].n_true_pairs == n3


def test_dup_rate_by_source_consistent_with_exact_dedup(spark):
    from vector_search_spark import tables
    from vector_search_spark.operators import dedup
    from pyspark.sql import functions as F

    docs = tables.load(spark, SF_ORACLE, "documents")
    per = dedup.dup_rate_by_source(docs).collect()
    assert sum(r.n_docs for r in per) == docs.count()
    for r in per:
        assert 0 <= r.n_distinct <= r.n_docs
        assert abs(r.dup_rate - round(1 - r.n_distinct / r.n_docs, 6)) < 1e-9
    # corpus-wide distinct canonical hashes == exact_dedup's group count
    n_groups = (
        dedup.exact_dedup(docs).select("canonical_id").distinct().count()
    )
    total_distinct = (
        docs.select(
            F.md5(
                F.trim(
                    F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
                )
            ).alias("h")
        )
        .distinct()
        .count()
    )
    assert n_groups == total_distinct


def test_prefix_sum_offsets_equals_naive_global_window(spark):
    """The two-pass sharded scan must equal the naive global running
    sum for every shard size (1 = one doc per shard, 7 = misaligned,
    1<<20 = everything in one shard) including id GAPS — the operator
    only assumes a non-negative numeric id, not density."""
    from pyspark.sql import Window

    rows = [(i * 3 + (i % 2), (i * 37) % 11 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_toks int")
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r.doc_id: r.off
        for r in df.withColumn(
            "off", F.coalesce(F.sum("n_toks").over(w), F.lit(0))
        ).collect()
    }
    for shard_size in (1, 7, 64, 1 << 20):
        got = {
            r.doc_id: r.off
            for r in textstats.prefix_sum_offsets(
                df, shard_size=shard_size
            ).collect()
        }
        assert got == want, f"shard_size={shard_size}"


def test_prefix_sum_offsets_rejects_bad_shard_size(spark):
    df = spark.createDataFrame([(1, 2)], "doc_id long, n_toks int")
    with pytest.raises(ValueError, match="shard_size"):
        textstats.prefix_sum_offsets(df, shard_size=0)


def test_assemble_packs_partitions_the_token_stream(spark):
    """Every pack except the last holds exactly ctx tokens, the pack
    totals conserve the corpus token count, straddling docs appear in
    both packs' doc spans, and the ordered fingerprint equals the one
    computed from the naive single-task concatenation."""
    import hashlib

    rows = [(i, [f"w{i}_{j}" for j in range((i % 5) + 1)]) for i in range(40)]
    df = spark.createDataFrame(
        rows, "doc_id long, t array<string>"
    ).withColumn("n_toks", F.size("t"))
    out = sorted(
        textstats.assemble_packs(df, ctx=7, shard_size=8).collect(),
        key=lambda r: r["pack_id"],
    )
    total = sum(len(t) for _, t in rows)
    assert sum(r["n_toks"] for r in out) == total
    assert [r["pack_id"] for r in out] == list(range(len(out)))
    assert all(r["n_toks"] == 7 for r in out[:-1])
    assert out[-1]["n_toks"] == total - 7 * (len(out) - 1)
    # naive reference: flatten in doc order, cut every 7
    stream = [tk for _, t in rows for tk in t]
    for r in out:
        seq = stream[r["pack_id"] * 7 : r["pack_id"] * 7 + 7]
        want = hashlib.md5(" ".join(seq).encode()).hexdigest()
        assert r["pack_md5"] == want, r["pack_id"]
    # doc spans: a doc straddling a boundary is first_doc of one pack
    # and last_doc of the previous
    for a, b in zip(out, out[1:]):
        assert a["last_doc"] >= b["first_doc"] - 1
    with pytest.raises(ValueError, match="ctx"):
        textstats.assemble_packs(df, ctx=0)


def test_prefix_sum_offsets_raises_on_null_id(spark):
    """A NULL id has no position in the global order; dropping it
    silently would be silent row loss in a packing pass — the _shard
    projection raises in-plan instead (module discipline, same as
    shuffle_order / materialize_mixture)."""
    df = spark.createDataFrame(
        [(1, 2), (None, 3)], "doc_id long, n_toks int"
    )
    with pytest.raises(Exception, match="no position in the global"):
        textstats.prefix_sum_offsets(df).collect()


def test_prefix_sum_offsets_rejects_reserved_column_clash(spark):
    """An input that already carries `_shard` would make the
    select('*', bounded_alias(..)) emit a DUPLICATE column and the
    downstream F.col('_shard') die with an ambiguous-reference
    AnalysisException (while `_inoff`/`_base` would be silently
    replaced) — the guard fails loud up front instead (r11 advice;
    materialize_mixture precedent)."""
    df = spark.createDataFrame(
        [(1, 2, 9)], "doc_id long, n_toks int, _shard int"
    )
    with pytest.raises(ValueError, match="reserved"):
        textstats.prefix_sum_offsets(df)


def test_lsh_band_curve_rejects_empty_r_values(spark, docs):
    with pytest.raises(ValueError, match="non-empty"):
        dedup.lsh_band_curve(docs, r_values=())


def _mkdocs(spark, rows):
    """(group, n_tokens) rows -> a documents-shaped frame whose text has
    exactly n whitespace tokens."""
    return spark.createDataFrame(
        [(i, g, "w " * n) for i, (g, n) in enumerate(rows)],
        "doc_id long, lang string, text string",
    )


def test_value_cume_dist_matches_window_cume_dist(spark):
    """The aggregate-route exact cume_dist must equal the direct
    window-function definition, ties included; NULL values pass
    through with NULL cd (left join, no match)."""
    from pyspark.sql import Window as W

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate([5, 3, 3, 8, 1, 8, 8, None])],
        "id long, v int",
    )
    got = {
        r["id"]: r["cd"]
        for r in textstats.value_cume_dist(df, "v", out_col="cd").collect()
    }
    want = {
        r["id"]: r["cd"]
        for r in df.filter(F.col("v").isNotNull())
        .withColumn("cd", F.cume_dist().over(W.orderBy("v")))
        .collect()
    }
    assert got[7] is None
    assert {k: got[k] for k in want} == want


def test_waterfill_budget_hand_case(spark):
    """toks a=2 b=5 c=13 (cap=1, budget 50% -> C=10): ascending, a
    saturates (2 <= 10/3), b and c clip at the waterline 4.0
    ((10-2)/2 — frozen by the running max against c's lower raw
    candidate (10-7)/1=3). Allocations sum exactly to C."""
    docs = _mkdocs(spark, [("a", 2), ("b", 5), ("c", 13)])
    out = {
        r["lang"]: r
        for r in textstats.waterfill_budget(
            docs, group_col="lang", epoch_cap=1, budget_pct=50
        ).collect()
    }
    assert out["a"]["alloc"] == 2.0 and out["a"]["epochs"] == 1.0
    assert out["b"]["alloc"] == 4.0 and out["b"]["epochs"] == 0.8
    assert out["c"]["alloc"] == 4.0
    assert sum(r["alloc"] for r in out.values()) == 10.0


def test_waterfill_budget_equal_groups_and_full_budget(spark):
    docs = _mkdocs(spark, [("a", 6), ("b", 6), ("c", 6)])
    # equal groups: everyone gets C/L
    out = textstats.waterfill_budget(
        docs, group_col="lang", epoch_cap=2, budget_pct=50
    ).collect()
    assert all(r["alloc"] == 6.0 for r in out)  # (50% of 36) / 3
    # budget_pct=100: everyone is taken whole at the epoch cap
    full = textstats.waterfill_budget(
        docs, group_col="lang", epoch_cap=3, budget_pct=100
    ).collect()
    assert all(
        r["alloc"] == float(r["avail"]) and r["epochs"] == 3.0 for r in full
    )


def test_mixture_weights_alpha_limits(spark):
    docs = _mkdocs(spark, [("a", 1), ("b", 3), ("c", 12)])
    # alpha=1: weight == share, boost == 1 (no smoothing)
    nat = textstats.mixture_weights(
        docs, group_col="lang", alpha=1.0
    ).collect()
    for r in nat:
        assert r["weight"] == pytest.approx(r["share"], abs=1e-12)
        assert r["boost"] == pytest.approx(1.0, abs=1e-12)
    # alpha=0: uniform weights, small groups boosted above 1
    uni = {
        r["lang"]: r
        for r in textstats.mixture_weights(
            docs, group_col="lang", alpha=0.0
        ).collect()
    }
    assert all(
        r["weight"] == pytest.approx(1 / 3, abs=1e-12) for r in uni.values()
    )
    assert uni["a"]["boost"] > 1.0 > uni["c"]["boost"]
    # weights always normalize
    mid = textstats.mixture_weights(docs, group_col="lang", alpha=0.3)
    assert sum(r["weight"] for r in mid.collect()) == pytest.approx(1.0)


def test_materialize_mixture_copies_and_guards(spark):
    """Integer epochs -> exactly that many tagged copies of every row;
    fractional epochs -> floor copies + a deterministic hash-threshold
    extra on a subset; 0 epochs / absent groups drop entirely (and the
    0-copies row must NOT hit Spark's descending sequence(1,0));
    NULL or > max_epochs epochs raise at action time."""
    from vector_search_spark.operators import sampling

    docs = spark.createDataFrame(
        [(i, g) for i, g in enumerate(["a"] * 4 + ["b"] * 40 + ["c"] * 3 + ["d"] * 2)],
        "doc_id long, lang string",
    )
    ep = spark.createDataFrame(
        [("a", 2.0), ("b", 1.5), ("c", 0.0)], "lang string, epochs double"
    )
    out = sampling.materialize_mixture(docs, ep).collect()
    by = {}
    for r in out:
        by.setdefault(r["lang"], {}).setdefault(r["doc_id"], []).append(r["rep"])
    # a: every row exactly twice, reps 1..2
    assert all(sorted(v) == [1, 2] for v in by["a"].values())
    assert len(by["a"]) == 4
    # b: every row 1 or 2 times, and the extra-copy subset is a strict
    # fraction (0 < extras < all) of a 40-row group at rate 0.5
    counts = [len(v) for v in by["b"].values()]
    assert len(by["b"]) == 40 and set(counts) <= {1, 2}
    assert 0 < counts.count(2) < 40
    # c (0 epochs) and d (absent from the allocation): dropped
    assert "c" not in by and "d" not in by
    # determinism
    assert sorted(map(tuple, out)) == sorted(
        map(tuple, sampling.materialize_mixture(docs, ep).collect())
    )
    bad = spark.createDataFrame([("a", None)], "lang string, epochs double")
    with pytest.raises(Exception, match="epochs must be in"):
        sampling.materialize_mixture(docs, bad).collect()
    huge = spark.createDataFrame([("a", 9.0)], "lang string, epochs double")
    with pytest.raises(Exception, match="epochs must be in"):
        sampling.materialize_mixture(docs, huge, max_epochs=4).collect()
    with pytest.raises(ValueError, match="max_epochs"):
        sampling.materialize_mixture(docs, ep, max_epochs=0)
    # silent-divergence guards: duplicate allocation rows fan the join
    # out; NULL group/id rows would silently drop / lose their draw
    dup = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0)], "lang string, epochs double"
    )
    with pytest.raises(Exception, match="duplicate allocation"):
        sampling.materialize_mixture(docs, dup).collect()
    holey = spark.createDataFrame(
        [(1, "a"), (2, None)], "doc_id long, lang string"
    )
    with pytest.raises(Exception, match="silently diverge"):
        sampling.materialize_mixture(holey, ep).collect()
    # output contract: input columns + rep, NOTHING internal (_g/_e/
    # _dup once leaked into SELECT * downstream)
    assert sampling.materialize_mixture(docs, ep).columns == [
        "doc_id",
        "lang",
        "rep",
    ]
    # reserved-name clash raises up front instead of silently
    # overwriting caller data
    with pytest.raises(ValueError, match="reserved"):
        sampling.materialize_mixture(
            docs.withColumn("rep", F.lit(1)), ep
        )
    # duplicate allocation rows raise EVEN when the duplicated group
    # matches no data rows (the guard is evaluated building the
    # broadcast allocation, not post-join)
    dup_unmatched = spark.createDataFrame(
        [("a", 1.0), ("zz", 1.0), ("zz", 2.0)],
        "lang string, epochs double",
    )
    with pytest.raises(Exception, match="duplicate allocation"):
        sampling.materialize_mixture(docs, dup_unmatched).collect()


def test_shuffle_order_is_a_dense_deterministic_permutation(spark):
    """Every input row appears exactly once; shard in [0, n); pos is
    dense 1..n within each shard; the whole assignment is
    deterministic; a different seed gives a different order; NULL id
    components raise instead of silently aliasing."""
    from vector_search_spark.operators import sampling

    df = spark.createDataFrame(
        [(i, r) for i in range(40) for r in (1, 2)], "doc_id long, rep int"
    )
    out = sampling.shuffle_order(
        df, n_shards=4, id_cols=("doc_id", "rep")
    ).collect()
    assert sorted((r["doc_id"], r["rep"]) for r in out) == sorted(
        (i, r) for i in range(40) for r in (1, 2)
    )
    by_shard = {}
    for r in out:
        assert 0 <= r["shard"] < 4
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    again = sampling.shuffle_order(
        df, n_shards=4, id_cols=("doc_id", "rep")
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    other = sampling.shuffle_order(
        df, n_shards=4, id_cols=("doc_id", "rep"), seed="ord2"
    ).collect()
    assert {(r["doc_id"], r["rep"], r["shard"], r["pos"]) for r in out} != {
        (r["doc_id"], r["rep"], r["shard"], r["pos"]) for r in other
    }
    with pytest.raises(ValueError, match="n_shards"):
        sampling.shuffle_order(df, n_shards=0)
    with pytest.raises(ValueError, match="id_cols"):
        sampling.shuffle_order(df, n_shards=2, id_cols=())
    withnull = spark.createDataFrame(
        [(1, None)], "doc_id long, rep int"
    )
    with pytest.raises(Exception, match="NULL in id_cols"):
        sampling.shuffle_order(
            withnull, n_shards=2, id_cols=("doc_id", "rep")
        ).collect()
    # reserved output names (_u/shard/pos) on the input would be
    # silently overwritten by withColumn — raise up front instead
    with pytest.raises(ValueError, match="reserved"):
        sampling.shuffle_order(
            df.withColumn("pos", F.lit(0)), n_shards=2
        )


def test_dsir_logratio_ranks_target_like_docs_higher(spark):
    """Docs sharing the target's n-grams must outscore off-domain
    docs; too-short docs (no bigram) are absent; bad params raise."""
    target = spark.createDataFrame(
        [(100 + i, "the cat sat on the mat") for i in range(4)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (0, "the cat sat on the mat today"),
            (1, "cat sat on the mat"),
            (2, "quantum flux capacitor array driver"),
            (3, "flux driver quantum capacitor module"),
            (4, "single"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["dsir_score"]
        for r in textstats.dsir_logratio(
            raw, target, n_buckets=256, ngram_n=2
        ).collect()
    }
    assert 4 not in got  # one token -> no bigram -> no score
    assert min(got[0], got[1]) > max(got[2], got[3])
    with pytest.raises(ValueError, match="n_buckets"):
        textstats.dsir_logratio(raw, target, n_buckets=1)
    with pytest.raises(ValueError, match="smoothing"):
        textstats.dsir_logratio(raw, target, smoothing=0)
    with pytest.raises(ValueError, match="ngram_n"):
        textstats.dsir_logratio(raw, target, ngram_n=0)


def test_dsir_logratio_sampled_stats_converge(spark):
    """stats_fraction: the raw bucket table on a deterministic
    hash-sample instead of the full corpus (the at-scale default — the
    second full read is the operator's cost and the paper estimates on
    samples). fraction=1.0 must be BIT-identical to the exact path
    (threshold keeps every row); at 0.5 the scores still separate
    target-like from off-domain docs and every doc is still scored
    (scoring covers the full corpus, only p_raw is estimated); bad
    fractions raise."""
    target = spark.createDataFrame(
        [(1000 + i, "the cat sat on the mat") for i in range(4)],
        "doc_id long, text string",
    )
    like = [(i, "the cat sat on the mat again") for i in range(20)]
    off = [
        (100 + i, "quantum flux capacitor array driver module")
        for i in range(20)
    ]
    raw = spark.createDataFrame(like + off, "doc_id long, text string")
    exact = {
        r["doc_id"]: (r["n_grams"], r["dsir_score"])
        for r in textstats.dsir_logratio(
            raw, target, n_buckets=256, ngram_n=2
        ).collect()
    }
    full = {
        r["doc_id"]: (r["n_grams"], r["dsir_score"])
        for r in textstats.dsir_logratio(
            raw, target, n_buckets=256, ngram_n=2, stats_fraction=1.0
        ).collect()
    }
    assert full == exact  # fraction 1.0 == exact path, bitwise
    sampled = {
        r["doc_id"]: r["dsir_score"]
        for r in textstats.dsir_logratio(
            raw, target, n_buckets=256, ngram_n=2, stats_fraction=0.5
        ).collect()
    }
    assert set(sampled) == set(exact)  # every doc still scored
    assert min(sampled[i] for i, _ in like) > max(
        sampled[i] for i, _ in off
    )
    # determinism: the hash-sample is stable across invocations
    again = {
        r["doc_id"]: r["dsir_score"]
        for r in textstats.dsir_logratio(
            raw, target, n_buckets=256, ngram_n=2, stats_fraction=0.5
        ).collect()
    }
    assert again == sampled
    # unseen-bucket hole: at fraction 1e-6 the sample is (almost
    # surely) empty, so every off-target gram hits a bucket unseen by
    # both count tables — the LEFT join + pure-smoothing default must
    # keep every gram scored (same doc set, same n_grams as exact;
    # an inner join would silently drop grams / whole docs)
    tiny = {
        r["doc_id"]: r["n_grams"]
        for r in textstats.dsir_logratio(
            raw, target, n_buckets=256, ngram_n=2, stats_fraction=1e-6
        ).collect()
    }
    assert tiny == {k: v[0] for k, v in exact.items()}
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError, match="stats_fraction"):
            textstats.dsir_logratio(raw, target, stats_fraction=bad)


def test_mixture_weights_per_tokens_equals_corpus_pass(spark):
    """mixture_weights(per_tokens=...) must be bit-identical to the
    corpus-pass path when fed the same per-group sums (e.g. the
    waterfill_budget output) — the composition shortcut that keeps a
    fused mixture pipeline at ONE tokenize pass must not change a
    single value."""
    docs = _mkdocs(spark, [("a", 2), ("b", 5), ("c", 13), ("b", 4)])
    full = sorted(
        map(
            tuple,
            textstats.mixture_weights(
                docs, group_col="lang", alpha=0.3
            ).collect(),
        )
    )
    wf = textstats.waterfill_budget(
        docs, group_col="lang", epoch_cap=2, budget_pct=70
    )
    via = sorted(
        map(
            tuple,
            textstats.mixture_weights(
                docs,
                group_col="lang",
                alpha=0.3,
                per_tokens=wf.select("lang", "toks"),
            ).collect(),
        )
    )
    assert via == full


def test_mixture_and_waterfill_reject_bad_params(spark):
    docs = _mkdocs(spark, [("a", 1)])
    with pytest.raises(ValueError, match="alpha"):
        textstats.mixture_weights(docs, alpha=1.5)
    with pytest.raises(ValueError, match="epoch_cap"):
        textstats.waterfill_budget(docs, epoch_cap=0)
    with pytest.raises(ValueError, match="budget_pct"):
        textstats.waterfill_budget(docs, budget_pct=0)


# ---------------------------------------------------------------------------
# Duplicate-span excision (dedup.excise_spans)
# ---------------------------------------------------------------------------


def _excise(spark, rows, span_n=3):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in dedup.excise_spans(docs, span_n=span_n).collect()
    }
    # conservation holds for EVERY document, every time
    for r in out.values():
        assert r.n_kept + r.n_removed == r.n_orig, r
        n_clean = len(r.clean_text.split()) if r.clean_text else 0
        assert n_clean == r.n_kept, r
    return out


def test_excise_keep_first_occurrence_across_docs(spark):
    """The lower-(doc_id, pos) occurrence of a duplicated span keeps
    its tokens; the later document loses exactly the span."""
    out = _excise(
        spark,
        [
            (0, "x y z q r"),  # first occurrence of 'x y z'
            (1, "a b x y z c"),  # duplicate 'x y z' -> excised
            (2, "totally different words here"),
        ],
    )
    assert out[0].n_removed == 0 and out[0].clean_text == "x y z q r"
    assert out[1].n_removed == 3 and out[1].clean_text == "a b c"
    assert out[2].n_removed == 0


def test_excise_within_doc_repeat(spark):
    """A span repeated INSIDE one document keeps only its first
    occurrence (Lee et al. dedups within documents too)."""
    out = _excise(spark, [(7, "p q r s p q r t")])
    assert out[7].n_orig == 8
    assert out[7].n_removed == 3  # the second 'p q r'
    assert out[7].clean_text == "p q r s t"


def test_excise_overlapping_spans_union_positionwise(spark):
    """A duplicated PASSAGE (run of consecutive duplicated shingles)
    is removed whole from the non-first doc: overlapping span
    removals union their positions instead of double-counting."""
    out = _excise(
        spark,
        [
            (0, "a b c d e f"),  # first: keeps everything
            (1, "z a b c d e f w"),  # shares 4 overlapping 3-grams
        ],
    )
    assert out[0].n_removed == 0
    assert out[1].clean_text == "z w" and out[1].n_removed == 6


def test_excise_short_and_empty_docs_pass_through(spark):
    """Docs below span_n tokens emit no shingles (never excised);
    zero-token docs surface n_orig=0 with empty clean_text."""
    out = _excise(spark, [(1, "a b"), (2, "   "), (3, "a b")])
    assert out[1].n_orig == 2 and out[1].n_removed == 0
    assert out[2].n_orig == 0 and out[2].clean_text == ""
    # 'a b' twice is NOT a 3-token span -> both kept
    assert out[3].n_removed == 0


def test_excise_span_n_guard(spark):
    docs = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="span_n"):
        dedup.excise_spans(docs, span_n=0)


def test_excise_negative_id_raises_in_plan(spark):
    """The keep-first key doc_id*2^20+pos silently collides across
    documents when doc_id < 0 (or pos >= 2^20) — the key build raises
    in-plan instead of keeping/excising the WRONG occurrence (r11
    advice). The duplicated span across ids -1 and 1 forces the key
    expression to evaluate on the bad row."""
    docs = spark.createDataFrame(
        [(-1, "a b c d e f"), (1, "a b c d e f")],
        "doc_id long, text string",
    )
    with pytest.raises(Exception, match="collide"):
        dedup.excise_spans(docs, span_n=5).collect()


# ---------------------------------------------------------------------------
# Pack boundary segments (textstats.pack_boundaries)
# ---------------------------------------------------------------------------


def test_pack_boundaries_tile_and_conserve(spark):
    """Per pack, the sorted segments tile [0, pack length) with no gap
    or overlap; per document they sum to n_toks; zero-size docs emit
    nothing. Hand-checkable layout: sizes 5,3,4 with ctx=4 ->
    pack0=[d0:0..4), pack1=[d0:0..1)[d1:1..4), pack2=[d2:0..4)."""
    rows = [(0, 5), (1, 3), (2, 4), (3, 0)]
    df = spark.createDataFrame(rows, "doc_id long, n_toks int")
    segs = textstats.pack_boundaries(
        df, ctx=4, shard_size=2
    ).collect()
    got = {(r.pack_id, r.doc_id): (r.start_slot, r.n_slots) for r in segs}
    assert got == {
        (0, 0): (0, 4),
        (1, 0): (0, 1),
        (1, 1): (1, 3),
        (2, 2): (0, 4),
    }
    # per-doc conservation
    per_doc = {}
    for r in segs:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.n_slots
    assert per_doc == {0: 5, 1: 3, 2: 4}  # doc 3 (0 tokens) absent


def test_pack_boundaries_match_assemble_packs(spark):
    """Cross-operator consistency on real text: for every pack, the
    boundary segments must tile exactly the token count
    assemble_packs put in that pack, and segment starts must be
    contiguous in slot order."""
    docs = tables.load(spark, SF_ORACLE, "documents").limit(120)
    from vector_search_spark.functions import texts as T

    n = (
        docs.select("doc_id", T.tokens("text").alias("t"))
        .withColumn("n_toks", F.size("t"))
        .filter(F.col("n_toks") > 0)
        .localCheckpoint()
    )
    packs = {
        r.pack_id: r.n_toks
        for r in textstats.assemble_packs(
            n, ctx=64, shard_size=16, checkpoint=False
        ).collect()
    }
    segs = {}
    for r in textstats.pack_boundaries(
        n.select("doc_id", "n_toks"), ctx=64, shard_size=16
    ).collect():
        segs.setdefault(r.pack_id, []).append((r.start_slot, r.n_slots))
    assert set(segs) == set(packs)
    for pid, ss in segs.items():
        ss.sort()
        pos = 0
        for start, width in ss:
            assert start == pos, (pid, ss)  # contiguous, no gap/overlap
            assert width > 0
            pos += width
        assert pos == packs[pid], (pid, pos, packs[pid])


def test_pack_boundaries_ctx_guard(spark):
    df = spark.createDataFrame([(0, 3)], "doc_id long, n_toks int")
    with pytest.raises(ValueError, match="ctx"):
        textstats.pack_boundaries(df, ctx=0)


# ---------------------------------------------------------------------------
# PII scrubbing (textstats.pii_scrub) — round 12
# ---------------------------------------------------------------------------


def test_pii_scrub_counts_and_redaction(spark):
    """Each PII type is counted on the raw text and redacted to its
    placeholder; shapes are disjoint on well-formed text, so inserted
    placeholders == counts (the conservation property)."""
    df = spark.createDataFrame(
        [
            (0, "no pii here"),
            (1, "mail a.b+c@sub.example.org and x@y.io now"),
            (2, "hosts 10.0.0.1 and 192.168.254.3"),
            (3, "ssn 123-45-6789 phone 555-123-4567 alt 555.123.4567"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in textstats.pii_scrub(df).collect()}
    assert (out[0].n_email, out[0].n_ip, out[0].n_id, out[0].n_phone) == (
        0, 0, 0, 0,
    )
    assert out[0].clean_text == "no pii here"
    assert out[1].n_email == 2
    assert out[1].clean_text == "mail <EMAIL> and <EMAIL> now"
    assert out[2].n_ip == 2
    assert out[2].clean_text == "hosts <IP> and <IP>"
    assert (out[3].n_id, out[3].n_phone) == (1, 2)
    assert out[3].clean_text == "ssn <ID> phone <PHONE> alt <PHONE>"
    # conservation: placeholders inserted == counts
    for r in out.values():
        for typ, n in (
            ("<EMAIL>", r.n_email),
            ("<IP>", r.n_ip),
            ("<ID>", r.n_id),
            ("<PHONE>", r.n_phone),
        ):
            assert r.clean_text.count(typ) == n


def test_pii_scrub_word_boundaries_reject_near_misses(spark):
    """\\b + digit-group widths keep the patterns precise: longer digit
    runs, 3-part dotted numbers, and 1-char TLDs are NOT matches."""
    df = spark.createDataFrame(
        [(0, "edge 1234-45-6789 or 12.3.4 or x@y.z or 123-45-67890")],
        "doc_id long, text string",
    )
    [r] = textstats.pii_scrub(df).collect()
    assert (r.n_email, r.n_ip, r.n_id, r.n_phone) == (0, 0, 0, 0)
    assert r.clean_text == "edge 1234-45-6789 or 12.3.4 or x@y.z or 123-45-67890"


def test_pii_total_agrees_with_scrub_counts(spark):
    """pii_total is the drop-form filter twin of pii_scrub — same
    expressions, so it must equal the sum of the per-type counts."""
    df = spark.createDataFrame(
        [
            (0, "a@b.io and 1.2.3.4 and 987-65-4321 and 321-654-0987"),
            (1, "clean"),
        ],
        "doc_id long, text string",
    )
    tot = {
        r.doc_id: r.t
        for r in df.select(
            "doc_id", textstats.pii_total("text").alias("t")
        ).collect()
    }
    cnt = {
        r.doc_id: r.n_email + r.n_ip + r.n_id + r.n_phone
        for r in textstats.pii_scrub(df).collect()
    }
    assert tot == cnt == {0: 4, 1: 0}


# ---------------------------------------------------------------------------
# Line-level exact dedup (dedup.line_dedup) — round 12
# ---------------------------------------------------------------------------


def _line_dedup(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r for r in dedup.line_dedup(df, **kw).collect()}


def test_line_dedup_keep_first_across_docs(spark):
    """A line repeated corpus-wide survives only at its smallest
    (doc_id, position); unique lines always survive."""
    out = _line_dedup(
        spark,
        [
            (0, "header\nbody zero\nfooter"),
            (1, "header\nbody one\nfooter"),
        ],
    )
    assert out[0].clean_text == "header\nbody zero\nfooter"
    assert out[1].clean_text == "body one"
    assert (out[1].n_lines, out[1].n_kept, out[1].n_removed) == (3, 1, 2)


def test_line_dedup_within_doc_repeat_keeps_first(spark):
    out = _line_dedup(spark, [(5, "dup\nmid\ndup\ndup")])
    assert out[5].clean_text == "dup\nmid"
    assert (out[5].n_lines, out[5].n_kept, out[5].n_removed) == (4, 2, 2)


def test_line_dedup_empty_lines_exempt(spark):
    """min_chars=1 (default) exempts empty lines — paragraph breaks
    survive everywhere instead of deduping to the global first."""
    out = _line_dedup(
        spark, [(0, "a\n\nb"), (1, "c\n\nd"), (2, "\n\n")]
    )
    assert out[0].clean_text == "a\n\nb"
    assert out[1].clean_text == "c\n\nd"
    assert out[2].clean_text == "\n\n" and out[2].n_removed == 0


def test_line_dedup_min_chars_exempts_short_lines(spark):
    """Raising min_chars exempts short repeated lines from dedup."""
    out = _line_dedup(
        spark, [(0, "yes\nlong repeated line"), (1, "yes\nlong repeated line")],
        min_chars=4,
    )
    # 'yes' (3 chars) exempt everywhere; the long line dedups
    assert out[0].clean_text == "yes\nlong repeated line"
    assert out[1].clean_text == "yes"
    with pytest.raises(ValueError, match="min_chars"):
        dedup.line_dedup(
            spark.createDataFrame([(0, "x")], "doc_id long, text string"),
            min_chars=-1,
        )


def test_line_dedup_conservation_and_all_removed(spark):
    """n_kept + n_removed == n_lines for every doc; a doc losing every
    line surfaces with empty clean_text, not a missing row."""
    out = _line_dedup(
        spark,
        [(0, "only line"), (1, "only line"), (2, "only line")],
    )
    assert set(out) == {0, 1, 2}
    for r in out.values():
        assert r.n_kept + r.n_removed == r.n_lines == 1
    assert out[0].clean_text == "only line"
    assert out[1].clean_text == "" and out[2].clean_text == ""


def test_line_dedup_negative_id_raises_in_plan(spark):
    """Same keep-first key guard as excise_spans: a negative id would
    silently collide keys across documents — raise instead."""
    rows = [(-1, "x\nx"), (1, "x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with pytest.raises(Exception, match="collide"):
        dedup.line_dedup(df).collect()


def test_null_text_policy_preserves_rows(spark):
    """NULL-text documents must never be silently dropped by the
    corpus-rewriting ops: line_dedup surfaces (0, 0, 0, NULL) via
    posexplode_outer (the inner explode DROPPED the row — r12 fix),
    excise_spans preserves the row with NULL token accounting, and
    pii_scrub passes NULL through (NULL counts + NULL clean_text)."""
    df = spark.createDataFrame(
        [(0, "a b"), (1, None)], "doc_id long, text string"
    )
    ld = {r.doc_id: r for r in dedup.line_dedup(df).collect()}
    assert set(ld) == {0, 1}
    assert (ld[1].n_lines, ld[1].n_kept, ld[1].n_removed) == (0, 0, 0)
    assert ld[1].clean_text is None
    assert ld[0].clean_text == "a b"
    ex = {r.doc_id: r for r in dedup.excise_spans(df).collect()}
    assert set(ex) == {0, 1}
    assert ex[1].n_orig is None and ex[1].n_kept == 0
    pi = {r.doc_id: r for r in textstats.pii_scrub(df).collect()}
    assert set(pi) == {0, 1}
    assert pi[1].n_email is None and pi[1].clean_text is None


def test_keep_first_key_null_id_raises_in_plan(spark):
    """A NULL id would slip through the < 0 comparison (NULL < 0 is
    NULL, not false) and yield a silent NULL keep-first key — the
    r12 review fix makes it raise like prefix_sum_offsets' NULL-id
    guard. The duplicated line forces the key to evaluate."""
    df = spark.createDataFrame(
        [(None, "x\nx"), (1, "y")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="collide|NULL"):
        dedup.line_dedup(df).collect()


# --- deletion-list purge (dedup.purge_docs / purge_missing /
# purge_accounting) ---------------------------------------------------------


def test_purge_conservation_and_identity(spark, docs):
    """The three purge endpoints agree with each other: per-source
    accounting conserves (n_purged + n_kept == n_total, totals match
    the corpus), purge_docs' kept set IS the accounting's kept set
    (count + id-sum witness), purge_missing returns exactly the stale
    ids, and duplicate deletion-list entries do not double-count."""
    missing_ids = [10_000_001, 10_000_002]
    dels = (
        docs.filter(F.col("doc_id") % 5 == 1)
        .select("doc_id")
        .unionByName(
            spark.createDataFrame(
                # one missing id appears TWICE: distinct()-discipline
                [(i,) for i in missing_ids + [missing_ids[0]]],
                "doc_id long",
            )
        )
    )
    acct = dedup.purge_accounting(docs, dels, group_col="source").collect()
    n_docs = docs.count()
    assert sum(r.n_total for r in acct) == n_docs
    for r in acct:
        assert r.n_purged + r.n_kept == r.n_total

    kept = dedup.purge_docs(docs, dels)
    assert kept.count() == sum(r.n_kept for r in acct)
    assert kept.agg(F.sum("doc_id")).collect()[0][0] == sum(
        r.kept_id_sum for r in acct
    )
    # kept ∪ purged partitions the corpus
    assert kept.count() + docs.filter(
        F.col("doc_id") % 5 == 1
    ).count() == n_docs

    missing = {
        r.doc_id for r in dedup.purge_missing(docs, dels).collect()
    }
    assert missing == set(missing_ids)


def test_purge_null_id_entries_are_inert(spark):
    """A NULL id in the deletion list never equi-matches (it cannot
    name a document) and a NULL-id document row is always KEPT — purge
    only removes rows positively named by the list."""
    corpus = spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "orphan")],
        "doc_id long, source string",
    )
    dels = spark.createDataFrame([(1,), (None,)], "doc_id long")
    kept = dedup.purge_docs(corpus, dels, id_col="doc_id").collect()
    assert {r.source for r in kept} == {"b", "orphan"}
    # the NULL list entry SURFACES in the hygiene audit: it names
    # nothing, so it is unmatched garbage the audit must expose
    missing = dedup.purge_missing(corpus, dels).collect()
    assert [r.doc_id for r in missing] == [None]


# --- token Naive Bayes quality classifier (textstats.nb_logodds) -----------


def test_nb_logodds_directionality(spark, docs):
    """Seed-class documents must score HIGHER than the other class —
    the classifier recovers its own training signal (pos seed = 'en'
    docs, whose token distribution differs from the other langs by
    construction of the synthetic corpus)."""
    out = (
        textstats.nb_logodds(
            docs,
            docs.filter(F.col("lang") == "en"),
            docs.filter(F.col("lang") != "en"),
        )
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy(F.col("lang") == "en")
        .agg(F.avg("log_odds").alias("m"), F.avg("pred").alias("acc"))
        .collect()
    )
    by_class = {r[0]: r for r in out}
    # the synthetic corpus draws langs from an overlapping vocabulary,
    # so absolute accuracy is weak by construction — what must hold is
    # the ORDERING: en docs score higher and are predicted positive
    # more often than non-en docs
    assert by_class[True].m > by_class[False].m
    assert by_class[True].acc > by_class[False].acc


def test_nb_logodds_closed_form_and_oov(spark):
    """Tiny corpus, hand-computed: pos seed 'a a', neg seed 'b'; the
    scored doc 'a c' mixes an in-vocab token with an OUT-OF-VOCAB one
    (absent from both seeds) — the OOV token must get the
    pure-smoothing default weight, not drop out."""
    import math

    pos = spark.createDataFrame([(1, "a a")], "doc_id long, text string")
    neg = spark.createDataFrame([(2, "b")], "doc_id long, text string")
    target = spark.createDataFrame(
        [(3, "a c"), (4, "")], "doc_id long, text string"
    )
    rows = textstats.nb_logodds(target, pos, neg, k=0.5).collect()
    # token-less doc 4 is absent (the unigram_logprob contract)
    assert [r.doc_id for r in rows] == [3]
    r = rows[0]
    assert r.n_toks == 2
    # V = |{a, b}| = 2; cp(a) = 2 ('a a' is TWO occurrences), tp = 2,
    # cn(b) = 1, tn = 1; prior = ln(1/1) = 0
    w_a = math.log((2 + 0.5) / (2 + 0.5 * 2)) - math.log(
        (0 + 0.5) / (1 + 0.5 * 2)
    )
    w_oov = math.log(0.5 / (2 + 0.5 * 2)) - math.log(0.5 / (1 + 0.5 * 2))
    assert abs(r.log_odds - (w_a + w_oov)) < 1e-12
    assert r.pred == (1 if w_a + w_oov > 0 else 0)


def test_nb_logodds_empty_seed_raises(spark):
    """An empty seed class degenerates every weight — the in-plan
    guard raises at action time."""
    pos = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    neg = pos.filter(F.lit(False))
    out = textstats.nb_logodds(pos, pos, neg)
    with pytest.raises(Exception, match="seed class is EMPTY"):
        out.collect()


def test_nb_logodds_doc_counts_arg_is_value_identical(spark, docs):
    """Supplying the prior doc counts as a 1-row sufficient-statistics
    relation (the scan-count optimization the catalog entry uses) must
    not change a single value."""
    pos = docs.filter(F.col("lang") == "en")
    neg = docs.filter(F.col("lang") != "en")
    base = textstats.nb_logodds(docs, pos, neg)
    en = (F.col("lang") == "en").cast("long")
    fed = textstats.nb_logodds(
        docs,
        pos,
        neg,
        doc_counts=docs.agg(
            F.sum(en).alias("n_pos"),
            F.sum(F.lit(1) - en).alias("n_neg"),
        ),
    )
    a = sorted(map(tuple, base.collect()))
    b = sorted(map(tuple, fed.collect()))
    assert a == b


def test_nb_logodds_reserved_column_clash_raises(spark):
    """id_col colliding with a reserved working/output column would
    produce ambiguous references or silently shadowed output — raise
    up front (prefix_sum_offsets discipline)."""
    df = spark.createDataFrame([(1, "a")], "pred long, text string")
    with pytest.raises(ValueError, match="reserved"):
        textstats.nb_logodds(df, df, df, id_col="pred")
    # the INTERNAL working columns too (r13 advice: id_col='_sw' used
    # to bypass the guard and die later as an ambiguous-reference
    # AnalysisException at `prior + F.col("_sw")`)
    for col in ("_sw", "_cp", "_cn"):
        bad = spark.createDataFrame([(1, "a")], f"{col} long, text string")
        with pytest.raises(ValueError, match="reserved"):
            textstats.nb_logodds(bad, bad, bad, id_col=col)


# --- token-distribution drift monitor (textstats.token_drift) --------------


def test_token_drift_invariants(spark, docs):
    """JSD axioms on the real corpus: identical slices diverge by
    EXACTLY 0.0 (identical count tables -> identical doubles -> ln(1)),
    every term is non-negative, the smoothed distributions each sum to
    1 over the full bucket domain, and the total is <= ln 2."""
    import math

    en = docs.filter(F.col("lang") == "en")
    rest = docs.filter(F.col("lang") != "en")

    same = textstats.token_drift(en, en, n_buckets=256).agg(
        F.sum("jsd_term"), F.sum("p_a"), F.sum("p_b")
    ).collect()[0]
    assert same[0] == 0.0
    assert abs(same[1] - 1.0) < 1e-9 and abs(same[2] - 1.0) < 1e-9

    diff = textstats.token_drift(en, rest, n_buckets=256).agg(
        F.sum("jsd_term"), F.min("jsd_term"), F.count(F.lit(1))
    ).collect()[0]
    assert 0.0 < diff[0] <= math.log(2.0) + 1e-12
    assert diff[1] >= -1e-15  # every per-bucket term non-negative
    assert diff[2] == 256  # full bucket domain, unseen buckets included


def test_token_drift_detects_disjoint_vocab(spark):
    """A broken extractor (entirely different token stream) must score
    near the ln 2 ceiling — the alert the monitor exists for —
    and far above the same-distribution baseline."""
    import math

    a = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(30)],
        "doc_id long, text string",
    )
    b = spark.createDataFrame(
        [(i, "uno dos tres cuatro cinco seis") for i in range(30)],
        "doc_id long, text string",
    )
    jsd = (
        textstats.token_drift(a, b, n_buckets=64, ngram_n=1)
        .agg(F.sum("jsd_term"))
        .collect()[0][0]
    )
    # smoothing pulls it off the exact ceiling; disjoint vocab must
    # still land in the top decade
    assert jsd > 0.5 * math.log(2.0)


def test_token_drift_guards(spark, docs):
    with pytest.raises(ValueError, match="n_buckets"):
        textstats.token_drift(docs, docs, n_buckets=1)
    with pytest.raises(ValueError, match="ngram_n"):
        textstats.token_drift(docs, docs, ngram_n=0)
    with pytest.raises(ValueError, match="smoothing"):
        textstats.token_drift(docs, docs, smoothing=0.0)
