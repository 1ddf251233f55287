"""Text analysis operators: language-ID, quality scoring, token counts,
winnowing fingerprints.

All pure Catalyst expressions over the ``documents`` table — no UDFs —
so they run inside whole-stage codegen and are reproduced exactly by the
DuckDB oracle. These are the per-document map-side stages of a training
data pipeline: they scale embarrassingly (no shuffle except the final
shapes the caller asks for).

Extension surface (the reference has no text ops); mandated by the build
brief / SURVEY.md §7 step 8.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_search_spark import plans
from vector_search_spark.functions import texts as T

__all__ = [
    "unigram_logprob",
    "bigram_logprob",
    "STOPWORDS",
    "BPE_TOKEN_RE",
    "language_id",
    "quality_score",
    "pii_scrub",
    "pii_total",
    "PII_PATTERNS",
    "source_scorecard",
    "token_counts",
    "hashing_embed",
    "winnow_fingerprints",
    "repetition_stats",
    "chunk_tokens",
    "prefix_sum_offsets",
    "value_cume_dist",
    "mixture_weights",
    "waterfill_budget",
    "dsir_logratio",
    "nb_logodds",
    "gram_buckets",
    "bucket_histogram",
    "drift_from_counts",
    "token_drift",
]

# Tiny per-language stopword lists for the n-gram/stopword-ratio
# language heuristic. Deliberately small and alphabetized: the heuristic
# is the operator; real deployments plug in bigger lists.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("das", "der", "die", "ist", "nicht", "und"),
    "en": ("a", "and", "is", "of", "the", "to"),
    "es": ("de", "el", "es", "la", "los", "y"),
    "fr": ("de", "est", "et", "la", "le", "les"),
}

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def language_id(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stopword-ratio language ID: score = fraction of tokens in each
    language's stopword list; argmax wins, ties broken by language code
    ascending (deterministic). Returns (id, pred_lang, score).

    Shape: explode tokens → one grouped pass with a conditional-sum per
    language. An earlier all-expression version (array filter per lang)
    inlined the tokenizer once per reference — interpreted higher-order
    functions get no codegen CSE, so each inline re-ran the regex split
    over the full text; the exploded groupBy is all codegen and one
    map-side-combinable shuffle.
    """
    langs = sorted(STOPWORDS.items())
    tok = docs.select(
        F.col(id_col), F.explode_outer(T.tokens(text_col)).alias("_tok")
    )
    aggs = [F.count("_tok").alias("_n")] + [
        F.sum(F.when(F.col("_tok").isin(*words), 1).otherwise(0)).alias(
            f"_h{i}"
        )
        for i, (_, words) in enumerate(langs)
    ]
    g = tok.groupBy(id_col).agg(*aggs)
    # argmax with min-lang tie-break: struct compare on (score, inverted
    # lang rank) so equal scores fall to the earliest language code.
    scored = F.array(
        *[
            F.struct(
                (
                    F.col(f"_h{i}") / F.greatest(F.col("_n"), F.lit(1))
                ).alias("score"),
                F.lit(len(langs) - 1 - i).alias("inv"),
                F.lit(lang).alias("lang"),
            )
            for i, (lang, _) in enumerate(langs)
        ]
    )
    best = F.array_max(scored)
    return g.select(
        F.col(id_col),
        best["lang"].alias("pred_lang"),
        best["score"].alias("score"),
    )


def quality_score(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic document-quality features + composite score.

    Features (all map-side scalars): token count, mean token length,
    distinct-token ratio (repetition), stopword ratio (fluency proxy),
    punctuation ratio, digit ratio. Composite: clipped linear blend in
    [0, 1] — the standard shape of C4/Gopher-style quality filters.
    """
    en_sw = STOPWORDS["en"]
    # token-level features via explode + one grouped pass (see
    # language_id for why this beats repeated array expressions)
    tok = docs.select(
        F.col(id_col), F.explode_outer(T.tokens(text_col)).alias("_tok")
    )
    tg = tok.groupBy(id_col).agg(
        F.count("_tok").alias("_n"),
        F.coalesce(F.sum(F.length("_tok")), F.lit(0)).alias("_len"),
        F.count_distinct("_tok").alias("_uniq"),
        F.sum(F.when(F.col("_tok").isin(*en_sw), 1).otherwise(0)).alias(
            "_stop"
        ),
    )
    # char-level features stay a plain projection (codegen'd regexes)
    n_char = F.length(F.col(text_col))
    cg = docs.select(
        F.col(id_col),
        (
            (
                n_char
                - F.length(
                    F.regexp_replace(text_col, "[^A-Za-z0-9\\s]", "")
                )
            )
            / F.greatest(n_char, F.lit(1))
        ).alias("punct_ratio"),
        (
            (n_char - F.length(F.regexp_replace(text_col, "[0-9]", "")))
            / F.greatest(n_char, F.lit(1))
        ).alias("digit_ratio"),
    )
    nn = F.greatest(F.col("_n"), F.lit(1))
    n_tok = F.col("_n").cast("int")
    mean_len = F.col("_len") / nn
    uniq_ratio = F.col("_uniq") / nn
    stop_ratio = F.col("_stop") / nn
    score = (
        F.lit(0.25) * F.least(n_tok / F.lit(64.0), F.lit(1.0))
        + F.lit(0.25) * uniq_ratio
        + F.lit(0.25) * F.least(stop_ratio * 4, F.lit(1.0))
        + F.lit(0.25)
        * (
            F.lit(1.0)
            - F.least(
                F.col("punct_ratio") + F.col("digit_ratio"), F.lit(1.0)
            )
        )
    )
    return tg.join(cg, id_col).select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        mean_len.alias("mean_token_len"),
        uniq_ratio.alias("uniq_ratio"),
        stop_ratio.alias("stopword_ratio"),
        F.col("punct_ratio"),
        F.col("digit_ratio"),
        score.alias("quality"),
    )


# PII detection/redaction patterns: (type, pattern, replacement), in
# REDACTION ORDER. Deliberately the common Java-regex / RE2 subset (no
# lookaround, no backreferences, ASCII \d and \b) so the DuckDB oracle
# replays them byte-identically (sql_pii_count / sql_pii_redact below).
# The four types every production curation pipeline scrubs first
# (C4/Dolma/FineWeb all ship a stage of this shape): emails, IPv4
# addresses, SSN-shaped ids, US-shaped phone numbers. The shapes are
# mutually disjoint on well-formed text (digit-group widths differ),
# so per-type counts on the RAW text equal the placeholders inserted
# by the sequential redaction; under adversarial overlap the earliest
# type in this tuple wins the rewrite (documented, deterministic).
# Deliberately RECALL-over-precision, the scrubbing trade every
# production pipeline makes: the IP shape accepts out-of-range octets
# (999.1.2.3) and the id/phone shapes accept any digits of the right
# widths — over-redacting a non-PII lookalike costs a placeholder
# token; under-redacting real PII ships it into a training run.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("id", r"\b\d{3}-\d{2}-\d{4}\b", "<ID>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
)

# sql_pii_count / sql_pii_redact splice each pattern into single-quoted
# DuckDB string literals without escaping; a pattern containing a
# single quote would silently desync the oracle twin from the Spark
# side (r12 advice). Fail loudly at import time instead.
for _name, _pat, _repl in PII_PATTERNS:
    if "'" in _pat or "'" in _repl:
        raise AssertionError(
            f"PII pattern {_name!r} contains a single quote — it would "
            "break the DuckDB oracle twins (sql_pii_count/sql_pii_redact"
            "); escape via doubled quotes there before allowing this"
        )


def pii_scrub(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII detection + redaction — the standard pre-training scrubbing
    stage (C4 §2.3 / Dolma / FineWeb ship the same shape): per-doc
    match counts by type and the redacted text, entirely as Catalyst
    regexp expressions (one codegen'd projection, no shuffle, no UDF —
    at 100 TB this is a map-only pass that pipelines into whatever
    scan feeds it, filters pushed down untouched).

    Per :data:`PII_PATTERNS`: counts (``n_email``/``n_ip``/``n_id``/
    ``n_phone``, int) are computed independently on the RAW text;
    ``clean_text`` applies the replacements SEQUENTIALLY in tuple
    order (email -> ip -> id -> phone), so an adversarially
    overlapping match is redacted once by the earliest type.

    OUTPUT CONTRACT: the counts are DETECTION counts (matches found in
    the raw text), NOT placeholder counts. On well-formed text the
    shapes are disjoint and sum(counts) == placeholders inserted (the
    conservation property the tests pin); under adversarial overlap
    (e.g. an SSN-shaped substring inside an email local part, which
    \\b allows after '.') a later pattern's raw-text match may already
    be consumed by an earlier redaction, so sum(counts) >= placeholders
    inserted. Consumers needing exact placeholder accounting must count
    placeholders in ``clean_text``, not sum these columns.

    Output: ``docs``'s id column + the four counts + ``clean_text``.
    A NULL text passes through as NULL counts + NULL clean_text (the
    upstream signal — scrubbing never invents an empty document).
    """
    counts = [
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))
        )
        .cast("int")
        .alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    red = F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        red = F.regexp_replace(red, pat, repl)
    return docs.select(
        F.col(id_col), *counts, red.alias("clean_text")
    )


def pii_total(text_col: str = "text") -> Column:
    """Column: total PII matches across :data:`PII_PATTERNS` — the
    filter form for pipelines that DROP (rather than redact)
    PII-dense documents; shares the count expressions with
    :func:`pii_scrub` so filter and scrub can never disagree.

    NULL policy (matches pii_scrub's pass-through): a NULL text yields
    a NULL total, NOT 0 — so a ``pii_total(...) == 0`` filter DROPS
    NULL-text rows (NULL comparison is never true). That is the
    module-wide "NULL is the upstream signal" discipline: a pipeline
    that wants NULL-text docs to survive a PII gate must handle NULLs
    explicitly upstream (corpus_pipeline_funnel's length stage already
    excludes them before its pii_clean stage)."""
    tot = F.lit(0)
    for name, pat, _ in PII_PATTERNS:
        tot = tot + F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))
        )
    return tot.cast("int")


def sql_pii_total(x: str) -> str:
    """DuckDB twin of :func:`pii_total`."""
    return " + ".join(
        sql_pii_count(x, name) for name, _, _ in PII_PATTERNS
    )


def sql_pii_count(x: str, pii_type: str) -> str:
    """DuckDB twin of one :func:`pii_scrub` count column."""
    [pat] = [p for name, p, _ in PII_PATTERNS if name == pii_type]
    return f"CAST(len(regexp_extract_all({x}, '{pat}')) AS INT)"


def sql_pii_redact(x: str) -> str:
    """DuckDB twin of :func:`pii_scrub`'s sequential redaction."""
    expr = x
    for _, pat, repl in PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr


def source_scorecard(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-ingest-source curation scorecard — the triage view a
    training-data team pages through when a crawl feed goes bad:
    one row per source with volume (n_docs), size (avg_chars /
    avg_tokens), language mix (en_share), CORPUS-WIDE duplicate
    attribution (dup_share — the fraction of the source's docs that
    are non-canonical members of an exact-dup group anywhere in the
    corpus, so a feed that re-serves another feed's pages is charged
    for it; :func:`dedup.dup_rate_by_source` only sees within-source
    duplication), and PII incidence (pii_share via
    :func:`pii_total`).

    One corpus scan: a single projection computes every per-doc
    scalar (lengths, lang flag, PII total, canonical md5 — all
    codegen'd), the dup flag comes from a one-long-state
    ``groupBy(_h).agg(min(id))`` joined back on the hash (the same
    canonical form exact_dedup groups on, so scorecard and dedup pass
    agree on what "duplicate" means — and the same aggregate-not-window
    shape, so a corpus-wide boilerplate hash gets map-side partial
    aggregation and an AQE-skew-splittable join, never a single
    mega-partition window task), and one map-side-combinable
    groupBy(source) rolls it up. Output is source-count-sized.

    NULL/empty policy (documented, matches exact_dedup): NULL-text
    docs hash to the sentinel '' (no md5 collision possible) and
    whitespace-only docs share md5('') — each set dedups against
    ITSELF corpus-wide, so all-but-one of a source's empty/NULL docs
    are charged to dup_share as corpus-wide duplicates.
    """
    base = docs.select(
        F.col(group_col),
        F.col(id_col),
        F.length(text_col).cast("double").alias("_chars"),
        F.size(T.tokens(text_col)).cast("double").alias("_toks"),
        (F.col(lang_col) == "en").cast("int").alias("_en"),
        (pii_total(text_col) > 0).cast("int").alias("_pii"),
        F.coalesce(F.md5(T.norm_text(text_col)), F.lit("")).alias("_h"),
    )
    firsts = base.groupBy("_h").agg(F.min(id_col).alias("_first"))
    flagged = base.join(firsts, "_h").select(
        group_col,
        "_chars",
        "_toks",
        "_en",
        "_pii",
        (F.col(id_col) != F.col("_first")).cast("int").alias("_dup"),
    )
    n = F.count(F.lit(1))
    return flagged.groupBy(group_col).agg(
        n.cast("long").alias("n_docs"),
        (F.round(F.avg("_chars"), 4) + F.lit(0.0)).alias("avg_chars"),
        (F.round(F.avg("_toks"), 4) + F.lit(0.0)).alias("avg_tokens"),
        (F.round(F.sum("_en").cast("double") / n, 6) + F.lit(0.0)).alias(
            "en_share"
        ),
        (F.round(F.sum("_dup").cast("double") / n, 6) + F.lit(0.0)).alias(
            "dup_share"
        ),
        (F.round(F.sum("_pii").cast("double") / n, 6) + F.lit(0.0)).alias(
            "pii_share"
        ),
    )


def token_counts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Token accounting per document: whitespace tokens, BPE-ish regex
    tokens, characters. The whole-corpus token total is then one
    map-side-combined sum — the canonical "how many tokens is this
    dataset" pipeline question."""
    return docs.select(
        F.col(id_col),
        F.size(T.tokens(text_col)).alias("ws_tokens"),
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0)
        ).alias("bpe_tokens"),
        F.length(F.col(text_col)).cast("bigint").alias("chars"),
    )


def hashing_embed(
    docs: DataFrame,
    dim: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "vec",
) -> DataFrame:
    """Hashing-trick text embedding (feature hashing / the classic
    HashingVectorizer with a signed hash): every token votes ±1 into
    bucket ``h32(token) % dim``, sign from the next hash bit; the
    per-document vote sums form a fixed-``dim`` dense vector. Pure
    Catalyst — explode, one groupBy, map assembly — no vocabulary, no
    model state, so it streams over any corpus size, and md5-derived
    hashing makes it bit-reproducible in the DuckDB oracle.

    The output (id, vec array<double>) plugs directly into the kNN /
    dedup operators: text → embedding → ANN with no Python in the path.
    Documents with zero tokens produce no row (nothing to hash).
    """
    toks = docs.select(
        F.col(id_col), F.explode(T.tokens(text_col)).alias("token")
    )
    h = T.h32("token")
    vals = (
        toks.select(
            id_col,
            F.pmod(h, F.lit(dim)).cast("int").alias("bucket"),
            F.when(
                F.floor(h / F.lit(dim)).cast("bigint") % 2 == 0, F.lit(1.0)
            )
            .otherwise(F.lit(-1.0))
            .alias("sign"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.sum("sign").alias("v"))
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.element_at(F.col("_m"), i.cast("int")), F.lit(0.0)),
    )
    return (
        vals.groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("bucket", "v"))
            ).alias("_m")
        )
        .select(F.col(id_col), dense.alias(out_col))
    )


def token_trigram_embed(
    tokens: DataFrame,
    dim: int = 16,
    token_col: str = "token",
    out_col: str = "tvec",
    norm_col: str = "tnorm",
) -> DataFrame:
    """Per-TOKEN hashing embedding from character trigrams — the
    token-level twin of :func:`hashing_embed` (fastText's subword
    idea, Bojanowski et al. 2017, §3.2, reduced to the signed hashing
    trick): each char 3-gram of the token votes ±1 into bucket
    ``h32(gram) % dim``; tokens sharing surface trigrams land near
    each other, giving late-interaction retrieval (MaxSim) a
    deterministic, vocabulary-free token embedding both engines can
    replay bit-for-bit. Tokens shorter than 3 chars embed their whole
    surface as the single gram, so every token gets a vector.

    Input: any DataFrame with a ``token_col`` of DISTINCT tokens (the
    vocabulary — dedupe upstream; per-occurrence input inflates the
    gram explode for no value). Output: ``(token_col, out_col
    array<double>, norm_col double)`` — vote sums are exact small
    integers in float64 (order-independent across engines) and
    ``norm_col`` is their L2 norm (0.0 only if every bucket's votes
    cancel; consumers must zero-guard the cosine). Pure Catalyst:
    explode + one groupBy + map assembly, vocabulary-sized end to end.

    DuckDB twin of the gram expansion:
    ``CASE WHEN length(tok) < 3 THEN [tok] ELSE
    list_transform(range(1, length(tok)-1), i -> substr(tok, i, 3))
    END`` (then the hashing_embed bucket/sign/assembly recipe keyed
    on token).
    """
    tcol = F.col(token_col)
    grams = F.when(F.length(tcol) < 3, F.array(tcol)).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(tcol) - 2),
            lambda i: F.substr(tcol, i, F.lit(3)),
        )
    )
    g = tokens.select(tcol, F.explode(grams).alias("_gram"))
    h = T.h32("_gram")
    vals = (
        g.select(
            token_col,
            F.pmod(h, F.lit(dim)).cast("int").alias("bucket"),
            F.when(
                F.floor(h / F.lit(dim)).cast("bigint") % 2 == 0, F.lit(1.0)
            )
            .otherwise(F.lit(-1.0))
            .alias("sign"),
        )
        .groupBy(token_col, "bucket")
        .agg(F.sum("sign").alias("v"))
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("_m"), i.cast("int")), F.lit(0.0)
        ),
    )
    out = (
        vals.groupBy(token_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("bucket", "v"))
            ).alias("_m")
        )
        .select(tcol, dense.alias(out_col))
    )
    norm = F.sqrt(
        F.aggregate(
            F.col(out_col), F.lit(0.0), lambda acc, x: acc + x * x
        )
    )
    return out.withColumn(norm_col, norm)


def repetition_stats(
    docs: DataFrame,
    ngram: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, §A1.1 — the
    public MassiveText quality rules), token-n-gram family: documents
    dominated by repeated content are low-quality training data.

    Per document:
    - ``n_tokens``
    - ``dup_token_frac``   — fraction of token occurrences whose token
      appears more than once
    - ``top_ngram``        — most frequent word ``ngram``-gram (ties:
      lexicographically smallest — deterministic)
    - ``top_ngram_frac``   — its occurrences / total n-gram occurrences
    - ``top_ngram_char_frac`` — chars covered by its occurrences /
      document chars (the Gopher "fraction of characters in the most
      common n-gram" rule)

    Two explode+groupBy passes (tokens, n-grams) joined back to the doc
    spine — all codegen, map-side-combinable shuffles keyed by doc.
    Line/paragraph-based variants degenerate on single-line documents;
    the n-gram family is well-defined for any text.
    """
    spine = docs.select(
        F.col(id_col), F.length(F.col(text_col)).alias("_nchar")
    )
    tok = docs.select(
        F.col(id_col), F.explode_outer(T.tokens(text_col)).alias("_t")
    )
    td = (
        tok.groupBy(id_col, "_t")
        .agg(F.count("_t").alias("c"))
        .groupBy(id_col)
        .agg(
            F.coalesce(F.sum("c"), F.lit(0)).alias("_n"),
            F.coalesce(
                F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)),
                F.lit(0),
            ).alias("_dup"),
        )
    )
    gr_ = docs.select(
        F.col(id_col),
        F.explode(T.shingles(T.tokens(text_col), ngram)).alias("_g"),
    )
    gg = gr_.groupBy(id_col, "_g").agg(F.count(F.lit(1)).alias("c"))
    wtop = Window.partitionBy(id_col).orderBy(F.desc("c"), "_g")
    gtot = gg.groupBy(id_col).agg(F.sum("c").alias("_gn"))
    top = (
        gg.withColumn("_r", F.row_number().over(wtop))
        .filter(F.col("_r") == 1)
        .join(gtot, id_col)
        .select(
            F.col(id_col),
            F.col("_g").alias("top_ngram"),
            F.col("c").alias("_topc"),
            "_gn",
        )
    )
    nn = F.greatest(F.col("_n"), F.lit(1))
    return (
        spine.join(td, id_col, "left")
        .join(top, id_col, "left")
        .select(
            F.col(id_col),
            F.col("_n").cast("bigint").alias("n_tokens"),
            (F.col("_dup") / nn).alias("dup_token_frac"),
            F.coalesce(F.col("top_ngram"), F.lit("")).alias("top_ngram"),
            F.coalesce(
                F.col("_topc") / F.greatest(F.col("_gn"), F.lit(1)),
                F.lit(0.0),
            ).alias("top_ngram_frac"),
            F.coalesce(
                F.col("_topc")
                * F.length(F.col("top_ngram"))
                / F.greatest(F.col("_nchar"), F.lit(1)),
                F.lit(0.0),
            ).alias("top_ngram_char_frac"),
        )
    )


def chunk_tokens(
    docs: DataFrame,
    chunk_size: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-window document chunking — the splitting stage of a
    training / RAG pipeline: whitespace tokens partitioned into
    consecutive windows of ``chunk_size``, each reassembled into a text
    chunk. Returns (id, chunk_id, n_tokens, chunk_text); documents with
    no tokens produce no chunks.

    One explode + one grouped pass keyed by (doc, chunk): the shuffle
    carries each token once, and chunk reassembly sorts WITHIN a group
    (bounded at chunk_size) — no per-document global sort, so skewed
    giant documents cost their own groups only.
    """
    toks = docs.select(
        F.col(id_col),
        F.posexplode(T.tokens(text_col)).alias("pos", "_t"),
    )
    return (
        toks.withColumn(
            "chunk_id", F.floor(F.col("pos") / chunk_size).cast("int")
        )
        .groupBy(id_col, "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "_t"))),
                    lambda s: s["_t"],
                ),
                " ",
            ).alias("chunk_text"),
        )
    )


def winnow_fingerprints(
    docs: DataFrame,
    shingle_n: int = 3,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003):
    hash every n-gram shingle (rolling position), slide a window of
    ``window`` consecutive shingle hashes, keep each window's min, emit
    the distinct mins. Robust to local edits; the standard fingerprint
    for plagiarism/near-dup sketching.

    Shuffle-free except the final distinct: shingling and the windowed
    min are per-document (partitioned window over id, ordered by shingle
    position). Returns (id, fingerprint).

    Standard winnowing guarantees >=1 fingerprint for any document with
    >=1 shingle: documents with fewer than ``window`` shingles emit the
    min over all their shingle hashes (the pos=0 partial window), so
    short documents stay visible to the sketch.
    """
    sh = docs.select(
        F.col(id_col),
        F.posexplode(T.shingles(T.tokens(text_col), shingle_n)).alias(
            "pos", "shingle"
        ),
    ).select(id_col, "pos", T.h64("shingle").alias("h"))
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.currentRow, window - 1)
    )
    cnt = Window.partitionBy(id_col)
    return (
        sh.select(
            F.col(id_col),
            F.col("pos"),
            F.min("h").over(w).alias("fingerprint"),
            F.count(F.lit(1)).over(cnt).alias("_n"),
        )
        .filter(F.col("pos") <= F.greatest(F.col("_n") - window, F.lit(0)))
        .select(id_col, "fingerprint")
        .distinct()
    )


def unigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-relative unigram log-probability score per document — the
    cheap stand-in for the CCNet/Gopher LM-perplexity quality filter:
    documents of rare tokens score low (surprising), documents of
    corpus-typical tokens score high. Zero model state: the "LM" is the
    corpus's own unigram distribution, estimated in the same job.

    Two aggregation passes, both plain shuffles:
    1. token -> count over the corpus (partial-agg'd map-side);
    2. explode tokens, join token probabilities (a shuffle equi-join on
       the token key — vocab-sized, not corpus-sized, and AQE turns it
       into a broadcast when the vocab is small), mean log p per doc.

    Every token is in-corpus by construction, so no smoothing is needed
    (probabilities are never zero).

    Returns ``(id_col, n_toks int, avg_logprob double)``.
    """
    from vector_search_spark.functions import texts as T

    toks = docs.select(
        F.col(id_col), F.explode(T.tokens(text_col)).alias("t")
    )
    vocab = toks.groupBy("t").agg(F.count(F.lit(1)).alias("cnt"))
    # corpus token total = global AGGREGATE of the vocab counts, NOT a
    # global window: an unpartitioned window would materialize the
    # whole (web-scale, ~1e8-row) vocab relation on ONE partition,
    # while a global aggregate is two-level by construction (one
    # partial-sum row per partition -> single-row exchange). The plan
    # stays lazy (no action at call time) and single-pass: both
    # consumers of `vocab` sit over the SAME hashpartitioning(t)
    # exchange, which Spark's ReuseExchange collapses (verified in the
    # executed plan; a crossJoin pushes no join-key filters that would
    # de-canonicalize the subtrees). The total is summed as LONG —
    # exact at any corpus size and partial-sum order (a double sum is
    # only order-exact below 2^53 tokens) — and cast at the division.
    tot = vocab.agg(F.sum("cnt").alias("_tot"))
    probs = vocab.crossJoin(F.broadcast(tot)).select(
        "t",
        (F.col("cnt").cast("double") / F.col("_tot").cast("double")).alias(
            "p"
        ),
    )
    return (
        toks.join(probs, "t")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_toks"),
            F.avg(F.log("p")).alias("avg_logprob"),
        )
    )


def bigram_logprob(
    docs: DataFrame,
    k: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-relative BIGRAM log-probability per document — one rung
    up the LM-quality ladder from :func:`unigram_logprob`: scores
    P(t_i | t_{i-1}) with add-k smoothing over the corpus's own bigram
    counts, so word-salad documents (plausible tokens, implausible
    transitions) score low even when their unigram mix looks fine.

    Smoothing is required here (unlike the unigram case): a document's
    bigram can be corpus-unique, and an unsmoothed estimate degenerates
    to log(1/cnt(a)) noise at the tail —
    P(b|a) = (cnt(a,b) + k) / (cnt(a,·) + k·V), V = unigram vocab.

    Shapes: the bigram relation is one lead() window over (doc, pos);
    counts are two map-side-combinable shuffles (bigram-vocab- and
    vocab-sized, not corpus-sized); the probability join is an
    equi-join on the bigram key that AQE demotes to broadcast for
    small vocabularies. Returns (id_col, n_bigrams int, avg_logprob) —
    single-token documents have no bigram and drop out (the honest
    contract; callers coalesce if they need them).
    """
    from vector_search_spark.functions import texts as T

    toks = docs.select(
        F.col(id_col), F.posexplode(T.tokens(text_col)).alias("pos", "t")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    bg = (
        toks.select(F.col(id_col), "t", F.lead("t").over(w).alias("nxt"))
        .filter(F.col("nxt").isNotNull())
    )
    cnt_ab = bg.groupBy("t", "nxt").agg(F.count(F.lit(1)).alias("c_ab"))
    cnt_a = bg.groupBy("t").agg(F.count(F.lit(1)).alias("c_a"))
    # vocab size V stays INSIDE the plan (advice r6: an eager
    # .distinct().count() here re-tokenized the corpus in a separate
    # job at call time, breaking lazy composition): a 1-row
    # countDistinct aggregate cross-joined (broadcast nested loop of
    # one row) into the bigram-vocab-sized probability relation.
    vsize = toks.agg(F.countDistinct("t").alias("_V"))
    probs = (
        cnt_ab.join(cnt_a, "t")
        .crossJoin(F.broadcast(vsize))
        .select(
            "t",
            "nxt",
            (
                (F.col("c_ab") + F.lit(float(k)))
                / (
                    F.col("c_a")
                    + F.lit(float(k)) * F.col("_V").cast("double")
                )
            ).alias("p"),
        )
    )
    return (
        bg.join(probs, ["t", "nxt"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_bigrams"),
            F.avg(F.log("p")).alias("avg_logprob"),
        )
    )


def prefix_sum_offsets(
    df: DataFrame,
    id_col: str = "doc_id",
    size_col: str = "n_toks",
    out_col: str = "off",
    shard_size: int = 1 << 20,
) -> DataFrame:
    """Distributed EXCLUSIVE prefix sum of ``size_col`` in ``id_col``
    order — the classic two-pass parallel-scan decomposition, never a
    corpus-sized unpartitioned window.

    ``out_col`` for each row = sum of ``size_col`` over all rows with a
    smaller ``id_col`` (0 for the first). This is the token-offset
    kernel behind GPT-style sequence packing: a packing pass runs over
    the WHOLE training corpus, so the naive single window
    (``Window.orderBy(id)`` with no partitionBy) would drag 10^9 rows
    onto one task. Decomposition instead:

    1. shard = id // shard_size (monotone in id, so within-shard order
       + shard order = global order; requires a non-negative NUMERIC
       id — dense ids are ideal but gaps are fine; a NULL id raises
       in-plan rather than silently losing the row from the pack);
    2. within-shard running sums: a window PARTITIONED by shard (each
       task holds <= shard_size rows);
    3. shard totals: a groupBy(shard) that rides the SAME
       hashpartitioning(shard) exchange as the window (no extra
       shuffle; the executed plan shows a ReusedExchange);
    4. cumulative shard bases: one unpartitioned window over the
       SHARD-COUNT-sized aggregate — N/shard_size rows by construction
       (10^9 docs / 2^20 = ~1000 rows), bounded like the model-sized
       relations elsewhere, never the corpus;
    5. broadcast the bases back: off = base + within-shard sum.

    Returns ``df`` + ``out_col`` (bigint). Plan-shape is gated by
    tests/test_plans.py: every unpartitioned Window must sit strictly
    above an Aggregate on every path to a scan.
    """
    if shard_size < 1:
        raise ValueError(f"shard_size must be >= 1, got {shard_size}")
    # Reserved-name clash guard (materialize_mixture precedent): the
    # `select('*', bounded_alias(..., '_shard'))` below would produce a
    # DUPLICATE `_shard` column if the input already carries one, and
    # the F.col('_shard') filter would then die with an
    # ambiguous-reference AnalysisException (while `_inoff`/`_base`
    # would be silently REPLACED by withColumn) — fail loud up front
    # instead of either.
    clash = {"_shard", "_inoff", "_base"}.intersection(df.columns)
    if clash:
        raise ValueError(
            "prefix_sum_offsets: input df already has reserved "
            f"column(s) {sorted(clash)} — rename them first"
        )
    # A NULL id has no position in the global order; silently dropping
    # it would be silent row loss in a PACKING pass (the module's
    # raise-on-silent-divergence discipline, like shuffle_order), so
    # the _shard projection raises in-plan instead. The isNotNull
    # filter stays: its inferred isnotnull(_shard) appears in BOTH
    # window consumers' subtrees (identical subtrees are what lets
    # ReuseExchange collapse them to one tokenize/shuffle pass), and
    # evaluating it is what fires the guard for every row.
    # bounded_alias, not a bare name: the plan gate trusts the
    # provenance marker on the attribute, never the `_shard` name —
    # N/shard_size values by construction.
    src = df.select(
        "*",
        plans.bounded_alias(
            F.when(
                F.col(id_col).isNull(),
                F.raise_error(
                    F.lit(
                        f"prefix_sum_offsets: NULL {id_col!r} — the row "
                        "has no position in the global order"
                    )
                ).cast("long"),
            ).otherwise(F.floor(F.col(id_col) / F.lit(int(shard_size)))),
            "_shard",
        ),
    ).filter(F.col("_shard").isNotNull())
    w_in = (
        Window.partitionBy("_shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = src.withColumn(
        "_inoff",
        F.coalesce(F.sum(size_col).over(w_in), F.lit(0)).cast("long"),
    )
    # Shard total = last row's running sum + its own size; computed off
    # the window OUTPUT so the aggregate's required distribution is
    # already satisfied by the window's hashpartitioning(_shard)
    # exchange — the tokenise/scan subtree executes once (ReusedExchange).
    shard_tot = within.groupBy("_shard").agg(
        F.max(F.col("_inoff") + F.col(size_col)).cast("long").alias("_stot")
    )
    w_sh = Window.orderBy("_shard").rowsBetween(
        Window.unboundedPreceding, -1
    )
    shard_base = shard_tot.withColumn(
        "_base", F.coalesce(F.sum("_stot").over(w_sh), F.lit(0)).cast("long")
    ).select("_shard", "_base")
    return (
        within.join(F.broadcast(shard_base), "_shard")
        .withColumn(out_col, (F.col("_base") + F.col("_inoff")).cast("long"))
        .drop("_shard", "_inoff", "_base")
    )


def assemble_packs(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "t",
    size_col: str = "n_toks",
    ctx: int = 2048,
    shard_size: int = 1 << 20,
    checkpoint: bool = True,
) -> DataFrame:
    """GPT-style pack ASSEMBLY — the step after
    :func:`prefix_sum_offsets`: concatenate the corpus token stream in
    ``id_col`` order, cut every ``ctx`` tokens, and emit one row per
    packed sequence. ``df`` must carry the token array
    (``tokens_col``) and its length (``size_col``); rows with zero
    tokens should be filtered upstream (they own no slots).

    Pipeline: offsets via the two-pass sharded scan (never a
    corpus-sized window), then a token-level ``posexplode`` — the
    assembly's inherent cost: the token stream is materialized exactly
    once — with each token's global position ``off + idx``; pack_id =
    gpos div ctx; one shuffle keyed by pack_id. Every group holds at
    most ``ctx`` rows by construction, so the per-group state
    (including the ordered collect for the fingerprint) is
    model-sized; pack_id is contiguous, so the shuffle is
    range-friendly and skew-free.

    Returns ``(pack_id int, n_toks bigint, n_docs bigint, first_doc,
    last_doc, pack_md5 string)`` — ``pack_md5`` fingerprints the
    pack's tokens in slot order (md5 of the space-joined sequence),
    the cross-engine way to assert two assemblies produced identical
    training data without moving the text twice. The final pack is
    the only one that may hold fewer than ``ctx`` tokens.

    ``checkpoint`` (default True) materializes the tokenized input
    once before the offset pass: the offset computation has two
    window consumers, and because the shard-total side prunes the
    heavy token array their exchanges cannot unify — without the
    boundary the input subtree (scan + tokenize) executes TWICE.
    The checkpoint is the packing job's natural artifact boundary
    (at corpus scale you would persist the tokenized stream to
    parquet and pack from that — same shape, durable storage); pass
    ``checkpoint=False`` when ``df`` is already a materialized
    artifact.
    """
    if ctx < 1:
        raise ValueError(f"ctx must be >= 1, got {ctx}")
    if checkpoint:
        df = df.localCheckpoint()
    ofs = prefix_sum_offsets(
        df, id_col=id_col, size_col=size_col, shard_size=shard_size
    )
    tok = ofs.select(
        F.col(id_col),
        F.col("off"),
        F.posexplode(F.col(tokens_col)).alias("_idx", "_tk"),
    ).select(
        F.col(id_col),
        (F.col("off") + F.col("_idx")).alias("_gpos"),
        F.col("_tk"),
    )
    # Ordered fingerprint: collect_list order is not deterministic in
    # a distributed agg, so sort the (gpos, token) structs — gpos is
    # unique within a pack — before joining (bit-parity discipline,
    # same as ranking.py's ordered contribution folds).
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct(F.col("_gpos"), F.col("_tk")))),
        lambda x: x["_tk"],
    )
    return tok.groupBy(
        F.floor(F.col("_gpos") / F.lit(int(ctx))).cast("int").alias("pack_id")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_toks"),
        F.countDistinct(F.col(id_col)).cast("long").alias("n_docs"),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
        F.md5(F.concat_ws(" ", ordered)).alias("pack_md5"),
    )


def pack_boundaries(
    df: DataFrame,
    id_col: str = "doc_id",
    size_col: str = "n_toks",
    ctx: int = 2048,
    shard_size: int = 1 << 20,
) -> DataFrame:
    """Per-pack DOCUMENT BOUNDARY segments — the metadata a trainer
    needs next to :func:`assemble_packs`: packed sequences concatenate
    unrelated documents, so attention must be masked block-diagonal
    and position ids reset at document starts. Each output row says
    "slots [start_slot, start_slot + n_slots) of pack ``pack_id``
    belong to document ``id_col``" — exactly the segment table a
    collator turns into attention masks / position_ids.

    Pure offset arithmetic on :func:`prefix_sum_offsets` (the text
    never moves): a document at global offset ``off`` with ``n``
    tokens spans packs ``off div ctx .. (off+n-1) div ctx``; one
    bounded explode (n/ctx + 1 rows per doc) and a projection clip
    each intersection. No shuffle beyond the offset pass itself.

    Rows with ``size_col`` <= 0 own no slots and emit no segments
    (the packing-family contract — same as :func:`assemble_packs`'s
    zero-token exclusion, not silent loss). Returns ``(pack_id int,
    id_col, start_slot int, n_slots int)``; per pack the segments
    tile [0, pack length) exactly, and per document they sum to
    ``size_col`` — both invariants are what make the table usable as
    a mask spec, and both are test-gated.
    """
    if ctx < 1:
        raise ValueError(f"ctx must be >= 1, got {ctx}")
    ofs = prefix_sum_offsets(
        df.filter(F.col(size_col) > 0),
        id_col=id_col,
        size_col=size_col,
        shard_size=shard_size,
    )
    first = F.floor(F.col("off") / F.lit(int(ctx))).cast("long")
    last = F.floor(
        (F.col("off") + F.col(size_col) - 1) / F.lit(int(ctx))
    ).cast("long")
    seg = ofs.select(
        id_col,
        F.col("off"),
        F.col(size_col).cast("long").alias("_n"),
        F.explode(F.sequence(first, last)).alias("pack_id"),
    )
    pstart = F.col("pack_id") * F.lit(int(ctx))
    seg_start = F.greatest(F.col("off"), pstart)
    seg_end = F.least(F.col("off") + F.col("_n"), pstart + F.lit(int(ctx)))
    return seg.select(
        F.col("pack_id").cast("int").alias("pack_id"),
        id_col,
        (seg_start - pstart).cast("int").alias("start_slot"),
        (seg_end - seg_start).cast("int").alias("n_slots"),
    )


def value_cume_dist(
    df: DataFrame,
    col: str,
    out_col: str = "cume_dist",
) -> DataFrame:
    """Exact ``cume_dist() OVER (ORDER BY col)`` without a corpus-sized
    unpartitioned window. cume_dist depends on a row only through its
    VALUE (fraction of rows <= value; ties share it), so compute it on
    the distinct-value relation instead of the data:

    1. ``groupBy(col).count()`` — the distinct-VALUE aggregate (token
       counts, star ratings: bounded by the value domain, never the
       corpus);
    2. running-sum window over THAT aggregate for ``rows <= value``,
       plus an unbounded-frame sum for the total — both unpartitioned
       windows sit above the Aggregate (catalog-wide plan gate) and
       share one exchange;
    3. broadcast the value -> cume_dist table back onto the data
       (left join: NULL ``col`` rows pass through with NULL
       ``out_col``, sidestepping the engines' NULLS FIRST/LAST split).

    The exactness trade: valid when the value domain is bounded (ints,
    bucketed floats). For continuous scores the distinct-value relation
    IS the corpus — use approx_percentile cutpoints instead.
    """
    cnts = (
        df.filter(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    w_le = Window.orderBy(col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy(col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cd = cnts.select(
        col,
        (
            F.sum("_c").over(w_le).cast("double")
            / F.sum("_c").over(w_all).cast("double")
        ).alias(out_col),
    )
    return df.join(F.broadcast(cd), on=col, how="left")


def mixture_weights(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    alpha: float = 0.3,
    per_tokens: DataFrame | None = None,
) -> DataFrame:
    """Temperature-scaled sampling weights per corpus group — the
    mixture-construction step of a training-data pipeline (the Pile's
    per-source weights; the alpha-smoothed multilingual sampling of
    XLM-R, alpha typically 0.3): ``weight_g proportional to
    (toks_g / total)**alpha``, normalized to sum to 1. Raising small
    groups and damping dominant ones (alpha < 1) is what keeps a
    100 TB web-dominated corpus from drowning its long tail.

    Shape: by homogeneity ``(toks/total)**a / sum((toks/total)**a)
    == toks**a / sum(toks**a)``, so the normalizer needs NO second
    corpus pass — one scan to the group-count-sized aggregate, a
    second-level single-row aggregate over it, and a broadcast
    crossJoin back (the ``unigram_logprob`` recipe; both consumers of
    the per-group aggregate share its exchange via ReuseExchange).

    Returns ``(group_col, toks bigint, share double, weight double,
    boost double)`` — ``share`` is the natural (size-proportional)
    rate, ``weight`` the smoothed sampling rate, ``boost`` their
    ratio (>1 = up-sampled).

    ``per_tokens``: an already-computed ``(group_col, toks)`` table
    (e.g. :func:`waterfill_budget` output, which carries the SAME
    per-group token sums) to use instead of a fresh corpus pass —
    composing the two mixture operators should tokenize the corpus
    once, not once per operator. When given, ``docs``/``text_col``
    are not read at all.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    # bounded_alias: the operator's documented domain contract — the
    # mixture group key is languages/sources, a bounded domain — goes
    # on the attribute as a provenance marker so downstream global
    # windows (waterfill, the composed pipeline) pass the plan gate on
    # provenance, not on the `_g` name.
    if per_tokens is not None:
        per = per_tokens.select(
            plans.bounded_alias(F.col(group_col), "_g"),
            F.col("toks").cast("long").alias("toks"),
        )
    else:
        per = (
            docs.select(
                plans.bounded_alias(F.col(group_col), "_g"),
                F.size(T.tokens(text_col)).alias("_n"),
            )
            .groupBy("_g")
            .agg(F.sum("_n").cast("long").alias("toks"))
        )
    tot = per.agg(
        F.sum("toks").cast("long").alias("_tot"),
        F.sum(F.pow(F.col("toks").cast("double"), F.lit(float(alpha)))).alias(
            "_z"
        ),
    )
    share = F.col("toks").cast("double") / F.col("_tot").cast("double")
    weight = F.pow(F.col("toks").cast("double"), F.lit(float(alpha))) / F.col(
        "_z"
    )
    return per.crossJoin(F.broadcast(tot)).select(
        F.col("_g").alias(group_col),
        "toks",
        share.alias("share"),
        weight.alias("weight"),
        F.when(F.col("toks") > 0, weight / share)
        .otherwise(F.lit(0.0))
        .alias("boost"),
    )


def waterfill_budget(
    docs: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    epoch_cap: int = 4,
    budget_pct: int = 60,
) -> DataFrame:
    """Epoch-capped token-budget allocation across corpus groups —
    UniMax-style (Chung et al. 2023): each group may contribute at most
    ``epoch_cap`` epochs of its own tokens (``avail = epoch_cap *
    toks``), and a total budget ``C = budget_pct% of sum(avail)`` is
    waterfilled: small groups are taken whole, large ones are clipped
    to a common level t with ``sum(min(avail, t)) == C``.

    The level needs no iteration: process groups in ascending
    ``avail`` order and take ``alloc_i = min(avail_i, running_max_i)``
    where ``running_max_i = max_{k<=i} (C - P_{k-1}) / (L - k + 1)``
    and ``P`` is the ascending prefix sum of ``avail``. While groups
    saturate, the candidate level rises (each saturated group is
    below the running average of what is left); from the first
    unsaturated group on, later candidates only fall (their prefix
    overcounts actual spend), so the running max freezes at the true
    waterline. One window pass, closed form.

    Every window here is over the GROUP-COUNT-sized aggregate (a few
    hundred languages/sources at web scale), never the corpus —
    aggregate-bounded per the catalog-wide plan gate. Budget and
    prefix arithmetic stay integer (exact at any corpus size); the
    level is the only double.

    Returns ``(group_col, toks bigint, avail bigint, alloc double,
    epochs double)`` — ``epochs = alloc / toks``, the realized
    repetition rate (== epoch_cap for fully-taken groups).
    """
    if epoch_cap < 1:
        raise ValueError(f"epoch_cap must be >= 1, got {epoch_cap}")
    if not 1 <= budget_pct <= 100:
        raise ValueError(
            f"budget_pct must be in [1, 100], got {budget_pct}"
        )
    # bounded_alias: provenance marker for the plan gate (see
    # mixture_weights) — the waterfill windows below are global BY
    # DESIGN over this group-count-sized aggregate.
    per = (
        docs.select(
            plans.bounded_alias(F.col(group_col), "_g"),
            F.size(T.tokens(text_col)).alias("_n"),
        )
        .groupBy("_g")
        .agg(F.sum("_n").cast("long").alias("toks"))
        .withColumn(
            "avail", (F.lit(int(epoch_cap)) * F.col("toks")).cast("long")
        )
    )
    tot = per.agg(
        F.count(F.lit(1)).cast("long").alias("_L"),
        F.sum("avail").cast("long").alias("_atot"),
    ).select("_L", F.expr(f"({int(budget_pct)} * _atot) div 100").alias("_C"))
    w_ord = Window.orderBy("avail", "_g")
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lvl = (
        per.crossJoin(F.broadcast(tot))
        .withColumn("_i", F.row_number().over(w_ord).cast("long"))
        .withColumn(
            "_pprev",
            F.coalesce(F.sum("avail").over(w_prev), F.lit(0)).cast("long"),
        )
        .withColumn(
            "_lvl",
            (F.col("_C") - F.col("_pprev")).cast("double")
            / (F.col("_L") - F.col("_i") + F.lit(1)).cast("double"),
        )
        .withColumn("_t", F.max("_lvl").over(w_run))
    )
    alloc = F.least(F.col("avail").cast("double"), F.col("_t"))
    return lvl.select(
        F.col("_g").alias(group_col),
        "toks",
        "avail",
        alloc.alias("alloc"),
        F.when(F.col("toks") > 0, alloc / F.col("toks").cast("double"))
        .otherwise(F.lit(0.0))
        .alias("epochs"),
    )


def dsir_logratio(
    docs: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    ngram_n: int = 2,
    smoothing: float = 1.0,
    stats_fraction: float | None = None,
    stats_seed: str = "dsirstats",
) -> DataFrame:
    """DSIR-style importance weights for data selection (Xie et al.
    2023, "Data Selection for Language Models via Importance
    Resampling"): score every raw-corpus document by how target-like
    its hashed n-gram profile is — ``avg over grams of
    ln p_target(bucket) - ln p_raw(bucket)`` with add-k smoothing —
    then feed the scores to ``sampling.quality_weighted_sample`` (or
    rank-and-take) to select a target-domain-like subset of a web
    crawl. Hashing n-grams into ``n_buckets`` features is what makes
    the estimator model-sized at any corpus size.

    Plan shape: both corpora reduce to bucket-count tables
    (<= n_buckets rows — model-sized); totals are second-level
    single-row aggregates broadcast back (never a second corpus
    pass); the per-bucket log-ratio table full-outer-joins the two
    tiny aggregates and BROADCASTS onto the raw gram stream, so
    scoring is one map-side join + a per-doc aggregate whose shuffle
    carries one partial row per document.

    The raw corpus is read twice (bucket stats, then scoring). At
    selection scale the second full read is the cost of the operator
    — and the paper itself estimates the raw feature distribution on
    a sample — so ``stats_fraction`` makes the cheap path built-in:
    when set (0 < f <= 1), the RAW bucket table is computed on a
    deterministic hash-sample of ``docs`` — keep iff
    ``h32(stats_seed:id) % 1e6 < floor(f * 1e6)``, the module-wide
    threshold discipline of ``sampling.stratified_sample_hash``, so
    the sample (hence every score) is stable under re-partitioning,
    appends, retries, and engine swaps. Scoring still covers EVERY
    raw doc; only the p_raw estimate is sampled (its own total rides
    the sampled table, so normalization stays consistent). The
    TARGET table is never sampled — it is the small side by
    definition. Default ``None`` = exact full-corpus stats,
    bit-identical to round 9.

    Returns ``(id_col, n_grams bigint, dsir_score double)`` — docs
    with fewer than ``ngram_n`` tokens have no grams and are absent
    (no profile, no score).
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    if ngram_n < 1:
        raise ValueError(f"ngram_n must be >= 1, got {ngram_n}")
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    if stats_fraction is not None and not 0.0 < stats_fraction <= 1.0:
        raise ValueError(
            f"stats_fraction must be in (0, 1], got {stats_fraction}"
        )

    def grams(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.explode(T.shingles(T.tokens(text_col), ngram_n)).alias(
                "_gram"
            ),
        ).select(
            id_col, (T.h32(F.col("_gram")) % n_buckets).alias("_bkt")
        )

    raw_grams = grams(docs)
    tgt_cnt = (
        grams(target)
        .groupBy("_bkt")
        .agg(F.count(F.lit(1)).cast("long").alias("_ct"))
    )
    if stats_fraction is None:
        stats_grams = raw_grams
    else:
        from vector_search_spark.operators.sampling import _DENOM

        thr = int(stats_fraction * _DENOM)
        stats_grams = grams(
            docs.filter(
                T.h32(
                    F.concat(
                        F.lit(f"{stats_seed}:"),
                        F.col(id_col).cast("string"),
                    )
                )
                % _DENOM
                < thr
            )
        )
    raw_cnt = stats_grams.groupBy("_bkt").agg(
        F.count(F.lit(1)).cast("long").alias("_cr")
    )
    tt = tgt_cnt.agg(
        F.coalesce(F.sum("_ct"), F.lit(0)).cast("long").alias("_tt")
    )
    rt = raw_cnt.agg(
        F.coalesce(F.sum("_cr"), F.lit(0)).cast("long").alias("_tr")
    )
    s = float(smoothing)
    sb = s * n_buckets
    lw = F.log(
        (F.coalesce(F.col("_ct"), F.lit(0)) + F.lit(s))
        / (F.col("_tt") + F.lit(sb))
    ) - F.log(
        (F.coalesce(F.col("_cr"), F.lit(0)) + F.lit(s))
        / (F.col("_tr") + F.lit(sb))
    )
    lr = (
        tgt_cnt.join(raw_cnt, "_bkt", "full_outer")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(rt))
        .select("_bkt", lw.alias("_lw"))
    )
    # With SAMPLED stats a gram can hit a bucket unseen by BOTH count
    # tables; an inner join would silently drop it from its doc's
    # score (a doc could even vanish). LEFT join + the pure-smoothing
    # default — exactly the lw formula at ct = cr = 0 — keeps every
    # gram scored; on the exact-stats path every raw bucket is seen,
    # so the default never fires and values are unchanged. The totals
    # ride the same 1-row broadcasts lr already consumes.
    default_lw = F.log(
        F.lit(s) / (F.col("_tt") + F.lit(sb))
    ) - F.log(F.lit(s) / (F.col("_tr") + F.lit(sb)))
    return (
        raw_grams.join(F.broadcast(lr), "_bkt", "left")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(rt))
        .withColumn("_lw", F.coalesce(F.col("_lw"), default_lw))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.avg("_lw").alias("dsir_score"),
        )
    )


def nb_logodds(
    docs: DataFrame,
    pos: DataFrame,
    neg: DataFrame,
    k: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    doc_counts: DataFrame | None = None,
) -> DataFrame:
    """Token Naive Bayes quality classifier — the CCNet / GPT-3
    curation stage the heuristic->LM->DSIR quality ladder tops out at:
    train per-class token counts on two labeled SEED corpora
    (``pos`` = looks-like-quality, ``neg`` = looks-like-crawl), then
    score EVERY document in ``docs`` with the smoothed log-odds

        log P(pos | d) - log P(neg | d)
          = log(n_pos / n_neg)                         (doc-count prior)
          + sum over token occurrences t in d of
              log((c_pos(t) + k) / (tot_pos + k*V))
            - log((c_neg(t) + k) / (tot_neg + k*V))

    with add-k smoothing over V = the union seed vocabulary. Zero
    model state: the "classifier" is two vocab-sized count tables
    built in the same plan (GPT-3 trained logistic regression on
    WebText-vs-crawl; NB over the same features is the aggregation-
    only equivalent, exactly replayable in SQL).

    Plan shape: each seed reduces to a vocab-sized count table
    (map-side-combinable); V, the two token totals, and the two doc
    counts are 1-row second-level aggregates broadcast back (never a
    second seed pass); the per-token weight table full-outer-joins the
    two counts and equi-joins onto the corpus token stream WITHOUT a
    broadcast hint — the weight table is vocab-sized, UNBOUNDED at web
    scale (dsir_logratio's table is bounded by n_buckets, so IT may
    hint; this one lets AQE demote to broadcast exactly when the vocab
    is actually small, the unigram_logprob precedent) — so scoring is
    one token-keyed equi-join + one per-doc aggregate. Tokens
    outside BOTH seeds get the pure-smoothing default weight
    (c_pos = c_neg = 0 in the formula) via LEFT join + coalesce — an
    inner join would silently drop them from their doc's evidence.

    Guards: an EMPTY seed class makes every weight degenerate, so the
    prior raises in-plan (``raise_error``) when either doc count is 0
    — same discipline as the module's other in-plan guards.
    ``doc_counts`` optionally supplies the two prior doc counts as a
    1-row (n_pos, n_neg) relation — the dsir ``per_tokens`` /
    mixture-weights sufficient-statistics pattern: when pos/neg are
    filters of one corpus, a single conditional aggregate replaces two
    count scans.

    Returns ``(id_col, n_toks int, log_odds double, pred int)`` with
    ``pred = 1`` iff the log-odds favor ``pos``. Token-less documents
    (empty or NULL text) carry no evidence and are ABSENT — the
    :func:`unigram_logprob` contract; callers coalesce if they need
    them.
    """
    if k <= 0:
        raise ValueError(f"smoothing k must be > 0, got {k}")
    # _sw/_cp/_cn are internal WORKING columns (per-doc weight sum,
    # per-class token counts): a colliding id_col bypasses this
    # friendly raise and dies later as an ambiguous-reference
    # AnalysisException when e.g. `prior + F.col("_sw")` resolves
    # against the duplicate grouping column (r13 advice).
    reserved = {"_t", "_w", "_sw", "_cp", "_cn", "n_toks", "log_odds", "pred"}
    if id_col in reserved or text_col in reserved:
        raise ValueError(
            f"nb_logodds: id_col/text_col may not collide with the "
            f"reserved working/output columns {sorted(reserved)} "
            f"(got id_col={id_col!r}, text_col={text_col!r}) — the "
            "prefix_sum_offsets reserved-name discipline"
        )

    def toks(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col), F.explode(T.tokens(text_col)).alias("_t")
        )

    cp = toks(pos).groupBy("_t").agg(
        F.count(F.lit(1)).cast("long").alias("_cp")
    )
    cn = toks(neg).groupBy("_t").agg(
        F.count(F.lit(1)).cast("long").alias("_cn")
    )
    base = cp.join(cn, "_t", "full_outer").select(
        "_t",
        F.coalesce("_cp", F.lit(0)).alias("_cp"),
        F.coalesce("_cn", F.lit(0)).alias("_cn"),
    )
    # V + the two token totals in ONE 1-row aggregate broadcast back —
    # the union vocab size is exactly base's row count (full outer
    # join on the token key), so no third tokenize pass is needed, and
    # merging the aggregates leaves base exactly TWO consumers (this
    # and wtab) over the same subtree for ReuseExchange to collapse
    vstats = base.agg(
        F.count(F.lit(1)).cast("long").alias("_V"),
        F.sum("_cp").cast("long").alias("_tp"),
        F.sum("_cn").cast("long").alias("_tn"),
    )
    if doc_counts is None:
        npos = pos.agg(F.count(F.lit(1)).cast("long").alias("_np"))
        nneg = neg.agg(F.count(F.lit(1)).cast("long").alias("_nn"))
        priors = npos.crossJoin(nneg)
    else:
        # caller-supplied sufficient statistics (the dsir per_tokens /
        # mixture_weights pattern): a 1-row (n_pos, n_neg) relation —
        # when pos/neg are filters of ONE corpus this halves the
        # prior's scan count (one conditional aggregate, not two)
        priors = doc_counts.select(
            F.col("n_pos").cast("long").alias("_np"),
            F.col("n_neg").cast("long").alias("_nn"),
        )
    kk = float(k)

    def lw(c: Column, tot: Column) -> Column:
        return F.log(
            (c + F.lit(kk))
            / (tot.cast("double") + F.lit(kk) * F.col("_V").cast("double"))
        )

    wtab = (
        base.crossJoin(F.broadcast(vstats))
        .select(
            "_t",
            (lw(F.col("_cp"), F.col("_tp")) - lw(F.col("_cn"), F.col("_tn")))
            .alias("_w"),
        )
    )
    # out-of-vocabulary default = the weight formula at cp = cn = 0
    default_w = lw(F.lit(0), F.col("_tp")) - lw(F.lit(0), F.col("_tn"))
    prior = F.when(
        (F.col("_np") == 0) | (F.col("_nn") == 0),
        F.raise_error(
            F.lit(
                "nb_logodds: a seed class is EMPTY -- the prior and "
                "every token weight are degenerate; fix the seed "
                "selection upstream"
            )
        ).cast("double"),
    ).otherwise(
        F.log(F.col("_np").cast("double") / F.col("_nn").cast("double"))
    )
    # NO broadcast hint on wtab: unlike dsir_logratio's bucket table
    # (bounded by n_buckets), the NB weight table is VOCAB-sized —
    # unbounded at web scale (~1e8 tokens). The unigram_logprob
    # precedent applies: a plain equi-join on the token key, which AQE
    # demotes to broadcast exactly when the vocab is actually small.
    evidence = (
        toks(docs)
        .join(wtab, "_t", "left")
        .crossJoin(F.broadcast(vstats))
        .withColumn("_w", F.coalesce(F.col("_w"), default_w))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_toks"),
            F.sum("_w").alias("_sw"),
        )
    )
    # the prior (and its empty-seed guard) joins AFTER the per-doc
    # aggregate: one 1-row broadcast onto a doc-count-sized relation
    return (
        evidence.crossJoin(F.broadcast(priors))
        .select(
            id_col,
            "n_toks",
            (prior + F.col("_sw")).alias("log_odds"),
        )
        .select(
            id_col,
            "n_toks",
            "log_odds",
            (F.col("log_odds") > 0).cast("int").alias("pred"),
        )
    )


def gram_buckets(
    df: DataFrame,
    n_buckets: int = 1024,
    ngram_n: int = 2,
    text_col: str = "text",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One row per hashed n-gram occurrence: ``(_bkt long)`` plus any
    ``carry_cols`` passed through (an event-time column, a source
    label). This is the ONE drift featurization kernel (r14 — the
    cell_arrival_counts "same routing kernel" discipline): batch
    :func:`token_drift` and the streaming windowed monitor
    (``streaming/drift.py``) both aggregate exactly this projection,
    so their histograms can never hash-drift apart."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    if ngram_n < 1:
        raise ValueError(f"ngram_n must be >= 1, got {ngram_n}")
    cols = [F.col(c) for c in carry_cols]
    # NOTE (r17 optimization round): fanout_small was measured here and
    # REVERTED — one md5 per gram is not dense enough to repay the
    # exchange at bench scale (token_drift 1.65s -> 2.35s with it); the
    # 12-md5-per-shingle MinHash family keeps it (operators/dedup.py).
    return df.select(
        *cols,
        F.explode(T.shingles(T.tokens(text_col), ngram_n)).alias("_gram"),
    ).select(*cols, (T.h32(F.col("_gram")) % n_buckets).alias("_bkt"))


def bucket_histogram(
    df: DataFrame,
    out: str = "c",
    n_buckets: int = 1024,
    ngram_n: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Hashed n-gram bucket histogram ``(_bkt, out)`` — the model-sized
    (<= n_buckets rows) reduction of a corpus that every drift
    comparison consumes; map-side combinable. Also the PERSISTED shape:
    ``streaming/drift.write_token_ref`` parquets exactly this table as
    the reference artifact a production ingest gate checks snapshots
    against."""
    return (
        gram_buckets(df, n_buckets, ngram_n, text_col)
        .groupBy("_bkt")
        .agg(F.count(F.lit(1)).cast("long").alias(out))
    )


def drift_from_counts(
    spark,
    ca: DataFrame,
    cb: DataFrame,
    n_buckets: int,
    smoothing: float = 1.0,
) -> DataFrame:
    """Jensen-Shannon drift table from two bucket-count relations
    ``ca = (_bkt, c_a)`` and ``cb = (_bkt, c_b)`` — :func:`token_drift`
    with the histograms already in hand (how the streaming monitor
    calls it: c_a from the live window, c_b from the persisted
    reference artifact). Same output contract as token_drift; see its
    docstring for the math and the plan shape. Everything here is
    model-sized — both inputs are <= n_buckets rows."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    if smoothing <= 0:
        raise ValueError(f"smoothing must be > 0, got {smoothing}")
    ta = ca.agg(F.coalesce(F.sum("c_a"), F.lit(0)).alias("_ta"))
    tb = cb.agg(F.coalesce(F.sum("c_b"), F.lit(0)).alias("_tb"))
    spine = spark.range(n_buckets).select(F.col("id").alias("_bkt"))
    k = float(smoothing)
    kb = k * n_buckets
    p = (F.coalesce(F.col("c_a"), F.lit(0)) + F.lit(k)) / (
        F.col("_ta").cast("double") + F.lit(kb)
    )
    q = (F.coalesce(F.col("c_b"), F.lit(0)) + F.lit(k)) / (
        F.col("_tb").cast("double") + F.lit(kb)
    )
    m = (p + q) / F.lit(2.0)
    return (
        spine.join(F.broadcast(ca), "_bkt", "left")
        .join(F.broadcast(cb), "_bkt", "left")
        .crossJoin(F.broadcast(ta))
        .crossJoin(F.broadcast(tb))
        .select(
            F.col("_bkt").alias("bkt"),
            F.coalesce(F.col("c_a"), F.lit(0)).alias("c_a"),
            F.coalesce(F.col("c_b"), F.lit(0)).alias("c_b"),
            p.alias("p_a"),
            q.alias("p_b"),
            (
                F.lit(0.5) * p * F.log(p / m)
                + F.lit(0.5) * q * F.log(q / m)
            ).alias("jsd_term"),
        )
    )


def token_drift(
    a: DataFrame,
    b: DataFrame,
    n_buckets: int = 1024,
    ngram_n: int = 2,
    smoothing: float = 1.0,
    text_col: str = "text",
) -> DataFrame:
    """Token-distribution drift between two corpora — the ingest
    monitor a production pipeline runs on every crawl snapshot /
    source batch BEFORE the expensive curation stages: a broken
    extractor, an encoding regression, or a source going spammy shows
    up as distribution drift long before any downstream metric moves.

    Both corpora reduce to hashed n-gram bucket histograms (the
    :func:`dsir_logratio` featurization — model-sized at any corpus
    scale), smoothed to probabilities over the FULL bucket domain, and
    compared per bucket with the Jensen-Shannon decomposition:

        p = (c_a + k) / (tot_a + k·B),  q = (c_b + k) / (tot_b + k·B)
        m = (p + q) / 2
        jsd_term = 0.5·p·ln(p/m) + 0.5·q·ln(q/m)

    ``sum(jsd_term)`` over all B buckets is the Jensen-Shannon
    divergence (0 = identical, ln 2 = disjoint) — symmetric and
    finite-by-construction, which is why it (not raw KL) is the
    monitoring convention; the per-bucket terms localize WHICH part of
    the token space moved, the actionable half of the alert.

    Plan shape: two corpus-sized gram aggregations (map-side
    combinable) reduce to bucket tables; totals are 1-row aggregates
    broadcast back; the bucket-domain spine (``spark.range(B)`` —
    bounded, model-sized) LEFT-joins both tables so unseen buckets
    contribute their smoothed mass exactly like seen ones. Nothing
    row-scale ever shuffles after the two counts.

    Returns one row per bucket in the full domain:
    ``(bkt long, c_a, c_b bigint, p_a, p_b, jsd_term double)``.
    Callers aggregate for the scalar alert or rank for the top-movers
    report.
    """
    # guards live in the pieces (gram_buckets / drift_from_counts) —
    # composition only here, so batch and streaming stay one kernel
    ca = bucket_histogram(a, "c_a", n_buckets, ngram_n, text_col)
    cb = bucket_histogram(b, "c_b", n_buckets, ngram_n, text_col)
    return drift_from_counts(a.sparkSession, ca, cb, n_buckets, smoothing)
