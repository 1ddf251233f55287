"""Deterministic sampling / splitting operators (training-pipeline
staples; extension surface — the reference has no sampling ops).

All sampling here is HASH-derived, never RNG (`sample()`): a hash
sample is stable under re-partitioning, appends, retries, and engine
swaps, which is what makes eval sets and ablation subsets reproducible.
Everything is a map-side filter — no shuffle at any size — and
md5-based so the DuckDB oracle replays it bit-for-bit.

The id-uniform variants (simple sample, train/val/test split) live as
catalog queries in queries_text.py; this module holds the per-stratum
form a corpus-rebalancing pipeline needs (e.g. downsample dominant
languages/sources to a target mix).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_search_spark.functions import texts as T

__all__ = [
    "stratified_sample_hash",
    "quality_weighted_sample",
    "materialize_mixture",
    "shuffle_order",
]

# Rate resolution: rates are applied as integer thresholds out of 1e6,
# so the smallest expressible rate step is 1e-6 (and the oracle's
# integer arithmetic matches exactly — no float comparison at the row).
_DENOM = 1_000_000


def stratified_sample_hash(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    id_col: str = "doc_id",
    seed: str = "strat",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff
    ``h32(seed:id) % 1e6 < floor(rate[stratum] * 1e6)``.

    ``rates`` maps stratum value -> keep-rate in [0, 1]; strata absent
    from the map fall back to ``default_rate``. The per-row uniform
    draw depends only on (seed, id) — NOT the stratum — so changing one
    stratum's rate never reshuffles which rows survive in another, and
    raising a rate strictly grows that stratum's sample (nested
    samples, the property quota tuning needs).

    Plan shape: broadcast-free map-side filter (the rate map is a
    literal CASE/map expression), pushed into the scan where the source
    allows. At 100 TB this is one streaming pass with no state.
    """
    for k, v in rates.items():
        if not (0.0 <= v <= 1.0):
            raise ValueError(f"rate for {k!r} must be in [0,1], got {v}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0,1], got {default_rate}")
    pairs: list[Column] = []
    for k, v in sorted(rates.items()):
        pairs += [F.lit(k), F.lit(int(v * _DENOM))]
    threshold = F.coalesce(
        F.create_map(*pairs)[F.col(stratum_col)],
        F.lit(int(default_rate * _DENOM)),
    )
    u = T.h32(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    return df.filter(u % _DENOM < threshold)


def quality_weighted_sample(
    df: DataFrame,
    weight: Column,
    base_rate: float,
    id_col: str = "doc_id",
    seed: str = "qw",
) -> DataFrame:
    """Quality-weighted deterministic sampling: keep a row iff
    ``h32(seed:id) % 1e6 < floor(clamp(base_rate * weight, 0, 1) * 1e6)``.

    The corpus-mixing primitive (quality-weighted upsampling is how
    LLM data recipes skew toward high-quality documents while keeping
    the pipeline reproducible): a per-row keep-probability proportional
    to any quality score already computed relationally, applied as a
    hash threshold so the decision is stable under re-partitioning,
    appends, retries, and engine swaps — never ``sample()``'s RNG.
    The per-row uniform draw depends only on (seed, id), so raising
    ``base_rate`` (or a row's weight) strictly grows the sample —
    nested samples, the property mixture tuning needs.

    Plan shape: one map-side filter, no shuffle, no state at any size.
    """
    if base_rate < 0.0:
        raise ValueError(f"base_rate must be >= 0, got {base_rate}")
    # NULL weight would propagate to a NULL threshold and silently
    # DROP the row from the sample — for an auditable corpus-mixing
    # primitive that's a correctness trap, so it fails fast instead
    # (coalesce an explicit default upstream if that's the policy).
    w_checked = F.when(
        weight.isNull(),
        F.raise_error(
            F.lit(
                "quality_weighted_sample: NULL weight — coalesce an "
                "explicit default in the weight expression"
            )
        ),
    ).otherwise(weight)
    p = F.least(
        F.greatest(F.lit(base_rate) * w_checked, F.lit(0.0)), F.lit(1.0)
    )
    threshold = F.floor(p * _DENOM).cast("long")
    u = T.h32(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    return df.filter(u % _DENOM < threshold)


def materialize_mixture(
    df: DataFrame,
    epochs_df: DataFrame,
    group_col: str = "lang",
    epochs_col: str = "epochs",
    id_col: str = "doc_id",
    seed: str = "mix",
    max_epochs: float = 1000.0,
) -> DataFrame:
    """Materialize an epoch allocation into the resampled corpus: each
    row of group g appears ``floor(epochs_g)`` times, plus one more iff
    ``h32(seed:id) % 1e6 < floor(frac(epochs_g) * 1e6)`` — so a group
    allocated 2.3 epochs contributes every row twice and a
    deterministic 30% of rows a third time, realizing the target token
    budget in expectation per group (exactly, for the integer part).
    This is the step that turns ``textstats.waterfill_budget`` /
    ``mixture_weights`` tables into an actual training corpus.

    The copies are distinguished by a ``rep`` column (1..copies) so
    downstream shuffling/packing can separate them; the fractional
    draw reuses the module's hash-threshold discipline (stable under
    re-partitioning, appends, retries, engine swaps — never RNG), and
    depends only on (seed, id), so nudging a group's allocation up
    strictly grows which of its rows gain the extra copy.

    Plan shape: the allocation is group-count-sized -> broadcast
    inner join (groups absent from ``epochs_df`` are EXCLUDED — an
    allocation of zero rows is an allocation of zero), then a per-row
    ``sequence`` explode bounded by ``max_epochs`` — no shuffle at any
    size. Silent divergence from the allocation is the trap, so every
    hole raises at action time: NULL/negative/``> max_epochs`` epochs
    (a fat-finger 1e9 would explode every row a billion times),
    DUPLICATE group keys in ``epochs_df`` (the inner join would fan
    out identical (id, rep) rows — checked in the allocation-side
    projection BELOW the join, so it fires even for a duplicated
    group that matches no data rows), and NULL
    ``group_col``/``id_col`` on the data side (a NULL group can never
    match its allocation; a NULL id silently loses its fractional
    draw). ``sequence`` is guarded to the empty array when
    copies == 0 — Spark's sequence(1, 0) counts DOWN.

    Output = the input columns plus ``rep`` (int) — nothing internal
    leaks; ``df`` must not already carry a ``rep`` column (or the
    internal ``_g``/``_e``/``_dup``), which would otherwise be
    silently overwritten / ambiguous — that raises up front.
    """
    if max_epochs <= 0:
        raise ValueError(f"max_epochs must be > 0, got {max_epochs}")
    clash = {"_g", "_e", "_dup", "rep"}.intersection(df.columns)
    if clash:
        raise ValueError(
            "materialize_mixture: input df already has reserved "
            f"column(s) {sorted(clash)} — rename them first"
        )
    from pyspark.sql import Window

    ep = epochs_df.select(
        F.col(group_col).alias("_g"), F.col(epochs_col).alias("_e")
    ).withColumn(
        "_dup", F.count(F.lit(1)).over(Window.partitionBy("_g"))
    )
    checked = F.when(
        F.col("_dup") > 1,
        F.raise_error(
            F.concat(
                F.lit("materialize_mixture: duplicate allocation rows "
                      "for group "),
                F.col("_g").cast("string"),
            )
        ).cast("double"),
    ).when(
        F.col("_e").isNull()
        | (F.col("_e") < 0)
        | (F.col("_e") > F.lit(float(max_epochs))),
        F.raise_error(
            F.concat(
                F.lit(
                    "materialize_mixture: epochs must be in "
                    f"[0, {max_epochs}], got "
                ),
                F.coalesce(F.col("_e").cast("string"), F.lit("NULL")),
            )
        ).cast("double"),
    ).otherwise(F.col("_e"))
    # Fold the guards into the allocation projection so building the
    # broadcast table evaluates them for EVERY allocation row — a
    # duplicate/out-of-range allocation raises even when its group
    # matches no data rows (a post-join guard would stay silent until
    # data for the group appeared).
    ep = ep.select("_g", checked.alias("_e"))
    # NULL-hole guard rides the JOIN KEY so it fires for every data
    # row (a guard on the joined side would never see the NULL-group
    # rows the join drops).
    df = df.withColumn(
        group_col,
        F.when(
            F.col(group_col).isNull() | F.col(id_col).isNull(),
            F.raise_error(
                F.lit(
                    f"materialize_mixture: NULL {group_col!r}/"
                    f"{id_col!r} — the row would silently diverge "
                    "from the allocation"
                )
            ).cast(df.schema[group_col].dataType),
        ).otherwise(F.col(group_col)),
    )
    e = F.col("_e")
    n_full = F.floor(e).cast("long")
    frac_thresh = F.floor((e - F.floor(e)) * _DENOM).cast("long")
    u = T.h32(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    copies = n_full + F.when(u % _DENOM < frac_thresh, 1).otherwise(0)
    reps = F.when(
        copies >= 1, F.sequence(F.lit(1).cast("long"), copies)
    ).otherwise(F.array().cast("array<long>"))
    return (
        df.join(F.broadcast(ep), df[group_col] == F.col("_g"))
        .withColumn("rep", F.explode(reps))
        .withColumn("rep", F.col("rep").cast("int"))
        .drop("_g", "_e")
    )


def shuffle_order(
    df: DataFrame,
    n_shards: int,
    id_cols: tuple[str, ...] = ("doc_id",),
    seed: str = "ord",
) -> DataFrame:
    """Deterministic global training order: shard + within-shard
    position, derived from a hash so the 'shuffle' is reproducible
    bit-for-bit under re-partitioning, retries, and engine swaps —
    the step after mixture materialization that fixes the order
    examples are consumed in (and which shard file each lands in).

    ``u = h32(seed:id...)`` gives every row a pseudo-random rank;
    ``shard = u % n_shards`` spreads rows uniformly; ``pos`` is the
    row's rank within its shard (ordered by u, ties broken by the id
    columns — h32 is 32-bit, collisions are expected at corpus size
    and must break the same way in every engine). Reading shards in
    any interleaving yields a uniformly shuffled corpus; a different
    ``seed`` is a fresh shuffle.

    Plan shape: one map-side hash projection, then a row_number window
    PARTITIONED by shard — per-task sort of N/n_shards rows, so
    ``n_shards`` is the scale knob (pick >= corpus/10^7: 10^9 docs at
    1024 shards sorts ~10^6-row partitions, never the corpus). NULL
    id components raise in-plan (concat_ws would silently skip them,
    silently aliasing distinct keys). The output adds ``shard`` +
    ``pos`` (and ``_u`` internally); an input already carrying any of
    those names would be silently overwritten by ``withColumn``, so
    that raises up front instead."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if not id_cols:
        raise ValueError("id_cols must name at least one column")
    clash = {"_u", "shard", "pos"}.intersection(df.columns)
    if clash:
        raise ValueError(
            "shuffle_order: input df already has reserved column(s) "
            f"{sorted(clash)} — rename them first"
        )
    null_any = None
    for c in id_cols:
        cond = F.col(c).isNull()
        null_any = cond if null_any is None else (null_any | cond)
    key = F.when(
        null_any,
        F.raise_error(
            F.lit(
                f"shuffle_order: NULL in id_cols {tuple(id_cols)} — "
                "distinct keys would alias"
            )
        ),
    ).otherwise(
        F.concat_ws(
            ":", F.lit(seed), *[F.col(c).cast("string") for c in id_cols]
        )
    )
    u = T.h32(key)
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy("_u", *id_cols)
    return (
        df.withColumn("_u", u)
        .withColumn("shard", (F.col("_u") % F.lit(int(n_shards))).cast("int"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("_u")
    )
