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

__all__ = ["stratified_sample_hash", "quality_weighted_sample"]

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
