"""As-of (backward) join — the temporal operator Spark lacks natively.

Implemented as the *merge* shape, not a range join: union both sides
tagged, sort within each key by (ts, side, id), and carry the latest
right-side row forward with ``last(..., ignorenulls=True)``. Cost is
one shuffle on the key + a sort — identical to a sort-merge join — and
never materializes the |left| × |right-history| pair space that the
naive ``l.ts >= r.ts`` theta-join explodes into. This is the plan you
want at 100 TB: per-key skew is the only risk (AQE handles moderate
skew; extreme hot keys want a ts-bucketed pre-aggregation of the right
side first).

Semantics (tie rules are part of the contract, oracle-replicated):
for each left row, the right row with the greatest ``ts <= left.ts``;
among equal ``ts``, the greatest right id wins. Left rows with no prior
right row keep NULL matched columns (left-outer as-of).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join_backward"]


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_id: str,
    right_cols: list[str],
) -> DataFrame:
    """For each left row, attach the most recent right row at-or-before
    its timestamp (per ``key``). Matched columns come back prefixed
    ``asof_``; all left columns pass through."""
    payload = F.struct(
        F.col(right_ts).alias("_ts"),
        F.col(right_id).alias("_id"),
        *[F.col(c) for c in right_cols],
    )
    # A right row with NULL ts can never satisfy ts <= left.ts, but
    # ascending-nulls-first ordering would sort it ahead of everything
    # and forward-fill its payload into rows with no genuine
    # predecessor — drop such rows up front (advice-prevention, r7).
    r = right.filter(F.col(right_ts).isNotNull()).select(
        F.col(key),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(right_id).alias("_ord"),
        payload.alias("_r"),
    )
    l = left.select(
        F.col(key),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_ord"].dataType).alias("_ord"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    )
    r = r.withColumn("_l", F.lit(None).cast(l.schema["_l"].dataType))

    # Right rows sort before left at equal ts (inclusive <=); among
    # right ties the greatest id is last, hence the one carried forward.
    w = (
        Window.partitionBy(key)
        .orderBy("_t", "_side", F.coalesce("_ord", F.lit(-1)))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l.unionByName(r.select(*l.columns)).withColumn(
        "_match", F.last("_r", ignorenulls=True).over(w)
    )
    out = filled.filter(F.col("_side") == 1).select(
        *[F.col("_l")[c].alias(c) for c in left.columns],
        F.col("_match._ts").alias("asof_ts"),
        F.col("_match._id").alias("asof_id"),
        *[F.col("_match")[c].alias(f"asof_{c}") for c in right_cols],
    )
    return out
