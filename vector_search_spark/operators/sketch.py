"""Count-min sketch over a key column (Cormode & Muthukrishnan 2005).

The streaming/mergeable complement to exact `groupBy(key).count()`:
one pass, fixed `depth x width` memory, partial sketches from any
number of partitions/corpora/days merge by cell-wise addition, and the
point estimate ``min_i cnt[i][bucket_i(key)]`` NEVER under-counts
(one-sided error <= eps*N with prob 1-delta for width=e/eps,
depth=ln(1/delta)).

Spark-first shape: the sketch IS a DataFrame ``(row, bucket, cnt)`` of
depth*width cells. Build = explode each key into its `depth`
(row, bucket) cells and `groupBy(row, bucket).count()` — map-side
partial aggregation collapses each executor's stream to at most
depth*width rows before the shuffle, so the shuffle is sketch-sized,
not data-sized (the same reason the sketch works at 100 TB). Lookup =
broadcast-join probe keys against the sketch cells + `min` over rows.

Hashing is Kirsch-Mitzenmacher double hashing
(bucket_i = (h1 + i*h2) mod width) from two independent 32-bit words of
md5 — engine-portable, so the DuckDB oracle reproduces every cell and
estimate bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_search_spark.functions.texts import _col

__all__ = ["cms_h1", "cms_h2", "cms_build", "cms_estimate"]


def cms_h1(c: Column | str) -> Column:
    """First 32-bit md5 word (same as texts.h32)."""
    return F.conv(F.substring(F.md5(_col(c)), 1, 8), 16, 10).cast("bigint")


def cms_h2(c: Column | str) -> Column:
    """Second 32-bit md5 word — independent of :func:`cms_h1`."""
    return F.conv(F.substring(F.md5(_col(c)), 9, 8), 16, 10).cast("bigint")


def sql_cms_h1(x: str) -> str:
    return f"CAST('0x' || substr(md5({x}), 1, 8) AS BIGINT)"


def sql_cms_h2(x: str) -> str:
    return f"CAST('0x' || substr(md5({x}), 9, 8) AS BIGINT)"


def _bucket(h1: Column, h2: Column, row: Column, width: int) -> Column:
    return ((h1 + row * h2) % F.lit(width)).cast("int")


def cms_build(
    items: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Sketch a (multi-set) key stream: one row per touched cell,
    ``(row int, bucket int, cnt long)``. Untouched cells are implicit
    zeros. Merge two sketches with union + re-agg."""
    cells = (
        items.select(
            cms_h1(key_col).alias("_h1"), cms_h2(key_col).alias("_h2")
        )
        .select(
            "_h1",
            "_h2",
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
        )
        .select(
            "row",
            _bucket(F.col("_h1"), F.col("_h2"), F.col("row"), width).alias(
                "bucket"
            ),
        )
    )
    return cells.groupBy("row", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
    validate: bool = True,
) -> DataFrame:
    """Point-query the sketch for each distinct probe key: adds
    ``cms_est`` (min over the key's depth cells; >= true count always).
    The sketch side is depth*width rows -> broadcast; probes stream.

    The never-undercount guarantee only holds when (depth, width)
    match the build parameters — the sketch DataFrame carries no
    metadata, and a mismatch would silently probe the wrong cells
    (coalesce 0, min 0: an undercount). ``validate`` (default on)
    checks this IN-PLAN: the shape test rides the same sketch rows
    being broadcast (a global window over the sketch relation, which
    is <= depth*width rows by construction — never data-sized), so
    NO job runs at call time and the corpus-sized build subtree
    behind an uncached sketch executes exactly once per action, not
    once per ``cms_estimate`` call. A mismatch raises at action time
    via ``assert_true``. A probe width LARGER than the build is
    undetectable from the sketch alone (buckets all < both widths) —
    keep the parameters with the sketch.

    MISUSE COST: the shape check's unpartitioned window materializes
    the whole ``sketch`` relation on one task before the assert fires.
    For a real sketch (<= depth*width rows, about to be broadcast
    anyway) that is free; passing a data-sized non-sketch DataFrame
    lands it all on one task before the mismatch error surfaces — the
    broadcast on the next line has the same failure mode, so the check
    adds no new hazard, but don't probe relations you wouldn't
    broadcast."""
    if validate:
        # Sketch-sized global window (<= depth*width rows): the check
        # is fused into the broadcast build, zero extra passes over
        # the (possibly corpus-backed) sketch subtree.
        w = Window.partitionBy()
        shape_ok = (
            (F.size(F.collect_set("row").over(w)) == F.lit(depth))
            & (F.max("row").over(w) < F.lit(depth))
            & (F.max("bucket").over(w) < F.lit(width))
        )
        msg = (
            f"cms_estimate(depth={depth}, width={width}) does not "
            f"match the built sketch shape — probing the wrong cells "
            f"would undercount"
        )
        # assert_true -> NULL when the shape matches; folding it into
        # `cnt` keeps the check alive under column pruning.
        sketch = sketch.withColumn(
            "cnt",
            F.col("cnt")
            + F.coalesce(
                F.assert_true(shape_ok, F.lit(msg)).cast("long"), F.lit(0)
            ),
        )
    h1, h2 = cms_h1(key_col), cms_h2(key_col)
    probe_cells = probes.select(
        key_col,
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("row"),
    ).withColumn("bucket", _bucket(h1, h2, F.col("row"), width))
    joined = probe_cells.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return joined.groupBy(key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est")
    )
