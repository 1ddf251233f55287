"""Scale-adaptive fan-out for compute-dense stages over small inputs.

THE PROBLEM (optimization guide §2/§6): Spark's scan parallelism is
byte-driven — ``maxPartitionBytes`` splits plus a 4 MB ``openCostInBytes``
charge per file — and AQE's partition coalescing is byte-driven too. Both
are the right default for I/O-bound work, but a stage whose cost is
COMPUTE per row (shingle explode + P md5 permutations, bounded
levenshtein over candidate pairs, per-token hashing) can be thousands of
times denser than its bytes. On a small input that yields one split, the
whole stage runs on one of N cores while the cluster idles; the byte
heuristics cannot see it.

THE DEVICE: :func:`fanout_small` repartitions a relation to full
parallelism ONLY when the optimizer's size estimate says the native
splitter could not have reached one split per task slot anyway
(estimate < slots × ``bytes_per_slot``, default 4 MB — Spark's own
open-cost floor, i.e. the smallest per-split size the packer would
produce). The round-robin exchange it inserts moves exactly the small
relation (bounded by the threshold: ≤ slots × 4 MB), after which the
dense per-row work runs slots-wide.

AT SCALE this is an IDENTITY BY CONSTRUCTION: a 100 TB (or even 1 GB)
input's estimate exceeds the threshold and the DataFrame is returned
unchanged — no shuffle is ever added to a big scan. The threshold is
env-tunable (``VSS_FANOUT_BYTES_PER_SLOT``; 0 disables fan-out
entirely), so a deployment can turn the device off without code
changes.

DETERMINISM: round-robin repartition is safe here — every downstream
consumer in this engine is row-level or aggregate/join-shaped
(partition-layout-independent). Do NOT apply it under partition-
sensitive expressions (``F.rand`` draws — the HNSW level assignment);
those sites deliberately don't use it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

# Default = spark.sql.files.openCostInBytes (4 MB): below this many bytes
# per task slot the file-split packer cannot reach one split per slot, so
# the scan is provably under-parallel for compute-dense work.
BYTES_PER_SLOT = int(
    os.environ.get("VSS_FANOUT_BYTES_PER_SLOT", str(4 * 1024 * 1024))
)


def plan_size_estimate(df: DataFrame) -> int | None:
    """The optimizer's sizeInBytes estimate for ``df`` (driver-side
    metadata only — no job). For a parquet scan this is the file bytes;
    None when the estimate is unavailable."""
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        return int(stats.sizeInBytes())  # py4j maps scala.BigInt -> int
    except Exception:  # pragma: no cover — py4j / plan-shape surprises
        return None


def fanout_small(
    df: DataFrame, bytes_per_slot: int | None = None
) -> DataFrame:
    """Repartition ``df`` to one partition per task slot IFF its size
    estimate is below ``bytes_per_slot`` per slot (see module doc).
    Returns ``df`` unchanged otherwise — at production scale this is an
    identity and adds nothing to the plan."""
    bps = BYTES_PER_SLOT if bytes_per_slot is None else bytes_per_slot
    if bps <= 0:
        return df
    spark = df.sparkSession
    slots = spark.sparkContext.defaultParallelism
    if slots <= 1:
        return df
    est = plan_size_estimate(df)
    if est is None or est >= slots * bps:
        return df
    return df.repartition(slots)


def coalesce_small(
    df: DataFrame,
    bytes_per_part: int | None = None,
    est: int | None = None,
) -> DataFrame:
    """The INVERSE device, for relations about to be PINNED
    (localCheckpoint) and re-scanned many times: when the optimizer's
    size estimate says the whole relation is smaller than ONE healthy
    partition (``bytes_per_part``, default the same 4 MB open-cost
    floor), ``coalesce(1)`` it so the checkpointed RDD holds one
    partition instead of inheriting the upstream shuffle's partition
    count (r18 optimization, guide §2.2/§6 "fewer, larger partitions" /
    small-files). Measured motivation: the HNSW edge artifact
    checkpointed at ~40 sub-KB partitions, and every per-layer filter
    in the descent/walk re-scanned all ~40 — dozens of scheduled tasks
    per hop for kilobytes of data.

    ``coalesce`` only merges the narrow tail of the materializing job
    (post-last-shuffle), so upstream build parallelism is untouched. At
    scale the estimate exceeds the threshold and this is an identity —
    a big artifact keeps its partitioning. Same kill switch semantics
    as :func:`fanout_small` (``VSS_FANOUT_BYTES_PER_SLOT=0`` disables
    both devices).

    Safe ONLY above partition-layout-independent consumers (joins,
    aggregates, windows) — the same determinism rule as fanout_small;
    do not apply below a partition-sensitive expression (F.rand).
    """
    bpp = BYTES_PER_SLOT if bytes_per_part is None else bytes_per_part
    if bpp <= 0:
        return df
    if est is None:
        est = plan_size_estimate(df)
    if est is None or est >= bpp:
        return df
    return df.coalesce(1)
