"""Streaming event ingest + windowed aggregations.

The reference engine is synchronous/in-memory with a per-row ``Insert``
(py/hnsw.py:337-392); the honest Spark translation of "continuously
arriving data" is Structured Streaming: file-source micro-batches,
event-time windows with watermarks for late data, and stateful
operators. Every transformation here is defined once and works in BOTH
batch and streaming mode (the same ``DataFrame`` expressions), which is
how the batch catalog twins (queries_streaming.py) can be oracle-checked
by DuckDB while tests assert stream-equals-batch on the identical input.

Scale notes: windowed aggs shuffle on (window, key) with partial
aggregation map-side; state store size is bounded by the watermark
horizon; file sources scale by maxFilesPerTrigger. At 100 TB/day the
same topology runs against Kafka with the identical query bodies.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id bigint, ts bigint, user_id bigint, "
    "event_type string, value double, props string"
)

EVENTS_SCHEMA_NTZ = (
    "event_id bigint, ts timestamp_ntz, user_id bigint, "
    "event_type string, value double, props string"
)


def _events_ts_layout(path: str) -> str:
    """Inspect parquet footers for the physical ``ts`` layout:
    ``'nanos'`` (TIMESTAMP(NANOS) or raw int64 — needs the legacy int64
    read) or ``'ntz'`` (timestamp[us] without timezone — Spark's
    TIMESTAMP_NTZ). A file source needs its schema fixed up front, so
    the two layouts the testdata has shipped with must be told apart
    before the stream starts.

    EVERY part file's footer is checked (footers are tiny — this is a
    metadata read, not a data scan): a directory mixing the two layouts
    (plausible after a testdata refresh that appends files) cannot be
    served by one fixed stream schema, so it raises instead of
    misreading later files mid-stream."""
    import pyarrow.parquet as papq

    def classify(f: str) -> str:
        t = papq.read_schema(f).field("ts").type
        # plain int64 (fixture-written raw nanos) and TIMESTAMP(NANOS)
        # both take the legacy int64 read path; only ts[us]-NTZ differs.
        if str(t) == "int64" or getattr(t, "unit", None) == "ns":
            return "nanos"
        return "ntz"

    if not os.path.isdir(path):
        return classify(path)
    parts = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )
    if not parts:
        raise FileNotFoundError(f"no parquet part files under {path}")
    layouts = {p: classify(p) for p in parts}
    distinct = set(layouts.values())
    if len(distinct) > 1:
        raise ValueError(
            f"mixed ts layouts under {path}: {sorted(distinct)} — "
            "a file-source stream needs one fixed schema; rewrite the "
            f"directory to a single layout (per-file: {layouts})"
        )
    return distinct.pop()


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over the events parquet, normalizing ``ts`` to
    session-tz TimestampType for either physical layout (same contract
    as tables.load): TIMESTAMP(NANOS) is read as raw int64 then
    truncated to micros; timestamp[us]-NTZ is cast (UTC session tz =>
    micros identical to a naive read).

    NOTE (nanos layout only): unlike the batch loader (which
    save/restores the conf around the eager schema resolution), a stream
    consults the flag at every micro-batch, so it must stay set for the
    stream's lifetime — this call leaves
    ``spark.sql.legacy.parquet.nanosAsLong=true`` on the session,
    changing how other TIMESTAMP(NANOS) parquet reads started afterwards
    are typed (bigint)."""
    path = os.path.join(sf_dir, "events.parquet")
    if _events_ts_layout(path) == "nanos":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .parquet(path)
        )
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA_NTZ)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(path)
    )
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Per-(hour, type) tumbling-window counts + value sum. Works on a
    batch DataFrame identically (watermark is a no-op in batch)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_epoch"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    width: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window counts: each event lands in width/slide windows
    (epoch-aligned starts, the same alignment DuckDB arithmetic gives)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_epoch"),
            "event_type",
            "n_events",
        )
    )


def session_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session windows (30-min inactivity gap) — the built-in
    stateful ``session_window``. In batch mode its result must equal the
    gaps-and-islands window-function formulation (sessionize_events),
    which is exactly what the oracle checks."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start_epoch"),
            "n_events",
        )
    )


def enrich_with_static(
    events: DataFrame,
    dim: DataFrame,
    stream_key: str,
    dim_key: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    (batch) dimension table. The static side is broadcast — the only
    join shape that adds NO streaming state and no stream-side shuffle,
    which is the 100 TB/day answer for dimension lookups (state-store
    stream-stream joins are for two *moving* sides). Works identically
    on a batch DataFrame, so the batch twin is oracle-checkable."""
    if dim_key not in dim.columns:
        # withColumnRenamed on a missing column is a silent no-op — the
        # join would then fail late (or worse, hit a coincidentally
        # named column). Fail fast instead. (Advice-prevention, r7.)
        raise ValueError(
            f"dim_key {dim_key!r} not in dimension columns {dim.columns}"
        )
    if stream_key != dim_key and stream_key in dim.columns:
        raise ValueError(
            f"dimension already has a column named {stream_key!r}; the "
            f"rename from {dim_key!r} would create a duplicate — drop "
            f"or rename it first"
        )
    d = F.broadcast(dim.withColumnRenamed(dim_key, stream_key))
    return events.join(d, stream_key, how)


def dedup_within_watermark(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact-dedup on event_id with bounded state:
    duplicates arriving within the watermark horizon are dropped and
    state older than the horizon is evicted (the streaming counterpart
    of operators/dedup.exact_dedup)."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])


def purchase_follow_pairs(
    events: DataFrame,
    follow: str = "1 day",
    watermark: str = "2 hours",
) -> DataFrame:
    """STREAM-STREAM interval join: every purchase paired with the same
    user's strictly-later events inside the ``follow`` horizon. The one
    streaming join shape Spark executes with bounded state: equi-key
    (user_id) plus an event-time range predicate, both sides
    watermarked, so the state store evicts a buffered purchase once the
    watermark passes p_ts + follow (and a buffered event once no future
    purchase can reach back to it). Without the time bound the join
    would have to buffer both streams forever.

    Same body works in batch (watermarks no-op) — the batch twin is the
    pair-level core of queries_relational.range_join_purchase_follow,
    and tests assert stream == batch on the file-sourced stream.

    Returns (purchase_id, follow_id, follow_value). Append output mode:
    inner-join matches emit as soon as both rows have arrived.
    """
    p = events.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_type").alias("p_type"),
    ).filter(F.col("p_type") == "purchase")
    e = events.select(
        F.col("event_id").alias("follow_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
        F.col("value").alias("follow_value"),
    )
    if events.isStreaming:
        p = p.withWatermark("p_ts", watermark)
        e = e.withWatermark("e_ts", watermark)
    return p.join(
        e,
        (F.col("e_user") == F.col("p_user"))
        & (F.col("e_ts") > F.col("p_ts"))
        & (F.col("e_ts") <= F.col("p_ts") + F.expr(f"INTERVAL {follow}")),
        "inner",
    ).select("purchase_id", "follow_id", "follow_value")
