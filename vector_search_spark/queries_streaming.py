"""Batch twins of the streaming transformations (queries catalog).

Every streaming query body in streaming/events.py is mode-agnostic —
the same expressions run in batch. These entries run them in batch mode
against the events table so DuckDB can oracle-check the *semantics*
(window alignment, session merging); tests/test_streaming.py then
asserts the streaming execution (availableNow micro-batches, watermark,
state store) produces the identical result set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from vector_search_spark import tables
from vector_search_spark.queries import register, rnd
from vector_search_spark.streaming import events as sev

_TS = "(epoch_us({c}) // 1000000)"


@register(
    "events_tumbling_hourly",
    f"""
SELECT ({_TS.format(c="ts")} // 3600) * 3600 AS window_start_epoch,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       (ROUND(SUM(value), 2) + 0.0) AS sum_value
FROM events
GROUP BY 1, 2
""",
    "streaming",
    "window",
)
def q_events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows (epoch-aligned, same alignment as the
    oracle's integer-division bucketing)."""
    ev = tables.load(spark, sf_dir, "events")
    out = sev.tumbling_counts(ev)
    return out.select(
        "window_start_epoch",
        "event_type",
        "n_events",
        rnd("sum_value", 2).alias("sum_value"),
    )


@register(
    "events_sliding_window",
    f"""
WITH e AS (SELECT event_type, {_TS.format(c="ts")} AS t FROM events)
SELECT (t // 900) * 900 - k.k * 900 AS window_start_epoch,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM e CROSS JOIN (SELECT unnest(range(0, 4)) AS k) k
GROUP BY 1, 2
""",
    "streaming",
    "window",
)
def q_events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1h width, 15m slide): every event lands in 4
    epoch-aligned windows; the oracle enumerates them arithmetically."""
    ev = tables.load(spark, sf_dir, "events")
    return sev.sliding_counts(ev)


@register(
    "events_session_window",
    f"""
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS session_idx
  FROM g
)
SELECT user_id, {_TS.format(c="min(ts)")} AS session_start_epoch,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, session_idx
""",
    "streaming",
    "window",
    "session",
)
def q_events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The built-in stateful session_window in batch mode — must agree
    with the gaps-and-islands oracle at full microsecond precision.
    Spark merges an event into the open session iff it arrives strictly
    before last_ts + gap, so a new session starts at diff >= gap."""
    ev = tables.load(spark, sf_dir, "events")
    return sev.session_counts(ev)


@register(
    "purchase_follow_pairs",
    """
SELECT p.event_id AS purchase_id, e.event_id AS follow_id,
       (ROUND(e.value, 6) + 0.0) AS follow_value
FROM events p JOIN events e
  ON e.user_id = p.user_id
 AND e.ts > p.ts AND e.ts <= p.ts + INTERVAL 1 DAY
WHERE p.event_type = 'purchase'
""",
    "streaming",
    "join",
)
def q_purchase_follow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the STREAM-STREAM interval join
    (streaming/events.py purchase_follow_pairs): purchase x same-user
    follow-up pairs within 1 day — the bounded-state streaming join
    shape (equi-key + event-time range, both sides watermarked).
    tests/test_streaming.py asserts the real micro-batched stream emits
    exactly these pairs; this oracle-paired twin value-checks the join
    predicate itself. Pair-level core of range_join_purchase_follow
    (which additionally aggregates)."""
    ev = tables.load(spark, sf_dir, "events")
    out = sev.purchase_follow_pairs(ev)
    return out.select(
        "purchase_id", "follow_id", rnd("follow_value").alias("follow_value")
    )
