"""Structured Streaming surface: watermarked event ingest, windowed
aggregations, stream dedup, and micro-batch index refresh."""

from vector_search_spark.streaming.events import (  # noqa: F401
    dedup_within_watermark,
    read_events_stream,
    session_counts,
    sliding_counts,
    tumbling_counts,
)
from vector_search_spark.streaming.index_refresh import (  # noqa: F401
    incremental_pq_refresh,
)
