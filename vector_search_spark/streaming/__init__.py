"""Structured Streaming surface: watermarked event ingest, windowed
aggregations, stream dedup, enrichment, stream-stream joins, stateful
operators, and micro-batch index maintenance (refresh / upsert / deletion /
arrival monitoring)."""

from vector_search_spark.streaming.events import (  # noqa: F401
    dedup_within_watermark,
    enrich_with_static,
    purchase_follow_pairs,
    read_events_stream,
    session_counts,
    sliding_counts,
    tumbling_counts,
)
from vector_search_spark.streaming.index_refresh import (  # noqa: F401
    cell_arrival_counts,
    encode_batch,
    incremental_pq_refresh,
    streaming_delete,
    streaming_upsert,
)
from vector_search_spark.streaming.stateful import (  # noqa: F401
    running_user_stats_gs,
    streaming_topk,
)
