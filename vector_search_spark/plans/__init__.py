"""Plan-inspection helpers (used by tests to hold the line on physical
plans: pushdown, pruning, broadcast, codegen)."""

from vector_search_spark.plans.explain import (  # noqa: F401
    BOUNDED_META_KEY,
    bounded_alias,
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
    unpartitioned_windows,
    unpartitioned_windows_aggregate_bounded,
    wholestage_codegen_ids,
)
