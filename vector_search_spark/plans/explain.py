"""Physical-plan assertions.

At 100 TB the difference between "works" and "finishes this week" is in
the physical plan: did the filter reach the parquet scan (PushedFilters),
did the scan read a 2-column projection (ReadSchema), did the small side
broadcast, is the pipeline inside WholeStageCodegen. These helpers let
tests pin those properties so refactors can't silently regress them.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_broadcast_join(df: DataFrame) -> bool:
    plan = formatted_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans in the plan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists of each parquet ReadSchema in the plan (projection check)."""
    plan = formatted_plan(df)
    schemas: list[list[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if ":" in c]
        schemas.append(cols)
    return schemas


def wholestage_codegen_ids(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans in the plan (wider is better)."""
    plan = formatted_plan(df)
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan)))
