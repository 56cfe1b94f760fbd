"""Physical-plan auditing: the scale contract, made assertable.

"Would this plan survive a 100× scale-up?" is a property of the physical
plan, not the result: filters must reach the Parquet scan, projections must
prune the read schema, small dims must broadcast, top-k must not global-
sort, aggregates must combine map-side. These helpers read the executed
plan so tests (tests/test_plans.py) pin those properties per query —
regressions in plan shape fail CI even while results stay correct.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame) -> str:
    """Formatted physical plan (same text as df.explain('formatted'))."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_str(df)):
        entry = m.group(1).strip()
        if entry:
            # split only between filters (", " followed by a filter name),
            # not on commas inside e.g. GreaterThan(col,value)
            out.extend(p.strip() for p in re.split(r", (?=[A-Z][A-Za-z]*\()", entry))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read from Parquet, one per scan (column
    pruning check: a 2-column projection must not read 16 columns)."""
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", explain_str(df)):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        schemas.append(cols)
    return schemas


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df)


def has_take_ordered(df: DataFrame) -> bool:
    """Top-k planned as TakeOrderedAndProject (per-partition top-k + merge),
    not a global sort."""
    return "TakeOrderedAndProject" in explain_str(df)


def has_partial_aggregation(df: DataFrame) -> bool:
    """Map-side combine present: at least one partial HashAggregate before
    the final one."""
    plan = explain_str(df)
    return len(re.findall(r"HashAggregate", plan)) >= 2 or "partial_" in plan


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans. NOTE: under AQE the formatted
    plan shows codegen spans only after execution — run an action first
    (e.g. noop write) for a meaningful count."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", explain_str(df))))
