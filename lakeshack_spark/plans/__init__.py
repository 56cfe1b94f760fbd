from lakeshack_spark.plans.audit import (
    explain_str,
    has_broadcast_hash_join,
    has_partial_aggregation,
    has_take_ordered,
    pushed_filters,
    read_schema_columns,
    wholestage_codegen_spans,
)

__all__ = [
    "explain_str",
    "pushed_filters",
    "read_schema_columns",
    "has_broadcast_hash_join",
    "has_take_ordered",
    "has_partial_aggregation",
    "wholestage_codegen_spans",
]
