from pgdedupe_spark.plans.inspect import (
    explain_str,
    has_broadcast_join,
    plan_report,
    pushed_filters,
    scan_columns,
)

__all__ = [
    "explain_str",
    "has_broadcast_join",
    "plan_report",
    "pushed_filters",
    "scan_columns",
]
