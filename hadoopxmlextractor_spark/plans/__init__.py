from hadoopxmlextractor_spark.plans.inspect import (
    count_exchanges,
    executed_plan,
    has_broadcast_join,
    partition_filters,
    pushed_filters,
    scan_columns,
)

__all__ = [
    "executed_plan",
    "count_exchanges",
    "has_broadcast_join",
    "partition_filters",
    "pushed_filters",
    "scan_columns",
]
