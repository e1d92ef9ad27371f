from randas_spark.plans.introspect import (  # noqa: F401
    count_exchanges,
    executed_plan,
    has_broadcast_join,
    has_sort_merge_join,
    pushed_filters,
)
