from ibis_flink_example_spark.plans.audit import (  # noqa: F401
    broadcast_join_count,
    exchange_count,
    executed_scan_metrics,
    formatted_plan,
    plan_ops,
    plan_ops_from_string,
    pushed_filter_scan_count,
    scan_columns,
)
