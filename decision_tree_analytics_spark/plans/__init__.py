from decision_tree_analytics_spark.plans.inspect import (  # noqa: F401
    count_shuffles,
    formatted_plan,
    has_broadcast_join,
    has_python_eval,
    has_whole_stage_codegen,
    pushed_filters,
    scan_read_schemas,
    simple_plan,
    uses_top_k_sort,
)
