from mie_spark.plans.explain import (
    broadcast_join_count,
    cartesian_product_count,
    exchange_count,
    formatted_plan,
    pushed_filters,
    read_schemas,
    unpartitioned_window_count,
    wholestage_codegen_spans,
)

__all__ = [
    "broadcast_join_count",
    "cartesian_product_count",
    "exchange_count",
    "formatted_plan",
    "pushed_filters",
    "read_schemas",
    "unpartitioned_window_count",
    "wholestage_codegen_spans",
]
