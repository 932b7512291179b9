from mie_spark.streaming.ops import (
    attribution_join,
    enriched_segment_spend,
    foreach_batch_upsert,
    read_events_stream,
    run_to_memory_sink,
    sessionized_stream,
    stateful_user_totals,
    stream_append_ivf_index,
    stream_dedup,
    transform_state_profile,
    windowed_counts,
)

__all__ = [
    "attribution_join",
    "enriched_segment_spend",
    "foreach_batch_upsert",
    "read_events_stream",
    "run_to_memory_sink",
    "sessionized_stream",
    "stateful_user_totals",
    "stream_append_ivf_index",
    "stream_dedup",
    "transform_state_profile",
    "windowed_counts",
]
