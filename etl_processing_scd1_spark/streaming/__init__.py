from .pipeline import (
    stream_transactions_source,
    streaming_append_dedup,
    streaming_enrich,
    streaming_interval_join,
    streaming_near_dedup_sink,
    streaming_scd1_sink,
    streaming_velocity_rule,
)

__all__ = [
    "stream_transactions_source",
    "streaming_append_dedup",
    "streaming_enrich",
    "streaming_interval_join",
    "streaming_near_dedup_sink",
    "streaming_scd1_sink",
    "streaming_velocity_rule",
]
