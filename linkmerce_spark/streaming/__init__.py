from linkmerce_spark.streaming.windows import (  # noqa: F401
    tumbling_agg,
    sliding_agg,
    session_agg,
    read_events_stream,
)

__all__ = [
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
    "read_events_stream",
]
