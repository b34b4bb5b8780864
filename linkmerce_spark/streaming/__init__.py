from linkmerce_spark.streaming.windows import (  # noqa: F401
    tumbling_agg,
    sliding_agg,
    session_agg,
    read_events_stream,
)
