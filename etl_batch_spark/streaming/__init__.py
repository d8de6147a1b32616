from etl_batch_spark.streaming.events import (  # noqa: F401
    read_events_stream,
    run_stream_to_memory,
    sessionize_stateful,
    windowed_event_counts,
)
