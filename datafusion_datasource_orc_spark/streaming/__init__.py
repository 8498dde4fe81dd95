from datafusion_datasource_orc_spark.streaming.events import (  # noqa: F401
    events_stream,
    stream_tumbling_counts,
    stream_user_running_totals,
    stream_user_state_custom,
    run_stream_to_memory,
)
