from .jobs import (
    anomaly_alert_sink,
    cdc_upsert_sink,
    chunk_encode_sink,
    incremental_mart_sink,
    quantile_sketch_sink,
    decontaminate_sink,
    read_event_stream,
    scd2_dimension_sink,
    session_windows,
    stateful_running_total,
    streaming_dedup,
    tumbling_aggregate,
)

__all__ = [
    "anomaly_alert_sink",
    "cdc_upsert_sink",
    "chunk_encode_sink",
    "incremental_mart_sink",
    "quantile_sketch_sink",
    "decontaminate_sink",
    "read_event_stream",
    "scd2_dimension_sink",
    "session_windows",
    "stateful_running_total",
    "streaming_dedup",
    "tumbling_aggregate",
]
