from gcd_etl_spark.streaming.jobs import (
    run_streaming_sessions,
    run_streaming_tumbling,
    streaming_events,
)
from gcd_etl_spark.streaming.stateful import run_streaming_stateful_totals

__all__ = [
    "streaming_events",
    "run_streaming_tumbling",
    "run_streaming_sessions",
    "run_streaming_stateful_totals",
]
