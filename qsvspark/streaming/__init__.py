from qsvspark.streaming.ingest import (
    routed_stream,
    run_available_now,
    windowed_event_counts,
)
from qsvspark.streaming.stateful import dedup_stream_exact

__all__ = [
    "routed_stream", "run_available_now", "dedup_stream_exact",
    "windowed_event_counts",
]
