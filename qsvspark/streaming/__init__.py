from qsvspark.streaming.ingest import (
    incremental_ingest,
    routed_stream,
    run_available_now,
    windowed_event_counts,
)
from qsvspark.streaming.stateful import dedup_stream_exact, dedup_stream_minhash

__all__ = [
    "incremental_ingest", "routed_stream", "run_available_now", "dedup_stream_exact",
    "dedup_stream_minhash", "windowed_event_counts",
]
