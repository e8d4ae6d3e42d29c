from qsvspark.streaming.ingest import routed_stream, run_available_now

__all__ = ["routed_stream", "run_available_now"]
