"""Structured Streaming over the ``events`` table."""

from iceberg_data_gen_spark.streaming.events import read_events_stream, run_to_completion

__all__ = ["read_events_stream", "run_to_completion"]
