"""Structured Streaming surface.

The reference has no unbounded streams (its Arrow Flight transport is
bulk transfer — reference serve_flight.py:148 reads fully). The
idiomatic Spark extension (SURVEY §2.9) is a file-watcher on each
tenant's Raw/ directory plus watermarked event analytics; both live
here, sharing the batch layer's transform functions so stream and
batch never drift.
"""

from city_payroll_data_pipeline_spark.streaming.jobs import (
    stream_raw_csv,
    streaming_budget_report,
    streaming_event_stats,
)
from city_payroll_data_pipeline_spark.streaming.sessionize import (
    sessionize_stream,
)

__all__ = [
    "stream_raw_csv",
    "streaming_budget_report",
    "streaming_event_stats",
    "sessionize_stream",
]
