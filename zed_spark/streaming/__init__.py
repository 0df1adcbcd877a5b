"""Structured Streaming wrappers.

The reference has NO streaming engine (SURVEY §2.10): time windows
exist only as batch `every(dur)` bucketing. This package is the
forward-looking streaming surface a training-data pipeline needs:
windowed aggregation with watermarks over the event stream, and a
stateful session example — all standard Structured Streaming, so the
same code runs against kafka/files at scale.
"""

from zed_spark.streaming.windows import stream_events, windowed_counts

__all__ = ["stream_events", "windowed_counts"]
