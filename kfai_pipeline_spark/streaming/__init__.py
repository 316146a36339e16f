"""Structured Streaming forms (SURVEY.md §2.10): file-source ingest,
watermarked tumbling/sliding/session windows, stateful dedup, and a
custom stateful operator (terminator-aware sessionization via
``applyInPandasWithState``). Batch twins live in queries/ (Q25/Q28/Q54);
parity is asserted in tests via Trigger.AvailableNow."""

from kfai_pipeline_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)
from kfai_pipeline_spark.streaming.ingest import (
    read_events_stream,
    read_video_records_stream,
    streaming_dedup,
)
from kfai_pipeline_spark.streaming.stateful import (
    sessionize_terminator_batch,
    sessionize_terminator_stream,
)

__all__ = [
    "session_window_agg",
    "sliding_window_agg",
    "tumbling_window_agg",
    "read_events_stream",
    "read_video_records_stream",
    "streaming_dedup",
    "sessionize_terminator_batch",
    "sessionize_terminator_stream",
]
