"""Event-time normalization for the streaming layer.

Structured Streaming requires the watermark/event-time column to be
TIMESTAMP (with local time zone); a TIMESTAMP_NTZ column is rejected at
analysis time (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE). Batch plans have
no such restriction — the batch arms of the parity-tested operators run
directly on NTZ.

``as_event_time`` casts an NTZ event-time column to TIMESTAMP in place.
The naive value is interpreted in the session time zone, so streaming
jobs should pin ``spark.sql.session.timeZone`` (the session factory
sets UTC) to keep stream window boundaries identical to the batch/NTZ
arm; with UTC the cast is value-preserving.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType


def as_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df
