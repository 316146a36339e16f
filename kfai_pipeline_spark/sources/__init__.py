"""Sources & sinks (SURVEY.md §2.1): video-record JSON, partitioned
writers, skip-lists, JDBC patterns, multimodal binary columns."""

from kfai_pipeline_spark.sources.video_records import (
    RAW_SNIPPET_SCHEMA,
    VIDEO_RECORD_SCHEMA,
    read_video_records,
    write_partitioned_json,
)
from kfai_pipeline_spark.sources.skip_list import load_skip_set, save_skip_set

__all__ = [
    "RAW_SNIPPET_SCHEMA",
    "VIDEO_RECORD_SCHEMA",
    "read_video_records",
    "write_partitioned_json",
    "load_skip_set",
    "save_skip_set",
]
