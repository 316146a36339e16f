"""Scalar function surface (SURVEY.md §2.8, F1-F25).

Everything here returns ``pyspark.sql.Column`` built from JVM-side
built-ins — no Python UDFs in any hot path, so all of it inlines into
whole-stage codegen.
"""

from kfai_pipeline_spark.functions.text import (
    clean_llm_response,
    clean_text_chunk,
    csv_join,
    csv_split,
    like_escape,
    normalize_quotes,
    take_after_marker,
    watch_url,
)
from kfai_pipeline_spark.functions.datetime_fns import (
    epoch_to_year_month,
    format_citation_time,
    format_hms,
    iso_duration_to_seconds,
    iso_to_epoch,
    year_term_epoch_range,
)

__all__ = [
    "clean_llm_response",
    "clean_text_chunk",
    "csv_join",
    "csv_split",
    "like_escape",
    "normalize_quotes",
    "take_after_marker",
    "watch_url",
    "epoch_to_year_month",
    "format_citation_time",
    "format_hms",
    "iso_duration_to_seconds",
    "iso_to_epoch",
    "year_term_epoch_range",
]
