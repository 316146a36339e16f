"""Text normalization functions (F1-F10, F21) — Column-in, Column-out.

Re-expresses the reference's transcript/LLM-response cleanup
(/root/reference/src/kfai/transformers/utils/helpers.py:92-114 and
/root/reference/src/kfai/loaders/utils/filtering.py:112-115) as JVM
expressions. Each step matches the reference's regex semantics; the
composition order in ``clean_text_chunk`` mirrors the reference exactly
(profanity marker first, literal fillers, bracket tags, whitespace).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def clean_text_chunk(col: str | Column) -> Column:
    """Transcript cleanup (F1-F4; ref helpers.py:92-104).

    [\\u00a0__\\u00a0] -> "****", zero-width/nbsp/'>>' removal, bracket-tag
    strip, whitespace collapse + trim.
    """
    c = _c(col)
    c = F.regexp_replace(c, "\\[\u00a0__\u00a0\\]", "****")  # profanity marker
    c = F.replace(c, F.lit("\u200b"), F.lit(""))
    c = F.replace(c, F.lit("\xa0"), F.lit(" "))
    c = F.replace(c, F.lit(">>"), F.lit(""))
    c = F.regexp_replace(c, r"\[\s*[^\]]*?\s*\]", "")  # bracket tags
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return c


def normalize_quotes(col: str | Column) -> Column:
    """Curly quotes -> ASCII (F5; ref helpers.py:112-114, llm.py:4-9)."""
    c = _c(col)
    c = F.regexp_replace(c, "[\u2018\u2019]", "'")
    c = F.regexp_replace(c, "[\u201c\u201d]", '"')
    return c


def take_after_marker(col: str | Column, marker: str) -> Column:
    """Everything after the last occurrence of ``marker``; the whole
    string when the marker is absent (F6 — Python ``split(m)[-1]``
    semantics; ref helpers.py:107-111)."""
    import re as _re

    c = _c(col)
    # F.split takes a Java regex — quote the literal marker. split() with
    # a trailing match yields '' as the last element, same as Python's
    # str.split — element_at(-1) reproduces [-1] exactly.
    return F.element_at(F.split(c, _re.escape(marker), -1), -1)


def clean_llm_response(col: str | Column) -> Column:
    """LLM response cleanup (F5-F7; ref helpers.py:105-114): take text
    after known preamble markers and </think>, strip <CHUNK> tags,
    normalize curly quotes."""
    c = _c(col)
    for marker in ("Here is the cleaned chunk:", "Here's the cleaned chunk:", "</think>"):
        c = take_after_marker(c, marker)
    c = F.regexp_replace(c, r"</?CHUNK>", "")
    return normalize_quotes(c)


def csv_split(col: str | Column) -> Column:
    """CSV string -> trimmed array (F8; ref database.py:180 hosts split)."""
    return F.transform(F.split(_c(col), ","), lambda s: F.trim(s))


def csv_join(col: str | Column) -> Column:
    """Array -> CSV string (F8; ref build_vector_store.py:64-66)."""
    return F.concat_ws(",", _c(col))


def like_escape(col: str | Column) -> Column:
    """Escape LIKE metacharacters % and _ with a backslash (F9; ref
    filtering.py:113-114 ``re.sub(r'([%_])', r'\\\\\\1', host)``)."""
    return F.regexp_replace(_c(col), r"([%_])", r"\\$1")


def watch_url(video_id: str | Column, start_seconds: str | Column) -> Column:
    """YouTube deep link ``watch?v={id}&t={t}s`` (F21; ref
    query_agent.py:170-190)."""
    return F.concat(
        F.lit("https://www.youtube.com/watch?v="),
        _c(video_id),
        F.lit("&t="),
        _c(start_seconds).cast("long").cast("string"),
        F.lit("s"),
    )
