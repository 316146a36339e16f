"""Transcript chunker (W3/U4): overlapping character chunks with start
timestamps, as a Spark UDTF-style operator.

Re-implements the reference's
``chunk_transcript_with_overlap`` (/root/reference/src/kfai/extractors/
utils/helpers/transcript.py:92-168) without a langchain runtime
dependency: ``recursive_split`` reproduces RecursiveCharacterTextSplitter
semantics (chunk_size=1000, chunk_overlap=200, separators
["\\n\\n", "\\n", " ", ""], separators dropped, chunks stripped), and the
timestamp re-association walks the char->time map exactly like
transcript.py:134-166 (forward `find` with a moving search position,
latest snippet start <= chunk offset, 2-dp rounding, whitespace
re-normalization).

Text chunking is inherently per-row Python (SURVEY §2.5 W3 keeps it a
UDF) — but it's Arrow-batched (pandas UDF), embarrassingly parallel,
and zero-shuffle: each video row maps to its chunk array in place;
the explode that follows is narrow.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, StringType, StructField, StructType

DEFAULT_SEPARATORS = ["\n\n", "\n", " ", ""]


def _split_on_separator(text: str, separator: str) -> list[str]:
    """Split and drop the separator; '' splits into characters."""
    splits = re.split(re.escape(separator), text) if separator else list(text)
    return [s for s in splits if s != ""]


def _merge_splits(
    splits: list[str], separator: str, chunk_size: int, chunk_overlap: int
) -> list[str]:
    """Greedy merge of sub-splits into chunks <= chunk_size with sliding
    overlap carry-over (the standard recursive-splitter merge loop)."""
    sep_len = len(separator)
    docs: list[str] = []
    current: list[str] = []
    total = 0
    for d in splits:
        d_len = len(d)
        if total + d_len + (sep_len if current else 0) > chunk_size:
            if current:
                doc = separator.join(current).strip()
                if doc:
                    docs.append(doc)
                # Drop from the front until the carried tail fits within
                # the overlap budget (and the next split fits the chunk).
                while total > chunk_overlap or (
                    total + d_len + (sep_len if current else 0) > chunk_size and total > 0
                ):
                    total -= len(current[0]) + (sep_len if len(current) > 1 else 0)
                    current = current[1:]
        current.append(d)
        total += d_len + (sep_len if len(current) > 1 else 0)
    doc = separator.join(current).strip()
    if doc:
        docs.append(doc)
    return docs


def recursive_split(
    text: str,
    chunk_size: int = 1000,
    chunk_overlap: int = 200,
    separators: list[str] | None = None,
) -> list[str]:
    """Recursive character splitting: use the coarsest separator present,
    recurse into over-long pieces with finer separators, merge with
    overlap."""
    separators = separators if separators is not None else DEFAULT_SEPARATORS

    separator = separators[-1]
    remaining: list[str] = []
    for i, s in enumerate(separators):
        if s == "":
            separator = s
            break
        if re.search(re.escape(s), text):
            separator = s
            remaining = separators[i + 1 :]
            break

    final_chunks: list[str] = []
    good: list[str] = []
    for piece in _split_on_separator(text, separator):
        if len(piece) < chunk_size:
            good.append(piece)
        else:
            if good:
                final_chunks.extend(_merge_splits(good, separator, chunk_size, chunk_overlap))
                good = []
            if not remaining:
                final_chunks.append(piece)
            else:
                final_chunks.extend(
                    recursive_split(piece, chunk_size, chunk_overlap, remaining)
                )
    if good:
        final_chunks.extend(_merge_splits(good, separator, chunk_size, chunk_overlap))
    return final_chunks


def chunk_snippets(
    snippets: list[dict] | None,
    chunk_size: int = 1000,
    chunk_overlap: int = 200,
) -> list[dict]:
    """Pure-Python core: snippet dicts ({text, start, duration}) ->
    chunk dicts ({text, start}). Mirrors transcript.py:92-168."""
    if not snippets:
        return []

    full_text = ""
    char_to_time: list[tuple[int, float]] = []
    for sn in snippets:
        text = (sn.get("text") or "").strip() + " "
        char_to_time.append((len(full_text), sn["start"]))
        full_text += text

    chunks = recursive_split(full_text, chunk_size, chunk_overlap)

    out: list[dict] = []
    search_pos = 0
    for chunk_text in chunks:
        idx = full_text.find(chunk_text, search_pos)
        if idx == -1:
            idx = full_text.find(chunk_text)
        start_time = None
        for char_index, ts in char_to_time:
            if char_index <= idx:
                start_time = ts
            else:
                break
        if start_time is not None:
            out.append({"text": " ".join(chunk_text.split()), "start": round(start_time, 2)})
        if idx != -1:
            search_pos = idx + 1
    return out


CHUNK_SCHEMA = ArrayType(
    StructType(
        [StructField("text", StringType()), StructField("start", DoubleType())]
    )
)


def chunk_transcripts(
    df: DataFrame,
    snippets_col: str = "transcript",
    out_col: str = "transcript_chunks",
    chunk_size: int = 1000,
    chunk_overlap: int = 200,
) -> DataFrame:
    """Append ``out_col ARRAY<STRUCT<text,start>>`` derived from the raw
    snippet array column. NULL snippets -> NULL chunks (the reference
    writes ``transcript_chunks: null`` for missing transcripts,
    processing.py:40-52)."""
    @F.pandas_udf(CHUNK_SCHEMA)
    def _chunk(col):
        def one(snips):
            if snips is None:
                return None
            return [
                (c["text"], c["start"])
                for c in chunk_snippets(
                    [
                        {"text": s["text"], "start": s["start"]}
                        for s in snips
                    ],
                    chunk_size,
                    chunk_overlap,
                )
            ]

        return col.map(one)

    return df.withColumn(out_col, _chunk(F.col(snippets_col)))


def explode_chunks(
    df: DataFrame,
    chunks_col: str = "transcript_chunks",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Video grain -> chunk grain (ref build_vector_store.py:73-92):
    one row per chunk with ``text`` and ``start_time``. Rows with NULL
    chunk arrays are dropped (ref build_vector_store.py:55-57)."""
    keep = keep_cols or [c for c in df.columns if c != chunks_col]
    return (
        df.where(F.col(chunks_col).isNotNull())
        .select(*keep, F.posexplode(chunks_col).alias("chunk_idx", "__chunk"))
        .select(
            *keep,
            "chunk_idx",
            F.col("__chunk.text").alias("text"),
            F.col("__chunk.start").alias("start_time"),
        )
    )


def fixed_window_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 200,
    stride: int = 150,
) -> DataFrame:
    """Fixed-size sliding-window character chunker: chunks start at
    1, 1+stride, ... while the start lies inside the text; each chunk is
    ``substr(start, size)`` (the final chunks may be shorter).

    The recursive splitter (:func:`recursive_split`) is the
    reference-faithful arm and is inherently per-row Python; THIS is the
    at-scale arm when separator awareness doesn't matter (fixed-context
    windows for embedding/pretraining): pure JVM sequence/transform +
    posexplode — zero Python, zero shuffle, and (unlike the UDF arm)
    fully SQL-expressible, so it is hash-checked against DuckDB (q70).

    Returns (id, chunk_idx, start, chunk). ``stride < size`` gives
    overlapping chunks with ``size - stride`` chars of overlap.
    """
    n = F.length(F.col(text_col))
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride))
    chunks = F.transform(starts, lambda s: F.substring(F.col(text_col), s, size))
    return (
        df.where(n > 0)
        .select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk"))
        .withColumn("start", F.col("chunk_idx") * stride + 1)
    )
