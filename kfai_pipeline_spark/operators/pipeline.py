"""Incremental/resume pipeline operators (SURVEY.md §2.10, I1-I3, J3-J5,
A6).

The reference's incremental story is file-exists and store-contents
checkpoints plus a dead-letter skip list. In Spark those are anti joins
against the sink's key listing — no driver-side set building, no
mutable state; every operator here shuffles at most once on its key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def new_work(
    source: DataFrame,
    done: DataFrame,
    keys: list[str] | str,
    skip: DataFrame | None = None,
) -> DataFrame:
    """I1/J4: rows of ``source`` not yet in ``done`` (and not in
    ``skip``). Mirrors ``db − (processed ∪ skip)``
    (ref fetch_raw_data.py:53-67); ``keys`` may be composite, covering
    the chunk-grain resume key ``(video_id, start_time)``
    (ref build_vector_store.py:78-80, J5)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    out = source.join(done.select(*keys).dropDuplicates(keys), keys, "left_anti")
    if skip is not None:
        out = out.join(F.broadcast(skip), keys[:1], "left_anti")
    return out


def merge_records(
    base: DataFrame, enrich: DataFrame, key: str = "video_id", how: str = "inner"
) -> DataFrame:
    """J3: merge catalog rows with enrichment rows by key (the dict-merge
    ``dict(video) | youtube_api_data[video_id]`` at
    ref fetch_raw_data.py:88-93). Enrichment columns win on name
    collisions, matching ``dict |`` right-bias."""
    dupes = [c for c in enrich.columns if c in base.columns and c != key]
    return base.drop(*dupes).join(enrich, key, how)


def integrity_check(
    raw: DataFrame,
    cleaned: DataFrame,
    key: str = "video_id",
    chunks_col: str = "transcript_chunks",
) -> DataFrame:
    """A6: per-key integrity — cleaned chunk count must equal raw chunk
    count and the key must exist on both sides (ref
    transformers/utils/helpers.py:38-70). Returns
    ``(key, n_raw, n_cleaned, ok)``; callers route ``ok = false`` rows to
    the dead-letter side (I3)."""
    r = raw.select(F.col(key), F.size(chunks_col).alias("n_raw"))
    c = cleaned.select(F.col(key), F.size(chunks_col).alias("n_cleaned"))
    return (
        r.join(c, key, "full")
        .select(
            key,
            "n_raw",
            "n_cleaned",
            (
                F.col("n_raw").isNotNull()
                & F.col("n_cleaned").isNotNull()
                & (F.col("n_raw") == F.col("n_cleaned"))
            ).alias("ok"),
        )
    )


def split_dead_letter(
    df: DataFrame, ok_col: str = "ok"
) -> tuple[DataFrame, DataFrame]:
    """I3: route rows into (good, dead-letter) by a boolean column. The
    two filters share the upstream plan; persist upstream if both sides
    are consumed."""
    return df.where(F.col(ok_col)), df.where(~F.col(ok_col) | F.col(ok_col).isNull())
