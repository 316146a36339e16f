"""Incremental/resume pipeline operators (SURVEY.md §2.10, I1-I3, J3-J5,
A6).

The reference's incremental story is file-exists and store-contents
checkpoints plus a dead-letter skip list. In Spark those are anti joins
against the sink's key listing — no driver-side set building, no
mutable state; every operator here shuffles at most once on its key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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


def json_ok(col: str | Column) -> Column:
    """Boolean validity of a JSON string column: True iff the value
    parses as JSON at all (``try_parse_json`` non-null — never throws),
    NULL input counts as invalid. This is the I3 routing predicate for
    corrupted upstream payloads: malformed rows go to the dead-letter
    side via :func:`split_dead_letter` instead of poisoning the parse
    stage or crashing a 1000-executor job on one truncated record.

    Total by construction (the corrupted-input sweep's contract): any
    bytes — truncated JSON, empty string, non-JSON garbage — yield
    False, not an exception. JSON ``null`` is VALID JSON and routes
    clean, matching DuckDB's ``json_valid``. Pinned leniency
    divergence (scripts/corruption_sweep.py): Spark's variant parser
    ACCEPTS trailing content after a complete value ('{"a":1}}' ->
    True) where strict validators reject it — truncation, the real
    corruption mode, never produces that shape."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(F.try_parse_json(c).isNotNull(), F.lit(False))


def merge_agg_snapshots(
    snapshot: DataFrame,
    delta_agg: DataFrame,
    keys: list[str] | str,
    merge: dict[str, str],
) -> DataFrame:
    """Incremental aggregate maintenance (I7): combine a materialized
    per-key aggregate SNAPSHOT with a freshly aggregated DELTA without
    rescanning history — the incremental-view-maintenance answer to
    "daily rollup over an append-only 100 TB log". Only MERGEABLE
    measures are supported (``merge`` maps measure column ->
    ``"sum" | "min" | "max"``; counts merge by sum); averages are
    derived downstream as merged-sum / merged-count.

    Scale shape: both inputs are already key-grain (|keys| rows, not
    raw-event rows), so the union + re-aggregate shuffles aggregate
    rows only. The snapshot never re-reads raw history — that is the
    whole point; a full recompute touches every byte ever ingested,
    this touches yesterday's rollup plus today's partition. The same
    mechanism underlies the reference's processed-output diffing
    (ref fetch_raw_data.py:57-67 re-derives state from what was already
    materialized instead of refetching everything).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    fns = {"sum": F.sum, "min": F.min, "max": F.max}
    bad = {m for m in merge.values() if m not in fns}
    if bad:
        raise ValueError(f"non-mergeable merge fns: {sorted(bad)}")
    cols = keys + list(merge)
    return (
        snapshot.select(*cols)
        .unionByName(delta_agg.select(*cols))
        .groupBy(*keys)
        .agg(*[fns[m](c).alias(c) for c, m in merge.items()])
    )


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str] | str,
    delete_col: str | None = None,
    broadcast_changes: bool = True,
) -> DataFrame:
    """Type-1 MERGE (upsert): apply a change batch onto a snapshot —
    matched keys are overwritten by the change row, unmatched change
    rows are inserted, and (when ``delete_col`` names a boolean column
    on ``changes``) delete-flagged keys are removed. The latest-state
    counterpart of :func:`scd2_history` (which keeps full lineage), and
    the set-based form of the reference's overwrite-style record merge
    (ref fetch_raw_data.py:64-67,88-93 keeps exactly the newest state
    per video_id).

    Spark form: ``base ANTI changes`` ∪ ``changes WHERE NOT deleted``
    — no full-outer join, no window. When the change batch is small
    relative to the snapshot (the overwhelmingly common CDC shape) the
    anti join broadcasts and the snapshot NEVER shuffles; pass
    ``broadcast_changes=False`` for rare snapshot-sized batches to let
    AQE pick a shuffle join instead. ``changes`` must be 1 row per key
    (a compacted CDC batch); callers with raw multi-event batches
    compact first (e.g. latest-per-key via a window or
    :func:`scd2_history`'s is_current slice).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    key_side = changes.select(*keys).dropDuplicates(keys)
    if broadcast_changes:
        key_side = F.broadcast(key_side)
    kept = base.join(key_side, keys, "left_anti")
    live = changes
    if delete_col is not None:
        live = changes.where(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
    return kept.unionByName(live.select(*base.columns))


def scd2_history(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history: collapse an event
    stream into attribute VERSIONS per key — one row per change of
    ``attr_col``, with ``valid_from``/``valid_to`` interval columns,
    a 1-based ``version`` number, and ``is_current`` on the open row.
    The warehouse counterpart of the reference's overwrite-style record
    merge (ref fetch_raw_data.py:64-67 keeps only the latest state;
    SCD2 keeps the full lineage so point-in-time joins stay possible).

    Change detection is NULL-SAFE (``IS DISTINCT FROM`` semantics):
    NULL is a real attribute state, so x -> NULL -> x yields three
    versions, repeated NULLs collapse into one, and the first event of
    a key always opens version 1 (partition start is detected by row
    number, never by a NULL lag — a mid-stream NULL must not fake one).
    ``tiebreak_col`` (e.g. an event id) makes ordering — and therefore
    versioning — deterministic when timestamps collide.

    Scale shape: ONE hash shuffle on the key. The change filter sits
    between two windows over the same (key, order) spec, preserves the
    first window's partitioning and ordering, and Catalyst plans both
    windows plus the filter into a single exchange — no second sort,
    no self-join (plan-asserted in tests/test_plan_audit.py).
    """
    from pyspark.sql.window import Window

    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    changes = (
        df.withColumn("__prev", F.lag(attr_col).over(w))
        .withColumn("__rn", F.row_number().over(w))
        .where(
            (F.col("__rn") == 1)
            | ~F.col(attr_col).eqNullSafe(F.col("__prev"))
        )
    )
    return changes.select(
        F.col(key_col),
        F.col(attr_col),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.row_number().over(w).alias("version"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
    )
