"""Shard packing: assign documents to fixed-token-budget output shards
(§2.11 extension surface — how a 100 TB corpus becomes N training files
of ~equal token count; no reference equivalent).

The naive formulation — ``floor(cumsum(tokens) over (order by id) /
cap)`` — is a single-partition global window: every row flows through
one task. That is the textbook scale killer, so this operator computes
the same global running total with a **two-level (parallel) prefix
sum**:

1. hash-bucket every doc (``pmod(hash(id), B)``) — also shuffles
   related docs apart, which training mixes want anyway;
2. per-bucket exclusive running totals — B independent window
   partitions, fully parallel;
3. per-bucket grand totals → exclusive prefix over the B bucket rows —
   the only sequential step, and it is O(B) rows (thousands), not O(N);
4. global_offset = bucket_prefix + within-bucket running total;
   shard = floor(global_offset / cap).

Every doc lands in exactly one shard; a shard's true size can exceed
``cap`` by at most one document (assignment is by starting offset — the
standard contract, documents are never split).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window, functions as F

_DEFAULT_HASH: Callable[[Column], Column] = lambda c: F.xxhash64(c)


def pack_shards(
    df: DataFrame,
    token_col: str,
    id_col: str,
    cap: int,
    buckets: int = 64,
    hash_fn: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """Append ``bucket``, ``global_offset`` (exclusive token prefix in the
    canonical (bucket, id) order) and ``shard`` (= offset // cap).

    Deterministic: a pure function of (id set, token counts, cap,
    buckets) — independent of physical partitioning, so re-runs
    reproduce the exact shard layout.
    """
    h = (hash_fn or _DEFAULT_HASH)(F.col(id_col).cast("string"))
    docs = df.withColumn("bucket", F.pmod(h, F.lit(buckets)).cast("int"))

    # (2) within-bucket exclusive cumsum: B parallel window partitions
    in_bucket = Window.partitionBy("bucket").orderBy(F.col(id_col).asc())
    docs = docs.withColumn(
        "__run",
        F.coalesce(
            F.sum(token_col).over(
                in_bucket.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )

    # (3) bucket offsets: exclusive prefix over B tiny rows (the only
    # single-partition window, bounded by `buckets`, never by corpus size)
    totals = docs.groupBy("bucket").agg(F.sum(token_col).alias("__tot"))
    over_buckets = Window.orderBy(F.col("bucket").asc())
    offsets = totals.select(
        "bucket",
        F.coalesce(
            F.sum("__tot").over(over_buckets.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("__base"),
    )

    # (4) broadcast the B-row offset table back onto the docs
    return (
        docs.join(F.broadcast(offsets), "bucket")
        .withColumn("global_offset", (F.col("__base") + F.col("__run")).cast("long"))
        .withColumn("shard", F.floor(F.col("global_offset") / cap).cast("int"))
        .drop("__run", "__base")
    )


def shard_manifest(packed: DataFrame, token_col: str) -> DataFrame:
    """Per-shard manifest: doc count + token total (write-planning view)."""
    return (
        packed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_col).alias("n_tokens"),
        )
        .orderBy("shard")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    token_col: str,
    id_col: str,
    cap: int,
    buckets: int = 64,
    hash_fn: Callable[[Column], Column] | None = None,
    fmt: str = "json",
    mode: str = "overwrite",
) -> DataFrame:
    """The end artifact of the curation pipeline: assign docs to
    fixed-token-budget shards (:func:`pack_shards`) and write them
    ``partitionBy("shard")`` — one directory per training shard, JSONL
    by default (the interchange format training loaders read).

    ``repartition("shard")`` before the write makes each shard's rows
    land in one task -> one file per shard directory (plus Spark's
    _SUCCESS bookkeeping), instead of every task writing a sliver of
    every shard — at 100 TB the difference between #shards output files
    and #shards x #tasks small-file debris.

    Returns the packed DataFrame (with shard/global_offset columns) so
    callers can build a manifest without re-planning.
    """
    packed = pack_shards(df, token_col, id_col, cap, buckets=buckets, hash_fn=hash_fn)
    (
        packed.drop("bucket")
        .repartition("shard")
        .write.mode(mode)
        .partitionBy("shard")
        .format(fmt)
        .save(path)
    )
    return packed
