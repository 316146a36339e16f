"""Continuous near-dup screening of a stream against a growing
signature index — the streaming twin of X37
(``operators/dedup.py write_minhash_index / neardup_against_index``).

The 100 TB workflow: crawl batches arrive as a stream; each micro-batch
is (1) probed against every PREVIOUS batch's signatures (never its own,
so replays can't self-match) and (2) folded into the index. Matches go
to an injected sink (dead-letter, dedup log, routing decision) — the
same injected-boundary pattern as ``sinks.write_stream_foreach_batch``.

Exactly-once without a transactional store: each batch's signatures
land in their own ``batch_<id>/`` directory written with overwrite, so
a replayed epoch overwrites itself instead of appending duplicates
(the same (content, batch_id)-pure contract as the rollup maintainer,
using directory identity instead of a version pointer). The probe
lists committed batch directories (``_SUCCESS`` present), excluding
the current id — a half-written crash leftover is invisible.

Index size: one row of ``num_hashes`` longs per document — the stream
never rescans historical text, and the per-trigger cost is
O(batch x index signatures) through an LSH band join.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from kfai_pipeline_spark.operators.dedup import (
    minhash_signatures,
    neardup_against_index,
    word_shingles,
)


def _committed_batch_dirs(spark, index_dir: str, exclude_id: int) -> list[str]:
    from kfai_pipeline_spark.operators.dedup import list_success_dirs

    out = []
    for name, path in list_success_dirs(spark, index_dir, ("batch_",)):
        try:
            bid = int(name.split("_", 1)[1])
        except ValueError:
            continue
        if bid != exclude_id:
            out.append(path)
    return out


def maintain_neardup_index(
    stream_df: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    match_fn: Callable[[DataFrame, int], None] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    est_threshold: float = 0.5,
    hash_fn=None,
    seed_fmt: str = "\x00{}",
    threshold: float | None = None,
):
    """Start an AvailableNow query that screens each micro-batch
    against the accumulated signature index and folds it in.

    ``match_fn(matches_df, batch_id)`` receives this batch's
    ``(batch_id, index_id, est_jaccard)`` matches vs all PRIOR batches
    (called with an empty match set too, so sinks can commit the epoch);
    it must be idempotent per batch_id, like every foreachBatch sink.
    Returns the started query. ``threshold`` is a deprecated alias for
    ``est_threshold`` (the pre-rename keyword); it warns and forwards."""
    from kfai_pipeline_spark.streaming.sinks import write_stream_foreach_batch

    if threshold is not None:
        import warnings

        if est_threshold != 0.5:  # both cuts passed: refuse to guess
            raise ValueError(
                "pass est_threshold= only — threshold= is its deprecated alias"
            )
        warnings.warn(
            "maintain_neardup_index(threshold=) is deprecated; the cut is on "
            "the MinHash ESTIMATE of Jaccard — pass est_threshold= instead",
            DeprecationWarning,
            stacklevel=2,
        )
        est_threshold = threshold

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prior = _committed_batch_dirs(spark, index_dir, batch_id)
        if match_fn is not None:
            if prior:
                idx = spark.read.parquet(*prior)
                matches = neardup_against_index(
                    batch_df, idx, text_col, id_col, shingle_n,
                    num_hashes, bands, est_threshold, hash_fn, seed_fmt,
                )
            else:
                matches = spark.createDataFrame(
                    [], f"batch_id {dict(batch_df.dtypes)[id_col]}, "
                        f"index_id {dict(batch_df.dtypes)[id_col]}, est_jaccard double",
                )
            match_fn(matches, batch_id)
        sigs = minhash_signatures(
            word_shingles(batch_df, text_col, id_col, shingle_n),
            id_col, num_hashes, hash_fn, seed_fmt,
        )
        # overwrite into the batch's OWN directory: a replayed epoch
        # rewrites itself — never appends duplicates
        sigs.write.mode("overwrite").parquet(f"{index_dir}/batch_{batch_id}")

    return write_stream_foreach_batch(stream_df, fold, checkpoint_dir)
