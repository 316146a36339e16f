"""Source/domain-level corpus curation (X35): gate documents by the
aggregate quality of their SOURCE, not just their own content.

Web-scale curation pipelines (C4, RefinedWeb, Gopher) filter at two
grains: per-document heuristics (operators/text_analysis.py) and
per-SOURCE/domain statistics — drop whole domains that are too small to
trust, too boilerplate-heavy, or outside sane length bands, plus an
explicit blocklist. The reference's analogue is the channel allowlist
pushed into its extract SQL (``channel_id < 3``,
ref extractors/utils/helpers/database.py:69-71) and the permanent skip
list (ref fetch_raw_data.py:20-39) — both are source-grain gates; this
operator generalizes them to computed gates.

Scale shape: sources number in the millions while documents number in
the trillions, so the stats table is orders of magnitude smaller than
the corpus — ONE aggregate shuffles doc-grain rows down to source
grain, the verdict table broadcasts back, and the corpus itself never
shuffles (a map-side broadcast hash join tags/filters it). The
blocklist rides the same broadcast. This is the same
"aggregate-small, broadcast-back" shape as token-budget mixture
sampling (operators/sampling.py) and boilerplate removal (q68).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kfai_pipeline_spark.operators.text_analysis import token_count


def source_stats(
    docs: DataFrame,
    *,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 5,
    min_avg_tokens: float = 10.0,
    max_avg_tokens: float = 10_000.0,
    blocklist: list[str] | None = None,
) -> DataFrame:
    """Per-source verdict table: ``(source, n_docs, avg_tokens ROUND 4,
    distinct_text_ratio ROUND 4, kept)``. A source is kept when it has
    at least ``min_docs`` documents, its mean token count lies inside
    the band, and it is not blocklisted. ``distinct_text_ratio`` (share
    of distinct texts — a cheap source-level duplication signal) is
    reported for observability but not gated, matching C4's practice of
    measuring before deciding thresholds."""
    stats = (
        docs.select(
            F.col(source_col).alias("source"),
            token_count(text_col).alias("__tok"),
            F.col(text_col).alias("__text"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("__tok"), 4).alias("avg_tokens"),
            # distinct over the md5 DIGEST, not the text — the shuffle
            # carries 32-byte hashes instead of full documents (the q26
            # exact-dedup convention; collision odds are ignorable)
            F.round(
                F.count_distinct(F.md5(F.col("__text").cast("binary")))
                / F.count(F.lit(1)),
                4,
            ).alias("distinct_text_ratio"),
        )
    )
    kept = (
        (F.col("n_docs") >= min_docs)
        & (F.col("avg_tokens") >= min_avg_tokens)
        & (F.col("avg_tokens") <= max_avg_tokens)
    )
    if blocklist:
        kept = kept & ~F.col("source").isin(list(blocklist))
    return stats.withColumn("kept", kept)


def filter_by_source(
    docs: DataFrame, verdicts: DataFrame, source_col: str = "source"
) -> DataFrame:
    """Keep documents whose source passed: broadcast the (small)
    verdict table and semi-join map-side — the corpus never shuffles."""
    keep = verdicts.where(F.col("kept")).select(F.col("source").alias(source_col))
    return docs.join(F.broadcast(keep), source_col, "left_semi")
