"""Corpus-curation funnel: the composed training-data pipeline
(length gate -> quality gate -> exact dedup -> deterministic sample)
reported as a per-stage (docs, tokens) funnel — the dashboard view a
data team watches while curating a 100 TB corpus.

Single-pass design: the naive formulation recomputes the corpus once
per stage (6 scans). Instead :func:`curation_flags` computes every
stage's survival flag as a COLUMN in one pass — each stage's flag is a
conjunction of the previous stage's — so the whole funnel costs one
scan + one window shuffle (dedup keeper on the text hash) + one
aggregate. The funnel rows then unpivot from a single agg row via
explode, not by re-aggregating per stage.

Stage semantics:

- ``ok_len``     token count in [min_tokens, max_tokens]
- ``ok_quality`` ok_len AND stopword ratio >= min_stop_ratio
- ``ok_dedup``   ok_quality AND this doc is the min-id quality-surviving
                 doc for its exact text hash (keeper election among
                 survivors via ``min(CASE WHEN ok_quality ...) OVER
                 (PARTITION BY md5(text))`` — one window, no self-join)
- ``ok_sample``  ok_dedup AND deterministic hash-sample keep (50%)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from kfai_pipeline_spark.operators.text_analysis import (
    STOPWORDS_EN,
    _words,
    md5_long,
    token_count,
)


def curation_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 40,
    max_tokens: int = 80,
    min_stop_ratio: float = 0.03,
    sample_rate: float = 0.5,
) -> DataFrame:
    """One row per doc with n_tokens and the four cumulative stage flags."""
    words = _words(text_col)
    n_tok = token_count(text_col)
    stop_hits = F.size(F.filter(words, lambda w: F.lower(w).isin(*STOPWORDS_EN)))
    flagged = df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        stop_hits.alias("__stop"),
        F.md5(F.col(text_col)).alias("__h"),
    ).withColumns(
        {
            "ok_len": F.col("n_tokens").between(min_tokens, max_tokens),
            "__sample_keep": F.pmod(
                md5_long(F.col(id_col).cast("string")), F.lit(10_000)
            )
            < int(sample_rate * 10_000),
        }
    )
    flagged = flagged.withColumn(
        "ok_quality",
        F.col("ok_len") & (F.col("__stop") / F.col("n_tokens") >= min_stop_ratio),
    )
    keeper = F.min(
        F.when(F.col("ok_quality"), F.col(id_col))
    ).over(Window.partitionBy("__h"))
    flagged = flagged.withColumn(
        "ok_dedup", F.col("ok_quality") & (F.col(id_col) == keeper)
    )
    return flagged.withColumn(
        "ok_sample", F.col("ok_dedup") & F.col("__sample_keep")
    ).drop("__stop", "__h", "__sample_keep")


def curation_funnel(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", **kw) -> DataFrame:
    """(stage_no, stage, n_docs, n_tokens) — one row per funnel stage."""
    flags = curation_flags(df, text_col, id_col, **kw)

    def _pair(cond):
        # coalesce: SUM over ZERO input rows is NULL, and a funnel
        # report over an empty corpus must read "0 docs, 0 tokens",
        # not "unknown" (round-6 empty-input sweep)
        return (
            F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0)),
            F.coalesce(
                F.sum(F.when(cond, F.col("n_tokens")).otherwise(0)), F.lit(0)
            ).cast("bigint"),
        )

    stages = [
        ("raw", F.lit(True)),
        ("length", F.col("ok_len")),
        ("quality", F.col("ok_quality")),
        ("dedup", F.col("ok_dedup")),
        ("sample", F.col("ok_sample")),
    ]
    aggs = []
    for name, cond in stages:
        n, t = _pair(cond)
        aggs += [n.alias(f"__n_{name}"), t.alias(f"__t_{name}")]
    one = flags.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("stage_no"),
                F.lit(name).alias("stage"),
                F.col(f"__n_{name}").alias("n_docs"),
                F.col(f"__t_{name}").alias("n_tokens"),
            )
            for i, (name, _) in enumerate(stages)
        ]
    )
    return (
        one.select(F.explode(rows).alias("r"))
        .select("r.stage_no", "r.stage", "r.n_docs", "r.n_tokens")
        .orderBy("stage_no")
    )
