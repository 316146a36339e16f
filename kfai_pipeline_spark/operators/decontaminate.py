"""Benchmark decontamination: flag corpus documents whose word-n-gram
shingles overlap a benchmark/eval set beyond a threshold.

Standard training-data hygiene (the reference has no equivalent; this is
part of the §2.11 extension surface alongside dedup — X2's sibling):
before training, any document that shares too many n-grams with an
evaluation benchmark must be dropped, or eval scores are contaminated.

Spark-first design, scale notes for the 100 TB case:

- The benchmark side is small (eval sets are KBs-MBs, corpus is TBs), so
  its distinct shingle set is **broadcast** into a map-side LEFT SEMI
  join against the corpus shingles — the corpus is never shuffled to
  compute the overlap, only aggregated per doc_id (partial count before
  the one shuffle on doc_id).
- Per-doc totals and overlap counts come from the same shingle frame;
  Catalyst reuses the scan, and both aggregations are map-side partial.
- No all-pairs anything: complexity is O(|corpus shingles|) with a
  broadcast hash probe, exactly like a bloom-filter pre-pass but exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kfai_pipeline_spark.operators.dedup import word_shingles


def benchmark_shingle_set(bench: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct shingle set of the benchmark frame: one column ``shingle``.

    Deduplicated across the whole benchmark (set semantics), small enough
    to broadcast by construction.
    """
    return (
        word_shingles(
            bench.select(F.lit(0).alias("__one"), text_col),
            text_col,
            "__one",
            n=n,
            repartition_to=None,  # tiny by construction — skip the widening probe
        )
        .select("shingle")
        .distinct()
    )


def contamination(
    corpus: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.1,
    repartition_to: int | str | None = "auto",
) -> DataFrame:
    """Per-document contamination ratio vs a benchmark set.

    Returns (id_col, n_shingles, n_overlap, ratio, contaminated) where
    ratio = |doc shingles ∩ benchmark shingles| / |doc shingles| and
    contaminated = ratio >= threshold. ``repartition_to``: see
    :func:`~kfai_pipeline_spark.operators.dedup.word_shingles` — the
    default ``"auto"`` widens a narrow corpus scan to full parallelism
    before the CPU-heavy shingling (the corpus side is exactly the
    frame that fix targets).
    """
    doc_sh = word_shingles(
        corpus.select(id_col, text_col), text_col, id_col, n=n,
        repartition_to=repartition_to,
    )
    bench_sh = benchmark_shingle_set(bench, text_col=text_col, n=n)

    # Single pass: a broadcast LEFT join tags each corpus shingle as
    # hit/miss, then ONE aggregation yields both the total and the
    # overlap — the corpus shingle pipeline (explode + per-doc distinct)
    # executes once, not once per branch as a totals⋈overlap join would.
    flagged = doc_sh.join(
        F.broadcast(bench_sh.withColumn("__hit", F.lit(1))), "shingle", "left"
    )
    per_doc = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_overlap"),
    )
    ratio = F.col("n_overlap") / F.col("n_shingles")
    return per_doc.select(
        id_col,
        "n_shingles",
        "n_overlap",
        F.round(ratio, 4).alias("ratio"),
        (ratio >= F.lit(threshold)).alias("contaminated"),
    )


def decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.1,
) -> DataFrame:
    """Drop contaminated documents: corpus rows whose overlap ratio is
    below ``threshold`` (LEFT ANTI against the flagged id set)."""
    flagged = (
        contamination(corpus, bench, text_col, id_col, n=n, threshold=threshold)
        .where(F.col("contaminated"))
        .select(id_col)
    )
    return corpus.join(flagged, id_col, "left_anti")
