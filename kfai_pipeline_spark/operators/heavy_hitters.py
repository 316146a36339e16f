"""Heavy hitters (X34): exact frequent-word extraction at unbounded
vocabulary via Misra-Gries candidate generation + exact verification.

A 100 TB corpus has an unbounded token vocabulary; a plain
``groupBy(word).count`` shuffles the whole vocabulary even though only
the few globally frequent words are wanted (stopword induction,
boilerplate-token discovery, tokenizer sanity checks). The classic
streaming answer is Misra-Gries: with ``k`` counters, every item whose
true frequency exceeds n/(k+1) survives. MG summaries are MERGEABLE
(Agarwal et al., "Mergeable Summaries", PODS 2012): combine counter
maps, subtract the (k+1)-th largest count, drop non-positives — which
makes the kernel batch-friendly (vectorized ``value_counts`` per Arrow
batch, one merge per batch) instead of a per-row Python loop.

Two-phase plan:

1. **Candidates** (bounded memory, no shuffle): ``mapInPandas`` runs a
   mergeable MG summary per partition and emits its ≤k surviving words.
   Any word with global count·k > N must exceed n_p/k in some partition
   (pigeonhole over the per-partition deficits), and MG(k) keeps every
   word above n_p/(k+1) ≥ threshold, so the union of per-partition
   candidates is a GUARANTEED superset of the true heavy hitters —
   at most k·#partitions rows total.
2. **Exact verify**: re-scan, broadcast-semi-join the candidate list
   BEFORE aggregating (so only candidate words shuffle — ≤k·#partitions
   distinct keys), count exactly, and keep ``cnt·k > N`` against the
   broadcast 1-row corpus total.

The final output is EXACT (the sketch only prunes the search space), so
it hash-checks against a plain SQL ``HAVING cnt * k > total`` oracle —
candidate-set variation across partitionings can never change the
answer.
"""

from __future__ import annotations

from collections.abc import Iterator
from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kfai_pipeline_spark.operators.text_analysis import _words


def _mg_merge(counters: dict[str, int], batch: dict[str, int], k: int) -> dict[str, int]:
    """Merge a batch's exact counts into an MG summary, shrinking back
    to ≤k counters by subtracting the (k+1)-th largest count (the
    mergeable-summaries reduction; error stays ≤ n/(k+1) overall)."""
    for w, c in batch.items():
        counters[w] = counters.get(w, 0) + int(c)
    if len(counters) > k:
        vals = sorted(counters.values(), reverse=True)
        sub = vals[k]
        counters = {w: c - sub for w, c in counters.items() if c > sub}
    return counters


def heavy_hitters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 50,
    scope=None,
) -> DataFrame:
    """Words with global frequency strictly above N/``k``, with exact
    counts: ``(word, cnt, frac ROUND 4)`` ordered by
    ``(cnt DESC, word)``.

    The tiny MG-candidate frame is cached so both consumers share one
    corpus pass; pass ``scope`` (a :class:`~kfai_pipeline_spark.
    operators.dedup.CacheScope`) — or use :func:`heavy_hitters_scoped`
    — to release it deterministically. With ``scope=None`` the cached
    frame (≤(k+1)·#partitions rows) lives for the session; fine for a
    one-shot call, but LOOPED callers should use the scoped form so
    repeated calls don't accrete cached frames."""
    import pandas as pd

    from kfai_pipeline_spark.operators.dedup import _maybe_widen

    if k < 1:
        raise ValueError(f"heavy_hitters needs k >= 1, got {k}")

    wide = _maybe_widen(df)
    words = wide.select(F.explode(_words(text_col)).alias("w")).where(
        F.col("w") != ""
    )

    def mg_candidates(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        # The kernel receives DOCUMENTS and splits in pandas — shipping
        # 50k texts over Arrow instead of millions of exploded word
        # rows (measured ~2x on the sf1 spot suite). The split regex is
        # Java's ASCII \s class so candidate tokenization can never
        # diverge from the JVM-side exact recount below (a divergence
        # could silently drop a true heavy hitter from the superset).
        # The kernel also emits its partition's token total as a
        # NULL-word sentinel row — it already touches every token, so
        # the corpus total rides along instead of costing a separate
        # full scan+tokenize pass.
        counters: dict[str, int] = {}
        n_tokens = 0
        for pdf in batches:
            toks = (
                pdf[text_col]
                .dropna()
                .str.split(r"[ \t\n\x0b\f\r]+")
                .explode()
            )
            toks = toks[toks.notna() & (toks != "")]
            vc = toks.value_counts()
            n_tokens += int(vc.sum())
            counters = _mg_merge(counters, vc.to_dict(), k)
        yield pd.DataFrame(
            {
                "w": pd.array(sorted(counters) + [None], dtype="string"),
                "n": pd.array([0] * len(counters) + [n_tokens], dtype="int64"),
            }
        )

    # Cache the tiny kernel output (<= (k+1)·#partitions rows) so the
    # candidate and total branches share ONE MG pass. persist(), not
    # localCheckpoint(): it keeps the operator lazy (no job runs until
    # the caller acts on the result) and stays recomputable from
    # lineage after executor loss, where a local checkpoint would kill
    # a long-running job. The cached frame is bounded and survives for
    # the session unless the caller unpersists.
    from pyspark import StorageLevel

    mg = (
        wide.select(F.col(text_col))
        .mapInPandas(mg_candidates, "w string, n bigint")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if scope is not None:
        scope.add(mg)
    candidates = mg.where(F.col("w").isNotNull()).select("w").dropDuplicates(["w"])
    total = mg.agg(F.sum("n").alias("__n"))
    exact = (
        words.join(F.broadcast(candidates), "w", "left_semi")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .where(F.col("cnt") * k > F.col("__n"))
        .select(
            F.col("w").alias("word"),
            "cnt",
            F.round(F.col("cnt") / F.col("__n"), 4).alias("frac"),
        )
        .orderBy(F.col("cnt").desc(), "word")
    )


@contextmanager
def heavy_hitters_scoped(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 50,
):
    """Scoped twin of :func:`heavy_hitters` (same contract as
    ``minhash_dedup_scoped``): materialize the result inside the
    ``with`` block; the cached MG-candidate frame releases on exit —
    the entry point for loops over many corpora."""
    from kfai_pipeline_spark.operators.dedup import CacheScope

    scope = CacheScope()
    try:
        yield heavy_hitters(df, text_col, id_col, k, scope=scope)
    finally:
        scope.release()
