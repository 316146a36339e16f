"""BM25 lexical retrieval (X33): score documents against a small set
of query terms with Okapi BM25 and return the global top-k.

The reference's retrieval is hybrid pgvector-ANN + ILIKE topic matching
(ref loaders/agents/query_agent.py:234-283); BM25 is the standard
lexical arm a Spark-side retrieval/eval pipeline needs next to the
cosine top-k of operators/similarity.py (Q27) — e.g. for building
hybrid-retrieval eval sets or mining hard negatives over a full corpus.

Scale shape (the part that matters at 100 TB):

- the corpus is exploded ONCE and filtered to the query terms
  MAP-SIDE (a literal ``IN`` list — query term sets are tiny), so only
  matching ``(doc, term)`` rows ever shuffle;
- per-term document frequencies come from a window over the already
  reduced tf frame (|hit docs|·|terms| rows, not corpus rows) — never
  a second derivation of the corpus explode;
- corpus-level stats (N, avgdl) ride a broadcast 1-row cross join
  (same pattern as unigram_logprob / tfidf_top_terms);
- the final top-k is ``orderBy().limit(k)`` — Spark plans
  TakeOrderedAndProject, never a global sort;
- a narrow few-file scan is widened to full parallelism before the
  CPU-heavy split/explode (same rationale as dedup._maybe_widen).

Scoring (Lucene-style BM25, all doubles):

    idf(t)      = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
    score(d)    = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

``dl`` is the whitespace token count (shared ``_words`` convention with
operators/text_analysis.py so oracles line up engine-to-engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kfai_pipeline_spark.operators.text_analysis import _words


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` docs by BM25 score for ``terms``; returns
    ``(id_col, bm25 ROUND 4, n_terms_hit)`` ordered by
    ``(bm25 DESC, id_col)``. Docs matching no query term never appear
    (score 0 rows are dropped before any shuffle)."""
    from pyspark.sql.window import Window

    from kfai_pipeline_spark.operators.dedup import _maybe_widen

    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    staged = _maybe_widen(docs).select(
        F.col(id_col), _words(text_col).alias("__w")
    ).select(id_col, F.col("__w"), F.size("__w").alias("__dl"))
    stats = staged.agg(
        F.count(F.lit(1)).alias("__n_docs"),
        F.avg("__dl").alias("__avgdl"),
    )
    hits = staged.select(
        id_col, "__dl", F.explode("__w").alias("__term")
    ).where(F.col("__term").isin(list(terms)))
    tf = hits.groupBy(id_col, "__term").agg(
        F.count(F.lit(1)).alias("__tf"), F.max("__dl").alias("__dl")
    )
    # df_t as a window over the REDUCED tf frame — re-deriving it from
    # the corpus would plan a second explode of every document
    tf = tf.withColumn(
        "__dfn", F.count(F.lit(1)).over(Window.partitionBy("__term"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n_docs") - F.col("__dfn") + 0.5) / (F.col("__dfn") + 0.5)
    )
    tf_norm = (
        F.col("__tf")
        * (k1 + 1.0)
        / (
            F.col("__tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl"))
        )
    )
    scored = tf.crossJoin(F.broadcast(stats)).select(
        F.col(id_col), F.col("__term"), (idf * tf_norm).alias("__contrib")
    )
    # Deterministic per-doc summation: fold the contributions in TERM
    # order (sorted struct array + left fold from 0.0) instead of
    # F.sum, whose partial-agg merge order depends on scheduling. FP
    # addition is not associative, so an unordered sum can flip the
    # 4th decimal at a rounding boundary — run-to-run AND cross-engine
    # (the oracle folds the identical sequence via list_reduce); same
    # determinism class as the q45 cents-domain percentile fix.
    ordered_sum = F.aggregate(
        F.sort_array(F.collect_list(F.struct("__term", "__contrib"))),
        F.lit(0.0),
        lambda acc, s: acc + s["__contrib"],
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.round(ordered_sum, 4).alias("bm25"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
        .orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(k)
    )
