"""Hybrid-retrieval rank fusion (X36): combine independently ranked
candidate lists (lexical BM25, vector cosine, ...) with Reciprocal
Rank Fusion.

The reference's retrieval IS hybrid — pgvector ANN distance plus ILIKE
topic matching fused by score sort (ref loaders/agents/query_agent.py:
258-283, 285-300); RRF is the standard engine-side fusion rule
(Cormack et al., SIGIR 2009):

    rrf(d) = sum_lists 1 / (c + rank_list(d))      (c = 60 by default)

Rank fusion runs on ALREADY-REDUCED top-n lists (k·#lists rows, not
corpus rows) — the heavy lifting happened upstream in bm25_topk /
cosine_topk, each with its own scale story. The fusion itself is a
chain of full-outer joins over tiny frames; Spark broadcasts them and
the cost is O(k·#lists) regardless of corpus size. Using integer RANKS
(not raw scores) makes the fusion portable across engines and immune
to score-scale mismatches between the lexical and vector arms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rrf_fuse(
    ranked_lists: list[DataFrame],
    id_col: str,
    k: int = 10,
    c: int = 60,
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse ranked lists (each ``(id_col, rank_col)`` with 1-based
    integer ranks) into ``(id_col, rrf ROUND 6, n_lists_hit)``, top-k
    by ``(rrf DESC, id_col)``. Items missing from a list contribute 0
    for it (the standard RRF convention)."""
    if not ranked_lists:
        raise ValueError("rrf_fuse needs at least one ranked list")
    out: DataFrame | None = None
    for i, df in enumerate(ranked_lists):
        r = df.select(F.col(id_col), F.col(rank_col).alias(f"__rank_{i}"))
        out = r if out is None else out.join(r, id_col, "full_outer")
    contribs = [
        F.coalesce(1.0 / (F.lit(c) + F.col(f"__rank_{i}")), F.lit(0.0))
        for i in range(len(ranked_lists))
    ]
    hits = [
        F.col(f"__rank_{i}").isNotNull().cast("int")
        for i in range(len(ranked_lists))
    ]
    score = contribs[0]
    for extra in contribs[1:]:
        score = score + extra
    n_hit = hits[0]
    for extra in hits[1:]:
        n_hit = n_hit + extra
    return (
        out.select(
            F.col(id_col),
            F.round(score, 6).alias("rrf"),
            n_hit.alias("n_lists_hit"),
        )
        .orderBy(F.col("rrf").desc(), F.col(id_col))
        .limit(k)
    )


def with_rank(
    df: DataFrame,
    order_by: list,
    rank_col: str = "rank",
) -> DataFrame:
    """Attach a 1-based dense position by ``order_by`` (row_number —
    deterministic when the ordering is total). Meant for ALREADY
    top-k-reduced frames: the single-partition window is O(k), not a
    corpus-wide sort."""
    from pyspark.sql.window import Window

    w = Window.orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w))
