"""RAG query plan (SURVEY.md §3.1): the reference's interactive
``process_query`` path re-expressed as DataFrame motion.

Stage map (ref /root/reference/src/kfai/loaders/agents/query_agent.py):

1. parse        — INJECTED parser (U5; LLM stays external): question ->
                  ParsedQuery(shows/hosts/topics/year terms)
2. compile      — build_filter + compile_filter -> Column predicate
                  (filtering.py:18-123)
3. retrieve     — Spark-side similarity over the chunk-document table
                  (query_agent.py:234-283; per-topic hybrid: ANN score +
                  title/text ILIKE OR-term)
4. post-process — score sort, first-seen dedup on (video_id,
                  start_time), cap k, chronological re-sort
                  (query_agent.py:285-306; W1/W2)
5. synthesize   — INJECTED answerer (U6; external LLM)
6. cite         — semi-join citations x docs on (video_id,
                  int(start_time)), group timestamps, render URLs
                  (query_agent.py:108-221; J6/A4/F14/F21)

LLM calls never touch executor code: parse/synthesize are driver-side
injected callables; everything between them is Spark.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kfai_pipeline_spark.operators.similarity import cosine, _as_double
from kfai_pipeline_spark.plans.filter_compiler import build_filter, compile_filter

CONTEXT_COUNT = 120  # ref loaders/utils/config.py:16
TIMESTAMP_BUFFER = 10  # ref loaders/utils/config.py:17


@dataclass
class ParsedQuery:
    """U5 output (ref loaders/utils/types.py:47-87)."""

    shows: list[str] = field(default_factory=list)
    hosts: list[str] = field(default_factory=list)
    topics: list[str] = field(default_factory=list)
    exact_year: int | None = None
    year_range: str | None = None
    before_year: int | None = None
    after_year: int | None = None


@dataclass
class Citation:
    video_id: str
    start_time: float


def metadata_predicate(parsed: ParsedQuery, current_year: int = 2026) -> Column:
    """Stages 2-3a: parsed terms -> one boolean Column. Hosts are matched
    with array_contains-friendly LIKE over the CSV form only when the
    docs table keeps CSV hosts; with ARRAY hosts we use exists()."""
    fdict = build_filter(
        shows=parsed.shows,
        hosts=parsed.hosts,
        exact_year=parsed.exact_year,
        year_range=parsed.year_range,
        before_year=parsed.before_year,
        after_year=parsed.after_year,
        current_year=current_year,
    )
    return compile_filter(fdict)


def topic_predicate(topics: list[str]) -> Column:
    """The per-topic hybrid OR-term: title/text ILIKE any topic
    (ref query_agent.py:264-271)."""
    if not topics:
        return F.lit(True)
    cond = F.lit(False)
    for t in topics:
        esc = t.replace("%", r"\%").replace("_", r"\_")
        cond = cond | F.col("title").ilike(f"%{esc}%") | F.col("text").ilike(f"%{esc}%")
    return cond


def retrieve(
    docs: DataFrame,
    query_vec: list[float],
    parsed: ParsedQuery,
    k: int = CONTEXT_COUNT,
    vec_col: str = "embedding",
) -> DataFrame:
    """Stages 3-4: filtered similarity retrieval + dedup/top-k/re-sort.

    Score = cosine(embedding, query_vec); the metadata predicate and the
    topic OR-term prune BEFORE scoring (Catalyst pushes both into the
    scan), so at 100 TB the expensive dot product only runs on the
    filtered slice."""
    qv = F.lit(query_vec).cast("array<double>")
    filtered = docs.where(metadata_predicate(parsed)).where(topic_predicate(parsed.topics))
    scored = filtered.withColumn("score", cosine(_as_double(vec_col), qv))

    # W1: first-seen dedup on (video_id, start_time) by score desc, cap k
    w = Window.partitionBy("video_id", "start_time").orderBy(F.desc("score"))
    top = (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
        .orderBy(F.desc("score"))
        .limit(k)
    )
    # W2: chronological re-sort for the context window
    return top.orderBy("published_at", "video_id", "start_time")


def cite(
    docs: DataFrame,
    citations: list[Citation],
    buffer_seconds: int = TIMESTAMP_BUFFER,
) -> DataFrame:
    """Stage 6: J6 semi-join of retrieved docs x LLM citations on
    (video_id, int(start_time)), then per-video timestamp grouping (A4)
    and URL/h:mm:ss rendering (F14/F21).

    Returns one row per cited video: (video_id, title, published_at,
    timestamps ARRAY<BIGINT> sorted, urls ARRAY<STRING>)."""
    from kfai_pipeline_spark.functions.datetime_fns import format_hms  # noqa: F401
    from kfai_pipeline_spark.functions.text import watch_url

    spark = docs.sparkSession
    cited = spark.createDataFrame(
        [(c.video_id, int(c.start_time)) for c in citations],
        "cite_vid string, cite_ts int",
    )
    matched = docs.withColumn(
        "int_start", F.col("start_time").cast("int")
    ).join(
        F.broadcast(cited),
        (F.col("video_id") == F.col("cite_vid")) & (F.col("int_start") == F.col("cite_ts")),
        "left_semi",
    )
    grouped = (
        matched.groupBy("video_id", "title", "published_at")
        .agg(
            F.sort_array(
                F.collect_set(
                    F.greatest(
                        F.col("start_time").cast("int") - buffer_seconds, F.lit(0)
                    ).cast("bigint")
                )
            ).alias("timestamps")
        )
        .orderBy("published_at", "video_id")
    )
    return grouped.withColumn(
        "urls",
        F.transform("timestamps", lambda t: watch_url(F.col("video_id"), t)),
    )


def answer_query(
    docs: DataFrame,
    question: str,
    parser: Callable[[str], ParsedQuery],
    embedder: Callable[[list[str]], list[list[float]]],
    synthesizer: Callable[[str, list[dict]], tuple[str, list[Citation]]],
    k: int = CONTEXT_COUNT,
) -> tuple[str, DataFrame]:
    """The full §3.1 lifecycle with injected LLM boundaries. Returns
    (answer_text, sources DataFrame)."""
    parsed = parser(question)
    qv = embedder([question])[0]
    context = retrieve(docs, qv, parsed, k=k)
    context_rows = [r.asDict() for r in context.collect()]  # ≤ k rows, driver-safe
    answer_text, citations = synthesizer(question, context_rows)
    sources = cite(context, citations)
    return answer_text, sources
