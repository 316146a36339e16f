"""Training-data pipeline queries (SURVEY.md §2.11 extension surface,
round-2 additions): decontamination, repetition filters, deterministic
sampling, quantiles, PII redaction, shard packing, radius search.

Each operator is the Spark-first answer to a concrete 100 TB
training-data need; every query here is hash-checked against a DuckDB
oracle (the portable-md5 trick from q49/q55 makes even the hash-based
ones checkable).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kfai_pipeline_spark.catalog import load_table
from kfai_pipeline_spark.operators import decontaminate as DC
from kfai_pipeline_spark.queries.base import register


# ------------------------------------------------------- q61: decontamination
@register(
    "q61_decontaminate",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(text, '\\s+') AS w FROM documents
    ),
    sh AS (
        SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
        FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(w)-2,1)+1)) AS i) t
    ),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 = 0),
    corpus AS (SELECT * FROM sh WHERE doc_id % 10 <> 0),
    tot AS (SELECT doc_id, count(*) AS n_shingles FROM corpus GROUP BY 1),
    ov AS (
        SELECT c.doc_id, count(*) AS n_overlap
        FROM corpus c JOIN bench b ON c.shingle = b.shingle
        GROUP BY 1
    )
    SELECT t.doc_id,
           t.n_shingles,
           COALESCE(o.n_overlap, 0) AS n_overlap,
           ROUND(COALESCE(o.n_overlap, 0) * 1.0 / t.n_shingles, 4) AS ratio,
           COALESCE(o.n_overlap, 0) * 1.0 / t.n_shingles >= 0.2 AS contaminated
    FROM tot t LEFT JOIN ov o ON o.doc_id = t.doc_id
    ORDER BY t.doc_id
    """,
    doc=(
        "Benchmark decontamination (operators/decontaminate.py): word-3-gram "
        "overlap ratio of each corpus doc (doc_id%10!=0) vs the benchmark "
        "set (doc_id%10=0); benchmark shingles broadcast into a map-side "
        "semi join — the corpus side never shuffles to compute overlap."
    ),
)
def q61_decontaminate(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    bench = docs.where(F.col("doc_id") % 10 == 0)
    return DC.contamination(
        corpus, bench, text_col="text", id_col="doc_id", n=3, threshold=0.2
    ).orderBy("doc_id")


# ------------------------------------------------- q62: repetition filters
@register(
    "q62_repetition",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ),
    wx AS (SELECT doc_id, unnest(w) AS word FROM toks),
    wc AS (SELECT doc_id, word, count(*) AS c FROM wx GROUP BY 1, 2),
    word_stats AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
               COUNT(*) AS n_distinct_words,
               MAX(c) AS top_word_count
        FROM wc GROUP BY 1
    ),
    bx AS (
        SELECT doc_id, array_to_string(w[i:i+1], ' ') AS bigram
        FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(w)-1,0)+1)) AS i) t
        WHERE len(w) >= 2
    ),
    bc AS (SELECT doc_id, bigram, count(*) AS c FROM bx GROUP BY 1, 2),
    bi_stats AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
               COUNT(*) AS n_distinct_bigrams
        FROM bc GROUP BY 1
    )
    SELECT w.doc_id,
           w.n_words,
           w.n_distinct_words,
           ROUND(1.0 - w.n_distinct_words * 1.0 / w.n_words, 4) AS dup_word_frac,
           ROUND(w.top_word_count * 1.0 / w.n_words, 4) AS top_word_frac,
           COALESCE(b.n_bigrams, 0) AS n_bigrams,
           CASE WHEN COALESCE(b.n_bigrams, 0) > 0
                THEN ROUND(1.0 - COALESCE(b.n_distinct_bigrams, 0) * 1.0
                           / COALESCE(b.n_bigrams, 0), 4)
                ELSE 0.0 END AS dup_bigram_frac
    FROM word_stats w LEFT JOIN bi_stats b ON b.doc_id = w.doc_id
    ORDER BY w.doc_id
    """,
    doc=(
        "Gopher-style repetition quality gate (text_analysis."
        "repetition_features): duplicate-word fraction, top-word fraction, "
        "duplicate-bigram fraction per doc — explode + two-level hash agg, "
        "map-side partials, no arrays held whole per row."
    ),
)
def q62_repetition(spark, sf_dir):
    from kfai_pipeline_spark.operators import text_analysis as TA

    docs = load_table(spark, sf_dir, "documents")
    return TA.repetition_features(docs, "text", "doc_id").orderBy("doc_id")
