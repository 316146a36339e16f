"""Training-data pipeline queries (SURVEY.md §2.11 extension surface,
round-2 additions, q61-q78): benchmark decontamination, repetition
filters, deterministic/stratified/mixture sampling, length quantiles,
PII redaction, shard packing, boilerplate-line removal, radius search,
fixed-window chunking, the composed curation funnel, semantic dedup
(SemDeDup), unigram-LM quality scoring, context packing, and mixture
upsampling with epochs.

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
        SELECT doc_id, string_split_regex(text, '[\\s\\x0B]+') AS w FROM documents
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
        SELECT doc_id, string_split_regex(trim(text), '[\\s\\x0B]+') AS w FROM documents
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


# ------------------------------------------------- q63: deterministic sample
@register(
    "q63_hash_sample",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
          % 10000 < 1000
    ORDER BY doc_id
    """,
    doc=(
        "Deterministic 10% corpus sample (operators/sampling.hash_sample): "
        "keep iff hash(key) mod 10k < 1k — a pure filter, no shuffle, and "
        "the row set is a function of the key alone (stable across "
        "partitioning/cluster changes, unlike df.sample). md5-prefix hash "
        "arm for oracle portability; xxhash64 is the production default."
    ),
)
def q63_hash_sample(spark, sf_dir):
    from kfai_pipeline_spark.operators.sampling import hash_sample
    from kfai_pipeline_spark.operators.text_analysis import md5_long

    docs = load_table(spark, sf_dir, "documents")
    return (
        hash_sample(docs, "doc_id", 0.10, hash_fn=md5_long)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


# ------------------------------------------------- q64: stratified sample
@register(
    "q64_stratified_sample",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
                            doc_id
               ) AS rn
        FROM documents
    )
    SELECT doc_id, lang FROM ranked WHERE rn <= 20 ORDER BY lang, doc_id
    """,
    doc=(
        "Deterministic 20-per-language eval slice (sampling."
        "stratified_sample): rank by stable hash within each stratum, keep "
        "the k smallest — a fixed permutation per stratum, one shuffle on "
        "the stratum key."
    ),
)
def q64_stratified_sample(spark, sf_dir):
    from kfai_pipeline_spark.operators.sampling import stratified_sample
    from kfai_pipeline_spark.operators.text_analysis import md5_long

    docs = load_table(spark, sf_dir, "documents")
    out = stratified_sample(docs, "lang", 20, "doc_id", hash_fn=md5_long)
    return out.select("doc_id", "lang").orderBy("lang", "doc_id")


# ------------------------------------------------- q65: length quantiles
@register(
    "q65_quantiles",
    oracle="""
    WITH toks AS (
        SELECT lang,
               CASE WHEN len(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '[\\s\\x0B]+')) END AS n_tok
        FROM documents
    )
    SELECT lang, COUNT(*) AS n,
           ROUND(quantile_cont(n_tok, 0.25), 4) AS p25,
           ROUND(quantile_cont(n_tok, 0.50), 4) AS p50,
           ROUND(quantile_cont(n_tok, 0.75), 4) AS p75,
           ROUND(quantile_cont(n_tok, 0.95), 4) AS p95,
           ROUND(quantile_cont(n_tok, 0.99), 4) AS p99
    FROM toks GROUP BY lang ORDER BY lang
    """,
    doc=(
        "Per-language token-count quantiles (text_analysis."
        "length_quantiles, exact arm = percentile_cont semantics): the "
        "distribution view behind length-filter thresholds. approx arm "
        "(approx_percentile sketch, mergeable map-side) is the 100 TB "
        "path — exact percentile buffers a per-group value map."
    ),
)
def q65_quantiles(spark, sf_dir):
    from kfai_pipeline_spark.operators.text_analysis import (
        length_quantiles,
        token_count,
    )

    docs = load_table(spark, sf_dir, "documents")
    return length_quantiles(docs, token_count("text"), by="lang")


# ------------------------------------------------- q66: PII redaction
@register(
    "q66_pii_redact",
    oracle="""
    WITH base AS (
        SELECT doc_id,
               text || ' contact user' || doc_id || '@example.com or 10.0.'
                    || (doc_id % 256) || '.1 ssn 123-45-6789 call +1 (555) 010-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
        FROM documents
    ),
    s1 AS (
        SELECT doc_id,
               len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email,
               regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g') AS t
        FROM base
    ),
    s2 AS (
        SELECT doc_id, n_email,
               len(regexp_extract_all(t, '\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b')) AS n_ssn,
               regexp_replace(t, '\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b', '[SSN]', 'g') AS t
        FROM s1
    ),
    s3 AS (
        SELECT doc_id, n_email, n_ssn,
               len(regexp_extract_all(t, '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')) AS n_ip,
               regexp_replace(t, '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '[IP]', 'g') AS t
        FROM s2
    ),
    s4 AS (
        SELECT doc_id, n_email, n_ssn, n_ip,
               len(regexp_extract_all(t, '\\+?[0-9][0-9()\\- ]{6,}[0-9]\\b')) AS n_phone,
               regexp_replace(t, '\\+?[0-9][0-9()\\- ]{6,}[0-9]\\b', '[PHONE]', 'g') AS t
        FROM s3
    )
    SELECT doc_id, n_email, n_ssn, n_ip, n_phone, t AS redacted
    FROM s4 ORDER BY doc_id
    """,
    doc=(
        "PII redaction (operators/redact.redact_pii): email/SSN/IP/phone "
        "replaced with typed tags + per-type counts, all regexp_replace/"
        "regexp_count in codegen — a pure map, no shuffle. The fixture "
        "corpus has no PII, so the query plants deterministic PII derived "
        "from doc_id on BOTH engines, then redacts it."
    ),
)
def q66_pii_redact(spark, sf_dir):
    from kfai_pipeline_spark.operators.redact import redact_pii

    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com or 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".1 ssn 123-45-6789 call +1 (555) 010-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("t"),
    )
    return (
        redact_pii(planted, "t", out_col="redacted")
        .select("doc_id", "n_email", "n_ssn", "n_ip", "n_phone", "redacted")
        .orderBy("doc_id")
    )


# ------------------------------------------------- q67: shard packing
@register(
    "q67_shard_pack",
    oracle="""
    WITH d AS (
        SELECT doc_id, n_chars,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                    % 8 AS INT) AS bucket
        FROM documents
    ),
    r AS (
        SELECT *,
               COALESCE(SUM(n_chars) OVER (
                   PARTITION BY bucket ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS run
        FROM d
    ),
    t AS (SELECT bucket, SUM(n_chars) AS tot FROM d GROUP BY 1),
    o AS (
        SELECT bucket,
               COALESCE(SUM(tot) OVER (
                   ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS base
        FROM t
    )
    SELECT r.doc_id, r.bucket,
           CAST(r.run + o.base AS BIGINT) AS global_offset,
           CAST(FLOOR((r.run + o.base) / 10000.0) AS INT) AS shard
    FROM r JOIN o ON o.bucket = r.bucket
    ORDER BY r.doc_id
    """,
    doc=(
        "Shard packing (operators/shard_pack.pack_shards): assign docs to "
        "~10k-char output shards via a two-level parallel prefix sum — "
        "per-bucket window cumsums run fully parallel; the only "
        "single-partition step is the O(buckets) offset prefix, broadcast "
        "back. Never a global one-task window over the corpus."
    ),
)
def q67_shard_pack(spark, sf_dir):
    from kfai_pipeline_spark.operators.shard_pack import pack_shards
    from kfai_pipeline_spark.operators.text_analysis import md5_long

    docs = load_table(spark, sf_dir, "documents")
    packed = pack_shards(
        docs, "n_chars", "doc_id", cap=10_000, buckets=8, hash_fn=md5_long
    )
    return packed.select("doc_id", "bucket", "global_offset", "shard").orderBy(
        "doc_id"
    )


# ------------------------------------------------- q68: boilerplate strip
_Q68_SPLIT = r"((?:\S+\s+){7}\S+)\s+"
_Q68_BP1 = "subscribe to our newsletter"
_Q68_BP2 = "follow us on social media"


@register(
    "q68_boilerplate_strip",
    oracle=f"""
    WITH base AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN '{_Q68_BP1}' || chr(10) ELSE '' END
               || regexp_replace(text, '{_Q68_SPLIT}',
                                 '\\1' || chr(10), 'g')
               || CASE WHEN doc_id % 5 = 0 THEN chr(10) || '{_Q68_BP2}' ELSE '' END
                  AS t
        FROM documents
    ),
    toks AS (SELECT doc_id, string_split(t, chr(10)) AS l FROM base),
    lines AS (
        SELECT doc_id, unnest(l) AS line, generate_subscripts(l, 1) AS pos
        FROM toks
    ),
    bp AS (
        SELECT line FROM (
            SELECT line, COUNT(DISTINCT doc_id) AS n_docs
            FROM lines WHERE len(trim(line)) > 0 GROUP BY 1
        ) WHERE n_docs >= 10
    ),
    kept AS (SELECT * FROM lines WHERE line NOT IN (SELECT line FROM bp)),
    re AS (
        SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text
        FROM kept GROUP BY 1
    )
    SELECT d.doc_id, COALESCE(re.clean_text, '') AS clean_text
    FROM documents d LEFT JOIN re ON re.doc_id = d.doc_id
    ORDER BY d.doc_id
    """,
    doc=(
        "CCNet-style boilerplate line removal (dedup.strip_boilerplate): "
        "lines repeated across >=10 docs are dropped, survivors reassemble "
        "in position order. The single-line fixture docs are first split "
        "into 8-word lines and salted with two planted boilerplate lines "
        "on BOTH engines (%3 header, %5 footer). Scale shape: line-count "
        "agg + broadcast anti join + one per-doc regroup."
    ),
)
def q68_boilerplate_strip(spark, sf_dir):
    from kfai_pipeline_spark.operators.dedup import strip_boilerplate

    docs = load_table(spark, sf_dir, "documents")
    salted = docs.select(
        "doc_id",
        F.concat(
            F.when(F.col("doc_id") % 3 == 0, F.lit(_Q68_BP1 + "\n")).otherwise(
                F.lit("")
            ),
            F.regexp_replace(F.col("text"), _Q68_SPLIT, "$1\n"),
            F.when(F.col("doc_id") % 5 == 0, F.lit("\n" + _Q68_BP2)).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    return strip_boilerplate(salted, "text", "doc_id", min_docs=10).orderBy("doc_id")


# ------------------------------------------------- q69: radius search
@register(
    "q69_radius_search",
    oracle="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 4) AS score
    FROM embeddings e, q
    WHERE e.vec_id <> 0
      AND ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 4) >= 0.35
    ORDER BY e.vec_id
    """,
    doc=(
        "Radius (threshold) similarity search (similarity.cosine_radius): "
        "all vectors with cosine >= 0.35 to the query — data-dependent "
        "result size, query broadcast, threshold filter runs map-side in "
        "the scan stage; unlike top-k there is NO shuffle at all."
    ),
)
def q69_radius_search(spark, sf_dir):
    from kfai_pipeline_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), "embedding"
    )
    corpus = emb.where(F.col("vec_id") != 0)
    return (
        S.cosine_radius(corpus, queries, tau=0.35)
        .select("vec_id", "score")
        .orderBy("vec_id")
    )


# ------------------------------------------------- q70: fixed-window chunker
@register(
    "q70_fixed_chunks",
    oracle="""
    WITH t AS (SELECT doc_id, text FROM documents WHERE len(text) > 0),
    c AS (
        SELECT doc_id,
               CAST(generate_subscripts(range(1, len(text) + 1, 150), 1) - 1
                    AS INT) AS chunk_idx,
               substr(text, unnest(range(1, len(text) + 1, 150)), 200) AS chunk
        FROM t
    )
    SELECT doc_id, chunk_idx, chunk,
           chunk_idx * 150 + 1 AS start
    FROM c ORDER BY doc_id, chunk_idx
    """,
    doc=(
        "Fixed-size sliding-window chunker (chunker.fixed_window_chunks, "
        "size=200 stride=150): the at-scale SQL-expressible arm of W3/U4 — "
        "pure JVM sequence+substr+posexplode, zero Python, zero shuffle. "
        "The recursive separator-aware splitter (q37) stays the "
        "reference-faithful Arrow-batched arm."
    ),
)
def q70_fixed_chunks(spark, sf_dir):
    from kfai_pipeline_spark.operators.chunker import fixed_window_chunks

    docs = load_table(spark, sf_dir, "documents")
    return (
        fixed_window_chunks(docs, "text", "doc_id", size=200, stride=150)
        .select("doc_id", "chunk_idx", "chunk", "start")
        .orderBy("doc_id", "chunk_idx")
    )


# ------------------------------------------------- q71: curation funnel
@register(
    "q71_curation_funnel",
    oracle="""
    WITH feats AS (
        SELECT doc_id, text,
               CASE WHEN len(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '[\\s\\x0B]+')) END AS n_tokens,
               len(list_filter(string_split_regex(trim(text), '[\\s\\x0B]+'),
                   w -> lower(w) IN ('the','and','of','to','a','in','is','that','with','for')
               )) AS stop_hits
        FROM documents
    ),
    f2 AS (
        SELECT doc_id, n_tokens,
               n_tokens BETWEEN 40 AND 80 AS ok_len,
               (n_tokens BETWEEN 40 AND 80)
                   AND stop_hits * 1.0 / n_tokens >= 0.03 AS ok_quality,
               md5(text) AS h,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                   % 10000 < 5000 AS sample_keep
        FROM feats
    ),
    f3 AS (
        SELECT *,
               ok_quality AND doc_id = MIN(CASE WHEN ok_quality THEN doc_id END)
                   OVER (PARTITION BY h) AS ok_dedup
        FROM f2
    ),
    f4 AS (SELECT *, ok_dedup AND sample_keep AS ok_sample FROM f3),
    agg AS (
        SELECT COUNT(*) AS n_raw,
               CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) AS t_raw,
               COUNT(*) FILTER (ok_len) AS n_len,
               CAST(COALESCE(SUM(n_tokens) FILTER (ok_len), 0) AS BIGINT) AS t_len,
               COUNT(*) FILTER (ok_quality) AS n_q,
               CAST(COALESCE(SUM(n_tokens) FILTER (ok_quality), 0) AS BIGINT) AS t_q,
               COUNT(*) FILTER (ok_dedup) AS n_d,
               CAST(COALESCE(SUM(n_tokens) FILTER (ok_dedup), 0) AS BIGINT) AS t_d,
               COUNT(*) FILTER (ok_sample) AS n_s,
               CAST(COALESCE(SUM(n_tokens) FILTER (ok_sample), 0) AS BIGINT) AS t_s
        FROM f4
    )
    SELECT 1 AS stage_no, 'raw' AS stage, n_raw AS n_docs, t_raw AS n_tokens FROM agg
    UNION ALL SELECT 2, 'length', n_len, t_len FROM agg
    UNION ALL SELECT 3, 'quality', n_q, t_q FROM agg
    UNION ALL SELECT 4, 'dedup', n_d, t_d FROM agg
    UNION ALL SELECT 5, 'sample', n_s, t_s FROM agg
    ORDER BY stage_no
    """,
    doc=(
        "Composed curation funnel (plans/curation.py): length gate -> "
        "quality gate -> exact-dedup keeper election -> deterministic 50% "
        "sample, reported as per-stage (docs, tokens). Single-pass: every "
        "stage is a cumulative flag COLUMN (one scan + one window shuffle "
        "+ one agg), and the funnel rows unpivot from the single agg row — "
        "never one scan per stage."
    ),
)
def q71_curation_funnel(spark, sf_dir):
    from kfai_pipeline_spark.plans.curation import curation_funnel

    docs = load_table(spark, sf_dir, "documents")
    return curation_funnel(docs)


# ------------------------------------------------- q73: mixture sampling
@register(
    "q73_mixture_sample",
    oracle="""
    WITH tot AS (
        SELECT source, SUM(n_chars) AS tok_s,
               CASE WHEN source IN ('src0', 'src1') THEN 3.0 ELSE 1.0 END AS w
        FROM documents GROUP BY source
    ),
    rates AS (
        SELECT source,
               ROUND(LEAST(1.0,
                     (w / SUM(w) OVER ()) * 0.5 * SUM(tok_s) OVER () / tok_s),
                     6) AS rate
        FROM tot
    )
    SELECT d.doc_id, d.source, d.n_chars, r.rate
    FROM documents d JOIN rates r ON r.source = d.source
    WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
          % 10000 < r.rate * 10000
    ORDER BY d.doc_id
    """,
    doc=(
        "Token-budget mixture sampling (sampling.mixture_sample): "
        "per-source keep rate = min(1, w_norm * budget * total_tokens / "
        "source_tokens) — src0/src1 up-weighted 3x, 50% token budget. One "
        "#sources-row aggregate broadcast back + the deterministic hash "
        "filter; the corpus is scanned once and never shuffled."
    ),
)
def q73_mixture_sample(spark, sf_dir):
    from kfai_pipeline_spark.operators.sampling import mixture_sample
    from kfai_pipeline_spark.operators.text_analysis import md5_long

    docs = load_table(spark, sf_dir, "documents")
    out = mixture_sample(
        docs,
        source_col="source",
        weights={"src0": 3.0, "src1": 3.0},
        token_col="n_chars",
        budget_frac=0.5,
        key_col="doc_id",
        hash_fn=md5_long,
    )
    return out.select("doc_id", "source", "n_chars", "rate").orderBy("doc_id")


# ------------------------------------------------- q74: semantic dedup
@register(
    "q74_semantic_dedup",
    oracle="""
    WITH RECURSIVE pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE ROUND(list_cosine_similarity(
                  CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])
              ), 4) >= 0.55
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    cc(id, comp) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e.dst, c.comp FROM cc c JOIN edges e ON e.src = c.id
    ),
    comp AS (SELECT id, MIN(comp) AS component FROM cc GROUP BY id)
    SELECT e.vec_id,
           COALESCE(c.component, e.vec_id) AS group_id,
           e.vec_id = COALESCE(c.component, e.vec_id) AS is_keeper
    FROM embeddings e LEFT JOIN comp c ON c.id = e.vec_id
    ORDER BY e.vec_id
    """,
    doc=(
        "SemDeDup-style semantic dedup (dedup.semantic_dedup): groups = "
        "transitive closure of cosine>=0.55 edges, keeper = min-id per "
        "group, singletons kept via LEFT join (never materialized as "
        "edges). Brute pair arm for the oracle (eval scale, mirrors "
        "q36); production default is sign-LSH banding + the same "
        "components/keeper tail."
    ),
)
def q74_semantic_dedup(spark, sf_dir):
    from kfai_pipeline_spark.operators.dedup import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(
        emb, threshold=0.55, use_lsh=False
    ).orderBy("vec_id")


# ------------------------------------------------- q75: unigram logprob
@register(
    "q75_unigram_logprob",
    oracle="""
    WITH wx AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '[\\s\\x0B]+')) AS w
        FROM documents
    ),
    freq AS (SELECT w, count(*) AS c FROM wx GROUP BY 1),
    tot AS (SELECT SUM(c) AS n FROM freq),
    scored AS (
        SELECT wx.doc_id, ln(f.c * 1.0 / t.n) AS lp
        FROM wx JOIN freq f ON f.w = wx.w CROSS JOIN tot t
    )
    SELECT doc_id, ROUND(AVG(lp), 4) AS avg_logprob, COUNT(*) AS n_words
    FROM scored GROUP BY 1 ORDER BY doc_id
    """,
    doc=(
        "Unigram-LM quality score (text_analysis.unigram_logprob): "
        "per-doc mean ln(corpus word frequency) — the SQL-expressible "
        "stand-in for CCNet's LM-perplexity filter. Corpus total rides a "
        "broadcast 1-row cross join (never a vocabulary-wide window); "
        "the frequency join shuffles on the word key only."
    ),
)
def q75_unigram_logprob(spark, sf_dir):
    from kfai_pipeline_spark.operators.text_analysis import unigram_logprob

    docs = load_table(spark, sf_dir, "documents")
    return unigram_logprob(docs).orderBy("doc_id")


# ------------------------------------------------- q77: context packing
@register(
    "q77_context_pack",
    oracle="""
    WITH d AS (
        SELECT doc_id, n_chars, text,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                    % 8 AS INT) AS bucket
        FROM documents
    ),
    r AS (
        SELECT *,
               COALESCE(SUM(n_chars) OVER (
                   PARTITION BY bucket ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS run
        FROM d
    ),
    t AS (SELECT bucket, SUM(n_chars) AS tot FROM d GROUP BY 1),
    o AS (
        SELECT bucket,
               COALESCE(SUM(tot) OVER (
                   ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS base
        FROM t
    ),
    packed AS (
        SELECT r.doc_id, r.text,
               CAST(r.run + o.base AS BIGINT) AS global_offset,
               CAST(FLOOR((r.run + o.base) / 10000.0) AS INT) AS shard
        FROM r JOIN o ON o.bucket = r.bucket
    ),
    shard_text AS (
        SELECT shard, string_agg(text, ' ' ORDER BY global_offset) AS t
        FROM packed GROUP BY shard
    ),
    ctx AS (
        SELECT shard,
               CAST(generate_subscripts(range(1, len(t) + 1, 2048), 1) - 1
                    AS INT) AS ctx_idx,
               substr(t, unnest(range(1, len(t) + 1, 2048)), 2048) AS context
        FROM shard_text WHERE len(t) > 0
    )
    SELECT shard, ctx_idx, context FROM ctx ORDER BY shard, ctx_idx
    """,
    doc=(
        "Context packing — the full pretraining packing story composed "
        "from two checked primitives: pack_shards assigns docs to "
        "~10k-char shards (two-level parallel prefix sum), each shard "
        "concatenates its docs in global-offset order (bounded by cap, "
        "never corpus-sized), and fixed 2048-char training windows are "
        "cut with the q70 chunker (stride == size: no overlap, docs "
        "cross window boundaries exactly as training loaders pack them)."
    ),
)
def q77_context_pack(spark, sf_dir):
    from kfai_pipeline_spark.operators.chunker import fixed_window_chunks
    from kfai_pipeline_spark.operators.shard_pack import pack_shards
    from kfai_pipeline_spark.operators.text_analysis import md5_long

    docs = load_table(spark, sf_dir, "documents")
    packed = pack_shards(
        docs, "n_chars", "doc_id", cap=10_000, buckets=8, hash_fn=md5_long
    )
    shard_text = packed.groupBy("shard").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("global_offset", "text"))),
                lambda s: s["text"],
            ),
            " ",
        ).alias("t")
    )
    ctx = fixed_window_chunks(shard_text, "t", "shard", size=2048, stride=2048)
    return ctx.select(
        "shard", F.col("chunk_idx").alias("ctx_idx"), F.col("chunk").alias("context")
    ).orderBy("shard", "ctx_idx")


# ------------------------------------------------- q78: mixture epochs
@register(
    "q78_mixture_epochs",
    oracle="""
    WITH tot AS (
        SELECT source, SUM(n_chars) AS tok_s,
               CASE WHEN source = 'src0' THEN 8.0 ELSE 1.0 END AS w
        FROM documents GROUP BY source
    ),
    rates AS (
        SELECT source,
               ROUND(LEAST(4.0,
                     (w / SUM(w) OVER ()) * 0.5 * SUM(tok_s) OVER () / tok_s),
                     6) AS rate
        FROM tot
    ),
    rep AS (
        SELECT d.doc_id, d.source, r.rate, u.copy
        FROM documents d
        JOIN rates r ON r.source = d.source,
        LATERAL (SELECT unnest(range(0, CAST(CEIL(r.rate) AS INT))) AS copy) u
    )
    SELECT doc_id, source, copy, rate
    FROM rep
    WHERE copy < FLOOR(rate)
       OR ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#'
                              || CAST(copy AS VARCHAR)), 1, 15))::BIGINT
          % 10000 < (rate - FLOOR(rate)) * 10000
    ORDER BY doc_id, copy
    """,
    doc=(
        "Mixture upsampling with epochs (sampling.mixture_upsample): "
        "src0 up-weighted 8x so its target share exceeds its size — rows "
        "replicate floor(rate) times plus a hash-decided fractional "
        "copy, capped at 4 epochs. Same broadcast-rate/no-corpus-shuffle "
        "shape as q73; the explode is bounded by ceil(max_epochs)."
    ),
)
def q78_mixture_epochs(spark, sf_dir):
    from kfai_pipeline_spark.operators.sampling import mixture_upsample
    from kfai_pipeline_spark.operators.text_analysis import md5_long

    docs = load_table(spark, sf_dir, "documents")
    out = mixture_upsample(
        docs,
        source_col="source",
        weights={"src0": 8.0},
        token_col="n_chars",
        budget_frac=0.5,
        key_col="doc_id",
        max_epochs=4.0,
        hash_fn=md5_long,
    )
    return out.select("doc_id", "source", "copy", "rate").orderBy("doc_id", "copy")


# ------------------------------------------------- q81: TF-IDF top terms
@register(
    "q81_tfidf_terms",
    # Same ln() parity ground as q75 (both engines evaluate natural log
    # on identical count-ratio doubles); rank by the ROUNDED score then
    # term so tie order is engine-independent.
    oracle="""
    WITH w AS (
        SELECT doc_id, lang,
               unnest(string_split_regex(trim(text), '[\\s\\x0B]+')) AS word
        FROM documents
    ),
    wx AS (SELECT * FROM w WHERE word <> ''),
    tf AS (SELECT lang, word, COUNT(*) AS tf FROM wx GROUP BY lang, word),
    dfq AS (SELECT word, COUNT(DISTINCT doc_id) AS dfn FROM wx GROUP BY word),
    tot AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.lang, tf.word AS term,
               ROUND(tf.tf * ln(tot.n_docs * 1.0 / dfq.dfn), 4) AS score
        FROM tf JOIN dfq ON tf.word = dfq.word CROSS JOIN tot
    ),
    ranked AS (
        SELECT lang, term, score,
               ROW_NUMBER() OVER (
                   PARTITION BY lang ORDER BY score DESC, term
               ) AS rn
        FROM scored
    )
    SELECT lang, term, score, rn FROM ranked WHERE rn <= 10
    ORDER BY lang, rn
    """,
    doc=(
        "Per-language TF-IDF top terms (text_analysis.tfidf_top_terms): "
        "corpus-slice characterization; word-keyed aggregates + "
        "broadcast 1-row doc total, window only over the reduced "
        "per-group vocabulary."
    ),
)
def q81_tfidf_terms(spark, sf_dir):
    from kfai_pipeline_spark.operators.text_analysis import tfidf_top_terms

    docs = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, "text", "lang", "doc_id", k=10).orderBy("lang", "rn")


# ------------------------------------------------------- q91: training order
@register(
    "q91_training_order",
    # Portable twin: md5_long ordering key so DuckDB replays the exact
    # permutation. Checks every (shard, pos) assignment via per-shard
    # counts plus position-weighted membership checksums — sensitive to
    # any row landing in the wrong shard OR the wrong position.
    oracle="""
    WITH keyed AS (
        SELECT doc_id,
               ('0x' || substr(md5('epoch0' || doc_id::VARCHAR), 1, 15))::BIGINT AS ord
        FROM documents
    ),
    placed AS (
        SELECT doc_id,
               (ord % 16 + 16) % 16 AS shard,
               ROW_NUMBER() OVER (
                   PARTITION BY (ord % 16 + 16) % 16 ORDER BY ord, doc_id
               ) AS pos
        FROM keyed
    )
    SELECT shard::INT AS shard,
           COUNT(*)::BIGINT AS n,
           SUM(doc_id * pos)::BIGINT AS order_sum,
           MIN(CASE WHEN pos = 1 THEN doc_id END)::BIGINT AS first_doc
    FROM placed
    GROUP BY shard
    ORDER BY shard
    """,
    doc=(
        "Deterministic training shuffle + shard assignment "
        "(operators/sampling.py training_order): hash-keyed permutation "
        "with per-shard-only ordering — no global sort, one shard-key "
        "shuffle; salt per epoch. The shuffle-free answer to 'globally "
        "shuffle 100 TB for training'."
    ),
)
def q91_training_order(spark, sf_dir):
    from kfai_pipeline_spark.operators.sampling import training_order
    from kfai_pipeline_spark.operators.text_analysis import md5_long

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    placed = training_order(
        docs, n_shards=16, key_col="doc_id", salt="epoch0", hash_fn=md5_long
    )
    return (
        placed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("doc_id") * F.col("pos")).alias("order_sum"),
            F.min(F.when(F.col("pos") == 1, F.col("doc_id"))).alias("first_doc"),
        )
        .orderBy("shard")
    )


# ------------------------------------------------- q92: bigram LM score
@register(
    "q92_bigram_logprob",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '[\\s\\x0B]+') AS w
        FROM documents
    ),
    bx AS (
        SELECT doc_id, w[i-1] AS w1, w[i] AS w2
        FROM toks, LATERAL (SELECT unnest(range(2, len(w) + 1)) AS i) t
        WHERE len(w) >= 2
    ),
    wx AS (SELECT unnest(w) AS word FROM toks),
    c1 AS (SELECT word, count(*) AS c FROM wx GROUP BY 1),
    c2 AS (SELECT w1, w2, count(*) AS c FROM bx GROUP BY 1, 2),
    tot AS (SELECT SUM(c) AS n FROM c1),
    scored AS (
        SELECT bx.doc_id,
               ln(0.75 * c2.c * 1.0 / a.c + 0.25 * b.c * 1.0 / t.n) AS lp
        FROM bx
        JOIN c2 ON c2.w1 = bx.w1 AND c2.w2 = bx.w2
        JOIN c1 a ON a.word = bx.w1
        JOIN c1 b ON b.word = bx.w2
        CROSS JOIN tot t
    )
    SELECT doc_id, ROUND(AVG(lp), 4) AS avg_logprob,
           COUNT(*)::BIGINT AS n_bigrams
    FROM scored GROUP BY 1 ORDER BY doc_id
    """,
    doc=(
        "Interpolated bigram-LM quality score (text_analysis."
        "bigram_logprob): P(w2|w1) = 0.75*c(w1w2)/c(w1) + 0.25*c(w2)/N, "
        "one rung up from q75 toward CCNet's n-gram perplexity filter. "
        "Word/pair-keyed joins only; broadcast 1-row total; no "
        "vocabulary-wide window."
    ),
)
def q92_bigram_logprob(spark, sf_dir):
    from kfai_pipeline_spark.operators.text_analysis import bigram_logprob

    docs = load_table(spark, sf_dir, "documents")
    return bigram_logprob(docs).orderBy("doc_id")


# ------------------------------------------------- q94: duplicated spans
@register(
    "q94_dup_spans",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split_regex(text, '[\\s\\x0B]+') AS w FROM documents
        WHERE length(trim(text)) > 0
    ),
    sp AS (
        SELECT doc_id, array_to_string(w[i:i+7], ' ') AS shingle
        FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(w)-7,1)+1)) AS i) t
    ),
    sc AS (SELECT doc_id, shingle, count(*) AS c FROM sp GROUP BY 1, 2),
    nd AS (SELECT shingle, count(*) AS ndocs FROM sc GROUP BY 1),
    tot AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_spans FROM sc GROUP BY 1),
    dup AS (
        SELECT sc.doc_id, CAST(SUM(sc.c) AS BIGINT) AS n_dup_spans
        FROM sc JOIN nd ON nd.shingle = sc.shingle AND nd.ndocs >= 2
        GROUP BY 1
    )
    SELECT t.doc_id,
           t.n_spans,
           COALESCE(d.n_dup_spans, 0) AS n_dup_spans,
           ROUND(COALESCE(d.n_dup_spans, 0) * 1.0 / t.n_spans, 4) AS dup_span_frac,
           COALESCE(d.n_dup_spans, 0) * 1.0 / t.n_spans >= 0.05 AS flagged
    FROM tot t LEFT JOIN dup d ON d.doc_id = t.doc_id
    ORDER BY t.doc_id
    """,
    doc=(
        "Cross-document duplicated-span fraction (dedup.duplicated_spans; "
        "Lee et al. 2022 exact-substring dedup at word-8-gram grain): the "
        "paper's suffix array re-expressed as shingle-keyed shuffles with "
        "map-side partial aggs — catches a copied paragraph inside an "
        "otherwise-unique page, which whole-doc MinHash (q34) misses. "
        "No pair join, no broadcast of unbounded sets."
    ),
)
def q94_dup_spans(spark, sf_dir):
    from kfai_pipeline_spark.operators.dedup import duplicated_spans

    docs = load_table(spark, sf_dir, "documents")
    return duplicated_spans(docs, "text", "doc_id", n=8, flag_threshold=0.05).orderBy(
        "doc_id"
    )


# ------------------------------------------------------------ q96: BM25 retrieval
@register(
    "q96_bm25",
    # Lucene-style BM25 (k1=1.2, b=0.75): idf = ln(1 + (N-df+.5)/(df+.5)),
    # tf-norm = tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)). 1-b=0.25 and b=0.75
    # are exact binary fractions, so the arithmetic is engine-portable;
    # the per-doc sum is <=3 doubles, rounded at 4dp.
    oracle="""
    WITH sized AS (
        SELECT doc_id, string_split_regex(trim(text), '[\\s\\x0B]+') AS w FROM documents
    ),
    staged AS (SELECT doc_id, len(w) AS dl, w FROM sized),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM staged),
    wx AS (SELECT doc_id, dl, unnest(w) AS term FROM staged),
    tf AS (
        SELECT doc_id, term, count(*) AS tf, max(dl) AS dl
        FROM wx WHERE term IN ('spark', 'window', 'hash') GROUP BY 1, 2
    ),
    dfreq AS (SELECT term, count(*) AS dfn FROM tf GROUP BY 1)
    SELECT t.doc_id,
           ROUND(list_reduce(
               list_prepend(0.0, list(
                   ln(1 + (s.n_docs - d.dfn + 0.5) / (d.dfn + 0.5))
                   * t.tf * 2.2
                   / (t.tf + 1.2 * (0.25 + 0.75 * t.dl / s.avgdl))
                   ORDER BY t.term)),
               (acc, x) -> acc + x), 4) AS bm25,
           COUNT(*) AS n_terms_hit
    FROM tf t JOIN dfreq d USING (term) CROSS JOIN stats s
    GROUP BY t.doc_id
    ORDER BY bm25 DESC, t.doc_id
    LIMIT 10
    """,
    doc=(
        "BM25 lexical retrieval (operators/bm25.py, X33): top-10 docs "
        "for a 3-term query. Corpus explodes once and is filtered to "
        "the query terms MAP-SIDE before any shuffle; document "
        "frequencies aggregate from the reduced tf frame and broadcast "
        "back; corpus stats ride a 1-row broadcast; the top-k is "
        "TakeOrderedAndProject, never a global sort."
    ),
)
def q96_bm25(spark, sf_dir):
    from kfai_pipeline_spark.operators.bm25 import bm25_topk

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return bm25_topk(docs, ["spark", "window", "hash"], k=10)


# ------------------------------------------------------- q98: heavy hitters
@register(
    "q98_heavy_hitters",
    # The sketch only PRUNES (Misra-Gries candidates are a guaranteed
    # superset of words with cnt*k > N); the output is exact integer
    # counts under a strict integer threshold, so it hash-checks against
    # the brute-force HAVING despite the approximate candidate phase.
    oracle="""
    WITH wx AS (
        SELECT unnest(string_split_regex(trim(text), '[\\s\\x0B]+')) AS w FROM documents
    ),
    wf AS (SELECT w, count(*) AS cnt FROM wx WHERE w <> '' GROUP BY w),
    tot AS (SELECT sum(cnt) AS n FROM wf)
    SELECT w AS word, cnt, ROUND(cnt * 1.0 / n, 4) AS frac
    FROM wf CROSS JOIN tot
    WHERE cnt * 30 > n
    ORDER BY cnt DESC, word
    """,
    doc=(
        "Heavy hitters (operators/heavy_hitters.py, X34): words with "
        "frequency > N/30, exact counts. Candidates come from a "
        "mergeable Misra-Gries mapInPandas pass (bounded memory, no "
        "shuffle); the exact recount semi-joins the broadcast candidate "
        "list BEFORE aggregating, so only candidate words ever shuffle "
        "— the full vocabulary never does."
    ),
)
def q98_heavy_hitters(spark, sf_dir):
    from kfai_pipeline_spark.operators.heavy_hitters import heavy_hitters

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return heavy_hitters(docs, "text", "doc_id", k=30)


# ------------------------------------------------- q99: source-level curation
@register(
    "q99_source_curation",
    # Gates compare the ROUNDED avg (both engines round to 4dp first);
    # thresholds sit in gaps of the observed distribution so a last-bit
    # avg divergence cannot flip a verdict.
    oracle="""
    WITH per_doc AS (
        SELECT source, text,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '[\\s\\x0B]+')) END AS tok
        FROM documents
    ),
    stats AS (
        SELECT source,
               count(*) AS n_docs,
               ROUND(avg(tok), 4) AS avg_tokens,
               ROUND(count(DISTINCT md5(text)) * 1.0 / count(*), 4) AS distinct_text_ratio
        FROM per_doc GROUP BY source
    ),
    verdict AS (
        SELECT *,
               n_docs >= 5 AND avg_tokens >= 51.0 AND avg_tokens <= 61.0
               AND source NOT IN ('src3', 'src17') AS kept
        FROM stats
    )
    SELECT source, n_docs, avg_tokens, distinct_text_ratio, kept,
           CASE WHEN kept THEN n_docs ELSE 0 END AS n_kept_docs
    FROM verdict
    ORDER BY source
    """,
    doc=(
        "Source/domain-level curation (operators/source_filter.py, X35): "
        "per-source doc counts, mean token length, and duplication "
        "ratio gate whole sources (C4/RefinedWeb domain filtering; the "
        "reference's channel allowlist at ref database.py:69-71 is the "
        "same gate hand-rolled). One doc->source aggregate, then the "
        "small verdict table broadcasts back and the corpus is filtered "
        "map-side — it never shuffles."
    ),
)
def q99_source_curation(spark, sf_dir):
    from kfai_pipeline_spark.operators.source_filter import (
        filter_by_source,
        source_stats,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    stats = source_stats(
        docs,
        min_docs=5,
        min_avg_tokens=51.0,
        max_avg_tokens=61.0,
        blocklist=["src3", "src17"],
    )
    kept_counts = (
        filter_by_source(docs, stats)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("__n_kept"))
    )
    return (
        stats.join(kept_counts, "source", "left")
        .select(
            "source",
            "n_docs",
            "avg_tokens",
            "distinct_text_ratio",
            "kept",
            F.coalesce(F.col("__n_kept"), F.lit(0)).alias("n_kept_docs"),
        )
        .orderBy("source")
    )


# ----------------------------------------------------- q101: hybrid RRF fusion
@register(
    "q101_hybrid_rrf",
    # Fusion uses integer RANKS (1-based row_number over rounded scores
    # with id tie-breaks — a total order, so both engines agree), and
    # rrf = sum of two exactly-representable reciprocals, rounded 6dp.
    oracle="""
    WITH sized AS (
        SELECT doc_id, string_split_regex(trim(text), '[\\s\\x0B]+') AS w
        FROM documents WHERE doc_id <> 0
    ),
    staged AS (SELECT doc_id, len(w) AS dl, w FROM sized),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM staged),
    wx AS (SELECT doc_id, dl, unnest(w) AS term FROM staged),
    tf AS (
        SELECT doc_id, term, count(*) AS tf, max(dl) AS dl
        FROM wx WHERE term IN ('spark', 'window', 'hash') GROUP BY 1, 2
    ),
    dfreq AS (SELECT term, count(*) AS dfn FROM tf GROUP BY 1),
    bm AS (
        SELECT t.doc_id,
               ROUND(list_reduce(
                   list_prepend(0.0, list(
                       ln(1 + (s.n_docs - d.dfn + 0.5) / (d.dfn + 0.5))
                       * t.tf * 2.2
                       / (t.tf + 1.2 * (0.25 + 0.75 * t.dl / s.avgdl))
                       ORDER BY t.term)),
                   (acc, x) -> acc + x), 4) AS bm25
        FROM tf t JOIN dfreq d USING (term) CROSS JOIN stats s
        GROUP BY t.doc_id
        ORDER BY bm25 DESC, t.doc_id
        LIMIT 50
    ),
    lex AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS r FROM bm),
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
    vs AS (
        SELECT e.vec_id AS doc_id,
               ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 4) AS score
        FROM embeddings e, q
        WHERE e.vec_id <> 0
        ORDER BY score DESC, doc_id
        LIMIT 50
    ),
    vec AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r FROM vs)
    SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
           ROUND(COALESCE(1.0 / (60 + l.r), 0) + COALESCE(1.0 / (60 + v.r), 0), 6) AS rrf,
           CAST(l.r IS NOT NULL AS INT) + CAST(v.r IS NOT NULL AS INT) AS n_lists_hit
    FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id
    ORDER BY rrf DESC, doc_id
    LIMIT 10
    """,
    doc=(
        "Hybrid retrieval with Reciprocal Rank Fusion (operators/"
        "fusion.py, X36): BM25 top-50 (lexical arm) + cosine top-50 "
        "(vector arm, vec_id=0 as the query) fused by rrf = "
        "sum 1/(60+rank), top-10. The reference's retrieval is exactly "
        "this hybrid (pgvector ANN + ILIKE topics, ref query_agent.py:"
        "258-300); fusion runs on already-reduced top-n lists — "
        "O(k·lists) rows regardless of corpus size."
    ),
)
def q101_hybrid_rrf(spark, sf_dir):
    from kfai_pipeline_spark.operators.bm25 import bm25_topk
    from kfai_pipeline_spark.operators.fusion import rrf_fuse, with_rank
    from kfai_pipeline_spark.operators.similarity import cosine_topk

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").where(
        F.col("doc_id") != 0
    )
    lex = with_rank(
        bm25_topk(docs, ["spark", "window", "hash"], k=50),
        [F.col("bm25").desc(), F.col("doc_id")],
    ).select("doc_id", "rank")
    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.where(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), "embedding"
    )
    vec = with_rank(
        cosine_topk(emb.where(F.col("vec_id") != 0), qv, k=50, round_to=4),
        [F.col("score").desc(), F.col("vec_id")],
    ).select(F.col("vec_id").alias("doc_id"), "rank")
    return rrf_fuse([lex, vec], "doc_id", k=10)


# ------------------------------------------------- q108: segment-level dedup
@register(
    "q108_segment_dedup",
    # First-occurrence segment dedup (CCNet line-dedup semantics at
    # 8-word-segment granularity — the synthetic corpus has no newline
    # structure, so segments stand in for lines). Both engines chunk
    # identically, keep the globally-first copy of each normalized
    # segment ordered by (doc_id, seg_no), and md5 the reassembled
    # survivor text, so the hash pins exact keep + reassembly semantics.
    # NULL dedup_md5 = every segment was a repeat (distinguishable from
    # an empty doc).
    oracle="""
    WITH src AS (
        -- ROW grain (rid): the Spark arm segments each physical row's
        -- own word array, so a duplicated doc_id must chunk per COPY —
        -- grouping by doc_id here interleaved two copies' words inside
        -- one segment with a nondeterministic tie order (round-7
        -- dup-id sweep)
        SELECT row_number() OVER () AS rid, doc_id, text FROM documents
    ),
    w AS (
        -- coalesce matches the Spark arm's NULL-totality contract:
        -- unnest of a NULL array would silently DROP the document
        SELECT rid, doc_id,
               unnest(string_split_regex(trim(coalesce(text, '')), '[\\s\\x0B]+')) AS word,
               generate_subscripts(string_split_regex(trim(coalesce(text, '')), '[\\s\\x0B]+'), 1) AS pos
        FROM src
    ),
    seg AS (
        SELECT rid, doc_id, CAST((pos - 1) // 8 AS INT) AS seg_no,
               string_agg(word, ' ' ORDER BY pos) AS seg
        FROM w GROUP BY 1, 2, 3
    ),
    flagged AS (
        -- keep = (doc_id, seg_no) EQUALS the hash's min struct, BY
        -- VALUE — matching the Spark arm's min(struct) election, under
        -- which two copies sharing (doc_id, seg_no) are BOTH kept
        -- (row_number()=1 kept only one, engine-dependent)
        SELECT doc_id, seg_no, seg,
               CASE WHEN length(trim(seg)) = 0 THEN TRUE
                    ELSE (doc_id, seg_no) = MIN((doc_id, seg_no)) OVER (
                        PARTITION BY md5(lower(trim(seg))))
               END AS keep
        FROM seg
    )
    SELECT doc_id,
           COUNT(*) AS n_segs,
           COUNT(*) FILTER (WHERE keep) AS n_kept,
           CASE WHEN COUNT(*) FILTER (WHERE keep) > 0
                THEN md5(string_agg(seg, ' ' ORDER BY seg_no, seg)
                         FILTER (WHERE keep))
           END AS dedup_md5
    FROM flagged GROUP BY doc_id ORDER BY doc_id
    """,
    doc=(
        "Corpus segment-level dedup (dedup.dedup_segments_text, X39): "
        "chunk docs into 8-word segments MAP-SIDE (transform over the "
        "in-row word array — zero shuffles to derive granularity), drop "
        "all-but-first copies of every corpus-repeated segment via a "
        "skew-safe groupBy(hash).min(struct) winner + merge-pinned join "
        "back (deliberately not a row_number window: a hot boilerplate "
        "segment would put 10^9 rows in one window partition), then "
        "reassemble survivors in order. Hash-checked per doc vs DuckDB "
        "recomputing identical chunk/keep/reassembly semantics."
    ),
)
def q108_segment_dedup(spark, sf_dir):
    from kfai_pipeline_spark.operators.dedup import dedup_segments_text

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = dedup_segments_text(docs, "doc_id", "text", words_per_seg=8)
    return out.select(
        "doc_id",
        "n_segs",
        "n_kept",
        F.md5("dedup_text").alias("dedup_md5"),
    ).orderBy("doc_id")


# --------------------------------------------- q109: DSIR importance sample
@register(
    "q109_dsir_sample",
    # DSIR (Xie et al. 2023) top-50 by hashed-bigram log-likelihood
    # ratio vs the lang='en' target slice. Bucket counts are exact
    # integers in both engines (portable md5-prefix hash, mod 256); the
    # per-doc weight is an ORDERED fold over bucket-sorted terms
    # (list_reduce here, F.aggregate in Spark — the q96 BM25 float
    # contract), rounded at 4dp. Selection orders by the UNROUNDED
    # weight in both engines so the k-boundary can't flip on rounding.
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang, string_split_regex(trim(text), '[\\s\\x0B]+') AS w
        FROM documents
    ),
    bg AS (
        SELECT doc_id, lang, w[i] || ' ' || w[i + 1] AS bigram
        FROM toks, LATERAL (SELECT unnest(range(1, len(w))) AS i) t
    ),
    bucketed AS (
        SELECT doc_id, lang = 'en' AS tgt,
               ('0x' || substr(md5(bigram), 1, 15))::BIGINT % 256 AS bucket
        FROM bg
    ),
    stats AS (
        SELECT bucket, COUNT(*) AS s_b, COUNT(*) FILTER (WHERE tgt) AS t_b
        FROM bucketed GROUP BY 1
    ),
    tot AS (SELECT SUM(s_b) AS s_tot, SUM(t_b) AS t_tot FROM stats),
    dbk AS (SELECT doc_id, bucket, COUNT(*) AS c FROM bucketed GROUP BY 1, 2),
    vals AS (
        SELECT d.doc_id, d.bucket,
               d.c * ((ln(st.t_b + 1.0) - ln(tt.t_tot + 256.0))
                      - (ln(st.s_b + 1.0) - ln(tt.s_tot + 256.0))) AS val
        FROM dbk d JOIN stats st USING (bucket) CROSS JOIN tot tt
    ),
    folded AS (
        SELECT doc_id,
               list_reduce(list_prepend(0.0, list(val ORDER BY bucket)),
                           (acc, x) -> acc + x) AS wgt,
               COUNT(*) AS n_buckets
        FROM vals GROUP BY doc_id
    )
    SELECT doc_id, ROUND(wgt, 4) AS dsir_weight, n_buckets
    FROM folded ORDER BY wgt DESC, doc_id LIMIT 50
    """,
    doc=(
        "DSIR hashed importance resampling (sampling.dsir_sample, X41; "
        "arXiv:2302.03169): rank docs by how much their hashed-bigram "
        "distribution matches a target slice vs the whole corpus. One "
        "corpus bigram pass feeds both aggregates; the 256-row bucket "
        "stats and 1-row totals come back as broadcast joins (the "
        "corpus never shuffles for them); per-doc weights are ordered "
        "folds; top-50 is TakeOrderedAndProject. md5-prefix hash arm "
        "for oracle portability (xxhash64 is the production default)."
    ),
)
def q109_dsir_sample(spark, sf_dir):
    # unscoped on purpose: the registry memoizes builds per (session,
    # sf_dir), so the persisted (doc,bucket) frame exists at most once
    # per fixture per session (the q98 session-lived-cache precedent);
    # LOOPED callers outside the registry should use dsir_sample_scoped
    from kfai_pipeline_spark.operators.sampling import dsir_sample
    from kfai_pipeline_spark.operators.text_analysis import md5_long

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    out = dsir_sample(
        docs, F.col("lang") == "en", k=50, buckets=256, hash_fn=md5_long
    )
    return out.select(
        "doc_id",
        F.round("dsir_weight", 4).alias("dsir_weight"),
        "n_buckets",
    )
