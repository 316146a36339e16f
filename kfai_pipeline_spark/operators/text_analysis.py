"""Text analysis operators (X4) — all JVM-side built-ins, no UDFs.

token counting, quality heuristics, n-gram language ID, and
winnowing-style document fingerprints. These are per-row map operations
(narrow; no shuffle) except the corpus rollups, which shuffle once on
the group key — the ideal shape at 100 TB.

The reference's text surface is regex normalization
(ref transformers/utils/helpers.py:92-114) — covered by
functions/text.py; this module is the LLM-training-data extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker lexicons for the n-gram/stopword heuristic.
# Real deployments would plug in a fastText-style model via mapInPandas;
# the heuristic keeps language ID deterministic and JVM-side.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "with", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "des", "que", "pour"],
    "es": ["el", "la", "los", "y", "es", "no", "una", "que", "por", "con"],
    "zh": ["的", "是", "不", "了", "在", "人", "有", "我", "他", "这"],
}

STOPWORDS_EN = LANG_MARKERS["en"]


def _words(text_col: str | Column) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.trim(c), r"\s+")


def token_count(text_col: str | Column) -> Column:
    """Whitespace token count; 0 for empty/blank text."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.when(F.length(F.trim(c)) == 0, 0).otherwise(F.size(_words(c)))


def bpe_ish_token_count(text_col: str | Column) -> Column:
    """Sub-word-ish token estimate: count of alternating letter/digit/
    punctuation runs (a cheap BPE proxy — ~regex segmentation)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    segmented = F.regexp_replace(c, r"([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+)", "$1\x00")
    return F.size(F.filter(F.split(segmented, "\x00"), lambda s: F.trim(s) != ""))


def truncate_long_docs(
    df: DataFrame, text_col: str = "text", max_chars: int = 1_000_000
) -> DataFrame:
    """Cap per-document text length before per-row text kernels — the
    straggler defense for skewed length distributions.

    A single row cannot be split across tasks, so one pathological
    document (10-hour transcript, boilerplate dump) serializes its
    entire shingle/regex/token work into ONE task while the rest of the
    cluster idles: the round-6 skew spot (scripts/skew_doc_spot.py)
    measured one 32 MB doc among 50k normal docs tripling the minhash
    signing pass (4.1 -> 12.4 s) and 5x-ing quality scoring (1.7 ->
    9.7 s), linear in the giant's size. Prefix truncation is the
    standard data-pipeline answer (Gopher/CCNet cap document length
    before per-doc features); this keeps provenance — ``orig_n_chars``
    and ``was_truncated`` — so downstream filters can treat capped docs
    explicitly rather than silently scoring a prefix as the whole.

    Opt-in by design: truncation CHANGES semantics (MinHash estimates,
    token counts and quality ratios see the prefix only), so pipelines
    apply it deliberately, typically right after ingest.

    Provenance is TOTAL: NULL text yields orig_n_chars=0 and
    was_truncated=false (the text itself passes through NULL) — a
    NULL boolean in a guard column would poison every downstream
    filter with three-valued logic (round-6 NULL sweep)."""
    n = F.length(F.coalesce(F.col(text_col), F.lit("")))
    return (
        df.withColumn("orig_n_chars", n)
        .withColumn("was_truncated", n > max_chars)
        .withColumn(
            text_col,
            F.when(
                F.col("was_truncated"), F.substring(F.col(text_col), 1, max_chars)
            ).otherwise(F.col(text_col)),
        )
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append quality-scoring columns: n_tokens, n_chars, avg_word_len,
    punct_ratio, stopword_ratio, and a composite quality_score in [0,1].
    """
    words = _words(text_col)
    n_tokens = token_count(text_col)
    n_chars = F.length(F.col(text_col))
    # Explicit PORTABLE word class, not Java's (?U)\w: the engines must
    # agree character-for-character, and (?U)\w has Java-only members
    # (gc=No digits like ½ excluded, Other_Alphabetic symbols like Ⓐ
    # included, NEL as whitespace) that no RE2 class reproduces. Both
    # this regex and the q40 oracle spell the same set: letters L,
    # marks M, decimal digits Nd, connector Pc, separators Z, ASCII
    # \s, and the ZWJ/ZWNJ join controls (routine in Persian/Hindi
    # text and emoji sequences). Everything else counts as punctuation.
    n_punct = n_chars - F.length(
        F.regexp_replace(
            F.col(text_col),
            "[^\\p{L}\\p{M}\\p{Nd}\\p{Pc}\\p{Z}\\s\\u200C\\u200D]",
            "",
        )
    )
    stop_hits = F.size(
        F.filter(words, lambda w: F.lower(w).isin(*STOPWORDS_EN))
    )
    avg_word_len = F.when(
        n_tokens > 0,
        F.round(
            F.aggregate(words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
            / n_tokens,
            4,
        ),
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, F.round(n_punct / n_chars, 4)).otherwise(0.0)
    stop_ratio = F.when(n_tokens > 0, F.round(stop_hits / n_tokens, 4)).otherwise(0.0)
    # Composite: reward mid-length docs with some stopwords, punish
    # punctuation soup. Clamped linear blend — deterministic, tunable.
    # coalesce: n_tokens is NULL for NULL text (the q29 oracle contract
    # keeps it NULL), but F.least SKIPS NULLs, so least(NULL/100, 1.0)
    # would be 1.0 and a contentless NULL doc would outscore an empty
    # one (review pass; the NULL-sweep contract says they score alike)
    nt0 = F.coalesce(n_tokens, F.lit(0))
    score = F.round(
        F.greatest(
            F.lit(0.0),
            F.least(
                F.lit(1.0),
                F.least(nt0 / F.lit(100.0), F.lit(1.0)) * 0.5
                + stop_ratio * 2.0 * 0.3
                + (1.0 - F.least(punct_ratio * 5.0, F.lit(1.0))) * 0.2,
            ),
        ),
        4,
    )
    return df.withColumns(
        {
            "n_tokens": n_tokens,
            "avg_word_len": avg_word_len,
            "punct_ratio": punct_ratio,
            "stopword_ratio": stop_ratio,
            "quality_score": score,
        }
    )


def lang_id(df: DataFrame, text_col: str = "text", out_col: str = "pred_lang") -> DataFrame:
    """Heuristic language ID: argmax of per-language marker-word hit
    counts ('und' when nothing matches). Deterministic tie-break:
    highest hit count wins; on equal hits the lexicographically LARGEST
    language code wins (struct comparison is field-by-field, so
    array_max over (hits, lang) structs resolves ties on lang). The
    DuckDB oracle (q40) encodes the same rule. Entirely JVM-side: one
    filter() per language over the word array."""
    words = _words(text_col)
    scores = [
        F.struct(
            F.size(F.filter(words, lambda w: F.lower(w).isin(*markers))).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    best = F.array_max(F.array(*scores))
    return df.withColumn(
        out_col,
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")),
    )


def word_bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, bigram) rows from consecutive word pairs — slice+zip, no UDF."""
    words = _words(text_col)
    bigrams = F.when(
        F.size(words) >= 2,
        F.zip_with(
            F.slice(words, 1, F.size(words) - 1),
            F.slice(words, 2, F.size(words) - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.select(F.col(id_col), F.explode(bigrams).alias("bigram"))


def md5_long(c: Column) -> Column:
    """First 60 bits of md5 as a signed long. Engine-portable (DuckDB:
    ('0x' || substr(md5(x),1,15))::BIGINT) — used where a fingerprint
    must be hash-checkable against the SQL oracle; xxhash64 stays the
    production default (one JVM hash vs md5+hex+parse)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def fingerprint(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
    hash_fn=None,
) -> DataFrame:
    """Winnowing document fingerprint: hash every k-gram (rolling window
    of words), then keep the minimum hash in each sliding window of
    ``window`` consecutive k-gram hashes. Output: (id, fingerprint
    array<long>) — a compact, position-robust signature for plagiarism/
    near-dup style matching.

    Implemented with sequence/transform/slice over arrays — narrow
    projections, no shuffle, no UDF.

    STAGED on purpose: higher-order lambdas re-evaluate every captured
    non-lambda subtree PER ELEMENT (there is no common-subexpression
    cache inside the interpreted lambda body), so nesting the k-gram
    hash transform directly inside the window-min transform re-hashes
    all n k-grams for each of the n windows — O(n^2) hashes per
    document (measured: 19 s for 500 sf0.01 docs; 0.5 s staged). Each
    stage binds the previous array to a column reference; the stages
    don't collapse back into one projection because CollapseProject
    refuses to duplicate non-cheap aliases referenced more than once
    (both `size(x)` and the lambda reference each alias).
    """
    hash_fn = hash_fn or F.xxhash64
    words = _words(text_col)
    staged_w = df.select(F.col(id_col), words.alias("__w"))
    w = F.col("__w")
    n_kgrams = F.greatest(F.size(w) - (k - 1), F.lit(1))
    kgram_hashes = F.transform(
        F.sequence(F.lit(1), n_kgrams),
        lambda i: hash_fn(F.concat_ws(" ", F.slice(w, i, k))),
    )
    staged_kh = staged_w.select(F.col(id_col), kgram_hashes.alias("__kh"))
    kh = F.col("__kh")
    n_windows = F.greatest(F.size(kh) - (window - 1), F.lit(1))
    mins = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda i: F.array_min(F.slice(kh, i, window)),
    )
    return staged_kh.select(
        F.col(id_col), F.array_distinct(mins).alias("fingerprint")
    )


def corpus_stats(df: DataFrame, text_col: str = "text", by: str = "lang") -> DataFrame:
    """Per-group rollup of the quality features (one shuffle)."""
    feats = quality_features(df, text_col)
    return (
        feats.groupBy(by)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 2).alias("avg_tokens"),
            F.round(F.avg("quality_score"), 4).alias("avg_quality"),
        )
        .orderBy(by)
    )


def repetition_features(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style within-document repetition metrics per doc:

    - ``dup_word_frac``   = 1 - distinct_words / total_words
    - ``top_word_frac``   = occurrences of the most frequent word / total
    - ``dup_bigram_frac`` = 1 - distinct_bigrams / total_bigrams

    High values flag boilerplate / spam (repeated lines, keyword
    stuffing) — the standard quality gate before training.

    Scale shape: one explode per n-gram order, then a two-level
    aggregation ((id, gram) counts -> per-id sum/count/max). Both levels
    are hash aggregates with map-side partials; the only shuffles are on
    (id, gram) then id — no arrays are held whole per row, so a 1 GB
    document costs memory proportional to its partition slice, not its
    length. No UDFs.
    """
    words = _words(text_col)
    w = df.select(F.col(id_col), F.explode(words).alias("w"))
    word_stats = (
        w.groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_words"),
            F.count(F.lit(1)).alias("n_distinct_words"),
            F.max("c").alias("top_word_count"),
        )
    )
    # staged split — slicing split(text) inside the transform lambda
    # would re-split the document per bigram (O(n^2)); see fingerprint
    staged = df.select(F.col(id_col), words.alias("__w"))
    wc = F.col("__w")
    n_bi = F.greatest(F.size(wc) - 1, F.lit(0))
    bigrams = F.when(n_bi > 0, F.transform(
        F.sequence(F.lit(1), F.greatest(n_bi, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(wc, i, 2)),
    )).otherwise(F.array().cast("array<string>"))
    b = staged.select(F.col(id_col), F.explode(bigrams).alias("b"))
    bi_stats = (
        b.groupBy(id_col, "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.count(F.lit(1)).alias("n_distinct_bigrams"),
        )
    )
    joined = word_stats.join(bi_stats, id_col, "left")
    n_bi_c = F.coalesce(F.col("n_bigrams"), F.lit(0))
    nd_bi_c = F.coalesce(F.col("n_distinct_bigrams"), F.lit(0))
    return joined.select(
        id_col,
        "n_words",
        "n_distinct_words",
        F.round(1.0 - F.col("n_distinct_words") / F.col("n_words"), 4).alias(
            "dup_word_frac"
        ),
        F.round(F.col("top_word_count") / F.col("n_words"), 4).alias("top_word_frac"),
        n_bi_c.alias("n_bigrams"),
        F.when(n_bi_c > 0, F.round(1.0 - nd_bi_c / n_bi_c, 4))
        .otherwise(F.lit(0.0))
        .alias("dup_bigram_frac"),
    )


def length_quantiles(
    df: DataFrame,
    value_col,
    by: str = "lang",
    ps: tuple = (0.25, 0.5, 0.75, 0.95, 0.99),
    exact: bool = True,
) -> DataFrame:
    """Per-group quantiles of a numeric expression (e.g. token count) —
    the distribution view behind length-filter thresholds ("drop docs
    under p1 / over p99 tokens").

    ``exact=True`` uses ``percentile`` (linear interpolation, matches
    ANSI percentile_cont / DuckDB quantile_cont): Spark's implementation
    holds a per-group value->count map in the aggregation buffer, which
    is fine for bounded domains like token counts but NOT for
    high-cardinality doubles at 100 TB — flip to ``exact=False`` there
    and get ``approx_percentile`` (bounded-memory KLL-style sketch,
    mergeable map-side) at the cost of rank error <= 1/acc.
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    fn = F.percentile if exact else (lambda c, p: F.approx_percentile(c, p, 10_000))
    aggs = [
        F.round(fn(v, F.lit(p)), 4).alias(f"p{int(p * 100):02d}") for p in ps
    ]
    return df.groupBy(by).agg(F.count(F.lit(1)).alias("n"), *aggs).orderBy(by)


def unigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram LM — the SQL-expressible proxy for CCNet's LM-perplexity
    quality filter (docs full of corpus-rare words score low; keep the
    middle band, drop the tails).

    Two aggregations: (word -> count) over the corpus, then per-doc
    avg(ln(count/total)). The corpus total is a 1-row aggregate attached
    via cross join (broadcast by construction — never a window over the
    vocabulary, which would single-partition a 100M-row vocab at scale).
    The word-frequency join shuffles on the word key, same skew profile
    as the wordcount it extends.
    """
    # r14 note: a count() window over the word key was tried in place of
    # the freq groupBy + join-back (the q92/q94 restructure) and
    # REJECTED: it measured +20% at 100x (noop medians 5.7 -> 6.9 s)
    # because the window loses the map-side partial aggregation (every
    # occurrence shuffles raw) and concentrates each word's occurrences
    # in one task with no AQE escape — the top unigram is ~5% of a real
    # corpus, an unsplittable straggler at scale. The join-back is the
    # right shape HERE: freq is one row per word after map-side
    # combine, and a skewed probe-side SMJ partition is AQE-splittable.
    # (q92/q94 differ: their count branches re-derive far more
    # expensive pipelines and their key skew is orders flatter.)
    wx = df.select(F.col(id_col), F.explode(_words(text_col)).alias("w"))
    freq = wx.groupBy("w").agg(F.count(F.lit(1)).alias("__c"))
    total = freq.agg(F.sum("__c").alias("__n"))
    scored = (
        wx.join(freq, "w")
        .crossJoin(F.broadcast(total))
        .select(id_col, F.log(F.col("__c") / F.col("__n")).alias("__lp"))
    )
    return scored.groupBy(id_col).agg(
        F.round(F.avg("__lp"), 4).alias("avg_logprob"),
        F.count(F.lit(1)).alias("n_words"),
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "lang",
    id_col: str = "doc_id",
    k: int = 10,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per group: tf = term count within the
    group, idf = ln(N_docs / docs containing the term), ranked by
    rounded score (desc) then term (asc) for cross-engine determinism.

    Corpus analytics staple (what characterizes each language/source
    slice). Shuffle profile (r14): strictly LINEAR lineage — one scan,
    one regex-split explode, a ``(word, doc, group)`` first-level
    aggregate, a ``(group, word)`` second-level aggregate, then windows
    over the post-aggregate vocabulary only. The previous tf-from-wx +
    countDistinct-from-wx branch pair re-derived the full scan/split/
    explode pipeline twice (column pruning thins each branch
    differently, so CSE/ReuseExchange never unify them — verified in
    the physical plan). Document frequency now folds from the second
    level itself: ``group_col`` is functional on ``id_col`` (one row
    per doc upstream), so distinct-docs-per-word == the sum over groups
    of docs-in-group-containing-word, a ``sum`` window over ``w`` on a
    frame with at most #groups rows per word — unlike a corpus-row
    window over a hot word (the measured q75 straggler), this is
    post-aggregate and skew-free, and it replaces both the second
    corpus derivation and the tf<->df join outright.

    **Hard precondition** (r14 advice): every ``id_col`` value must map
    to exactly ONE ``group_col`` value. A doc appearing under two
    groups would be counted once PER GROUP by the folded document
    frequency (the old countDistinct counted it once), silently
    deflating idf for its terms. q81's documents table satisfies this
    (lang is a column of the doc row); callers feeding a multi-group
    mapping must dedup to one group per id first.
    """
    from pyspark.sql.window import Window

    wx = df.select(F.col(id_col), F.col(group_col), F.explode(_words(text_col)).alias("w"))
    wx = wx.where(F.col("w") != "")
    # one row per (word, doc); group rides along (functional on doc).
    # Two levels instead of one mixed count+countDistinct aggregate,
    # which would plan through Expand and double every corpus row.
    lvl1 = wx.groupBy("w", id_col, group_col).agg(F.count(F.lit(1)).alias("__c"))
    tf = lvl1.groupBy(group_col, "w").agg(
        F.sum("__c").alias("tf"), F.count(F.lit(1)).alias("__docs")
    )
    dfreq_w = F.sum("__docs").over(Window.partitionBy("w"))
    total = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.withColumn("dfn", dfreq_w)
        .crossJoin(F.broadcast(total))
        .select(
            group_col,
            F.col("w").alias("term"),
            F.round(
                F.col("tf") * F.log(F.col("n_docs") * F.lit(1.0) / F.col("dfn")), 4
            ).alias("score"),
        )
    )

    rn = F.row_number().over(
        Window.partitionBy(group_col).orderBy(F.col("score").desc(), F.col("term"))
    )
    return scored.withColumn("rn", rn).where(F.col("rn") <= k)


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.75,
) -> DataFrame:
    """Per-document mean INTERPOLATED bigram log-probability under the
    corpus's own LM — one rung up from :func:`unigram_logprob` toward
    CCNet's n-gram-perplexity filter:

        P(w2|w1) = lam * c(w1 w2)/c(w1)  +  (1-lam) * c(w2)/N

    (interpolation, not backoff, so the score is a pure join-and-avg —
    no per-row branching on zero counts; ``lam=0.75`` is an exact
    binary fraction for cross-engine float parity). Docs shorter than
    2 words have no transitions and drop out.

    Scale shape: one bigram explode reused for corpus counts and doc
    scoring; joins key on (w1,w2) and each word — the wordcount skew
    profile; the corpus total rides a broadcast 1-row cross join. No
    vocabulary-wide window anywhere.
    """
    words = _words(text_col)
    # staged split — element_at(split(text), i) inside the transform
    # lambda would re-split the document per pair (O(n^2)); see
    # fingerprint
    staged = df.select(F.col(id_col), words.alias("__w"))
    wc = F.col("__w")
    pair_expr = F.when(
        F.size(wc) >= 2,
        F.transform(
            F.sequence(F.lit(2), F.size(wc)),
            lambda i: F.struct(
                F.element_at(wc, i - 1).alias("w1"),
                F.element_at(wc, i).alias("w2"),
            ),
        ),
    ).otherwise(F.array())
    bx = staged.select(F.col(id_col), F.explode(pair_expr).alias("p")).select(
        id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    wx = df.select(F.explode(words).alias("w"))
    c1 = wx.groupBy("w").agg(F.count(F.lit(1)).alias("__c1"))
    total = c1.agg(F.sum("__c1").alias("__n"))
    # c(w1 w2) as a WINDOW over bx, not a groupBy + join-back: the join
    # form re-derives the whole bigram explode for the count branch (a
    # second full corpus pass — Catalyst prunes id_col from it, so the
    # subtrees never canonicalize equal for CSE/stage reuse), and at
    # corpus scale the count side is far past any broadcast threshold,
    # so BOTH sides of that join shuffle on (w1, w2) — and at SMALL
    # scale Catalyst broadcast c2, a corpus-derived aggregate riding a
    # fabricated post-agg size estimate (the BASELINE §5d defect class:
    # a guaranteed driver OOM at real scale). The window pays exactly
    # one bx shuffle on (w1, w2) and nothing else (r14: 3 -> 2 static
    # corpus derivations; 100x noop median 22.8 s -> 19.0 s,
    # plans/r14/q92_bigram_logprob_{before,after}.txt). The c1 joins
    # and the 1-row total already share one wx derivation via exchange
    # reuse — visible as ReusedExchange in the before plan.
    #
    # SKEW, measured not asserted (r15, scripts/r15_q92_skew_ab.py):
    # the r14-advice objection was that a hot bigram pins every
    # occurrence to ONE unsplittable window task with no map-side
    # combine. On a zipf(1.6) fixture whose TOP bigram is 19% of all
    # 23.8M transitions (~40x worse than the real "of the" profile),
    # interleaved noop medians: this shape 23.2 s, the AQE-skew-split
    # join-back 24.5 s, a groupBy(id,w1,w2) pre-agg + sum window
    # 27.9 s — the pre-agg's extra (id,w1,w2) exchange combines almost
    # nothing (bigrams rarely repeat within a doc) and the join-back's
    # second corpus derivation costs more than the hot partition, even
    # here. Parity exact for all three. Per-key bound of the kept
    # shape: the hot partition holds that bigram's OCCURRENCES in one
    # spillable window buffer (straggler, not OOM); if a corpus ever
    # concentrates materially past this measured ceiling, the
    # join-back (c2 partial-aggregates map-side, probe stays
    # AQE-splittable) is the escape hatch, at the price of the second
    # derivation.
    from pyspark.sql.window import Window

    bcx = bx.withColumn(
        "__c2", F.count(F.lit(1)).over(Window.partitionBy("w1", "w2"))
    )
    scored = (
        bcx
        .join(c1.withColumnsRenamed({"w": "w1", "__c1": "__cw1"}), "w1")
        .join(c1.withColumnsRenamed({"w": "w2", "__c1": "__cw2"}), "w2")
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            F.log(
                F.lit(lam) * F.col("__c2") / F.col("__cw1")
                + F.lit(1.0 - lam) * F.col("__cw2") / F.col("__n")
            ).alias("__lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.round(F.avg("__lp"), 4).alias("avg_logprob"),
        F.count(F.lit(1)).alias("n_bigrams"),
    )


def segment_words(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    words_per_seg: int = 8,
) -> DataFrame:
    """Chunk each document's whitespace tokens into fixed-size word
    segments: (id, seg_no, seg) rows, ``seg_no`` 0-based, segments join
    their words with a single space (the last segment may be short).

    Map-side ONLY — the chunking is transform(sequence(...)) over the
    in-row word array followed by posexplode, so deriving segment
    granularity from a 100 TB corpus costs zero shuffles (the naive
    posexplode-words -> groupBy(doc, pos/k) plan shuffles every word in
    the corpus to reassemble what was already adjacent in-row).

    The segment granularity feeds corpus-level segment dedup
    (dedup.dedup_segments) on prose without newline structure; for real
    line-structured text, split on the line separator instead and feed
    the same dedup (ref pipeline cleans at whole-doc granularity only —
    cleaning.py — so sub-document dedup is an extension surface).

    NULL text coalesces to '' (one blank, always-kept segment) so every
    input doc yields at least one row — posexplode over a NULL array
    would otherwise DROP the document from the pipeline silently, and a
    dedup pass must be total over its input.
    """
    # staged split — slicing split(text) inside the transform lambda
    # would re-split the document PER SEGMENT (the round-3 O(n^2) HOF
    # re-evaluation class; see repetition_features / fingerprint)
    staged = df.select(
        F.col(id_col),
        _words(F.coalesce(F.col(text_col), F.lit(""))).alias("__w"),
    )
    wc = F.col("__w")
    n_segs = F.ceil(F.size(wc) / F.lit(words_per_seg)).cast("int")
    seg_arr = F.transform(
        F.sequence(F.lit(0), n_segs - F.lit(1)),
        lambda i: F.array_join(
            F.slice(wc, i * words_per_seg + 1, words_per_seg), " "
        ),
    )
    return staged.select(
        F.col(id_col), F.posexplode(seg_arr).alias("seg_no", "seg")
    )
