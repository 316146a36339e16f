"""Deterministic sampling for training-data pipelines (§2.11 extension
surface; the reference has no sampling operator — this generalizes its
skip-list idea of "stable subset selection" to rates and strata).

Why not ``df.sample()``: Spark's Bernoulli sample is seeded per
partition, so the selected *rows* change whenever partitioning changes
(repartition, AQE, input splits) — unacceptable for reproducible
training mixes. Hashing a stable key makes the decision a pure function
of the row, independent of physical layout, cluster size, and run
order; re-running at 100 TB on a different cluster yields byte-identical
samples.

Scale shape: both operators are embarrassingly parallel scans. The
rate sample is a pure filter (no shuffle at all — it pushes into the
scan stage); the stratified sample shuffles once on the stratum key for
the per-stratum window.
"""

from __future__ import annotations

from collections.abc import Callable
from contextlib import contextmanager

from pyspark.sql import Column, DataFrame, Window, functions as F

# Production hash: one JVM xxhash64 call. Oracle-portable alternative:
# text_analysis.md5_long (DuckDB can reproduce it) — pass as hash_fn.
_DEFAULT_HASH: Callable[[Column], Column] = lambda c: F.xxhash64(c)


def hash_sample(
    df: DataFrame,
    key_col: str,
    rate: float,
    salt: str = "",
    hash_fn: Callable[[Column], Column] | None = None,
    denom: int = 10_000,
) -> DataFrame:
    """Keep rows where hash(salt || key) mod denom < rate * denom.

    Deterministic per key: the same key is always in or always out for
    a given (rate, salt), so joins between two hash-sampled tables on
    the key stay consistent. ``salt`` decorrelates independent samples.
    """
    h = (hash_fn or _DEFAULT_HASH)(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    return df.where(F.pmod(h, F.lit(denom)) < int(rate * denom))


def split_by_group(
    df: DataFrame,
    group_col: str,
    val_frac: float = 0.1,
    hash_fn: Callable[[Column], Column] | None = None,
    salt: str = "",
    out_col: str = "split",
    denom: int = 10_000,
) -> DataFrame:
    """Leakage-safe train/validation split (X49): the unit of
    assignment is ``group_col`` — a dedup component, embedding
    cluster, or source domain — never the individual row.

    Splitting training data by row hash leaks: two near-duplicate
    documents land on opposite sides and the validation loss measures
    memorization, not generalization. Assigning by the DEDUP GROUP
    (connected_components output, coalesced to the row id for
    singletons) guarantees every near-duplicate cluster sits entirely
    in one split — this operator is the reason the dedup family
    computes group labels at all.

    Same determinism contract as :func:`hash_sample`: the decision is
    a pure function of (group, salt), independent of layout, cluster
    size, and run order; hash(salt || group) mod denom < val_frac*denom
    -> 'val', else 'train'. Pure map-side filter logic — no shuffle
    beyond whatever produced the group column.
    """
    h = (hash_fn or _DEFAULT_HASH)(
        F.concat(F.lit(salt), F.col(group_col).cast("string"))
    )
    return df.withColumn(
        out_col,
        F.when(
            F.pmod(h, F.lit(denom)) < int(val_frac * denom), F.lit("val")
        ).otherwise(F.lit("train")),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    k: int,
    key_col: str,
    hash_fn: Callable[[Column], Column] | None = None,
    salt: str = "",
) -> DataFrame:
    """Deterministic k rows per stratum: rank by hash(salt || key) within
    each stratum and keep the k smallest (ties broken by key).

    This is "shuffle each stratum with a fixed permutation, take k" —
    the standard way to build a balanced eval slice from a skewed corpus
    (e.g. k docs per language regardless of language frequency). One
    shuffle on the stratum key; the window is rank-only (no full sort of
    the stratum spills — Spark's WindowExec sorts within partitions,
    which is the unavoidable cost of exact per-stratum k).
    """
    h = (hash_fn or _DEFAULT_HASH)(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def mixture_sample(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float],
    token_col: str,
    budget_frac: float,
    key_col: str,
    default_weight: float = 1.0,
    hash_fn: Callable[[Column], Column] | None = None,
    denom: int = 10_000,
) -> DataFrame:
    """Weighted mixture sampling under a token budget: deterministically
    sample docs so each source's expected token share is proportional to
    its weight, with total expected tokens = budget_frac * corpus tokens.

    Per-source keep rate = min(1, w_norm * budget * total_tokens /
    source_tokens), capped at 1 (an up-weighted small source can at most
    contribute all of itself — the standard "epochs capped at 1 for
    sampling-without-replacement" behavior; re-epoching is a training-
    loader concern, not a corpus one).

    Scale shape: one small per-source aggregate (broadcast back) + the
    same pure hash filter as :func:`hash_sample` — the corpus is scanned
    once and never shuffled. The only windows run over the #sources-row
    aggregate, not the corpus. Appends ``rate`` alongside the kept rows.
    """
    w = F.lit(default_weight)
    for s, wt in sorted(weights.items()):
        w = F.when(F.col(source_col) == s, F.lit(float(wt))).otherwise(w)
    totals = df.groupBy(source_col).agg(F.sum(token_col).alias("__tok_s"))
    everything = Window.partitionBy()
    rates = totals.select(
        source_col,
        F.round(
            F.least(
                F.lit(1.0),
                (w / F.sum(w).over(everything))
                * F.lit(budget_frac)
                * F.sum("__tok_s").over(everything)
                / F.col("__tok_s"),
            ),
            6,
        ).alias("rate"),
    )
    h = (hash_fn or _DEFAULT_HASH)(F.col(key_col).cast("string"))
    return df.join(F.broadcast(rates), source_col).where(
        F.pmod(h, F.lit(denom)) < F.col("rate") * denom
    )


def mixture_upsample(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float],
    token_col: str,
    budget_frac: float,
    key_col: str,
    default_weight: float = 1.0,
    max_epochs: float = 4.0,
    hash_fn: Callable[[Column], Column] | None = None,
    denom: int = 10_000,
) -> DataFrame:
    """:func:`mixture_sample` without the rate-1 cap: a source whose
    target share exceeds its size is REPLICATED (multiple epochs), the
    standard treatment for small high-quality sources in a training mix
    (capped at ``max_epochs`` — unbounded duplication hurts more than it
    helps).

    Each row is emitted ``floor(rate)`` times deterministically plus one
    more with probability ``frac(rate)`` decided by hash(key, copy) — so
    the expected token share matches the target exactly and the chosen
    copies are a pure function of the key. Output rows carry ``copy``
    (0-based epoch index) and ``rate``.

    Scale shape: identical to mixture_sample (tiny broadcast rate table,
    no corpus shuffle) plus a bounded explode (<= ceil(max_epochs) rows
    per input row).
    """
    w = F.lit(default_weight)
    for s, wt in sorted(weights.items()):
        w = F.when(F.col(source_col) == s, F.lit(float(wt))).otherwise(w)
    totals = df.groupBy(source_col).agg(F.sum(token_col).alias("__tok_s"))
    everything = Window.partitionBy()
    rates = totals.select(
        source_col,
        F.round(
            F.least(
                F.lit(float(max_epochs)),
                (w / F.sum(w).over(everything))
                * F.lit(budget_frac)
                * F.sum("__tok_s").over(everything)
                / F.col("__tok_s"),
            ),
            6,
        ).alias("rate"),
    )
    joined = df.join(F.broadcast(rates), source_col)
    copies = F.explode(
        F.sequence(F.lit(0), F.ceil(F.col("rate")).cast("int") - 1)
    ).alias("copy")
    h = (hash_fn or _DEFAULT_HASH)(
        F.concat(F.col(key_col).cast("string"), F.lit("#"), F.col("copy").cast("string"))
    )
    frac = F.col("rate") - F.floor(F.col("rate"))
    return (
        joined.select("*", copies)
        .where(
            (F.col("copy") < F.floor(F.col("rate")))
            | (F.pmod(h, F.lit(denom)) < frac * denom)
        )
    )


def training_order(
    df: DataFrame,
    n_shards: int,
    key_col: str,
    salt: str = "epoch0",
    hash_fn: Callable[[Column], Column] | None = None,
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic global training shuffle WITHOUT a global sort:
    every row gets a (shard, position-within-shard) that is a pure
    function of (key, salt) — change ``salt`` per epoch for a fresh
    permutation, rerun anywhere for byte-identical order.

    Scale shape: a global ORDER BY rand() is a full-corpus range
    shuffle through ONE sort — the classic 100 TB anti-pattern for
    training-order generation. Here the hash assigns shards map-side
    (narrow), and ordering exists only WITHIN each shard (one window
    per shard partition) — exactly what a sharded data loader needs,
    since readers consume shards independently. One shuffle on the
    shard key, O(|shard|) state per task.

    Uses the same stable-key hashing contract as :func:`hash_sample`
    (layout-independent; default xxhash64, md5_long for oracle twins).
    """
    h = (hash_fn or _DEFAULT_HASH)(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = Window.partitionBy(shard_col).orderBy(F.col("__ord"), F.col(key_col))
    return (
        df.withColumn("__ord", h)
        .withColumn(shard_col, F.pmod(F.col("__ord"), F.lit(n_shards)).cast("int"))
        .withColumn(pos_col, F.row_number().over(w))
        .drop("__ord")
    )


# --------------------------------- DSIR hashed importance weights (X41)
def dsir_weights(
    df: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 256,
    hash_fn: Callable[[Column], Column] | None = None,
    scope=None,
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023,
    arXiv:2302.03169) with hashed n-gram features: score every document
    by how much its hashed-bigram distribution looks like the ``target``
    subset (a boolean Column over the input rows, e.g. lang == 'en')
    versus the corpus as a whole.

    Features: word bigrams hashed into ``buckets`` buckets. With
    add-one smoothing over the bucket vocabulary, the per-doc importance
    weight is the bigram-wise log-likelihood ratio

        w(d) = sum_b c_db * [ (ln(t_b+1) - ln(T+B)) - (ln(s_b+1) - ln(S+B)) ]

    where c_db counts doc d's bigrams in bucket b, t_b/s_b the target /
    corpus bucket totals, T/S their sums, B the bucket count. Top-w docs
    are the DSIR selection; returns (id, dsir_weight, n_buckets).

    Scale shape: ONE corpus bigram pass materializes the compact
    (doc, bucket) count frame (groupBy with map-side combining, at most
    #docs x B rows — persisted, since Spark shares no subplans: without
    the cache every derived aggregate would re-scan and re-explode the
    corpus, 3 full passes instead of 1). Bucket stats and their 1-row
    totals derive from the cached frame and come back as broadcast
    joins, so the corpus never shuffles for them. Pass ``scope`` (a
    dedup.CacheScope) — or use :func:`dsir_sample_scoped` — to release
    the cached frame deterministically; with ``scope=None`` it lives
    for the session (fine one-shot, looped callers should scope it).
    The per-doc sum is an ORDERED fold
    over the bucket-sorted (bucket, val) structs — floating addition is
    non-associative, and an unordered SUM would make the weight depend
    on partitioning; the fold makes it bit-stable and lets the DuckDB
    oracle (q109) reproduce it with list_reduce (the q96 BM25 contract).

    Ref parity: the reference selects data only by skip-lists and status
    flags (pipeline/run_pipeline.py); distribution-matched selection is
    extension surface for training-data curation.

    Docs with fewer than two words (incl. NULL/empty text) have no
    bigram features and are ABSENT from the output — unscorable, not
    zero-scored; left-join the result if the distinction matters.
    """
    b_lit = F.lit(float(buckets))
    hf = hash_fn or _DEFAULT_HASH
    # same consecutive-pair construction as text_analysis.word_bigrams,
    # inlined so the target flag rides the single corpus scan (a rejoin
    # to re-attach it would be a second pass over the text)
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    bigrams = F.when(
        F.size(words) >= 2,
        F.zip_with(
            F.slice(words, 1, F.size(words) - 1),
            F.slice(words, 2, F.size(words) - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bucketed = df.select(
        F.col(id_col),
        target.alias("__tgt"),
        F.explode(bigrams).alias("__bigram"),
    ).select(
        F.col(id_col),
        F.col("__tgt"),
        F.pmod(hf(F.col("__bigram")), F.lit(buckets)).alias("bucket"),
    )
    # __tgt is functionally dependent on the doc id, so this grain is
    # (id, bucket): the one corpus-scan product everything derives from
    db = bucketed.groupBy(id_col, "__tgt", "bucket").agg(
        F.count(F.lit(1)).alias("__c")
    )
    db = db.persist()
    if scope is not None:
        scope.add(db)
    stats = db.groupBy("bucket").agg(
        F.sum("__c").alias("__s_b"),
        F.sum(F.when(F.col("__tgt"), F.col("__c")).otherwise(0)).alias("__t_b"),
    )
    totals = stats.agg(
        F.sum("__s_b").alias("__S"), F.sum("__t_b").alias("__T")
    )
    doc_bucket = db.select(F.col(id_col), F.col("bucket"), F.col("__c"))
    val = F.col("__c") * (
        (F.log(F.col("__t_b") + F.lit(1.0)) - F.log(F.col("__T") + b_lit))
        - (F.log(F.col("__s_b") + F.lit(1.0)) - F.log(F.col("__S") + b_lit))
    )
    per = (
        doc_bucket.join(F.broadcast(stats), "bucket")
        .crossJoin(F.broadcast(totals))
        .select(F.col(id_col), F.col("bucket"), val.alias("__val"))
    )
    folded = F.aggregate(
        F.transform(
            F.array_sort(F.collect_list(F.struct("bucket", "__val"))),
            lambda s: s["__val"],
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return per.groupBy(id_col).agg(
        folded.alias("dsir_weight"),
        F.count(F.lit(1)).alias("n_buckets"),
    )


def dsir_sample(
    df: DataFrame,
    target: Column,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 256,
    hash_fn: Callable[[Column], Column] | None = None,
    scope=None,
) -> DataFrame:
    """Top-k DSIR selection: the k docs whose hashed-bigram distribution
    best matches the target subset (ties break on id). orderBy+limit
    compiles to TakeOrderedAndProject — per-partition top-k then a
    k-row driver merge, never a global sort."""
    w = dsir_weights(df, target, id_col, text_col, buckets, hash_fn, scope)
    return w.orderBy(F.desc("dsir_weight"), F.col(id_col)).limit(k)


@contextmanager
def dsir_sample_scoped(
    df: DataFrame,
    target: Column,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 256,
    hash_fn: Callable[[Column], Column] | None = None,
):
    """Scoped twin of :func:`dsir_sample` (the ``heavy_hitters_scoped``
    contract): materialize inside the ``with`` block; the cached
    (doc, bucket) count frame releases on exit — the entry point for
    loops over many corpora/targets."""
    from kfai_pipeline_spark.operators.dedup import CacheScope

    scope = CacheScope()
    try:
        yield dsir_sample(df, target, k, id_col, text_col, buckets, hash_fn, scope)
    finally:
        scope.release()
