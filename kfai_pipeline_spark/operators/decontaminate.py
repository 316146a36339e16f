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


def benchmark_shingle_set(
    bench: DataFrame,
    text_col: str = "text",
    n: int = 3,
    repartition_to: int | str | None = None,
) -> DataFrame:
    """Distinct shingle set of the benchmark frame: one column ``shingle``.

    Deduplicated across the whole benchmark (set semantics). The default
    ``repartition_to=None`` skips the widening probe (an eval-set bench
    is tiny by construction); the Bloom arm passes ``"auto"`` because
    ITS benchmark side is corpus-scale by premise.
    """
    return (
        word_shingles(
            bench.select(F.lit(0).alias("__one"), text_col),
            text_col,
            "__one",
            n=n,
            repartition_to=repartition_to,
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


# ---------------------------------------------------------------------------
# Bloom-pruned arm (X45): for benchmark sets too large to broadcast exactly
# ---------------------------------------------------------------------------


def _check_n_bits(n_bits: int) -> None:
    """The K-M derivation below is exact only for power-of-two sizes
    (mod 2^k commutes with 64-bit wrap because 2^k | 2^64)."""
    if n_bits <= 0 or n_bits & (n_bits - 1):
        raise ValueError(f"n_bits must be a power of two, got {n_bits}")


def _bloom_positions(col, n_bits: int, k_hashes: int):
    """Array column of ``k_hashes`` bit positions for one key, derived
    from ONE ``xxhash64`` via Kirsch-Mitzenmacher double hashing:
    ``pos_i = (h1 + i*h2) mod n_bits`` with ``h1 = h``,
    ``h2 = (h >> 32) | 1`` (odd, so the stride never degenerates).
    K-M preserves the Bloom filter's asymptotic fp rate with a single
    base hash (Kirsch & Mitzenmacher 2006), which buys two things at
    corpus scale: the build hashes each key ONCE instead of k times
    (all codegen), and the PROBE can ship just the 8-byte hash across
    Arrow and re-derive positions vectorized in numpy.

    The arithmetic runs MOD-FIRST — ``pmod(pmod(h1,n) + i*pmod(h2,n),
    n)`` — never the raw ``h1 + i*h2``: under Spark 4's default ANSI
    mode a raw long add/multiply near ±2^63 would THROW
    ARITHMETIC_OVERFLOW (a ~6e-10/key landmine that at 10^9 keys fires
    ~half of all builds), and non-ANSI wrap would need bit-exact numpy
    twin semantics. Mod-first keeps every intermediate below
    ``k_hashes * n_bits`` (no overflow on either engine) and is EXACT
    for power-of-two ``n_bits`` (2^k divides 2^64, so reducing before
    or after the 64-bit wrap gives the same residue) — enforced by
    :func:`_check_n_bits` and the JVM/numpy parity test."""
    _check_n_bits(n_bits)
    h = F.xxhash64(col)
    h1 = F.pmod(h, F.lit(n_bits))
    h2 = F.pmod(F.shiftright(h, 32).bitwiseOR(F.lit(1)), F.lit(n_bits))
    return F.array(
        *[F.pmod(h1 + F.lit(i) * h2, F.lit(n_bits)) for i in range(k_hashes)]
    )


def _km_positions_numpy(h, n_bits: int, k_hashes: int):
    """The numpy twin of :func:`_bloom_positions` for probe kernels:
    ``h`` is an int64 array of xxhash64 values; returns an
    (n, k_hashes) int64 array of bit positions. Same mod-first
    derivation, so no intermediate exceeds k_hashes * n_bits."""
    import numpy as np

    _check_n_bits(n_bits)
    h = h.astype(np.int64, copy=False)
    n = np.int64(n_bits)
    # numpy % returns non-negative for a positive modulus, matching pmod
    h1 = h % n
    h2 = ((h >> np.int64(32)) | np.int64(1)) % n
    i = np.arange(k_hashes, dtype=np.int64)[None, :]
    return (h1[:, None] + i * h2[:, None]) % n


def build_bloom_filter(
    keys: DataFrame,
    key_col: str,
    n_bits: int = 1 << 23,
    k_hashes: int = 5,
    partial_partitions: int = 32,
    hash_partitions: int | None = None,
) -> bytes:
    """Distributed Bloom-filter build over a key column: returns the
    bitmap as ``n_bits/8`` bytes.

    Scale shape (two-level OR, round-8 advice — a ``coalesce`` before
    the first OR used to collapse the upstream explode+hash to
    ``partial_partitions`` tasks, defeating the build's parallelism):

    1. every NATURAL partition hashes its keys and ORs its positions
       into a local numpy bitmap — full upstream parallelism, one
       ``n_bits/8``-byte row out per non-empty task;
    2. those already-tiny partial rows cross a SHUFFLE boundary
       (``repartition`` — a plain coalesce would propagate upstream
       through the narrow chain and collapse the hashing stage right
       back to ``partial_partitions`` tasks) into a second OR pass;
       the shuffle moves only ``n_tasks x n_bits/8`` bitmap bytes,
       never keys;
    3. the driver ORs the ≤ ``partial_partitions`` survivors.

    So the driver receives ``partial_partitions x n_bits/8`` bytes,
    never the keys, and no hashing task waits on the fold. A 10^9-key
    benchmark at 10 bits/key is a 1.2 GB bitmap: broadcastable, where
    the exact distinct-shingle set (tens of GB of strings) is not.

    Memory/shuffle budget (this is the same one-local-filter-per-task
    shape Spark's own BloomFilterAggregate uses): every CONCURRENT
    level-1 task holds one ``n_bits/8`` bitmap, and the level-2 shuffle
    moves ``n_level1_tasks x n_bits/8`` bytes. At the default 1 MiB
    bitmap that is noise; at the 1.2 GB extreme, cap ``hash_partitions``
    (repartitions the KEYS first — keys move once, a shuffle the
    explode amortizes — so only that many bitmaps ever exist and the
    level-2 shuffle is ``hash_partitions x size``; set it ~= executor
    count). For bitmaps where ``partials x size`` strains the level-2
    tasks, lower ``partial_partitions`` (the OR is associative).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import BinaryType, StructField, StructType

    n_bytes = (n_bits + 7) // 8
    if hash_partitions:
        keys = keys.repartition(hash_partitions)
    # NATURAL partitioning otherwise: the explode + xxhash64 keep every
    # upstream task; the fold narrows only after each task has reduced
    # itself to one bitmap row
    pos = keys.select(
        F.explode(_bloom_positions(F.col(key_col), n_bits, k_hashes)).alias(
            "__pos"
        )
    )
    out_schema = StructType([StructField("partial", BinaryType())])

    def or_positions(batches):
        bm = np.zeros(n_bytes, dtype=np.uint8)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            p = pdf["__pos"].to_numpy(dtype=np.int64)
            np.bitwise_or.at(bm, p >> 3, np.uint8(1) << (p & 7).astype(np.uint8))
        if seen:
            yield pd.DataFrame({"partial": [bm.tobytes()]})

    def or_partials(batches):
        bm = np.zeros(n_bytes, dtype=np.uint8)
        seen = False
        for pdf in batches:
            for raw in pdf["partial"]:
                seen = True
                bm |= np.frombuffer(raw, dtype=np.uint8)
        if seen:
            yield pd.DataFrame({"partial": [bm.tobytes()]})

    partials = pos.mapInPandas(or_positions, schema=out_schema)
    reduced = partials.repartition(partial_partitions).mapInPandas(
        or_partials, schema=out_schema
    )
    rows = reduced.collect()
    bm = np.zeros(n_bytes, dtype=np.uint8)
    for r in rows:
        bm |= np.frombuffer(r["partial"], dtype=np.uint8)
    return bm.tobytes()


def contamination_bloom(
    corpus: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.1,
    n_bits: int = 1 << 23,
    k_hashes: int = 5,
    repartition_to: int | str | None = "auto",
    scope=None,
    bloom_hash_partitions: int | None = None,
) -> DataFrame:
    """Bloom-pruned EXACT contamination — same output contract as
    :func:`contamination` (id, n_shingles, n_overlap, ratio,
    contaminated), for benchmark sets too large to broadcast exactly.

    :func:`contamination` broadcasts the benchmark's distinct shingle
    SET — right when eval sets are MBs, impossible when the "benchmark"
    is itself corpus-scale (decontaminating against 10^8-10^9 held-out
    n-grams: the set is tens of GB of strings). The naive fallback
    shuffle-joins ALL corpus shingles against the benchmark — at 100 TB
    that shuffle is the job. This arm:

    1. builds a Bloom bitmap over the benchmark shingles
       (:func:`build_bloom_filter` — 10 bits/key ~ 1% fp), broadcast
       once per executor;
    2. tests every corpus shingle MAP-SIDE (positions hashed in
       codegen, one vectorized numpy bit-test kernel) — ~99% of
       non-overlapping shingles never reach a shuffle;
    3. EXACT-verifies only the survivors (true hits + ~1% fp) with a
       shuffle semi join against the benchmark shingles — so false
       positives are eliminated and the result is bit-identical to the
       exact arm (that's what makes this oracle-checkable rather than
       approximately-right).

    Cost note: per-doc totals and the probe branch each evaluate the
    shingle pipeline (Spark shares no subplans), so the corpus text is
    shingled twice — deliberate: at scale a second narrow scan+explode
    is cheap next to shuffling |corpus shingles| bytes, which is what
    the prune avoids. Pass ``scope`` (CacheScope) to persist the
    shingle frame instead when the corpus fits executor storage, and to
    register the bitmap broadcast for deterministic release.
    """
    doc_sh = word_shingles(
        corpus.select(id_col, text_col), text_col, id_col, n=n,
        repartition_to=repartition_to,
    )
    if scope is not None:
        doc_sh = scope.add(doc_sh.persist())
    # the shared helper, widened: this arm's benchmark side is
    # corpus-scale by premise, so it gets the same narrow-scan probe as
    # the corpus side (keeping tokenization single-sourced with the
    # broadcast-exact arm)
    bench_sh = benchmark_shingle_set(
        bench, text_col=text_col, n=n, repartition_to="auto"
    )

    bitmap = build_bloom_filter(
        bench_sh, "shingle", n_bits, k_hashes,
        hash_partitions=bloom_hash_partitions,
    )
    bc = corpus.sparkSession.sparkContext.broadcast(bitmap)
    if scope is not None:
        scope.add_broadcast(bc)

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import StructField, StructType

    # The Arrow crossing carries (id, shingle, ONE 8-byte hash) and the
    # kernel re-derives the k bit positions from the hash vectorized —
    # vs the previous (id, shingle, k x 8-byte position ARRAY) this cuts
    # the crossing ~40% at k=5 (round-8 advice; §5r addendum 2), and
    # survivors come straight out of the kernel with their (id,
    # shingle), so no recovery join and no third pipeline pass.
    id_type = corpus.schema[id_col].dataType
    probe_in = doc_sh.withColumn("__h", F.xxhash64("shingle"))
    cand_schema = StructType(
        [StructField(id_col, id_type), probe_in.schema["shingle"]]
    )

    def bloom_test(batches):
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        for pdf in batches:
            if not len(pdf):
                continue
            p = _km_positions_numpy(
                pdf["__h"].to_numpy(), n_bits, k_hashes
            )
            hits = (bm[p >> 3] & (np.uint8(1) << (p & 7).astype(np.uint8))) != 0
            keep = hits.all(axis=1)
            if keep.any():
                yield pdf.loc[keep, [id_col, "shingle"]]

    candidates = probe_in.mapInPandas(bloom_test, schema=cand_schema)
    # exact verify: survivors only — both sides are now prune-sized, so
    # a plain shuffle semi join is the right plan (NOT broadcast: the
    # premise of this arm is that bench_sh doesn't fit a broadcast)
    verified = candidates.join(bench_sh, "shingle", "left_semi")
    overlap = verified.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_overlap"))

    totals = doc_sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    joined = totals.join(overlap, id_col, "left").select(
        id_col,
        "n_shingles",
        F.coalesce(F.col("n_overlap"), F.lit(0)).alias("n_overlap"),
    )
    ratio = F.col("n_overlap") / F.col("n_shingles")
    return joined.select(
        id_col,
        "n_shingles",
        "n_overlap",
        F.round(ratio, 4).alias("ratio"),
        (ratio >= F.lit(threshold)).alias("contaminated"),
    )
