"""Operator-level tests for the round-2 training-data additions:
sampling, redaction, shard packing, boilerplate strip, decontamination.
(The driver-facing q61-q69 correctness lives in test_oracle.py; these
cover the behavioral contracts the oracles can't express.)"""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from kfai_pipeline_spark.operators import redact, sampling
from kfai_pipeline_spark.operators.decontaminate import decontaminate
from kfai_pipeline_spark.operators.dedup import strip_boilerplate
from kfai_pipeline_spark.operators.shard_pack import pack_shards, shard_manifest


def test_hash_sample_is_layout_independent(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    a = sorted(r.k for r in sampling.hash_sample(df, "k", 0.2).collect())
    b = sorted(
        r.k
        for r in sampling.hash_sample(df.repartition(7, "k"), "k", 0.2).collect()
    )
    assert a == b and 0 < len(a) < 2000
    # rate is approximately honored (hash uniformity)
    assert abs(len(a) / 2000 - 0.2) < 0.05


def test_hash_sample_salt_decorrelates(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    a = {r.k for r in sampling.hash_sample(df, "k", 0.2, salt="a").collect()}
    b = {r.k for r in sampling.hash_sample(df, "k", 0.2, salt="b").collect()}
    assert a != b
    # independent 20% samples overlap ~4%, not ~20%
    assert len(a & b) < 0.1 * 2000


def test_stratified_sample_exact_k_per_stratum(spark):
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(300)], ["k", "g"]
    )
    out = sampling.stratified_sample(df, "g", 10, "k")
    counts = {r.g: r.c for r in out.groupBy("g").agg(F.count("*").alias("c")).collect()}
    assert counts == {"g0": 10, "g1": 10, "g2": 10}


def test_redact_pii_counts_and_tags(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, text="mail a@b.co and c.d@e.org, ip 10.1.2.3, ssn 123-45-6789"),
            Row(id=2, text="call +1 (555) 123-4567 now"),
            Row(id=3, text="nothing to see"),
        ]
    )
    rows = {r.id: r for r in redact.redact_pii(df, "text").collect()}
    assert rows[1].n_email == 2 and rows[1].n_ip == 1 and rows[1].n_ssn == 1
    assert "[EMAIL]" in rows[1].redacted and "a@b.co" not in rows[1].redacted
    # SSN attributed once — not double-counted as phone
    assert rows[1].n_phone == 0
    assert rows[2].n_phone == 1 and "[PHONE]" in rows[2].redacted
    assert rows[3].redacted == "nothing to see"


def test_pack_shards_cap_contract(spark):
    df = spark.createDataFrame([(i, 100) for i in range(200)], ["k", "tok"])
    packed = pack_shards(df, "tok", "k", cap=1000, buckets=4)
    # every doc exactly once
    assert packed.count() == 200
    assert packed.select("k").distinct().count() == 200
    # offsets are a permutation-free exclusive prefix: max+last = total
    man = shard_manifest(packed, "tok").collect()
    assert sum(r.n_tokens for r in man) == 200 * 100
    # assignment-by-starting-offset: a shard exceeds cap by < one doc
    assert all(r.n_tokens <= 1000 + 100 for r in man)
    # deterministic under repartition
    a = sorted((r.k, r.shard) for r in packed.collect())
    b = sorted(
        (r.k, r.shard)
        for r in pack_shards(df.repartition(9), "tok", "k", cap=1000, buckets=4).collect()
    )
    assert a == b


def test_strip_boilerplate_preserves_order_and_empties(spark):
    df = spark.createDataFrame(
        [
            (1, "BP\nalpha\nbeta"),
            (2, "gamma\nBP\ndelta"),
            (3, "BP"),
            (4, "unique only"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.clean_text for r in strip_boilerplate(df, min_docs=3).collect()}
    assert out[1] == "alpha\nbeta"
    assert out[2] == "gamma\ndelta"
    assert out[3] == ""  # all-boilerplate doc survives, empty
    assert out[4] == "unique only"


def test_decontaminate_drops_flagged_docs(spark):
    bench = spark.createDataFrame([(0, "the quick brown fox jumps")], ["doc_id", "text"])
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps high today"),  # contaminated
            (2, "completely different words entirely here now"),
        ],
        ["doc_id", "text"],
    )
    kept = decontaminate(corpus, bench, threshold=0.2)
    assert [r.doc_id for r in kept.collect()] == [2]


def _contam_rows(df):
    return sorted(
        (r.doc_id, r.n_shingles, r.n_overlap, r.ratio, r.contaminated)
        for r in df.collect()
    )


def test_contamination_bloom_equals_exact_arm(spark):
    from kfai_pipeline_spark.operators.decontaminate import (
        contamination,
        contamination_bloom,
    )

    bench = spark.createDataFrame(
        [(0, "the quick brown fox jumps"), (9, "over the lazy dog")],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps high today"),
            (2, "completely different words entirely here now"),
            (3, "over the lazy dog sleeps"),
            (4, "short"),  # < n words: whole text is the one shingle
        ],
        ["doc_id", "text"],
    )
    exact = _contam_rows(contamination(corpus, bench, threshold=0.2))
    bloom = _contam_rows(
        contamination_bloom(corpus, bench, threshold=0.2, n_bits=1 << 16)
    )
    assert bloom == exact


def test_contamination_bloom_exact_even_when_bitmap_saturated(spark):
    # n_bits=8 -> every probe is a false positive -> the prune passes
    # everything and the exact verify join must carry the semantics
    from kfai_pipeline_spark.operators.decontaminate import (
        contamination,
        contamination_bloom,
    )

    bench = spark.createDataFrame([(0, "a b c d e")], ["doc_id", "text"])
    corpus = spark.createDataFrame(
        [(1, "a b c x y"), (2, "p q r s t")], ["doc_id", "text"]
    )
    exact = _contam_rows(contamination(corpus, bench, threshold=0.2))
    bloom = _contam_rows(
        contamination_bloom(corpus, bench, threshold=0.2, n_bits=8, k_hashes=2)
    )
    assert bloom == exact


def test_contamination_bloom_empty_bench_and_scope(spark):
    from kfai_pipeline_spark.operators.decontaminate import contamination_bloom
    from kfai_pipeline_spark.operators.dedup import CacheScope

    bench = spark.createDataFrame([], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, "some words here"), (2, "other words there")], ["doc_id", "text"]
    )
    scope = CacheScope()
    out = contamination_bloom(corpus, bench, threshold=0.2, scope=scope).collect()
    assert {r.doc_id for r in out} == {1, 2}
    assert all(r.n_overlap == 0 and not r.contaminated for r in out)
    # the bitmap broadcast was registered; release is idempotent
    assert len(scope._bcs) == 1
    scope.release()
    assert not scope._bcs
    scope.release()


def test_bloom_build_sets_at_most_k_bits_per_key(spark):
    import numpy as np

    from kfai_pipeline_spark.operators.decontaminate import build_bloom_filter

    keys = spark.createDataFrame([(f"key{i}",) for i in range(50)], ["shingle"])
    bm = np.frombuffer(
        build_bloom_filter(keys, "shingle", n_bits=1 << 12, k_hashes=4),
        dtype=np.uint8,
    )
    popcount = int(np.unpackbits(bm).sum())
    assert 0 < popcount <= 50 * 4
    # determinism: same keys -> same bitmap
    bm2 = np.frombuffer(
        build_bloom_filter(keys, "shingle", n_bits=1 << 12, k_hashes=4),
        dtype=np.uint8,
    )
    assert np.array_equal(bm, bm2)


def test_mixture_sample_shares_and_cap(spark):
    from kfai_pipeline_spark.operators.sampling import mixture_sample

    # 3 sources x 1000 docs x 10 tokens each
    df = spark.createDataFrame(
        [(i, "s%d" % (i % 3), 10) for i in range(3000)], ["k", "src", "tok"]
    )
    out = mixture_sample(
        df, "src", {"s0": 4.0}, "tok", budget_frac=0.5, key_col="k"
    )
    rates = {r.src: r.rate for r in out.select("src", "rate").distinct().collect()}
    # w_norm = 4/6, 1/6, 1/6; total=30000 tokens, budget=15000;
    # s0 target 10000 >= tok_s0=10000 -> capped at 1.0
    # s1/s2 target 2500 of 10000 -> 0.25
    assert rates["s0"] == 1.0
    assert abs(rates["s1"] - 0.25) < 1e-6 and abs(rates["s2"] - 0.25) < 1e-6
    counts = {r.src: r.c for r in out.groupBy("src").agg(F.count("*").alias("c")).collect()}
    assert counts["s0"] == 1000          # rate 1.0 keeps everything
    assert abs(counts["s1"] / 1000 - 0.25) < 0.05


def test_semantic_dedup_contract(spark):
    import collections

    from kfai_pipeline_spark.catalog import load_table
    from kfai_pipeline_spark.operators.dedup import semantic_dedup

    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    brute = semantic_dedup(emb, threshold=0.55, use_lsh=False).collect()
    assert len(brute) == emb.count()
    # group_id is the min member id; keeper iff id == group_id
    groups = collections.defaultdict(list)
    for r in brute:
        groups[r.group_id].append(r.vec_id)
    assert all(gid == min(m) for gid, m in groups.items())
    assert all((r.vec_id == r.group_id) == r.is_keeper for r in brute)
    # default LSH arm finds a subset of the brute edges -> merges no
    # more, so it keeps at least as many rows (and exactly as many ids)
    lsh = semantic_dedup(emb, threshold=0.55).collect()
    assert len(lsh) == len(brute)
    assert sum(r.is_keeper for r in lsh) >= sum(r.is_keeper for r in brute)


def test_hash_sample_rate_monotonicity(spark):
    """keep(rate) is a SUBSET of keep(rate') for rate < rate' — the same
    doc never flips out as the budget grows (hash filter is monotone in
    the threshold). Guarantees reproducible nested samples (10% eval
    slice stays inside the 50% training slice)."""
    df = spark.range(0, 5000).withColumnRenamed("id", "k")
    small = {r.k for r in sampling.hash_sample(df, "k", 0.1).collect()}
    big = {r.k for r in sampling.hash_sample(df, "k", 0.5).collect()}
    assert small < big


def test_redact_pii_is_idempotent(spark):
    """redact(redact(x)) == redact(x): the inserted tags contain no
    digits or @, so a second pass finds nothing."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(200):
        bits = ["word%d" % rng.randrange(50)]
        if i % 3 == 0:
            bits.append("u%d@ex%d.com" % (i, i % 7))
        if i % 4 == 0:
            bits.append("10.%d.0.%d" % (i % 256, i % 200))
        if i % 5 == 0:
            bits.append("%03d-%02d-%04d" % (i % 900 + 100, i % 90 + 10, i))
        rows.append((i, " ".join(bits)))
    df = spark.createDataFrame(rows, ["id", "text"])
    once = redact.redact_pii(df, "text")
    twice = redact.redact_pii(
        once.select("id", F.col("redacted").alias("text")), "text"
    )
    a = sorted((r.id, r.redacted) for r in once.collect())
    b = sorted((r.id, r.redacted) for r in twice.collect())
    assert a == b
    again = {r.id: r for r in twice.collect()}
    assert all(r.n_email == 0 and r.n_ssn == 0 and r.n_ip == 0 for r in again.values())


def test_strip_boilerplate_is_idempotent(spark):
    """Surviving lines keep exactly their original doc sets, so their
    corpus counts are unchanged and a second pass removes nothing."""
    import random

    rng = random.Random(11)
    rows = []
    for i in range(120):
        lines = ["unique %d %d" % (i, j) for j in range(rng.randrange(1, 4))]
        if i % 2 == 0:
            lines.insert(rng.randrange(len(lines) + 1), "COMMON FOOTER")
        rows.append((i, "\n".join(lines)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    once = strip_boilerplate(df, min_docs=10)
    twice = strip_boilerplate(
        once.select("doc_id", F.col("clean_text").alias("text")), min_docs=10
    )
    a = sorted((r.doc_id, r.clean_text) for r in once.collect())
    b = sorted((r.doc_id, r.clean_text) for r in twice.collect())
    assert a == b
    assert all("COMMON FOOTER" not in t for _, t in a)


def test_pack_shards_conservation_random(spark):
    """Random token sizes: offsets are a permutation of the exclusive
    prefix sums (conservation), shard ids are dense from 0."""
    import random

    rng = random.Random(23)
    rows = [(i, rng.randrange(1, 500)) for i in range(1000)]
    total = sum(t for _, t in rows)
    df = spark.createDataFrame(rows, ["k", "tok"])
    packed = pack_shards(df, "tok", "k", cap=5000, buckets=16).collect()
    got = sorted(r.global_offset for r in packed)
    # exclusive prefix sums over SOME deterministic order: max offset +
    # its token == total, min == 0, all distinct
    assert got[0] == 0 and len(set(got)) == len(got)
    by_off = {r.global_offset: r.tok for r in packed}
    assert got[-1] + by_off[got[-1]] == total
    shards = sorted({r.shard for r in packed})
    assert shards == list(range(len(shards)))


def test_mixture_upsample_epochs(spark):
    from kfai_pipeline_spark.operators.sampling import mixture_upsample

    # s0 tiny (100 docs x 10 tok), s1 big (1900 x 10) — s0 up-weighted
    rows = [(i, "s0" if i < 100 else "s1", 10) for i in range(2000)]
    df = spark.createDataFrame(rows, ["k", "src", "tok"])
    out = mixture_upsample(
        df, "src", {"s0": 5.0}, "tok", budget_frac=0.5, key_col="k", max_epochs=4.0
    ).collect()
    rates = {r.src: r.rate for r in out}
    # s0 target: (5/6)*0.5*20000 = 8333 tokens of 1000 -> rate capped at 4
    assert rates["s0"] == 4.0
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.k, []).append(r.copy)
    # integer rate -> every s0 doc exactly 4 copies, ids 0..3
    for i in range(100):
        assert sorted(by_doc[i]) == [0, 1, 2, 3]
    # fractional s1 rate in (0,1): every doc has at most one copy, id 0
    assert 0 < rates["s1"] < 1
    s1_counts = [len(by_doc.get(i, [])) for i in range(100, 2000)]
    assert max(s1_counts) <= 1
    got_frac = sum(s1_counts) / 1900
    assert abs(got_frac - rates["s1"]) < 0.05


def test_quality_classifier_learns_separable_labels(spark):
    """End-to-end MLlib scaffold: features from raw text, LR training,
    distributed scoring. Labels are constructed separable (docs salted
    with heavy word repetition = bad), so the model must rank a held-out
    bad doc below a held-out good doc."""
    import random

    from kfai_pipeline_spark.operators.quality_classifier import (
        build_features,
        score_quality,
        train_quality_model,
    )

    rng = random.Random(3)
    vocab = ["alpha", "beta", "gamma", "delta", "the", "for", "with", "is"]
    rows = []
    for i in range(300):
        if i % 2 == 0:  # good: varied words
            words = [vocab[rng.randrange(len(vocab))] for _ in range(60)]
            label = 1.0
        else:  # bad: one word stuffed
            words = ["spamword"] * 60
            label = 0.0
        rows.append((i, " ".join(words), label))
    df = spark.createDataFrame(rows, ["doc_id", "text", "label"])
    feats = build_features(df).join(df.select("doc_id", "label"), "doc_id")
    train = feats.where(F.col("doc_id") < 280)
    test = feats.where(F.col("doc_id") >= 280)
    model = train_quality_model(train)
    scored = {r.doc_id: r.quality_prob for r in score_quality(model, test).collect()}
    good = [scored[i] for i in range(280, 300) if i % 2 == 0]
    bad = [scored[i] for i in range(280, 300) if i % 2 == 1]
    assert min(good) > max(bad)


def test_write_training_shards_roundtrip(spark, tmp_path):
    import os

    from kfai_pipeline_spark.operators.shard_pack import write_training_shards

    df = spark.createDataFrame(
        [(i, "doc %d text" % i, 50 + (i % 7) * 10) for i in range(300)],
        ["k", "text", "tok"],
    )
    out = str(tmp_path / "shards")
    packed = write_training_shards(df, out, "tok", "k", cap=2000, buckets=8)
    back = spark.read.json(out)
    # every row survives the roundtrip into its assigned shard partition
    assert back.count() == 300
    a = sorted((r.k, r.shard) for r in packed.select("k", "shard").collect())
    b = sorted((int(r.k), int(r.shard)) for r in back.select("k", "shard").collect())
    assert a == b
    # one data file per shard directory (repartition('shard') held)
    shard_dirs = [d for d in os.listdir(out) if d.startswith("shard=")]
    assert len(shard_dirs) == len({s for _, s in a})
    for d in shard_dirs:
        files = [f for f in os.listdir(os.path.join(out, d)) if f.endswith(".json")]
        assert len(files) == 1, (d, files)


def test_training_order_layout_independent_and_salted(spark):
    """(shard, pos) must be a pure function of (key, salt): identical
    under repartition, permuted by a different salt, and pos must be a
    dense 1..n sequence within every shard."""
    df = spark.range(500).withColumnRenamed("id", "doc_id")
    a = sampling.training_order(df, n_shards=8, key_col="doc_id")
    b = sampling.training_order(df.repartition(13), n_shards=8, key_col="doc_id")
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a == rows_b, "assignment must not depend on physical layout"

    c = sampling.training_order(df, n_shards=8, key_col="doc_id", salt="epoch1")
    assert sorted(map(tuple, c.collect())) != rows_a, "salt must re-permute"

    by_shard: dict[int, list[int]] = {}
    for doc_id, shard, pos in rows_a:
        by_shard.setdefault(shard, []).append(pos)
    assert set(by_shard) == set(range(8))
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), f"gap in shard {shard}"


def test_bigram_logprob_contract(spark):
    """Short docs drop out, identical docs score identically, and every
    mean log-probability is negative (probabilities < 1)."""
    from kfai_pipeline_spark.operators.text_analysis import bigram_logprob

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat sat on the mat"),
            (3, "solo"),
            (4, "completely different words here"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in bigram_logprob(df).collect()}
    assert 3 not in rows, "single-word doc has no transitions"
    assert rows[1]["avg_logprob"] == rows[2]["avg_logprob"]
    assert rows[1]["n_bigrams"] == 5
    for r in rows.values():
        assert r["avg_logprob"] < 0


# ------------------------------------------- segment dedup (X39, q108)
def test_segment_words_chunks_map_side(spark):
    from kfai_pipeline_spark.operators.text_analysis import segment_words

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "  x   y  "), (3, "solo")], ["doc_id", "text"]
    )
    rows = sorted(
        (r.doc_id, r.seg_no, r.seg)
        for r in segment_words(df, words_per_seg=2).collect()
    )
    assert rows == [
        (1, 0, "a b"), (1, 1, "c d"), (1, 2, "e"),
        (2, 0, "x y"), (3, 0, "solo"),
    ]
    # map-side only: no Exchange in the plan
    plan = segment_words(df, words_per_seg=2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_dedup_segments_keeps_first_global_occurrence(spark):
    from kfai_pipeline_spark.operators.dedup import dedup_segments

    segs = spark.createDataFrame(
        [
            (1, 0, "hello world"),
            (1, 1, "subscribe now"),
            (2, 0, "Subscribe   now"),   # dup of (1,1) after lower+trim? no: inner spaces differ
            (2, 1, "subscribe now"),     # exact dup of (1,1)
            (2, 2, "SUBSCRIBE NOW"),     # dup after lower
            (3, 0, "hello world"),       # dup of (1,0)
            (3, 1, ""),                  # blank: always kept
            (1, 2, "subscribe now"),     # later pos in doc 1: dropped too
        ],
        ["doc_id", "seg_no", "seg"],
    )
    out = {
        (r.doc_id, r.seg_no): r.keep
        for r in dedup_segments(segs).collect()
    }
    assert out == {
        (1, 0): True, (1, 1): True, (1, 2): False,
        (2, 0): True,   # inner whitespace differs -> distinct segment
        (2, 1): False, (2, 2): False,
        (3, 0): False, (3, 1): True,
    }


def test_dedup_segments_text_reassembles_in_order(spark):
    from kfai_pipeline_spark.operators.dedup import dedup_segments_text

    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),      # segs: "a b", "c d", "e f"
            (2, "c d a b x y"),      # "c d" and "a b" are repeats of doc 1
            (3, "a b c d"),          # every segment is a repeat -> NULL text
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in dedup_segments_text(df, words_per_seg=2).collect()}
    assert (out[1].n_segs, out[1].n_kept, out[1].dedup_text) == (3, 3, "a b c d e f")
    assert (out[2].n_segs, out[2].n_kept, out[2].dedup_text) == (3, 1, "x y")
    assert (out[3].n_segs, out[3].n_kept) == (2, 0)
    assert out[3].dedup_text is None


# ------------------------------------------------- DSIR (X41, q109)
def test_dsir_weights_prefer_target_like_docs(spark):
    from kfai_pipeline_spark.operators.sampling import dsir_sample, dsir_weights

    # target docs are all "t t t ..."; distractors are "d d d ...";
    # the probe docs mix both vocabularies in different proportions
    rows = [(i, "t " * 10, True) for i in range(10)]
    rows += [(100 + i, "d " * 10, False) for i in range(10)]
    rows += [(200, "t t t t t t t t", False), (201, "d d d d d d d d", False)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "tgt"])
    w = {
        r.doc_id: r.dsir_weight
        for r in dsir_weights(df, F.col("tgt"), buckets=64).collect()
    }
    # the target-vocabulary probe outscores the distractor-vocabulary one
    assert w[200] > w[201]
    # ranking: the ten pure-target docs (9 positive bigrams each), then
    # 200 (7 positive), then 201 (7 negative), then the d-docs (9
    # negative) — so top-11 is exactly the t-docs plus 200
    top = [r.doc_id for r in dsir_sample(df, F.col("tgt"), k=11, buckets=64).collect()]
    assert 200 in top and 201 not in top


def test_dsir_weight_is_partitioning_invariant(spark):
    from kfai_pipeline_spark.operators.sampling import dsir_weights

    df = spark.createDataFrame(
        [(i, " ".join("w%d" % ((i * 7 + j) % 13) for j in range(20)), i % 3 == 0)
         for i in range(60)],
        ["doc_id", "text", "tgt"],
    )
    a = {r.doc_id: r.dsir_weight
         for r in dsir_weights(df, F.col("tgt")).collect()}
    b = {r.doc_id: r.dsir_weight
         for r in dsir_weights(df.repartition(13, "doc_id"), F.col("tgt")).collect()}
    assert a == b  # bit-identical: the fold is ordered, stats are exact ints


def test_segment_dedup_is_total_over_null_and_empty_text(spark):
    from kfai_pipeline_spark.operators.dedup import dedup_segments_text
    from kfai_pipeline_spark.operators.sampling import dsir_weights

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, None), (3, "")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in dedup_segments_text(df, words_per_seg=2).collect()}
    # every input doc survives the pass; NULL text behaves like empty
    assert set(out) == {1, 2, 3}
    assert (out[2].n_segs, out[2].n_kept, out[2].dedup_text) == (1, 1, "")
    # DSIR: featureless docs are absent by contract (unscorable != 0)
    scored = {r.doc_id for r in dsir_weights(df, F.lit(False)).collect()}
    assert scored == {1}


def test_dedup_segments_text_matches_python_reference(spark):
    """Property: the Spark pipeline must agree with a direct Python
    transcription of the contract (global first-occurrence by
    (doc_id, seg_no), lower+trim normalization, blanks always kept,
    in-order reassembly, NULL when nothing survives) on randomized
    high-collision corpora."""
    import re

    from hypothesis import given, settings, strategies as st

    from kfai_pipeline_spark.operators.dedup import dedup_segments_text

    def ref_dedup(docs, w):
        out, seen = {}, set()
        for doc_id, text in sorted(docs):
            words = re.split(r"\s+", (text or "").strip())
            segs = [
                " ".join(words[i : i + w]) for i in range(0, len(words), w)
            ]
            kept = []
            for seg in segs:
                norm = seg.strip().lower()
                if norm == "" or norm not in seen:
                    if norm:
                        seen.add(norm)
                    kept.append(seg)
            out[doc_id] = (
                len(segs),
                len(kept),
                " ".join(kept) if kept else None,
            )
        return out

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.text(alphabet="aB c", max_size=40), min_size=1, max_size=8
        )
    )
    def check(texts):
        docs = list(enumerate(texts))
        got = {
            r.doc_id: (r.n_segs, r.n_kept, r.dedup_text)
            for r in dedup_segments_text(
                spark.createDataFrame(docs, ["doc_id", "text"]),
                words_per_seg=2,
            ).collect()
        }
        assert got == ref_dedup(docs, 2)

    check()


def test_split_by_group_leakage_and_determinism(spark):
    from kfai_pipeline_spark.operators.sampling import split_by_group

    # 500 groups x 4 rows: every row of a group must get the SAME split
    df = spark.createDataFrame(
        [(i, i // 4) for i in range(2000)], "row_id long, grp long"
    )
    out = split_by_group(df, "grp", val_frac=0.2)
    per_group = (
        out.groupBy("grp")
        .agg(F.countDistinct("split").alias("n_splits"))
        .where(F.col("n_splits") > 1)
        .count()
    )
    assert per_group == 0, "a group straddled train/val — leakage"
    val_groups = (
        out.where(F.col("split") == "val").select("grp").distinct().count()
    )
    assert 50 <= val_groups <= 150  # ~20% of 500, generous band
    # determinism: identical assignment regardless of physical layout
    out2 = split_by_group(df.repartition(13), "grp", val_frac=0.2)
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, out2.collect()))
    assert a == b
    # salt decorrelates
    out3 = split_by_group(df, "grp", val_frac=0.2, salt="other")
    assert sorted(map(tuple, out3.collect())) != a
