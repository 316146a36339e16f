"""Unit tests for the round-3 retrieval/curation operators: BM25
(operators/bm25.py), heavy hitters (operators/heavy_hitters.py),
Type-1 merge upsert (pipeline.merge_upsert), source-level curation
(operators/source_filter.py), and rolling z-score anomaly detection
(rolling.rolling_zscore). The oracle suite checks sf0.01 parity; these
cover the semantic edges the fixtures don't reach."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kfai_pipeline_spark.operators.bm25 import bm25_topk
from kfai_pipeline_spark.operators.heavy_hitters import _mg_merge, heavy_hitters
from kfai_pipeline_spark.operators.pipeline import merge_upsert
from kfai_pipeline_spark.operators.rolling import rolling_zscore
from kfai_pipeline_spark.operators.source_filter import filter_by_source, source_stats

# ------------------------------------------------------------------ BM25


def test_bm25_requires_terms(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(df, [])


def test_bm25_hand_computed(spark):
    # 3 docs, query {x}: doc 1 has x once (dl 2), doc 2 twice (dl 3),
    # doc 3 never. N=3, df=2, avgdl=8/3.
    docs = spark.createDataFrame(
        [(1, "x y"), (2, "x x z"), (3, "y z w")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in bm25_topk(docs, ["x"], k=10).collect()}
    assert set(rows) == {1, 2}
    idf = math.log(1 + (3 - 2 + 0.5) / (2 + 0.5))
    avgdl = 8 / 3

    def tfn(tf, dl):
        return tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))

    assert rows[1].bm25 == pytest.approx(round(idf * tfn(1, 2), 4), abs=1e-4)
    assert rows[2].bm25 == pytest.approx(round(idf * tfn(2, 3), 4), abs=1e-4)
    assert rows[1].n_terms_hit == 1 and rows[2].n_terms_hit == 1
    # the doc with more hits in a not-much-longer doc must score higher
    assert rows[2].bm25 > rows[1].bm25


def test_bm25_k_caps_and_orders(spark):
    docs = spark.createDataFrame(
        [(i, "q " * (i + 1)) for i in range(6)], "doc_id long, text string"
    )
    out = bm25_topk(docs, ["q"], k=3).collect()
    assert len(out) == 3
    scores = [r.bm25 for r in out]
    assert scores == sorted(scores, reverse=True)


# --------------------------------------------------------- heavy hitters


def test_mg_merge_keeps_bound_and_guarantee():
    import random

    rng = random.Random(7)
    k = 8
    stream = [f"w{rng.randrange(30)}" for _ in range(5000)] + ["hot"] * 1200
    rng.shuffle(stream)
    exact: dict[str, int] = {}
    for w in stream:
        exact[w] = exact.get(w, 0) + 1
    counters: dict[str, int] = {}
    for i in range(0, len(stream), 97):  # uneven batches
        batch: dict[str, int] = {}
        for w in stream[i : i + 97]:
            batch[w] = batch.get(w, 0) + 1
        counters = _mg_merge(counters, batch, k)
    assert len(counters) <= k
    n = len(stream)
    for w, c in exact.items():
        if c > n / (k + 1):  # MG guarantee: must survive with bounded error
            assert w in counters
            assert counters[w] >= c - n // (k + 1)


@pytest.mark.parametrize("parts", [1, 7])
def test_heavy_hitters_exact_regardless_of_partitioning(spark, parts):
    import random

    rng = random.Random(3)
    words = ["hot"] * 400 + ["warm"] * 150 + [f"cold{i}" for i in range(450)]
    rng.shuffle(words)
    docs = spark.createDataFrame(
        [(i, " ".join(words[i * 20 : (i + 1) * 20])) for i in range(50)],
        "doc_id long, text string",
    ).repartition(parts)
    out = {(r.word, r.cnt) for r in heavy_hitters(docs, k=5).collect()}
    n = len(words)
    brute = {
        (w, c)
        for w, c in {w: words.count(w) for w in set(words)}.items()
        if c * 5 > n
    }
    assert out == brute
    assert brute == {("hot", 400)}, "fixture drifted: expected exactly one HH"


# ----------------------------------------------------------- merge upsert

_BASE_ROWS = [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)]
_SCHEMA = "k long, name string, val double"


def test_merge_upsert_update_insert_delete(spark):
    base = spark.createDataFrame(_BASE_ROWS, _SCHEMA)
    changes = spark.createDataFrame(
        [
            (2, "b2", 21.0, False),  # update
            (3, "c", 30.0, True),    # delete
            (9, "new", 90.0, False), # insert
        ],
        _SCHEMA + ", deleted boolean",
    )
    out = {r.k: r for r in merge_upsert(base, changes, "k", delete_col="deleted").collect()}
    assert set(out) == {1, 2, 9}
    assert out[1].name == "a"            # untouched
    assert out[2].name == "b2" and out[2].val == 21.0
    assert out[9].name == "new"


def test_merge_upsert_null_delete_flag_means_keep(spark):
    base = spark.createDataFrame(_BASE_ROWS, _SCHEMA)
    changes = spark.createDataFrame([(2, "b2", 21.0, None)], _SCHEMA + ", deleted boolean")
    out = {r.k for r in merge_upsert(base, changes, "k", delete_col="deleted").collect()}
    assert out == {1, 2, 3}


def test_merge_upsert_without_delete_col_and_shuffle_path(spark):
    base = spark.createDataFrame(_BASE_ROWS, _SCHEMA)
    changes = spark.createDataFrame([(1, "a2", 11.0), (4, "d", 40.0)], _SCHEMA)
    out = {r.k: r.name for r in merge_upsert(
        base, changes, "k", broadcast_changes=False
    ).collect()}
    assert out == {1: "a2", 2: "b", 3: "c", 4: "d"}


def test_merge_upsert_composite_key(spark):
    base = spark.createDataFrame(
        [(1, "x", 1.0), (1, "y", 2.0)], "k long, sub string, val double"
    )
    changes = spark.createDataFrame([(1, "y", 9.0)], "k long, sub string, val double")
    out = {(r.k, r.sub): r.val for r in merge_upsert(base, changes, ["k", "sub"]).collect()}
    assert out == {(1, "x"): 1.0, (1, "y"): 9.0}


# --------------------------------------------------------- source curation


def test_source_stats_gates_and_blocklist(spark):
    rows = []
    for i in range(6):
        rows.append((i, "good", "one two three four five six"))        # avg 6
    for i in range(6):
        rows.append((10 + i, "short", "a b"))                           # avg 2 < min
    rows.append((20, "tiny", "one two three four five six"))            # 1 doc < min_docs
    for i in range(6):
        rows.append((30 + i, "blocked", "one two three four five six"))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    stats = {r.source: r for r in source_stats(
        docs, min_docs=2, min_avg_tokens=3.0, max_avg_tokens=100.0,
        blocklist=["blocked"],
    ).collect()}
    assert stats["good"].kept is True
    assert stats["short"].kept is False       # token band
    assert stats["tiny"].kept is False        # min_docs
    assert stats["blocked"].kept is False     # blocklist
    assert stats["good"].n_docs == 6
    assert stats["good"].distinct_text_ratio == pytest.approx(round(1 / 6, 4))
    kept_docs = filter_by_source(
        docs, source_stats(
            docs, min_docs=2, min_avg_tokens=3.0, max_avg_tokens=100.0,
            blocklist=["blocked"],
        )
    )
    assert {r.source for r in kept_docs.collect()} == {"good"}
    assert kept_docs.count() == 6


# --------------------------------------------------------- rolling z-score


def _events(spark, rows):
    return spark.createDataFrame(rows, "event_id long, user_id long, ts string, value double").withColumn(
        "ts", F.to_timestamp("ts")
    )


def test_rolling_zscore_hand_computed(spark):
    ev = _events(spark, [
        (1, 1, "2024-01-01 00:00:00", 1.0),
        (2, 1, "2024-01-01 00:10:00", 1.0),
        (3, 1, "2024-01-01 00:20:00", 10.0),
    ])
    out = {r.event_id: r for r in rolling_zscore(
        ev, "user_id", "ts", "value", 3600, min_points=3, z_threshold=1.0
    ).collect()}
    assert out[1].zscore is None and out[1].is_anomaly is False  # frame of 1
    assert out[2].zscore is None and out[2].is_anomaly is False  # frame of 2
    mean, std = 4.0, math.sqrt(27.0)
    assert out[3].roll_mean == pytest.approx(4.0)
    assert out[3].roll_std == pytest.approx(round(std, 4))
    assert out[3].zscore == pytest.approx(round((10.0 - mean) / std, 4))
    assert out[3].is_anomaly is True  # |1.1547| > 1.0


def test_rolling_zscore_zero_variance_and_frame_eviction(spark):
    ev = _events(spark, [
        (1, 1, "2024-01-01 00:00:00", 5.0),
        (2, 1, "2024-01-01 00:01:00", 5.0),
        (3, 1, "2024-01-01 00:02:00", 5.0),   # 3 points, zero variance
        (4, 1, "2024-01-01 02:00:00", 99.0),  # old rows evicted: frame of 1
    ])
    out = {r.event_id: r for r in rolling_zscore(
        ev, "user_id", "ts", "value", 3600
    ).collect()}
    assert out[3].zscore is None and out[3].is_anomaly is False  # std == 0
    assert out[4].roll_mean == pytest.approx(99.0)               # frame holds only itself
    assert out[4].zscore is None


def test_rolling_zscore_keys_are_independent(spark):
    ev = _events(spark, [
        (1, 1, "2024-01-01 00:00:00", 1.0),
        (2, 2, "2024-01-01 00:00:01", 100.0),
        (3, 1, "2024-01-01 00:00:02", 1.0),
        (4, 2, "2024-01-01 00:00:03", 100.0),
    ])
    out = {r.event_id: r for r in rolling_zscore(ev, "user_id", "ts", "value", 3600).collect()}
    assert out[3].roll_mean == pytest.approx(1.0)
    assert out[4].roll_mean == pytest.approx(100.0)


# ------------------------------------------------------------- RRF fusion


def test_rrf_fuse_hand_computed(spark):
    from kfai_pipeline_spark.operators.fusion import rrf_fuse

    lex = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank int")
    vec = spark.createDataFrame([(3, 1), (1, 2), (9, 3)], "doc_id long, rank int")
    out = {r.doc_id: r for r in rrf_fuse([lex, vec], "doc_id", k=10).collect()}
    assert set(out) == {1, 2, 3, 9}
    assert out[1].rrf == pytest.approx(round(1 / 61 + 1 / 62, 6))
    assert out[2].rrf == pytest.approx(round(1 / 62, 6))       # missing in vec
    assert out[9].rrf == pytest.approx(round(1 / 63, 6))       # missing in lex
    assert out[1].n_lists_hit == 2 and out[2].n_lists_hit == 1
    # both-lists doc 3 (ranks 3,1) must beat single-list docs
    ordered = [r.doc_id for r in rrf_fuse([lex, vec], "doc_id", k=2).collect()]
    assert ordered[0] in (1, 3) and len(ordered) == 2


def test_rrf_fuse_requires_lists(spark):
    from kfai_pipeline_spark.operators.fusion import rrf_fuse

    with pytest.raises(ValueError):
        rrf_fuse([], "doc_id")


def test_with_rank_is_positional(spark):
    from kfai_pipeline_spark.operators.fusion import with_rank

    df = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9)], "doc_id long, score double"
    )
    out = {r.doc_id: r.rank for r in with_rank(
        df, [F.col("score").desc(), F.col("doc_id")]
    ).collect()}
    assert out == {2: 1, 3: 2, 1: 3}


# ----------------------------------------------------- incremental aggregates


def test_merge_agg_snapshots_equals_full_recompute(spark):
    from kfai_pipeline_spark.operators.pipeline import merge_agg_snapshots

    import random

    rng = random.Random(11)
    rows = [(rng.randrange(5), rng.random() * 100, rng.randrange(1000)) for _ in range(400)]
    df = spark.createDataFrame(rows, "k long, v double, seq long")

    def rollup(d):
        return d.groupBy("k").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("v").alias("sum_v"),
            F.min("seq").alias("min_seq"),
            F.max("seq").alias("max_seq"),
        )

    merged = merge_agg_snapshots(
        rollup(df.where(F.col("seq") < 500)),
        rollup(df.where(F.col("seq") >= 500)),
        "k",
        {"cnt": "sum", "sum_v": "sum", "min_seq": "min", "max_seq": "max"},
    )
    got = {r.k: r for r in merged.collect()}
    want = {r.k: r for r in rollup(df).collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k].cnt == want[k].cnt
        assert got[k].sum_v == pytest.approx(want[k].sum_v, rel=1e-9)
        assert got[k].min_seq == want[k].min_seq
        assert got[k].max_seq == want[k].max_seq


def test_merge_agg_snapshots_rejects_non_mergeable(spark):
    from kfai_pipeline_spark.operators.pipeline import merge_agg_snapshots

    df = spark.createDataFrame([(1, 1.0)], "k long, avg_v double")
    with pytest.raises(ValueError):
        merge_agg_snapshots(df, df, "k", {"avg_v": "avg"})


# ------------------------------------------------------------ property tests

from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

_WORDS = ["alpha", "beta", "gamma", "delta", "eps"]


@st.composite
def _bm25_case(draw):
    corpus = draw(
        st.lists(
            st.lists(st.sampled_from(_WORDS), min_size=1, max_size=12),
            min_size=1,
            max_size=10,
        )
    )
    terms = draw(st.lists(st.sampled_from(_WORDS), min_size=1, max_size=3, unique=True))
    return corpus, terms


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(_bm25_case())
def test_bm25_matches_python_reference(spark, case):
    """Property: the distributed plan equals a direct python Okapi BM25
    for arbitrary tiny corpora (tf>1, df=N, single-term docs, ties)."""
    corpus, terms = case
    docs = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(corpus)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.bm25 for r in bm25_topk(docs, terms, k=100).collect()}
    n = len(corpus)
    avgdl = sum(len(ws) for ws in corpus) / n
    expect = {}
    for i, ws in enumerate(corpus):
        score = 0.0
        for t in set(terms):
            tf = ws.count(t)
            if tf == 0:
                continue
            dfn = sum(1 for other in corpus if t in other)
            idf = math.log(1 + (n - dfn + 0.5) / (dfn + 0.5))
            score += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(ws) / avgdl))
        if score:
            expect[i] = round(score, 4)
    assert set(got) == set(expect)
    for i in expect:
        assert got[i] == pytest.approx(expect[i], abs=2e-4)


@st.composite
def _merge_case(draw):
    base = draw(
        st.dictionaries(st.integers(0, 15), st.integers(0, 99), min_size=0, max_size=10)
    )
    changes = draw(
        st.dictionaries(
            st.integers(0, 15),
            st.tuples(st.integers(100, 199), st.sampled_from([True, False, None])),
            min_size=0,
            max_size=10,
        )
    )
    return base, changes


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(_merge_case())
def test_merge_upsert_matches_dict_fold(spark, case):
    """Property: merge_upsert == the reference's imperative dict
    overwrite (ref fetch_raw_data.py:64-67) plus delete handling, for
    arbitrary overlapping key sets and None delete flags."""
    base, changes = case
    base_df = spark.createDataFrame(
        [(k, v) for k, v in base.items()], "k long, v long"
    )
    ch_df = spark.createDataFrame(
        [(k, v, d) for k, (v, d) in changes.items()],
        "k long, v long, deleted boolean",
    )
    got = {r.k: r.v for r in merge_upsert(base_df, ch_df, "k", delete_col="deleted").collect()}
    expect = dict(base)
    for k, (v, d) in changes.items():
        if d:  # True -> delete; False/None -> upsert
            expect.pop(k, None)
        else:
            expect[k] = v
    assert got == expect


@st.composite
def _zscore_case(draw):
    return draw(
        st.lists(
            st.tuples(
                st.integers(0, 2),            # key
                st.integers(0, 7200),         # ts offset seconds
                st.integers(-50, 50),         # value (int -> exact doubles)
            ),
            min_size=1,
            max_size=25,
        )
    )


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(_zscore_case())
def test_rolling_zscore_matches_python_reference(spark, case):
    """Property: the single-Window plan equals a brute-force trailing
    scan (inclusive [t-1h, t], sample stddev, min_points/zero-variance
    gating) for arbitrary tie/eviction layouts."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, k, (base + datetime.timedelta(seconds=off)).isoformat(sep=" "), float(v))
        for i, (k, off, v) in enumerate(case)
    ]
    ev = _events(spark, rows)
    got = {r.event_id: r for r in rolling_zscore(
        ev, "user_id", "ts", "value", 3600, min_points=3, z_threshold=2.0
    ).collect()}
    for i, (k, off, v) in enumerate(case):
        frame = [
            float(v2) for (k2, off2, v2) in case
            if k2 == k and off - 3600 <= off2 <= off
        ]
        n = len(frame)
        mean = sum(frame) / n
        r = got[i]
        assert r.roll_mean == pytest.approx(round(mean, 4), abs=1e-4)
        if n >= 2:
            var = sum((x - mean) ** 2 for x in frame) / (n - 1)
            std = math.sqrt(var)
            assert (r.roll_std or 0.0) == pytest.approx(round(std, 4), abs=1e-4)
        if n >= 3:
            var = sum((x - mean) ** 2 for x in frame) / (n - 1)
            std = math.sqrt(var)
            if std > 0:
                z = (v - mean) / std
                assert r.zscore == pytest.approx(round(z, 4), abs=1e-4)
                assert r.is_anomaly == (abs(z) > 2.0)
            else:
                assert r.zscore is None and r.is_anomaly is False
        else:
            assert r.zscore is None and r.is_anomaly is False


@st.composite
def _hh_case(draw):
    # skewed vocabulary: few hot words + a long tail
    corpus = draw(
        st.lists(
            st.lists(
                st.sampled_from(["hot", "warm", "w1", "w2", "w3", "w4", "w5", "w6"]),
                min_size=0,
                max_size=15,
            ),
            min_size=1,
            max_size=12,
        )
    )
    k = draw(st.integers(1, 8))
    parts = draw(st.integers(1, 5))
    return corpus, k, parts


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(_hh_case())
def test_heavy_hitters_matches_counter(spark, case):
    """Property: output == brute-force Counter filter (cnt*k > N) for
    arbitrary corpora, k, and partitionings — the MG candidate phase
    may vary with partitioning but can never change the answer."""
    from collections import Counter

    corpus, k, parts = case
    docs = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(corpus)],
        "doc_id long, text string",
    ).repartition(parts)
    got = {(r.word, r.cnt) for r in heavy_hitters(docs, k=k).collect()}
    counts = Counter(w for ws in corpus for w in ws)
    n = sum(counts.values())
    want = {(w, c) for w, c in counts.items() if c * k > n}
    assert got == want


# ------------------------------------------ salt-by-time hot-key arm (§5o)
def test_rolling_bucketed_arm_equals_single_window(spark):
    """The bucket_seconds hot-key arm must return EXACTLY the plain
    single-window results — same counts/sums/z-scores — across a
    dataset engineered to cross bucket boundaries (frames reaching
    into the previous bucket, rows ON the boundary, a hot key with
    most of the rows, several bucket widths)."""
    import random as _random

    from kfai_pipeline_spark.operators.rolling import (
        rolling_time_agg,
        rolling_zscore,
    )

    rng = _random.Random(7)
    rows = []
    eid = 0
    # hot user 1: 400 events over ~6 hours (dense: frames span buckets)
    for _ in range(400):
        eid += 1
        rows.append((eid, 1, 21600 * rng.random(), round(rng.random() * 10, 2)))
    # sparse users incl. boundary-exact timestamps
    for u in (2, 3):
        for t in (0.0, 3600.0, 3600.0, 7199.999999, 7200.0, 10800.0):
            eid += 1
            rows.append((eid, u, t, float(u)))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, secs double, value double"
    ).select(
        "event_id", "user_id",
        F.timestamp_seconds(F.col("secs")).alias("ts"), "value",
    )

    def key(df):
        return sorted(map(tuple, df.select(sorted(df.columns)).collect()))

    for dur, bucket in ((3600, 3600), (3600, 5400), (1800, 3600)):
        plain = rolling_time_agg(ev, "user_id", "ts", "value", dur)
        salted = rolling_time_agg(
            ev, "user_id", "ts", "value", dur, bucket_seconds=bucket
        )
        assert key(plain) == key(salted), (dur, bucket)

    pz = rolling_zscore(ev, "user_id", "ts", "value", 3600)
    sz = rolling_zscore(ev, "user_id", "ts", "value", 3600, bucket_seconds=3600)
    assert key(pz) == key(sz)

    # a bucket narrower than the frame must be rejected, not mis-compute
    import pytest as _pytest

    with _pytest.raises(ValueError):
        rolling_time_agg(ev, "user_id", "ts", "value", 3600, bucket_seconds=1800)


def test_rolling_bucketed_arm_null_ts_and_key_parity(spark):
    """NULL ts buckets to NULL — its context copy would land in the
    same partition as the own copy and double into every NULL-ordered
    frame; the guard keeps only the own copy. NULL keys group like the
    plain arm. Parity must hold exactly."""
    from kfai_pipeline_spark.operators.rolling import rolling_time_agg

    rows = [
        (1, 1, 100.0, 1.0),
        (2, 1, 200.0, 2.0),
        (3, 1, None, 4.0),    # NULL ts
        (4, None, 150.0, 8.0),  # NULL key
        (5, None, 160.0, 16.0),
        (6, 2, None, 32.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, secs double, value double"
    ).select(
        "event_id", "user_id",
        F.timestamp_seconds(F.col("secs")).alias("ts"), "value",
    )

    def key(df):
        return sorted(
            map(tuple, df.select(sorted(df.columns)).collect()),
            key=str,
        )

    plain = rolling_time_agg(ev, "user_id", "ts", "value", 60)
    salted = rolling_time_agg(ev, "user_id", "ts", "value", 60,
                              bucket_seconds=60)
    assert key(plain) == key(salted)
    assert salted.count() == 6  # no row lost, none duplicated
