"""Text-analysis operator tests (X4): language-ID accuracy on real
multilingual samples (the driver fixture's lang labels are synthetic —
its text is English-ish regardless of label), quality features vs
Python-computed values, fingerprint invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kfai_pipeline_spark.operators import text_analysis as TA

SAMPLES = [
    ("en", "the cat sat on the mat and looked at the dog with a smile"),
    ("en", "this is a test of the emergency broadcast system for all of us"),
    ("de", "der Hund und die Katze sind nicht mit dem Vogel in den Garten"),
    ("de", "das ist ein gutes Buch und der Mann ist nicht zu alt"),
    ("fr", "le chat et la souris sont dans la maison pour le dîner"),
    ("fr", "les enfants ne sont pas à l'école et c'est une belle journée pour"),
    ("es", "el perro y el gato no es una buena combinación por la casa"),
    ("es", "los niños es que no con una el y por la mañana"),
    ("zh", "我 是 他 的 人 这 不 在 有 了"),
]


@pytest.fixture(scope="module")
def sample_docs(spark):
    return spark.createDataFrame(
        [(i, lang, text) for i, (lang, text) in enumerate(SAMPLES)],
        "doc_id long, lang string, text string",
    )


def test_lang_id_accuracy_on_real_samples(spark, sample_docs):
    out = TA.lang_id(sample_docs, "text").collect()
    for r in out:
        assert r["pred_lang"] == r["lang"], (r["lang"], r["text"], r["pred_lang"])


def test_lang_id_und_for_no_markers(spark):
    df = spark.createDataFrame([(1, "xyzzy plugh qwerty")], "doc_id long, text string")
    assert TA.lang_id(df, "text").first()["pred_lang"] == "und"


def test_token_count_matches_python(spark, sample_docs):
    rows = sample_docs.select("text", TA.token_count("text").alias("n")).collect()
    for r in rows:
        assert r["n"] == len(r["text"].split())
    empty = spark.createDataFrame([("",), ("   ",)], "text string")
    assert [r["n"] for r in empty.select(TA.token_count("text").alias("n")).collect()] == [0, 0]


def test_quality_features_ranges_and_values(spark, sample_docs):
    feats = TA.quality_features(sample_docs, "text").collect()
    import re

    for r in feats:
        text = r["text"]
        assert r["n_tokens"] == len(text.split())
        n_punct = len(text) - len(re.sub(r"[^\w\s]", "", text, flags=re.UNICODE))
        assert r["punct_ratio"] == pytest.approx(round(n_punct / len(text), 4), abs=1e-4)
        assert 0.0 <= r["stopword_ratio"] <= 1.0
        assert 0.0 <= r["quality_score"] <= 1.0


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame(
        [("hello world",), ("abc123def",), ("a-b_c",)], "text string"
    )
    counts = [r["n"] for r in df.select(TA.bpe_ish_token_count("text").alias("n")).collect()]
    assert counts[0] == 2       # two word runs
    assert counts[1] == 3       # letters / digits / letters
    assert counts[2] >= 4       # letter, punct, letter, punct(_ is \w but - isn't)... runs


def test_fingerprint_invariants(spark, sample_docs):
    fp = TA.fingerprint(sample_docs, "text", "doc_id").collect()
    by_id = {r["doc_id"]: list(r["fingerprint"]) for r in fp}
    assert all(len(v) >= 1 for v in by_id.values())
    # deterministic
    fp2 = TA.fingerprint(sample_docs, "text", "doc_id").collect()
    assert by_id == {r["doc_id"]: list(r["fingerprint"]) for r in fp2}
    # identical docs -> identical fingerprints; a shared long passage ->
    # shared fingerprint hashes (winnowing's purpose)
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (3, "PREFIX alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: set(r["fingerprint"]) for r in TA.fingerprint(df, "text", "doc_id").collect()}
    assert out[1] == out[2]
    assert out[1] & out[3], "shared passage should share fingerprint hashes"


def test_corpus_stats_rollup(spark, sample_docs):
    out = {r["lang"]: r for r in TA.corpus_stats(sample_docs, "text", "lang").collect()}
    assert out["en"]["n_docs"] == 2
    assert out["zh"]["total_tokens"] == 10


def test_fingerprint_staging_survives_optimizer(spark, sample_docs):
    """Regression guard for the O(n^2) lambda fix: the staged k-gram
    hash array must remain its own projection (alias visible in the
    optimized plan). If CollapseProject ever starts inlining it, the
    window-min lambda silently re-hashes all k-grams per window."""
    import contextlib
    import io

    fp = TA.fingerprint(sample_docs, "text", "doc_id", k=5, window=4)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fp.explain("formatted")
    p = buf.getvalue()
    assert "__kh" in p, "staged k-gram hash projection was collapsed"
    assert "__w" in p, "staged word-split projection was collapsed"


def test_bigram_staging_survives_optimizer(spark, sample_docs):
    """Same guard for the staged splits feeding the bigram transforms in
    repetition_features and bigram_logprob."""
    import contextlib
    import io

    for build in (
        lambda: TA.repetition_features(sample_docs, "text", "doc_id"),
        lambda: TA.bigram_logprob(sample_docs, "text", "doc_id"),
    ):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            build().explain("formatted")
        assert "__w" in buf.getvalue(), "staged split projection was collapsed"


def test_truncate_long_docs_caps_and_flags(spark):
    from kfai_pipeline_spark.operators.text_analysis import truncate_long_docs

    df = spark.createDataFrame(
        [(1, "short doc"), (2, "x" * 500), (3, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in truncate_long_docs(df, "text", max_chars=100).collect()}
    assert out[1]["text"] == "short doc" and out[1]["was_truncated"] is False
    assert len(out[2]["text"]) == 100 and out[2]["was_truncated"] is True
    assert out[2]["orig_n_chars"] == 500
    # guard columns are TOTAL (round-6 NULL sweep): a NULL boolean in
    # was_truncated would poison downstream three-valued filters
    assert out[3]["text"] is None and out[3]["was_truncated"] is False
    assert out[3]["orig_n_chars"] == 0
