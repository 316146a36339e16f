"""Scalar-function tests (F1-F21): Spark Column implementations vs
Python-reference semantics (ported fixtures from
/root/reference/src/kfai/transformers/utils/helpers.py:92-114 and
.../loaders/utils/helpers/datetime.py:4-39 behavior)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kfai_pipeline_spark.functions import (
    clean_llm_response,
    clean_text_chunk,
    csv_join,
    csv_split,
    format_hms,
    iso_duration_to_seconds,
    iso_to_epoch,
    like_escape,
    normalize_quotes,
    take_after_marker,
    watch_url,
)


def _run1(spark, col_expr, value):
    """Evaluate a Column over one string value."""
    df = spark.createDataFrame([(value,)], ["s"])
    return df.select(col_expr.alias("out")).collect()[0]["out"]


# ---- text (F1-F9, F21) ----
@pytest.mark.parametrize(
    "raw, expected",
    [
        # profanity marker (F1): [nbsp __ nbsp] -> ****
        ("before [ __ ] after", "before **** after"),
        # bracket tags stripped (F2), whitespace collapsed (F3)
        ("hello [Music] world", "hello world"),
        ("a [ Applause ] b   c", "a b c"),
        # literal fillers (F4)
        ("zero​width and\xa0nbsp >>ok", "zerowidth and nbsp ok"),
        # leading/trailing trim
        ("  padded  ", "padded"),
        ("", ""),
    ],
)
def test_clean_text_chunk(spark, raw, expected):
    assert _run1(spark, clean_text_chunk("s"), raw) == expected


def test_normalize_quotes(spark):
    assert _run1(spark, normalize_quotes("s"), "‘a’ “b”") == "'a' \"b\""


@pytest.mark.parametrize(
    "raw, expected",
    [
        ("preamble Here is the cleaned chunk: result", " result"),
        ("<think>blah</think>final", "final"),
        ("<CHUNK>text</CHUNK>", "text"),
        ("no markers", "no markers"),
    ],
)
def test_clean_llm_response(spark, raw, expected):
    assert _run1(spark, clean_llm_response("s"), raw) == expected


def test_take_after_marker_matches_python_split(spark):
    for raw in ["a|b|c", "no-sep", "trailing|", "|leading"]:
        got = _run1(spark, take_after_marker("s", "|"), raw)
        assert got == raw.split("|")[-1]


def test_csv_roundtrip(spark):
    df = spark.createDataFrame([("a, b ,c",)], ["s"])
    arr = df.select(csv_split("s").alias("a")).collect()[0]["a"]
    assert arr == ["a", "b", "c"]
    joined = df.select(csv_join(csv_split("s")).alias("j")).collect()[0]["j"]
    assert joined == "a,b,c"


def test_like_escape(spark):
    # F9: % and _ escaped so LIKE treats them literally (ref filtering.py:113)
    assert _run1(spark, like_escape("s"), "50%_off") == r"50\%\_off"
    df = spark.createDataFrame([("Host_B",), ("HostXB",)], ["name"])
    pat = df.select(F.concat(F.lit("%"), like_escape("name"), F.lit("%")).alias("p")).collect()[
        0
    ]["p"]
    hits = df.where(F.col("name").like(pat)).collect()
    assert [r["name"] for r in hits] == ["Host_B"]


def test_watch_url(spark):
    df = spark.createDataFrame([("abc123", 75.9)], ["vid", "t"])
    out = df.select(watch_url("vid", "t").alias("u")).collect()[0]["u"]
    assert out == "https://www.youtube.com/watch?v=abc123&t=75s"


# ---- datetime (F11, F12, F14) ----
@pytest.mark.parametrize(
    "iso, expected",
    [
        ("2012-01-01T00:00:00", 1325376000),  # the reference's floor constant
        ("2023-06-15T12:30:00Z", 1686832200),
        ("2023-06-15T12:30:00+02:00", 1686825000),
        ("", 0),
        ("not-a-date", 0),
    ],
)
def test_iso_to_epoch(spark, iso, expected):
    assert _run1(spark, iso_to_epoch("s"), iso) == expected


@pytest.mark.parametrize(
    "dur, expected",
    [
        ("PT1H2M", 3720),
        ("PT15S", 15),
        ("P1DT2H3M4S", 93784),
        ("PT2H", 7200),
        ("P2D", 172800),
        ("PT1M10S", 70),
        ("", 0),
        ("garbage", 0),
    ],
)
def test_iso_duration_to_seconds(spark, dur, expected):
    assert _run1(spark, iso_duration_to_seconds("s"), dur) == expected


@pytest.mark.parametrize(
    "secs, expected",
    [(0, "0:00:00"), (59, "0:00:59"), (75, "0:01:15"), (3600, "1:00:00"), (7384, "2:03:04")],
)
def test_format_hms(spark, secs, expected):
    df = spark.createDataFrame([(secs,)], ["s"])
    assert df.select(format_hms("s").alias("o")).collect()[0]["o"] == expected
