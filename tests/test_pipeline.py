"""Pipeline tests (SURVEY §5.2 item 4): fixture records through
ingest -> chunk -> clean (identity LLM stub) -> integrity -> explode ->
embed -> resume anti-join, asserting the reference's integrity rules and
resume idempotency."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kfai_pipeline_spark.operators.chunker import chunk_transcripts, explode_chunks
from kfai_pipeline_spark.operators.embed import embed_texts, hash_embed
from kfai_pipeline_spark.operators.llm_clean import clean_chunks_grouped, identity_clean
from kfai_pipeline_spark.operators.pipeline import (
    integrity_check,
    merge_records,
    new_work,
    split_dead_letter,
)
from kfai_pipeline_spark.sources.skip_list import filter_skipped, load_skip_set, save_skip_set
from kfai_pipeline_spark.sources.video_records import (
    RAW_SNIPPET_SCHEMA,
    read_video_records,
    write_partitioned_json,
)

from tests.fixtures import make_video_records


@pytest.fixture(scope="module")
def raw_videos(spark):
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("video_id", StringType()),
            StructField("show_name", StringType()),
            StructField("hosts", ArrayType(StringType())),
            StructField("title", StringType()),
            StructField("description", StringType()),
            StructField("published_at", LongType()),
            StructField("duration", LongType()),
            StructField("transcript", RAW_SNIPPET_SCHEMA),
        ]
    )
    return spark.createDataFrame(make_video_records(30), schema).cache()


def test_chunk_explode_counts(spark, raw_videos):
    chunked = chunk_transcripts(raw_videos)
    rows = chunked.select("video_id", "transcript", "transcript_chunks").collect()
    for r in rows:
        if r["transcript"] is None:
            assert r["transcript_chunks"] is None
        else:
            assert len(r["transcript_chunks"]) >= 1
            starts = [c["start"] for c in r["transcript_chunks"]]
            assert starts == sorted(starts)

    grain = explode_chunks(chunked.drop("transcript"))
    n_chunks = sum(len(r["transcript_chunks"]) for r in rows if r["transcript_chunks"])
    assert grain.count() == n_chunks
    assert {"chunk_idx", "text", "start_time"} <= set(grain.columns)


def test_partitioned_json_roundtrip(spark, raw_videos, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("raw_json"))
    chunked = chunk_transcripts(raw_videos).drop("transcript")
    write_partitioned_json(chunked, out)
    back = read_video_records(spark, out)
    assert back.count() == raw_videos.count()
    # partition layout: year=*/month=* directories exist
    import glob

    assert glob.glob(f"{out}/year=*/month=*/*.json")
    # records with transcripts survive with chunk arrays intact
    orig = {r["video_id"]: r for r in chunked.collect()}
    for r in back.collect():
        o = orig[r["video_id"]]
        if o["transcript_chunks"] is not None:
            assert [c["text"] for c in r["transcript_chunks"]] == [
                c["text"] for c in o["transcript_chunks"]
            ]


def test_reference_format_pretty_json(spark, raw_videos, tmp_path_factory):
    """The reference writes indent=4 one-record-per-file JSON
    (processing.py:54-55); multi_line=True ingests that layout."""
    import json

    out = tmp_path_factory.mktemp("pretty")
    rows = chunk_transcripts(raw_videos).drop("transcript").limit(5).collect()
    for r in rows:
        d = r.asDict(recursive=True)
        (out / f"{d['video_id']}.json").write_text(json.dumps(d, indent=4))
    back = read_video_records(spark, str(out), multi_line=True)
    assert back.count() == 5
    assert back.where(F.col("video_id").isNull()).count() == 0


def test_clean_identity_and_integrity(spark, raw_videos):
    chunked = chunk_transcripts(raw_videos).drop("transcript").cache()
    cleaned = clean_chunks_grouped(chunked, identity_clean)
    assert cleaned.where(~F.col("clean_ok")).count() == 0
    chk = integrity_check(chunked, cleaned.drop("clean_ok"))
    assert chk.where(~F.col("ok")).count() == 1  # only the NULL-transcript video
    assert chk.where(~F.col("ok")).first()["video_id"] == "vid00000000"


def test_clean_abort_per_video(spark, raw_videos):
    chunked = chunk_transcripts(raw_videos).drop("transcript")

    def flaky(text: str, metadata: dict) -> str:
        if metadata["video_id"] == "vid00000005":
            raise RuntimeError("chunk failed")
        return text.upper()

    cleaned = clean_chunks_grouped(chunked, flaky).cache()
    bad = cleaned.where(~F.col("clean_ok")).collect()
    assert [r["video_id"] for r in bad] == ["vid00000005"]
    # failed video keeps original (non-uppercased) chunks — all-or-nothing
    assert bad[0]["transcript_chunks"][0]["text"].islower() or not bad[0][
        "transcript_chunks"
    ][0]["text"].isupper()
    good, dead = split_dead_letter(cleaned, "clean_ok")
    assert good.count() + dead.count() == cleaned.count()
    ok_row = good.where(F.col("video_id") == "vid00000002").first()
    assert ok_row["transcript_chunks"][0]["text"].isupper()


def test_embed_deterministic_unit_norm(spark, raw_videos):
    grain = explode_chunks(chunk_transcripts(raw_videos).drop("transcript")).limit(50)
    embedded = embed_texts(grain, hash_embed)
    rows = embedded.select("text", "embedding").collect()
    import math

    by_text = {}
    for r in rows:
        v = r["embedding"]
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-5
        if r["text"] in by_text:
            assert by_text[r["text"]] == v  # deterministic
        by_text[r["text"]] = v


def test_resume_anti_join_idempotent(spark, raw_videos):
    grain = explode_chunks(chunk_transcripts(raw_videos).drop("transcript")).cache()
    done = grain.limit(0)
    first = new_work(grain, done, ["video_id", "start_time"])
    assert first.count() == grain.count()
    # after "loading" everything, a second run adds 0 (I2 resume semantics)
    second = new_work(grain, grain, ["video_id", "start_time"])
    assert second.count() == 0
    # partial resume: done = one video's chunks
    done_one = grain.where(F.col("video_id") == "vid00000003")
    partial = new_work(grain, done_one, ["video_id", "start_time"])
    assert partial.count() == grain.count() - done_one.count()


def test_skip_list_roundtrip(spark, raw_videos, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("skip") / "skip.json")
    empty = load_skip_set(spark, path)
    assert empty.count() == 0
    skip = spark.createDataFrame([("vid00000001",), ("vid00000009",)], "video_id string")
    assert save_skip_set(skip, path) == 2
    loaded = load_skip_set(spark, path)
    kept = filter_skipped(raw_videos, loaded)
    assert kept.count() == raw_videos.count() - 2


def test_merge_records_right_bias(spark):
    base = spark.createDataFrame(
        [("v1", "old title", 1), ("v2", "t2", 2)], "video_id string, title string, id int"
    )
    enrich = spark.createDataFrame(
        [("v1", "new title", 100)], "video_id string, title string, duration int"
    )
    merged = merge_records(base, enrich)
    row = merged.first()
    assert row["title"] == "new title" and row["duration"] == 100 and row["id"] == 1
    assert merged.count() == 1  # inner join like the reference's dict lookup


def test_json_ok_total_validity_and_deadletter_routing(spark):
    """I3b: json_ok is TOTAL (never throws) and routes exactly like
    DuckDB's json_valid — truncated/garbage/empty/NULL are dead, valid
    objects and JSON null are clean."""
    from kfai_pipeline_spark.operators.pipeline import json_ok, split_dead_letter

    rows = [
        (1, '{"k": 7}'),        # valid object -> clean
        (2, '{"k": 7'),         # truncated -> dead
        (3, ""),                # empty string -> dead
        (4, "not json at all"), # garbage -> dead
        (5, None),              # NULL input -> dead (coalesce(False))
        (6, "null"),            # JSON null IS valid JSON -> clean
        (7, "[1, 2, 3]"),       # arrays are JSON too -> clean
    ]
    df = spark.createDataFrame(rows, "id long, props string").withColumn(
        "ok", json_ok("props")
    )
    got = {r["id"]: r["ok"] for r in df.collect()}
    assert got == {1: True, 2: False, 3: False, 4: False, 5: False, 6: True, 7: True}
    clean, dead = split_dead_letter(df)
    assert {r["id"] for r in clean.collect()} == {1, 6, 7}
    assert {r["id"] for r in dead.collect()} == {2, 3, 4, 5}
