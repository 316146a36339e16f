"""Multimodal column tests (X5): binary ingest + stubbed decode kernels
— the Spark plumbing (schema, batching, offsets) is real."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kfai_pipeline_spark.operators.multimodal import (
    CHUNK_THRESHOLD_SECONDS,
    decode_audio_meta,
    image_features,
    read_binary_files,
    sample_frames,
    transcribe_audio,
    with_media_metadata,
)


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("media")
    for i in range(6):
        (d / f"clip_{i}.bin").write_bytes(bytes([i]) * (512 + 700 * i))
    (d / "notes.txt").write_text("not media")
    return str(d)


def test_binary_ingest_and_metadata(spark, media_dir):
    df = read_binary_files(spark, media_dir, glob="*.bin")
    assert df.count() == 6
    meta = with_media_metadata(df)
    rows = meta.select("path", "length", "byte_len", "sha256").collect()
    for r in rows:
        assert r["byte_len"] == r["length"]
        assert len(r["sha256"]) == 64


def test_image_features_stub(spark, media_dir):
    df = read_binary_files(spark, media_dir, glob="*.bin")
    feats = image_features(df).collect()
    assert len(feats) == 6
    for r in feats:
        assert 64 <= r["width"] < 128 and 64 <= r["height"] < 128
        assert len(r["feature"]) == 16
        assert all(0.0 <= x <= 1.0 for x in r["feature"])
    # deterministic across runs
    again = image_features(read_binary_files(spark, media_dir, glob="*.bin")).collect()
    assert sorted(map(tuple, feats)) == sorted(map(tuple, again))


def test_transcribe_offsets(spark, media_dir):
    df = read_binary_files(spark, media_dir, glob="*.bin").withColumn(
        "chunk_idx", (F.length("content") % 3).cast("long")
    )
    segs = transcribe_audio(df, chunk_idx_col="chunk_idx")
    rows = segs.collect()
    assert len(rows) >= 6
    for r in rows:
        # W4 offset: start lands inside its chunk's 7200s window
        assert r["start"] >= r["chunk_idx"] * CHUNK_THRESHOLD_SECONDS
        assert r["start"] < (r["chunk_idx"] + 1) * CHUNK_THRESHOLD_SECONDS


def test_sample_frames_row_explosion(spark, media_dir):
    df = read_binary_files(spark, media_dir, glob="*.bin")
    frames = sample_frames(df, every_n_bytes=512)
    per_file = {r["path"]: r["cnt"] for r in frames.groupBy("path").agg(F.count("*").alias("cnt")).collect()}
    lengths = {r["path"]: r["length"] for r in df.select("path", "length").collect()}
    for path, cnt in per_file.items():
        assert cnt == max(1, lengths[path] // 512)


@pytest.fixture(scope="module")
def wav_dir(tmp_path_factory):
    """Real RIFF/WAVE files written with stdlib wave — known headers."""
    import wave

    d = tmp_path_factory.mktemp("wavs")
    specs = [
        ("mono_16k.wav", 1, 2, 16000, 16000 * 2),   # 2.0 s
        ("stereo_44k.wav", 2, 2, 44100, 44100),     # 1.0 s
        ("mono_8k.wav", 1, 1, 8000, 4000),          # 0.5 s
    ]
    for name, nch, width, rate, nframes in specs:
        with wave.open(str(d / name), "wb") as w:
            w.setnchannels(nch)
            w.setsampwidth(width)
            w.setframerate(rate)
            w.writeframes(b"\x00" * (nframes * nch * width))
    return str(d), {name: (nch, width, rate, nframes) for name, nch, width, rate, nframes in specs}


def test_wav_kernel_decodes_real_headers(spark, wav_dir):
    # NOT skipped, NOT stubbed: stdlib wave parses actual RIFF headers
    path, specs = wav_dir
    df = read_binary_files(spark, path, glob="*.wav")
    rows = decode_audio_meta(df, decoder="wav").collect()
    assert len(rows) == len(specs)
    for r in rows:
        name = r["path"].rsplit("/", 1)[-1]
        nch, width, rate, nframes = specs[name]
        assert (r["n_channels"], r["sample_width"], r["framerate"], r["n_frames"]) == (
            nch, width, rate, nframes
        )
        assert r["duration_s"] == pytest.approx(nframes / rate)


def test_decode_audio_meta_stub_default(spark, media_dir):
    # non-WAV payloads still flow through the stub default
    df = read_binary_files(spark, media_dir, glob="*.bin")
    rows = decode_audio_meta(df).collect()
    assert len(rows) == 6
    assert all(r["framerate"] == 16000 for r in rows)
    with pytest.raises(NotImplementedError):
        decode_audio_meta(df, decoder="mp3")


def test_resize_images_stub(spark, media_dir):
    from kfai_pipeline_spark.operators.multimodal import resize_images

    df = read_binary_files(spark, media_dir, glob="*.bin")
    out = resize_images(df, target_width=128, target_height=96).collect()
    assert len(out) == 6
    assert all(r["width"] == 128 and r["height"] == 96 for r in out)
    # deterministic and resolution-dependent payload stand-in
    again = resize_images(read_binary_files(spark, media_dir, glob="*.bin"),
                          target_width=128, target_height=96).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    other = resize_images(read_binary_files(spark, media_dir, glob="*.bin")).collect()
    assert {r["content"] for r in out}.isdisjoint({r["content"] for r in other})


def test_real_decoder_gated(spark, media_dir):
    from kfai_pipeline_spark.operators.multimodal import resize_images

    df = read_binary_files(spark, media_dir, glob="*.bin")
    with pytest.raises(NotImplementedError):
        image_features(df, decoder="real")
    with pytest.raises(NotImplementedError):
        transcribe_audio(df, decoder="real")
    with pytest.raises(NotImplementedError):
        resize_images(df, decoder="real")


@pytest.fixture(scope="module")
def ppm_dir(spark, tmp_path_factory):
    """Two real binary P6 PPM images: a 4x2 gradient and a 2x2 with a
    header comment."""
    import numpy as np

    out = tmp_path_factory.mktemp("ppm")
    a = np.arange(4 * 2 * 3, dtype=np.uint8).reshape(2, 4, 3) * 10
    (out / "grad.ppm").write_bytes(b"P6\n4 2\n255\n" + a.tobytes())
    b = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8
    )
    (out / "tiny.ppm").write_bytes(b"P6\n# a comment\n2 2\n255\n" + b.tobytes())
    return str(out)


def test_ppm_kernel_real_decode(spark, ppm_dir):
    from kfai_pipeline_spark.operators.multimodal import (
        image_features,
        read_binary_files,
    )

    df = read_binary_files(spark, ppm_dir, glob="*.ppm")
    rows = {r.path.split("/")[-1]: r for r in image_features(df, decoder="ppm").collect()}
    assert rows["grad.ppm"].width == 4 and rows["grad.ppm"].height == 2
    assert rows["tiny.ppm"].width == 2 and rows["tiny.ppm"].height == 2
    # histogram features are a probability vector over 16 bins
    for r in rows.values():
        assert abs(sum(r.feature) - 1.0) < 1e-6
        assert all(f >= 0 for f in r.feature)
    # tiny.ppm grays: red/green/blue -> 85.0 (bin 5), white -> 255 (bin 15)
    tiny = rows["tiny.ppm"].feature
    assert abs(tiny[5] - 0.75) < 1e-6 and abs(tiny[15] - 0.25) < 1e-6


def test_ppm_kernel_real_resize_roundtrip(spark, ppm_dir):
    import numpy as np

    from kfai_pipeline_spark.operators.multimodal import (
        _parse_ppm,
        read_binary_files,
        resize_images,
    )

    df = read_binary_files(spark, ppm_dir, glob="tiny.ppm")
    out = resize_images(df, target_width=4, target_height=4, decoder="ppm").collect()
    assert len(out) == 1 and out[0].width == 4 and out[0].height == 4
    # output is itself a valid P6 payload; nearest-neighbor doubles pixels
    arr = _parse_ppm(bytes(out[0].content))
    assert arr.shape == (4, 4, 3)
    assert (arr[0, 0] == [255, 0, 0]).all() and (arr[0, 1] == [255, 0, 0]).all()
    assert (arr[3, 3] == [255, 255, 255]).all()
    # resize is exact upsampling: every 2x2 block is constant
    assert (arr[::2, ::2] == arr[1::2, 1::2]).all()


def _minimal_mp4(duration: int = 5000, timescale: int = 1000, n_tracks: int = 2) -> bytes:
    """Hand-assembled ISO-BMFF: ftyp + moov(mvhd v0 + n empty traks)."""
    import struct

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mvhd_payload = (
        b"\x00" + b"\x00\x00\x00"          # version 0 + flags
        + struct.pack(">II", 0, 0)           # ctime, mtime
        + struct.pack(">II", timescale, duration)
        + b"\x00" * 80                       # rate..next_track_id
    )
    mvhd = box(b"mvhd", mvhd_payload)
    traks = b"".join(box(b"trak", b"") for _ in range(n_tracks))
    return ftyp + box(b"moov", mvhd + traks)


def test_mp4_metadata_kernel_real(spark):
    """The stdlib ISO-BMFF kernel must parse brand/duration/tracks from
    a hand-assembled MP4 — the video sibling of the WAV/PPM kernels."""
    from kfai_pipeline_spark.operators.multimodal import decode_video_meta

    payload = _minimal_mp4(duration=5000, timescale=1000, n_tracks=2)
    df = spark.createDataFrame([("clip.mp4", payload)], "path string, content binary")
    rows = decode_video_meta(df, decoder="mp4").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["major_brand"] == "isom"
    assert r["timescale"] == 1000
    assert r["duration_s"] == 5.0
    assert r["n_tracks"] == 2


def test_mp4_metadata_kernel_v1_and_errors(spark):
    import struct

    import pytest as _pytest

    from kfai_pipeline_spark.operators.multimodal import _parse_mp4_meta, decode_video_meta

    # mvhd version 1 (64-bit duration)
    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    mvhd1 = box(
        b"mvhd",
        b"\x01\x00\x00\x00"
        + struct.pack(">QQ", 0, 0)
        + struct.pack(">IQ", 90000, 90000 * 7)
        + b"\x00" * 80,
    )
    data = box(b"ftyp", b"mp42" + b"\x00" * 8) + box(b"moov", mvhd1)
    meta = _parse_mp4_meta(data)
    assert (meta["major_brand"], meta["timescale"], meta["duration_s"]) == ("mp42", 90000, 7.0)

    with _pytest.raises(ValueError, match="ftyp"):
        _parse_mp4_meta(b"\x00" * 32)

    # stub arm still runs for non-BMFF payloads
    df = spark.createDataFrame([("x.bin", b"not a video")], "path string, content binary")
    assert decode_video_meta(df, decoder="stub").count() == 1


def test_on_error_route_deadletters_malformed_payloads(spark):
    """I3 corrupted-input contract (round 8): garbage bytes become
    ok=false rows with the decoder message — never a task abort."""
    import io
    import struct
    import wave as wave_mod

    from kfai_pipeline_spark.operators.multimodal import (
        decode_audio_meta,
        decode_video_meta,
        image_features,
    )

    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(b"\x00\x01" * 32)
    wav = buf.getvalue()
    ppm = b"P6\n2 2\n255\n" + bytes(12)
    mp4 = struct.pack(">I4s", 16, b"ftyp") + b"isom" + b"\x00" * 4
    rows = [
        ("good", None), ("trunc", None), ("garbage", b"\x00\xffgarbage"),
        ("empty", b""), ("null", None),
    ]
    for fn, dec, good in (
        (decode_audio_meta, "wav", wav),
        (image_features, "ppm", ppm),
        (decode_video_meta, "mp4", mp4),
    ):
        # truncate INSIDE the header (12 bytes): a WAV cut after its
        # complete 44-byte header still header-parses by design — the
        # kernels are metadata readers, not payload validators
        data = [
            ("good", good), ("trunc", good[:12]),
            ("garbage", b"\x00\xffgarbage"), ("empty", b""), ("null", None),
        ]
        df = spark.createDataFrame(data, "path string, content binary")
        out = {r["path"]: r for r in fn(df, decoder=dec, on_error="route").collect()}
        assert len(out) == 5
        assert out["good"]["ok"] is True and out["good"]["error"] is None
        for tag in ("trunc", "garbage", "empty", "null"):
            assert out[tag]["ok"] is False, (dec, tag)
            assert out[tag]["error"], (dec, tag)
        # raise mode keeps the old schema and the old fatality
        cols = fn(df, decoder=dec).columns
        assert "ok" not in cols
        import pytest as _pytest

        with _pytest.raises(Exception):
            fn(df, decoder=dec, on_error="raise").collect()
        with _pytest.raises(ValueError, match="on_error"):
            fn(df, decoder=dec, on_error="explode")
