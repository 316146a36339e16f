"""Optional-dependency integration tests for the REAL decoder kernels
(multimodal.py pillow/whisper/ffmpeg paths).

Each test runs the real kernel end-to-end through Spark when its
dependency is present and SKIPS (never fails) when it isn't — so the
guarded paths can't rot in either environment. The guard behavior
itself (NotImplementedError naming the dependency) is asserted
unconditionally, since it must hold exactly when the dep is absent.
"""

from __future__ import annotations

import importlib.util
import shutil
import subprocess

import pytest
from pyspark.sql import functions as F  # noqa: F401

from kfai_pipeline_spark.operators import multimodal as M

HAS_PIL = importlib.util.find_spec("PIL") is not None
HAS_WHISPER = importlib.util.find_spec("whisper") is not None
HAS_FFMPEG = shutil.which("ffmpeg") is not None


def _binary_df(spark, rows):
    return spark.createDataFrame(rows, "path string, content binary")


# ---------------------------------------------------------------- guards
def test_guards_name_the_missing_dependency(spark):
    """When a dep is absent the kernel must raise NotImplementedError
    NAMING it (the honest-stub contract); when present, no raise."""
    df = _binary_df(spark, [("x.png", b"\x89PNG")])
    if not HAS_PIL:
        with pytest.raises(NotImplementedError, match="pillow"):
            M.image_features(df, decoder="pillow")
        with pytest.raises(NotImplementedError, match="pillow"):
            M.resize_images(df, decoder="pillow")
    if not HAS_WHISPER:
        with pytest.raises(NotImplementedError, match="openai-whisper"):
            M.transcribe_audio(df, decoder="whisper")
    if not HAS_FFMPEG:
        with pytest.raises(NotImplementedError, match="ffmpeg"):
            M.sample_frames(df, decoder="ffmpeg")
    with pytest.raises(NotImplementedError, match="unknown"):
        M.image_features(df, decoder="no-such-decoder")


# ---------------------------------------------------------------- pillow
@pytest.mark.skipif(not HAS_PIL, reason="pillow not installed")
def test_pillow_features_and_resize_real_png(spark):
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (32, 16), (255, 0, 0)).save(buf, format="PNG")
    df = _binary_df(spark, [("red.png", buf.getvalue())])

    feats = M.image_features(df, decoder="pillow", feature_dim=8).collect()
    assert len(feats) == 1
    assert (feats[0]["width"], feats[0]["height"]) == (32, 16)
    assert abs(sum(feats[0]["feature"]) - 1.0) < 1e-6  # normalized histogram

    resized = M.resize_images(df, 8, 8, decoder="pillow").collect()
    assert len(resized) == 1
    out = Image.open(io.BytesIO(bytes(resized[0]["content"])))
    assert out.size == (8, 8)


# ---------------------------------------------------------------- whisper
@pytest.mark.skipif(not HAS_WHISPER, reason="openai-whisper not installed")
def test_whisper_transcribes_real_wav(spark, tmp_path):
    """1s of silence through the tiny model: asserts the kernel wiring
    (temp file, per-partition model, W4 chunk offset), not ASR quality.
    Skips (not fails) if the model checkpoint can't load offline."""
    import math
    import struct
    import wave

    import whisper

    try:
        whisper.load_model("tiny")
    except Exception as exc:  # no network / no checkpoint cache
        pytest.skip(f"whisper model unavailable: {exc}")

    p = tmp_path / "tone.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(
            b"".join(
                struct.pack("<h", int(8000 * math.sin(2 * math.pi * 440 * t / 16000)))
                for t in range(16000)
            )
        )
    df = _binary_df(spark, [("a_chunk_1.wav", p.read_bytes())]).withColumn(
        "chunk_idx", F.lit(1).cast("long")
    )
    segs = M.transcribe_audio(
        df, chunk_idx_col="chunk_idx", decoder="whisper"
    ).collect()
    # every segment carries the W4 offset for chunk 1
    for r in segs:
        assert r["start"] >= M.CHUNK_THRESHOLD_SECONDS


# ---------------------------------------------------------------- ffmpeg
@pytest.mark.skipif(not HAS_FFMPEG, reason="ffmpeg binary not on PATH")
def test_ffmpeg_samples_real_frames(spark, tmp_path):
    """3s synthetic video at fps=1 -> ~3 PNG frame rows per input."""
    src = tmp_path / "clip.mp4"
    subprocess.run(
        [
            "ffmpeg", "-v", "error", "-f", "lavfi",
            "-i", "testsrc=duration=3:size=64x64:rate=10",
            "-pix_fmt", "yuv420p", str(src),
        ],
        check=True,
        capture_output=True,
    )
    df = _binary_df(spark, [("clip.mp4", src.read_bytes())])
    frames = M.sample_frames(df, decoder="ffmpeg", fps_seconds=1).collect()
    assert 2 <= len(frames) <= 4
    assert frames[0]["frame_idx"] == 0
    assert bytes(frames[0]["frame"]).startswith(b"\x89PNG")
