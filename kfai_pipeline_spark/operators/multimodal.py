"""Multimodal columns (X5): image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched partition-level
UDFs.

Generalizes the reference's audio path (S9/U3: yt-dlp 2-hour audio
chunks -> Whisper transcribe, ref youtube.py:84-131,
transcribe_failures.py:29-125): media bytes ride a binary column,
heavy per-item model work happens inside ``mapInPandas`` so a
1000-executor cluster fans out decode/transcribe with zero shuffle.

Heavy-model kernels are STUBBED (this container has no ASR/CV model
libs): ``decoder="stub"`` produces deterministic fake outputs so the
Spark-side plumbing — schema, batching, partitioning, chunk-offset
arithmetic — is real and tested; plugging a real library is a one-line
swap behind the same interface, and asking for an unavailable real
decoder raises ``NotImplementedError`` with the dependency named.
FOUR kernels ARE real with zero extra dependencies:
``decode_audio_meta(decoder="wav")`` parses RIFF/WAVE headers via
stdlib ``wave``; ``image_features(decoder="ppm")`` and
``resize_images(decoder="ppm")`` decode/resize binary P6 PPM rasters
with numpy (histogram features; nearest-neighbor resize + re-encode);
``decode_video_meta(decoder="mp4")`` walks ISO-BMFF boxes with stdlib
``struct`` (ftyp brand, mvhd v0/v1 duration, track count). Real
pillow/whisper/ffmpeg kernels additionally plug in behind
named-dependency guards (tests/test_multimodal_optional.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# 2-hour audio chunking unit (ref extractors/utils/config.py:30)
CHUNK_THRESHOLD_SECONDS = 7200


def _require(module: str, pip_name: str, what: str) -> None:
    """Guard a real-decoder path on its optional dependency, raising
    with the dependency NAMED so the failure is actionable."""
    import importlib

    try:
        importlib.import_module(module)
    except ImportError as exc:
        raise NotImplementedError(
            f"real {what} needs the optional dependency '{pip_name}' "
            f"(not in this container); pip install {pip_name} or use "
            "decoder='stub'"
        ) from exc


def _require_binary(name: str, what: str) -> None:
    import shutil

    if shutil.which(name) is None:
        raise NotImplementedError(
            f"real {what} needs the '{name}' binary on PATH (not in this "
            "container); install it or use decoder='stub'"
        )


def read_binary_files(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Binary-file source: (path, modificationTime, length, content).
    Spark's built-in ``binaryFile`` format — splittable by file."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("byte_len", LongType()),
        StructField("sha256", StringType()),
    ]
)


def with_media_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Typed metadata columns for an opaque binary column — JVM-side."""
    return df.withColumns(
        {
            "byte_len": F.length(F.col(content_col)).cast("long"),
            "sha256": F.sha2(F.col(content_col), 256),
        }
    )


IMAGE_FEATURE_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def _parse_ppm(data: bytes):
    """Decode a binary P6 PPM into an (h, w, 3) uint8 numpy array.

    Pure numpy — the one raster format decodable with zero image
    dependencies, which makes the ``decoder="ppm"`` kernels REAL in this
    container (pillow/opencv kernels plug in behind the same interface).
    """
    import re

    import numpy as np

    m = re.match(rb"P6\s+(?:#[^\n]*\s+)*(\d+)\s+(\d+)\s+(\d+)\s", data)
    if not m:
        raise ValueError("not a binary P6 PPM")
    w, h, maxval = (int(g) for g in m.groups())
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    arr = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=m.end())
    return arr.reshape(h, w, 3)


def image_features(
    df: DataFrame,
    content_col: str = "content",
    path_col: str = "path",
    decoder: str = "stub",
    feature_dim: int = 16,
    on_error: str = "raise",
) -> DataFrame:
    """Decode + feature-extract images (X5).

    ``decoder="ppm"`` is a REAL kernel (numpy P6 decode; feature =
    ``feature_dim``-bin normalized grayscale histogram).
    ``decoder="pillow"`` decodes ANY PIL-supported format the same way
    (guarded: raises naming the dependency when PIL is absent —
    exercised by the skip-marked integration tests). ``stub`` derives
    deterministic dimensions/features from sha256 — all three run the
    exact mapInPandas batch shape an opencv kernel would use.

    ``on_error="route"`` appends (ok, error) columns and turns each
    malformed payload into a null-feature ok=false row instead of a
    task-aborting exception — see ``decode_audio_meta`` for the I3
    dead-letter rationale.
    """
    if decoder == "pillow":
        _require("PIL", "pillow", "image decode")
    elif decoder not in ("stub", "ppm"):
        raise NotImplementedError(
            "unknown image decoder; use 'stub', 'ppm', or 'pillow' "
            "(pillow requires the optional PIL dependency)"
        )
    _check_on_error(on_error)
    route = on_error == "route"
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue  # empty batch: dict-of-empty-lists would mistype array cols
            out = {"path": [], "width": [], "height": [], "feature": []}
            if route:
                out["ok"], out["error"] = [], []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                try:
                    if content is None:
                        raise ValueError("null content")
                    data = bytes(content)
                    if decoder in ("ppm", "pillow"):
                        if decoder == "ppm":
                            arr = _parse_ppm(data)
                        else:
                            import io

                            from PIL import Image

                            arr = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
                        hh, ww = arr.shape[:2]
                        gray = arr.astype(np.float64).mean(axis=2)
                        hist, _ = np.histogram(gray, bins=feature_dim, range=(0, 256))
                        width, height = ww, hh
                        feat = (hist / gray.size).astype(float).tolist()
                    else:
                        h = hashlib.sha256(data).digest()
                        width, height = 64 + h[0] % 64, 64 + h[1] % 64
                        feat = [
                            int.from_bytes(h[2 * i : 2 * i + 2], "big") / 65535.0
                            for i in range(feature_dim)
                        ]
                except Exception as exc:
                    if not route:
                        raise
                    out["path"].append(path)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["feature"].append(None)
                    out["ok"].append(False)
                    out["error"].append(f"{type(exc).__name__}: {exc}"[:200])
                    continue
                out["path"].append(path)
                out["width"].append(width)
                out["height"].append(height)
                out["feature"].append(feat)
                if route:
                    out["ok"].append(True)
                    out["error"].append(None)
            yield pd.DataFrame(out)

    schema = _routed_schema(IMAGE_FEATURE_SCHEMA) if route else IMAGE_FEATURE_SCHEMA
    return df.mapInPandas(run, schema=schema)


AUDIO_META_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("n_channels", LongType()),
        StructField("sample_width", LongType()),
        StructField("framerate", LongType()),
        StructField("n_frames", LongType()),
        StructField("duration_s", DoubleType()),
    ]
)


def _routed_schema(base: StructType) -> StructType:
    """``on_error="route"`` output: the base schema + (ok BOOLEAN,
    error STRING) — the I3 dead-letter flag pair, compatible with
    ``pipeline.split_dead_letter``."""
    return StructType(
        list(base.fields)
        + [StructField("ok", BooleanType()), StructField("error", StringType())]
    )


def _check_on_error(on_error: str) -> None:
    if on_error not in ("raise", "route"):
        raise ValueError(f"on_error must be 'raise' or 'route', got {on_error!r}")


def decode_audio_meta(
    df: DataFrame,
    content_col: str = "content",
    path_col: str = "path",
    decoder: str = "stub",
    on_error: str = "raise",
) -> DataFrame:
    """Audio header decode -> typed metadata rows (X5).

    ``decoder="wav"`` is a REAL kernel: stdlib ``wave`` parses the RIFF
    header from the binary column inside ``mapInPandas`` — no external
    dependency, same batch shape as an ffprobe/soundfile kernel. The
    default stays ``"stub"`` (deterministic fake metadata from sha256)
    so pipelines without real media keep running; any other value names
    the dependency a production kernel would plug in.

    ``on_error`` (round-8 corruption sweep, the §2.10-I3 contract): a
    crawl's binary payloads ARRIVE truncated and mislabeled, and one
    bad row must never abort a 1000-executor job. ``"route"`` appends
    (ok, error) columns — malformed payloads yield a null-metadata row
    with ok=false carrying the decoder message, for
    ``pipeline.split_dead_letter`` routing. ``"raise"`` (default,
    schema-compatible with existing callers) keeps decode errors fatal
    for curated inputs where corruption means a pipeline bug.
    """
    import pandas as pd

    if decoder not in ("stub", "wav"):
        raise NotImplementedError(
            "real non-WAV audio decode needs ffprobe/soundfile (not in this "
            "container); plug a decoder via this interface"
        )
    _check_on_error(on_error)
    route = on_error == "route"
    meta_cols = ("n_channels", "sample_width", "framerate", "n_frames", "duration_s")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        for pdf in batches:
            if not len(pdf):
                continue  # empty batch: dict-of-empty-lists would mistype array cols
            out = {k: [] for k in ("path",) + meta_cols}
            if route:
                out["ok"], out["error"] = [], []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                try:
                    if content is None:
                        # NULL payloads are malformed in EVERY decoder,
                        # including the stub — b'' coercion would fake a
                        # clean row from a corrupt record (round-8 review)
                        raise ValueError("null content")
                    data = bytes(content)
                    if decoder == "wav":
                        with wave.open(io.BytesIO(data)) as w:
                            nch, width, rate, nfr = (
                                w.getnchannels(),
                                w.getsampwidth(),
                                w.getframerate(),
                                w.getnframes(),
                            )
                    else:
                        h = hashlib.sha256(data).digest()
                        nch, width = 1 + h[0] % 2, 2
                        rate, nfr = 16000, len(data)
                except Exception as exc:  # wave.Error, EOFError, struct...
                    if not route:
                        raise
                    out["path"].append(path)
                    for k in meta_cols:
                        out[k].append(None)
                    out["ok"].append(False)
                    out["error"].append(f"{type(exc).__name__}: {exc}"[:200])
                    continue
                out["path"].append(path)
                out["n_channels"].append(nch)
                out["sample_width"].append(width)
                out["framerate"].append(rate)
                out["n_frames"].append(nfr)
                out["duration_s"].append(round(nfr / rate, 4) if rate else 0.0)
                if route:
                    out["ok"].append(True)
                    out["error"].append(None)
            yield pd.DataFrame(out)

    schema = _routed_schema(AUDIO_META_SCHEMA) if route else AUDIO_META_SCHEMA
    return df.mapInPandas(run, schema=schema)


AUDIO_SEGMENT_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("chunk_idx", LongType()),
        StructField("text", StringType()),
        StructField("start", DoubleType()),
        StructField("duration", DoubleType()),
    ]
)


def transcribe_audio(
    df: DataFrame,
    content_col: str = "content",
    path_col: str = "path",
    chunk_idx_col: str | None = None,
    decoder: str = "stub",
    whisper_model: str = "tiny",
) -> DataFrame:
    """U3 shape: audio binary -> transcript segment rows. The W4 offset
    shift (Whisper chunk i starts at i*7200s, ref
    transcribe_failures.py:87-96) is applied when ``chunk_idx_col`` is
    given. ``stub`` emits deterministic fake segments;
    ``decoder="whisper"`` is the REAL kernel (ref
    transcribe_failures.py:44-58,87-96): guarded on the optional
    ``openai-whisper`` dependency, model loaded ONCE per partition
    (``whisper_model`` names the checkpoint), each binary row written to
    a temp file and transcribed, segments emitted with the same chunk
    offset — exercised by the skip-marked integration tests."""
    if decoder == "whisper":
        _require("whisper", "openai-whisper", "ASR")
    elif decoder != "stub":
        raise NotImplementedError(
            "unknown ASR decoder; use 'stub' or 'whisper' (whisper "
            "requires the optional openai-whisper dependency)"
        )
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = None
        if decoder == "whisper":
            import whisper

            model = whisper.load_model(whisper_model)  # once per partition
        for pdf in batches:
            if not len(pdf):
                continue  # empty batch: dict-of-empty-lists would mistype array cols
            out = {"path": [], "chunk_idx": [], "text": [], "start": [], "duration": []}
            for i in range(len(pdf)):
                path = pdf[path_col].iloc[i]
                chunk_idx = int(pdf[chunk_idx_col].iloc[i]) if chunk_idx_col else 0
                content = bytes(pdf[content_col].iloc[i])
                offset = chunk_idx * CHUNK_THRESHOLD_SECONDS  # W4 shift
                if model is not None:
                    import os
                    import tempfile

                    suffix = os.path.splitext(str(path))[1] or ".wav"
                    with tempfile.NamedTemporaryFile(suffix=suffix, delete=False) as f:
                        f.write(content)
                        tmp = f.name
                    try:
                        segments = model.transcribe(tmp)["segments"]
                    finally:
                        os.unlink(tmp)
                    for seg in segments:
                        out["path"].append(path)
                        out["chunk_idx"].append(chunk_idx)
                        out["text"].append(seg["text"].strip())
                        out["start"].append(round(seg["start"] + offset, 2))
                        out["duration"].append(round(seg["end"] - seg["start"], 2))
                    continue
                h = hashlib.sha256(content).digest()
                n_segments = 1 + h[0] % 4
                t = 0.0
                for s in range(n_segments):
                    seg_len = 1.0 + h[s + 1] % 10
                    out["path"].append(path)
                    out["chunk_idx"].append(chunk_idx)
                    out["text"].append(f"segment {s} of {h[:4].hex()}")
                    # W4: offset by chunk position in the source media
                    out["start"].append(round(t + offset, 2))
                    out["duration"].append(round(seg_len, 2))
                    t += seg_len
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=AUDIO_SEGMENT_SCHEMA)


RESIZED_IMAGE_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("content", StringType()),  # stub: hex digest stand-in
    ]
)


RESIZED_PPM_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("content", BinaryType()),  # real re-encoded P6 bytes
    ]
)


def resize_images(
    df: DataFrame,
    target_width: int = 224,
    target_height: int = 224,
    content_col: str = "content",
    path_col: str = "path",
    decoder: str = "stub",
) -> DataFrame:
    """Image resize (X5): one output row per input image at
    (target_width, target_height).

    ``decoder="ppm"`` is a REAL kernel: numpy P6 decode ->
    nearest-neighbor index resize -> P6 re-encode into a true binary
    column. ``decoder="pillow"`` resizes ANY PIL-supported format
    (PNG re-encode; guarded on the optional dependency). ``stub`` emits
    a deterministic digest stand-in (string column) so pipelines
    without real media keep running.
    """
    if decoder == "pillow":
        _require("PIL", "pillow", "image resize")
    elif decoder not in ("stub", "ppm"):
        raise NotImplementedError(
            "unknown image decoder; use 'stub', 'ppm', or 'pillow' "
            "(pillow requires the optional PIL dependency)"
        )
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if not len(pdf):
                continue  # empty batch: dict-of-empty-lists would mistype array cols
            out = {"path": [], "width": [], "height": [], "content": []}
            for path, content in zip(pdf[path_col], pdf[content_col]):
                data = bytes(content)
                if decoder == "ppm":
                    arr = _parse_ppm(data)
                    hh, ww = arr.shape[:2]
                    rows = (np.arange(target_height) * hh) // target_height
                    cols = (np.arange(target_width) * ww) // target_width
                    resized = arr[rows][:, cols]
                    payload = (
                        b"P6\n%d %d\n255\n" % (target_width, target_height)
                        + resized.tobytes()
                    )
                elif decoder == "pillow":
                    import io

                    from PIL import Image

                    img = Image.open(io.BytesIO(data)).convert("RGB")
                    buf = io.BytesIO()
                    img.resize((target_width, target_height)).save(buf, format="PNG")
                    payload = buf.getvalue()
                else:
                    payload = hashlib.sha256(
                        data + f"|{target_width}x{target_height}".encode()
                    ).hexdigest()[:32]
                out["path"].append(path)
                out["width"].append(target_width)
                out["height"].append(target_height)
                out["content"].append(payload)
            yield pd.DataFrame(out)

    schema = RESIZED_PPM_SCHEMA if decoder in ("ppm", "pillow") else RESIZED_IMAGE_SCHEMA
    return df.mapInPandas(run, schema=schema)


def sample_frames(
    df: DataFrame,
    content_col: str = "content",
    path_col: str = "path",
    every_n_bytes: int = 1024,
    decoder: str = "stub",
    fps_seconds: int = 1,
) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    (stub: one per ``every_n_bytes`` of payload) with a binary
    ``frame`` column. ``decoder="ffmpeg"`` is the REAL kernel: guarded
    on the ffmpeg binary, each video row writes to a temp file and
    ``ffmpeg -vf fps=1/fps_seconds`` extracts PNG frames into true
    binary rows — exercised by the skip-marked integration tests."""
    if decoder == "ffmpeg":
        _require_binary("ffmpeg", "frame sampling")
    elif decoder != "stub":
        raise NotImplementedError(
            "unknown frame sampler; use 'stub' or 'ffmpeg' (ffmpeg "
            "requires the binary on PATH)"
        )
    import pandas as pd

    if decoder == "ffmpeg":
        schema = StructType(
            [
                StructField("path", StringType()),
                StructField("frame_idx", LongType()),
                StructField("frame", BinaryType()),  # real PNG bytes
            ]
        )
    else:
        schema = StructType(
            [
                StructField("path", StringType()),
                StructField("frame_idx", LongType()),
                StructField("frame", StructType([StructField("data", StringType())])),
            ]
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue  # empty batch: dict-of-empty-lists would mistype array cols
            out = {"path": [], "frame_idx": [], "frame": []}
            for path, content in zip(pdf[path_col], pdf[content_col]):
                data = bytes(content)
                if decoder == "ffmpeg":
                    import glob as globmod
                    import os
                    import subprocess
                    import tempfile

                    suffix = os.path.splitext(str(path))[1] or ".mp4"
                    with tempfile.TemporaryDirectory() as tmpdir:
                        src = os.path.join(tmpdir, f"in{suffix}")
                        with open(src, "wb") as f:
                            f.write(data)
                        subprocess.run(
                            [
                                "ffmpeg", "-v", "error", "-i", src,
                                "-vf", f"fps=1/{fps_seconds}",
                                os.path.join(tmpdir, "f%06d.png"),
                            ],
                            check=True,
                            capture_output=True,
                        )
                        frames = sorted(globmod.glob(os.path.join(tmpdir, "f*.png")))
                        for i, fp in enumerate(frames):
                            with open(fp, "rb") as f:
                                out["path"].append(path)
                                out["frame_idx"].append(i)
                                out["frame"].append(f.read())
                    continue
                n = max(1, len(data) // every_n_bytes)
                for i in range(n):
                    out["path"].append(path)
                    out["frame_idx"].append(i)
                    out["frame"].append(
                        {"data": hashlib.sha256(data + bytes([i % 256])).hexdigest()[:16]}
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(run, schema=schema)


VIDEO_META_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("major_brand", StringType()),
        StructField("timescale", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("n_tracks", LongType()),
    ]
)


def _parse_mp4_meta(data: bytes) -> dict:
    """Minimal ISO-BMFF (MP4) box walk — pure stdlib ``struct``, the
    video sibling of the wave-header and PPM kernels: ftyp major brand,
    mvhd timescale/duration (v0 and v1 layouts), trak count. Raises
    ValueError on non-BMFF payloads."""
    import struct

    def boxes(buf: bytes, start: int, end: int):
        off = start
        while off + 8 <= end:
            size, btype = struct.unpack(">I4s", buf[off : off + 8])
            hdr = 8
            if size == 1:  # 64-bit largesize
                if off + 16 > end:
                    raise ValueError("truncated BMFF largesize header")
                (size,) = struct.unpack(">Q", buf[off + 8 : off + 16])
                hdr = 16
            elif size == 0:  # box extends to end of enclosing scope
                size = end - off
            if size < hdr or off + size > end:
                raise ValueError("malformed BMFF box")
            yield btype, off + hdr, off + size
            off += size

    out = {"major_brand": None, "timescale": None, "duration_s": None, "n_tracks": 0}
    seen_any = False
    # corrupt crawl payloads must surface as the DOCUMENTED ValueError —
    # a truncated mvhd would otherwise escape as struct.error/IndexError
    # and blow through callers' dead-letter try/except ValueError
    try:
        for btype, body, bend in boxes(data, 0, len(data)):
            seen_any = True
            if btype == b"ftyp":
                out["major_brand"] = data[body : body + 4].decode("ascii", "replace")
            elif btype == b"moov":
                for ityp, ibody, iend in boxes(data, body, bend):
                    if ityp == b"mvhd":
                        if ibody >= iend:
                            raise ValueError("truncated mvhd box")
                        version = data[ibody]
                        if version == 1:
                            ts, dur = struct.unpack(
                                ">IQ", data[ibody + 20 : ibody + 32]
                            )
                        else:
                            ts, dur = struct.unpack(
                                ">II", data[ibody + 12 : ibody + 20]
                            )
                        out["timescale"] = ts
                        out["duration_s"] = round(dur / ts, 4) if ts else 0.0
                    elif ityp == b"trak":
                        out["n_tracks"] += 1
    except (struct.error, IndexError) as exc:
        raise ValueError(f"malformed BMFF payload: {exc}") from exc
    if not seen_any or out["major_brand"] is None:
        raise ValueError("not an ISO-BMFF payload (no ftyp box)")
    return out


def decode_video_meta(
    df: DataFrame,
    content_col: str = "content",
    path_col: str = "path",
    decoder: str = "stub",
    on_error: str = "raise",
) -> DataFrame:
    """Video container metadata -> typed rows (X5, video dimension).

    ``decoder="mp4"`` is a REAL kernel: the stdlib ISO-BMFF box walk
    above runs inside ``mapInPandas`` — no external dependency, the
    same batch shape an ffprobe kernel would use. ``stub`` derives
    deterministic fake metadata from sha256 so pipelines without real
    media keep running.

    ``on_error="route"`` appends (ok, error) columns and dead-letters
    malformed payloads instead of aborting the task — see
    ``decode_audio_meta`` for the I3 rationale."""
    if decoder not in ("stub", "mp4"):
        raise NotImplementedError(
            "unknown video decoder; use 'stub' or 'mp4' (full stream "
            "inspection needs ffprobe — plug it via this interface)"
        )
    _check_on_error(on_error)
    route = on_error == "route"
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue  # empty batch: dict-of-empty-lists would mistype array cols
            out = {k: [] for k in ("path", "major_brand", "timescale", "duration_s", "n_tracks")}
            if route:
                out["ok"], out["error"] = [], []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                try:
                    if content is None:
                        raise ValueError("null content")
                    data = bytes(content)
                    if decoder == "mp4":
                        meta = _parse_mp4_meta(data)
                    else:
                        h = hashlib.sha256(data).digest()
                        meta = {
                            "major_brand": "stub",
                            "timescale": 1000,
                            "duration_s": round((h[0] * 256 + h[1]) / 10.0, 4),
                            "n_tracks": 1 + h[2] % 3,
                        }
                except Exception as exc:
                    if not route:
                        raise
                    out["path"].append(path)
                    for k in ("major_brand", "timescale", "duration_s", "n_tracks"):
                        out[k].append(None)
                    out["ok"].append(False)
                    out["error"].append(f"{type(exc).__name__}: {exc}"[:200])
                    continue
                out["path"].append(path)
                for k in ("major_brand", "timescale", "duration_s", "n_tracks"):
                    out[k].append(meta[k])
                if route:
                    out["ok"].append(True)
                    out["error"].append(None)
            yield pd.DataFrame(out)

    schema = _routed_schema(VIDEO_META_SCHEMA) if route else VIDEO_META_SCHEMA
    return df.mapInPandas(run, schema=schema)
