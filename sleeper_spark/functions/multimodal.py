"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched Pandas UDFs.

The Spark-side architecture is real and tested — schemas, batch shapes,
``mapInPandas`` signatures, partition sizing. Codecs by tier: WAV/PCM
audio decodes for REAL with the stdlib (``decode_wav``, no external
library); images decode for real when Pillow is installed
(``real_image_decoder``, import-guarded hook) and otherwise fall back
to the deterministic fake decoder (stable pseudo-pixels from the
payload hash) so the plumbing is exercised end-to-end; compressed
audio/video (mp3/ogg/mp4) still require external decoders and raise
NotImplementedError naming the hook to plug in.

Scale notes: binary payloads ride in the same Parquet row as their
metadata; ``spark.sql.files.maxPartitionBytes`` bounds task input so a
task's Arrow batches fit executor memory; per-batch processing in
``mapInPandas`` streams record batches instead of materialising a
partition. Feature extraction emits fixed-size vectors so downstream
similarity search (``similarity.py``) applies unchanged.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# metadata struct carried alongside every binary payload
MEDIA_META_SCHEMA = T.StructType([
    T.StructField("media_type", T.StringType(), False),   # image|audio|video
    T.StructField("format", T.StringType(), True),        # png|wav|mp4|...
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])

IMAGE_FEATURE_DIM = 16


def attach_media_metadata(df: DataFrame, payload_col: str, media_type: str,
                          fmt: str | None = None) -> DataFrame:
    """Wrap a raw binary column with the typed metadata struct."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).cast("string").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def fake_image_decoder(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real image codec: 8x8 grayscale derived
    from the payload's sha256 — stable across runs and processes."""
    h = hashlib.sha256(payload or b"").digest()
    arr = np.frombuffer((h * 2)[:64], dtype=np.uint8).astype(np.float32)
    return arr.reshape(8, 8)


try:  # import-guarded real codec: present on real clusters, not here
    from PIL import Image as _PILImage  # noqa: N814
except ImportError:
    _PILImage = None


def real_image_decoder(payload: bytes) -> np.ndarray:
    """Real codec hook: decodes with PIL when the library is installed
    (resized to the 8x8 grayscale grid the feature extractor expects),
    else raises — this container has no imaging libraries, so tests use
    ``fake_image_decoder`` and production clusters light this up by
    installing Pillow; the Spark-side plumbing is identical either way."""
    if _PILImage is None:
        raise NotImplementedError(
            "image decoding requires an imaging library (PIL/Pillow); "
            "not present in this environment — use fake_image_decoder for tests"
        )
    import io

    img = _PILImage.open(io.BytesIO(payload)).convert("L").resize((8, 8))
    return np.asarray(img, dtype=np.float32)


def extract_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decoder: Callable[[bytes], "np.ndarray"] = real_image_decoder,
) -> DataFrame:
    """payload binary -> fixed-size feature vector via mapInPandas.

    Feature = per-row/per-column means of the decoded 8x8 grid + global
    mean and range, giving an IMAGE_FEATURE_DIM-wide ``array<double>``
    column compatible with the similarity operators. All 16 values are
    exact in float64 (integer sums divided by powers of two), so any
    engine recomputing them from the same pixels gets bit-identical
    doubles — the driver's oracle relies on this.
    """
    out_schema = T.StructType([
        T.StructField(id_col, T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for payload in pdf[payload_col]:
                img = decoder(bytes(payload) if payload is not None else b"")
                g = img.astype(np.float64)
                v = np.concatenate([
                    g.mean(axis=1),                      # 8 row means (sum/8)
                    g.mean(axis=0)[:6],                  # 6 col means (sum/8)
                    [g.mean(), float(g.max() - g.min())],  # global mean + range
                ])
                feats.append(v.tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, payload_col).mapInPandas(batches, out_schema)


def sample_video_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_nth: int = 10,
) -> DataFrame:
    """Frame-sampling plumbing: emits (id, frame_index, frame_payload) rows.
    The splitter is a deterministic fake (chunks the payload); a real
    demuxer slots into the same mapInPandas shape."""
    out_schema = T.StructType([
        T.StructField(id_col, T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame_payload", T.BinaryType(), False),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                chunks = [data[i:i + 32] for i in range(0, max(len(data), 1), 32)]
                for j in range(0, len(chunks), every_nth):
                    ids.append(rid)
                    idxs.append(j)
                    frames.append(chunks[j])
            yield pd.DataFrame({id_col: ids, "frame_index": idxs,
                                "frame_payload": frames})

    return df.select(id_col, payload_col).mapInPandas(batches, out_schema)


# ---------------------------------------------------------------------------
# audio: WAV/PCM is decodable with the STDLIB — a real codec, no deps
# ---------------------------------------------------------------------------

def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """REAL audio codec for WAV/PCM containers: stdlib ``wave`` + numpy,
    so it works in any Python environment — unlike compressed formats
    (mp3/ogg/flac), which still need an external decoder and raise
    NotImplementedError naming the hook. Returns
    ``(sample_rate, mono float32 samples in [-1, 1])``; multi-channel
    audio is averaged to mono."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload or b"")) as w:
            sr = w.getframerate()
            ch = w.getnchannels()
            sw = w.getsampwidth()
            raw = w.readframes(w.getnframes())
    except (wave.Error, EOFError) as e:
        raise NotImplementedError(
            f"not a PCM WAV container ({e}); compressed audio needs an "
            "external decoder — plug one in via the decoder= hook "
            "(librosa/ffmpeg on a real cluster)") from e
    # a payload truncated mid-sample yields a buffer that is not a
    # multiple of the sample width — decode the valid prefix instead of
    # letting np.frombuffer raise (one corrupt file must not kill a
    # billion-row job; extract_audio_features also quarantines)
    raw = raw[: len(raw) // max(sw, 1) * max(sw, 1)]
    if sw == 2:
        x = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    elif sw == 1:  # WAV 8-bit is unsigned
        x = (np.frombuffer(raw, "u1").astype(np.float32) - 128.0) / 128.0
    elif sw == 4:
        x = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483648.0
    else:
        raise NotImplementedError(f"unsupported PCM sample width {sw}")
    if ch > 1:
        x = x[: (len(x) // ch) * ch].reshape(-1, ch).mean(axis=1)
    return sr, x


def extract_audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    n_windows: int = 8,
    decoder: Callable[[bytes], tuple[int, "np.ndarray"]] = decode_wav,
) -> DataFrame:
    """Audio payload -> fixed-size acoustic summary via mapInPandas:
    sample rate, duration, global peak, and per-window RMS energy (the
    loudness envelope a speech/music filter keys on). Same Arrow-batched
    shape as the image path; an empty/unreadable payload yields NULLs
    for a clean quarantine filter downstream.

    Output: ``id_col, sample_rate, n_samples, duration_s, peak,
    window_rms (array<double>, n_windows entries)``.
    """
    out_schema = T.StructType([
        T.StructField(id_col, T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("peak", T.DoubleType(), True),
        T.StructField("window_rms", T.ArrayType(T.DoubleType()), True),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"sample_rate": [], "n_samples": [], "duration_s": [],
                    "peak": [], "window_rms": []}
            for payload in pdf[payload_col]:
                try:
                    sr, x = decoder(
                        bytes(payload) if payload is not None else b"")
                except (NotImplementedError, ValueError, OSError):
                    # undecodable payload (wrong container, corrupt
                    # frames, custom decoder failure) -> NULL row for a
                    # clean quarantine filter; never a task failure
                    for k in rows:
                        rows[k].append(None)
                    continue
                n = len(x)
                rows["sample_rate"].append(int(sr))
                rows["n_samples"].append(int(n))
                rows["duration_s"].append(float(n / sr) if sr else 0.0)
                rows["peak"].append(
                    float(np.abs(x).max()) if n else 0.0)
                rms = []
                for w in range(n_windows):
                    seg = x[w * n // n_windows:(w + 1) * n // n_windows]
                    rms.append(float(np.sqrt(np.mean(seg.astype(np.float64)
                                                     ** 2))) if len(seg)
                               else 0.0)
                rows["window_rms"].append(rms)
            yield pd.DataFrame({id_col: pdf[id_col], **rows})

    return df.select(id_col, payload_col).mapInPandas(batches, out_schema)
