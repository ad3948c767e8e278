"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, partitioning, UDF
signatures, frame explosion) is real and tested. Codecs at the decode
boundary, per modality:

* **audio — REAL public codec**: RIFF/WAVE PCM payloads decode through the
  Python-stdlib ``wave`` module (sample rate, channels, PCM frames; body =
  raw PCM so downstream featurization runs on real samples). Generate test
  payloads with :func:`make_wav_payload` (also stdlib ``wave``).
* **image/video — STUBBED**: Pillow/ffmpeg are NOT available in this
  container, so only the deterministic synthetic container format below
  decodes; any other payload raises ``NotImplementedError`` at the decode
  boundary — swap ``_decode_payload``'s fallthrough for a real codec in
  production.

Synthetic container format (deterministic, seeded):
    b"DXM1" | kind(1B: I/A/V) | width(2B) | height(2B) | n_frames(2B) | body
"""

from __future__ import annotations

import io
import struct
import wave
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAGIC = b"DXM1"
WAV_MAGIC = b"RIFF"

MEDIA_DDL = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, n_frames:int, mime:string>"
)


def make_payload(kind: str, width: int, height: int, n_frames: int, seed: int) -> bytes:
    body_len = min(width * height, 4096)
    rng = np.random.default_rng(seed)
    body = rng.integers(0, 256, size=body_len, dtype=np.uint8).tobytes()
    return MAGIC + kind[:1].upper().encode() + struct.pack(">HHH", width, height, n_frames) + body


def synth_media(spark: SparkSession, n: int = 60, seed: int = 42) -> DataFrame:
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        w, h = 16 + (i % 8) * 16, 16 + (i % 5) * 16
        frames = 1 if kind == "image" else 4 + i % 7
        mime = {"image": "image/x-dxm", "audio": "audio/x-dxm", "video": "video/x-dxm"}[kind]
        rows.append(
            (i, kind, bytearray(make_payload(kind, w, h, frames, seed + i)), (w, h, frames, mime))
        )
    return spark.createDataFrame(rows, MEDIA_DDL)


def make_wav_payload(
    n_samples: int, sample_rate: int = 8000, channels: int = 1, seed: int = 0
) -> bytes:
    """A REAL RIFF/WAVE file (16-bit PCM) written by stdlib ``wave`` —
    deterministic from the seed, decodable by any WAV reader."""
    rng = np.random.default_rng(seed)
    pcm = rng.integers(-(1 << 15), 1 << 15, size=n_samples * channels, dtype=np.int64)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.astype("<i2").tobytes())
    return buf.getvalue()


def _decode_wav(payload: bytes) -> dict:
    """REAL audio decode: stdlib ``wave`` parses the RIFF container; body
    is the raw PCM so featurization consumes actual samples."""
    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
        channels = w.getnchannels()
        rate = w.getframerate()
        n_frames = w.getnframes()
        body = w.readframes(n_frames)
    return {
        "kind": "A",
        "width": rate,        # audio: width slot carries the sample rate
        "height": channels,   # and height the channel count
        "n_frames": n_frames,
        "n_bytes": len(body),
        "mean_byte": float(np.frombuffer(body, dtype=np.uint8).mean()) if body else 0.0,
        "body": body,
    }


def synth_wav_media(spark: SparkSession, n: int = 20, seed: int = 42) -> DataFrame:
    """Rows whose payloads are REAL WAV files (stdlib ``wave``); meta uses
    the audio convention width=sample_rate, height=channels."""
    rows = []
    for i in range(n):
        rate = 8000 * (1 + i % 3)
        channels = 1 + i % 2
        n_samples = 64 + (i % 5) * 32
        payload = make_wav_payload(n_samples, rate, channels, seed + i)
        rows.append(
            (i, "audio", bytearray(payload), (rate, channels, n_samples, "audio/wav"))
        )
    return spark.createDataFrame(rows, MEDIA_DDL)


def _decode_payload(payload: bytes) -> dict:
    """Decode boundary: real WAV via stdlib ``wave``; DXM1 synthetic
    container for the still-stubbed image/video modalities; anything else
    fails LOUDLY. Real deployment: replace the fallthrough with
    PIL/ffmpeg."""
    if payload is not None and bytes(payload[:4]) == WAV_MAGIC:
        return _decode_wav(payload)
    if payload is None or bytes(payload[:4]) != MAGIC:
        raise NotImplementedError(
            "image/video codecs are not available in this environment; "
            "only RIFF/WAVE audio (real, stdlib wave) and the DXM1 "
            "synthetic container decode (see module docstring)"
        )
    kind = chr(payload[4])
    w, h, n_frames = struct.unpack(">HHH", bytes(payload[5:11]))
    body = bytes(payload[11:])
    return {
        "kind": kind,
        "width": w,
        "height": h,
        "n_frames": n_frames,
        "n_bytes": len(body),
        "mean_byte": float(np.frombuffer(body, dtype=np.uint8).mean()) if body else 0.0,
        "body": body,
    }


def decode_media(df: DataFrame) -> DataFrame:
    """Adds decoded struct via Arrow-batched mapInPandas (no per-row Python
    at the Spark boundary; the loop is over an Arrow batch)."""
    out_ddl = (
        MEDIA_DDL
        + ", decoded struct<width:int, height:int, n_frames:int, n_bytes:long, mean_byte:double>"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dec = [
                (d["width"], d["height"], d["n_frames"], d["n_bytes"], round(d["mean_byte"], 6))
                for d in (_decode_payload(p) for p in pdf["payload"])
            ]
            pdf = pdf.copy()
            pdf["decoded"] = dec
            yield pdf

    return df.mapInPandas(run, schema=out_ddl)


def sample_frames(df: DataFrame, every: int = 2) -> DataFrame:
    """video rows -> one row per sampled frame (frame_idx stepped by
    ``every``); deterministic per-frame byte slice as the 'frame'."""
    out_ddl = "media_id long, frame_idx int, frame_bytes binary, frame_checksum long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                d = _decode_payload(payload)
                if d["kind"] != "V":
                    continue
                n = d["n_frames"]
                body = d["body"]
                step = max(1, len(body) // max(n, 1))
                for fi in range(0, n, every):
                    chunk = body[fi * step : (fi + 1) * step]
                    rows.append((int(mid), fi, bytearray(chunk), zlib.crc32(chunk)))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_bytes", "frame_checksum"])

    return df.mapInPandas(run, schema=out_ddl)


def media_features(df: DataFrame, dim: int = 64) -> DataFrame:
    """Deterministic feature vector from payload bytes (stand-in for a real
    vision/audio encoder) -> feeds the ANN/similarity operators."""
    out_ddl = "media_id long, kind string, embedding array<float>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = []
            for payload in pdf["payload"]:
                d = _decode_payload(payload)
                arr = np.frombuffer(d["body"], dtype=np.uint8)
                pad = (-len(arr)) % dim
                if pad:
                    arr = np.concatenate([arr, np.zeros(pad, dtype=np.uint8)])
                v = arr.reshape(-1, dim).astype(np.float64).mean(axis=0)
                nrm = np.linalg.norm(v)
                embs.append((v / nrm if nrm else v).astype(np.float32).tolist())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "embedding": embs}
            )

    return df.mapInPandas(run, schema=out_ddl)
