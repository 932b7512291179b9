"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design: image/audio/video payloads are `binary` columns riding next to
typed metadata columns; heavy per-item work (decode, resize, frame
sampling, feature extraction) runs in Arrow-batched `mapInPandas` so a
100 TB corpus streams through Python in columnar batches, one partition
per task, without ever collecting to the driver.

The decode step itself is STUBBED (the container ships no image/audio
codecs): `decode_image_meta` parses a deterministic fake header instead
of real pixels, and `decode_frames` raises NotImplementedError unless
the fake codec is requested. The Spark-side contract — schemas, batch
iteration, partitioning — is real and tested (tests/test_multimodal.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Metadata schema every decoded asset carries.
ASSET_META_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("content_sha", StringType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a multimodal-shaped table from the documents corpus: the
    utf-8 bytes stand in for an encoded media payload."""
    return df.select(
        F.col(id_col).alias("asset_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


def decode_image_meta(assets: DataFrame) -> DataFrame:
    """'Decode' each payload into typed metadata via mapInPandas.

    Real systems swap `_fake_decode` for PIL/ffmpeg; the Arrow batch
    shape, output schema, and partition-preserving plan are identical.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n_bytes,
                    # deterministic fake dimensions derived from content
                    "width": (n_bytes % 1920 + 16).astype("int32"),
                    "height": (n_bytes % 1080 + 16).astype("int32"),
                    "content_sha": payloads.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                }
            )

    return assets.mapInPandas(batches, schema=ASSET_META_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def decode_frames(assets: DataFrame, every_n: int = 64, codec: str = "real") -> DataFrame:
    """Frame sampling: explode each payload into every_n-th 'frame'.

    codec='real' is NOT implemented in this container (no av libs) —
    callers get an immediate, loud error instead of a silent stub.
    codec='fake' chunks the raw bytes deterministically, exercising the
    1→N fan-out plan shape (mapInPandas yielding multiple rows per
    input) end-to-end.
    """
    if codec != "fake":
        raise NotImplementedError(
            "real media decoding requires codec libraries not present in "
            "this environment; pass codec='fake' for the deterministic stub"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_ids, out_idx, out_bytes = [], [], []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                raw = bytes(payload)
                for i, off in enumerate(range(0, len(raw), every_n)):
                    out_ids.append(asset_id)
                    out_idx.append(i)
                    out_bytes.append(raw[off : off + every_n])
            yield pd.DataFrame(
                {"asset_id": out_ids, "frame_idx": out_idx, "frame_bytes": out_bytes}
            )

    return assets.mapInPandas(batches, schema=FRAME_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_images(
    assets: DataFrame, width: int = 224, height: int = 224, codec: str = "real"
) -> DataFrame:
    """Batch resize to a fixed (width, height) — the standard pre-
    embedding normalization step. codec='real' errors loudly (no PIL in
    this container); codec='fake' emits a deterministic byte payload of
    exactly width*height//8 bytes derived from the source (cycle-padded
    or truncated), so downstream batch-shape/size logic is exercised
    with realistic per-row payload sizes."""
    if codec != "fake":
        raise NotImplementedError(
            "real image resize requires PIL/opencv, absent here; "
            "pass codec='fake' for the deterministic stub"
        )
    target = max(width * height // 8, 1)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for payload in pdf["payload"]:
                raw = bytes(payload) or b"\x00"
                reps = (target + len(raw) - 1) // len(raw)
                out.append((raw * reps)[:target])
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "payload": out,
                    "width": width,
                    "height": height,
                }
            )

    return assets.mapInPandas(batches, schema=RESIZED_SCHEMA)


def extract_features(assets: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic unit-norm feature vector per payload (the embed
    step of an image/audio pipeline). Real systems swap the hash-based
    fake for a model forward pass; the output column is the same
    array<float> the vector operators (operators/vector.py) consume, so
    multimodal → features → ANN composes end-to-end today."""
    from pyspark.sql.types import ArrayType, FloatType

    schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("features", ArrayType(FloatType())),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import math

        def feat(raw: bytes) -> list[float]:
            vals = []
            for i in range(dim):
                h = hashlib.blake2b(raw, digest_size=8, salt=i.to_bytes(8, "big"))
                v = int.from_bytes(h.digest(), "big") / 2**64 - 0.5
                vals.append(v)
            n = math.sqrt(sum(v * v for v in vals)) or 1.0
            return [v / n for v in vals]

        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "features": [feat(bytes(p)) for p in pdf["payload"]],
                }
            )

    return assets.mapInPandas(batches, schema=schema)


AUDIO_CHUNK_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("chunk_idx", IntegerType()),
        StructField("start_ms", LongType()),
        StructField("end_ms", LongType()),
        StructField("n_samples", IntegerType()),
        StructField("rms", StringType()),
    ]
)


def chunk_audio(
    assets: DataFrame,
    sample_rate: int = 16_000,
    chunk_ms: int = 30_000,
    overlap_ms: int = 1_000,
    codec: str = "real",
) -> DataFrame:
    """Whisper-style audio windowing: each payload (treated as 16-bit
    mono PCM at sample_rate) explodes into fixed-duration chunks with
    overlap, each row carrying its time span and an RMS energy reading
    (hex-formatted so the value is exactly reproducible — no float
    hashing concerns).

    codec='real' errors loudly (no audio libs in this container);
    codec='fake' interprets the raw bytes as samples. Either way the
    Spark plan — 1→N mapInPandas fan-out keyed on time, overlap math,
    partition preservation — is the production shape: at 100 TB, chunks
    flow straight into a transcription/embedding UDF without any
    driver-side coordination.
    """
    if codec != "fake":
        raise NotImplementedError(
            "real audio decoding requires codec libraries not present in "
            "this environment; pass codec='fake' for the deterministic stub"
        )
    samples_per_chunk = sample_rate * chunk_ms // 1000
    hop = sample_rate * (chunk_ms - overlap_ms) // 1000
    bytes_per_sample = 2

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out = {k: [] for k in ("asset_id", "chunk_idx", "start_ms", "end_ms", "n_samples", "rms")}
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                raw = bytes(payload)
                usable = len(raw) - len(raw) % bytes_per_sample
                sig = np.frombuffer(raw[:usable], dtype="<i2").astype(np.float64)
                i = 0
                for start in range(0, max(len(sig), 1), hop):
                    win = sig[start : start + samples_per_chunk]
                    if win.size == 0:
                        break
                    rms = float(np.sqrt(np.mean(win * win))) if win.size else 0.0
                    out["asset_id"].append(asset_id)
                    out["chunk_idx"].append(i)
                    out["start_ms"].append(start * 1000 // sample_rate)
                    out["end_ms"].append((start + win.size) * 1000 // sample_rate)
                    out["n_samples"].append(win.size)
                    out["rms"].append(float(rms).hex())
                    i += 1
                    if start + samples_per_chunk >= len(sig):
                        break
            yield pd.DataFrame(out)

    return assets.mapInPandas(batches, schema=AUDIO_CHUNK_SCHEMA)
