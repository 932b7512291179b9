"""Multimodal plumbing tests: schemas, batch shapes, fan-out counts,
and determinism of the fake-codec stubs (the Spark-side contract that
stays identical when real codecs are swapped in).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mie_spark.operators.multimodal import (
    attach_binary_payload,
    decode_frames,
    decode_image_meta,
    extract_features,
    resize_images,
)
from mie_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _assets(spark, n=20):
    docs = load_table(spark, SF, "documents").limit(n)
    return attach_binary_payload(docs)


def test_decode_meta_is_deterministic(spark):
    a = decode_image_meta(_assets(spark)).orderBy("asset_id").collect()
    b = decode_image_meta(_assets(spark)).orderBy("asset_id").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert all(r["n_bytes"] > 0 and len(r["content_sha"]) == 64 for r in a)


def test_frame_fanout_counts(spark):
    assets = _assets(spark, 5)
    sizes = {
        r["asset_id"]: r["n"]
        for r in assets.select(
            "asset_id", F.length("payload").alias("n")
        ).collect()
    }
    frames = decode_frames(assets, every_n=64, codec="fake")
    counts = {
        r["asset_id"]: r["cnt"]
        for r in frames.groupBy("asset_id").agg(F.count("*").alias("cnt")).collect()
    }
    for aid, nbytes in sizes.items():
        assert counts[aid] == math.ceil(nbytes / 64)


def test_real_codecs_error_loudly(spark):
    assets = _assets(spark, 2)
    with pytest.raises(NotImplementedError):
        decode_frames(assets, codec="real")
    with pytest.raises(NotImplementedError):
        resize_images(assets, codec="real")


def test_resize_emits_fixed_payload_size(spark):
    resized = resize_images(_assets(spark, 10), width=64, height=64, codec="fake")
    rows = resized.select(F.length("payload").alias("n"), "width", "height").collect()
    assert all(r["n"] == 64 * 64 // 8 and r["width"] == 64 for r in rows)


def test_features_are_unit_norm_and_stable(spark):
    feats = extract_features(_assets(spark, 10), dim=8).collect()
    for r in feats:
        v = r["features"]
        assert len(v) == 8
        assert abs(sum(x * x for x in v) - 1.0) < 1e-5
    again = extract_features(_assets(spark, 10), dim=8).collect()
    assert [r["features"] for r in feats] == [r["features"] for r in again]


def test_chunk_audio_boundaries_and_determinism(spark):
    """Chunk spans tile the signal with the configured hop/overlap, RMS
    is bit-reproducible across runs, and the real codec path errors."""
    import pytest as _pytest

    from mie_spark.operators.multimodal import attach_binary_payload, chunk_audio
    from mie_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(20)
    assets = attach_binary_payload(docs)
    with _pytest.raises(NotImplementedError):
        chunk_audio(assets, codec="real").count()

    out = chunk_audio(
        assets, sample_rate=1000, chunk_ms=2000, overlap_ms=500, codec="fake"
    )
    rows = out.collect()
    assert rows
    by_asset = {}
    for r in rows:
        by_asset.setdefault(r["asset_id"], []).append(r)
    for chunks in by_asset.values():
        chunks.sort(key=lambda r: r["chunk_idx"])
        # hop = 1.5s at 1 kHz → consecutive starts differ by 1500 ms
        for a, b in zip(chunks, chunks[1:]):
            assert b["start_ms"] - a["start_ms"] == 1500
        for r in chunks:
            assert 0 < r["n_samples"] <= 2000
            assert r["end_ms"] - r["start_ms"] == r["n_samples"]  # 1 kHz
    again = {
        (r["asset_id"], r["chunk_idx"]): r["rms"]
        for r in chunk_audio(
            assets, sample_rate=1000, chunk_ms=2000, overlap_ms=500, codec="fake"
        ).collect()
    }
    assert {(r["asset_id"], r["chunk_idx"]): r["rms"] for r in rows} == again
