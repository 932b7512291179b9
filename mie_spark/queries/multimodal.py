"""Multimodal query coverage: binary payload columns + typed metadata.

The JVM-expressible parts (byte length, content hash) are
oracle-checked; the mapInPandas decode/fan-out plumbing is rows-only
here and behavior-pinned in tests/test_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mie_spark.operators.multimodal import (
    attach_binary_payload,
    decode_frames,
    decode_image_meta,
)
from mie_spark.queries import query
from mie_spark.sources import load_table


@query(
    "mm_binary_meta",
    oracle="""
    SELECT doc_id AS asset_id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS content_sha
    FROM documents
    """,
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload metadata computed JVM-side (no Python boundary):
    the cheap-metadata fast path a media pipeline runs before deciding
    what to decode."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.sha2(F.col("text"), 256).alias("content_sha"),
    )


@query(
    "mm_decode_meta",
    oracle="""
    SELECT doc_id AS asset_id,
           'image/fake' AS media_type,
           octet_length(encode(text)) AS n_bytes,
           (octet_length(encode(text)) % 1920 + 16)::INT AS width,
           (octet_length(encode(text)) % 1080 + 16)::INT AS height,
           sha256(text) AS content_sha
    FROM documents
    """,
)
def mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode to typed metadata. The fake codec's output
    is a pure function of the payload bytes (length-derived dims +
    sha256), so since r7 the oracle recomputes it exactly — what the
    hash certifies is the mapInPandas plumbing itself: batch schema,
    Arrow dtype mapping (Int32 dims), and 1:1 row preservation. The
    'header'/real-codec mode shares this exact plan and batch shape."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_image_meta(attach_binary_payload(docs))


@query(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id AS asset_id,
           (octet_length(encode(text)) + 63) // 64 AS n_frames,
           octet_length(encode(text)) AS total_bytes
    FROM documents
    WHERE octet_length(encode(text)) > 0
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1→N frame fan-out via mapInPandas (fake codec), aggregated to
    per-asset frame counts so the output stays small at any scale.
    Hash-graded since r7: the fake codec chunks the raw bytes at
    stride 64, so n_frames = ceil(n_bytes/64) and the chunk lengths
    sum back to n_bytes — the oracle certifies the fan-out emitted
    every chunk exactly once (multi-row-per-input mapInPandas is the
    easiest place to silently drop or duplicate a tail row)."""
    docs = load_table(spark, sf_dir, "documents")
    frames = decode_frames(attach_binary_payload(docs), every_n=64, codec="fake")
    return frames.groupBy("asset_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum(F.octet_length("frame_bytes")).cast("long").alias("total_bytes"),
    )


@query("mm_resize_features")
def mm_resize_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """resize → feature-extract → per-asset summary: the full multimodal
    pre-embedding pipeline (deterministic fake codec), ending in the
    array<float> column the vector operators consume. Rows-only check
    (hash-based features aren't SQL-expressible)."""
    from mie_spark.operators.multimodal import (
        attach_binary_payload,
        extract_features,
        resize_images,
    )

    docs = load_table(spark, sf_dir, "documents")
    assets = attach_binary_payload(docs)
    resized = resize_images(assets, width=64, height=64, codec="fake")
    feats = extract_features(resized, dim=8)
    return feats.select(
        "asset_id",
        F.size("features").alias("dim"),
        F.round(F.element_at("features", 1), 6).alias("f0"),
    )


@query("mm_audio_chunks")
def mm_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio windowing plumbing (rows-only: the PCM interpretation of
    the fake payload is engine-side; chunk boundary math and
    determinism are pinned in tests/test_multimodal.py). Each document
    payload chunks into overlapping 30s/1s-overlap windows at 16 kHz —
    the fan-out that feeds transcription/embedding UDFs at scale."""
    from mie_spark.operators.multimodal import chunk_audio

    docs = load_table(spark, sf_dir, "documents")
    assets = attach_binary_payload(docs)
    return chunk_audio(assets, codec="fake")


@query("mm_mjpeg_frames")
def mm_mjpeg_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video pipeline end to end, no codec library anywhere: a
    deterministic Motion-JPEG AVI corpus (synthetic_mjpeg_corpus —
    every 20th doc_id becomes a 4-frame AVI, pixels a pure function of
    (doc_id, frame, x, y)) → RIFF walk + per-frame JPEG decode
    (decode_frames codec='mjpeg', operators/jpeg.py) → exact integer
    pixel statistics per sampled frame (png_pixel_stats) → per-asset
    rollup. Rows-only check (a DCT codec isn't SQL-expressible); the
    full output digest is pinned in tests/test_rows_only_digests.py.
    Scale shape: the 1/20 stride bounds Python-side codec cost to a
    constant fraction of the corpus, frames fan out inside mapInPandas
    without driver involvement, and the rollup shuffles only (asset_id,
    int) rows — never pixels."""
    from mie_spark.operators.multimodal import (
        png_pixel_stats,
        synthetic_mjpeg_corpus,
    )

    docs = load_table(spark, sf_dir, "documents")
    assets = synthetic_mjpeg_corpus(docs, every=20, n_frames=4)
    frames = decode_frames(assets, every_n=2, codec="mjpeg")
    stats = png_pixel_stats(frames)
    return stats.groupBy("asset_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum("px_sum").alias("px_sum_total"),
        F.max("width").alias("frame_w"),
        F.max("height").alias("frame_h"),
    )


@query("mm_phash_pairs")
def mm_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate detection, end to end and REAL: a
    deterministic synthetic PPM corpus (near-dup structure by
    construction) → perceptual hash (decode → grayscale → 32×32 → DCT
    low-frequency block → median threshold, operators/multimodal.py
    image_phash) → the same pigeonhole banding as text simhash
    (operators/dedup.py simhash_candidate_pairs) → exact hamming
    filter. No all-pairs join anywhere: the shuffle carries (id, sig,
    band, value) longs, never pixels, which is what makes image dedup
    run at corpus scale. Rows-only check (DCT isn't SQL-expressible);
    grouping correctness, the hamming bound, and a full-output digest
    are pinned in tests/test_rows_only_digests.py."""
    from mie_spark.operators.dedup import simhash_candidate_pairs
    from mie_spark.operators.multimodal import image_phash, synthetic_ppm_corpus

    docs = load_table(spark, sf_dir, "documents")
    assets = synthetic_ppm_corpus(docs, group_size=25)
    sigs = image_phash(assets)
    pairs = simhash_candidate_pairs(
        sigs, max_hamming=6, id_col="asset_id", sig_col="phash"
    )
    return pairs.orderBy("a_id", "b_id")
