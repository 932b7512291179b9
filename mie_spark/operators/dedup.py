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
- simhash: see operators/text.simhash64 — bucket by signature prefix.
- cosine:  operators/vector.similarity_self_join (LSH-bucketed variant).

Exact-verification outputs make the approximate paths oracle-checkable:
candidates are re-scored with true Jaccard, so (at the corpus's planted
similarity levels) LSH output == exact output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mie_spark.operators.text import word_shingles

# 31-bit Mersenne prime: coefficients and hashed shingles both live in
# [0, 2^31), so a*h + b < 2^62 — no long overflow even under ANSI mode
# (the driver's vanilla SparkSession runs with spark.sql.ansi.enabled=true,
# where overflow is a hard error, not a wrap).
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
    return df.select(
        F.col(id_col).alias("doc"),
        word_shingles(F.col(text_col), n).alias("shingles"),
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
    docs = _doc_shingles(df, id_col, text_col, n)
    inv = docs.select("doc", "n_sh", F.explode("shingles").alias("sh"))
    if max_shingle_df is not None:
        keep = (
            inv.groupBy("sh")
            .agg(F.countDistinct("doc").alias("df"))
            .filter(F.col("df") <= max_shingle_df)
            .select("sh")
        )
        inv = inv.join(F.broadcast(keep), "sh")
    a = inv.select(
        F.col("doc").alias("a_id"), F.col("n_sh").alias("a_n"), "sh"
    )
    b = inv.select(
        F.col("doc").alias("b_id"), F.col("n_sh").alias("b_n"), "sh"
    )
    common = (
        a.join(b, "sh")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id", "a_n", "b_n")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    jac = F.col("common") / (F.col("a_n") + F.col("b_n") - F.col("common"))
    return (
        common.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    seed: int = 42,
) -> DataFrame:
    """(doc, array<long> signature): sig[i] = min over shingles of
    ((a_i * h + b_i) mod M31), h = xxhash64(shingle) folded to 31 bits.

    The permutation family is applied with array expressions over the
    shingle array (transform + array_min), so signatures are computed
    in one projection — no explode, no shuffle at all for this stage.
    """
    import random

    rng = random.Random(seed)
    coeffs = [
        (rng.randrange(1, _MERSENNE31), rng.randrange(0, _MERSENNE31))
        for _ in range(num_hashes)
    ]
    docs = _doc_shingles(df, id_col, text_col, n)
    hashed = docs.withColumn(
        "hs",
        F.transform("shingles", lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE31))),
    )

    def _perm(a: int, b: int):
        # factory keeps the Spark lambda unary (default args would be
        # miscounted as higher-order-function parameters)
        return lambda h: F.pmod(F.lit(a) * h + F.lit(b), F.lit(_MERSENNE31))

    sig_cols = [
        F.array_min(F.transform("hs", _perm(a, b))).alias(f"mh{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    sigs = hashed.select("doc", "n_sh", "shingles", *sig_cols)
    return sigs.select(
        "doc",
        "n_sh",
        "shingles",
        F.array(*[F.col(f"mh{i}") for i in range(num_hashes)]).alias("signature"),
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
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes, seed)
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
        "doc", "n_sh", "shingles", F.posexplode(band_arr).alias("band_idx", "band_hash")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("a_id"),
            F.col("b.doc").alias("b_id"),
            F.col("a.shingles").alias("a_sh"),
            F.col("b.shingles").alias("b_sh"),
            F.col("a.n_sh").alias("a_n"),
            F.col("b.n_sh").alias("b_n"),
        )
        .dropDuplicates(["a_id", "b_id"])
    )
    common = F.size(F.array_intersect("a_sh", "b_sh"))
    jac = common / (F.col("a_n") + F.col("b_n") - common)
    return (
        cand.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", "jaccard")
    )
