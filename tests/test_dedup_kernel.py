"""Regression tests for the MinHash signature kernel against the REAL
Spark implementation (the property tests in test_properties.py model
the math; these pin the production mapInPandas path).

Round-1 bug: shingle hashing via pandas' object-array hash was not a
pure function of the shingle set when shingles contained embedded NUL
bytes ('0' vs '0\\x00' collided in one array context and differed in
another), so signatures depended on batch composition. Shingles are now
hashed JVM-side (xxhash64 over explicit UTF-8 bytes, length-aware).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType, StructField, StructType

from mie_spark.operators.dedup import _MERSENNE31, _signatures_from_shingles

_SCHEMA = StructType(
    [
        StructField("doc", LongType()),
        StructField("shingles", ArrayType(StringType())),
    ]
)


def _sigs(spark, rows, num_hashes=16):
    df = spark.createDataFrame(rows, _SCHEMA).withColumn(
        "n_sh", F.size("shingles")
    )
    out = _signatures_from_shingles(df, num_hashes=num_hashes, seed=42)
    return {r["doc"]: list(r["signature"]) for r in out.collect()}


def test_signature_pure_under_nul_bytes_and_batch_context(spark):
    """Same shingle set ⇒ same signature, regardless of embedded NUL
    bytes, element order, or which other docs share the batch."""
    nul_set = ["0", "0\x00", "a\x00b"]
    alone = _sigs(spark, [(1, nul_set)])
    mixed = _sigs(
        spark,
        [
            (1, list(reversed(nul_set))),
            (2, ["0"]),
            (3, ["0\x00"]),
            (4, ["completely", "different", "shingles"]),
        ],
    )
    assert alone[1] == mixed[1]
    # '0' and '0\x00' are different shingles: their singleton signatures
    # must differ (they collided under the round-1 object-array hash)
    assert mixed[2] != mixed[3]


def test_signature_superset_monotone_and_in_range(spark):
    base = ["x", "y", "z\x00"]
    out = _sigs(spark, [(1, base), (2, base + ["extra-shingle"]), (3, [])])
    assert all(0 <= v <= _MERSENNE31 for v in out[1])
    assert all(b <= a for a, b in zip(out[1], out[2]))
    assert out[3] == [_MERSENNE31] * 16


def test_minhash_short_docs_do_not_collide(spark):
    """Docs too short to shingle share a sentinel signature; they must
    be excluded before banding or every pair of them becomes an LSH
    candidate (quadratic blowup on near-empty web docs) — and they can
    never pass a positive Jaccard threshold anyway."""
    from mie_spark.operators.dedup import minhash_lsh_pairs

    rows = [(i, "x") for i in range(50)]  # 1 token each: zero 3-shingles
    rows += [(100, "the quick brown fox jumps over the lazy dog again"),
             (101, "the quick brown fox jumps over the lazy dog again")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = minhash_lsh_pairs(df, "doc_id", threshold=0.5).collect()
    assert {(r["a_id"], r["b_id"]) for r in pairs} == {(100, 101)}


def test_minhash_carries_string_ids(spark):
    """Signature schema must copy the id type from the input — string
    ids (fact:... keys) pass through mapInPandas opaquely."""
    from mie_spark.operators.dedup import minhash_lsh_pairs

    rows = [("fact:a", "the quick brown fox jumps over the lazy dog"),
            ("fact:b", "the quick brown fox jumps over the lazy dog"),
            ("fact:c", "completely different text with no overlap at all here")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = minhash_lsh_pairs(df, "doc_id", threshold=0.9).collect()
    assert {(r["a_id"], r["b_id"]) for r in pairs} == {("fact:a", "fact:b")}
