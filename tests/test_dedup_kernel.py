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
