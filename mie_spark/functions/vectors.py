"""Vector column expressions — the JVM-side hot path for similarity.

Everything here is built from `pyspark.sql.functions` higher-order
functions (zip_with / aggregate / transform), so vector math runs in
the JVM with zero Python boundary cost. (Precision on the mechanism,
corrected r13: higher-order functions are CodegenFallback — the
expression sits inside a whole-stage-codegen stage but evaluates via
the interpreted path. That is still the right trade here: the folds
are deterministic-order, oracle-replayable, and the r13 A/B showed an
unrolled codegen'd equivalent LOSES 3.5x to per-plan janino compiles
at these dimensions — see OPTIMIZATION_r13.md log #10.) This replaces the
reference's HNSW index probes (pkg/memory/schema.go:143-185,
reader.go:62-93) with exact, distributable expressions; approximate
paths (LSH) live in operators/vector.py and reuse these.

All math is done in double: float32 inputs are cast up first, which both
keeps precision and matches DuckDB's list_* semantics for oracle parity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Elementwise product folded left-to-right (deterministic order)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    ad = _as_double(a)
    return F.sqrt(
        F.aggregate(ad, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity in [-1, 1]; the reference's `distance` is
    1 - cosine_sim (CozoDB Cosine distance, schema.go:149)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def l2_normalize(a: Column) -> Column:
    """Unit-normalize (reference: embedding.go:481-502 normalizes every
    provider output so dot == cosine). A zero vector passes through
    unchanged (matching the providers' _normalize): with ANSI off,
    x/0.0 is NULL, and one NULL-array row would otherwise poison any
    numpy consumer downstream (k-means partials → NaN centroids)."""
    n = l2_norm(a)
    d = _as_double(a)
    return F.when(n == 0, d).otherwise(F.transform(d, lambda x: x / n))
