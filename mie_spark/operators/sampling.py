"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus pipeline needs reproducible splits: the same document
must land in the same split on every run, on any cluster, regardless of
partitioning — so sampling is keyed on a content-derived hash, never on
``rand()`` or row position. The md5-hex-prefix construction used here is
engine-portable (identical in Spark, DuckDB, Postgres, ...), which also
makes these operators exactly oracle-checkable — unusual for "sampling".

The reference has no sampling surface at all (SURVEY.md §2.11); these
are north-star training-pipeline additions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash_bucket(id_col: Column, chars: int = 2) -> Column:
    """First ``chars`` hex digits of md5(id) — a uniform bucket label in
    ['00'..'ff'] for chars=2. Lowercase hex sorts lexicographically in
    numeric order, so string comparison against a hex cutoff selects a
    fraction of (cutoff/16^chars) exactly and portably."""
    return F.substring(F.md5(id_col.cast("string")), 1, chars)


def hash_split(
    df: DataFrame,
    id_col: str,
    train_frac: float = 0.75,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/test split by id hash.

    train_frac is quantized to 1/256ths (two hex chars); the split is a
    pure function of the id, so re-runs, retries, and late-arriving
    shards all agree — the property rand()-based splits lack. No
    shuffle: this is a per-row projection that pushes through scans.
    """
    cutoff = format(round(train_frac * 256), "02x")
    return df.withColumn(
        split_col,
        F.when(_hash_bucket(F.col(id_col)) < F.lit(cutoff), "train").otherwise(
            "test"
        ),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    fractions: dict[str, float],
    default_frac: float = 0.0,
) -> DataFrame:
    """Deterministic stratified sample: per-stratum keep-fractions, each
    quantized to 1/256ths and applied via the same hash-cutoff rule as
    hash_split. Equivalent to ``df.sampleBy`` but reproducible across
    engines and immune to partitioning/order changes; still a pure
    filter, so it fuses into the scan (no shuffle, no extra pass)."""
    cutoff = F.lit(format(round(default_frac * 256), "02x"))
    for k, frac in sorted(fractions.items()):
        cutoff = F.when(
            F.col(strata_col) == k, F.lit(format(round(frac * 256), "02x"))
        ).otherwise(cutoff)
    return df.filter(_hash_bucket(F.col(id_col)) < cutoff)
