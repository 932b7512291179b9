"""Operator library: vector search, dedup, text, graph, multimodal,
sampling, skew mitigation."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition iff the input under-parallelizes the cluster.

    Parquet scans split only at row-group boundaries, so a single-row-
    group file scans as ONE task no matter what maxPartitionBytes says —
    and every narrow (per-row) stage after it, including Arrow-batched
    Python work, inherits that single task. Operators that do heavy
    per-row compute (shingling, MinHash, BLAS blocks, decode) call this
    first: the shuffle it inserts costs one pass over the (small,
    under-partitioned) input and buys back full-core parallelism.

    At real scale inputs arrive with ≥cores partitions and this is a
    no-op — the conditional is what keeps it safe to leave in the
    operator rather than at call sites.

    The ``auto`` probe reads ``df.rdd.getNumPartitions()``, which costs
    a driver-side plan analysis + RDD conversion per call — fine on the
    small inputs it exists for, but wasted work on a production cluster
    where inputs are already wide. ``spark.mie.ensureParallelism`` makes
    the policy explicit per deployment: ``auto`` (default, probe),
    ``never`` (trust the input layout — the 1000-executor setting; zero
    driver work), ``always`` (unconditional repartition — debugging).
    """
    spark = df.sparkSession
    mode = spark.conf.get("spark.mie.ensureParallelism", "auto")
    if mode == "never":
        return df
    target = min_partitions or spark.sparkContext.defaultParallelism
    if mode == "always":
        return df.repartition(target)
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
