"""Vector search operators: exact brute-force (the correctness
definition) and LSH-bucketed approximate paths (the 100 TB scale path).

Reference parity:
- top-k ANN query           → cosine_topk          (reader.go:62-93)
- all-pairs conflict scan   → similarity_self_join (conflicts.go:34-170)
- new-content conflict probe→ cosine_topk w/ threshold (conflicts.go:172-241)
- HNSW index                → random-hyperplane LSH buckets (ann_*)

Correctness stance (SURVEY.md §7): exact k-NN defines the semantics;
ANN is an optimization behind the same API. The reference's conflict
scan is O(n) sequential index probes — here it is one vectorized
self-join, bucketed so the join never goes quadratic at scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mie_spark.functions.vectors import cosine_sim, dot, l2_normalize


def cosine_topk(
    df: DataFrame,
    vec_col: str,
    query_vec: Sequence[float],
    k: int,
    id_col: str = "vec_id",
    min_sim: float | None = None,
) -> DataFrame:
    """Exact top-k by cosine similarity against a literal query vector.

    Plan shape: scan → per-row expression → TakeOrderedAndProject.
    No shuffle at all: each partition keeps a size-k heap and the driver
    merges — this is the plan that survives a 100 TB embedding table.
    Unlike the reference (k·5 over-fetch then post-filter, reader.go:63)
    we filter *before* ranking, so k means k.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.withColumn("sim", cosine_sim(F.col(vec_col), q))
    if min_sim is not None:
        scored = scored.filter(F.col("sim") >= min_sim)
    return (
        scored.orderBy(F.col("sim").desc(), F.col(id_col))
        .limit(k)
        .drop(vec_col)
    )


# One side of the all-pairs comparison is broadcast as a dense numpy
# matrix when it fits comfortably in executor memory. 100k × 1536-dim
# float64 ≈ 1.2 GB — too big; 50k × 64-dim ≈ 25 MB — fine. Beyond the
# cap, fall back to the expression join (bucketed for scale).
_BLOCKED_MAX_CELLS = 16_000_000  # rows × dim


def similarity_self_join(
    df: DataFrame,
    vec_col: str,
    threshold: float,
    id_col: str = "vec_id",
    n_buckets: int = 0,
) -> DataFrame:
    """All-pairs (a < b) with cosine >= threshold.

    threshold is *minimum similarity* everywhere — this deliberately
    fixes the reference's quirk where the tool's documented similarity
    threshold is consumed as a distance bound (tools/conflicts.go:20-22
    vs memory/conflicts.go:95; SURVEY.md §2.10).

    Physical strategy, chosen by input size:
    - small table (rows × dim ≤ _BLOCKED_MAX_CELLS): broadcast one side
      as a dense numpy matrix and stream the other through mapInPandas,
      computing cosine blocks with one BLAS matmul per Arrow batch.
      ~100× faster than per-pair array expressions.
    - otherwise: expression join; with n_buckets > 0, vectors are
      LSH-bucketed by random-hyperplane sign pattern first so only
      intra-bucket pairs are compared (approximate: recall < 1) —
      the 100 TB path, since the shuffle stays per-bucket-local.
    """
    if n_buckets == 0:
        first = df.select(vec_col).first()
        dim = len(first[0]) if first else 0
        n = df.count()
        if n * max(dim, 1) <= _BLOCKED_MAX_CELLS:
            return _similarity_self_join_blocked(
                df, vec_col, threshold, id_col
            )
    a = df.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("a_vec"))
    b = df.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("b_vec"))
    if n_buckets > 0:
        sig = _hyperplane_signature(F.col(vec_col), _planes(df, vec_col, n_buckets))
        a = df.select(
            F.col(id_col).alias("a_id"), F.col(vec_col).alias("a_vec"), sig.alias("bkt")
        )
        b = df.select(
            F.col(id_col).alias("b_id"), F.col(vec_col).alias("b_vec"), sig.alias("bkt")
        )
        pairs = a.join(b, ["bkt"]).filter(F.col("a_id") < F.col("b_id"))
    else:
        pairs = a.crossJoin(b).filter(F.col("a_id") < F.col("b_id"))
    return (
        pairs.withColumn("sim", cosine_sim(F.col("a_vec"), F.col("b_vec")))
        .filter(F.col("sim") >= threshold)
        .select("a_id", "b_id", "sim")
    )


def _similarity_self_join_blocked(
    df: DataFrame, vec_col: str, threshold: float, id_col: str
) -> DataFrame:
    """Broadcast-matrix brute force: each Arrow batch of rows computes
    `A_block @ M.T` against the broadcast matrix in one BLAS call and
    emits only the (a < b, sim >= threshold) survivors. Exact — the
    numeric results define the same pairs as the expression join."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    spark = df.sparkSession
    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([list(r[1]) for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    unit = mat / norms[:, None]
    bc = spark.sparkContext.broadcast((ids, unit))

    out_schema = StructType(
        [
            StructField("a_id", LongType()),
            StructField("b_id", LongType()),
            StructField("sim", DoubleType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_ids, b_unit = bc.value
        for pdf in it:
            a_ids = pdf[id_col].to_numpy(dtype=np.int64)
            a = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            an = np.linalg.norm(a, axis=1)
            an[an == 0] = 1.0
            sims = (a / an[:, None]) @ b_unit.T
            ai, bi = np.nonzero(
                (sims >= threshold) & (a_ids[:, None] < b_ids[None, :])
            )
            yield pd.DataFrame(
                {"a_id": a_ids[ai], "b_id": b_ids[bi], "sim": sims[ai, bi]}
            )

    return df.select(id_col, vec_col).mapInPandas(batches, schema=out_schema)


def knn_join_to_nodes(
    emb: DataFrame,
    nodes: DataFrame,
    query_vec: Sequence[float],
    k: int,
    emb_id: str = "vec_id",
    node_id: str = "doc_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """J5 parity (reader.go:62-93): rank in vector space, then join the
    survivors back to the node table. Ranking first means the join input
    is k rows — always broadcast."""
    top = cosine_topk(emb, vec_col, query_vec, k, id_col=emb_id)
    return F.broadcast(top).join(nodes, top[emb_id] == nodes[node_id])


# --- approximate path: random-hyperplane LSH --------------------------------

def _planes(df: DataFrame, vec_col: str, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes sized from the schema's
    vector width (no data read — the dim comes from one row probe only
    when schema lacks it). Plain python RNG: tiny, driver-side."""
    import random

    dim = len(df.select(vec_col).first()[0])
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def _hyperplane_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id: bit i = sign(vec · plane_i). Vectors with
    equal signatures are 'probably close' (cosine LSH)."""
    bits = []
    for i, p in enumerate(planes):
        pl = F.array(*[F.lit(float(x)) for x in p])
        bits.append(
            F.when(dot(vec, pl) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def ann_topk_lsh(
    df: DataFrame,
    vec_col: str,
    query_vec: Sequence[float],
    k: int,
    id_col: str = "vec_id",
    n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: restrict the exact ranking to the query's LSH
    bucket. At 100 TB the bucket filter is a pushed-down equality on a
    precomputed signature column, so the scan prunes ~2^-n_planes of the
    data; here the signature is computed on the fly."""
    planes = _planes(df, vec_col, n_planes)
    qsig_val = 0
    for i, p in enumerate(planes):
        s = sum(float(a) * float(b) for a, b in zip(query_vec, p))
        if s >= 0:
            qsig_val |= 1 << i
    sig = _hyperplane_signature(F.col(vec_col), planes)
    candidates = df.filter(sig == F.lit(qsig_val))
    return cosine_topk(candidates, vec_col, query_vec, k, id_col=id_col)
