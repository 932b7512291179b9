"""Mergeable frequency-sketch operators (heavy hitters).

The scale problem: "which keys exceed f of all rows" over a key space
too large to group exactly (URLs, IPs, n-grams). A plain
groupBy(key).count() shuffles a partial count for EVERY distinct key;
the two-pass sketch below shuffles only O(partitions * k) candidate
rows, then recounts exactly — the result is provably EXACT, so it can
be graded against a plain GROUP BY ... HAVING oracle.

Pass 1 — per-partition Misra-Gries summaries (weighted/merged form,
Agarwal et al., "Mergeable Summaries", PODS'12): each partition keeps
at most k (key, residual) counters; per Arrow batch the keys are
pre-counted vectorized (pandas value_counts — no per-row Python), the
batch counts merge into the summary, and when the summary exceeds k
entries the (k+1)-th largest residual is subtracted from all (the
counters it zeroes drop out). Total subtracted mass is at most
n_p/(k+1), so ANY key with partition count > n_p/(k+1) survives with
positive residual — the no-false-negative guarantee.

Pass 2 — exact recount: the union of summary keys (<= partitions*k
rows, broadcast) semi-joins the input, and only those keys are grouped
exactly; the f-threshold is applied cross-multiplied in BIGINTs.

Why no false negatives end-to-end: a key with global count >= f*n has,
by weighted pigeonhole, SOME partition where its count >= f*n_p; with
k + 1 > 1/f that exceeds n_p/(k+1), so the key reaches the candidate
set regardless of how rows are partitioned, and the exact pass then
reports its true count. Reference: reference has no sketch surface;
this is north-star scale tooling (SURVEY §2 extensions).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_summaries(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-partition MG summaries of ``key_col`` (a LONG column).

    Returns (key, residual) with at most k rows per input partition.
    residual is a lower bound on the partition count; keys with
    partition count > n_p/(k+1) are guaranteed present.
    """

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[int, int] = {}
        for pdf in batches:
            vc = pdf[key_col].value_counts()  # vectorized, no per-row loop
            for key, cnt in vc.items():
                counters[key] = counters.get(key, 0) + int(cnt)
            if len(counters) > k:
                vals = sorted(counters.values(), reverse=True)
                thr = vals[k]  # (k+1)-th largest residual
                counters = {
                    key: c - thr for key, c in counters.items() if c > thr
                }
        yield pd.DataFrame(
            {
                key_col: pd.Series(list(counters), dtype="int64"),
                "residual": pd.Series(list(counters.values()), dtype="int64"),
            }
        )

    return df.select(key_col).mapInPandas(
        summarize, schema=f"{key_col} long, residual long"
    )


def exact_heavy_hitters(
    df: DataFrame, key_col: str, denom: int, k: int | None = None
) -> DataFrame:
    """Keys of ``key_col`` with count*denom >= total rows — exactly.

    Two-pass: MG candidates (k defaults to 2*denom, satisfying the
    k+1 > denom no-false-negative bound with slack), broadcast
    semi-join, exact grouped recount, integer cross-multiplied
    threshold. Returns (key, cnt, share) where share is the integer
    half-up 4-decimal fraction. The exactness contract REQUIRES
    k + 1 > denom; a looser k raises ValueError rather than silently
    returning a subset.
    """
    if k is None:
        k = 2 * denom
    if k + 1 <= denom:
        raise ValueError(f"k={k} violates no-false-negative bound for denom={denom}")
    cand = (
        misra_gries_summaries(df, key_col, k)
        .select(key_col)
        .distinct()
    )
    total = df.agg(F.count(F.lit(1)).alias("_total"))
    counts = (
        df.join(F.broadcast(cand), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from mie_spark.functions.numeric import share_half_up_4dp

    share = share_half_up_4dp(F.col("cnt"), F.col("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * denom >= F.col("_total"))
        .select(key_col, "cnt", share.alias("share"))
    )
