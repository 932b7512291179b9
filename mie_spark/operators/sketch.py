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


# --- trailing-window exact distinct via membership bitmaps -------------------


def day_bitmap_words(df: DataFrame, day_col: str, id_col: str) -> DataFrame:
    """Per-(day, word) 32-bit membership bitmaps — the shared state
    layout of the bitmap-distinct family (32-bit words keep every
    shift <= 31, inside both engines' ANSI overflow bound; ids must be
    non-negative, Spark's % is signed). One map-combined aggregate:
    ids cross the wire once per active day."""
    return (
        df.select(
            F.col(day_col).alias("day"),
            F.expr(f"{id_col} div 32").alias("word"),
            F.expr(f"shiftleft(1L, CAST({id_col} % 32 AS INT))").alias("bit"),
        )
        .groupBy("day", "word")
        .agg(F.expr("bit_or(bit)").alias("bm"))
    )


def sliding_distinct_counts(words: DataFrame, window_days: int = 7) -> DataFrame:
    """Exact trailing-``window_days`` distinct counts per observed day
    from a (day, word, bm) bitmap table: each bitmap row FANS OUT to
    the <= window_days window-end days it serves (a day-sequence
    explode + broadcast semi-join against observed days), OR-merges
    per (end-day, word), and popcounts. State O(days x occupied
    words); widening the window scales only the fan-out constant —
    the naive form reshuffles the (day x id) set once per covering
    window. Used by ev_sliding_distinct (batch) and
    st_sliding_distinct (streaming readback)."""
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    days = words.select(F.col("day").alias("t_day")).distinct()
    fan = words.select(
        F.explode(
            F.expr(
                f"sequence(day, day + interval {window_days - 1} days,"
                " interval 1 day)"
            )
        ).alias("t_day"),
        "word",
        "bm",
    )
    merged = (
        fan.join(F.broadcast(days), "t_day")
        .groupBy("t_day", "word")
        .agg(F.expr("bit_or(bm)").alias("bm"))
    )
    return (
        merged.groupBy("t_day")
        .agg(F.sum(F.expr("bit_count(bm)")).cast("long").alias("n_users"))
        .withColumnRenamed("t_day", "day")
    )
