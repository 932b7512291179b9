"""Bucketed range join: point-in-interval matching WITHOUT an equi-key.

Spark compiles a bare `p.ts BETWEEN i.start AND i.end` join to a
BroadcastNestedLoopJoin (or a CartesianProduct when neither side fits
in memory) — the classic scale-killer for time-interval enrichment.
The standard fix, implemented here, is to manufacture the missing
equi-key: quantize the timeline into fixed-width buckets, tag every
point with its single bucket, explode every interval across all
buckets it overlaps, equi-join on the bucket id, and re-check the
exact containment predicate. Each matching (point, interval) pair
meets in exactly one bucket — the point's — so the join is exact with
no dedup pass.

Cost model: the interval side grows by ~(interval_len / bucket_width)
rows; the point side does not grow at all. Pick bucket_width around
the median interval length — wider buckets mean fewer interval
replicas but more false candidates to filter; narrower the reverse.
Skewed buckets (everything in one hot hour) can be salted with the
skew toolkit; AQE's skew-join handles moderate cases.

Reference capability matched: temporal correlation of facts/decisions
(the reference stores created/valid timestamps and filters validity
windows, pkg/memory/schema.go + reader.go); this is the corpus-scale
batch form of "which records fall inside which windows".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_containment_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Inner-join `points` to every interval containing them
    (start <= p <= end, inclusive both ends), via the bucketed
    equi-join above. All three columns must share one integer unit
    (e.g. epoch microseconds); `bucket_width` is in that unit.

    Returns one row per (point row, containing interval row) with all
    columns from both inputs. Never produces a nested-loop or
    cartesian plan — pinned in tests/test_plans.py.
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")

    # integer `div`, never `/`: (x - x%w)/w runs in float64, whose
    # 53-bit mantissa rounds epoch-nanosecond-sized values (~1.7e18) by
    # up to ~128 — the quotient can come out N - epsilon and truncate
    # to N-1, silently tagging a point with the wrong bucket so it
    # never meets its containing interval. `div` is exact for the full
    # long range and has the same truncating semantics.
    def bucket(col: str) -> F.Column:
        return F.expr(f"`{col}` div {bucket_width}")

    tagged_points = points.withColumn("_bucket", bucket(point_col))
    # identical quantization expression as the point side (truncating
    # division). Truncation is monotone non-decreasing, so
    # start <= p <= end implies bucket(start) <= bucket(p) <= bucket(end)
    # and the interval's bucket range always covers the point's bucket —
    # including negative values, where trunc and floor differ.
    tagged_intervals = intervals.withColumn(
        "_bucket",
        F.explode(F.sequence(bucket(start_col), bucket(end_col))),
    )
    return (
        tagged_points.join(tagged_intervals, "_bucket")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("_bucket")
    )
