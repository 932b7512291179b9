"""Bucketed range join: exactness vs a brute-force model (inclusive
bounds, multi-bucket intervals, negative coordinates, duplicates) and
the no-nested-loop plan guarantee it exists to provide."""

from __future__ import annotations

from mie_spark.operators.rangejoin import interval_containment_join


def _run(spark, points, intervals, width):
    p = spark.createDataFrame(points, ["p", "pid"])
    i = spark.createDataFrame(intervals, ["s", "e", "iid"])
    out = interval_containment_join(p, i, "p", "s", "e", bucket_width=width)
    return {(r["pid"], r["iid"]) for r in out.collect()}


def test_matches_brute_force_including_negatives_and_bounds(spark):
    import random

    rng = random.Random(7)
    points = [(rng.randint(-100, 100), n) for n in range(60)]
    intervals = []
    for n in range(25):
        s = rng.randint(-100, 100)
        intervals.append((s, s + rng.randint(0, 60), n))
    expected = {
        (pid, iid)
        for p, pid in points
        for s, e, iid in intervals
        if s <= p <= e
    }
    assert _run(spark, points, intervals, width=16) == expected


def test_point_matches_interval_exactly_once(spark):
    """A point inside an interval spanning many buckets must appear
    once, not once per overlapped bucket."""
    points = [(50, 1)]
    intervals = [(0, 1000, 1)]
    p = spark.createDataFrame(points, ["p", "pid"])
    i = spark.createDataFrame(intervals, ["s", "e", "iid"])
    rows = interval_containment_join(
        p, i, "p", "s", "e", bucket_width=10
    ).collect()
    assert len(rows) == 1


def test_inclusive_boundaries(spark):
    points = [(10, 1), (20, 2), (9, 3), (21, 4)]
    intervals = [(10, 20, 1)]
    got = _run(spark, points, intervals, width=7)
    assert got == {(1, 1), (2, 1)}


def test_no_nested_loop_plan(spark):
    p = spark.range(100).selectExpr("id * 13 AS p", "id AS pid")
    i = spark.range(10).selectExpr(
        "id * 100 AS s", "id * 100 + 150 AS e", "id AS iid"
    )
    plan = (
        interval_containment_join(p, i, "p", "s", "e", bucket_width=50)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_rejects_nonpositive_bucket_width(spark):
    import pytest

    p = spark.range(1).selectExpr("id AS p")
    i = spark.range(1).selectExpr("id AS s", "id AS e")
    with pytest.raises(ValueError):
        interval_containment_join(p, i, "p", "s", "e", bucket_width=0)


def test_epoch_nanosecond_magnitudes_bucket_exactly(spark):
    """Regression for the double-division bucketing bug: at epoch-ns
    magnitudes (~1.7e18) float64 rounds (x - x%w)/w by enough to
    truncate into the WRONG bucket, silently dropping the pair. The
    integer `div` path must keep a point inside its interval at any
    long magnitude — probe points straddling bucket boundaries right
    where the float error bites."""
    base = 1_700_000_000_000_000_000  # ~2023 in epoch nanoseconds
    w = 3_600_000_000_000  # 1 hour in ns
    # points at and around a bucket boundary near `base`
    boundary = (base // w + 1) * w
    pts = [(i, p) for i, p in enumerate(
        [boundary - 1, boundary, boundary + 1, base + 12345]
    )]
    points = spark.createDataFrame(pts, ["pid", "p"])
    intervals = spark.createDataFrame(
        [(100, base, base + 10 * w)], ["iid", "lo", "hi"]
    )
    out = interval_containment_join(points, intervals, "p", "lo", "hi", w)
    assert sorted(r["pid"] for r in out.collect()) == [0, 1, 2, 3]
