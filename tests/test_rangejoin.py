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
