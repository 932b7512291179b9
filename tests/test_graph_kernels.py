"""Closed-form kernel tests for the iterative graph operators on
crafted graphs — the oracle queries prove convergence on corpus-derived
graphs; these pin the semantics on adversarial shapes (chains that
exhaust the round budget, cores of known membership)."""

from __future__ import annotations

from mie_spark.operators.graph import kcore


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_kcore_triangle_with_tail(spark):
    """Triangle (1,2,3) + tail 3-4-5: the 2-core is exactly the
    triangle, each member at degree 2, and the tail peels over TWO
    rounds (5 first, then 4) — exercises the cascade, not just one
    pass."""
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)])
    got = {r["node"]: r["deg"] for r in kcore(e, k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_chain_peels_to_empty(spark):
    """A 6-node path has no 2-core; peeling strips one layer per round
    from each end (3 rounds) — must converge to empty within budget."""
    e = _edges(spark, [(i, i + 1) for i in range(1, 6)])
    assert kcore(e, k=2).count() == 0


def test_kcore_round_budget_is_exact(spark):
    """A 20-node path with rounds=2 must behave EXACTLY like two peel
    passes (ends trimmed twice, 15 interior edges left) — the bounded
    budget is part of the operator contract (the oracle unrolls the
    same number of rounds), not a best-effort hint."""
    e = _edges(spark, [(i, i + 1) for i in range(1, 20)])
    got = {r["node"] for r in kcore(e, k=2, rounds=2).collect()}
    assert got == set(range(3, 19))


def test_kcore_keeps_whole_clique(spark):
    """K5 is its own 4-core: nothing peels, early exit on round 1."""
    pairs = [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]
    got = {r["node"]: r["deg"] for r in kcore(_edges(spark, pairs), k=4).collect()}
    assert got == {n: 4 for n in range(1, 6)}


def test_kcore_empty_edges(spark):
    e = spark.createDataFrame([], "src long, dst long")
    assert kcore(e, k=2).count() == 0
