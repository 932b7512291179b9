"""Semantic properties of the r11 experimentation/tokenizer operators
— what hash parity alone cannot pin: the A/A statistical behavior of
the sequential curve, its prefix-consistency with the single-verdict
test, and the batch/streaming twin equality of the tokenizer gate.
"""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_ab_sequential_final_day_equals_ab_test(spark):
    """The sequential curve's LAST day is exactly ev_ab_test's single
    verdict: same counts, same z, same significance — the curve is a
    strict refinement, not a parallel implementation (both route
    through the same md5 split and the same pooled-z expression)."""
    from mie_spark.queries import QUERIES

    curve = sorted(
        QUERIES["ev_ab_sequential"](spark, SF).collect(),
        key=lambda r: r["day"],
    )
    final = curve[-1]
    single = QUERIES["ev_ab_test"](spark, SF).collect()[0]
    assert (final["n1"], final["c1"], final["n2"], final["c2"]) == (
        single["n1"],
        single["c1"],
        single["n2"],
        single["c2"],
    )
    assert final["z"] == single["z"]
    assert final["crossed_naive"] == single["significant"]


def test_ab_sequential_prefix_monotonicity_and_guards(spark):
    """Cumulative counts are non-decreasing day over day, conversions
    never exceed entries per variant, and z/crossed are NULL exactly
    where the guard says (a variant not yet entered, pooled rate 0 or
    1) — the inf/NaN-free contract."""
    from mie_spark.queries import QUERIES

    rows = sorted(
        QUERIES["ev_ab_sequential"](spark, SF).collect(),
        key=lambda r: r["day"],
    )
    assert rows, "curve must cover the observed days"
    prev = None
    for r in rows:
        assert 0 <= r["c1"] <= r["n1"]
        assert 0 <= r["c2"] <= r["n2"]
        if prev is not None:
            assert r["n1"] >= prev["n1"] and r["n2"] >= prev["n2"]
            assert r["c1"] >= prev["c1"] and r["c2"] >= prev["c2"]
        degenerate = (
            r["n1"] == 0
            or r["n2"] == 0
            or r["c1"] + r["c2"] == 0
            or r["c1"] + r["c2"] == r["n1"] + r["n2"]
        )
        assert (r["z"] is None) == degenerate
        assert (r["crossed_naive"] is None) == degenerate
        # the flag compares the UNROUNDED z; only check against the
        # emitted (rounded) z away from the 1.96 boundary
        if r["z"] is not None and abs(abs(r["z"]) - 1.96) > 1e-6:
            assert r["crossed_naive"] == (abs(r["z"]) >= 1.96)
        prev = r


def test_tokenizer_drift_twins_agree_exactly(spark):
    """st_tokenizer_drift (state-store census) and
    pipe_tokenizer_drift (one-shot batch census) produce IDENTICAL
    rows — the twin contract, checked directly rather than via the
    shared oracle."""
    from mie_spark.queries import QUERIES

    batch = sorted(
        map(tuple, QUERIES["pipe_tokenizer_drift"](spark, SF).collect())
    )
    stream = sorted(
        map(tuple, QUERIES["st_tokenizer_drift"](spark, SF).collect())
    )
    assert batch == stream


def test_tokenizer_drift_rates_are_consistent(spark):
    """oov <= tok per snapshot, ppm fields reproduce the half-up
    formula from the emitted counts, and the drift flag matches the
    documented rule (delta rule for carried-over sources, absolute
    rule for sources new this crawl)."""
    from mie_spark.queries import QUERIES

    for r in QUERIES["pipe_tokenizer_drift"](spark, SF).collect():
        assert 0 <= r["oov_curr"] <= r["tok_curr"]
        assert 0 <= r["oov_prev"] <= r["tok_prev"]
        ppm_curr = (2 * r["oov_curr"] * 1_000_000 + r["tok_curr"]) // (
            2 * r["tok_curr"]
        )
        assert r["oov_ppm_curr"] == ppm_curr
        if r["tok_prev"] > 0:
            ppm_prev = (2 * r["oov_prev"] * 1_000_000 + r["tok_prev"]) // (
                2 * r["tok_prev"]
            )
            assert r["oov_ppm_prev"] == ppm_prev
            assert r["drift"] == (abs(ppm_curr - ppm_prev) >= 5000)
        else:
            assert r["oov_ppm_prev"] is None
            assert r["drift"] == (ppm_curr >= 5000)
