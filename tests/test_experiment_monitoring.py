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


def test_ab_boundary_refines_sequential_curve(spark):
    """ev_ab_boundary (VERDICT r11 item #6) against the curve it
    monitors: same prefix census per day as ev_ab_sequential; at full
    information (the final day, info_ppm == 1e6) the OBF rule
    b(1) = 1.96 collapses to the naive threshold, so crossed_obf must
    equal crossed_naive there; earlier days are strictly MORE
    conservative (crossed_obf => crossed_naive, never the reverse);
    first_crossing marks exactly the earliest crossed day."""
    from mie_spark.queries import QUERIES

    seq = {
        r["day"]: r for r in QUERIES["ev_ab_sequential"](spark, SF).collect()
    }
    bnd = sorted(
        QUERIES["ev_ab_boundary"](spark, SF).collect(), key=lambda r: r["day"]
    )
    assert set(seq) == {r["day"] for r in bnd}
    for r in bnd:
        s = seq[r["day"]]
        assert (r["n1"], r["c1"], r["n2"], r["c2"]) == (
            s["n1"], s["c1"], s["n2"], s["c2"],
        )
        # info fraction is a half-up ppm of cumulative/final enrollment
        assert 0 < r["info_ppm"] <= 1_000_000
        # the boundary only ever stops when the naive rule would too
        if r["crossed_obf"]:
            assert s["crossed_naive"] is True
        # NULL guard is shared: both engines' guards are the same text
        assert (r["crossed_obf"] is None) == (s["crossed_naive"] is None)
    final = bnd[-1]
    assert final["info_ppm"] == 1_000_000
    assert final["crossed_obf"] == seq[final["day"]]["crossed_naive"]
    crossed_days = [r["day"] for r in bnd if r["crossed_obf"]]
    flagged = [r["day"] for r in bnd if r["first_crossing"]]
    assert flagged == (crossed_days[:1] if crossed_days else [])
