"""Degenerate-input parity for the forecast family (ADVICE r10): on
short corpora (0/1/5/7/8/10/13/14/15 observed days) the engine and the
DuckDB oracle must agree BEHAVIORALLY — same rows where the oracle
emits rows (partial Holt-Winters init for 8-13 days), and an empty
frame where the oracle's output window is empty (never a raise).
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pytest

from mie_spark.queries import ORACLES, QUERIES


def _write_days(spark, tmp_path, n_days: int) -> str:
    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        (
            day,
            base + datetime.timedelta(days=day),
            1,
            "purchase",
            (5000 + 317 * day + (day * day * 73) % 1100) / 100.0,
            "{}",
        )
        for day in range(n_days)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )
    return str(tmp_path)


def _oracle_rows(sf_dir: str, name: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    res = con.execute(ORACLES[name])
    cols = [d[0] for d in res.description]
    return cols, res.fetchall()


def _assert_parity(spark, sf_dir: str, name: str) -> int:
    sdf = QUERIES[name](spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    d_cols, d_rows = _oracle_rows(sf_dir, name)
    assert sorted(s_cols) == sorted(d_cols), f"{name}: {s_cols} vs {d_cols}"

    def norm(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        return sorted((tuple(r[i] for i in order) for r in rows), key=repr)

    s, d = norm(s_rows, s_cols), norm(d_rows, d_cols)
    assert len(s) == len(d), f"{name}: {len(s)} rows vs oracle {len(d)}"
    for sr, dr in zip(s, d):
        for sv, dv in zip(sr, dr):
            if isinstance(sv, float) or isinstance(dv, float):
                assert sv is not None and dv is not None
                assert math.isclose(sv, dv, rel_tol=1e-9, abs_tol=1e-9)
            else:
                assert sv == dv, f"{name}: {sr} vs {dr}"
    return len(s)


@pytest.mark.parametrize("n_days", [0, 1, 5, 7, 8, 10, 13, 14, 16])
def test_hw_degenerate_mirrors_oracle(spark, tmp_path, n_days):
    """ev_forecast_hw: empty at <=7 days (first forecast is t=7), the
    PARTIAL week-2 init for 8-13 days, full init from 14 — always the
    oracle's exact rowset, never a raise."""
    sf_dir = _write_days(spark, tmp_path, n_days)
    n = _assert_parity(spark, sf_dir, "ev_forecast_hw")
    assert n == max(0, n_days - 7)


@pytest.mark.parametrize("n_days", [0, 1, 7, 14, 15, 16])
def test_backtest_degenerate_mirrors_oracle(spark, tmp_path, n_days):
    """ev_forecast_backtest: the scoring window t >= 14 is empty below
    15 observed days — engine returns the oracle's EMPTY result set,
    never a raise; 3 scorecard rows from 15 days up."""
    sf_dir = _write_days(spark, tmp_path, n_days)
    n = _assert_parity(spark, sf_dir, "ev_forecast_backtest")
    assert n == (3 if n_days >= 15 else 0)


@pytest.mark.parametrize("n_days", [0, 1, 2, 3])
def test_holt_degenerate_mirrors_oracle(spark, tmp_path, n_days):
    """ev_forecast_holt: 0 days -> empty; 1 day -> the CTE base case
    emits one row with NULL trend/forecast; >=2 days -> full rows."""
    sf_dir = _write_days(spark, tmp_path, n_days)
    sdf = QUERIES["ev_forecast_holt"](spark, sf_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    _, d_rows = _oracle_rows(sf_dir, "ev_forecast_holt")
    assert len(s_rows) == len(d_rows) == n_days
    if n_days == 1:
        assert s_rows[0][3] is None and s_rows[0][4] is None
    assert sorted(map(repr, s_rows)) == sorted(map(repr, d_rows))


@pytest.mark.parametrize("n_days", [0, 1, 3])
def test_profile_drift_degenerate_mirrors_oracle(spark, tmp_path, n_days):
    """dq_profile_drift (ADVICE r11): an empty snapshot must emit NULL
    ppm / NULL drift flags in BOTH engines, never a ZeroDivisionError.
    n_days=0 -> both snapshots empty (rows 0/0); n_days=1 -> the only
    event_id is 0, so event_id % 10 == 0 empties the PREV snapshot
    while curr has 1 row (the mixed branch: prev ppm NULL, curr ppm
    real, drift NULL); n_days=3 -> both populated, drift flags real."""
    sf_dir = _write_days(spark, tmp_path, n_days)
    n = _assert_parity(spark, sf_dir, "dq_profile_drift")
    assert n == 4  # one row per profiled column, even on empty input
    sdf = QUERIES["dq_profile_drift"](spark, sf_dir)
    rows = {r["col"]: r for r in sdf.collect()}
    r = rows["user_id"]
    if n_days == 0:
        assert r["null_ppm_prev"] is None and r["null_ppm_curr"] is None
        assert r["null_drift"] is None and r["uniq_drift"] is None
    elif n_days == 1:
        assert r["null_ppm_prev"] is None and r["null_ppm_curr"] == 0
        assert r["null_drift"] is None
    else:
        assert r["null_drift"] is not None and r["uniq_drift"] is not None


@pytest.mark.parametrize("n_days", [0, 1, 3])
def test_schema_drift_degenerate_mirrors_oracle(spark, tmp_path, n_days):
    """dq_schema_drift inherits the profile-drift empty-snapshot
    doctrine: either snapshot empty -> NULL ppm and NULL status in
    BOTH engines (a missing snapshot can't certify schema drift);
    populated snapshots -> real verdicts on every branch."""
    sf_dir = _write_days(spark, tmp_path, n_days)
    n = _assert_parity(spark, sf_dir, "dq_schema_drift")
    assert n == 4
    rows = {
        r["field"]: r
        for r in QUERIES["dq_schema_drift"](spark, sf_dir).collect()
    }
    if n_days in (0, 1):  # n_days=1: the only event_id is 0 -> prev empty
        assert all(r["status"] is None for r in rows.values())
        assert all(r["present_ppm_prev"] is None for r in rows.values())
    else:
        # the degenerate corpus writes props='{}', so the REAL field k
        # is genuinely absent from both snapshots — 'absent', not
        # 'stable' (which the graded corpora exercise)
        assert rows["k"]["status"] == "absent"
        assert rows["exp_flag"]["status"] == "added"
