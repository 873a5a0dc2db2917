"""Rolling-window anomaly detection (operators/monitoring.py)."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from aws_glue_cdc_metrics_job_spark.operators.monitoring import rolling_zscore


@pytest.fixture(scope="module")
def series(spark):
    base = dt.date(2024, 1, 1)
    vals = [10.0, 11.0, 9.0, 10.5, 10.0, 9.5, 10.2, 10.1, 50.0, 10.3]
    rows = [("m1", base + dt.timedelta(days=i), v) for i, v in enumerate(vals)]
    rows += [("m2", base + dt.timedelta(days=i), 5.0) for i in range(10)]  # flat
    return spark.createDataFrame(rows, "k string, d date, v double")


def _score(series, **kw):
    return rolling_zscore(series, ["k"], "d", "v", n=7, **kw)


def test_spike_flagged_and_matches_numpy(series):
    out = {
        (r["k"], r["d"].isoformat()): r for r in _score(series).collect()
    }
    spike = out[("m1", "2024-01-09")]
    window = np.array([11.0, 9.0, 10.5, 10.0, 9.5, 10.2, 10.1])  # 7 prior
    want_z = (50.0 - window.mean()) / window.std(ddof=1)
    assert spike["IS_ANOMALY"] == 1
    assert abs(spike["ZSCORE"] - want_z) < 1e-6
    assert spike["N_PRIOR"] == 7
    # the day after the spike: window now CONTAINS the spike, so variance
    # explodes and the normal value is not flagged
    assert out[("m1", "2024-01-10")]["IS_ANOMALY"] == 0


def test_warmup_rows_null(series):
    out = [r for r in _score(series).collect() if r["k"] == "m1"]
    for r in sorted(out, key=lambda r: r["d"])[:7]:
        assert r["ZSCORE"] is None and r["IS_ANOMALY"] == 0


def test_zero_variance_null(series):
    for r in (r for r in _score(series).collect() if r["k"] == "m2"):
        assert r["ZSCORE"] is None and r["IS_ANOMALY"] == 0


def test_min_periods(series):
    out = [
        r
        for r in _score(series, min_periods=3).collect()
        if r["k"] == "m1" and r["N_PRIOR"] >= 3 and r["STD_PRIOR"] and r["STD_PRIOR"] > 0
    ]
    assert all(r["ZSCORE"] is not None for r in out)


def test_single_window_operator(series):
    plan = _score(series)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Window [") == 1, plan


# --- round-6b: deviation-from-independence matrix ----------------------------


def test_independence_matrix_hand_checked(spark):
    from aws_glue_cdc_metrics_job_spark.operators.monitoring import independence_matrix

    # perfectly independent 2x2: every deviation is ~0 (ppm flooring only)
    rows = [("x", 1)] * 4 + [("x", 2)] * 4 + [("y", 1)] * 4 + [("y", 2)] * 4
    df = spark.createDataFrame(rows, "a string, b long")
    out = independence_matrix(df, "a", "b").collect()
    assert len(out) == 4
    for r in out:
        assert r["N_OBSERVED"] == 4
        assert abs(r["DEV_PPM"]) <= 2  # 250000*250000 flooring residue
        assert abs(r["EXPECTED_PPM"] - 250_000) <= 2


def test_independence_matrix_zero_cells_and_association(spark):
    from aws_glue_cdc_metrics_job_spark.operators.monitoring import independence_matrix

    # perfectly ASSOCIATED: x only with 1, y only with 2 -> the grid still
    # carries the zero cells, with strongly negative deviations
    rows = [("x", 1)] * 5 + [("y", 2)] * 5
    df = spark.createDataFrame(rows, "a string, b long")
    got = {
        (r["A"], r["B"]): (r["N_OBSERVED"], r["DEV_PPM"])
        for r in independence_matrix(df, "a", "b").collect()
    }
    assert len(got) == 4
    assert got[("x", 1)][0] == 5 and got[("x", 2)][0] == 0
    # observed 500000 ppm vs expected 250000 -> +250000; zero cells -250000
    assert got[("x", 1)][1] == 250_000
    assert got[("x", 2)][1] == -250_000
    assert got[("y", 1)][1] == -250_000
