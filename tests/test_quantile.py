"""Exact-quantile bucketing vs pandas qcut (SURVEY.md Q1, the reference's
pd.qcut at scripts/cdc_metrics_job.py:256-266)."""

import pandas as pd
import pytest

from aws_glue_cdc_metrics_job_spark.functions.quantile import (
    exact_quantile_cuts,
    quantile_bucket,
)


@pytest.fixture(scope="module")
def values():
    # deterministic, includes duplicates and an uneven spread
    return [float(v) for v in [1, 2, 2, 3, 5, 8, 13, 21, 34, 55, 89, 144, 233, 1000]]


def test_cuts_match_pandas_interpolation(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "x double")
    cuts = exact_quantile_cuts(df, "x", [0.2, 0.8]).collect()[0]
    expected = pd.Series(values).quantile([0.2, 0.8], interpolation="linear")
    assert cuts["q0"] == pytest.approx(expected.iloc[0])
    assert cuts["q1"] == pytest.approx(expected.iloc[1])


def test_buckets_match_qcut(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "x double")
    got = {
        r["x"]: r["CLV"]
        for r in quantile_bucket(df, "x", [0.2, 0.8], ["Low", "Medium", "High"], "CLV").collect()
    }
    expected = dict(
        zip(values, pd.qcut(pd.Series(values), q=[0, 0.2, 0.8, 1.0], labels=["Low", "Medium", "High"]))
    )
    assert got == expected


def test_approx_buckets_bounded_drift_vs_exact(spark, values):
    # The scale path (exact=False): approx_percentile returns a REAL data
    # value (rank-based, no interpolation), so labels may legitimately
    # differ from the exact interpolated path -- but ONLY for values lying
    # between the exact and approx cut for the same bin edge. Anything
    # outside those slivers must agree.
    from aws_glue_cdc_metrics_job_spark.functions.quantile import approx_quantile_cuts

    df = spark.createDataFrame([(v,) for v in values], "x double")
    probs, labels = [0.2, 0.8], ["Low", "Medium", "High"]
    exact = {
        r["x"]: r["CLV"]
        for r in quantile_bucket(df, "x", probs, labels, "CLV").collect()
    }
    approx = {
        r["x"]: r["CLV"]
        for r in quantile_bucket(df, "x", probs, labels, "CLV", exact=False).collect()
    }
    e = exact_quantile_cuts(df, "x", probs).collect()[0]
    a = approx_quantile_cuts(df, "x", probs).collect()[0]
    slivers = [
        (min(e[f"q{i}"], a[f"q{i}"]), max(e[f"q{i}"], a[f"q{i}"]))
        for i in range(len(probs))
    ]
    disagreements = {v for v in exact if exact[v] != approx[v]}
    for v in disagreements:
        assert any(lo < v <= hi or lo <= v < hi for lo, hi in slivers), (
            f"value {v} changed bucket ({exact[v]} -> {approx[v]}) but lies in "
            f"no exact-vs-approx cut sliver {slivers}"
        )
    # and the drift must not be total: most values agree
    assert len(disagreements) < len(values) / 2


def test_label_arity_validated(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "x double")
    with pytest.raises(ValueError):
        quantile_bucket(df, "x", [0.5], ["a", "b", "c"])


def test_winsorize_grouped_clip(spark):
    from aws_glue_cdc_metrics_job_spark.functions.quantile import winsorize

    rows = [("a", float(v)) for v in range(1, 101)] + [("b", 1000.0), ("b", 2000.0), ("b", 3000.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = winsorize(df, "v", lower=0.05, upper=0.95, group_cols=["g"])
    a = [r for r in out.collect() if r["g"] == "a"]
    # bounds are the interpolated p05/p95 of 1..100
    assert a[0]["LO_BOUND"] == 5.95 and a[0]["HI_BOUND"] == 95.05
    vals = sorted(r["v_W"] for r in a)
    assert vals[0] == 5.95 and vals[-1] == 95.05
    assert vals[10] == 11.0  # interior values untouched
    b = {r["v"]: r["v_W"] for r in out.collect() if r["g"] == "b"}
    assert b[1000.0] == 1100.0 and b[3000.0] == 2900.0  # p05/p95 of 3 points
    # approx path agrees on the fixture within the sketch contract (real data values)
    approx = winsorize(df, "v", lower=0.05, upper=0.95, group_cols=["g"], exact=False)
    arow = [r for r in approx.collect() if r["g"] == "a"][0]
    assert 1 <= arow["LO_BOUND"] <= 11 and 90 <= arow["HI_BOUND"] <= 100
