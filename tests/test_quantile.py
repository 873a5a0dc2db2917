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


def test_label_arity_validated(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "x double")
    with pytest.raises(ValueError):
        quantile_bucket(df, "x", [0.5], ["a", "b", "c"])
