"""BI-edge helpers vs their pandas equivalents."""

import pandas as pd

from aws_glue_cdc_metrics_job_spark import bi


def test_distribution_matches_value_counts(spark):
    data = ["VIP", "Standard", "Standard", "New", "Standard", "VIP"]
    df = spark.createDataFrame([(s,) for s in data], "SEGMENT string")
    got = [(r["SEGMENT"], r["N"]) for r in bi.distribution(df, "SEGMENT").collect()]
    vc = pd.Series(data).value_counts()
    assert got == [("Standard", 3), ("VIP", 2), ("New", 1)]
    assert dict(got) == vc.to_dict()


def test_label_flags_maps_and_nulls(spark):
    df = spark.createDataFrame([(True,), (False,), (None,)], "IS_LOYALTY boolean")
    got = [r["LABEL"] for r in bi.label_flags(
        df, "IS_LOYALTY", {True: "Loyalty", False: "Non-Loyalty"}, "LABEL"
    ).collect()]
    assert sorted(got, key=str) == ["Loyalty", "Non-Loyalty", None]


def test_top_ranked(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "REVENUE_RANK int, x string")
    assert [r["x"] for r in bi.top_ranked(df, "REVENUE_RANK").collect()] == ["a"]
    assert {r["x"] for r in bi.top_ranked(df, "REVENUE_RANK", k=2).collect()} == {"a", "b"}


def test_to_pandas_roundtrip(spark):
    df = spark.createDataFrame([(1, 2.5), (2, 3.5)], "a int, b double")
    pdf = bi.to_pandas(df)
    assert isinstance(pdf, pd.DataFrame)
    assert pdf.sort_values("a")["b"].tolist() == [2.5, 3.5]
