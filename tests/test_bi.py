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


def test_clv_kpis_match_pandas(spark):
    rows = [(1, 100.0, "High"), (2, 50.0, "Medium"), (3, 10.0, "Low"), (4, 200.0, "High")]
    df = spark.createDataFrame(rows, "USER_ID long, CUMULATIVE_LTV double, CLV_GROUP string")
    got = bi.clv_kpis(df).collect()[0]
    pdf = pd.DataFrame(rows, columns=["USER_ID", "CUMULATIVE_LTV", "CLV_GROUP"])
    assert got["TOTAL_CUSTOMERS"] == pdf["USER_ID"].nunique()
    assert got["AVG_CLV"] == pdf["CUMULATIVE_LTV"].mean()
    assert got["HIGH_VALUE_CUSTOMERS"] == pdf[pdf["CLV_GROUP"] == "High"]["USER_ID"].nunique()


def test_rfm_summaries_match_pandas(spark):
    rows = [(1, 5, 2, 30.0, "VIP"), (2, 40, 1, 10.0, "At Risk"), (3, 7, 3, 55.0, "VIP")]
    cols = ["USER_ID", "RECENCY", "FREQUENCY", "MONETARY", "SEGMENT"]
    df = spark.createDataFrame(rows, "USER_ID long, RECENCY long, FREQUENCY long, MONETARY double, SEGMENT string")
    pdf = pd.DataFrame(rows, columns=cols)
    k = bi.rfm_kpis(df).collect()[0]
    assert k["TOTAL_CUSTOMERS"] == 3
    assert k["AVG_RECENCY"] == pdf["RECENCY"].mean()
    seg = {r["SEGMENT"]: (r["CUSTOMERS"], r["RECENCY"], r["MONETARY"]) for r in bi.rfm_segment_summary(df).collect()}
    want = pdf.groupby("SEGMENT").agg(
        CUSTOMERS=("USER_ID", "count"), RECENCY=("RECENCY", "mean"), MONETARY=("MONETARY", "mean")
    ).round(2)
    for s, row in want.iterrows():
        assert seg[s] == (row["CUSTOMERS"], row["RECENCY"], row["MONETARY"])


def test_churn_kpis_fillna_semantics(spark):
    df = spark.createDataFrame(
        [(1, 3, 2.0, 10.0), (2, 9, 4.0, None)],
        "USER_ID long, DAYS_SINCE_LAST_ORDER long, AVG_ORDER_GAP_DAYS double, PCT_SPEND_CHANGE double",
    )
    got = bi.churn_kpis(df).collect()[0]
    assert got["AVG_DAYS_SINCE_LAST_ORDER"] == 6.0
    # dashboard fillna(0).mean(): (10 + 0) / 2, not pandas' null-skipping 10
    assert got["AVG_PCT_SPEND_CHANGE"] == 5.0


def test_daily_revenue_series_sums_over_groups(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [(dt.date(2024, 1, 1), "pizza", 10.0), (dt.date(2024, 1, 1), "salad", 5.0), (dt.date(2024, 1, 2), "pizza", 7.0)],
        "CREATION_DATE date, ITEM_CATEGORY string, DAILY_REVENUE double",
    )
    got = [(str(r["CREATION_DATE"]), r["DAILY_REVENUE"]) for r in bi.daily_revenue_series(df).collect()]
    assert got == [("2024-01-01", 15.0), ("2024-01-02", 7.0)]


def test_loyalty_and_discount_labels(spark):
    loy = spark.createDataFrame([(True,), (False,)], "IS_LOYALTY boolean")
    assert {r["IS_LOYALTY"] for r in bi.loyalty_labeled(loy).collect()} == {
        "Loyalty Member", "Non-Member"
    }
    dis = spark.createDataFrame([("Yes",), ("No",)], "IS_DISCOUNTED_ORDER string")
    assert {r["IS_DISCOUNTED_ORDER"] for r in bi.discount_labeled(dis).collect()} == {
        "Discounted", "Full Price"
    }


def test_location_top_row(spark):
    df = spark.createDataFrame(
        [(1, 100, 500.0, 3.2, 10), (2, 200, 300.0, 2.0, 5)],
        "REVENUE_RANK int, RESTAURANT_ID int, TOTAL_REVENUE double, ORDERS_PER_DAY double, NUM_ORDERS int",
    )
    got = bi.location_top(df).collect()
    assert len(got) == 1 and got[0]["RESTAURANT_ID"] == 100
