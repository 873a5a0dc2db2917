"""BI-edge helpers: the engine-side counterpart of the reference's
Streamlit dashboard layer (streamlit_app/app.py).

The reference's consumer globs gold parquet into pandas and re-aggregates
there (value_counts / groupby / map / sort_values, SURVEY.md A9/F10/T2/S11).
Here those presentation aggregations run in Spark -- at 100 TB the mart may
be small but the pattern should not depend on it -- and only the final
frame crosses to pandas via Arrow (`to_pandas`), the single sanctioned
pandas round-trip in the engine (SURVEY.md S10)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_mart(spark: SparkSession, path: str) -> DataFrame:
    """Read one gold mart (the marts are flat, partition-pruned parquet --
    the engine's contract with any BI tool, SURVEY.md S11)."""
    return spark.read.parquet(path)


def to_pandas(df: DataFrame):
    """Arrow-batched export at the BI edge (enabled in session.py).
    Keep this at the very end of a plan: everything before it is
    distributed, everything after is driver-local pandas."""
    return df.toPandas()


def distribution(df: DataFrame, col: str, n_col: str = "N") -> DataFrame:
    """pandas ``value_counts`` equivalent (streamlit_app/app.py:58):
    grouped count, largest first, with a deterministic tiebreak."""
    return df.groupBy(col).agg(F.count(F.lit(1)).alias(n_col)).orderBy(
        F.col(n_col).desc(), F.col(col)
    )


def label_flags(df: DataFrame, col: str, mapping: dict, out_col: str | None = None) -> DataFrame:
    """pandas ``Series.map({...})`` equivalent (streamlit_app/app.py:240,334):
    literal-map lookup, unmapped values pass through as NULL."""
    kv = []
    for k, v in mapping.items():
        kv += [F.lit(k), F.lit(v)]
    return df.withColumn(out_col or col, F.element_at(F.create_map(*kv), F.col(col)))


def top_ranked(df: DataFrame, rank_col: str, k: int = 1) -> DataFrame:
    """Presentation top-k by a precomputed rank column
    (streamlit_app/app.py:290 REVENUE_RANK == 1)."""
    return df.filter(F.col(rank_col) <= k)


# ---- Per-tab KPI summaries -------------------------------------------------
# One builder per dashboard tab, computing in Spark exactly the pandas
# aggregations each tab performs on its gold mart (SURVEY.md A9). Every
# builder returns a small DataFrame meant for `to_pandas` at the edge.


def clv_kpis(segment: DataFrame) -> DataFrame:
    """Tab 1 metric row (streamlit_app/app.py:45-48): customer count, mean
    CLV, count of High-group customers."""
    return segment.agg(
        F.countDistinct("USER_ID").alias("TOTAL_CUSTOMERS"),
        F.avg("CUMULATIVE_LTV").alias("AVG_CLV"),
        F.countDistinct(F.when(F.col("CLV_GROUP") == "High", F.col("USER_ID"))).alias(
            "HIGH_VALUE_CUSTOMERS"
        ),
    )


def rfm_kpis(rfm: DataFrame) -> DataFrame:
    """Tab 2 metric row (app.py:96-99)."""
    return rfm.agg(
        F.countDistinct("USER_ID").alias("TOTAL_CUSTOMERS"),
        F.avg("RECENCY").alias("AVG_RECENCY"),
        F.avg("FREQUENCY").alias("AVG_FREQUENCY"),
        F.avg("MONETARY").alias("AVG_MONETARY"),
    )


def rfm_segment_summary(rfm: DataFrame) -> DataFrame:
    """Tab 2 segment-level table (app.py:120-126): per-segment customer
    count and rounded mean R/F/M."""
    return rfm.groupBy("SEGMENT").agg(
        F.count("USER_ID").alias("CUSTOMERS"),
        F.round(F.avg("RECENCY"), 2).alias("RECENCY"),
        F.round(F.avg("FREQUENCY"), 2).alias("FREQUENCY"),
        F.round(F.avg("MONETARY"), 2).alias("MONETARY"),
    )


def churn_kpis(churn: DataFrame) -> DataFrame:
    """Tab 3 metric row (app.py:147-150); PCT_SPEND_CHANGE nulls count as 0
    in the mean, exactly like the dashboard's fillna(0)."""
    return churn.agg(
        F.countDistinct("USER_ID").alias("TOTAL_CUSTOMERS"),
        F.avg("DAYS_SINCE_LAST_ORDER").alias("AVG_DAYS_SINCE_LAST_ORDER"),
        F.avg("AVG_ORDER_GAP_DAYS").alias("AVG_ORDER_GAP"),
        F.avg(F.coalesce(F.col("PCT_SPEND_CHANGE"), F.lit(0.0))).alias("AVG_PCT_SPEND_CHANGE"),
    )


def daily_revenue_series(daily: DataFrame) -> DataFrame:
    """Tab 4 daily line series (app.py:206-208): total revenue per date
    across whatever other grouping columns the mart carries."""
    return daily.groupBy("CREATION_DATE").agg(
        F.sum("DAILY_REVENUE").alias("DAILY_REVENUE")
    ).orderBy("CREATION_DATE")


def loyalty_labeled(loyalty: DataFrame) -> DataFrame:
    """Tab 5 label mapping (app.py:240)."""
    return label_flags(loyalty, "IS_LOYALTY", {True: "Loyalty Member", False: "Non-Member"})


def location_top(location: DataFrame) -> DataFrame:
    """Tab 6 top-location metric row (app.py:289-294)."""
    return top_ranked(location, "REVENUE_RANK", 1).select(
        "RESTAURANT_ID", "TOTAL_REVENUE", "ORDERS_PER_DAY"
    )


def discount_labeled(discount: DataFrame) -> DataFrame:
    """Tab 7 label mapping (app.py:334)."""
    return label_flags(
        discount, "IS_DISCOUNTED_ORDER", {"Yes": "Discounted", "No": "Full Price"}
    )
