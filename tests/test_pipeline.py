"""End-to-end medallion pipeline: bronze CDC -> silver -> gold over two
incremental runs on reference-shaped fixtures (FIXTURES.md §A)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from aws_glue_cdc_metrics_job_spark.pipeline import REFERENCE_TABLES, CdcPipeline, TableSpec
from aws_glue_cdc_metrics_job_spark.session import Clock
from aws_glue_cdc_metrics_job_spark.sources import MedallionLayout, read_parquet
from aws_glue_cdc_metrics_job_spark.state import WatermarkStore

D = dt.datetime

ITEM_SCHEMA = (
    "ORDER_ID string, LINEITEM_ID string, USER_ID string, RESTAURANT_ID string, "
    "ITEM_CATEGORY string, IS_LOYALTY boolean, ITEM_PRICE string, CREATION_TIME_UTC timestamp"
)
OPT_SCHEMA = "ORDER_ID string, LINEITEM_ID string, OPTION_NAME string, OPTION_PRICE string"

ITEMS_R1 = [
    ("o1", "1", "u1", "r1", "pizza", True, "10.0", D(2024, 1, 1, 12)),
    ("o1", "1", "u1", "r1", "pizza", True, "10.0", D(2024, 1, 1, 12)),  # raw duplicate
    ("o1", "2", "u1", "r1", "drink", True, "2.0", D(2024, 1, 1, 12)),
    ("o2", "1", "u2", "r2", "salad", False, "8.0", D(2024, 1, 2, 9)),
]
OPTS_R1 = [
    ("o1", "1", "cheese", "1.5"),
    ("o1", "1", "coupon", "-2.0"),
]
ITEMS_R2 = [  # one genuinely new order + one replay below the watermark
    ("o3", "1", "u1", "r1", "pizza", True, "20.0", D(2024, 1, 5, 18)),
    ("o2", "1", "u2", "r2", "salad", False, "8.0", D(2024, 1, 2, 9)),
]
OPTS_R2 = [  # cheese price changed (update), coupon removed (delete), new dressing (insert)
    ("o1", "1", "cheese", "1.75"),
    ("o3", "1", "dressing", "0.5"),
]

# The reference's three-table config (scripts/cdc_metrics_job.py:41-46),
# including date_dim's dedicated silver variant (:194-215).
TABLES = REFERENCE_TABLES
assert [t.name for t in TABLES] == ["order_items", "order_item_options", "date_dim"]

DATE_SCHEMA = "date_key string, day_of_week int"
DATES_R1 = [("2024-01-01", 1), ("2024-01-02", 2)]
DATES_R2 = DATES_R1 + [("2024-01-05", 5)]  # one new calendar row


@pytest.fixture(scope="module")
def pipeline_runs(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("medallion"))
    layout = MedallionLayout(root)
    store = WatermarkStore(f"{root}/state.json")

    def mk_pipeline(day):
        return CdcPipeline(spark, layout, store, Clock.fixed(day), TABLES)

    def src(items, opts, dates):
        frames = {
            "order_items": spark.createDataFrame(items, ITEM_SCHEMA),
            "order_item_options": spark.createDataFrame(opts, OPT_SCHEMA),
            "date_dim": spark.createDataFrame(dates, DATE_SCHEMA),
        }
        return lambda name: frames[name]

    p1 = mk_pipeline("2024-01-03T00:00:00")
    p1.run_all(src(ITEMS_R1, OPTS_R1, DATES_R1))
    changes1 = {
        t: read_parquet(spark, layout.cdc(t, "2024-01-03")).collect()
        for t in ("order_items", "order_item_options", "date_dim")
    }
    p2 = mk_pipeline("2024-01-06T00:00:00")
    changes2_frames = p2.run_bronze(src(ITEMS_R2, OPTS_R2, DATES_R2))
    changes2 = {t: df.collect() for t, df in changes2_frames.items()}
    p2.run_silver()
    p2.build_order_revenue("order_items", "order_item_options")
    p2.run_gold()
    return spark, layout, store, changes1, changes2


def test_bronze_dedups_raw_extract(pipeline_runs):
    spark, layout, *_ = pipeline_runs
    raw = read_parquet(spark, layout.bronze("order_items", "2024-01-03"))
    assert raw.count() == 3  # the duplicate raw row collapsed


def test_run1_changes_are_all_inserts(pipeline_runs):
    *_, changes1, _ = pipeline_runs
    assert {r["cdc_action"] for r in changes1["order_items"]} == {"insert"}
    assert {r["cdc_action"] for r in changes1["order_item_options"]} == {"insert"}
    assert len(changes1["order_item_options"]) == 2


def test_run2_snapshot_diff_actions(pipeline_runs):
    *_, changes2 = pipeline_runs
    by_action = {}
    for r in changes2["order_item_options"]:
        by_action.setdefault(r["cdc_action"], set()).add((r["ORDER_ID"], r["OPTION_NAME"]))
    assert by_action == {
        "insert": {("o3", "dressing")},
        "update": {("o1", "cheese")},
        "delete": {("o1", "coupon")},
    }


def test_run2_watermarked_table_at_least_once(pipeline_runs):
    *_, changes2 = pipeline_runs
    items = changes2["order_items"]
    # bronze reads >= the watermark (the reference's :64 semantics), so the
    # o2 replay sitting exactly at the mark re-enters -- at-least-once by
    # design; silver's strictly-greater date filter drops it again (C4),
    # asserted in test_silver_accumulates_across_runs.
    assert {(r["ORDER_ID"], r["cdc_action"]) for r in items} == {
        ("o2", "insert"),
        ("o3", "insert"),
    }


def test_watermarks_advanced(pipeline_runs):
    _, _, store, _, _ = pipeline_runs
    assert store.get("bronze/order_items") == "2024-01-05 18:00:00"
    assert store.get("silver/order_items") == "2024-01-05"


def test_silver_accumulates_across_runs(pipeline_runs):
    spark, layout, *_ = pipeline_runs
    silver = read_parquet(spark, layout.silver("order_items"))
    assert {r["ORDER_ID"] for r in silver.collect()} == {"o1", "o2", "o3"}
    assert silver.count() == 4
    assert dict(silver.dtypes)["ITEM_PRICE"] == "double"


def test_snapshot_matches_current_source(pipeline_runs):
    spark, layout, *_ = pipeline_runs
    snap = read_parquet(spark, layout.snapshot("order_item_options"))
    got = {(r["ORDER_ID"], r["OPTION_NAME"]): r["OPTION_PRICE"] for r in snap.collect()}
    assert got == {("o1", "cheese"): "1.75", ("o3", "dressing"): "0.5"}


def test_gold_ltv_consistent_with_silver_revenue(pipeline_runs):
    spark, layout, *_ = pipeline_runs
    from aws_glue_cdc_metrics_job_spark.plans import marts

    revenue = read_parquet(spark, layout.silver("order_revenue"))
    expected = {
        (r["USER_ID"], str(r["CREATION_DATE"])): (r["DAILY_REVENUE"], r["CUMULATIVE_LTV"])
        for r in marts.fact_ltv_daily(revenue).collect()
    }
    got = {
        (r["USER_ID"], str(r["CREATION_DATE"])): (r["DAILY_REVENUE"], r["CUMULATIVE_LTV"])
        for r in read_parquet(spark, layout.gold("fact_ltv_daily")).collect()
    }
    assert got == expected
    # u1: o1 lines (10 + 1.75 cheese, 2.0) on Jan1, o3 (20 + 0.5) on Jan5
    assert got[("u1", "2024-01-01")] == (13.75, 13.75)
    assert got[("u1", "2024-01-05")] == (20.5, 34.25)


def test_date_dim_silver_accumulates_and_watermark_advances(pipeline_runs):
    # the reference's process_silver_date_dim variant (:194-215): run 1
    # conforms both seed dates, run 2 appends only the strictly-newer one
    spark, layout, store, changes1, changes2 = pipeline_runs
    assert {r["date_key"] for r in changes1["date_dim"]} == {"2024-01-01", "2024-01-02"}
    assert {(r["date_key"], r["cdc_action"]) for r in changes2["date_dim"]} == {
        ("2024-01-05", "insert")
    }
    silver = read_parquet(spark, layout.silver("date_dim"))
    got = {(r["date_key"], str(r["CREATION_DATE"])) for r in silver.collect()}
    assert got == {
        ("2024-01-01", "2024-01-01"),
        ("2024-01-02", "2024-01-02"),
        ("2024-01-05", "2024-01-05"),
    }
    assert store.get("silver/date_dim") == "2024-01-05"


def test_cdc_log_partitioned_by_action(pipeline_runs):
    import os

    _, layout, *_ = pipeline_runs
    path = layout.cdc("order_item_options", "2024-01-06")
    parts = {d for d in os.listdir(path) if d.startswith("cdc_action=")}
    assert parts == {"cdc_action=insert", "cdc_action=update", "cdc_action=delete"}


def test_all_gold_marts_written(pipeline_runs):
    spark, layout, *_ = pipeline_runs
    for mart in [
        "fact_ltv_daily",
        "mart_customer_ltv_snapshot",
        "mart_customer_clv_segment",
        "mart_customer_rfm",
        "mart_customer_churn_profile",
        "mart_sales_trends_daily",
        "mart_sales_trends_weekly",
        "mart_sales_trends_monthly",
        "mart_sales_trends_hourly",
        "mart_loyalty_program_impact",
        "mart_location_performance",
        "mart_discount_effectiveness",
    ]:
        assert read_parquet(spark, layout.gold(mart)).count() > 0, mart
