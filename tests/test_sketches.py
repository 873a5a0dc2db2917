"""HLL distinct-count sketch rollups (operators/sketches.py)."""

import pytest
from pyspark.sql import functions as F

from aws_glue_cdc_metrics_job_spark.operators.sketches import (
    distinct_sketch,
    estimate,
    rollup_sketches,
)
from aws_glue_cdc_metrics_job_spark.sources import read_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return read_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    ).withColumn("week", F.date_trunc("week", "ts").cast("date"))


def test_estimate_within_error_bound(events):
    daily = estimate(distinct_sketch(events, ["day"], "user_id"))
    exact = events.groupBy("day").agg(F.countDistinct("user_id").alias("EXACT"))
    joined = daily.join(exact, "day").collect()
    assert joined
    for r in joined:
        # lg_k=12 -> rse ~1.6%; allow 5% (150 users/day at sf0.001 is tiny)
        assert abs(r["APPROX_DISTINCT"] - r["EXACT"]) <= max(3, 0.05 * r["EXACT"])


def test_union_rollup_equals_direct_sketch(events):
    """Union of daily sketches == sketching the raw week directly: rollups
    answered from the stored sketch zone agree with a from-raw rebuild."""
    daily = distinct_sketch(events, ["week", "day"], "user_id")
    weekly_from_daily = rollup_sketches(daily, ["week"])
    weekly_direct = estimate(distinct_sketch(events, ["week"], "user_id"))
    a = {r["week"]: r["APPROX_DISTINCT"] for r in weekly_from_daily.collect()}
    b = {r["week"]: r["APPROX_DISTINCT"] for r in weekly_direct.collect()}
    assert a == b


def test_no_distinct_expand_in_plan(events):
    """The sketch aggregation must be partial+final (map-side collapse),
    never the exact-distinct Expand shape."""
    plan = (
        distinct_sketch(events, ["day"], "user_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" not in plan, plan
    assert "partial_hll_sketch_agg" in plan, plan


def test_compact_parquet_dir(spark, tmp_path):
    import glob

    from aws_glue_cdc_metrics_job_spark.sources.parquet_io import compact_parquet_dir

    path = str(tmp_path / "zone")
    # simulate many micro-batch appends -> many small files
    for i in range(5):
        spark.range(i * 100, (i + 1) * 100).repartition(4).write.mode("append").parquet(path)
    before = len(glob.glob(path + "/part-*.parquet"))
    assert before >= 20
    n = compact_parquet_dir(spark, path, target_file_bytes=1 << 30)
    after = glob.glob(path + "/part-*.parquet")
    assert len(after) == n == 1
    got = sorted(r["id"] for r in spark.read.parquet(path).collect())
    assert got == list(range(500))
