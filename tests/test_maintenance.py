"""Incremental aggregate maintenance (operators/maintenance.py): refreshing
a SUM/COUNT mart from a CDC change set alone must match a full recompute —
including key-migrating updates, group disappearance, and new groups."""

import pytest
from pyspark.sql import functions as F

from aws_glue_cdc_metrics_job_spark.operators.cdc import cdc_diff
from aws_glue_cdc_metrics_job_spark.operators.maintenance import (
    aggregate_snapshot,
    incremental_agg_update,
)


@pytest.fixture(scope="module")
def snapshots(spark):
    prev = spark.createDataFrame(
        [
            # key, group, amount
            (1, "a", 10.0),
            (2, "a", 20.0),
            (3, "b", 5.0),
            (4, "b", 7.0),
            (5, "c", 100.0),  # group c: single row, will be deleted
        ],
        "k long, g string, amt double",
    )
    cur = spark.createDataFrame(
        [
            (1, "a", 10.0),   # unchanged
            (2, "b", 20.0),   # update: migrates a -> b
            (3, "b", 8.0),    # update: amount change in place
            (4, "b", 7.0),    # unchanged
            # 5 deleted -> group c disappears
            (6, "d", 50.0),   # insert -> new group d
        ],
        "k long, g string, amt double",
    )
    return prev, cur


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_incremental_matches_recompute(spark, snapshots):
    prev, cur = snapshots
    prev_agg = aggregate_snapshot(prev, ["g"], ["amt"], decimal_scale=2)
    changes = cdc_diff(cur, prev, pks=["k"], with_old_image=True)
    maintained = incremental_agg_update(
        prev_agg, changes, ["g"], ["amt"], decimal_scale=2
    )
    recomputed = aggregate_snapshot(cur, ["g"], ["amt"], decimal_scale=2)
    assert _rows(maintained) == _rows(recomputed)
    got = {r["g"]: (float(r["SUM_amt"]), r["N_ROWS"]) for r in maintained.collect()}
    # a lost row 2 (migrated); b gained it and row 3 changed 5->8
    assert got == {"a": (10.0, 1), "b": (35.0, 3), "d": (50.0, 1)}
    assert "c" not in got  # zero-count group dropped


def test_incremental_is_iterable(spark, snapshots):
    # maintenance output feeds the next maintenance cycle with a stable
    # schema: apply cur -> cur2 on top of the already-maintained frame
    prev, cur = snapshots
    cur2 = cur.withColumn(
        "amt", F.when(F.col("k") == 6, 60.0).otherwise(F.col("amt"))
    ).filter(F.col("k") != 1)
    agg0 = aggregate_snapshot(prev, ["g"], ["amt"], decimal_scale=2)
    step1 = incremental_agg_update(
        agg0, cdc_diff(cur, prev, pks=["k"], with_old_image=True),
        ["g"], ["amt"], decimal_scale=2,
    )
    step2 = incremental_agg_update(
        step1, cdc_diff(cur2, cur, pks=["k"], with_old_image=True),
        ["g"], ["amt"], decimal_scale=2,
    )
    assert _rows(step2) == _rows(aggregate_snapshot(cur2, ["g"], ["amt"], decimal_scale=2))


def test_old_image_contract(spark, snapshots):
    prev, cur = snapshots
    changes = cdc_diff(cur, prev, pks=["k"], with_old_image=True)
    by_key = {r["k"]: r for r in changes.collect()}
    assert by_key[6]["cdc_action"] == "insert" and by_key[6]["cdc_old"] is None
    assert by_key[5]["cdc_action"] == "delete" and by_key[5]["cdc_old"]["amt"] == 100.0
    assert by_key[2]["cdc_action"] == "update"
    assert by_key[2]["g"] == "b" and by_key[2]["cdc_old"]["g"] == "a"


def test_requires_old_image(spark, snapshots):
    prev, cur = snapshots
    plain = cdc_diff(cur, prev, pks=["k"])
    with pytest.raises(ValueError, match="with_old_image"):
        incremental_agg_update(
            aggregate_snapshot(prev, ["g"], ["amt"]), plain, ["g"], ["amt"]
        )
    with pytest.raises(ValueError, match="keyed"):
        cdc_diff(cur, prev, pks=["k"], mode="fullrow", with_old_image=True)
