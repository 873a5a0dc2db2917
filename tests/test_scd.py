"""SCD Type-2 history builder (operators/scd.py): interval assignment,
delete termination, no-op-update collapse, point-in-time snapshot."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from aws_glue_cdc_metrics_job_spark.operators.scd import scd2_from_log, scd2_snapshot_at


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def log(spark):
    rows = [
        # key 1: insert, real update, no-op update (collapses), real update
        (1, _ts("2024-01-01 00:00:00"), 1, "bronze", 10.0, "insert"),
        (1, _ts("2024-01-02 00:00:00"), 2, "silver", 10.0, "update"),
        (1, _ts("2024-01-03 00:00:00"), 3, "silver", 10.0, "update"),
        (1, _ts("2024-01-04 00:00:00"), 4, "gold", 20.0, "update"),
        # key 2: insert then delete -> closed, non-current version
        (2, _ts("2024-01-01 12:00:00"), 5, "bronze", 1.0, "insert"),
        (2, _ts("2024-01-05 00:00:00"), 6, None, None, "delete"),
        # key 3: insert, delete, re-insert with the SAME attrs -> two
        # versions (delete breaks the collapse chain)
        (3, _ts("2024-01-01 00:00:00"), 7, "bronze", 5.0, "insert"),
        (3, _ts("2024-01-02 00:00:00"), 8, None, None, "delete"),
        (3, _ts("2024-01-03 00:00:00"), 9, "bronze", 5.0, "insert"),
        # key 4: NULL attribute transitions are tracked null-safely
        (4, _ts("2024-01-01 00:00:00"), 10, "bronze", None, "insert"),
        (4, _ts("2024-01-02 00:00:00"), 11, "bronze", None, "update"),  # no-op
        (4, _ts("2024-01-03 00:00:00"), 12, "bronze", 3.0, "update"),  # real
    ]
    return spark.createDataFrame(
        rows, "user_id int, ts timestamp, event_id int, tier string, score double, cdc_action string"
    )


def _build(log):
    return scd2_from_log(
        log, pks=["user_id"], ts_col="ts", attr_cols=["tier", "score"],
        order_cols=["event_id"],
    )


def test_versions_and_intervals(log):
    out = {
        (r["user_id"], r["VALID_FROM"].isoformat()): r
        for r in _build(log).collect()
    }
    # key 1: 3 versions (the no-op collapsed into the 01-02 one)
    k1 = sorted(k for k in out if k[0] == 1)
    assert [k[1][:10] for k in k1] == ["2024-01-01", "2024-01-02", "2024-01-04"]
    # the collapsed version runs until the NEXT REAL change
    assert out[(1, "2024-01-02T00:00:00")]["VALID_TO"] == _ts("2024-01-04 00:00:00")
    assert out[(1, "2024-01-04T00:00:00")]["VALID_TO"] is None
    assert out[(1, "2024-01-04T00:00:00")]["IS_CURRENT"] == 1


def test_delete_terminates_without_current(log):
    rows = [r for r in _build(log).collect() if r["user_id"] == 2]
    assert len(rows) == 1
    assert rows[0]["VALID_TO"] == _ts("2024-01-05 00:00:00")
    assert rows[0]["IS_CURRENT"] == 0


def test_delete_breaks_collapse_chain(log):
    rows = sorted(
        (r for r in _build(log).collect() if r["user_id"] == 3),
        key=lambda r: r["VALID_FROM"],
    )
    assert len(rows) == 2  # same attrs but split by the delete
    assert rows[0]["IS_CURRENT"] == 0 and rows[1]["IS_CURRENT"] == 1


def test_null_safe_collapse(log):
    rows = sorted(
        (r for r in _build(log).collect() if r["user_id"] == 4),
        key=lambda r: r["VALID_FROM"],
    )
    # NULL==NULL no-op collapsed; NULL->3.0 is a real change
    assert [r["VALID_FROM"].day for r in rows] == [1, 3]


def test_no_collapse_mode(log):
    out = scd2_from_log(
        log, pks=["user_id"], ts_col="ts", attr_cols=["tier", "score"],
        order_cols=["event_id"], collapse_unchanged=False,
    )
    assert out.filter(F.col("user_id") == 1).count() == 4


def test_snapshot_at(log):
    dim = _build(log)
    at = scd2_snapshot_at(dim, "2024-01-02 00:00:00")
    got = {(r["user_id"], r["tier"]) for r in at.collect()}
    # key1 silver version opens exactly AT the timestamp (inclusive lower
    # bound); key2 bronze still open; key3 deleted at 01-02 (half-open:
    # its version is gone); key4 first version still open
    assert got == {(1, "silver"), (2, "bronze"), (4, "bronze")}


def test_single_shuffle_plan(log):
    plan = _build(log)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
