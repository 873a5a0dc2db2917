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


class TestScd2ApplyIncrement:
    @staticmethod
    def _full_log(spark, sf_dir):
        from pyspark.sql import functions as F

        from aws_glue_cdc_metrics_job_spark.sources import read_table

        return read_table(spark, sf_dir, "events").select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            "value",
            F.when(F.col("event_type") == "error", F.lit("delete"))
            .otherwise(F.lit("update"))
            .alias("cdc_action"),
        )

    def test_increment_equals_full_recompute(self, spark, sf_dir):
        """Split the real event log at a timestamp; building the dim from
        the first half then applying the second half incrementally must
        equal one full build."""
        from pyspark.sql import functions as F

        from aws_glue_cdc_metrics_job_spark.operators.scd import (
            scd2_apply_increment,
            scd2_from_log,
        )

        log = self._full_log(spark, sf_dir)
        cut = "2024-01-15 00:00:00"
        kw = dict(
            pks=["user_id"], ts_col="ts", attr_cols=["event_type", "value"],
            order_cols=["event_id"],
        )
        dim0 = scd2_from_log(log.filter(F.col("ts") < cut), **kw)
        merged = scd2_apply_increment(dim0, log.filter(F.col("ts") >= cut), **kw)
        full = scd2_from_log(log, **kw)
        sym_diff = merged.exceptAll(full).count() + full.exceptAll(merged).count()
        assert sym_diff == 0
        assert merged.count() == full.count() > 0

    def test_late_rows_dropped(self, spark):
        from datetime import datetime

        from aws_glue_cdc_metrics_job_spark.operators.scd import (
            scd2_apply_increment,
            scd2_from_log,
        )

        kw = dict(pks=["k"], ts_col="ts", attr_cols=["v"], order_cols=["i"])
        log = spark.createDataFrame(
            [(1, datetime(2024, 1, 5), 1, "a", "update")],
            "k int, ts timestamp, i int, v string, cdc_action string",
        )
        dim = scd2_from_log(log, **kw)
        late = spark.createDataFrame(
            [
                (1, datetime(2024, 1, 3), 2, "stale", "update"),  # late: dropped
                (1, datetime(2024, 1, 8), 3, "b", "update"),      # on time
            ],
            "k int, ts timestamp, i int, v string, cdc_action string",
        )
        out = sorted(
            scd2_apply_increment(dim, late, **kw).collect(),
            key=lambda r: r["VALID_FROM"],
        )
        assert [r["v"] for r in out] == ["a", "b"]
        assert out[0]["VALID_TO"] == datetime(2024, 1, 8)

    def test_insert_after_delete_and_new_key(self, spark):
        from datetime import datetime

        from aws_glue_cdc_metrics_job_spark.operators.scd import (
            scd2_apply_increment,
            scd2_from_log,
        )

        kw = dict(pks=["k"], ts_col="ts", attr_cols=["v"], order_cols=["i"])
        log = spark.createDataFrame(
            [
                (1, datetime(2024, 1, 1), 1, "a", "update"),
                (1, datetime(2024, 1, 2), 2, None, "delete"),
            ],
            "k int, ts timestamp, i int, v string, cdc_action string",
        )
        dim = scd2_from_log(log, **kw)
        batch = spark.createDataFrame(
            [
                (1, datetime(2024, 1, 9), 3, "a", "update"),  # re-insert post-delete
                (2, datetime(2024, 1, 9), 4, "x", "update"),  # brand-new key
            ],
            "k int, ts timestamp, i int, v string, cdc_action string",
        )
        out = scd2_apply_increment(dim, batch, **kw)
        got = {(r["k"], r["v"], r["IS_CURRENT"]) for r in out.collect()}
        assert got == {(1, "a", 0), (1, "a", 1), (2, "x", 1)}
