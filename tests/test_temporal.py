"""asof_join: backward-fill semantics vs hand-computed expectations."""

from datetime import date, datetime, timedelta
from decimal import Decimal

from pyspark.sql import functions as F

from aws_glue_cdc_metrics_job_spark.operators.temporal import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_backward_match_and_left_outer(spark):
    left = _mk(
        spark,
        [
            (1, _ts("2024-01-01 10:00:00"), "p1"),  # after q1 -> q1
            (1, _ts("2024-01-01 12:00:00"), "p2"),  # after q2 -> q2
            (2, _ts("2024-01-01 09:00:00"), "p3"),  # before any quote -> NULL
            (3, _ts("2024-01-01 09:00:00"), "p4"),  # key with no right rows
        ],
        "k int, ts timestamp, pid string",
    )
    right = _mk(
        spark,
        [
            (1, _ts("2024-01-01 09:30:00"), 100.0),  # q1
            (1, _ts("2024-01-01 11:00:00"), 110.0),  # q2
            (2, _ts("2024-01-01 09:30:00"), 200.0),
        ],
        "k int, qts timestamp, px double",
    )
    got = {
        r["pid"]: (r["matched_qts"], r["matched_px"])
        for r in asof_join(left, right, ["k"], "ts", "qts", ["px"]).collect()
    }
    assert got["p1"] == (_ts("2024-01-01 09:30:00"), 100.0)
    assert got["p2"] == (_ts("2024-01-01 11:00:00"), 110.0)
    assert got["p3"] == (None, None)
    assert got["p4"] == (None, None)


def test_asof_exact_timestamp_matches(spark):
    left = _mk(spark, [(1, _ts("2024-01-01 10:00:00"), "p")], "k int, ts timestamp, pid string")
    right = _mk(spark, [(1, _ts("2024-01-01 10:00:00"), 5.0)], "k int, qts timestamp, px double")
    [r] = asof_join(left, right, ["k"], "ts", "qts", ["px"]).collect()
    assert r["matched_px"] == 5.0


def test_asof_preserves_null_payload(spark):
    # a matched right row whose payload is NULL must yield NULL, not fall
    # back to an older non-null right row (struct wrapper semantics)
    left = _mk(spark, [(1, _ts("2024-01-01 12:00:00"), "p")], "k int, ts timestamp, pid string")
    right = _mk(
        spark,
        [(1, _ts("2024-01-01 10:00:00"), 1.0), (1, _ts("2024-01-01 11:00:00"), None)],
        "k int, qts timestamp, px double",
    )
    [r] = asof_join(left, right, ["k"], "ts", "qts", ["px"]).collect()
    assert r["matched_qts"] == _ts("2024-01-01 11:00:00")
    assert r["matched_px"] is None


def test_asof_tolerance_nulls_stale_matches(spark):
    left = _mk(
        spark,
        [(1, _ts("2024-01-01 10:00:00"), "fresh"), (1, _ts("2024-01-01 13:00:00"), "stale")],
        "k int, ts timestamp, pid string",
    )
    right = _mk(spark, [(1, _ts("2024-01-01 09:59:00"), 1.0)], "k int, qts timestamp, px double")
    got = {
        r["pid"]: r["matched_px"]
        for r in asof_join(
            left, right, ["k"], "ts", "qts", ["px"], tolerance_seconds=3600
        ).collect()
    }
    assert got == {"fresh": 1.0, "stale": None}


def test_asof_equal_ts_right_rows_deterministic(spark):
    left = _mk(spark, [(1, _ts("2024-01-01 10:00:00"), "p")], "k int, ts timestamp, pid string")
    right = _mk(
        spark,
        [(1, _ts("2024-01-01 09:00:00"), 1.0), (1, _ts("2024-01-01 09:00:00"), 2.0)],
        "k int, qts timestamp, px double",
    )
    for _ in range(3):
        [r] = asof_join(
            left.repartition(4), right.repartition(3), ["k"], "ts", "qts", ["px"]
        ).collect()
        assert r["matched_px"] == 2.0  # greatest payload under struct order wins


def test_asof_matches_pandas_merge_asof(spark):
    import pandas as pd

    lrows = [(i % 5, _ts(f"2024-01-0{1 + i % 9} {i % 24:02d}:00:00"), float(i)) for i in range(200)]
    rrows = [(i % 5, _ts(f"2024-01-0{1 + (i * 3) % 9} {(i * 7) % 24:02d}:30:00"), float(i)) for i in range(80)]
    left = _mk(spark, lrows, "k int, ts timestamp, lv double")
    right = _mk(spark, rrows, "k int, rts timestamp, rv double")
    got = (
        asof_join(left, right, ["k"], "ts", "rts", ["rv"])
        .select("k", "ts", "lv", "matched_rts", "matched_rv")
        .toPandas()
        .sort_values(["k", "ts", "lv"])
        .reset_index(drop=True)
    )
    lp = pd.DataFrame(lrows, columns=["k", "ts", "lv"]).sort_values("ts")
    rp = (
        pd.DataFrame(rrows, columns=["k", "rts", "rv"])
        .drop_duplicates(["k", "rts"], keep="last")
        .sort_values("rts")
    )
    exp = (
        pd.merge_asof(lp, rp, left_on="ts", right_on="rts", by="k")
        .rename(columns={"rts": "matched_rts", "rv": "matched_rv"})
        .sort_values(["k", "ts", "lv"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_interval_join_matches_naive(spark):
    from aws_glue_cdc_metrics_job_spark.operators.temporal import interval_join

    lrows = [(i % 4, _ts(f"2024-01-01 {i % 24:02d}:{(i * 13) % 60:02d}:00"), i) for i in range(120)]
    rrows = [(i % 4, _ts(f"2024-01-01 {(i * 5) % 24:02d}:{(i * 7) % 60:02d}:30"), i) for i in range(90)]
    left = _mk(spark, lrows, "k int, lts timestamp, lid int")
    right = _mk(spark, rrows, "k int, rts timestamp, rid int")
    lo, hi = -1800.0, 1800.0  # rts within +/-30min of lts
    banded = sorted(
        (r["lid"], r["rid"])
        for r in interval_join(left, right, ["k"], "lts", "rts", lo, hi).collect()
    )
    naive = sorted(
        (r["lid"], r["rid"])
        for r in left.join(right, "k").filter(
            (F.col("rts").cast("double") >= F.col("lts").cast("double") + lo)
            & (F.col("rts").cast("double") <= F.col("lts").cast("double") + hi)
        ).collect()
    )
    assert banded == naive and len(banded) > 0


def test_interval_join_one_sided_band(spark):
    from aws_glue_cdc_metrics_job_spark.operators.temporal import interval_join

    left = _mk(spark, [(1, _ts("2024-01-01 10:00:00"), 0)], "k int, lts timestamp, lid int")
    right = _mk(
        spark,
        [
            (1, _ts("2024-01-01 09:59:00"), 1),   # in [-300, 0]
            (1, _ts("2024-01-01 10:00:00"), 2),   # boundary: included
            (1, _ts("2024-01-01 10:00:01"), 3),   # after: excluded
            (1, _ts("2024-01-01 09:54:59"), 4),   # too old: excluded
        ],
        "k int, rts timestamp, rid int",
    )
    got = sorted(
        r["rid"] for r in interval_join(left, right, ["k"], "lts", "rts", -300, 0).collect()
    )
    assert got == [1, 2]


def test_interval_join_rejects_same_ts_name(spark):
    from aws_glue_cdc_metrics_job_spark.operators.temporal import interval_join

    df = _mk(spark, [(1, _ts("2024-01-01 10:00:00"))], "k int, ts timestamp")
    import pytest

    with pytest.raises(ValueError):
        interval_join(df, df, ["k"], "ts", "ts", -1, 1)


# --- funnel


def test_funnel_hand_computed(spark):
    import datetime as dt

    D = dt.datetime
    rows = [
        # user 1 completes the funnel in order
        (1, 1, D(2024, 1, 1, 10), "view"),
        (2, 1, D(2024, 1, 1, 11), "click"),
        (3, 1, D(2024, 1, 1, 12), "purchase"),
        # user 2: click BEFORE view -> stalls at stage 1
        (4, 2, D(2024, 1, 1, 9), "click"),
        (5, 2, D(2024, 1, 1, 10), "view"),
        # user 3: view then click, no purchase
        (6, 3, D(2024, 1, 1, 8), "view"),
        (7, 3, D(2024, 1, 1, 9), "click"),
        # user 4: never views
        (8, 4, D(2024, 1, 1, 8), "purchase"),
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, event_type string")
    from aws_glue_cdc_metrics_job_spark.operators.temporal import funnel_counts

    got = {r["STAGE"]: r["N_USERS"] for r in funnel_counts(ev, ["view", "click", "purchase"]).collect()}
    assert got == {1: 3, 2: 2, 3: 1}


def test_funnel_within_window_excludes_late_steps(spark):
    import datetime as dt

    D = dt.datetime
    rows = [
        (1, 1, D(2024, 1, 1, 10), "view"),
        (2, 1, D(2024, 1, 3, 10), "click"),  # 2 days later
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, event_type string")
    from aws_glue_cdc_metrics_job_spark.operators.temporal import funnel_counts

    tight = {r["STAGE"]: r["N_USERS"] for r in funnel_counts(ev, ["view", "click"], within_seconds=3600).collect()}
    loose = {r["STAGE"]: r["N_USERS"] for r in funnel_counts(ev, ["view", "click"], within_seconds=3 * 86400).collect()}
    assert tight == {1: 1, 2: 0}
    assert loose == {1: 1, 2: 1}


def test_funnel_rejects_empty_stages(spark):
    import pytest as _pytest

    df = spark.createDataFrame([], "event_id long, user_id long, ts timestamp, event_type string")
    from aws_glue_cdc_metrics_job_spark.operators.temporal import funnel_counts

    with _pytest.raises(ValueError):
        funnel_counts(df, [])


def test_retention_cohorts_hand_computed(spark):
    import datetime as dt

    D = dt.datetime
    rows = [
        # user 1 signs up week of Jan 1 (Mon), active weeks 0 and 1
        (1, 1, D(2024, 1, 2, 10), "signup"),
        (2, 1, D(2024, 1, 10, 10), "click"),
        # user 2 signs up same week, active week 0 only
        (3, 2, D(2024, 1, 3, 10), "signup"),
        # user 3 never signs up -> not cohorted
        (4, 3, D(2024, 1, 4, 10), "view"),
        # user 1 pre-signup activity must not count (before anchor week)
        (5, 1, D(2023, 12, 20, 10), "view"),
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, event_type string")
    from aws_glue_cdc_metrics_job_spark.operators.temporal import retention_cohorts

    got = {
        (r["COHORT_WEEK"].isoformat(), r["WEEK_OFFSET"]): r["N_USERS"]
        for r in retention_cohorts(ev).collect()
    }
    # week of 2024-01-01 is the Monday-aligned cohort
    assert got[("2024-01-01", 0)] == 2
    assert got[("2024-01-01", 1)] == 1
    assert len(got) == 2  # nothing from user 3 or pre-anchor activity


def test_gap_fill_daily(spark):
    import datetime as dt

    from aws_glue_cdc_metrics_job_spark.operators.temporal import gap_fill_daily

    d = dt.date
    df = spark.createDataFrame(
        [
            ("a", d(2024, 1, 1), 10),
            ("a", d(2024, 1, 4), 40),   # gap: 2nd, 3rd missing
            ("b", d(2024, 1, 3), 30),   # single-day key: no spine growth
        ],
        "k string, day date, n long",
    )
    out = gap_fill_daily(df, ["k"], "day", fill={"n": 0})
    got = sorted((r["k"], r["day"].isoformat(), r["n"]) for r in out.collect())
    assert got == [
        ("a", "2024-01-01", 10),
        ("a", "2024-01-02", 0),
        ("a", "2024-01-03", 0),
        ("a", "2024-01-04", 40),
        ("b", "2024-01-03", 30),
    ]
    # unlisted metric columns stay NULL on filled rows
    df2 = df.withColumn("x", F.lit(1.5))
    row = {
        (r["k"], r["day"].isoformat()): r["x"]
        for r in gap_fill_daily(df2, ["k"], "day", fill={"n": 0}).collect()
    }
    assert row[("a", "2024-01-02")] is None and row[("a", "2024-01-01")] == 1.5


class TestSessionTransitions:
    def test_edges_and_session_breaks(self, spark):
        import datetime as dt

        from aws_glue_cdc_metrics_job_spark.operators.temporal import session_transitions

        t0 = dt.datetime(2024, 1, 1, 12, 0)
        m = dt.timedelta(minutes=1)
        rows = [
            # user 1, one session: view -> click -> buy
            (1, 1, t0, "view"), (2, 1, t0 + m, "click"), (3, 1, t0 + 2 * m, "buy"),
            # 2 hours later: new session, view -> view (no cross-session edge)
            (4, 1, t0 + dt.timedelta(hours=2), "view"),
            (5, 1, t0 + dt.timedelta(hours=2) + m, "view"),
            # user 2: lone event -> entry edge only
            (6, 2, t0, "click"),
        ]
        df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, event_type string")
        got = {
            (r["FROM_TYPE"], r["TO_TYPE"]): r["N_TRANSITIONS"]
            for r in session_transitions(df).collect()
        }
        assert got == {
            (None, "view"): 2,      # two session entries with view
            (None, "click"): 1,     # user 2's lone session entry
            ("view", "click"): 1,
            ("click", "buy"): 1,
            ("view", "view"): 1,
        }
        # edge conservation: every event is a TO exactly once
        assert sum(got.values()) == len(rows)


def test_interpolate_daily_exact_lattice(spark):
    from aws_glue_cdc_metrics_job_spark.operators.temporal import interpolate_daily

    df = spark.createDataFrame(
        [
            ("a", date(2024, 1, 1), Decimal("1.00")),
            ("a", date(2024, 1, 4), Decimal("2.50")),   # 3-day gap: thirds truncate
            ("b", date(2024, 1, 1), Decimal("-3.00")),
            ("b", date(2024, 1, 3), Decimal("1.00")),   # crosses zero
        ],
        "k string, d date, v decimal(18,2)",
    )
    rows = {
        (r["k"], str(r["d"])): (r["IS_OBSERVED"], r["VALUE_CENTI"])
        for r in interpolate_daily(df, ["k"], "d", "v").collect()
    }
    assert rows[("a", "2024-01-01")] == (True, 100)
    # (100*2 + 250*1) div 3 = 450 div 3 = 150; (100*1 + 250*2) div 3 = 200
    assert rows[("a", "2024-01-02")] == (False, 150)
    assert rows[("a", "2024-01-03")] == (False, 200)
    assert rows[("a", "2024-01-04")] == (True, 250)
    # (-300*1 + 100*1) div 2 = -200 div 2 = -100 (truncating, sign-safe)
    assert rows[("b", "2024-01-02")] == (False, -100)
    assert len(rows) == 7


def test_interpolate_daily_bounded_and_dense(spark):
    """Interpolated values always lie within [min(prev,next), max(prev,next)]
    and the output is one row per day of each key's span."""
    import random

    rng = random.Random(7)
    rows = []
    for key in ("p", "q"):
        day = 0
        while day < 60:
            rows.append((key, date(2024, 1, 1) + timedelta(days=day),
                         Decimal(str(round(rng.uniform(-50, 50), 2)))))
            day += rng.randint(1, 9)
    df = spark.createDataFrame(rows, "k string, d date, v decimal(18,2)")
    from aws_glue_cdc_metrics_job_spark.operators.temporal import interpolate_daily

    out = interpolate_daily(df, ["k"], "d", "v").collect()
    spans = {}
    for key, d, v in rows:
        lo, hi = spans.get(key, (d, d))
        spans[key] = (min(lo, d), max(hi, d))
    expected_rows = sum((hi - lo).days + 1 for lo, hi in spans.values())
    assert len(out) == expected_rows
    observed = {(key, d): int(v * 100) for key, d, v in rows}
    obs_dates = {}
    for key, d, _ in rows:
        obs_dates.setdefault(key, []).append(d)
    for r in out:
        k, d, vc = r["k"], r["d"], r["VALUE_CENTI"]
        if r["IS_OBSERVED"]:
            assert vc == observed[(k, d)]
        else:
            prev_d = max(x for x in obs_dates[k] if x < d)
            next_d = min(x for x in obs_dates[k] if x > d)
            lo = min(observed[(k, prev_d)], observed[(k, next_d)])
            hi = max(observed[(k, prev_d)], observed[(k, next_d)])
            assert lo <= vc <= hi, (k, d, vc, lo, hi)


class TestUShapeAttribution:
    def _run(self, spark, rows):
        from aws_glue_cdc_metrics_job_spark.operators.temporal import (
            u_shape_attribution,
        )

        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_type string, value double"
        )
        return {
            r["CHANNEL"]: r
            for r in u_shape_attribution(df, ["click", "view"], "purchase").collect()
        }

    def test_u_weights_and_exact_complement(self, spark):
        t0 = datetime(2024, 1, 1)
        # 4 touches then a 10.01 purchase: 1001 cents -> floors 400, 100,
        # 100 for positions 1-3; last touch takes 1001 - 600 = 401
        rows = [
            (1, t0 + timedelta(minutes=i), ty, None)
            for i, ty in enumerate(["click", "view", "click", "view"])
        ] + [(1, t0 + timedelta(minutes=9), "purchase", 10.01)]
        out = self._run(spark, rows)
        assert out["click"]["CREDIT_CENTS"] == 400 + 100
        assert out["view"]["CREDIT_CENTS"] == 100 + 401
        assert out["direct"]["N_CONVERSIONS"] == 0
        total = sum(r["CREDIT_CENTS"] for r in out.values())
        assert total == 1001  # exactly-once credit

    def test_journey_boundaries_and_direct(self, spark):
        t0 = datetime(2024, 1, 1)
        rows = [
            # journey 0: one touch -> full credit to it
            (1, t0, "click", None),
            (1, t0 + timedelta(hours=1), "purchase", 5.00),
            # journey 1: no touches -> direct
            (1, t0 + timedelta(hours=2), "purchase", 7.00),
            # trailing touch after the last purchase: never credited
            (1, t0 + timedelta(hours=3), "view", None),
            # another user, two touches: 50/50 with complement on last
            (2, t0, "view", None),
            (2, t0 + timedelta(minutes=1), "view", None),
            (2, t0 + timedelta(minutes=2), "purchase", 0.03),
        ]
        out = self._run(spark, rows)
        assert out["click"]["CREDIT_CENTS"] == 500
        assert out["direct"]["N_CONVERSIONS"] == 1
        assert out["direct"]["CREDIT_CENTS"] == 700
        # 3 cents split 50/50: floor(1.5)=1 then complement 2
        assert out["view"]["CREDIT_CENTS"] == 3
        assert out["view"]["N_TOUCHES"] == 2  # user 1's trailing view dropped
        assert out["view"]["N_CONVERSIONS"] == 1

    def test_conservation_on_fixture(self, spark, sf_dir="/root/testdata/sf0.001"):
        from aws_glue_cdc_metrics_job_spark.operators.temporal import (
            u_shape_attribution,
        )
        from aws_glue_cdc_metrics_job_spark.sources.parquet_io import read_table

        ev = read_table(spark, sf_dir, "events")
        out = u_shape_attribution(ev, ["click", "view"], "purchase")
        total = out.agg(F.sum("CREDIT_CENTS")).collect()[0][0]
        expect = (
            ev.where(F.col("event_type") == "purchase")
            .agg(
                F.sum(
                    F.floor(F.coalesce(F.col("value"), F.lit(0.0)) * 100 + F.lit(0.5))
                )
            )
            .collect()[0][0]
        )
        assert total == expect
