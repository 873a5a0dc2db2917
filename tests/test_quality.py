"""Data-quality constraint operators (operators/quality.py)."""

import pytest
from pyspark.sql import functions as F

from aws_glue_cdc_metrics_job_spark.operators.quality import (
    quality_report,
    referential_violations,
    row_rule_violations,
    unique_key_violations,
)


@pytest.fixture(scope="module")
def frames(spark):
    orders = spark.createDataFrame(
        [
            (1, 10, "O", 100.0),
            (2, 10, "F", -5.0),   # negative price
            (3, 20, "X", 50.0),   # bad status
            (4, None, "O", None),  # null custkey, null price
            (4, 30, "O", 75.0),   # duplicate key
        ],
        "o_orderkey int, o_custkey int, o_orderstatus string, o_totalprice double",
    )
    customer = spark.createDataFrame([(10,), (20,)], "c_custkey int")
    lines = spark.createDataFrame(
        [(1, 1), (1, 2), (9, 1)], "l_orderkey int, l_linenumber int"
    )
    return orders, customer, lines


def test_row_rules_single_pass(frames):
    orders, _, _ = frames
    rep = row_rule_violations(
        orders,
        {
            "price_nonneg": (F.col("o_totalprice") < 0) | F.col("o_totalprice").isNull(),
            "status_domain": ~F.col("o_orderstatus").isin("O", "F"),
            "custkey_not_null": F.col("o_custkey").isNull(),
        },
    )
    got = {r["RULE"]: r["VIOLATIONS"] for r in rep.collect()}
    assert got == {"price_nonneg": 2, "status_domain": 1, "custkey_not_null": 1}
    # all rules fuse into ONE aggregation over one scan (count inside the
    # final plan only -- post-execution AQE output repeats the initial plan)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan") == 1, plan


def test_unique_key(frames):
    orders, _, _ = frames
    got = unique_key_violations(orders, ["o_orderkey"]).collect()[0]
    assert got["RULE"] == "unique(o_orderkey)"
    assert got["VIOLATIONS"] == 1  # one excess row for key 4


def test_unique_key_clean(spark):
    df = spark.createDataFrame([(1,), (2,)], "k int")
    assert unique_key_violations(df, ["k"]).collect()[0]["VIOLATIONS"] == 0


def test_referential(frames):
    orders, customer, lines = frames
    fk = referential_violations(
        orders, customer, ["o_custkey"], ["c_custkey"]
    ).collect()[0]
    # custkey 30 orphan + NULL custkey never matches -> 2
    assert fk["VIOLATIONS"] == 2
    li = referential_violations(
        lines, orders, ["l_orderkey"], ["o_orderkey"]
    ).collect()[0]
    assert li["VIOLATIONS"] == 1  # orderkey 9


def test_report_union(frames):
    orders, customer, lines = frames
    rep = quality_report(
        [
            unique_key_violations(orders, ["o_orderkey"]),
            referential_violations(lines, orders, ["l_orderkey"], ["o_orderkey"]),
        ]
    )
    assert rep.columns == ["RULE", "VIOLATIONS"]
    assert rep.count() == 2


def test_empty_rules_raise(frames):
    with pytest.raises(ValueError):
        row_rule_violations(frames[0], {})
    with pytest.raises(ValueError):
        quality_report([])


def test_table_profile_values(frames):
    from aws_glue_cdc_metrics_job_spark.operators.quality import table_profile

    orders, _, _ = frames
    rows = {
        r["COLUMN_NAME"]: r
        for r in table_profile(orders, ["o_custkey", "o_orderstatus"]).collect()
    }
    assert list(rows) == sorted(rows)  # ordered by column name
    ck = rows["o_custkey"]
    assert (ck["N_ROWS"], ck["N_NULL"], ck["N_DISTINCT"]) == (5, 1, 3)
    assert (ck["MIN_VALUE"], ck["MAX_VALUE"]) == ("10", "30")
    st = rows["o_orderstatus"]
    assert (st["N_ROWS"], st["N_NULL"], st["N_DISTINCT"]) == (5, 0, 3)
    assert (st["MIN_VALUE"], st["MAX_VALUE"]) == ("F", "X")


def test_table_profile_one_scan(frames):
    """The whole profile is ONE aggregation over ONE scan (an Expand feeds
    the k count-distincts); defaults profile every column."""
    from aws_glue_cdc_metrics_job_spark.operators.quality import table_profile

    orders, _, _ = frames
    prof = table_profile(orders)
    assert prof.count() == len(orders.columns)
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 1
    with pytest.raises(ValueError):
        table_profile(orders, [])


def test_k_anonymity_report_and_suppression(spark):
    from aws_glue_cdc_metrics_job_spark.operators.quality import (
        k_anonymity_report,
        suppress_below_k,
    )

    df = spark.createDataFrame(
        [("en", "a")] * 5 + [("en", "b")] * 2 + [("fr", "a")] * 1,
        "lang string, source string",
    )
    rep = k_anonymity_report(df, ["lang", "source"], k=3).collect()
    assert [(r["lang"], r["source"], r["GROUP_SIZE"]) for r in rep] == [
        ("fr", "a", 1),
        ("en", "b", 2),
    ]
    kept = suppress_below_k(df, ["lang", "source"], k=3)
    assert kept.count() == 5
    assert k_anonymity_report(kept, ["lang", "source"], k=3).count() == 0
    with pytest.raises(ValueError):
        k_anonymity_report(df, [], k=3)
    with pytest.raises(ValueError):
        k_anonymity_report(df, ["lang"], k=1)


def test_benford_report_exact_lattice(spark):
    from aws_glue_cdc_metrics_job_spark.operators.quality import (
        BENFORD_PPM,
        benford_report,
    )

    assert sum(BENFORD_PPM.values()) == 1_000_000
    # 100, 1xx..., 2xx, 9xx; zero and NULL excluded
    df = spark.createDataFrame(
        [(100,), (150,), (199,), (250,), (900,), (0,), (None,)],
        "v long",
    )
    rows = {r["DIGIT"]: r for r in benford_report(df, "v").collect()}
    assert sorted(rows) == [1, 2, 9]
    assert rows[1]["N"] == 3 and rows[2]["N"] == 1 and rows[9]["N"] == 1
    assert rows[1]["OBSERVED_PPM"] == 600000  # 3*1e6 div 5
    assert rows[1]["EXPECTED_PPM"] == 301030
    assert rows[1]["DEV_PPM"] == 600000 - 301030
    assert rows[9]["DEV_PPM"] == 200000 - 45757


def test_table_profile_hostile_column_names(spark):
    """Column names with quotes, backslashes, and dots must profile
    correctly (ADVICE r4: the old stack() SQL string-interpolated names;
    the Column-API build makes escaping a non-issue)."""
    from aws_glue_cdc_metrics_job_spark.operators.quality import table_profile

    df = spark.createDataFrame(
        [(1, "x"), (2, "y"), (None, "y")],
        ["it's a col", "path\\dot.ted"],
    )
    rows = {r["COLUMN_NAME"]: r for r in table_profile(df).collect()}
    assert set(rows) == {"it's a col", "path\\dot.ted"}
    quoted = rows["it's a col"]
    assert (quoted["N_ROWS"], quoted["N_NULL"], quoted["N_DISTINCT"]) == (3, 1, 2)
    dotted = rows["path\\dot.ted"]
    assert (dotted["N_ROWS"], dotted["N_NULL"], dotted["N_DISTINCT"]) == (3, 0, 2)
    assert (dotted["MIN_VALUE"], dotted["MAX_VALUE"]) == ("x", "y")


# --- round-6b: bidirectional referential audit -------------------------------


def test_referential_audit_counts_both_directions(spark):
    from aws_glue_cdc_metrics_job_spark.operators.quality import referential_audit

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 99), (5, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,), (30,)], "pk long")
    rows = referential_audit([("c->p", child, "fk", parent, "pk")]).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["RELATION"] == "c->p"
    assert r["N_CHILD"] == 5
    assert r["N_DISTINCT_FK"] == 3  # 10, 20, 99 (NULL is not a key value)
    # 99 matches nothing; NULL never matches -> 2 orphan rows
    assert r["N_ORPHAN_ROWS"] == 2
    assert r["N_PARENT"] == 3
    assert r["N_PARENT_UNREFERENCED"] == 1  # 30


def test_referential_audit_multiple_relations_and_validation(spark):
    import pytest as _pytest

    from aws_glue_cdc_metrics_job_spark.operators.quality import referential_audit

    a = spark.createDataFrame([(1, 1)], "id long, fk long")
    p = spark.createDataFrame([(1,)], "pk long")
    out = referential_audit([("r1", a, "fk", p, "pk"), ("r2", a, "fk", p, "pk")])
    assert [r["RELATION"] for r in out.collect()] == ["r1", "r2"]
    with _pytest.raises(ValueError):
        referential_audit([])


class TestLDiversity:
    def test_homogeneous_group_flagged(self, spark):
        from pyspark.sql import functions as F  # noqa: F401
        from aws_glue_cdc_metrics_job_spark.operators.quality import (
            l_diversity_report,
        )

        rows = (
            [("x", 1, u) for u in (1, 2, 3)]          # diverse enough for l=3
            + [("x", 2, 9)] * 5                        # large but homogeneous
        )
        df = spark.createDataFrame(rows, "q1 string, q2 int, s long")
        out = {(r["q1"], r["q2"]): r for r in l_diversity_report(df, ["q1", "q2"], "s", l=3).collect()}
        assert out[("x", 1)]["L_DISTINCT"] == 3 and out[("x", 1)]["DIVERSE"] == 1
        assert out[("x", 2)]["GROUP_SIZE"] == 5
        assert out[("x", 2)]["L_DISTINCT"] == 1 and out[("x", 2)]["DIVERSE"] == 0

    def test_validation(self, spark):
        import pytest
        from aws_glue_cdc_metrics_job_spark.operators.quality import (
            l_diversity_report,
        )

        df = spark.createDataFrame([("a", 1)], "q string, s int")
        with pytest.raises(ValueError):
            l_diversity_report(df, [], "s")
        with pytest.raises(ValueError):
            l_diversity_report(df, ["q"], "s", l=1)
