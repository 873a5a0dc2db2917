"""Relational helper semantics (SURVEY.md §7 step 3)."""

from pyspark.sql import functions as F

from aws_glue_cdc_metrics_job_spark.operators.relational import (
    any_column_differs,
    join_fill,
    keep_latest,
    pct_change,
    sum_where,
    top_k_per_group,
)


def test_keep_latest_deterministic(spark):
    df = spark.createDataFrame(
        [("u1", 1, "old"), ("u1", 3, "new"), ("u1", 2, "mid"), ("u2", 5, "only")],
        "k string, v int, tag string",
    )
    got = {r["k"]: r["tag"] for r in keep_latest(df, ["k"], [F.col("v").desc()]).collect()}
    assert got == {"u1": "new", "u2": "only"}


def test_keep_latest_tiebreaker(spark):
    df = spark.createDataFrame(
        [("u1", 1, "b"), ("u1", 1, "a")], "k string, v int, tag string"
    )
    got = keep_latest(df, ["k"], [F.col("v").desc()], tiebreakers=["tag"]).collect()
    assert got[0]["tag"] == "a"


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("g", i, f"r{i}") for i in range(5)], "k string, v int, tag string"
    )
    got = top_k_per_group(df, ["k"], [F.col("v").desc()], k=2, rank_col="RANK").collect()
    assert {(r["tag"], r["RANK"]) for r in got} == {("r4", 1), ("r3", 2)}


def test_join_fill(spark):
    left = spark.createDataFrame([(1, "x"), (2, "y")], "id int, a string")
    right = spark.createDataFrame([(1, 5.0)], "id int, amt double")
    got = {r["id"]: r["amt"] for r in join_fill(left, right, ["id"], {"amt": 0.0}).collect()}
    assert got == {1: 5.0, 2: 0.0}


def test_sum_where_single_pass(spark):
    df = spark.createDataFrame([(1, 10.0), (1, 5.0), (2, 7.0)], "k int, v double")
    got = df.groupBy("k").agg(sum_where(F.col("v") > 6, "v", "big")).collect()
    by_k = {r["k"]: r["big"] for r in got}
    assert by_k == {1: 10.0, 2: 7.0}


def test_pct_change_null_on_zero(spark):
    df = spark.createDataFrame([(10.0, 5.0), (10.0, 0.0)], "cur double, prev double")
    got = df.select(pct_change(F.col("cur"), F.col("prev")).alias("p")).collect()
    assert got[0]["p"] == 100.0 and got[1]["p"] is None


def test_any_column_differs_null_safety(spark):
    a = spark.createDataFrame([(1, None)], "pk int, x string").alias("curr")
    b = spark.createDataFrame([(1, "v")], "pk int, x string").alias("prev")
    j = a.join(b, F.col("curr.pk") == F.col("prev.pk"))
    assert j.filter(any_column_differs("curr", "prev", ["x"], null_safe=True)).count() == 1
    assert j.filter(any_column_differs("curr", "prev", ["x"], null_safe=False)).count() == 0


def test_salted_count_distinct_exact(spark):
    from aws_glue_cdc_metrics_job_spark.operators.relational import salted_count_distinct

    rows = [("hot", f"u{i % 37}") for i in range(500)] + [("cold", "u1"), ("cold", "u2")]
    df = spark.createDataFrame(rows, "k string, v string")
    got = {r["k"]: r["n"] for r in salted_count_distinct(df, ["k"], "v", "n", salt=16).collect()}
    exact = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    assert got == exact == {"hot": 37, "cold": 2}


def test_salted_join_matches_plain_join(spark):
    from aws_glue_cdc_metrics_job_spark.operators.relational import salted_join

    big = spark.createDataFrame(
        [(i % 3, f"row{i}") for i in range(100)], "k int, payload string"
    )
    small = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c"), (3, "d")], "k int, dim string")
    plain = sorted((r["k"], r["payload"], r["dim"]) for r in big.join(small, ["k"]).collect())
    salted = sorted((r["k"], r["payload"], r["dim"]) for r in salted_join(big, small, ["k"], salt=4).collect())
    assert plain == salted
    # left join keeps unmatched big rows exactly once
    big2 = big.union(spark.createDataFrame([(9, "orphan")], "k int, payload string"))
    left = sorted((r["k"], r["payload"], r["dim"]) for r in salted_join(big2, small, ["k"], how="left", salt=4).collect())
    plain_left = sorted((r["k"], r["payload"], r["dim"]) for r in big2.join(small, ["k"], "left").collect())
    assert left == plain_left


def test_skew_report(spark):
    from aws_glue_cdc_metrics_job_spark.operators.relational import skew_report

    rows = [(i, "hot") for i in range(80)] + [(i, f"k{i % 4}") for i in range(20)]
    df = spark.createDataFrame(rows, "id long, key string")
    got = skew_report(df, ["key"], top=3, partitions=10).collect()
    assert [r["key"] for r in got] == ["hot", "k0", "k1"]
    top = got[0]
    assert top["N_ROWS"] == 80
    assert top["SHARE_PPM"] == 800000  # exact integer ppm
    assert top["SKEW_X_CENTI"] == 800  # 8.00x: 80 rows vs 10 rows/partition even load


def test_skew_report_take_ordered_plan(spark):
    from aws_glue_cdc_metrics_job_spark.operators.relational import skew_report

    df = spark.createDataFrame([(i, str(i % 7)) for i in range(50)], "id long, key string")
    plan = skew_report(df, ["key"], top=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


class TestBasketPairs:
    def test_lift_and_support(self, spark):
        from aws_glue_cdc_metrics_job_spark.operators.relational import basket_pairs

        rows = []
        # bread+butter together in 4 of 6 baskets; milk alone elsewhere
        for b in range(4):
            rows += [(b, "bread"), (b, "butter")]
        rows += [(4, "bread"), (4, "milk"), (5, "milk")]
        df = spark.createDataFrame(rows, "order_id long, item string")
        got = {
            (r["ITEM_A"], r["ITEM_B"]): r
            for r in basket_pairs(df, "order_id", "item", min_support=2).collect()
        }
        assert set(got) == {("bread", "butter")}
        r = got[("bread", "butter")]
        assert r["N_AB"] == 4 and r["N_A"] == 5 and r["N_B"] == 4
        assert abs(r["LIFT"] - (4 * 6) / (5 * 4)) < 1e-6

    def test_duplicate_lines_collapse(self, spark):
        from aws_glue_cdc_metrics_job_spark.operators.relational import basket_pairs

        # the same item twice in one basket must count once
        df = spark.createDataFrame(
            [(1, "x"), (1, "x"), (1, "y"), (2, "x"), (2, "y")],
            "order_id long, item string",
        )
        got = basket_pairs(df, "order_id", "item", min_support=2).collect()
        assert len(got) == 1 and got[0]["N_AB"] == 2 and got[0]["N_A"] == 2
