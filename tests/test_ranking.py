"""Distributed sorted_rank / ntile_exact vs the naive global window.

The operator's contract is bit-equality with ROW_NUMBER()/NTILE() OVER
(ORDER BY ...) while keeping the hot path free of the SinglePartition
exchange those windows plan. Equality is checked on real sf0.001 frames
(with ties in the key) and on adversarial shapes (fewer rows than tiles,
all-equal keys, empty input); the plan property is checked on the
catalog query that motivated the operator."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from aws_glue_cdc_metrics_job_spark.operators.ranking import ntile_exact, sorted_rank
from aws_glue_cdc_metrics_job_spark.sources.parquet_io import read_table


def _rev(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents")
    )


def test_sorted_rank_matches_global_window(spark, sf_dir):
    rev = _rev(spark, sf_dir)
    got = sorted_rank(rev, "cents", ["o_custkey"], desc=True, buckets=8)
    w = Window.orderBy(F.col("cents").desc(), F.col("o_custkey"))
    want = rev.withColumn("RANK", F.row_number().over(w).cast("long"))
    assert got.subtract(want).count() == 0 and want.subtract(got).count() == 0


def test_sorted_rank_asc_with_ties(spark, sf_dir):
    ev = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("value", "event_id")
    )
    got = sorted_rank(ev, "value", ["event_id"], desc=False, buckets=16)
    w = Window.orderBy(F.col("value").asc(), F.col("event_id").asc())
    want = ev.withColumn("RANK", F.row_number().over(w).cast("long"))
    assert got.subtract(want).count() == 0 and want.subtract(got).count() == 0


def test_sorted_rank_total_col(spark, sf_dir):
    rev = _rev(spark, sf_dir)
    n = rev.count()
    got = sorted_rank(rev, "cents", ["o_custkey"], total_col="N")
    assert got.select("N").distinct().collect()[0][0] == n
    # rank is a permutation of 1..N
    assert got.agg(F.min("RANK"), F.max("RANK"), F.count_distinct("RANK")).collect()[
        0
    ] == (1, n, n)


@pytest.mark.parametrize("n,desc", [(4, False), (10, True), (3, True)])
def test_ntile_matches_window(spark, sf_dir, n, desc):
    rev = _rev(spark, sf_dir)
    got = ntile_exact(rev, n, key="cents", tiebreaks=["o_custkey"], desc=desc, buckets=8)
    order = [F.col("cents").desc() if desc else F.col("cents").asc(), "o_custkey"]
    want = rev.withColumn("TILE", F.ntile(n).over(Window.orderBy(*order)))
    assert got.subtract(want).count() == 0 and want.subtract(got).count() == 0


def test_ntile_fewer_rows_than_tiles(spark):
    df = spark.createDataFrame([(1, 10), (2, 20)], "id int, v int")
    got = ntile_exact(df, 5, key="v", tiebreaks=["id"])
    want = df.withColumn("TILE", F.ntile(5).over(Window.orderBy("v", "id")))
    assert got.subtract(want).count() == 0 and want.subtract(got).count() == 0


def test_ntile_all_equal_keys(spark):
    # every boundary collapses -> one bucket; rank falls back to the
    # tiebreak order and must still match the window exactly
    df = spark.createDataFrame([(i, 7) for i in range(23)], "id int, v int")
    got = ntile_exact(df, 4, key="v", tiebreaks=["id"])
    want = df.withColumn("TILE", F.ntile(4).over(Window.orderBy("v", "id")))
    assert got.subtract(want).count() == 0 and want.subtract(got).count() == 0


def test_sorted_rank_empty(spark):
    df = spark.createDataFrame([], "id int, v int")
    assert sorted_rank(df, "v", ["id"]).count() == 0


def test_catalog_ntile_plan_has_no_single_partition_exchange(spark):
    """The motivating fix: events_value_ntile's plan must not funnel the
    event frame through one reducer (VERDICT r3-era WindowExec warning)."""
    from aws_glue_cdc_metrics_job_spark.plans import catalog

    catalog.load_all()
    df = catalog.QUERIES["events_value_ntile"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_rank_percentiles_matches_percentile_disc(spark, sf_dir):
    ev = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("value", "event_id")
    )
    from aws_glue_cdc_metrics_job_spark.operators.ranking import rank_percentiles

    got = {
        r["Q_BP"]: (r["N"], r["VALUE"])
        for r in rank_percentiles(
            ev, key="value", tiebreaks=["event_id"], qs_bp=[2500, 5000, 9900]
        ).collect()
    }
    vals = sorted(r[0] for r in ev.select("value").collect())
    n = len(vals)
    for q in (2500, 5000, 9900):
        want = vals[-((-q * n) // 10000) - 1]  # value at rank ceil(q*n/1e4)
        assert got[q] == (n, want), q


def test_rank_percentiles_shared_rank_and_empty(spark):
    from aws_glue_cdc_metrics_job_spark.operators.ranking import rank_percentiles

    df = spark.createDataFrame([(1, 5.0), (2, 7.0)], "id int, v double")
    # with N=2 both 1bp and 4900bp hit rank 1: each still gets a row
    out = {
        r["Q_BP"]: r["VALUE"]
        for r in rank_percentiles(df, "v", ["id"], qs_bp=[1, 4900, 10000]).collect()
    }
    assert out == {1: 5.0, 4900: 5.0, 10000: 7.0}
    empty = spark.createDataFrame([], "id int, v double")
    assert rank_percentiles(empty, "v", ["id"], qs_bp=[5000]).count() == 0


class TestNdcgAtK:
    def test_matches_textbook_formula(self, spark):
        import math

        from aws_glue_cdc_metrics_job_spark.operators.ranking import (
            ndcg_at_k,
            ndcg_discounts_ppm,
        )
        from pyspark.sql import functions as F

        # system order by score desc: rels land [0, 2, 1, 3]
        rows = [(1, 9.0, 0), (2, 8.0, 2), (3, 7.0, 1), (4, 6.0, 3)]
        df = spark.createDataFrame(rows, "id long, score double, rel int")
        got = ndcg_at_k(
            df, "rel", [F.col("score").desc(), F.col("id")], k=4
        ).collect()[0]
        d = ndcg_discounts_ppm(4)
        assert d[0] == 10**6 and d == sorted(d, reverse=True)
        assert d[1] == int(10**6 / math.log2(3))
        dcg = 0 * d[0] + 2 * d[1] + 1 * d[2] + 3 * d[3]
        idcg = 3 * d[0] + 2 * d[1] + 1 * d[2] + 0 * d[3]
        assert got["DCG_PPM"] == dcg and got["IDCG_PPM"] == idcg
        assert got["NDCG_PPM"] == (dcg * 10**6) // idcg
        assert got["N_RANKED"] == 4 and got["K"] == 4

    def test_perfect_ranking_is_one(self, spark):
        from aws_glue_cdc_metrics_job_spark.operators.ranking import ndcg_at_k
        from pyspark.sql import functions as F

        rows = [(1, 9.0, 3), (2, 8.0, 2), (3, 7.0, 1)]
        df = spark.createDataFrame(rows, "id long, score double, rel int")
        got = ndcg_at_k(df, "rel", [F.col("score").desc(), F.col("id")], k=3).collect()[0]
        assert got["NDCG_PPM"] == 10**6

    def test_zero_relevance_reports_zero_not_div0(self, spark):
        from aws_glue_cdc_metrics_job_spark.operators.ranking import ndcg_at_k
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(1, 9.0, 0), (2, 8.0, 0)], "id long, score double, rel int")
        got = ndcg_at_k(df, "rel", [F.col("score").desc(), F.col("id")], k=5).collect()[0]
        assert got["DCG_PPM"] == 0 and got["IDCG_PPM"] == 0 and got["NDCG_PPM"] == 0
        assert got["N_RANKED"] == 2  # frame smaller than k
