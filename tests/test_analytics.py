"""Semantic checks for the standard-analytics extension queries
(plans/queries_analytics.py). Value-level parity is covered by the DuckDB
oracle gate; these tests pin the invariants the oracle can't see."""

from pyspark.sql import functions as F

from aws_glue_cdc_metrics_job_spark.plans import catalog

catalog.load_all()


def q(name, spark, sf_dir):
    return catalog.QUERIES[name](spark, sf_dir)


def test_intersect_is_subset_of_both_sides(spark, sf_dir):
    inter = {r.CUST_ID for r in q("orders_intersect_custkeys", spark, sf_dir).collect()}
    from aws_glue_cdc_metrics_job_spark.sources import read_table

    o = read_table(spark, sf_dir, "orders")
    f_keys = {r.o_custkey for r in o.filter(F.col("o_orderstatus") == "F").collect()}
    o_keys = {r.o_custkey for r in o.filter(F.col("o_orderstatus") == "O").collect()}
    assert inter == f_keys & o_keys


def test_pivot_rows_sum_to_group_counts(spark, sf_dir):
    from aws_glue_cdc_metrics_job_spark.sources import read_table

    piv = q("orders_priority_pivot", spark, sf_dir).collect()
    counts = {
        r.o_orderstatus: r["count"]
        for r in read_table(spark, sf_dir, "orders").groupBy("o_orderstatus").count().collect()
    }
    for r in piv:
        assert sum(v for k, v in r.asDict().items() if k != "STATUS") == counts[r.STATUS]


def test_unpivot_is_lossless_melt(spark, sf_dir):
    rows = q("pricing_unpivot", spark, sf_dir).collect()
    flags = {r.RETURN_FLAG for r in rows}
    # every flag carries exactly the three metrics
    per_flag = {}
    for r in rows:
        per_flag.setdefault(r.RETURN_FLAG, set()).add(r.METRIC)
    assert all(m == {"sum_qty", "sum_base_price", "sum_discount"} for m in per_flag.values())
    assert len(rows) == 3 * len(flags)


def test_ntile_buckets_balanced(spark, sf_dir):
    rows = {r.BUCKET: r for r in q("events_value_ntile", spark, sf_dir).collect()}
    assert set(rows) == {1, 2, 3, 4}
    sizes = [rows[b].N for b in (1, 2, 3, 4)]
    assert max(sizes) - min(sizes) <= 1  # ntile guarantee
    # bucket value ranges are non-overlapping and ordered
    for b in (1, 2, 3):
        assert rows[b].MAX_VALUE <= rows[b + 1].MIN_VALUE


def test_grouping_sets_flags(spark, sf_dir):
    rows = q("orders_grouping_sets", spark, sf_dir).collect()
    # three shapes: by status (g=0,1), by priority (g=1,0), grand total (1,1)
    shapes = {(r.G_STATUS, r.G_PRIORITY) for r in rows}
    assert shapes == {(0, 1), (1, 0), (1, 1)}
    total = [r.N for r in rows if (r.G_STATUS, r.G_PRIORITY) == (1, 1)]
    by_status = sum(r.N for r in rows if (r.G_STATUS, r.G_PRIORITY) == (0, 1))
    assert len(total) == 1 and total[0] == by_status


def test_trailing7d_includes_own_value(spark, sf_dir):
    df = q("events_lead_trailing7d", spark, sf_dir)
    bad = df.filter(F.col("TRAILING_7D_VALUE") < F.lit(0)).count()
    assert bad == 0
    # GAP_US is strictly positive where present (ties broken by event_id
    # still have non-negative gaps)
    assert df.filter(F.col("GAP_US") < 0).count() == 0


def test_json_props_extraction(spark, sf_dir):
    rows = q("events_json_props", spark, sf_dir).collect()
    assert all(r.SUM_K is not None and r.N_WITH_K > 0 for r in rows)


def test_event_type_profile_sorted_distinct(spark, sf_dir):
    for r in q("users_event_type_profile", spark, sf_dir).collect():
        types = r.EVENT_TYPES.split(",")
        assert types == sorted(types)
        assert len(types) == len(set(types)) == r.N_TYPES


class TestClassicJoinShapes:
    def test_shipping_priority_plan(self, spark, sf_dir):
        from aws_glue_cdc_metrics_job_spark.plans import catalog

        catalog.load_all()
        plan = (
            catalog.QUERIES["orders_shipping_priority"](spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # global top-10 must be TakeOrderedAndProject, never a full sort
        assert "TakeOrderedAndProject" in plan
        assert "CartesianProduct" not in plan

    def test_region_volume_rows(self, spark, sf_dir):
        from aws_glue_cdc_metrics_job_spark.plans import catalog

        catalog.load_all()
        rows = catalog.QUERIES["region_nation_volume"](spark, sf_dir).collect()
        # one row per ASIA nation present; revenue strictly positive
        assert 0 < len(rows) <= 5
        assert all(r["REVENUE"] > 0 and r["N_LINES"] > 0 for r in rows)
