"""Semantic checks for the warehouse (TPC-H-shape) completion queries
(plans/queries_warehouse.py). Value-level parity is covered by the DuckDB
oracle gate; these tests pin the semantic invariants the oracle can't see
(threshold definitions, exclusion semantics, share bounds, argmin
minimality) by recomputing them independently from the base tables."""

from pyspark.sql import functions as F

from aws_glue_cdc_metrics_job_spark.plans import catalog
from aws_glue_cdc_metrics_job_spark.sources import read_table

catalog.load_all()


def q(name, spark, sf_dir):
    return catalog.QUERIES[name](spark, sf_dir)


def _net_cents_col():
    return F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5).cast(
        "long"
    )


def test_late_ship_orders_all_have_a_late_line(spark, sf_dir):
    rows = q("orders_late_ship_priority", spark, sf_dir).collect()
    total = sum(r.N_ORDERS for r in rows)
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    joined = o.join(li, o["o_orderkey"] == li["l_orderkey"]).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    late_orders = joined.select("o_orderkey").distinct().count()
    assert total == late_orders
    assert total <= o.count()


def test_market_share_bounded_and_consistent(spark, sf_dir):
    for r in q("nation_market_share", spark, sf_dir).collect():
        assert 0 <= r.FOCUS_CENTS <= r.TOTAL_CENTS
        assert 0.0 <= r.MKT_SHARE <= 1.0


def test_value_concentration_threshold_and_order(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(F.sum(_net_cents_col()).alias("v"))
    stats = pv.agg(F.sum("v").alias("t"), F.count(F.lit(1)).alias("n")).first()
    rows = q("part_value_concentration", spark, sf_dir).collect()
    expected = {
        r.l_partkey for r in pv.filter(F.col("v") * stats.n * 2 > 3 * stats.t).collect()
    }
    assert {r.PART_ID for r in rows} == expected
    vals = [r.VALUE_CENTS for r in rows]
    assert vals == sorted(vals, reverse=True)


def test_order_distribution_accounts_for_every_customer(spark, sf_dir):
    rows = q("customer_order_distribution", spark, sf_dir).collect()
    n_cust = read_table(spark, sf_dir, "customer").count()
    n_orders = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .count()
    )
    assert sum(r.N_CUSTOMERS for r in rows) == n_cust
    assert sum(r.N_ORDERS * r.N_CUSTOMERS for r in rows) == n_orders
    # the left join must keep zero-order customers as an explicit bucket
    # (at the smoke scale every customer may have orders; the bucket must
    # then be exactly the customers without a qualifying order: possibly 0)
    with_orders = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .select("o_custkey")
        .distinct()
        .count()
    )
    zero_bucket = next((r.N_CUSTOMERS for r in rows if r.N_ORDERS == 0), 0)
    assert zero_bucket == n_cust - with_orders


def test_promo_share_is_a_proper_fraction(spark, sf_dir):
    rows = q("promo_revenue_share", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.PROMO_CENTS <= r.TOTAL_CENTS
        assert 0.0 <= r.PROMO_SHARE <= 1.0


def test_top_supplier_is_the_argmax(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-04-01 00:00:00").cast("timestamp"))
    )
    best = (
        li.groupBy("l_suppkey")
        .agg(F.sum(_net_cents_col()).alias("rev"))
        .agg(F.max("rev"))
        .first()[0]
    )
    rows = q("top_supplier_revenue", spark, sf_dir).collect()
    assert rows and all(r.REV_CENTS == best for r in rows)


def test_supplier_diversity_excludes_complaint_list(spark, sf_dir):
    bad = {
        r.s_suppkey
        for r in read_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0.0)
        .collect()
    }
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    clean = (
        li.filter(~F.col("l_suppkey").isin(list(bad)) if bad else F.lit(True))
        .join(p, li["l_partkey"] == p["p_partkey"])
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & (F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 49))
        )
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("n"))
    )
    expected = {(r.p_brand, r.p_size, r.n) for r in clean.collect()}
    got = {(r.BRAND, r.SIZE, r.N_SUPPLIERS) for r in q("parts_supplier_diversity", spark, sf_dir).collect()}
    assert got == expected


def test_dominant_suppliers_share_exceeds_tenth(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sq")
    )
    pt = ps.groupBy("l_partkey").agg(F.sum("sq").alias("tq"))
    expected = (
        ps.join(pt, "l_partkey")
        .filter(F.col("sq") * 10 > F.col("tq"))
        .groupBy("l_suppkey")
        .count()
    )
    exp = {(r.l_suppkey, r["count"]) for r in expected.collect()}
    got = {(r.SUPP_ID, r.N_DOMINANT_PARTS) for r in q("dominant_part_suppliers", spark, sf_dir).collect()}
    assert got == exp


def test_sole_return_suppliers_orders_qualify(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    stats = {
        r.l_orderkey: (r.ns, r.nr)
        for r in li.groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("ns"),
            F.countDistinct(
                F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
            ).alias("nr"),
        )
        .collect()
    }
    # every (supplier, order) the query counts must satisfy the
    # EXISTS/NOT-EXISTS pair: >=2 suppliers, exactly 1 returning supplier
    r_pairs = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .collect()
    )
    per_supp = {}
    for row in r_pairs:
        ns, nr = stats[row.l_orderkey]
        if ns >= 2 and nr == 1:
            per_supp[row.l_suppkey] = per_supp.get(row.l_suppkey, 0) + 1
    top = sorted(per_supp.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r.SUPP_ID, r.N_ORDERS) for r in q("sole_return_suppliers", spark, sf_dir).collect()]
    assert got == top


def test_idle_rich_customers_are_idle_and_rich(spark, sf_dir):
    c = read_table(spark, sf_dir, "customer")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            )
        )
        .first()[0]
    )
    recent = {
        r.o_custkey
        for r in read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
        .distinct()
        .collect()
    }
    qualifying = c.filter(F.col("c_acctbal") > avg_bal).filter(
        ~F.col("c_custkey").isin(list(recent)) if recent else F.lit(True)
    )
    rows = q("idle_rich_customers", spark, sf_dir).collect()
    assert sum(r.N_CUSTOMERS for r in rows) == qualifying.count()


def test_cheapest_supplier_price_is_the_group_min(spark, sf_dir):
    rows = q("cheapest_supplier_per_part", spark, sf_dir).collect()
    assert rows
    # recompute the per-part min unit price over EU suppliers
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        s.join(n, s["s_nationkey"] == n["n_nationkey"])
        .join(r, F.col("n_regionkey") == r["r_regionkey"])
        .select("s_suppkey")
    )
    psu = (
        li.join(eu, li["l_suppkey"] == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(_net_cents_col()).alias("cents"),
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
        )
        .select("l_partkey", F.expr("cents * 10 div qty").alias("um"))
    )
    mins = {r2.l_partkey: r2.m for r2 in psu.groupBy("l_partkey").agg(F.min("um").alias("m")).collect()}
    for row in rows:
        assert row.UNIT_MILLI == mins[row.PART_ID]


def test_bucketed_recipe_pair_plans_and_values(spark, sf_dir):
    """The graded bucketed/shuffled twins: identical values, and the
    bucketed plan executes with ZERO Exchange (join AND the (ORDER_KEY,
    STATUS) agg are satisfied by the bucket partitioning on the key
    prefix), while the shuffled twin pays the fact shuffles."""
    from aws_glue_cdc_metrics_job_spark.plans.queries_warehouse import (
        q_orders_lineitem_revenue_bucketed,
        q_orders_lineitem_revenue_shuffled,
    )

    b = q_orders_lineitem_revenue_bucketed(spark, sf_dir)
    s = q_orders_lineitem_revenue_shuffled(spark, sf_dir)
    got = {(r["ORDER_KEY"], r["STATUS"]): r["NET_REVENUE"] for r in b.collect()}
    exp = {(r["ORDER_KEY"], r["STATUS"]): r["NET_REVENUE"] for r in s.collect()}
    assert got == exp and len(got) > 0
    bplan = b._jdf.queryExecution().executedPlan().toString()
    splan = s._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in bplan, bplan
    assert splan.count("Exchange hashpartitioning") >= 2
