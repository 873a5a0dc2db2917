"""Spark's own runtime Bloom filter (InjectRuntimeFilter) -- the built-in
counterpart of operators/bloom.py -- works under this engine's sessions,
and its gating conditions are pinned so the 100 TB recipe is executable:

* selective creation-side predicate + shuffle join + thresholds met
  -> `might_contain` appears in the optimized plan;
* the local-mode parallelism floor's Repartition (sources.read_table)
  SUPPRESSES injection -- a documented local-only trade: the floor only
  fires on single-split small files, where the runtime filter saves
  nothing; production multi-split scans take neither the floor nor the
  suppression (SCALE.md round-5 notes).
"""

import pytest


@pytest.fixture()
def rf_confs(spark):
    keys = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1B",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        spark.conf.set(k, v)


SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_runtime_bloom_filter_injects_on_plain_scans(rf_confs):
    spark = rf_confs
    o = spark.read.parquet(f"{SF}/orders.parquet").where("o_orderpriority = '1-URGENT'")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count()
    plan = _plan(j)
    assert "might_contain" in plan and "bloom_filter_agg" in plan
    # and the result equals the uninfluenced join (the filter is semantics-free)
    rows = {(r["o_orderstatus"], r["count"]) for r in j.collect()}
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    try:
        base = {(r["o_orderstatus"], r["count"]) for r in j.collect()}
    finally:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    assert rows == base


def test_parallelism_floor_suppresses_injection_locally(rf_confs):
    """The floor's Repartition above the scan blocks InjectRuntimeFilter's
    app-side lineage check. Pinned so a future floor change that CLEARS
    this (e.g. repartitioning after the join instead) is noticed."""
    from aws_glue_cdc_metrics_job_spark.sources import read_table

    spark = rf_confs
    o = read_table(spark, SF, "orders").where("o_orderpriority = '1-URGENT'")
    li = read_table(spark, SF, "lineitem")
    j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count()
    assert "might_contain" not in _plan(j)
