"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The actual catalog lives in aws_glue_cdc_metrics_job_spark/plans/
(catalog.py + queries_*.py); this module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from aws_glue_cdc_metrics_job_spark.plans import catalog

catalog.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (fact_ltv_daily: join + agg + cumulative window) on
    /root/testdata/sf0.001."""
    return catalog.QUERIES["fact_ltv_daily"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return catalog.ordered_queries()


def oracle_sql() -> dict[str, str]:
    return dict(catalog.ORACLE)
