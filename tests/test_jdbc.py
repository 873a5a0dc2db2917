"""JDBC source builders (SURVEY.md S1/S2): no driver jar ships in this
environment, so these exercise construction/validation up to the load()
boundary; watermark-pushdown semantics are covered on parquet by
tests/test_state.py."""

import pytest

from aws_glue_cdc_metrics_job_spark.sources.jdbc import incremental_query, jdbc_read


def test_incremental_query_shape():
    q = incremental_query("order_items", "CREATION_TIME_UTC", "2024-01-02 09:00:00")
    assert q == "SELECT * FROM order_items WHERE CREATION_TIME_UTC >= '2024-01-02 09:00:00'"


def test_incremental_query_rejects_quote_injection():
    with pytest.raises(ValueError):
        incremental_query("t", "ts", "2024' OR '1'='1")


def test_jdbc_read_requires_exactly_one_source(spark):
    with pytest.raises(ValueError):
        jdbc_read(spark, "jdbc:sqlserver://h", table="t", query="SELECT 1")
    with pytest.raises(ValueError):
        jdbc_read(spark, "jdbc:sqlserver://h")


def test_jdbc_read_fails_cleanly_without_driver(spark):
    # construction reaches the JDBC layer and fails on the missing driver,
    # not on our option plumbing
    with pytest.raises(Exception) as ei:
        jdbc_read(
            spark,
            "jdbc:sqlserver://localhost;database=x",
            table="t",
            partition_column="id",
            lower_bound=0,
            upper_bound=100,
            num_partitions=4,
        )
    assert "driver" in str(ei.value).lower() or "No suitable" in str(ei.value)
