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


def test_sqlserver_url_shape():
    from aws_glue_cdc_metrics_job_spark.sources.jdbc import sqlserver_url

    url = sqlserver_url("db.internal", 1433, database="sales")
    assert url == "jdbc:sqlserver://db.internal:1433;databaseName=sales;encrypt=true"
    url2 = sqlserver_url("h", database="d", encrypt=False, trust_server_certificate=True)
    assert url2.endswith("encrypt=false;trustServerCertificate=true")
    with pytest.raises(ValueError):
        sqlserver_url("h;databaseName=evil")


def test_sqlserver_read_fails_on_driver_not_plumbing(spark):
    from aws_glue_cdc_metrics_job_spark.sources.jdbc import incremental_query, sqlserver_read

    # the reference's order_items watermark path: customSql -> query
    q = incremental_query("order_items", "CREATION_TIME_UTC", "2024-01-01 00:00:00")
    with pytest.raises(Exception) as ei:
        sqlserver_read(spark, "localhost", query=q, database="x", user="u", password="p")
    msg = str(ei.value)
    assert "SQLServerDriver" in msg or "driver" in msg.lower() or "No suitable" in msg
    # credentials stay out of the URL
    from aws_glue_cdc_metrics_job_spark.sources.jdbc import sqlserver_url
    assert "password" not in sqlserver_url("localhost", database="x")
