"""JDBC source (SURVEY.md S1/S2).

The reference ingests three SQL Server tables through Glue's DynamicFrame
connector, shipping the high-watermark predicate into the source query
(scripts/cdc_metrics_job.py:57-76, ``customSql``). The open-Spark equivalent
is the built-in ``jdbc`` format with either ``dbtable`` (full scan) or
``query`` (pushdown). No JDBC driver jar ships in this environment, so these
builders are exercised only up to plan construction in tests; the semantics
(watermark pushdown) are covered by the parquet-backed
:func:`~..operators.incremental.incremental_read` path instead.

Scale notes: a single-connection JDBC read is a 1-task bottleneck; for large
tables always pass ``partition_column/num_partitions/lower/upper`` so Spark
issues N range-partitioned queries in parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_read(
    spark: SparkSession,
    url: str,
    table: str | None = None,
    query: str | None = None,
    partition_column: str | None = None,
    lower_bound: str | int | None = None,
    upper_bound: str | int | None = None,
    num_partitions: int | None = None,
    **options: str,
) -> DataFrame:
    if (table is None) == (query is None):
        raise ValueError("pass exactly one of table= or query=")
    reader = spark.read.format("jdbc").option("url", url)
    if table is not None:
        reader = reader.option("dbtable", table)
    else:
        reader = reader.option("query", query)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


_IDENT = __import__("re").compile(r"^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)*$")


def incremental_query(table: str, ts_col: str, watermark: str) -> str:
    """The reference's watermark pushdown query
    (scripts/cdc_metrics_job.py:64) built safely: the watermark value is
    quote-checked AND the interpolated identifiers are validated, so a
    config-sourced table/column name can't smuggle SQL into the source."""
    if "'" in watermark:
        raise ValueError("invalid watermark")
    for ident in (table, ts_col):
        if not _IDENT.match(ident):
            raise ValueError(f"invalid SQL identifier: {ident!r}")
    return f"SELECT * FROM {table} WHERE {ts_col} >= '{watermark}'"
