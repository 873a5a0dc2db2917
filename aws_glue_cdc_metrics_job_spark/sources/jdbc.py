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


def sqlserver_url(
    host: str,
    port: int = 1433,
    database: str | None = None,
    encrypt: bool = True,
    trust_server_certificate: bool = False,
) -> str:
    """The open-Spark image of the reference's Glue
    ``connection_type="sqlserver"`` connection (scripts/cdc_metrics_job.py
    :59-76): a standard ``jdbc:sqlserver://`` URL for Spark's built-in
    JDBC source with the Microsoft driver. The Glue ``connectionName`` /
    ``useConnectionProperties`` indirection becomes explicit host/port/
    database arguments (credentials belong in reader options, never the
    URL, so they can't leak into plan strings or logs)."""
    for part in (host, str(database or "")):
        if ";" in part or "=" in part:
            raise ValueError(f"invalid sqlserver URL component: {part!r}")
    url = f"jdbc:sqlserver://{host}:{int(port)}"
    props = []
    if database is not None:
        props.append(f"databaseName={database}")
    props.append(f"encrypt={'true' if encrypt else 'false'}")
    if trust_server_certificate:
        props.append("trustServerCertificate=true")
    return url + ";" + ";".join(props)


def sqlserver_read(
    spark: SparkSession,
    host: str,
    table: str | None = None,
    query: str | None = None,
    port: int = 1433,
    database: str | None = None,
    user: str | None = None,
    password: str | None = None,
    **kwargs,
) -> DataFrame:
    """SQL Server read through the generic :func:`jdbc_read` builder --
    the full-scan (``dbtable``) and watermark-pushdown (``customSql`` ->
    ``query``, built via :func:`incremental_query`) paths of the
    reference's three-table ingest. Driver class is pinned so the read
    fails fast with a clear error when the jar is absent rather than
    falling through to URL guessing. Same parallel-read contract as
    jdbc_read: pass partition_column/bounds for anything big."""
    opts = dict(kwargs, driver="com.microsoft.sqlserver.jdbc.SQLServerDriver")
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    return jdbc_read(
        spark,
        sqlserver_url(host, port=port, database=database),
        table=table,
        query=query,
        **opts,
    )
