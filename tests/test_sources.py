"""Source-layer regression tests (SURVEY.md S3).

The round-1 correctness gate failed all 15 events-based queries because
read_table only worked when the session had been built by the engine's own
get_spark (which pre-sets spark.sql.legacy.parquet.nanosAsLong). The driver
harness uses a vanilla SparkSession, so the NANOS column threw
PARQUET_TYPE_ILLEGAL. read_table now sets the conf at read time; these tests
pin that by clearing the conf first, exactly reproducing a vanilla session's
state for this key.
"""

import pytest

from aws_glue_cdc_metrics_job_spark.sources.parquet_io import read_table

NANOS_KEY = "spark.sql.legacy.parquet.nanosAsLong"


def test_read_events_without_preset_nanos_conf(spark, sf_dir):
    spark.conf.unset(NANOS_KEY)
    # sanity: a direct read in this state reproduces the round-1 failure
    with pytest.raises(Exception, match="PARQUET_TYPE_ILLEGAL"):
        spark.read.parquet(f"{sf_dir}/events.parquet").schema
    df = read_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.count() > 0
    assert spark.conf.get(NANOS_KEY) == "true"


def test_read_events_ts_is_microsecond_truncated(spark, sf_dir):
    # ns -> us floor division must agree with DuckDB's truncation
    import duckdb

    df = read_table(spark, sf_dir, "events").select("event_id", "ts").orderBy("event_id").limit(5)
    got = [(r.event_id, r.ts.isoformat()) for r in df.collect()]
    con = duckdb.connect()
    want = con.execute(
        f"SELECT event_id, CAST(ts AS TIMESTAMP) FROM '{sf_dir}/events.parquet' ORDER BY event_id LIMIT 5"
    ).fetchall()
    want = [(i, t.isoformat()) for i, t in want]
    assert got == want
