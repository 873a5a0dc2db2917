"""CLI entry point (python -m aws_glue_cdc_metrics_job_spark)."""

import pytest

from aws_glue_cdc_metrics_job_spark.__main__ import main


def test_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "fact_ltv_daily\toracle" in out
    assert len(out.strip().splitlines()) >= 85


def test_query_to_parquet(spark, tmp_path):
    out = str(tmp_path / "res")
    assert main(["query", "pricing_summary", "--out", out]) == 0
    assert spark.read.parquet(out).count() > 0


def test_query_unknown(capsys):
    assert main(["query", "no_such_query"]) == 2


@pytest.mark.slow  # ~4 min: excluded from the default suite (pytest.ini); run with -m ""
def test_pipeline_end_to_end(spark, tmp_path):
    zones = str(tmp_path / "zones")
    assert (
        main(
            [
                "pipeline",
                "--zones", zones,
                "--sf-dir", "/root/testdata/sf0.001",
                "--run-ts", "2001-12-01 00:00:00",
            ]
        )
        == 0
    )
    marts = spark.read.parquet(f"{zones}/gold/fact_ltv_daily")
    assert marts.count() > 0
