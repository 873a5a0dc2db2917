"""CurationPipeline end-to-end: zones written, stage counts consistent,
outputs agree with the graded catalog queries over the same input."""

import pytest
from pyspark.sql import functions as F

from aws_glue_cdc_metrics_job_spark.curation import CurationConfig, CurationPipeline
from aws_glue_cdc_metrics_job_spark.sources import read_table


@pytest.fixture(scope="module")
def run(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("curation"))
    docs = read_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    pipe = CurationPipeline(spark, root, CurationConfig(pack_budget=128, pack_shards=4))
    stats = pipe.run(corpus, bench)
    return pipe, stats


def test_zones_written_and_counts_consistent(spark, run):
    pipe, stats = run
    curated = spark.read.parquet(pipe.zone("curated"))
    encoded = spark.read.parquet(pipe.zone("encoded"))
    packed = spark.read.parquet(pipe.zone("packed"))
    assert stats["n_curated"] == curated.count() > 0
    assert stats["n_encoded"] == encoded.count() == stats["n_curated"]
    assert packed.count() == stats["n_encoded"]  # every doc packed exactly once
    srow = spark.read.parquet(pipe.zone("stats")).collect()[0]
    assert srow["n_packs"] == stats["n_packs"]


def test_curated_zone_matches_catalog_query(spark, sf_dir, run):
    from aws_glue_cdc_metrics_job_spark.plans import catalog

    catalog.load_all()
    pipe, _ = run
    curated = {r["doc_id"] for r in spark.read.parquet(pipe.zone("curated")).collect()}
    graded = {r["DOC_ID"] for r in catalog.QUERIES["docs_curation_pipeline"](spark, sf_dir).collect()}
    assert curated == graded


def test_packed_budget_invariant(spark, run):
    pipe, _ = run
    packed = spark.read.parquet(pipe.zone("packed"))
    over = (
        packed.groupBy("PACK_ID")
        .agg(F.count("*").alias("n"), F.sum("N_TOKENS").alias("tot"))
        .filter((F.col("tot") > 128) & (F.col("n") > 1))
        .count()
    )
    assert over == 0
