"""Sequence packing (operators/packing.py): budget invariant, completeness,
determinism under re-partitioning, oversized-doc handling, utilization."""

import pytest
from pyspark.sql import functions as F

from aws_glue_cdc_metrics_job_spark.operators.packing import pack_sequences, pack_summary


@pytest.fixture(scope="module")
def sized(spark):
    # lengths 1..40 over 200 docs, plus one oversized doc
    rows = [(i, (i % 40) + 1) for i in range(200)] + [(999, 5000)]
    return spark.createDataFrame(rows, "doc_id long, N_TOKENS long")


def test_every_doc_assigned_once(spark, sized):
    packed = pack_sequences(sized, budget=100, num_shards=4)
    ids = [r["doc_id"] for r in packed.select("doc_id").collect()]
    assert sorted(ids) == sorted(r["doc_id"] for r in sized.collect())


def test_budget_invariant(spark, sized):
    packed = pack_sequences(sized, budget=100, num_shards=4)
    over = (
        pack_summary(packed)
        .filter((F.col("TOTAL_TOKENS") > 100) & (F.col("N_DOCS") > 1))
        .count()
    )
    assert over == 0  # only single-doc packs may exceed the budget


def test_oversized_doc_gets_own_pack(spark, sized):
    packed = pack_sequences(sized, budget=100, num_shards=4)
    s = pack_summary(packed)
    big = packed.filter(F.col("doc_id") == 999).collect()[0]
    row = s.filter(F.col("PACK_ID") == big["PACK_ID"]).collect()[0]
    assert row["N_DOCS"] == 1 and row["TOTAL_TOKENS"] == 5000


def test_deterministic_under_repartition(spark, sized):
    a = {(r["doc_id"], r["PACK_ID"], r["PACK_POS"])
         for r in pack_sequences(sized, budget=100, num_shards=4).collect()}
    b = {(r["doc_id"], r["PACK_ID"], r["PACK_POS"])
         for r in pack_sequences(sized.repartition(13), budget=100, num_shards=4).collect()}
    assert a == b


def test_pack_pos_sequential(spark, sized):
    packed = pack_sequences(sized, budget=100, num_shards=4)
    bad = (
        packed.groupBy("PACK_ID")
        .agg(F.count("*").alias("n"), F.max("PACK_POS").alias("mx"), F.min("PACK_POS").alias("mn"))
        .filter((F.col("mn") != 0) | (F.col("mx") != F.col("n") - 1))
        .count()
    )
    assert bad == 0


def test_utilization_bound(spark):
    # next-fit guarantees >= 50% utilization on closed packs when all docs
    # fit the budget; with uniform small docs it should do much better
    rows = [(i, (i % 30) + 1) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, N_TOKENS long")
    packed = pack_sequences(df, budget=120, num_shards=8)
    s = pack_summary(packed).collect()
    total = sum(r["TOTAL_TOKENS"] for r in s)
    assert total / (len(s) * 120) > 0.6


def test_rejects_bad_budget(spark, sized):
    with pytest.raises(ValueError):
        pack_sequences(sized, budget=0)
