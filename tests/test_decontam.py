"""Benchmark decontamination (operators/decontam.py): hand-computed n-gram
overlap, short-document edge, benchmark-side dedup semantics."""

import pytest
from pyspark.sql import functions as F

from aws_glue_cdc_metrics_job_spark.operators.decontam import decontaminate, ngram_hashes


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "a b c d e"),        # shares 'b c d' and 'c d e' with bench doc 100
        (2, "x y z w"),          # clean
        (3, "b c"),              # shorter than n=3 -> zero grams, clean
        (4, "c d e c d e"),      # distinct grams: dup grams count once
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def bench(spark):
    rows = [
        (100, "b c d e"),        # grams: 'b c d', 'c d e'
        (101, "c d e"),          # duplicates bench gram 'c d e' -> still one hit
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_hashes_counts(spark, corpus):
    got = (
        ngram_hashes(corpus, 3).groupBy("doc_id").count().collect()
    )
    counts = {r["doc_id"]: r["count"] for r in got}
    # doc 1: 3 grams; doc 2: 2; doc 3: too short (absent); doc 4: tokens
    # c d e c d e -> grams cde, dec, ecd, cde -> 3 distinct
    assert counts == {1: 3, 2: 2, 4: 3}


def test_decontaminate_hand_computed(corpus, bench):
    got = {r["doc_id"]: r for r in decontaminate(corpus, bench, n=3).collect()}
    assert set(got) == {1, 2, 3, 4}  # every corpus doc present
    assert got[1]["N_HIT_NGRAMS"] == 2 and got[1]["CONTAMINATED"]
    assert got[2]["N_HIT_NGRAMS"] == 0 and not got[2]["CONTAMINATED"]
    assert got[3]["N_HIT_NGRAMS"] == 0 and not got[3]["CONTAMINATED"]
    # doc 4 hits only 'c d e' (once, despite both sides repeating it)
    assert got[4]["N_HIT_NGRAMS"] == 1 and got[4]["CONTAMINATED"]


def test_decontaminate_n1_token_overlap(spark, corpus, bench):
    # n=1 degenerates to shared-vocabulary flagging
    got = {r["doc_id"]: r["N_HIT_NGRAMS"] for r in decontaminate(corpus, bench, n=1).collect()}
    assert got[1] == 4  # b c d e
    assert got[2] == 0
    assert got[3] == 2  # b c
    assert got[4] == 3  # c d e


def test_ngram_hashes_rejects_bad_n(corpus):
    with pytest.raises(ValueError):
        ngram_hashes(corpus, 0)


def test_broadcast_in_plan(corpus, bench):
    plan = decontaminate(corpus, bench, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # benchmark gram set must broadcast
