"""Property-based invariants for the training-data operators (hypothesis):

- pack_sequences assigns every doc exactly once and never exceeds the
  budget on multi-doc packs, for arbitrary length distributions/budgets;
- decontaminate's per-doc hit count equals the exact distinct-gram
  intersection with the benchmark set, for arbitrary corpora.

Each example spins Spark jobs, so examples are few; deterministic edge
cases (and the sampling/split determinism properties) live in the unit
tests."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aws_glue_cdc_metrics_job_spark.operators.decontam import decontaminate, ngram_hashes
from aws_glue_cdc_metrics_job_spark.operators.packing import pack_sequences, pack_summary

LENGTHS = st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=60)
WORDS = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"])
DOC = st.lists(WORDS, min_size=0, max_size=12).map(" ".join)


@pytest.mark.slow
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(lengths=LENGTHS, budget=st.integers(min_value=16, max_value=256))
def test_packing_invariants(spark, lengths, budget):
    rows = list(enumerate(lengths))
    df = spark.createDataFrame(rows, "doc_id long, N_TOKENS long")
    packed = pack_sequences(df, budget=budget, num_shards=3)
    got = packed.collect()
    # exhaustive, exactly-once assignment
    assert sorted(r["doc_id"] for r in got) == sorted(i for i, _ in rows)
    # budget invariant on multi-doc packs
    over = (
        pack_summary(packed)
        .filter((F.col("TOTAL_TOKENS") > budget) & (F.col("N_DOCS") > 1))
        .count()
    )
    assert over == 0


@pytest.mark.slow
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=st.lists(DOC, min_size=1, max_size=8), bench=st.lists(DOC, min_size=1, max_size=4))
def test_decontaminate_invariants(spark, docs, bench):
    n = 2
    corpus_df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    bench_df = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(bench)], "doc_id long, text string"
    )
    flags = {r["doc_id"]: r for r in decontaminate(corpus_df, bench_df, n=n).collect()}
    grams = {
        r["doc_id"]: set()
        for r in corpus_df.collect()
    }
    for r in ngram_hashes(corpus_df, n).collect():
        grams[r["doc_id"]].add(r["NGRAM_H"])
    bench_grams = {r["NGRAM_H"] for r in ngram_hashes(bench_df, n).collect()}
    assert set(flags) == set(grams)  # every corpus doc flagged exactly once
    for d, row in flags.items():
        expect = len(grams[d] & bench_grams)
        assert row["N_HIT_NGRAMS"] == expect
        assert row["CONTAMINATED"] == (expect > 0)
