"""Benchmark decontamination: flag corpus documents that share word n-grams
with an evaluation/benchmark set (the standard test-set-overlap check run
before LLM training, cf. GPT-3 appendix C / PaLM sec. 8: 8-13-gram overlap).

Shape, not UDFs: tokenize -> n-gram -> md5 -> equi-join. At 100 TB the
benchmark side is tiny (eval sets are MBs), so Catalyst broadcasts its
distinct-gram set and the corpus side never shuffles: tokenization, n-gram
expansion and the hash join all run inside the corpus scan stage. The
explode multiplies corpus rows by ~tokens-per-doc, but each exploded row is
a single 32-char hash, and the per-doc hit count collapses it right back
(partial aggregation before the single doc_id shuffle).

md5 (not xxhash64) keeps gram identity engine-portable, so the whole
operator is oracle-checkable in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens


def ngram_hashes(
    df: DataFrame,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "NGRAM_H",
    distinct: bool = True,
) -> DataFrame:
    """(id, md5-of-space-joined-word-n-gram) pairs, distinct per doc by
    default. ``distinct=False`` skips the dedup shuffle -- use it when a
    downstream filter (e.g. the benchmark-gram join) prunes the stream
    first and deduplication can run on the pruned remainder instead.

    Shape matters: positions explode FIRST and the md5(concat_ws(slice))
    runs as a plain projected expression, which stays inside whole-stage
    codegen. The tempting one-liner -- ``transform(sequence(...), i ->
    md5(...))`` -- evaluates the lambda on Catalyst's interpreted path and
    measured ~20x slower at sf0.1 (SCALE.md "Codegen discipline").

    The filter guards Spark's ``sequence(1, 0)``, which counts DOWN, so
    short documents contribute no rows rather than a bogus descending
    range."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    pos = (
        df.select(F.col(id_col), tokens(text_col).alias("__t"))
        .filter(F.size("__t") >= n)
        .select(
            F.col(id_col),
            F.col("__t"),
            F.explode(F.sequence(F.lit(1), F.size("__t") - (n - 1))).alias("__i"),
        )
    )
    grams = pos.select(
        F.col(id_col),
        F.md5(F.concat_ws(" ", F.expr(f"slice(__t, __i, {n})"))).alias(out_col),
    )
    return grams.dropDuplicates([id_col, out_col]) if distinct else grams


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per corpus document: how many of its distinct n-grams appear anywhere
    in the benchmark set, and a CONTAMINATED flag (any overlap).

    Returns (id_col, N_HIT_NGRAMS, CONTAMINATED) with one row per corpus
    document -- clean documents included with a zero count, so the output is
    directly joinable as a filter column.

    The benchmark gram set is deduplicated globally before the join: a gram
    occurring in many benchmark docs must count once per corpus doc. The
    corpus side is NOT pre-deduplicated -- the broadcast join filters the
    raw gram stream inside the scan stage first (matches are rare by
    assumption), and the per-doc distinct runs on that tiny remainder via
    countDistinct. Skipping the full-corpus dedup shuffle cut the 10x
    scale point from 10.7s to 6.3s (the remainder is the per-gram md5 in
    the scan stage -- linear, no shuffle).
    """
    bench_grams = (
        ngram_hashes(benchmark, n, id_col=id_col, text_col=text_col)
        .select("NGRAM_H")
        .distinct()
    )
    corpus_grams = ngram_hashes(
        corpus, n, id_col=id_col, text_col=text_col, distinct=False
    )
    hits = (
        corpus_grams.join(F.broadcast(bench_grams), "NGRAM_H")
        .groupBy(id_col)
        .agg(F.countDistinct("NGRAM_H").alias("N_HIT_NGRAMS"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("N_HIT_NGRAMS"), F.lit(0)).cast("long").alias("N_HIT_NGRAMS"),
            (F.coalesce(F.col("N_HIT_NGRAMS"), F.lit(0)) > 0).alias("CONTAMINATED"),
        )
    )
