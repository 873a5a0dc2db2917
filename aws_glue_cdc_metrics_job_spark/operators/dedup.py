"""Deduplication operators for large-scale text/training-data pipelines.

Beyond the reference's row-level ``dropDuplicates``
(scripts/cdc_metrics_job.py:78,139), these cover the document-dedup ladder a
100TB corpus pipeline needs: exact (content hash), near-dup via n-gram
Jaccard with blocking, MinHash+LSH (banding via pyspark.ml), and SimHash.

Scale design notes:
- Exact dedup shuffles a 32-char digest, not the document body.
- Pairwise Jaccard is only ever computed *within blocks* (LSH bands or
  caller-supplied blocking keys) -- never a global cross join.
- All token/shingle work uses built-in higher-order functions (JVM,
  codegen), no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import rhu
from .relational import keep_latest

# Normalization shared by fingerprint/shingle ops: collapse whitespace,
# lowercase, trim. (Deliberately simple + deterministic.)


def normalized_text(col: str = "text") -> F.Column:
    return F.lower(F.trim(F.regexp_replace(F.col(col), r"\s+", " ")))


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "FINGERPRINT") -> DataFrame:
    """Content fingerprint = md5 of normalized text. md5 (not xxhash) so the
    digest is portable across engines for oracle checks."""
    return df.withColumn(out_col, F.md5(normalized_text(text_col)))


def exact_dedup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct content fingerprint
    with the surviving (min id) document and the duplicate count."""
    return (
        fingerprint(df, text_col)
        .groupBy("FINGERPRINT")
        .agg(
            F.min(id_col).alias("KEEP_ID"),
            F.count(F.lit(1)).alias("N_DOCS"),
        )
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Survivor rows only: deterministic min-id per content fingerprint."""
    return keep_latest(fingerprint(df, text_col), ["FINGERPRINT"], [F.col(id_col)]).drop("FINGERPRINT")


def word_shingles(df: DataFrame, text_col: str = "text", n: int = 3, out_col: str = "shingles") -> DataFrame:
    """Distinct word n-gram shingles as an array column, via higher-order
    functions (no UDF). Documents shorter than n words get an empty array."""
    toks = F.split(normalized_text(text_col), " ")
    grams = F.expr(
        f"""CASE WHEN size(__toks) < {n} THEN array()
             ELSE transform(sequence(0, size(__toks) - {n}),
                            i -> concat_ws(' ', slice(__toks, i + 1, {n}))) END"""
    )
    return (
        df.withColumn("__toks", toks)
        .withColumn(out_col, F.array_distinct(grams))
        .drop("__toks")
    )


def jaccard(a: str, b: str) -> F.Column:
    """|A ∩ B| / |A ∪ B| over two distinct-element array columns."""
    inter = F.size(F.array_intersect(F.col(a), F.col(b)))
    union = F.size(F.array_union(F.col(a), F.col(b)))
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    blocking_cols: list[str] | None = None,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate candidate pairs by word n-gram Jaccard, computed only
    within blocks (``blocking_cols``). Blocking is the scale lever: the join
    is an equi-join on the block key, so Catalyst shuffles each block to one
    place and the quadratic comparison stays bounded per block."""
    blocking_cols = blocking_cols or []
    sh = word_shingles(df, text_col, n).select(
        F.col(id_col), *[F.col(c) for c in blocking_cols], F.col("shingles")
    )
    a = sh.select(
        F.col(id_col).alias("ID_A"),
        *[F.col(c).alias(f"__bk_{c}") for c in blocking_cols],
        F.col("shingles").alias("sh_a"),
    )
    b = sh.select(
        F.col(id_col).alias("ID_B"),
        *[F.col(c).alias(f"__bk_{c}") for c in blocking_cols],
        F.col("shingles").alias("sh_b"),
    )
    on = [f"__bk_{c}" for c in blocking_cols]
    pairs = a.join(b, on) if on else a.crossJoin(b)
    return (
        pairs.filter(F.col("ID_A") < F.col("ID_B"))
        .withColumn("JACCARD", rhu(jaccard("sh_a", "sh_b"), 6))
        .filter(F.col("JACCARD") >= threshold)
        .select("ID_A", "ID_B", "JACCARD")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hash_tables: int = 8,
    num_features: int = 1 << 18,
    threshold: float = 0.6,
    seed: int = 42,
) -> DataFrame:
    """MinHash+LSH near-dup pairs via pyspark.ml (shingle -> hashed feature
    vector -> MinHash signatures -> banded self-join). Returns candidate
    pairs with estimated Jaccard *distance* <= threshold.

    This is the 100TB path: cost is O(docs x signature), and the self-join
    shuffles only (band, hash) keys, never document bodies. Deterministic for
    a fixed seed. Not ANSI-SQL-expressible -> verified by unit tests against
    exact Jaccard instead of the DuckDB oracle."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    sh = word_shingles(df, text_col, n).filter(F.size("shingles") > 0)
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=num_features)
    feats = tf.transform(sh).select(id_col, "features")
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed)
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(feats, feats, threshold, distCol="JACCARD_DIST")
    return (
        joined.select(
            F.col(f"datasetA.{id_col}").alias("ID_A"),
            F.col(f"datasetB.{id_col}").alias("ID_B"),
            F.round("JACCARD_DIST", 6).alias("JACCARD_DIST"),
        )
        .filter(F.col("ID_A") < F.col("ID_B"))
    )


def simhash(df: DataFrame, text_col: str = "text", bits: int = 32, out_col: str = "SIMHASH") -> DataFrame:
    """SimHash document signature over word tokens, fully in SQL expressions:
    per-token 32-bit hash from the md5 hex prefix, then for each bit position
    sum +-1 across tokens and take the sign. Near-dup candidates are rows
    whose signatures differ in few bits (see :func:`hamming_distance`)."""
    toks = F.array_distinct(F.split(normalized_text(text_col), " "))
    # 32-bit token hash, portable: first 8 hex chars of md5 -> bigint.
    tok_hashes = F.expr("transform(__toks, t -> conv(substring(md5(t), 1, 8), 16, 10))").cast("array<long>")
    bit_votes = F.expr(
        f"""transform(sequence(0, {bits - 1}), b ->
              aggregate(__th, 0L, (acc, h) ->
                acc + CASE WHEN (h div shiftleft(1L, b)) % 2 = 1 THEN 1 ELSE -1 END))"""
    )
    sig = F.expr(
        f"""aggregate(sequence(0, {bits - 1}), 0L, (acc, b) ->
              acc + CASE WHEN element_at(__votes, b + 1) > 0 THEN shiftleft(1L, b) ELSE 0L END)"""
    )
    return (
        df.withColumn("__toks", toks)
        .withColumn("__th", tok_hashes)
        .withColumn("__votes", bit_votes)
        .withColumn(out_col, sig)
        .drop("__toks", "__th", "__votes")
    )


def hamming_distance(a: str, b: str, bits: int = 32) -> F.Column:
    return F.expr(
        f"""aggregate(sequence(0, {bits - 1}), 0, (acc, i) ->
              acc + CASE WHEN (({a} div shiftleft(1L, i)) % 2) != (({b} div shiftleft(1L, i)) % 2)
                         THEN 1 ELSE 0 END)"""
    )
