"""Deterministic hash-based sampling and dataset splitting.

Training-data pipelines need samples and train/val/test splits that are
(a) reproducible run-to-run and cluster-size-independent, (b) stable under
data re-partitioning, and (c) consistent for the same key across tables.
Spark's ``df.sample`` is none of these (it is partition-order dependent),
so these operators derive the decision from a cryptographic hash of the
row's KEY: a pure, stateless projection -- no shuffle, no state, scales
linearly and survives any re-layout of the data.

md5 is used (not xxhash64) because every engine agrees on its value, which
keeps the operators oracle-checkable and lets a non-Spark consumer
reproduce the exact split membership.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_DIGITS = 8  # 32 bits of the digest: fraction resolution 1/2^32


def _bucket_hex(key_cols: list[str], seed: str) -> Column:
    """First 8 hex chars of md5('col1|col2|...|seed') -- a uniform draw in
    [0, 16^8) encoded as zero-padded lowercase hex, so plain string
    comparison against a hex threshold is a numeric comparison."""
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols], F.lit(seed))
    return F.substring(F.md5(key), 1, _HEX_DIGITS)


def _hex_threshold(fraction: float) -> str:
    return format(min(int(fraction * 16**_HEX_DIGITS), 16**_HEX_DIGITS - 1), "08x")


def hash_sample(df: DataFrame, key_cols: list[str], fraction: float, seed: str = "0") -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash. Same key + seed ->
    same decision everywhere: re-running, re-partitioning, or sampling a
    different table on the same key yields consistent membership."""
    if fraction >= 1.0:
        return df
    if fraction <= 0.0:
        return df.limit(0)
    return df.filter(_bucket_hex(key_cols, seed) < F.lit(_hex_threshold(fraction)))


def hash_split(
    df: DataFrame,
    key_cols: list[str],
    splits: dict[str, float],
    seed: str = "0",
    split_col: str = "SPLIT",
) -> DataFrame:
    """Assign each row to one named split (e.g. train/val/test 0.8/0.1/0.1)
    by key hash. Weights must sum to ~1; the last split absorbs rounding so
    every row is assigned exactly once."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    h = _bucket_hex(key_cols, seed)
    names = list(splits)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += splits[name]
        cond = h < F.lit(_hex_threshold(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, expr)


def stratified_hash_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    key_cols: list[str],
    default_fraction: float = 0.0,
    seed: str = "0",
) -> DataFrame:
    """Per-stratum deterministic sampling: keep ~``fractions[stratum]`` of
    each stratum's rows (``default_fraction`` for unlisted strata), chosen by
    key hash exactly like ``hash_sample``.

    This is the rebalancing step of a training-data mix ("keep 50% of en,
    10% of everything else"): one stateless comparison per row, no shuffle,
    membership reproducible in any engine. The per-stratum threshold is a
    compiled CASE expression -- strata counts are small by definition, so no
    join is needed and the whole filter stays in the scan stage."""
    h = _bucket_hex(key_cols, seed)
    thr = None
    for value, frac in fractions.items():
        cond = F.col(stratum_col) == value
        lit = F.lit(_hex_threshold(frac))
        thr = F.when(cond, lit) if thr is None else thr.when(cond, lit)
    default_lit = F.lit(_hex_threshold(default_fraction))
    thr = default_lit if thr is None else thr.otherwise(default_lit)
    return df.filter(h < thr)


def weighted_hash_sample(
    df: DataFrame,
    weight_col: str,
    key_cols: list[str],
    seed: str = "0",
) -> DataFrame:
    """Per-row weighted Bernoulli sampling: keep each row with probability
    ``weight_col`` (clamped to [0, 1]), decided by the same md5 key draw as
    hash_sample -- so membership is reproducible, partitioning-independent,
    and monotone in the weight (raising a row's weight can only add it,
    never drop it; the draw itself never changes). The continuous
    generalization of stratified sampling: quality-proportional corpus
    downsampling is ``weighted_hash_sample(scored, "QUALITY_SCORE", ...)``.

    The per-row threshold is the weight scaled to the 32-bit hex lattice
    (floor, exact integer arithmetic in both engines) and compared as
    zero-padded lowercase hex -- one stateless comparison in the scan
    stage, no shuffle.

    NULL weights are treated as 0.0 (row never sampled) -- an explicit
    policy rather than the silent NULL-comparison drop a bare cast would
    give; callers wanting errors should validate upstream."""
    w = F.least(
        F.greatest(F.coalesce(F.col(weight_col).cast("double"), F.lit(0.0)), F.lit(0.0)),
        F.lit(1.0),
    )
    # Clamp to the lattice max (16^8 - 1): weight 1.0 would otherwise need 9
    # hex digits and lpad would TRUNCATE it into a tiny threshold. Same
    # 1/2^32 convention as _hex_threshold(1.0).
    scaled = F.least(
        F.floor(w * F.lit(float(16**_HEX_DIGITS))).cast("bigint"),
        F.lit(16**_HEX_DIGITS - 1),
    )
    thr = F.lower(F.lpad(F.hex(scaled), _HEX_DIGITS, "0"))
    return df.filter(_bucket_hex(key_cols, seed) < thr)
