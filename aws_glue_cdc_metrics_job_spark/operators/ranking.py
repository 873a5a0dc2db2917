"""Distributed total-order ranking: global ROW_NUMBER / NTILE without the
single-partition window.

``ROW_NUMBER() OVER (ORDER BY ...)`` (and ``NTILE`` built on it) funnels
the whole input through ONE reducer -- Spark plans an
``Exchange SinglePartition`` and emits the "No Partition Defined for Window
operation" warning. Fine for a bounded frame (a vocabulary, a top-k list,
one row per group); a scale-killer for per-customer or per-event frames
that grow with the data.

The scalable shape mirrors how Spark's own ``sortWithinPartitions`` +
range partitioner would do it, kept in the DataFrame API:

1. pick ~``buckets`` split points with ``approxQuantile`` on the sort key
   (a driver collect of <= buckets-1 scalars -- bounded by construction);
2. assign each row a range-bucket by counting boundaries below its key
   (an array-literal ``filter``/``size`` inside whole-stage codegen --
   no join, no shuffle for the assignment itself);
3. count rows per bucket (map-side-combined agg, <= ``buckets`` rows
   collected to the driver -- the second and last bounded action);
4. ``row_number`` inside each bucket (a PARTITIONED window: one keyed
   shuffle, ``buckets``-way parallel);
5. global rank = literal-array offset lookup + intra-bucket rank --
   no join, no extra exchange, stays inside whole-stage codegen.

The rank depends only on the total order (key, tiebreaks) -- bucket
boundaries affect parallelism, never the result -- so callers keep their
exact oracles while the plan drops the SinglePartition exchange.

Skew note: equal keys always share a bucket (assignment is by key value),
so a key with one dominant value degenerates toward one hot bucket --
the same hazard every range partitioner has. The tiebreak columns do NOT
spread it (they only order within the bucket); for such keys rank by a
composite numeric key instead.

NULL keys are not supported: ``approxQuantile`` ignores them and the
boundary comparison would park every NULL in bucket 0 while the window
sorts them elsewhere. Callers filter or coalesce first (both catalog
users rank non-null aggregates).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sorted_rank", "ntile_exact", "rank_percentiles"]


def _bucket_expr(key: str, boundaries: list[float], desc: bool) -> Column:
    """0-based range-bucket id, monotone in the FINAL rank order.

    Ascending: bucket = #(boundaries < key). Descending flips the id so
    bucket 0 holds the largest keys; rows with equal keys land together
    either way, which is what keeps intra-bucket ordering total."""
    if not boundaries:
        return F.lit(0)
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    asc_bucket = F.size(F.filter(arr, lambda b: b < F.col(key).cast("double")))
    return (F.lit(len(boundaries)) - asc_bucket) if desc else asc_bucket


def sorted_rank(
    df: DataFrame,
    key: str,
    tiebreaks: list[str],
    desc: bool = False,
    buckets: int = 64,
    rank_col: str = "RANK",
    total_col: str | None = None,
    rel_err: float = 0.01,
) -> DataFrame:
    """Global 1-based ROW_NUMBER by ``(key [DESC], *tiebreaks ASC)``
    without a single-partition window.

    ``key`` must be numeric and non-null; ``tiebreaks`` must complete a
    total order (duplicate (key, tiebreaks) tuples would make the rank
    partitioning-dependent). Returns the input plus ``rank_col`` (long)
    and, when ``total_col`` is given, the total row count on every row
    (long) -- the two numbers NTILE needs, carried by the same broadcast.
    """
    out, _ = sorted_rank_with_total(
        df, key, tiebreaks, desc=desc, buckets=buckets,
        rank_col=rank_col, total_col=total_col, rel_err=rel_err,
    )
    return out


def sorted_rank_with_total(
    df: DataFrame,
    key: str,
    tiebreaks: list[str],
    desc: bool = False,
    buckets: int = 64,
    rank_col: str = "RANK",
    total_col: str | None = None,
    rel_err: float = 0.01,
) -> tuple[DataFrame, int]:
    """``sorted_rank`` plus the total row count as a Python int -- the
    count is already on the driver from the bucket-counts collect, and
    consumers like ``rank_percentiles`` turn it into literal target ranks
    (a pure pushed-down filter instead of any join)."""
    qs = [i / buckets for i in range(1, buckets)]
    # approxQuantile is an action on ONE column with a bounded result
    # (<= buckets-1 doubles): bounded driver collect #1.
    raw = df.stat.approxQuantile(key, qs, rel_err)
    boundaries = sorted(set(raw))
    b = _bucket_expr(key, boundaries, desc)
    # bucket counts: map-side-combined agg over <= buckets groups,
    # collected to the driver -- bounded collect #2. Computing offsets
    # here (plain Python prefix sum) keeps the final plan free of both
    # the SinglePartition offsets window and the broadcast join.
    nb = len(boundaries) + 1
    counts = dict(
        df.select(b.alias("__rb")).groupBy("__rb").count().collect()
    )
    offsets, acc = [], 0
    for i in range(nb):
        offsets.append(acc)
        acc += int(counts.get(i, 0))
    total = acc
    order = [F.col(key).desc() if desc else F.col(key).asc()] + [
        F.col(t).asc() for t in tiebreaks
    ]
    w_in = Window.partitionBy("__rb").orderBy(*order)
    off = F.element_at(
        F.array(*[F.lit(o) for o in offsets]), F.col("__rb") + 1
    )
    out = (
        df.withColumn("__rb", b)
        .withColumn("__rr", F.row_number().over(w_in))
        .withColumn(rank_col, (off + F.col("__rr")).cast("long"))
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.lit(total).cast("long"))
    return out.drop("__rb", "__rr"), total


def ntile_exact(
    df: DataFrame,
    n: int,
    key: str,
    tiebreaks: list[str],
    desc: bool = False,
    buckets: int = 64,
    tile_col: str = "TILE",
) -> DataFrame:
    """Exact ``NTILE(n) OVER (ORDER BY key [DESC], *tiebreaks)`` from the
    distributed rank -- bit-identical to the SQL window: with ``q = N div
    n`` and ``r = N mod n``, the first ``r`` tiles hold ``q + 1`` rows
    (ranks ``1 .. r*(q+1)``) and the rest hold ``q``. All-integer CASE
    arithmetic (the ELSE's ``div q`` is unreachable when ``q = 0``
    because the first branch then covers every rank), no SinglePartition
    exchange in the plan.

    Returns the input plus ``tile_col`` (int)."""
    ranked = sorted_rank(
        df, key, tiebreaks, desc=desc, buckets=buckets,
        rank_col="__ntr", total_col="__ntn",
    )
    tile = F.expr(
        f"CASE WHEN __ntr <= (__ntn % {int(n)}) * (__ntn div {int(n)} + 1) "
        f"THEN (__ntr - 1) div (__ntn div {int(n)} + 1) + 1 "
        f"ELSE (__ntn % {int(n)}) "
        f"  + (__ntr - (__ntn % {int(n)}) * (__ntn div {int(n)} + 1) - 1) "
        f"    div (__ntn div {int(n)}) + 1 END"
    )
    return ranked.withColumn(tile_col, tile.cast("int")).drop("__ntr", "__ntn")


def rank_percentiles(
    df: DataFrame,
    key: str,
    tiebreaks: list[str],
    qs_bp: list[int],
    buckets: int = 64,
) -> DataFrame:
    """Exact discrete percentiles (``PERCENTILE_DISC`` / DuckDB
    ``quantile_disc``) without a single-reducer sort: the q-quantile of N
    rows is the key at global rank ``ceil(q * N)``, so after
    ``sorted_rank`` it is ONE bucket-pruned filter -- every partition
    drops to at most ``len(qs_bp)`` candidate rows before the final tiny
    collect-side projection. The selected value is a row's own key (no
    interpolation arithmetic), so it hashes identically in any engine.

    ``qs_bp`` are basis points (5000 = median) so the target ranks are
    exact integers: ``rank_q = ceil(q_bp * N / 10000)``, computed on the
    driver from the already-collected total -- the selection is a literal
    ``RANK IN (...)`` filter, no join of any kind. A quantile whose target
    rank collides with another's still gets its own output row (the CASE
    maps each Q_BP to its rank first). Returns one row per quantile:
    (Q_BP int, N long, VALUE <key's type>)."""
    ranked, total = sorted_rank_with_total(
        df.select(key, *tiebreaks), key, tiebreaks,
        desc=False, buckets=buckets, rank_col="__pr",
    )
    qs = sorted(set(int(q) for q in qs_bp))
    # ceil without floats: ceil(a/b) = -((-a) // b) on exact ints
    target = {q: max(1, -((-q * total) // 10000)) for q in qs}
    if total == 0:
        return ranked.select(
            F.lit(None).cast("int").alias("Q_BP"),
            F.lit(0).cast("long").alias("N"),
            F.col(key).alias("VALUE"),
        ).limit(0)
    # one pass: keep only target-rank rows, then explode a literal
    # rank -> [quantiles] map (two quantiles of a small N can share a
    # rank and still each get a row)
    by_rank: dict[int, list[int]] = {}
    for q, r in target.items():
        by_rank.setdefault(r, []).append(q)
    qarr = None
    for r, qlist in by_rank.items():
        arm = F.array(*[F.lit(q) for q in sorted(qlist)])
        qarr = F.when(F.col("__pr") == r, arm) if qarr is None else qarr.when(
            F.col("__pr") == r, arm
        )
    return (
        ranked.filter(F.col("__pr").isin(*by_rank))
        .select(
            F.explode(qarr).alias("__q"),
            F.lit(total).cast("long").alias("N"),
            F.col(key).alias("VALUE"),
        )
        .select(F.col("__q").cast("int").alias("Q_BP"), "N", "VALUE")
    )


def ndcg_discounts_ppm(k: int) -> list[int]:
    """The shared-literal NDCG discount codebook: floor(1e6 / log2(i+1))
    for ranks i = 1..k. Computed ONCE in Python and embedded as literals
    in both the Spark plan and the oracle SQL (the shared-literal pattern
    similarity.pq uses for codebooks), so the log never runs in either
    engine and the metric is exact integers everywhere."""
    import math

    return [int(10**6 / math.log2(i + 1)) for i in range(1, k + 1)]


def ndcg_at_k(
    df: DataFrame,
    rel_col: str,
    order_by: list,
    k: int,
) -> DataFrame:
    """NDCG@k over a RANKED CANDIDATE FRAME -- the retrieval-quality
    readout (search, RAG context selection, dedup-candidate ranking)
    computed without floats: integer graded relevance x the ppm discount
    codebook, normalized by the ideal (relevance-descending) ordering of
    the SAME frame.

    ``df`` must be bounded by contract (a top-k retrieval output -- at
    most a few times ``k`` rows); the two ROW_NUMBER windows below are
    global-ordered and would single-partition an unbounded input (the
    documented bounded-frame exception). ``order_by`` is the system
    ranking and must be a total order (tiebreak included) or the rank --
    and the metric -- becomes partitioning-dependent.

    Returns ONE row: (K, N_RANKED -- rows actually scored (min(k, |df|)),
    DCG_PPM, IDCG_PPM, NDCG_PPM = DCG*1e6 div IDCG, 0 when IDCG is 0).
    All BIGINT."""
    discs = ndcg_discounts_ppm(k)
    disc_arr = F.array(*[F.lit(d) for d in discs])
    w_sys = Window.orderBy(*order_by)
    w_ideal = Window.orderBy(F.col(rel_col).desc(), *order_by)
    # ONE lineage carries both rank columns (two windows over the same
    # bounded sorted frame), then ONE aggregate computes both gain sums --
    # two independent df lineages would execute the whole upstream plan
    # twice (measured: docs_bm25_ndcg at 18 exchanges / 8 scans before
    # this form), and the 1-row crossJoin disappears with them.
    both = (
        df.withColumn("__r", F.row_number().over(w_sys))
        .withColumn("__ir", F.row_number().over(w_ideal))
        .select(
            "__r",
            "__ir",
            F.col(rel_col).cast("bigint").alias("__rel"),
        )
    )
    agg = both.agg(
        F.sum(F.when(F.col("__r") <= k, 1).otherwise(0))
        .cast("bigint")
        .alias("N_RANKED"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("__r") <= k,
                    F.col("__rel") * F.element_at(disc_arr, F.col("__r")),
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("DCG_PPM"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("__ir") <= k,
                    F.col("__rel") * F.element_at(disc_arr, F.col("__ir")),
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("IDCG_PPM"),
    )
    return agg.select(
        F.lit(k).cast("bigint").alias("K"),
        "N_RANKED",
        "DCG_PPM",
        "IDCG_PPM",
        F.when(F.col("IDCG_PPM") > 0, F.expr("(DCG_PPM * 1000000) div IDCG_PPM"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("NDCG_PPM"),
    )
