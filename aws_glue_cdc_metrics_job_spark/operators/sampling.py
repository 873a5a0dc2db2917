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


def stratified_kfold(
    df: DataFrame,
    strata_cols: list[str],
    key_cols: list[str],
    k: int = 5,
    seed: str = "kf0",
    fold_col: str = "FOLD",
) -> DataFrame:
    """Stratified k-fold cross-validation assignment with EXACT quotas:
    within every stratum, rows are ordered by their key hash (ties broken
    by the keys themselves -- a total order) and dealt round-robin, so
    each stratum's folds differ in size by AT MOST ONE row. A plain
    ``hash % k`` fold only balances in expectation; small strata (the
    rare-language / rare-source tail a stratified split exists for) can
    land entirely in one fold -- this cannot.

    Deterministic and engine-portable (md5 order + row_number, no RNG),
    so the fold assignment replays bit-identically in SQL and any
    non-Spark consumer can reproduce membership. One partitioned window
    per stratum -- scale-safe as long as strata are data-sized groups,
    the same contract every stratified operator here carries.

    Returns the input plus ``fold_col`` (int in [0, k))."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from pyspark.sql import Window

    w = Window.partitionBy(*strata_cols).orderBy(
        _bucket_hex(key_cols, seed), *[F.col(c) for c in key_cols]
    )
    return df.withColumn(
        fold_col, ((F.row_number().over(w) - 1) % k).cast("int")
    )


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


def group_top_k_sample(
    df: DataFrame,
    group_cols: list[str],
    key_cols: list[str],
    k: int,
    seed: str = "0",
) -> DataFrame:
    """Exactly ``min(k, |group|)`` rows per group, chosen by md5 key-hash
    rank -- the fixed-SIZE counterpart of ``stratified_hash_sample``'s
    fixed-FRACTION draw. Balanced per-source subsets ("20 eval docs per
    source") need a guaranteed count even when strata sizes are skewed or
    unknown; ranking the same uniform hash draw keeps membership
    reproducible, partitioning-independent, and nested (k'=k-1 picks a
    subset of k's picks -- prefix-monotone like token_budget_mix).

    One hash-partitioned sort per group via row_number; ties on the 32-bit
    draw break by ``key_cols``, so the selection is total-ordered and
    engine-portable. At scale Spark's rank-limit pushdown
    (WindowGroupLimit, Spark 3.5+) filters each map partition to its local
    top-k BEFORE the shuffle, so the exchange carries O(k x partitions)
    rows per group, not the group -- pinned in tests/test_catalog_plans.py
    terms by the physical plan containing WindowGroupLimit."""
    from .relational import top_k_per_group

    h = _bucket_hex(key_cols, seed)
    return top_k_per_group(
        df, group_cols, [h.asc(), *[F.col(c).asc() for c in key_cols]], k=k
    )


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


def temperature_mix(
    df: DataFrame,
    stratum_col: str,
    key_cols: list[str],
    alpha: float = 0.7,
    target_rows: int | None = None,
    seed: str = "0",
) -> DataFrame:
    """Temperature-smoothed source mixing: stratum ``s`` is represented in
    the output in proportion to ``n_s^alpha`` (the exponent-smoothed
    multinomial from the multilingual-pretraining literature -- alpha < 1
    flattens the source distribution so head sources stop drowning tail
    ones; alpha = 1 is proportional, alpha = 0 uniform). Each stratum keeps
    fraction ``min(1, T * p_s / n_s)`` with ``p_s = n_s^alpha / sum
    n^alpha`` and ``T = target_rows`` (default: the input row count) --
    capped at 1 because sampling cannot upsample; tail strata wanting
    >1 replication keep everything (cap hit is visible in the returned
    KEEP_FRAC column).

    Mechanics: one tiny per-stratum count aggregate, the smoothed keep
    fraction computed on it (rounded half-up to 6 dp so the membership
    threshold is engine-exact), broadcast-joined back, then the same md5
    key draw as ``hash_sample`` -- scan-stage filter, reproducible,
    monotone in alpha for tail strata. Returns the kept rows plus
    KEEP_FRAC."""
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).cast("double").alias("__n"))
    denom = counts.agg(
        F.sum(F.pow(F.col("__n"), F.lit(alpha))).alias("__den"),
        F.sum("__n").alias("__tot"),
    )
    from ..functions.numeric import rhu

    t_rows = F.lit(float(target_rows)) if target_rows is not None else F.col("__tot")
    fr = (
        counts.crossJoin(F.broadcast(denom))
        .select(
            stratum_col,
            rhu(
                F.least(
                    F.lit(1.0),
                    t_rows
                    * F.pow(F.col("__n"), F.lit(alpha))
                    / F.col("__den")
                    / F.col("__n"),
                ),
                6,
            ).alias("KEEP_FRAC"),
        )
    )
    out = df.join(F.broadcast(fr), stratum_col)
    scaled = F.least(
        F.floor(F.col("KEEP_FRAC") * F.lit(float(16**_HEX_DIGITS))).cast("bigint"),
        F.lit(16**_HEX_DIGITS - 1),
    )
    thr = F.lower(F.lpad(F.hex(scaled), _HEX_DIGITS, "0"))
    return out.filter(_bucket_hex(key_cols, seed) < thr)


def token_budget_mix(
    df: DataFrame,
    token_col: str,
    budgets: dict[str, float],
    source_col: str,
    key_cols: list[str],
    seed: str = "0",
) -> DataFrame:
    """Fill per-source token budgets ("the mix": 60% web / 30% code / ...
    expressed as absolute token targets) by greedy prefix in deterministic
    hash order -- WITHOUT a global per-source sort.

    A naive budget fill is a per-source ORDER BY hash + cumulative-sum +
    filter: one total-ordering window per source, and with a handful of
    sources that is a handful of partitions doing all the work -- the skew
    cliff at corpus scale. Instead, selection threshold-finds on a bounded
    histogram:

    1. every row gets a 4096-ary bucket = the first 3 hex chars of its md5
       key draw (same draw family as ``hash_sample``, so membership is
       engine-portable and layout-independent);
    2. per-(source, bucket) token sums -- ONE partial-aggregated shuffle of
       #sources x 4096 rows, whatever the corpus size;
    3. running totals over that tiny frame classify each bucket: fully
       inside the budget, the single boundary bucket, or past it;
    4. rows in full buckets pass a broadcast-joined scan-stage filter;
       only the boundary bucket's rows (~corpus/4096 per source) pay a
       cumulative-sum window, ordered by (hash, key) so the cut is exact
       and deterministic.

    The corpus is scanned twice (full-bucket branch + boundary branch) but
    never key-shuffled; both scans carry only the projected columns. A row
    is kept while the running inclusive token total is <= the budget, so
    the realized total is the largest prefix total not exceeding it.

    Unlisted sources get budget 0 (excluded). Same key + seed -> same
    selection at any cluster size; growing a source's budget only ever ADDS
    rows (prefix monotonicity) -- the property that lets mix revisions ship
    as incremental additions rather than a reshuffled corpus.
    """
    from pyspark.sql import Window

    h = _bucket_hex(key_cols, seed)
    tagged = df.withColumn("__h", h).withColumn("__b", F.substring("__h", 1, 3))

    hist = tagged.groupBy(source_col, "__b").agg(F.sum(F.col(token_col)).alias("__toks"))
    wb = (
        Window.partitionBy(source_col)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    budget = None
    for src, amount in budgets.items():
        cond = F.col(source_col) == src
        budget = F.when(cond, F.lit(amount)) if budget is None else budget.when(cond, F.lit(amount))
    budget = F.lit(0) if budget is None else budget.otherwise(F.lit(0))
    classified_plan = (
        hist.withColumn("__before", F.coalesce(F.sum("__toks").over(wb), F.lit(0)))
        .withColumn("__budget", budget)
        .withColumn(
            "__cl",
            F.when(F.col("__before") + F.col("__toks") <= F.col("__budget"), F.lit("full"))
            .when(F.col("__before") < F.col("__budget"), F.lit("part"))
            .otherwise(F.lit("none")),
        )
        .select(
            source_col,
            "__b",
            "__cl",
            (F.col("__budget") - F.col("__before")).cast("double").alias("__rem"),
        )
        .filter(F.col("__cl") != "none")
    )
    # Materialize the classification on the driver: it is bounded by
    # #sources x 4096 rows BY CONSTRUCTION (documented contract, same shape
    # as the k-means centroid collect). Re-emitting it as a local relation
    # means the histogram subtree runs ONCE -- referencing the plan from
    # both union branches below would otherwise recompute it (and rescan
    # the corpus) per branch, since Catalyst does not share subplans.
    classified = tagged.sparkSession.createDataFrame(
        classified_plan.collect(), schema=classified_plan.schema
    )
    joined = tagged.join(F.broadcast(classified), [source_col, "__b"])
    full_rows = joined.filter(F.col("__cl") == "full").select(*df.columns)
    boundary = joined.filter(F.col("__cl") == "part")
    wp = (
        Window.partitionBy(source_col, "__b")
        .orderBy("__h", *[F.col(c).cast("string") for c in key_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    part_rows = (
        boundary.withColumn("__cum", F.sum(F.col(token_col)).over(wp))
        .filter(F.col("__cum") <= F.col("__rem"))
        .select(*df.columns)
    )
    return full_rows.unionByName(part_rows)


def balanced_hash_sample(
    df: DataFrame,
    label_col: str,
    key_cols: list[str],
    seed: str = "0",
) -> DataFrame:
    """Class-balanced downsampling: keep ~min-class-count rows of EVERY
    class (fraction min_n/n_c per class c), chosen by the same md5 key
    draw as the other samplers -- the classifier-training rebalance step,
    with data-derived fractions instead of stratified_hash_sample's
    caller-supplied ones.

    Shape: one tiny per-class count aggregate, the min broadcast back as
    a scalar frame, thresholds joined per class (broadcast) -- the corpus
    itself is filtered in the scan stage and never shuffles. Membership
    is deterministic, partitioning-independent, and nested across runs
    with the same seed. NULL labels form their own class. Expected
    (not exact) per-class counts, like every hash sampler here; the
    exact-count variant is group_top_k_sample(k=min_count).

    Returns the kept rows plus KEEP_FRAC."""
    from ..functions.numeric import rhu

    counts = df.groupBy(label_col).agg(F.count(F.lit(1)).cast("double").alias("__n"))
    mn = counts.agg(F.min("__n").alias("__mn"))
    fr = (
        counts.crossJoin(F.broadcast(mn))
        .select(
            label_col,
            rhu(F.least(F.lit(1.0), F.col("__mn") / F.col("__n")), 6).alias("KEEP_FRAC"),
        )
    )
    # null-safe equi-join so NULL-labeled rows match their own class row
    out = df.join(F.broadcast(fr), df[label_col].eqNullSafe(fr[label_col])).drop(
        fr[label_col]
    )
    scaled = F.least(
        F.floor(F.col("KEEP_FRAC") * F.lit(float(16**_HEX_DIGITS))).cast("bigint"),
        F.lit(16**_HEX_DIGITS - 1),
    )
    thr = F.lower(F.lpad(F.hex(scaled), _HEX_DIGITS, "0"))
    return out.filter(_bucket_hex(key_cols, seed) < thr)


def dense_index(df: DataFrame, id_col: str, buckets: int = 64) -> DataFrame:
    """zipWithIndex for DataFrames, without a global sort: rows bucket by
    ``pmod(id, buckets)``, rank inside each bucket (a PARTITIONED window),
    and bucket offsets come from a cumulative sum over the ``buckets``-row
    count frame -- so the dense 0..N-1 index costs one keyed shuffle plus
    a bounded window, where the naive ROW_NUMBER() OVER (ORDER BY ...)
    funnels the whole table through one reducer. Index order is
    (bucket, md5(id), id): deterministic and partitioning-independent,
    not meaningful -- which is exactly what positional sampling needs.

    Requires an integral id column: a non-numeric id would cast to NULL
    buckets and silently drop every row through the bucket join, so it is
    rejected up front (hash string ids to a surrogate long first).

    Returns the input plus ROW_IDX (long)."""
    from pyspark.sql import Window
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    if not isinstance(df.schema[id_col].dataType, (ByteType, ShortType, IntegerType, LongType)):
        raise ValueError(
            f"dense_index needs an integral id column, got "
            f"{df.schema[id_col].dataType.simpleString()} for {id_col!r}"
        )
    b = F.pmod(F.col(id_col).cast("long"), F.lit(buckets))
    w = Window.partitionBy("__b").orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
    ranked = df.withColumn("__b", b).withColumn("__r", F.row_number().over(w))
    counts = ranked.groupBy("__b").agg(F.count(F.lit(1)).alias("__n"))
    wo = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn("__off", F.coalesce(F.sum("__n").over(wo), F.lit(0)))
    return (
        ranked.join(F.broadcast(offsets.select("__b", "__off")), "__b")
        .withColumn("ROW_IDX", (F.col("__off") + F.col("__r") - 1).cast("long"))
        .drop("__b", "__r", "__off")
    )


def negative_samples(
    df: DataFrame,
    id_col: str,
    k: int = 4,
    seed: int = 7,
    buckets: int = 64,
) -> DataFrame:
    """Deterministic corpus-wide negative sampling for contrastive
    training: every row becomes an anchor paired with ``k`` pseudo-random
    OTHER rows. The draw is pure integer arithmetic on the dense index --
    ``neg = (a31 * 2654435761 + rank * 40503 + seed) mod 2^31 mod N``
    (the Knuth multiplicative mixer, computed identically in any engine;
    a collision with the anchor's own position shifts by one) -- so the
    pairing is reproducible across engines, runs, and cluster sizes, and
    nested in k.

    Shape: dense_index (one keyed shuffle, no global sort), a k-explode
    of compact (anchor, position) pairs, the 1-row corpus count broadcast,
    and one equi-join on ROW_IDX to resolve positions to ids. Nothing
    ever cross-joins data-sized frames.

    Returns (ANCHOR_ID, NEG_RANK, NEG_ID)."""
    idx = dense_index(df.select(id_col), id_col, buckets).select(
        F.col(id_col), F.col("ROW_IDX")
    )
    n1 = idx.agg(F.count(F.lit(1)).cast("long").alias("__N"))
    anchors = idx.select(
        F.col(id_col).alias("ANCHOR_ID"),
        F.col("ROW_IDX").alias("__a_idx"),
        F.explode(F.array(*[F.lit(j) for j in range(k)])).alias("NEG_RANK"),
    )
    a31 = F.pmod(F.col("ANCHOR_ID").cast("long"), F.lit(2**31))
    raw = F.pmod(
        a31 * F.lit(2654435761) + F.col("NEG_RANK") * F.lit(40503) + F.lit(seed),
        F.lit(2**31),
    )
    cand = anchors.crossJoin(F.broadcast(n1)).withColumn(
        "__neg_idx",
        F.pmod(raw, F.col("__N")),
    )
    cand = cand.withColumn(
        "__neg_idx",
        F.when(
            F.col("__neg_idx") == F.col("__a_idx"),
            F.pmod(F.col("__neg_idx") + 1, F.col("__N")),
        ).otherwise(F.col("__neg_idx")),
    )
    neg = idx.select(F.col(id_col).alias("NEG_ID"), F.col("ROW_IDX").alias("__neg_idx"))
    # The +1 collision shift guarantees NEG != anchor whenever N >= 2; a
    # single-row corpus would shift back onto the anchor itself, so the
    # final guard drops those rather than emit a positive labeled negative
    # (a 1-row corpus then yields 0 pairs, not k lies).
    return (
        cand.join(neg, "__neg_idx")
        .filter(F.col("ANCHOR_ID") != F.col("NEG_ID"))
        .select("ANCHOR_ID", "NEG_RANK", "NEG_ID")
    )


def weighted_top_k_sample(
    df: DataFrame,
    weight_col: str,
    group_cols: list[str],
    key_cols: list[str],
    k: int,
    seed: str = "0",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, exactly ``min(k, |group|)``
    rows per group: the Efraimidis-Spirakis A-Res scheme -- rank rows by
    ``u^(1/w)`` descending, where ``u`` is the same md5 uniform draw every
    sampler here uses, and take the top k. Inclusion probability rises
    with weight, the selection is a true without-replacement sample, and
    determinism/partitioning-independence come for free from the keyed
    draw. The fixed-SIZE counterpart of weighted_hash_sample's Bernoulli
    (use this when the output must have a guaranteed count, e.g. "best
    100 docs per source, quality-weighted").

    Rows with weight <= 0 or NULL sort after every positive-weight row
    (rank key -1) and are only taken when a group has fewer than k
    positive rows. Ranking math: u in (0,1] from the 32-bit lattice
    (+1 so u is never 0), u^(1/w) in doubles -- identical IEEE pow in
    Spark/DuckDB/numpy, ties broken by key.

    Same WindowGroupLimit pushdown as group_top_k_sample: each map
    partition keeps its local top-k before the shuffle."""
    from .relational import top_k_per_group

    u = (
        F.conv(_bucket_hex(key_cols, seed), 16, 10).cast("double") + 1.0
    ) / float(16**_HEX_DIGITS)
    w = F.col(weight_col).cast("double")
    rank_key = F.when(
        w > 0, F.pow(u, F.lit(1.0) / w)
    ).otherwise(F.lit(-1.0))
    out = df.withColumn("__ares", rank_key)
    return top_k_per_group(
        out,
        group_cols,
        [F.col("__ares").desc(), *[F.col(c).asc() for c in key_cols]],
        k=k,
    ).drop("__ares")


def epoch_plan(
    df: DataFrame,
    source_col: str,
    weight_ppm: Column,
    budget_units: int,
    unit_col: str,
    max_epochs_milli: int = 3000,
) -> DataFrame:
    """Mixture -> epochs: the data-mixing step that turns per-source
    sampling weights into PASS COUNTS over each source (LLaMA/Dolma-style
    pretraining mixes repeat small high-weight sources for several epochs
    while reading a fraction of the big ones). Per source: available
    units (sum of ``unit_col``), the caller's weight (ppm of the budget,
    as a COLUMN so the rule travels with the query and stays portable
    across engines -- the expression MUST be constant within each source:
    it is aggregated with max(), so a non-constant weight deterministically
    takes the largest value rather than a partition-order-dependent one,
    but the per-source-constant contract is the caller's to honor), the
    unit target ``budget * ppm div 1e6``, and
    ``EPOCHS_MILLI = min(target * 1000 div available, max)`` -- every
    step integer division on ppm/milli lattices, so the plan hashes
    identically in any engine. The repetition cap mirrors the
    "don't repeat data more than ~4 epochs" guidance from the
    data-constrained-scaling literature; capped sources show the cap,
    they are not silently redistributed.

    One tiny aggregate (|sources| rows); join nothing back. Feed the
    result to :func:`materialize_epochs`."""
    tot = df.groupBy(source_col).agg(
        F.sum(F.col(unit_col)).cast("long").alias("N_UNITS"),
        # max(), not first(): first() over a (contract-violating)
        # non-constant weight expression would be partition-order
        # nondeterministic; max() keeps the plan deterministic either way
        F.max(weight_ppm).cast("int").alias("WEIGHT_PPM"),
    )
    target = F.expr(f"(CAST({int(budget_units)} AS BIGINT) * WEIGHT_PPM) div 1000000")
    return tot.select(
        F.col(source_col).alias("SOURCE"),
        "N_UNITS",
        "WEIGHT_PPM",
        target.cast("long").alias("TARGET_UNITS"),
        # guard N_UNITS = 0 explicitly: Spark's least() SKIPS nulls, so a
        # null div-by-zero would silently become the cap (= max epochs of
        # an empty source) instead of 0
        F.when(
            F.col("N_UNITS") > 0,
            F.least(
                F.expr(
                    f"(( (CAST({int(budget_units)} AS BIGINT) * WEIGHT_PPM) div 1000000 ) * 1000)"
                    " div N_UNITS"
                ),
                F.lit(int(max_epochs_milli)),
            ),
        )
        .otherwise(0)
        .cast("long")
        .alias("EPOCHS_MILLI"),
    )


def materialize_epochs(
    df: DataFrame,
    plan: DataFrame,
    source_col: str,
    key_cols: list[str],
    seed: str = "ep1",
) -> DataFrame:
    """Deterministically materialize an :func:`epoch_plan`: every row gets
    ``EPOCHS_MILLI div 1000`` full copies plus one more iff its md5 draw
    falls under the fractional remainder -- so 2.3 epochs means every doc
    appears twice and a reproducible, key-stable 30% of docs appear a
    third time. Output rows carry EPOCH = 1..copies (an upsampled
    training feed with an explicit pass index; EPOCH > 1 rows are the
    repeats).

    Shape: broadcast the |sources|-row plan, then one scan-stage
    ``sequence``-explode -- NO shuffle anywhere; output size is exactly
    the planned unit budget (modulo the cap). The fractional draw reuses
    the corpus-wide md5 lattice (``hash_sample``'s), so membership of the
    "extra pass" set is consistent with every other sampler here."""
    j = df.join(
        F.broadcast(plan.select(F.col("SOURCE").alias(source_col), "EPOCHS_MILLI")),
        source_col,
    )
    thr = F.lower(
        F.lpad(
            F.hex(F.expr(f"((EPOCHS_MILLI % 1000) * {16**_HEX_DIGITS}) div 1000")),
            _HEX_DIGITS,
            "0",
        )
    )
    copies = (F.expr("EPOCHS_MILLI div 1000") + F.when(
        _bucket_hex(key_cols, seed) < thr, 1
    ).otherwise(0)).cast("int")
    return (
        j.withColumn("__copies", copies)
        .filter(F.col("__copies") >= 1)
        .withColumn(
            "EPOCH", F.explode(F.sequence(F.lit(1), F.col("__copies")))
        )
        .drop("__copies", "EPOCHS_MILLI")
    )


def rendezvous_assign(
    df: DataFrame, key_col: str, shards: list[str]
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment (Thaler &
    Ravishankar, 1998): each key goes to the shard with the highest
    md5(key|shard) score. The stable-sharding primitive a 100 TB corpus
    needs for reshard-tolerant placement: when a shard is ADDED, a key
    either keeps its shard or moves to the NEW one (never between old
    shards), so exactly ~1/(N+1) of keys move -- against consistent
    hashing's ring this needs no virtual nodes to balance, and against
    plain ``hash(key) % N`` (which moves ~all keys on any N change) it is
    the difference between a reshard and a full rewrite. Pinned as an
    exact invariant in tests, not a probabilistic claim.

    Shape: a pure scan-stage expression -- the |shards|-element score
    array and its max are computed per row with ZERO shuffle and no
    driver state; md5 (not xxhash) so every assignment replays verbatim
    in any engine. Ties (2^-128 per pair) break toward the
    lexicographically larger shard name in both engines. ``shards`` is a
    bounded literal list by construction (it is a cluster's shard
    catalog, not data). Returns df + (SHARD, SHARD_SCORE)."""
    if not shards:
        raise ValueError("shards must be non-empty")
    if len(set(shards)) != len(shards):
        raise ValueError("shards must be distinct")
    arr = F.array(
        *[
            F.struct(
                F.md5(
                    F.concat_ws("|", F.col(key_col).cast("string"), F.lit(s))
                ).alias("h"),
                F.lit(s).alias("s"),
            )
            for s in shards
        ]
    )
    best = F.array_max(arr)
    return df.withColumn("SHARD", best["s"]).withColumn("SHARD_SCORE", best["h"])
