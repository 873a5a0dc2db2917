"""Metric-series monitoring: rolling-window anomaly detection.

The reference computes marts but nothing watches them; a metrics pipeline
needs "did today's number break from its own history?" as an operator.
``rolling_zscore`` scores each point of a keyed series against the
TRAILING ``n`` points (current excluded, so an anomaly cannot mask
itself), the standard control-chart z-score.

Determinism contract (same rationale as functions/numeric.py): the builtin
windowed AVG/STDDEV accumulate in engine-specific association order
(Spark's sliding aggregate vs DuckDB's segment tree), so their last ulps
differ cross-engine. Here mean and variance derive from EXACT decimal
window sums of x and x^2 -- both engines then perform the identical
sequence of double operations on identical inputs, so scores are
bit-reproducible anywhere (requires ``value_col`` exact at
``decimal_scale``; its square must fit scale 2x, true for 2-decimal
metric values below ~1e7).

Scale shape: one hash shuffle on the series key + one sort -- identical to
any window aggregate; both window sums share the frame, so the plan has a
single Window operator. Series keys (metric name x dimension) are
numerous; per-key state is the ``n``-row frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.numeric import PRECISION, money, rhu


def rolling_zscore(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    n: int,
    min_periods: int | None = None,
    z_threshold: float = 2.0,
    decimal_scale: int = 2,
) -> DataFrame:
    """Append (N_PRIOR, MEAN_PRIOR, STD_PRIOR, ZSCORE, IS_ANOMALY) to each
    row: the trailing-window baseline, the point's z-score against it
    (rounded half-up to 6 places), and a 0/1 flag for |z| > threshold.
    ZSCORE is NULL when the window holds fewer than ``min_periods``
    (default ``n``) points or has zero variance."""
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    min_p = n if min_periods is None else min_periods
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col)
        .rowsBetween(-n, -1)
    )
    x = money(value_col, decimal_scale)
    x2 = (F.col(value_col) * F.col(value_col)).cast(
        f"decimal({PRECISION},{2 * decimal_scale})"
    )
    # all three window aggregates in ONE projection -> a single physical
    # Window operator (a withColumn chain stacks one Window per column)
    base = df.select(
        "*",
        F.sum(x).over(w).cast("double").alias("__s1"),
        F.sum(x2).over(w).cast("double").alias("__s2"),
        F.count(F.col(value_col)).over(w).alias("__n"),
    )
    s1, s2, cnt = F.col("__s1"), F.col("__s2"), F.col("__n")
    mean = s1 / cnt
    var = (s2 - s1 * s1 / cnt) / (cnt - 1)
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    ok = (cnt >= min_p) & (std > 0)
    z = F.when(ok, rhu((F.col(value_col) - mean) / std, 6))
    return base.select(
        *df.columns,
        cnt.cast("long").alias("N_PRIOR"),
        F.when(cnt >= min_p, rhu(mean, 6)).alias("MEAN_PRIOR"),
        F.when(cnt >= min_p, rhu(std, 6)).alias("STD_PRIOR"),
        z.alias("ZSCORE"),
        F.when(F.abs(z) > z_threshold, 1).otherwise(0).cast("int").alias("IS_ANOMALY"),
    )


def independence_matrix(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """Deviation-from-independence matrix over two categorical columns:
    for EVERY (a, b) cell of the full marginal grid -- including cells
    with zero observations -- the observed joint proportion minus the
    product of the marginals, in exact ppm. The drift/interaction
    monitor behind a chi-square test, kept on the integer lattice so it
    replays verbatim in any engine: a cell's |DEV_PPM| is its
    contribution direction and magnitude, and a drift alarm is a
    threshold on it.

    Scale-safe at ANY row count (the gini discipline): marginal
    proportions are ppm (<= 1e6), the expected value is their ppm
    product div 1e6, so no intermediate exceeds ~1e12 regardless of n.
    The grand total rides an unbounded window over the BOUNDED marginal
    frame (distinct-value-sized), not a re-expanding cross join; the
    grid itself is a cross join of the TWO MARGINAL FRAMES -- bounded at
    |distinct a| x |distinct b| by construction, the documented
    exception to the no-cartesian rule.

    Returns (A, B, N_OBSERVED, EXPECTED_PPM, DEV_PPM)."""
    base = df.select(F.col(col_a).alias("A"), F.col(col_b).alias("B"))
    o = base.groupBy("A", "B").agg(F.count(F.lit(1)).cast("bigint").alias("N_AB"))
    wall = Window.orderBy("A").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ma = (
        base.groupBy("A")
        .agg(F.count(F.lit(1)).cast("bigint").alias("N_A"))
        .withColumn("__N", F.sum("N_A").over(wall).cast("bigint"))
    )
    mb = base.groupBy("B").agg(F.count(F.lit(1)).cast("bigint").alias("N_B"))
    grid = ma.crossJoin(mb)
    return (
        grid.join(o, ["A", "B"], "left")
        .select(
            "A",
            "B",
            F.coalesce(F.col("N_AB"), F.lit(0)).cast("bigint").alias("N_OBSERVED"),
            F.expr(
                "(((N_A * 1000000) div __N) * ((N_B * 1000000) div __N)) div 1000000"
            )
            .cast("bigint")
            .alias("EXPECTED_PPM"),
            (
                F.expr("(coalesce(N_AB, 0) * 1000000) div __N")
                - F.expr(
                    "(((N_A * 1000000) div __N) * ((N_B * 1000000) div __N)) div 1000000"
                )
            )
            .cast("bigint")
            .alias("DEV_PPM"),
        )
    )
