"""Exact-quantile bucketing (SURVEY.md Q1).

The reference collects the whole LTV snapshot to the driver as pandas and
runs ``pd.qcut(q=[0, .2, .8, 1.0], labels=[Low, Medium, High])``
(scripts/cdc_metrics_job.py:256-266) -- a driver-memory cliff at scale.

Native replacement: exact ``percentile`` (linear interpolation, same as
pandas/DuckDB ``quantile_cont``) for the cut values, cross-joined (broadcast,
1 row) back onto the frame, then right-closed CASE ranges matching qcut's
``(lo, hi]`` bins. Distributed end-to-end; the only driver traffic is the
cut-value row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_quantile_cuts(df: DataFrame, value_col: str, probs: list[float]) -> DataFrame:
    """One-row frame of exact interpolated quantiles named q0..qN."""
    aggs = [
        F.expr(f"percentile({value_col}, {p!r})").alias(f"q{i}")
        for i, p in enumerate(probs)
    ]
    return df.agg(*aggs)


def approx_quantile_cuts(
    df: DataFrame, value_col: str, probs: list[float], accuracy: int = 10_000
) -> DataFrame:
    """One-row frame of approx_percentile cuts named q0..qN.

    The 100 TB swap for ``exact_quantile_cuts`` (SCALE.md quantile row):
    exact ``percentile`` buffers every group value in the aggregation
    state, which is fine for the one-row-per-user LTV snapshot but not for
    billions of raw rows. ``approx_percentile`` keeps a bounded
    Greenwald-Khanna sketch instead; the returned cut is a REAL data value
    within ``1/accuracy`` relative RANK error (no interpolation), so
    bucket counts can drift by up to that rank fraction around each cut --
    agreement with the exact path on a fixture is pinned in
    test_quantile.py."""
    aggs = [
        F.expr(f"approx_percentile({value_col}, {p!r}, {int(accuracy)})").alias(f"q{i}")
        for i, p in enumerate(probs)
    ]
    return df.agg(*aggs)


def quantile_bucket(
    df: DataFrame,
    value_col: str,
    probs: list[float],
    labels: list[str],
    out_col: str = "BUCKET",
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Label rows by right-closed quantile bins: value <= q(probs[0]) ->
    labels[0], ... else labels[-1]. len(labels) == len(probs) + 1.

    ``exact=False`` swaps the exact interpolated percentile for the
    sketch-based ``approx_percentile`` (see approx_quantile_cuts) -- the
    scale path when the input is raw-event-sized rather than one row per
    entity. Graded queries keep the exact default for oracle parity."""
    if len(labels) != len(probs) + 1:
        raise ValueError("need len(labels) == len(probs) + 1")
    if exact:
        cuts = exact_quantile_cuts(df, value_col, probs)
    else:
        cuts = approx_quantile_cuts(df, value_col, probs, accuracy)
    expr = None
    for i in range(len(probs)):
        cond = F.col(value_col) <= F.col(f"q{i}")
        expr = F.when(cond, labels[i]) if expr is None else expr.when(cond, labels[i])
    expr = expr.otherwise(labels[-1])
    out = df.crossJoin(F.broadcast(cuts)).withColumn(out_col, expr)
    return out.drop(*[f"q{i}" for i in range(len(probs))])


def winsorize(
    df: DataFrame,
    value_col: str,
    lower: float = 0.01,
    upper: float = 0.99,
    group_cols: list[str] | None = None,
    out_col: str | None = None,
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Clip ``value_col`` to its [p_lower, p_upper] interpolated percentiles
    -- per group when ``group_cols`` is given -- the standard heavy-tail
    guard before means/regressions/feature scaling. Adds ``out_col``
    (default ``<value_col>_W``) plus the bounds used (LO_BOUND/HI_BOUND,
    rounded half-up to 6 dp so the clip thresholds are engine-exact).

    One percentile aggregation (per group; broadcast back -- group count is
    small by the usual dimension contract) and a scan-stage clamp; no
    second pass over the data. ``exact=False`` swaps the mergeable
    ``approx_percentile`` sketch for the bounds -- the 100 TB path when
    groups are huge (the clip then lands on a real data value within the
    sketch's rank error instead of an interpolated point)."""
    from .numeric import rhu

    out_col = out_col or f"{value_col}_W"
    group_cols = group_cols or []
    fn = "percentile" if exact else "approx_percentile"
    extra = "" if exact else f", {int(accuracy)}"
    bounds = df.groupBy(*group_cols).agg(
        rhu(F.expr(f"{fn}({value_col}, {lower!r}{extra})"), 6).alias("LO_BOUND"),
        rhu(F.expr(f"{fn}({value_col}, {upper!r}{extra})"), 6).alias("HI_BOUND"),
    )
    joined = (
        df.join(F.broadcast(bounds), group_cols)
        if group_cols
        else df.crossJoin(F.broadcast(bounds))
    )
    clipped = F.least(
        F.greatest(F.col(value_col), F.col("LO_BOUND")), F.col("HI_BOUND")
    )
    return joined.withColumn(out_col, clipped)
