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


def quantile_bucket(
    df: DataFrame,
    value_col: str,
    probs: list[float],
    labels: list[str],
    out_col: str = "BUCKET",
) -> DataFrame:
    """Label rows by right-closed quantile bins: value <= q(probs[0]) ->
    labels[0], ... else labels[-1]. len(labels) == len(probs) + 1."""
    if len(labels) != len(probs) + 1:
        raise ValueError("need len(labels) == len(probs) + 1")
    cuts = exact_quantile_cuts(df, value_col, probs)
    expr = None
    for i in range(len(probs)):
        cond = F.col(value_col) <= F.col(f"q{i}")
        expr = F.when(cond, labels[i]) if expr is None else expr.when(cond, labels[i])
    expr = expr.otherwise(labels[-1])
    out = df.crossJoin(F.broadcast(cuts)).withColumn(out_col, expr)
    return out.drop(*[f"q{i}" for i in range(len(probs))])
