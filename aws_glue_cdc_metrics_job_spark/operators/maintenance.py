"""Incremental aggregate maintenance from CDC change sets.

The reference recomputes every gold mart from the full silver table each run
(scripts/cdc_metrics_job_gold.py reads whole zones; e.g. fact_ltv_daily at
scripts/cdc_metrics_job.py:225-239 rebuilds from all of order_revenue). At
100 TB that full rescan is the dominant cost of keeping a mart fresh. This
module maintains SUM/COUNT-shaped aggregates from the CHANGE SET alone --
the classic incremental-view-maintenance identity for distributive
aggregates:

    agg'(k) = agg(k) + sum(new images at k) - sum(old images at k)

where the old images come from ``cdc_diff(..., with_old_image=True)``
(operators/cdc.py): inserts contribute +new, deletes -old, updates both
(+new at the new key, -old at the OLD key -- so group-key changes migrate
mass between groups correctly).

Scale shape: the change set is typically orders of magnitude smaller than
the snapshot. One groupBy over the (small) change set, then one key-shuffle
outer join against the existing aggregate -- the snapshot itself is never
read. Groups whose maintained row count reaches zero are dropped, matching
what a recompute would produce. AVG and other algebraic aggregates derive
from maintained (SUM, COUNT) pairs; MIN/MAX are NOT maintainable this way
(deleting the current extreme needs a rescan of the group) and are
deliberately out of scope -- callers needing them recompute affected groups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import money
from .cdc import CDC_ACTION

# accumulator type wide enough for any maintained total; fixed so repeated
# maintenance cycles keep a stable schema
_ACC_PRECISION = 30


def _acc_type(scale: int) -> str:
    return f"decimal({_ACC_PRECISION},{scale})"


def aggregate_snapshot(
    df: DataFrame,
    group_keys: list[str],
    sum_cols: list[str],
    count_col: str = "N_ROWS",
    decimal_scale: int | None = None,
) -> DataFrame:
    """The maintained aggregate's full-recompute form: per-key SUMs plus a
    row count. Run once to seed; thereafter ``incremental_agg_update``
    keeps it fresh from change sets.

    ``decimal_scale`` switches money columns to exact decimal accumulation
    (functions/numeric): incremental maintenance then reproduces a full
    recompute BIT-EXACTLY, because decimal addition is associative --
    float SUMs are not, so the default double path agrees only up to
    last-ulp association noise."""
    if decimal_scale is None:
        aggs = [F.sum(F.col(c)).alias(f"SUM_{c}") for c in sum_cols]
    else:
        aggs = [
            F.sum(money(c, decimal_scale)).cast(_acc_type(decimal_scale)).alias(f"SUM_{c}")
            for c in sum_cols
        ]
    aggs.append(F.count(F.lit(1)).alias(count_col))
    return df.groupBy(*group_keys).agg(*aggs)


def incremental_agg_update(
    prev_agg: DataFrame,
    changes: DataFrame,
    group_keys: list[str],
    sum_cols: list[str],
    count_col: str = "N_ROWS",
    decimal_scale: int | None = None,
) -> DataFrame:
    """Apply a CDC change set (from ``cdc_diff(..., with_old_image=True)``)
    to a previously-computed ``aggregate_snapshot`` frame.

    ``changes`` rows carry the new image in top-level columns and the old
    image in the ``cdc_old`` struct. Signed contributions:

      insert:  +new
      delete:  -old
      update:  +new AND -old (two contribution rows; the old one lands on
               the OLD group key, so key-migrating updates move mass)

    Returns the refreshed aggregate: identical (up to float association)
    to recomputing ``aggregate_snapshot`` over the new snapshot, without
    ever scanning it. Groups whose maintained count reaches zero are
    dropped."""
    if "cdc_old" not in changes.columns:
        raise ValueError(
            "changes must carry the previous row image: build them with "
            "cdc_diff(..., with_old_image=True)"
        )

    def measure(col: Column) -> Column:
        return money(col, decimal_scale) if decimal_scale is not None else col

    new_part = changes.filter(F.col(CDC_ACTION).isin("insert", "update")).select(
        *[F.col(k).alias(k) for k in group_keys],
        *[measure(F.col(c)).alias(c) for c in sum_cols],
        F.lit(1).alias("__sign"),
    )
    old_part = changes.filter(F.col(CDC_ACTION).isin("delete", "update")).select(
        *[F.col(f"cdc_old.{k}").alias(k) for k in group_keys],
        *[measure(F.col(f"cdc_old.{c}")).alias(c) for c in sum_cols],
        F.lit(-1).alias("__sign"),
    )
    delta = (
        new_part.unionByName(old_part)
        .groupBy(*group_keys)
        .agg(
            *[
                F.sum(F.col(c) * F.col("__sign")).alias(f"__d_{c}")
                for c in sum_cols
            ],
            F.sum("__sign").cast("long").alias("__d_n"),
        )
    )
    merged = prev_agg.join(delta, group_keys, "full_outer")
    zero = (
        F.lit(0.0)
        if decimal_scale is None
        else F.lit(0).cast(_acc_type(decimal_scale))
    )
    out_cols = []
    for c in sum_cols:
        s = F.coalesce(F.col(f"SUM_{c}"), zero) + F.coalesce(F.col(f"__d_{c}"), zero)
        if decimal_scale is not None:
            s = s.cast(_acc_type(decimal_scale))
        out_cols.append(s.alias(f"SUM_{c}"))
    n = (
        F.coalesce(F.col(count_col), F.lit(0).cast("long"))
        + F.coalesce(F.col("__d_n"), F.lit(0).cast("long"))
    ).alias(count_col)
    return (
        merged.select(*group_keys, *out_cols, n)
        .filter(F.col(count_col) > 0)
    )
