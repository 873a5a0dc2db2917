"""Slowly-changing-dimension (Type 2) maintenance from a CDC change log.

The reference keeps only the LATEST image of every source table (snapshot
overwrite at scripts/cdc_metrics_job.py:112) and a flat action-tagged change
log (:110-111); point-in-time questions ("what was this customer's segment
when the order was placed?") are unanswerable. This module turns that
change log into a queryable version history -- the standard warehouse SCD
Type-2 shape: one row per (key, version) with ``VALID_FROM``/``VALID_TO``
interval columns and an ``IS_CURRENT`` flag.

Scale shape: ONE hash shuffle on the dimension key and one sort per
partition -- the version intervals fall out of ``lead()`` over the per-key
event order, so no self-join and no interval materialization. Dimension
keys are typically well-distributed (customer ids, not categories), and the
window state is one row. The no-op-update collapse is a ``lag()`` over the
same window spec, so Catalyst reuses the single sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .cdc import CDC_ACTION


def scd2_from_log(
    log: DataFrame,
    pks: list[str],
    ts_col: str,
    attr_cols: list[str],
    action_col: str = CDC_ACTION,
    order_cols: list[str] | None = None,
    collapse_unchanged: bool = True,
    current_flag_type: str = "int",
) -> DataFrame:
    """Build the Type-2 history: every non-delete log row opens a version at
    its ``ts_col``; the version closes when the key's next log row arrives
    (an update supersedes it, a delete terminates it). Delete rows close
    the preceding version but emit none themselves.

    ``order_cols`` break equal-timestamp ties deterministically (required
    for hash-stable output when timestamps can collide). With
    ``collapse_unchanged`` (default), an update whose ``attr_cols`` all
    equal the preceding surviving row's values is dropped BEFORE interval
    assignment, so it extends the open version instead of splitting it --
    the standard no-op-update suppression. (A run of identical updates
    collapses onto its first row; comparing against the raw predecessor is
    equivalent to comparing against the last survivor because every dropped
    row equals its own predecessor, and deletes are never dropped.)

    Returns ``pks + attr_cols + [VALID_FROM, VALID_TO, IS_CURRENT]``:
    ``VALID_TO`` is NULL for the open version, ``IS_CURRENT`` is 1 only for
    an open (not delete-terminated) version. Intervals are half-open
    ``[VALID_FROM, VALID_TO)``.
    """
    order = [ts_col] + list(order_cols or [])
    w = Window.partitionBy(*pks).orderBy(*[F.col(c) for c in order])
    is_delete = F.col(action_col) == F.lit("delete")

    frame = log
    if collapse_unchanged:
        attrs = F.struct(*[F.col(c) for c in attr_cols])
        prev_attrs = F.lag(attrs).over(w)
        prev_delete = F.lag(is_delete).over(w)
        noop = (
            ~is_delete
            & (prev_delete == F.lit(False))
            # struct equality in Spark (and DuckDB row equality) is
            # null-safe fieldwise, which is exactly the "nothing changed"
            # test we want for nullable attributes
            & attrs.eqNullSafe(prev_attrs)
        )
        frame = frame.withColumn("__noop", F.coalesce(noop, F.lit(False))).filter(
            ~F.col("__noop")
        )

    valid_to = F.lead(F.col(ts_col)).over(
        Window.partitionBy(*pks).orderBy(*[F.col(c) for c in order])
    )
    current: Column = F.col("VALID_TO").isNull()
    if current_flag_type == "int":
        current = F.when(current, F.lit(1)).otherwise(F.lit(0))
    return (
        frame.withColumn("VALID_TO", valid_to)
        .filter(~is_delete)
        .select(
            *pks,
            *attr_cols,
            F.col(ts_col).alias("VALID_FROM"),
            "VALID_TO",
            current.alias("IS_CURRENT"),
        )
    )


def scd2_snapshot_at(dim: DataFrame, at_ts) -> DataFrame:
    """Point-in-time image of a Type-2 dimension: the versions whose
    half-open validity interval contains ``at_ts``. Partition/file pruning
    applies if the dimension is stored partitioned on a ``VALID_FROM``
    derivative; otherwise this is a scan-stage filter."""
    at = F.lit(at_ts).cast("timestamp")
    return dim.filter(
        (F.col("VALID_FROM") <= at)
        & (F.col("VALID_TO").isNull() | (F.col("VALID_TO") > at))
    )


def scd2_apply_increment(
    dim: DataFrame,
    log_increment: DataFrame,
    pks: list[str],
    ts_col: str,
    attr_cols: list[str],
    action_col: str = CDC_ACTION,
    order_cols: list[str] | None = None,
    collapse_unchanged: bool = True,
) -> DataFrame:
    """Merge a NEW batch of change-log rows into an existing Type-2
    dimension without recomputing history -- the refresh path for a dim
    maintained from an append-only CDC log.

    Closed versions are immutable (their ``VALID_TO`` was fixed by the row
    that superseded them), so only each affected key's OPEN version can
    change: it either gets closed by the batch's first row, extended (the
    first row is a collapsed no-op), or terminated by a delete. The
    algorithm therefore touches exactly:

      affected keys x (1 open version + batch rows)

    Cost scales with the CHANGE SET: one broadcast-or-shuffle join of the
    batch's key set against the dimension to split touched/untouched (AQE
    picks broadcast for small batches), then ``scd2_from_log`` over the
    mini-log of open versions (replayed as synthetic rows at their original
    ``VALID_FROM``) plus the batch. Untouched rows -- and affected keys'
    closed versions -- pass through untouched.

    Late rows (``ts_col`` at or before the key's open ``VALID_FROM``) are
    DROPPED, mirroring the watermark discipline of the silver zone
    (SURVEY.md C4): replays and out-of-order stragglers cannot rewrite
    closed history. Result is identical to a full ``scd2_from_log`` over
    old-log + batch whenever the batch respects event order (pinned in
    tests/test_scd.py).
    """
    order = list(order_cols or [])
    batch_keys = log_increment.select(*pks).dropDuplicates()
    touched = dim.join(batch_keys, pks, "left_semi")
    untouched = dim.join(batch_keys, pks, "left_anti")

    is_open = F.col("VALID_TO").isNull()
    open_versions = touched.filter(is_open)
    closed_versions = touched.filter(~is_open)

    # replay each open version as a synthetic log row at its VALID_FROM --
    # only relative order matters, and every surviving batch row is later
    inc_types = dict(log_increment.dtypes)
    replay = open_versions.select(
        *pks,
        *attr_cols,
        F.col("VALID_FROM").alias(ts_col),
        F.lit("update").alias(action_col),
        # NULL order keys on replayed rows: they sort before any batch row
        # at the same timestamp, and ties are impossible anyway (batch rows
        # are strictly later than the open VALID_FROM)
        *[F.lit(None).cast(inc_types[c]).alias(c) for c in order],
    )
    # drop late rows: anything at or before the key's open VALID_FROM
    open_from = open_versions.select(
        *pks, F.col("VALID_FROM").alias("__open_from")
    )
    batch = (
        log_increment.join(open_from, pks, "left")
        .filter(F.col("__open_from").isNull() | (F.col(ts_col) > F.col("__open_from")))
        .select(*pks, *attr_cols, ts_col, action_col, *order)
    )
    mini_log = replay.unionByName(batch)
    recomputed = scd2_from_log(
        mini_log,
        pks=pks,
        ts_col=ts_col,
        attr_cols=attr_cols,
        action_col=action_col,
        order_cols=order or None,
        collapse_unchanged=collapse_unchanged,
    )
    out_cols = pks + attr_cols + ["VALID_FROM", "VALID_TO", "IS_CURRENT"]
    return (
        untouched.select(*out_cols)
        .unionByName(closed_versions.select(*out_cols))
        .unionByName(recomputed.select(*out_cols))
    )
