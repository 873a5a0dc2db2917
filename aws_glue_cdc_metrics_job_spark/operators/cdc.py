"""Snapshot-diff CDC (SURVEY.md C2/C3, the reference's core composite op).

Reference semantics (scripts/cdc_metrics_job.py:91-112):
  inserts = current \\ previous          (full-row subtract)
  deletes = previous \\ current
  updates = (current JOIN previous ON pk) WHERE any non-pk column <>
  log     = inserts UNION updates UNION deletes, tagged cdc_action/cdc_timestamp

Two defects in the reference, both fixed here (and reproducible via flags for
parity tests):

1. Full-row ``subtract`` compares *all* columns including the
   per-run ``ingestion_timestamp``/``cdc_timestamp`` added just before the
   diff (:79-81), so every row classifies as insert+delete every run
   (SURVEY.md O1). We diff on business columns only.
2. The ``<>`` change predicate misses NULL->value transitions. Default is
   null-safe (IS DISTINCT FROM); ``null_safe=False`` reproduces the quirk.

Scale design: the reference's ``subtract`` is a full-row distinct-and-diff --
two shuffles over every column of both snapshots. Key-based mode (default)
shuffles on the primary key only: inserts/deletes are left-anti joins, updates
an inner join + residual OR-predicate, exactly the plan Catalyst runs for an
equi-join with mixed predicates (SURVEY.md J1/J2). All three legs reuse the
same key-hash exchange, and AQE handles skewed keys. ``fullrow`` mode keeps
the reference's exceptAll shape for parity testing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .relational import any_column_differs

CDC_ACTION = "cdc_action"
CDC_TS = "cdc_timestamp"
METADATA_COLS = ("ingestion_timestamp", CDC_ACTION, CDC_TS)


def business_columns(df: DataFrame, pks: list[str]) -> list[str]:
    return [c for c in df.columns if c not in pks and c not in METADATA_COLS]


def cdc_diff(
    current: DataFrame,
    previous: DataFrame,
    pks: list[str],
    compare_cols: list[str] | None = None,
    null_safe: bool = True,
    mode: str = "keyed",
) -> DataFrame:
    """Diff two snapshots into a tagged change set.

    Returns current-image rows tagged 'insert'/'update' and previous-image
    rows tagged 'delete', with a ``cdc_action`` column appended. Caller adds
    ``cdc_timestamp`` (kept out of the diff so it can never contaminate it).
    """
    cols = compare_cols or business_columns(current, pks)
    keep = pks + [c for c in current.columns if c not in pks and c not in METADATA_COLS]
    cur = current.select(*keep)
    prev = previous.select(*keep)

    if mode == "fullrow":
        # Reference shape (scripts/cdc_metrics_job.py:98-103): distinct
        # full-row subtract. Kept for parity tests; not the scale path.
        inserts = cur.subtract(prev)
        deletes = prev.subtract(cur)
    elif mode == "keyed":
        inserts = cur.join(prev.select(*pks), pks, "left_anti")
        deletes = prev.join(cur.select(*pks), pks, "left_anti")
    else:
        raise ValueError(f"unknown mode: {mode!r}")

    changed = any_column_differs("curr", "prev", cols, null_safe=null_safe)
    updates = (
        cur.alias("curr")
        .join(prev.alias("prev"), [F.col(f"curr.{k}") == F.col(f"prev.{k}") for k in pks], "inner")
        .filter(changed)
        .select("curr.*")
    )

    return (
        inserts.withColumn(CDC_ACTION, F.lit("insert"))
        .unionByName(updates.withColumn(CDC_ACTION, F.lit("update")))
        .unionByName(deletes.withColumn(CDC_ACTION, F.lit("delete")))
    )


def tag_appends(df: DataFrame, now_ts) -> DataFrame:
    """Append-only CDC for watermarked tables (SURVEY.md C3,
    scripts/cdc_metrics_job.py:86-88): every incrementally-read row is an
    insert."""
    return df.withColumn(CDC_ACTION, F.lit("insert")).withColumn(CDC_TS, F.lit(now_ts).cast("timestamp"))


def apply_changes(snapshot: DataFrame, changes: DataFrame, pks: list[str]) -> DataFrame:
    """Merge a tagged change set into a snapshot (upsert + delete) -- the
    reverse direction the reference never needed (it overwrites the snapshot
    with the full current frame, :112). Emulates MERGE INTO without Delta:
    anti-join out touched keys, union in the new images of inserts/updates."""
    touched = changes.select(*pks)
    survivors = snapshot.join(touched, pks, "left_anti")
    new_images = changes.filter(F.col(CDC_ACTION).isin("insert", "update")).select(*snapshot.columns)
    return survivors.unionByName(new_images)
