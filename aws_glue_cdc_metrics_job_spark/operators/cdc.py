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
computes all three change classes in ONE full-outer join on the primary key:
each snapshot is scanned and key-shuffled exactly once, and a row's class
falls out of side-presence markers (prev absent -> insert, cur absent ->
delete, both present and any compared column differs -> update, else
dropped). That replaces the previous three-leg plan (two anti-joins + an
inner join = three scans of each snapshot) with a single join whose cost is
one exchange per side -- the difference between linear and ~3x-linear scan
volume at 100 TB snapshot sizes. AQE handles skewed keys. ``fullrow`` mode
keeps the reference's exceptAll shape for parity testing.
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


def align_to_current(previous: DataFrame, current: DataFrame, pks: list[str]) -> DataFrame:
    """Project ``previous`` onto ``current``'s schema for a diff across a
    schema change: columns ADDED since the previous snapshot appear as
    typed NULLs (so the null-safe change predicate classifies any row
    where the new column is now populated as an update), columns DROPPED
    since then are discarded (the diff -- like the downstream table --
    speaks the current schema; their values cannot make a row an update
    because updates are judged on surviving columns only). Primary keys
    must exist on both sides; a renamed pk is a different table, not an
    evolved one."""
    missing_pks = [k for k in pks if k not in previous.columns]
    if missing_pks:
        raise ValueError(f"previous snapshot lacks primary key column(s) {missing_pks}")
    prev_cols = set(previous.columns)
    return previous.select(
        *[
            F.col(f.name) if f.name in prev_cols else F.lit(None).cast(f.dataType).alias(f.name)
            for f in current.schema.fields
        ]
    )


def cdc_diff(
    current: DataFrame,
    previous: DataFrame,
    pks: list[str],
    compare_cols: list[str] | None = None,
    null_safe: bool = True,
    mode: str = "keyed",
    with_old_image: bool = False,
    evolve_schema: bool = False,
) -> DataFrame:
    """Diff two snapshots into a tagged change set.

    Returns current-image rows tagged 'insert'/'update' and previous-image
    rows tagged 'delete', with a ``cdc_action`` column appended. Caller adds
    ``cdc_timestamp`` (kept out of the diff so it can never contaminate it).

    ``with_old_image=True`` (keyed mode only) additionally emits a
    ``cdc_old`` struct holding the PREVIOUS image of the row (null for
    inserts) -- the retraction record downstream incremental aggregate
    maintenance needs (operators/maintenance.py). It falls out of the
    single full-outer join for free: both sides are already in the joined
    row, so no extra scan or shuffle.
    """
    if evolve_schema:
        previous = align_to_current(previous, current, pks)
    cols = compare_cols or business_columns(current, pks)
    keep = pks + [c for c in current.columns if c not in pks and c not in METADATA_COLS]
    cur = current.select(*keep)
    prev = previous.select(*keep)
    changed = any_column_differs("curr", "prev", cols, null_safe=null_safe)

    if mode == "fullrow":
        if with_old_image:
            raise ValueError("with_old_image requires mode='keyed'")
        # Reference shape (scripts/cdc_metrics_job.py:98-103): distinct
        # full-row subtract. Kept for parity tests; not the scale path.
        inserts = cur.subtract(prev)
        deletes = prev.subtract(cur)
        updates = (
            cur.alias("curr")
            .join(
                prev.alias("prev"),
                [F.col(f"curr.{k}") == F.col(f"prev.{k}") for k in pks],
                "inner",
            )
            .filter(changed)
            .select("curr.*")
        )
        return (
            inserts.withColumn(CDC_ACTION, F.lit("insert"))
            .unionByName(updates.withColumn(CDC_ACTION, F.lit("update")))
            .unionByName(deletes.withColumn(CDC_ACTION, F.lit("delete")))
        )
    if mode != "keyed":
        raise ValueError(f"unknown mode: {mode!r}")

    # Single-pass keyed diff: one full-outer join classifies every key.
    # Side-presence markers (not pk-null checks) so NULL pks in the data
    # keep the anti-join semantics of the three-leg formulation: a NULL key
    # never equi-matches, so its cur row is an insert / prev row a delete.
    curm = cur.withColumn("__cur_present", F.lit(True)).alias("curr")
    prevm = prev.withColumn("__prev_present", F.lit(True)).alias("prev")
    joined = curm.join(
        prevm, [F.col(f"curr.{k}") == F.col(f"prev.{k}") for k in pks], "full_outer"
    )
    action = (
        F.when(F.col("prev.__prev_present").isNull(), F.lit("insert"))
        .when(F.col("curr.__cur_present").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    image = [
        F.when(F.col("curr.__cur_present").isNotNull(), F.col(f"curr.{c}"))
        .otherwise(F.col(f"prev.{c}"))
        .alias(c)
        for c in keep
    ]
    extra = []
    if with_old_image:
        old = F.when(
            F.col("prev.__prev_present").isNotNull(),
            F.struct(*[F.col(f"prev.{c}").alias(c) for c in keep]),
        )
        extra.append(old.alias("cdc_old"))
    return joined.select(*image, action.alias(CDC_ACTION), *extra).filter(
        F.col(CDC_ACTION).isNotNull()
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


def compact_changelog(
    log: DataFrame,
    pks: list[str],
    order_cols: list[str],
    action_col: str = CDC_ACTION,
) -> DataFrame:
    """Collapse a change log (many insert/update/delete rows per key over
    time) to the NET change per key across the whole window -- what a
    downstream MERGE actually needs to apply, and the Debezium/Delta
    changelog-compaction semantic:

      first=insert, last=delete  -> no row (the key came and went)
      first=insert, last!=delete -> one 'insert' with the LAST image
      first!=insert, last=delete -> one 'delete'
      first!=insert, last!=delete-> one 'update' with the LAST image
      (a delete followed by re-insert inside the window is an update)

    One keyed aggregation -- min_by/max_by over ``order_cols`` pick the
    first action and last image without a window sort, map-side
    combinable, one shuffle of (pk, first-action, last-image) rows
    however long the log is. ``order_cols`` must totally order each key's
    changes (e.g. a sequence number, or cdc_timestamp + a tiebreaker);
    applying the compacted set then equals replaying the full log
    (pinned in tests/test_cdc.py).

    Returns pks + the last image's payload columns INCLUDING the
    ``order_cols`` (so a consumer replaying the net changes keeps the
    sequence/timestamp columns, and ``apply_changes``'
    select(*snapshot.columns) works when the snapshot schema carries
    them) + ``cdc_action`` (the net action)."""
    payload = [c for c in log.columns if c not in pks and c != action_col]
    ordk = F.struct(*[F.col(c) for c in order_cols])
    agg = log.groupBy(*pks).agg(
        F.min_by(F.col(action_col), ordk).alias("__first"),
        F.max_by(F.struct(*[F.col(c) for c in payload]), ordk).alias("__last"),
        F.max_by(F.col(action_col), ordk).alias("__last_action"),
    )
    net = (
        F.when((F.col("__first") == "insert") & (F.col("__last_action") == "delete"), F.lit(None))
        .when(F.col("__first") == "insert", F.lit("insert"))
        .when(F.col("__last_action") == "delete", F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    return (
        agg.withColumn(action_col, net)
        .filter(F.col(action_col).isNotNull())
        .select(*pks, *[F.col(f"__last.{c}").alias(c) for c in payload], action_col)
    )
