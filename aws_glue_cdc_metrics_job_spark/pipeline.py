"""Medallion pipeline runner: bronze CDC -> silver conform -> gold marts.

The reference runs this as three externally-sequenced Glue jobs
(.github/workflows/deploy-glue-job.yml:38-42) of straight-line script code
(scripts/cdc_metrics_job_bronze.py / _silver.py / _gold.py). Here the same
lifecycle is one explicit, testable object over the operator library:

- bronze (scripts/cdc_metrics_job.py:48-112): per-table raw extract ->
  dropDuplicates -> ingest metadata -> either append-only CDC for
  watermarked tables (C3) or snapshot-diff CDC (C2) -> action-partitioned
  CDC log + refreshed snapshot.
- silver (:126-192): watermark-filtered conform (cast, event date, keyed
  dedup) appended per CREATION_DATE, watermark advanced to max processed
  date (the correct advance rule of the two the reference uses, SURVEY.md
  C1); then the order_revenue join overwritten.
- gold (:225-571): the mart library over silver, each overwritten.

Deliberate improvements over the reference (each flagged in SURVEY.md):
- ``df.cache()`` at multi-action nodes -- the reference recomputes the
  bronze frame for each of its 3 sinks (:84,111,112) and the silver frame
  for its watermark ``agg(max)`` (:146);
- diff on business columns only (the reference's full-row subtract compares
  the per-run ingestion timestamps it just added, misclassifying every row
  every run -- O1);
- deterministic keyed dedup (keep latest by event time) instead of
  ``dropDuplicates(keys)``'s arbitrary row (P12);
- injectable clock instead of wall-clock ``datetime.now()``/
  ``current_timestamp()`` (F3).

Scale notes (100 TB): every zone write goes through
``write_parquet(partition_by=...)`` so downstream reads prune partitions;
the CDC diff shuffles only primary keys + changed rows (operators.cdc);
nothing collects to the driver except the tiny watermark values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.cdc import CDC_ACTION, CDC_TS, cdc_diff, tag_appends
from .operators.incremental import advance_watermark, incremental_read
from .operators.relational import keep_latest
from .session import Clock
from .sources import MedallionLayout, path_exists, read_parquet, write_parquet
from .state import WatermarkStore


@dataclass(frozen=True)
class TableSpec:
    """One source table (reference: TABLES_CONFIG, scripts/cdc_metrics_job.py:42-46)."""

    name: str
    pks: list[str]
    ts_col: str | None = None          # watermark column -> append-only CDC (C3)
    event_date_col: str | None = None  # silver partition/date column source
    casts: dict[str, str] = field(default_factory=dict)


# The reference's TABLES_CONFIG (scripts/cdc_metrics_job.py:41-46) expressed
# as specs. date_dim goes through the same generic silver conform
# (CREATION_DATE = to_date(date_key), strictly-greater watermark filter,
# dedup on date_key, append partitioned by CREATION_DATE, watermark advanced
# to max processed date) that the reference hand-writes as its own
# process_silver_date_dim variant (:194-215).
REFERENCE_TABLES: list[TableSpec] = [
    TableSpec(
        name="order_items",
        pks=["ORDER_ID", "LINEITEM_ID"],
        ts_col="CREATION_TIME_UTC",
        event_date_col="CREATION_TIME_UTC",
        casts={"ITEM_PRICE": "double"},
    ),
    TableSpec(
        name="order_item_options",
        pks=["ORDER_ID", "LINEITEM_ID", "OPTION_NAME"],
        casts={"OPTION_PRICE": "double"},
    ),
    TableSpec(
        name="date_dim",
        pks=["date_key"],
        event_date_col="date_key",
    ),
]


@dataclass
class CdcPipeline:
    spark: SparkSession
    layout: MedallionLayout
    store: WatermarkStore
    clock: Clock
    tables: list[TableSpec]

    # ---- bronze -----------------------------------------------------------

    def run_bronze(self, read_source: Callable[[str], DataFrame]) -> dict[str, DataFrame]:
        """Extract + CDC per table; returns the tagged change sets."""
        changes: dict[str, DataFrame] = {}
        run_date = self.clock.today_str
        now = self.clock.now.strftime("%Y-%m-%d %H:%M:%S")
        for spec in self.tables:
            src = read_source(spec.name).dropDuplicates()
            if spec.ts_col is not None:
                src = incremental_read(src, spec.ts_col, self.store, f"bronze/{spec.name}", inclusive=True)
            cur = src.withColumn("ingestion_timestamp", F.lit(now).cast("timestamp")).cache()
            write_parquet(cur, self.layout.bronze(spec.name, run_date), mode="overwrite")

            if spec.ts_col is not None:
                delta = tag_appends(cur, now)
            else:
                snap_path = self.layout.snapshot(spec.name)
                # Cold start is a path probe, not a broad except: a transient
                # read failure must fail the run, or the diff would tag every
                # row 'insert' and corrupt the durable CDC log (S8, :95).
                if path_exists(self.spark, snap_path):
                    prev = read_parquet(self.spark, snap_path)
                else:
                    prev = self.spark.createDataFrame([], cur.schema)
                delta = cdc_diff(cur, prev, pks=spec.pks).withColumn(
                    CDC_TS, F.lit(now).cast("timestamp")
                )
            if delta.isEmpty():
                # empty-input short-circuit (reference :134): a files-less
                # partitioned dir is unreadable, so don't write or re-read it
                changes[spec.name] = delta
                if spec.ts_col is None:
                    write_parquet(
                        cur.drop("ingestion_timestamp"), self.layout.snapshot(spec.name), mode="overwrite"
                    )
                cur.unpersist()
                continue
            cdc_path = self.layout.cdc(spec.name, run_date)
            write_parquet(delta, cdc_path, mode="append", partition_by=[CDC_ACTION])
            # refresh snapshot AFTER the log write (at-least-once, :111-112)
            if spec.ts_col is None:
                write_parquet(
                    cur.drop("ingestion_timestamp"), self.layout.snapshot(spec.name), mode="overwrite"
                )
            else:
                advance_watermark(cur, spec.ts_col, self.store, f"bronze/{spec.name}")
            # Return the change set re-read from the durable log: the diff's
            # lineage reads the snapshot path, which the overwrite above just
            # invalidated (Spark refreshes caches on path writes), so the
            # in-memory frame must not be handed out.
            changes[spec.name] = read_parquet(self.spark, cdc_path)
            cur.unpersist()
        return changes

    # ---- silver -----------------------------------------------------------

    def run_silver(self) -> None:
        """Conform bronze -> silver per table, then assemble order_revenue."""
        run_date = self.clock.today_str
        for spec in self.tables:
            raw = read_parquet(self.spark, self.layout.bronze(spec.name, run_date))
            df = raw
            if spec.event_date_col is not None:
                df = df.withColumn("CREATION_DATE", F.to_date(spec.event_date_col))
                wm = self.store.get(f"silver/{spec.name}")
                df = df.filter(F.col("CREATION_DATE") > F.lit(wm).cast("date"))
            for col, typ in spec.casts.items():
                df = df.withColumn(col, F.col(col).cast(typ))
            if df.isEmpty():
                continue
            order = [F.col(spec.ts_col).desc()] if spec.ts_col else []
            df = keep_latest(df, spec.pks, order, tiebreakers=spec.pks).cache()
            # Watermarked fact tables accrete by event date; snapshot-diff
            # tables conform the full current image, so overwrite.
            write_parquet(
                df,
                self.layout.silver(spec.name),
                mode="append" if spec.event_date_col else "overwrite",
                partition_by=["CREATION_DATE"] if spec.event_date_col else None,
            )
            if spec.event_date_col is not None:
                advance_watermark(df, "CREATION_DATE", self.store, f"silver/{spec.name}")
            df.unpersist()

    def build_order_revenue(self, items_table: str, options_table: str) -> DataFrame:
        from .plans.marts import build_order_revenue

        items = read_parquet(self.spark, self.layout.silver(items_table))
        options = read_parquet(self.spark, self.layout.silver(options_table))
        revenue = build_order_revenue(items, options)
        write_parquet(
            revenue,
            self.layout.silver("order_revenue"),
            mode="overwrite",
            partition_by=["CREATION_DATE"],
        )
        return revenue

    # ---- gold -------------------------------------------------------------

    def run_gold(self, items_table: str = "order_items", options_table: str = "order_item_options") -> None:
        """All marts from silver, overwritten (SURVEY.md §2.10)."""
        from .plans import marts

        revenue = read_parquet(self.spark, self.layout.silver("order_revenue")).cache()
        items = read_parquet(self.spark, self.layout.silver(items_table))
        options = read_parquet(self.spark, self.layout.silver(options_table))
        now = self.clock.today_str

        ltv = marts.fact_ltv_daily(revenue)
        write_parquet(ltv, self.layout.gold("fact_ltv_daily"), partition_by=["CREATION_DATE"])
        snap = marts.ltv_snapshot(ltv)
        write_parquet(snap, self.layout.gold("mart_customer_ltv_snapshot"))
        write_parquet(marts.clv_segment(snap), self.layout.gold("mart_customer_clv_segment"))
        write_parquet(marts.rfm(revenue, now), self.layout.gold("mart_customer_rfm"))
        write_parquet(marts.churn_profile(revenue, now), self.layout.gold("mart_customer_churn_profile"))
        for grain in ("daily", "weekly", "monthly", "hourly"):
            write_parquet(
                marts.sales_trends(revenue, grain), self.layout.gold(f"mart_sales_trends_{grain}")
            )
        write_parquet(marts.loyalty_impact(items, revenue), self.layout.gold("mart_loyalty_program_impact"))
        write_parquet(
            marts.location_performance(items, revenue), self.layout.gold("mart_location_performance")
        )
        write_parquet(
            marts.discount_effectiveness(items, options, revenue),
            self.layout.gold("mart_discount_effectiveness"),
        )
        revenue.unpersist()

    def run_all(self, read_source: Callable[[str], DataFrame]) -> None:
        self.run_bronze(read_source)
        self.run_silver()
        self.build_order_revenue("order_items", "order_item_options")
        self.run_gold()
