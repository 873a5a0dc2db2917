"""High-watermark incremental ingest (SURVEY.md C1).

The reference implements this twice with different advance rules:
- bronze: predicate pushed into the source, watermark advanced to wall-clock
  now() after write (scripts/cdc_metrics_job.py:57-67,90) -- can lose rows
  committed between the source query and the clock read;
- silver: filter strictly above the stored mark, advance to
  max(processed event date) (:130-132,146-147) -- the correct rule.

The engine implements the silver rule: advance only to what was actually
processed. The filter uses ``>=`` or ``>`` per the reference's two sites
(bronze >= :64, silver > :132); duplicates that re-enter under ``>=`` are
dropped by the deterministic keyed dedup downstream (SURVEY.md C4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..state import WatermarkStore


def incremental_read(
    df: DataFrame,
    ts_col: str,
    store: WatermarkStore,
    table: str,
    inclusive: bool = False,
) -> DataFrame:
    """Rows newer than the stored watermark. Parquet row-group stats /
    partition pruning make this filter a near-free scan-skip when the data
    is laid out by the same column (SURVEY.md S5/S7)."""
    wm = store.get(table)
    c = F.col(ts_col)
    return df.filter(c >= wm) if inclusive else df.filter(c > wm)


def advance_watermark(df: DataFrame, ts_col: str, store: WatermarkStore, table: str) -> str | None:
    """Advance to max(ts actually processed) -- call only after the
    downstream write succeeds (at-least-once, scripts/cdc_metrics_job.py:
    146-147). Returns the new watermark, or None on empty input."""
    import datetime as dt

    m = df.agg(F.max(ts_col).alias("m")).collect()[0]["m"]
    if m is None:
        return None
    if isinstance(m, dt.datetime):
        val = m.strftime("%Y-%m-%d %H:%M:%S")
    elif isinstance(m, dt.date):
        val = m.strftime("%Y-%m-%d")
    else:
        val = str(m)
    return store.advance(table, val)
