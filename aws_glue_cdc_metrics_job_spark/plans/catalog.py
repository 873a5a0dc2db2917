"""Graded query catalog: name -> (spark, sf_dir) -> DataFrame, plus the
matching DuckDB oracle SQL (driver contract, __spark_entry__.py).

Every query here is one SURVEY.md §2 operator/mart made observable. Queries
without an oracle entry (genuinely non-SQL ops, e.g. MinHash-LSH) get the
driver's weaker rows-only check and say so in their docstring."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        # a second registration under an existing name would SILENTLY
        # clobber the first query and its oracle (dict assignment), which
        # once cost a previously-green catalog entry its coverage. Allow
        # only the same function re-registering (module reload in tests).
        prior = QUERIES.get(name)
        if prior is not None and prior.__qualname__ != fn.__qualname__:
            raise ValueError(
                f"catalog query name {name!r} is already registered by "
                f"{prior.__module__}.{prior.__qualname__}; pick a new name"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# The driver grades the FIRST 50 catalog entries (served in this order)
# each round. Window history: r2 graded one representative per mechanism;
# r3 rotated onto the then-ungraded tail, leaving r2 ∪ r3 green for every
# oracle-equipped entry that existed when the r3 window was fixed. Round 4
# rotates onto everything still without a driver row (VERDICT r3 items 2
# and 4):
# - the 22 oracle-equipped entries added after the r3 window was fixed
#   (locally verified then; now due their driver rows),
# - the 2 rows without a clean row in any round: events_type_skew_report
#   (red r3; SKEW_X re-emitted on an exact integer lattice this round) and
#   events_approx_distinct_users (errored r1, never re-entered a window),
# - the 16 queries NEW in round 4 (sessionization, cohorts, pareto,
#   TPC-H Q7/Q10 shapes, inactivity gaps, discount bands, cross-source
#   matrix, DF table, winnow overlap, gopher audit, segment share,
#   length quantiles, norm buckets, the exact-distinct twin, the
#   count-min fast path),
# - the 9 rows-only-by-design entries that never had even a driver
#   rows-only row (their exactness/invariant bounds are pinned in
#   tests/test_catalog_parity.py and unit tests),
# - 1 insurance re-grade: docs_winnow_fingerprints, whose oracle SQL was
#   refactored into a shared CTE this round (values unchanged).
# Everything else keeps its r2/r3 green row as evidence and follows in
# definition order (see COVERAGE.md).
GRADE_FIRST: list[str] = [
    # -- oracle-equipped, added after the r3 window was fixed (22)
    "orders_shipping_priority",
    "region_nation_volume",
    "events_value_trend",
    "mart_sales_trends_all_grains",
    "cdc_evolved_diff",
    "cdc_compact_changelog",
    "events_session_transitions",
    "lineitem_basket_pairs",
    "emb_pq_encode",
    "emb_pq_adc_topk",
    "emb_pq_train_update",
    "docs_chunk_windows",
    "emb_cross_contamination",
    "docs_balanced_sample",
    "docs_segment_lang_profile",
    "docs_negative_samples",
    "docs_weighted_topk_sample",
    "docs_cm_sketch",
    "docs_cm_estimates",
    "docs_collocations",
    "docs_source_overlap",
    "docs_source_datasheet",
    # -- never a clean driver row in any round (2)
    "events_type_skew_report",
    "events_approx_distinct_users",
    # -- new in round 4 (16)
    "events_sessionize_stats",
    "events_activity_cohorts",
    "orders_pareto_deciles",
    "customer_returns_report",
    "nation_trade_volume",
    "events_inactivity_gaps",
    "lineitem_discount_bands",
    "docs_cross_source_dups",
    "docs_df_table",
    "docs_winnow_overlap_pairs",
    "docs_gopher_report",
    "docs_repeated_segment_share",
    "docs_token_quantiles_by_lang",
    "emb_norm_buckets",
    "events_exact_distinct_users",
    "docs_cm_estimates_fast",
    # -- rows-only-by-design, never in a window before (9)
    "events_hll_weekly_rollup",
    "events_quantile_sketch_rollup",
    "docs_minhash_lsh_pairs",
    "emb_ivf_topk",
    "multimodal_features",
    "emb_cosine_topk_fast",
    "docs_pack_sequences",
    "docs_incremental_near_dedup",
    "emb_ivf_pq_topk",
    # -- insurance re-grade: oracle refactored to a shared CTE this round
    "docs_winnow_fingerprints",
]


def ordered_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Catalog in grading-priority order: GRADE_FIRST (see comment above),
    then everything else in definition order."""
    head = [n for n in GRADE_FIRST if n in QUERIES]
    tail = [n for n in QUERIES if n not in GRADE_FIRST]
    return {n: QUERIES[n] for n in head + tail}


def load_all() -> None:
    """Import every query-defining module (idempotent)."""
    from . import (  # noqa: F401
        queries_analytics,
        queries_marts,
        queries_ops,
        queries_pipeline,
        queries_warehouse,
    )
