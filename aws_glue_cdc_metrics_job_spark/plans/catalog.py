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
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# The driver grades catalog entries in dict order with a bounded budget
# (exactly the first 50 in rounds 1-2). Rounds 1-2 covered one
# oracle-equipped representative of every distinct mechanism; all 50 of
# those rows are green in CORRECTNESS_r02.json. Round 3 rotates the
# grading window (VERDICT r2 item 4): GRADE_FIRST puts
# - the 28 entries the r2 window never reached (every remaining
#   oracle-equipped query plus the 5 rows-only-by-design ops), then
# - the 14 queries NEW in round 3 (scd2/dq/quantize/mix/intra-doc/variant/
#   unigram/bpe/anomalies/incremental-agg/incremental-dedup/segment-dedup/
#   pii), then
# - a re-grade of every query whose implementation or oracle changed this
#   round (encode-ids representation, json-props oracle cast, single-pass
#   CDC diff, winnowing mod-2^31 hash, weighted-sample NULL policy,
#   quantile flag), then
# - the heaviest composite re-confirmation,
# so that r2 ∪ r3 gives every oracle-equipped entry a green row of its
# own. Entries omitted here (all green in r2, code untouched in r3)
# follow in definition order.
GRADE_FIRST: list[str] = [
    # -- never graded before round 3 (r2 positions 50-77)
    "pricing_rollup",
    "orders_status_cube",
    "customers_anti_urgent",
    "set_union",
    "orders_intersect_custkeys",
    "docs_vocab_topk",
    "docs_quality_score",
    "events_value_ntile",
    "users_event_type_profile",
    "docs_stratified_sample",
    "orders_priority_pivot",
    "docs_simhash",
    "emb_rp_lsh_signature",
    "emb_ivf_assign",
    "mart_sales_trends_weekly",
    "mart_sales_trends_monthly",
    "mart_sales_trends_hourly",
    "events_tumbling_hourly",
    "docs_fingerprint",
    "orders_price_percentiles",
    "scan_filter_project",
    "docs_train_split",
    "events_approx_distinct_users",  # rows-only: HLL values engine-specific
    "docs_pack_sequences",  # rows-only: greedy next-fit not SQL-expressible
    "docs_minhash_lsh_pairs",  # rows-only: probabilistic, pinned in unit tests
    "emb_ivf_topk",  # rows-only: recall-bounded approximate
    "multimodal_features",  # rows-only: stubbed decode features
    "emb_cosine_topk_fast",  # rows-only: == exact pinned in unit tests
    # -- new in round 3: first grading
    "orders_incremental_agg",
    "docs_segment_dedup",
    "docs_pii_scrub",
    "scd2_user_dim",
    "scd2_active_at",
    "dq_orders_report",
    "emb_int8_quantize",
    "docs_token_budget_mix",
    "docs_intra_doc_dedup",
    "events_variant_props",
    "docs_unigram_logprob",
    "docs_bpe_pair_counts",
    "events_daily_anomalies",
    "docs_incremental_dedup",
    # -- changed in round 3: re-grade
    "docs_encode_ids",
    "events_json_props",
    "cdc_snapshot_diff",
    "cdc_apply_changes",
    "docs_winnow_fingerprints",
    "docs_weighted_sample",
    "mart_customer_clv_segment",
    # -- heavy composite re-confirmations (the dropped r2-green unchanged
    # entries -- order_revenue, fact_ltv_daily, pricing_summary,
    # docs_exact_dedup, and the sales-trends/loyalty/rfm/churn/location/
    # discount marts -- made room for the round-3 queries and keep their
    # r2 rows as evidence)
    "docs_curation_pipeline",
]


def ordered_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Catalog in grading-priority order: GRADE_FIRST (see comment above),
    then everything else in definition order."""
    head = [n for n in GRADE_FIRST if n in QUERIES]
    tail = [n for n in QUERIES if n not in GRADE_FIRST]
    return {n: QUERIES[n] for n in head + tail}


def load_all() -> None:
    """Import every query-defining module (idempotent)."""
    from . import queries_analytics, queries_marts, queries_ops, queries_pipeline  # noqa: F401
