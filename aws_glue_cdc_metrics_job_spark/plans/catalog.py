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
# oracle-equipped representative of every distinct mechanism; 48 of those
# 50 rows are green in CORRECTNESS_r02.json (the 2 red rows were grading
# -harness representation issues, both fixed this round). Round 3 rotates
# the grading window (VERDICT r2 item 4) so that r2 ∪ r3 gives EVERY
# oracle-equipped catalog entry a green row of its own: GRADE_FIRST is
# exactly
# - the 46 oracle-equipped entries with no CORRECTNESS_r02 row (the r2
#   deferred tail plus everything added in round 3), then
# - a re-grade of the 2 red r2 rows (encode-ids now grades a string-joined
#   hashable representation; json-props oracle SUM cast to BIGINT), then
# - a re-grade of the 2 queries whose VALUES changed in round 3
#   (cdc_apply_changes: single-pass full-outer diff, the r2 superlinear
#   item; docs_winnow_fingerprints: mod-2^31 gram hash for non-ASCII
#   safety changes the fingerprint values in BOTH engines).
# The 46 r2-green entries whose semantics did not change keep their r2
# rows as evidence and follow in definition order; rows-only-by-design
# ops (minhash pairs, packing, HLL/DDSketch zones, IVF top-k, fast
# cosine, stubbed multimodal features, incremental near-dedup) are pinned
# by exactness/invariant unit tests instead (see COVERAGE.md).
GRADE_FIRST: list[str] = [
    # -- relational / analytics tail, never graded before round 3
    "scan_filter_project",
    "set_union",
    "orders_intersect_custkeys",
    "customers_anti_urgent",
    "pricing_rollup",
    "orders_status_cube",
    "orders_priority_pivot",
    "orders_price_percentiles",
    "events_value_ntile",
    "events_value_winsorized",
    "events_value_bootstrap_ci",
    "users_event_type_profile",
    "events_variant_props",
    "events_type_skew_report",
    "events_daily_anomalies",
    # -- marts / temporal tail
    "mart_sales_trends_weekly",
    "mart_sales_trends_monthly",
    "mart_sales_trends_hourly",
    "events_tumbling_hourly",
    "events_daily_gapfill",
    "events_hopping_6h",
    # -- CDC / warehouse-ops, new in round 3
    "orders_incremental_agg",
    "scd2_user_dim",
    "scd2_active_at",
    "dq_orders_report",
    # -- documents / text tail
    "docs_fingerprint",
    "docs_quality_score",
    "docs_simhash",
    "docs_fuzzy_key_pairs",
    "docs_vocab_topk",
    "docs_heavy_hitters",
    "docs_unigram_logprob",
    "docs_bpe_pair_counts",
    "docs_segment_dedup",
    "docs_intra_doc_dedup",
    "docs_incremental_dedup",
    "docs_pii_scrub",
    # -- sampling / mixing tail
    "docs_train_split",
    "docs_stratified_sample",
    "docs_per_source_sample",
    "docs_temperature_mix",
    "docs_token_budget_mix",
    # -- embeddings tail
    "emb_rp_lsh_signature",
    "emb_ivf_assign",
    "emb_semantic_dedup",
    "emb_int8_quantize",
    # -- red in r2: representation fixed, re-grade
    "docs_encode_ids",
    "events_json_props",
    # -- values changed in round 3: re-grade
    "cdc_apply_changes",
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
    from . import queries_analytics, queries_marts, queries_ops, queries_pipeline  # noqa: F401
