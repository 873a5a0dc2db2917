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
# r3 rotated onto the then-ungraded tail; r4-r5 graded the post-window
# additions; r8 graded everything born in the interrupted round-8 build
# (CORRECTNESS_r08: 47/50 full match, 3 rows-only by design, zero
# failures).
#
# Round 9 (this window, an optimization round): the head is every query
# whose OPERATOR PLAN round 9 changed — the full iterative-graph family
# (edge-frame materialization order, width policy, degree-on-rank-side
# hop joins, byte-ceiling broadcast policy), the tokenize-once
# selection-pipeline/bigram/DSIR path, the exemplar-checkpoint minhash
# dedup path, and basket_pairs' NULL-basket filter — then the three
# rows-only-by-design members of the r8 window PAIRED with their exact
# oracle-green twins (VERDICT r8 item 8: the window should show the
# pairing), the two r8 hot-spot queries now under min-of-two, and the
# standing insurance re-grades of the reference gold surface + BASELINE
# anchors. Everything else keeps its r2-r8 green row as evidence.
GRADE_FIRST: list[str] = [
    # -- round-9 plan changes: iterative graph family
    "supply_pagerank_directed",
    "parts_copurchase_pagerank",
    "parts_copurchase_pagerank_bucketed",
    "parts_copurchase_pagerank_weighted",
    "parts_copurchase_pagerank_weighted_bucketed",
    "parts_affinity_pagerank",
    "parts_copurchase_communities",
    "parts_bfs_reach",
    "supply_sssp_3hops",
    "supply_hits_scores",
    "supply_hits_scores_bucketed",
    "supply_katz_centrality",
    "supply_katz_centrality_growing",
    "parts_copurchase_triangles",
    "parts_link_prediction",
    "lineitem_basket_pairs",
    # -- round-9 plan changes: tokenize-once text path
    "docs_selection_pipeline",
    "docs_dsir_weights",
    "docs_bigram_logprob",
    "docs_bigram_ppx_scored",
    # -- r8-window rows-only members paired with their exact twins
    "docs_incremental_near_dedup",
    "docs_incremental_dedup",
    "docs_minhash_lsh_pairs",
    "docs_ngram_jaccard_pairs",
    "mart_customer_clv_segment_approx",
    "mart_customer_clv_segment",
    # -- r8 hot-spot queries (VERDICT r8 items 1-2; now MIN2 in bench)
    "emb_kmeans_update",
    "events_value_bootstrap_ci",
    # -- standing insurance: the reference's gold surface
    "order_revenue",
    "fact_ltv_daily",
    "mart_customer_ltv_snapshot",
    "mart_customer_rfm",
    "mart_customer_churn_profile",
    "mart_sales_trends_daily",
    "mart_sales_trends_weekly",
    "mart_sales_trends_monthly",
    "mart_sales_trends_hourly",
    "mart_loyalty_program_impact",
    "mart_location_performance",
    "mart_discount_effectiveness",
    # -- standing insurance: BASELINE.md anchors + heavy cross-family
    "events_asof_attribution",
    "events_interval_join",
    "customers_semi_urgent",
    "customers_anti_urgent",
    "lineitem_hash_sample",
    "docs_train_split",
    "pricing_summary",
    "cdc_snapshot_diff",
    "cdc_apply_changes",
    "events_sessionize",
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
