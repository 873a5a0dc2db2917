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
# r3 rotated onto the then-ungraded tail; r4 graded the 22 post-r3
# additions plus the r4-new and rows-only entries; r5 graded the 39
# post-r4 additions plus insurance re-grades (CORRECTNESS_r05: 46/50
# full oracle match, 4 rows-only by design, zero failures).
#
# Round 6 (this window): the head is the 7 queries added after the r5
# window froze (judge-verified green at sf0.01 in the round-5 VERDICT,
# but a driver row is the contract), followed by every query NEW in
# round 6, followed by insurance re-grades for entries whose plan,
# oracle, or input path was touched this round (head_vocab_drift got a
# localCheckpoint; the spread-read conf parse changed under every
# fact-table read -- re-grade its heaviest dependents). Everything else
# keeps its r2-r5 green row as evidence and follows in definition order.
GRADE_FIRST: list[str] = [
    # -- never driver-graded: added after the r5 window froze (7)
    "parts_copurchase_pagerank",
    "parts_copurchase_triangles",
    "events_bloom_prune_revenue",
    "events_value_cusum_shifts",
    "docs_head_vocab_drift",
    "parts_affinity_pagerank",
    "events_dow_seasonality",
    # -- NEW in round 6 (first the early-round items, then the 12
    # round-6b additions: the substring-dedup family, graph extensions,
    # layout/supervised/audit/drift operators -- every one oracle-equipped
    # and locally green at sf0.001 AND sf0.01 under --vanilla)
    "supply_pagerank_directed",
    "parts_copurchase_pagerank_bucketed",
    "emb_cosine_topk_fast",
    "emb_ivf_topk",
    "parts_copurchase_communities",
    "events_audience_overlap",
    "events_aqe_skew_join",
    "docs_dup_substring_spans",
    "supply_hits_scores",
    "parts_link_prediction",
    "parts_bfs_reach",
    "lineitem_zorder_buckets",
    "events_gini_best_split",
    "docs_incremental_dup_spans",
    "docs_scrubbed_text",
    "dq_referential_audit",
    "parts_copurchase_pagerank_weighted",
    "events_type_dow_independence",
    "docs_substring_novelty",
    "docs_rendezvous_shards",
    # -- insurance re-grades: plan/oracle/input path touched in round 6
    "docs_selection_pipeline",
    "docs_bigram_ppx_scored",
    "mart_sales_trends_all_grains",
    "events_value_bootstrap_ci",
    "orders_lineitem_revenue_bucketed",
    "orders_pareto_deciles",
    "multimodal_decode_roundtrip",
    "events_partition_pruned_read",
    "emb_matryoshka",
    "docs_cm_sketch",
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
