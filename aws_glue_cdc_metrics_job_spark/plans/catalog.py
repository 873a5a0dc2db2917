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
# additions, the r4-new 16, and the 9 rows-only entries — leaving exactly
# the 39 entries added after the r4 window froze without any driver row.
# Round 5 rotates onto all of them (VERDICT r4 item 2):
# - the 14 warehouse-suite completions (TPC-H shapes Q8/Q9/Q11/Q13/Q14/
#   Q15/Q16/Q17/Q19/Q21/Q22 et al.),
# - the ranking / interpolation / profile / Benford / salted-join /
#   k-anonymity / frame-sample ops,
# - the DSIR / bigram-LM / CCNet-selection / BPE-encode / RRF family,
# - SQ8, Matryoshka, the perceptron pair, epoch planning/materialize,
#   the minhash mechanism twin, and the bootstrap fast path,
# plus events_type_skew_report — r4's ONE red row, root-caused to an
# oracle-side uncast HUGEINT `//` (queries_ops.py:1134) rendered as
# float64 through the driver's pandas fetch path; the CAST landed this
# round together with a dual-fetch-path divergence check in
# tools/oracle_check.py — and the final 10 slots mix the queries NEW in
# round 5 (the bucketed/shuffled recipe twins, the PNG decode
# round-trip) with insurance re-grades for entries whose plan, oracle,
# or input path was touched this round (all-grains variantization, the
# count-min A/B subjects, bootstrap + the spread-read change's heaviest
# dependents). Everything else keeps its r2/r3/r4 green row as evidence
# and follows in definition order.
#
# ROUND-6 ROTATION NOTE: queries added after the r5 window froze and
# therefore still lacking any driver row — rotate these into the r6
# GRADE_FIRST head: parts_copurchase_pagerank, parts_copurchase_triangles,
# events_bloom_prune_revenue, events_value_cusum_shifts,
# docs_head_vocab_drift, parts_affinity_pagerank,
# events_dow_seasonality (all seven
# oracle-checked green locally at sf0.001/sf0.01 and on freshly generated
# CI data this round).
GRADE_FIRST: list[str] = [
    # -- never driver-graded: added after the r4 window froze (39)
    "nation_part_profit",
    "parts_small_qty_revenue",
    "orders_bulk_quantity",
    "orders_late_ship_priority",
    "forecast_revenue_change",
    "nation_market_share",
    "part_value_concentration",
    "returns_priority_profile",
    "customer_order_distribution",
    "promo_revenue_share",
    "top_supplier_revenue",
    "parts_supplier_diversity",
    "disjunctive_basket_revenue",
    "dominant_part_suppliers",
    "sole_return_suppliers",
    "idle_rich_customers",
    "cheapest_supplier_per_part",
    "events_value_rank_percentiles",
    "events_value_interpolated",
    "orders_benford_screen",
    "orders_table_profile",
    "events_salted_type_join",
    "docs_k_anonymity",
    "multimodal_frame_sample",
    "docs_dsir_weights",
    "docs_dsir_weights_fast",
    "docs_bigram_logprob",
    "docs_bigram_ppx_scored",
    "docs_hybrid_rrf",
    "docs_bpe_encode",
    "docs_selection_pipeline",
    "emb_matryoshka",
    "emb_perceptron_step",
    "emb_perceptron_train",
    "emb_sq8_topk",
    "docs_minhash_jaccard_est",
    "docs_epoch_plan",
    "docs_epoch_materialize",
    "events_value_bootstrap_ci_fast",
    # -- r4's one red row: oracle CAST fix landed this round (1)
    "events_type_skew_report",
    # -- insurance re-grades: plan or oracle touched in round 5 (10)
    "mart_sales_trends_all_grains",
    "docs_cm_sketch",
    "docs_cm_estimates",
    "events_value_bootstrap_ci",
    "orders_lineitem_revenue_bucketed",
    "orders_lineitem_revenue_shuffled",
    "orders_pareto_deciles",
    "multimodal_decode_roundtrip",
    "events_partition_pruned_read",
    "orders_consistent_sample_revenue",
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
