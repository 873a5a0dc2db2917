"""Data-quality constraint checking over large tables.

The reference's only runtime validation is empty-input short-circuits and a
diagnostic count (scripts/cdc_metrics_job.py:134,569); a pipeline feeding
model training needs declared expectations with measured violation counts
(dbt tests / Deequ-style). Three constraint families, each with the
cheapest distributed shape available:

- Row-level predicates (not-null, range, accepted-values, custom exprs):
  ALL rules evaluate in ONE scan as conditional-sum aggregates -- adding a
  rule adds a codegen expression, not a pass over the data.
- Key uniqueness: one hash aggregation on the key; violations counted as
  excess rows (total - distinct keys), so the number reported is "rows you
  would drop to make the key unique".
- Referential integrity: one left-anti join child->parent counting orphan
  rows; broadcast when the parent key set is small, shuffle otherwise
  (Catalyst/AQE decides -- the join carries only the key columns either
  way, because both sides are pruned to the keys before joining).

Output contract (all helpers): (RULE string, VIOLATIONS long) -- a tidy
frame a monitor can threshold or a test can assert against.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tidy(rule: str, violations: Column) -> list[Column]:
    return [F.lit(rule).alias("RULE"), violations.cast("long").alias("VIOLATIONS")]


def row_rule_violations(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Count violations of row-level predicates. ``rules`` maps rule name ->
    a Column that is TRUE when the row VIOLATES the rule (NULL counts as a
    violation only if the predicate evaluates to TRUE on NULL input -- write
    ``col.isNull() | bad`` to be explicit). Single aggregation over one scan
    regardless of rule count; output one row per rule in insertion order."""
    if not rules:
        raise ValueError("rules must be non-empty")
    aggs = [
        F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(name)
        for name, pred in rules.items()
    ]
    wide = df.agg(*aggs)
    # unpivot the single wide row into the tidy (RULE, VIOLATIONS) contract
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(n).alias("RULE"), F.col(n).alias("VIOLATIONS"))
                    for n in rules
                ]
            )
        ).alias("r")
    )
    return stacked.select("r.RULE", F.col("r.VIOLATIONS").cast("long").alias("VIOLATIONS"))


def unique_key_violations(df: DataFrame, keys: list[str], rule: str | None = None) -> DataFrame:
    """Excess-row count for a candidate key: total rows minus distinct key
    tuples (0 = key is unique). NULL-keyed rows group together, matching
    SQL GROUP BY (a repeated all-NULL key therefore counts as duplication:
    such rows are indistinguishable to a keyed consumer)."""
    name = rule or f"unique({','.join(keys)})"
    counted = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
    excess = counted.agg(F.coalesce(F.sum(F.col("__n") - 1), F.lit(0)).alias("v"))
    return excess.select(*_tidy(name, F.col("v")))


def referential_violations(
    child: DataFrame,
    parent: DataFrame,
    fk: list[str],
    pk: list[str] | None = None,
    rule: str | None = None,
) -> DataFrame:
    """Orphan-row count: child rows whose FK tuple matches no parent PK.
    NULL FKs never match (SQL join semantics) and so count as orphans --
    use a row rule to permit nullable FKs if that is intended."""
    pk = pk or fk
    name = rule or f"fk({','.join(fk)})"
    parent_keys = parent.select(*[F.col(p).alias(f) for p, f in zip(pk, fk)]).dropDuplicates()
    orphans = child.select(*fk).join(parent_keys, fk, "left_anti")
    return orphans.agg(F.count(F.lit(1)).alias("v")).select(*_tidy(name, F.col("v")))


def quality_report(reports: list[DataFrame]) -> DataFrame:
    """Union tidy (RULE, VIOLATIONS) frames into one report. Each input is
    an independent aggregate producing O(1) rows, so the union is free."""
    if not reports:
        raise ValueError("reports must be non-empty")
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
