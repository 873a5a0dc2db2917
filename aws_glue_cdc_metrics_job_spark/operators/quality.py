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


def table_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One-pass column profiler: for each requested column, the table row
    count, null count, exact distinct count, and min/max rendered as
    strings -- the "what does this table actually contain" report a
    warehouse job publishes next to its marts (Deequ/dbt-docs profile
    shape; the reference's only profiling is a diagnostic count at
    scripts/cdc_metrics_job.py:569).

    Scale shape: ONE aggregation over ONE scan. Spark compiles the k
    exact count-distincts into a single Expand-based aggregate (the scan
    is read once and expanded k+1 ways before the shuffle); every other
    statistic is a plain codegen'd partial aggregate riding the same
    pass. The per-column output pivot is a stack() over the single
    1-row aggregate -- no second pass, no driver loop. For very wide
    tables profile in column batches so the Expand multiplier (rows x
    k+1) stays bounded; distinct counts dominate the cost, so swap
    F.countDistinct for F.approx_count_distinct when an estimate is
    acceptable at 100 TB.

    min/max are CAST to string after aggregating (the narrow binary
    value, not per-row casts) so heterogeneous column types share one
    tidy schema. Floating-point columns render engine-specifically --
    profile exact types (int/string/date/decimal) when cross-engine
    hash parity matters.

    Returns (COLUMN_NAME, N_ROWS, N_NULL, N_DISTINCT, MIN_VALUE,
    MAX_VALUE) ordered by COLUMN_NAME."""
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("cols must be non-empty")
    # resolve caller column names as literal identifiers (backtick-quoted,
    # backticks doubled) so dotted names address the COLUMN, not a nested
    # field path
    def _id(c: str):
        return F.col("`" + c.replace("`", "``") + "`")

    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for i, c in enumerate(cols):
        aggs += [
            F.count(_id(c)).cast("long").alias(f"__nn_{i}"),
            F.countDistinct(_id(c)).cast("long").alias(f"__nd_{i}"),
            F.min(_id(c)).cast("string").alias(f"__mn_{i}"),
            F.max(_id(c)).cast("string").alias(f"__mx_{i}"),
        ]
    one = df.agg(*aggs)
    # pivot via the Column API (F.stack over lit/col arguments), not an
    # interpolated F.expr string: column names enter as bound literals, so
    # quoting/escaping (quotes, backslashes, dots) cannot corrupt the
    # expression
    stack_args: list = [F.lit(len(cols))]
    for i, c in enumerate(cols):
        stack_args += [
            F.lit(c),
            F.col(f"__nn_{i}"),
            F.col(f"__nd_{i}"),
            F.col(f"__mn_{i}"),
            F.col(f"__mx_{i}"),
        ]
    stacked = one.select(
        F.stack(*stack_args).alias(
            "COLUMN_NAME", "N_NONNULL", "N_DISTINCT", "MIN_VALUE", "MAX_VALUE"
        ),
        F.col("__n").alias("N_ROWS"),
    )
    return stacked.select(
        "COLUMN_NAME",
        "N_ROWS",
        (F.col("N_ROWS") - F.col("N_NONNULL")).cast("long").alias("N_NULL"),
        "N_DISTINCT",
        "MIN_VALUE",
        "MAX_VALUE",
    ).orderBy("COLUMN_NAME")


def k_anonymity_report(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """k-anonymity audit over quasi-identifier columns: every combination
    of ``quasi_cols`` values shared by FEWER than ``k`` rows -- the groups
    whose members a linkage attack can single out, and the privacy
    counterpart to content-level PII scrubbing (text.pii_scrub removes
    identifiers IN the text; this finds rows identifiable BY their
    metadata). Generalize (bucket/truncate) the quasi columns first, then
    iterate until the report is empty or suppress the remainder
    (suppress_below_k).

    One hash aggregation on the quasi columns (map-side combined) + a
    filter -- nothing else moves. Returns (quasi_cols..., GROUP_SIZE)
    ordered by GROUP_SIZE then the quasi columns."""
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if k < 2:
        raise ValueError("k must be >= 2 (k=1 is vacuous)")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).cast("long").alias("GROUP_SIZE"))
        .filter(F.col("GROUP_SIZE") < k)
        .orderBy("GROUP_SIZE", *quasi_cols)
    )


def suppress_below_k(df: DataFrame, quasi_cols: list[str], k: int = 5) -> DataFrame:
    """Enforce k-anonymity by suppression: drop every row whose
    quasi-identifier combination has fewer than ``k`` members. The
    standard release gate after generalization has done what it can.

    Shape: the small violating-group frame (k_anonymity_report) comes
    back as a LEFT ANTI join on the quasi columns -- it is tiny by
    construction (every group < k rows), so AQE broadcasts it and the
    big side never shuffles."""
    bad = k_anonymity_report(df, quasi_cols, k).select(*quasi_cols)
    return df.join(bad, quasi_cols, "left_anti")


# log10(1 + 1/d) in exact ppm; the rounded values sum to exactly 1_000_000,
# so deviations are integer-lattice comparable across engines
BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


def benford_report(df: DataFrame, value_col: Column | str) -> DataFrame:
    """Benford's-law first-digit screen over a positive integer measure --
    the classic fabricated-numbers detector for financial columns (a
    money column should track log10(1+1/d); a flat or spiky digit
    histogram flags synthetic or tampered values). ``value_col`` must be
    integer-valued and positive (scale money to cents first); zero/NULL
    rows are excluded.

    The first digit comes from substring(CAST(v AS STRING), 1, 1) --
    integer-to-string rendering is identical across engines, unlike
    float log10/pow extraction, so the report hashes exactly. One hash
    aggregation on the 9-value digit key; the 1-row total broadcasts.

    Returns (DIGIT, N, OBSERVED_PPM, EXPECTED_PPM, DEV_PPM) for digits
    with at least one observation, ordered by DIGIT; the expected table
    is the exact-ppm Benford lattice (rounded values sum to 1e6)."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    digits = (
        df.filter(v.isNotNull() & (v > 0))
        .select(F.substring(v.cast("string"), 1, 1).cast("int").alias("DIGIT"))
        .groupBy("DIGIT")
        .agg(F.count(F.lit(1)).cast("long").alias("N"))
    )
    total = digits.agg(F.sum("N").alias("__TOT"))
    expected = F.element_at(
        F.create_map(*[F.lit(x) for kv in BENFORD_PPM.items() for x in kv]),
        F.col("DIGIT"),
    )
    return (
        digits.crossJoin(F.broadcast(total))
        .select(
            "DIGIT",
            "N",
            F.expr("(N * 1000000) div __TOT").alias("OBSERVED_PPM"),
            expected.cast("long").alias("EXPECTED_PPM"),
            (F.expr("(N * 1000000) div __TOT") - expected).cast("long").alias("DEV_PPM"),
        )
        .orderBy("DIGIT")
    )


def referential_audit(
    relations: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Bidirectional referential-integrity audit -- the schema-wide
    health report :func:`referential_violations` is the single-relation
    primitive of. For each (name, child, fk, parent, pk) relation, one
    row counting both directions of the relationship: orphan CHILD rows
    (FK matches no parent; NULL FKs count as orphans, SQL join
    semantics) and UNREFERENCED parent rows (no child points at them --
    not a violation, but the fan-in profile capacity planning and
    join-selectivity estimation need).

    Shape per relation: the child collapses to its DISTINCT FK tally
    first (one map-combined groupBy -- child row counts ride that
    aggregate, so the full-outer join against the parent keys is
    key-cardinality-sized on both inputs, never row-sized), then ONE
    full-outer join + ONE global aggregate produce the row. The
    relation list is a bounded plan-construction loop, not driver data.

    Returns (RELATION, N_CHILD, N_DISTINCT_FK, N_ORPHAN_ROWS,
    N_PARENT, N_PARENT_UNREFERENCED) with one row per relation.
    N_DISTINCT_FK counts distinct NON-NULL FK values (COUNT semantics);
    rows with a NULL FK still count in N_CHILD and N_ORPHAN_ROWS."""
    if not relations:
        raise ValueError("relations must be non-empty")
    outs = []
    for name, child, fk, parent, pk in relations:
        ck = child.groupBy(F.col(fk).alias("__k")).agg(
            F.count(F.lit(1)).cast("bigint").alias("__cn")
        )
        pkeys = parent.select(F.col(pk).alias("__p")).dropDuplicates()
        # plain equality (NOT null-safe): a NULL FK matches nothing and
        # therefore counts as orphan, per the docstring contract
        j = ck.join(pkeys, ck["__k"] == pkeys["__p"], "full_outer")
        outs.append(
            j.agg(
                F.lit(name).alias("RELATION"),
                F.coalesce(F.sum("__cn"), F.lit(0)).cast("bigint").alias("N_CHILD"),
                F.count("__k").cast("bigint").alias("N_DISTINCT_FK"),
                F.coalesce(
                    F.sum(F.when(F.col("__p").isNull(), F.col("__cn"))), F.lit(0)
                )
                .cast("bigint")
                .alias("N_ORPHAN_ROWS"),
                F.count("__p").cast("bigint").alias("N_PARENT"),
                # a NULL-FK child group also lands with BOTH sides null
                # (plain equality never matched it) -- require a real
                # parent key so it is not miscounted as unreferenced
                F.sum(
                    F.when(F.col("__k").isNull() & F.col("__p").isNotNull(), 1).otherwise(0)
                )
                .cast("bigint")
                .alias("N_PARENT_UNREFERENCED"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def l_diversity_report(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str, l: int = 5
) -> DataFrame:
    """l-diversity audit: k-anonymity's necessary complement. A group can
    be large (k-anonymous) yet still leak -- if every row in it shares
    the same SENSITIVE value, membership alone reveals it (the
    homogeneity attack). This reports, per quasi-identifier combination,
    the group size and the number of DISTINCT sensitive values, flagging
    groups below ``l`` distinct values.

    One hash aggregation (count + exact countDistinct per group,
    map-side partial) -- distinct counting shuffles (quasi, sensitive)
    pairs, never rows. Returns (quasi_cols..., GROUP_SIZE, L_DISTINCT,
    DIVERSE -- 1 iff L_DISTINCT >= l) ordered by the quasi columns; the
    release gate is "no rows with DIVERSE = 0"."""
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if l < 2:
        raise ValueError("l must be >= 2 (l=1 is vacuous)")
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("GROUP_SIZE"),
            F.countDistinct(sensitive_col).cast("long").alias("L_DISTINCT"),
        )
        .withColumn(
            "DIVERSE", (F.col("L_DISTINCT") >= l).cast("int")
        )
        .orderBy(*quasi_cols)
    )
