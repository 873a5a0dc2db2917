"""Temporal joins the reference lacks but a time-series/CDC engine needs:
backward as-of join (latest right row at-or-before each left row's time).

The naive formulation -- join on key + range predicate, then argmax per
left row -- explodes to |left| x |right-per-key| intermediate rows before
the argmax prunes them. At 100 TB that intermediate is the bottleneck, so
this implementation never builds it: both sides are unioned, shuffled ONCE
on the join key, and a running ``last(..., ignorenulls=True)`` window
carries each right row forward to the left rows that follow it in time.
Cost is one shuffle + one sort per key partition -- the same class as the
piecewise merge join a native engine would use for as-of.

No UDFs; everything stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance_seconds: float | None = None,
    matched_prefix: str = "matched_",
) -> DataFrame:
    """Backward (left) as-of join.

    For every ``left`` row, attach the single ``right`` row with the same
    ``on`` keys and the greatest ``right_ts`` <= ``left_ts``; NULLs when no
    such row exists (left-outer semantics). ``right_cols`` are the payload
    columns carried over, emitted as ``{matched_prefix}{col}`` alongside
    ``{matched_prefix}{right_ts}``. With ``tolerance_seconds`` set, matches
    older than the tolerance are nulled out (pandas ``merge_asof``
    tolerance semantics).

    The carried payload is wrapped in a single STRUCT before the window
    fill: ``last(ignorenulls=True)`` must skip *absent* right rows yet
    preserve right rows whose payload value is itself NULL, and the
    non-null struct wrapper is what makes that distinction.

    Ties: a right row at exactly ``left_ts`` matches (<=). Equal-timestamp
    right rows within one key are broken deterministically: the greatest
    payload under struct ordering (``right_ts``, then ``right_cols`` in
    order) wins.
    """
    payload = [F.col(right_ts).alias(f"{matched_prefix}{right_ts}")] + [
        F.col(c).alias(f"{matched_prefix}{c}") for c in right_cols
    ]
    r = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*payload).alias("__r"),
    )
    struct_type = r.schema["__r"].dataType
    l = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(struct_type).alias("__r"),
    )
    # Right rows sort before left rows at the same timestamp (__side 0 < 1)
    # so an exact-timestamp right row is visible to that left row; __r as a
    # final key makes equal-timestamp right duplicates deterministic.
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side", "__r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        l.unionByName(r, allowMissingColumns=True)
        .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if tolerance_seconds is not None:
        in_tol = (
            F.col(left_ts).cast("double") - F.col(f"__m.{matched_prefix}{right_ts}").cast("double")
        ) <= F.lit(tolerance_seconds)
        filled = filled.withColumn("__m", F.when(in_tol, F.col("__m")))
    return (
        filled.select("*", "__m.*")
        .drop("__ts", "__side", "__r", "__m")
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower_seconds: float,
    upper_seconds: float,
) -> DataFrame:
    """Keyed interval (range) join: all (left, right) pairs sharing ``on``
    keys with ``right_ts`` in ``[left_ts + lower, left_ts + upper]``.

    A bare key + BETWEEN join makes Catalyst build every same-key pair and
    post-filter -- quadratic in rows-per-key. Here both sides are bucketed
    on time (bucket width = the interval span), the left side explodes to
    the <=2 buckets its window overlaps, the join is a plain equi-join on
    (keys, bucket), and the exact BETWEEN runs as a residual filter on the
    already-banded candidates. Candidate count scales with rows per
    (key, bucket), not rows per key; each true pair appears exactly once
    because a right row lives in exactly one bucket.
    """
    if upper_seconds <= lower_seconds:
        raise ValueError("upper_seconds must exceed lower_seconds")
    if left_ts == right_ts:
        raise ValueError("rename one side: left_ts and right_ts must differ for the residual filter")
    width = upper_seconds - lower_seconds
    l_epoch = F.col(left_ts).cast("double")
    r_epoch = F.col(right_ts).cast("double")
    l = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor((l_epoch + lower_seconds) / width),
                F.floor((l_epoch + upper_seconds) / width),
            )
        ),
    )
    r = right.withColumn("__bucket", F.floor(r_epoch / width))
    return (
        l.join(r, on + ["__bucket"])
        .filter(
            r_epoch.between(l_epoch + lower_seconds, l_epoch + upper_seconds)
        )
        .drop("__bucket")
    )


def funnel_counts(
    events: DataFrame,
    stages: list[str],
    within_seconds: int | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel conversion counts: how many users performed
    ``stages[0]``, then ``stages[1]`` strictly after it, then ... -- each
    step optionally within ``within_seconds`` of the PREVIOUS step's event.
    The standard product-analytics funnel, built stage-wise:

    stage 1 = per-user MIN ts of the first event type; stage i+1 = per-user
    MIN ts of the next type strictly after (and within the window of) the
    user's stage-i time. Each step is one filtered aggregation plus one
    equi-join on the user key -- every shuffle shares the same key, so AQE
    reuses the partitioning, and the per-stage frames shrink monotonically
    (reached-stage-i users only). No sequence materialization, no HOF scan
    over per-user event arrays.

    Returns (STAGE 1-based bigint, EVENT_TYPE, N_USERS) one row per stage.
    """
    if not stages:
        raise ValueError("stages must be non-empty")
    reached = (
        events.filter(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("__t"))
    )
    per_stage = [reached]
    for st in stages[1:]:
        prev = per_stage[-1].select(F.col(user_col), F.col("__t").alias("__pt"))
        cond = F.col(ts_col) > F.col("__pt")
        if within_seconds is not None:
            cond = cond & (
                F.col(ts_col).cast("double") <= F.col("__pt").cast("double") + within_seconds
            )
        nxt = (
            events.filter(F.col(type_col) == st)
            .join(prev, user_col)
            .filter(cond)
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("__t"))
        )
        per_stage.append(nxt)
    counts = None
    for i, (st, frame) in enumerate(zip(stages, per_stage), 1):
        c = frame.agg(F.count("*").cast("long").alias("N_USERS")).select(
            F.lit(i).cast("long").alias("STAGE"),
            F.lit(st).alias("EVENT_TYPE"),
            F.col("N_USERS"),
        )
        counts = c if counts is None else counts.unionByName(c)
    return counts


def retention_cohorts(
    events: DataFrame,
    anchor_type: str = "signup",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Weekly cohort retention matrix: users are cohorted by the week of
    their first ``anchor_type`` event; for each later week in which they
    have ANY event, they count as retained at that week offset.

    Two aggregations on the user key (anchor week, then distinct
    user-week activity) and one equi-join -- same single-key shuffle
    chain as the funnel; the output is cohort-week x offset, bounded by
    (#weeks)^2 regardless of corpus size.

    Returns (COHORT_WEEK date, WEEK_OFFSET bigint, N_USERS bigint),
    offset 0 = the cohort's anchor week itself."""
    anchors = (
        events.filter(F.col(type_col) == anchor_type)
        .groupBy(user_col)
        .agg(F.date_trunc("week", F.min(ts_col)).cast("date").alias("COHORT_WEEK"))
    )
    activity = (
        events.select(
            F.col(user_col), F.date_trunc("week", F.col(ts_col)).cast("date").alias("__w")
        )
        .distinct()
    )
    return (
        activity.join(anchors, user_col)
        .filter(F.col("__w") >= F.col("COHORT_WEEK"))
        .withColumn("WEEK_OFFSET", F.floor(F.datediff("__w", "COHORT_WEEK") / 7).cast("long"))
        .groupBy("COHORT_WEEK", "WEEK_OFFSET")
        .agg(F.countDistinct(user_col).cast("long").alias("N_USERS"))
    )


def gap_fill_daily(
    df: DataFrame,
    key_cols: list[str],
    date_col: str,
    fill: dict[str, float | int] | None = None,
) -> DataFrame:
    """Dense daily spine per key: one output row for EVERY day between each
    key's first and last observed date, with missing days taking the
    ``fill`` values (column -> constant; unlisted metric columns fill as
    NULL). The gap-fill step every rate/trend computation needs before
    window math -- a LAG over sparse dates silently compares across gaps
    (the mart_sales_trends family aggregates observed days only; this
    densifies them).

    Shape: the spine is built from the per-key (min, max) aggregate --
    ``sequence()`` + one explode, rows proportional to the OUTPUT, not to
    keys x global range (a sparse short-lived key contributes only its own
    span). The fact join is a key+date equi-join AQE plans like any other;
    no window, no cross join."""
    fill = fill or {}
    metric_cols = [c for c in df.columns if c not in key_cols and c != date_col]
    spine = (
        df.groupBy(*key_cols)
        .agg(F.min(date_col).alias("__lo"), F.max(date_col).alias("__hi"))
        .select(
            *key_cols,
            F.explode(
                F.sequence(F.col("__lo"), F.col("__hi"), F.expr("INTERVAL 1 DAY"))
            ).alias(date_col),
        )
    )
    out = spine.join(df, [*key_cols, date_col], "left")
    for c in metric_cols:
        if c in fill:
            out = out.withColumn(c, F.coalesce(F.col(c), F.lit(fill[c])))
    return out


def interpolate_daily(
    df: DataFrame,
    key_cols: list[str],
    date_col: str,
    value_col: str,
    out_col: str = "VALUE_CENTI",
) -> DataFrame:
    """Linear interpolation across daily gaps, on an exact integer lattice.

    Densifies each key's series (gap_fill_daily spine) and fills missing
    days by interpolating between the surrounding observations:
    ``v = (prev*(gap-steps) + next*steps) div gap`` in centi-units, all
    integer arithmetic -- truncating integer division behaves identically
    across engines (Spark ``div`` == DuckDB ``//``), so interpolated
    values hash-match an independent SQL replay exactly. ``value_col``
    must be an exact type (decimal/int); scaling by 100 into BIGINT
    centi-units is lossless for DECIMAL(p,2).

    Shape: the spine join (see gap_fill_daily), then ONE shuffle on the
    keys feeding two frames over the same partition+order (running last
    backward, running first forward) -- Catalyst plans them in one
    exchange+sort. The carried (date, value) pair rides a struct so an
    observation is skipped or kept atomically. Spine endpoints are always
    observed (the spine spans min..max per key), so gap rows always have
    both neighbors -- no extrapolation is ever produced.

    Returns (keys..., date, IS_OBSERVED, out_col bigint)."""
    dense = gap_fill_daily(df.select(*key_cols, date_col, value_col), key_cols, date_col)
    w_back = (
        Window.partitionBy(*key_cols)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(*key_cols)
        .orderBy(date_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    observed = F.col(value_col).isNotNull()
    obs = F.when(
        observed,
        F.struct(
            F.col(date_col).alias("d"),
            (F.col(value_col) * 100).cast("long").alias("v"),
        ),
    )
    staged = (
        dense.withColumn("__prev", F.last(obs, ignorenulls=True).over(w_back))
        .withColumn("__next", F.first(obs, ignorenulls=True).over(w_fwd))
        .withColumn(
            "__steps", F.datediff(F.col(date_col), F.col("__prev.d")).cast("long")
        )
        .withColumn(
            "__gap", F.datediff(F.col("__next.d"), F.col("__prev.d")).cast("long")
        )
    )
    interp = F.expr("(__prev.v * (__gap - __steps) + __next.v * __steps) div __gap")
    return staged.select(
        *key_cols,
        date_col,
        observed.alias("IS_OBSERVED"),
        F.when(observed, F.col("__prev.v")).otherwise(interp).cast("long").alias(out_col),
    )


def session_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Within-session event-type transition counts -- the Markov-path
    summary product analytics builds funnels and next-action models from:
    for every consecutive in-session pair, one (FROM_TYPE, TO_TYPE) edge;
    session entry points appear as FROM_TYPE = NULL ('start of journey').

    One user-keyed window computes the previous event's type and gap in a
    single pass (the sessionize shuffle reused, no join); the edge count
    aggregation is map-side combinable with at most |types|^2 + |types|
    result rows. Deterministic total order (ts, id) -- simultaneous
    events tie-break identically in every engine.

    Returns (FROM_TYPE, TO_TYPE, N_TRANSITIONS)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap_us = gap_minutes * 60 * 1_000_000
    prev_ts = F.lag(F.col(ts_col)).over(w)
    same_session = (
        prev_ts.isNotNull()
        & (
            F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)
            <= F.lit(gap_us)
        )
    )
    edges = df.select(
        F.when(same_session, F.lag(F.col(type_col)).over(w)).alias("FROM_TYPE"),
        F.col(type_col).alias("TO_TYPE"),
    )
    return edges.groupBy("FROM_TYPE", "TO_TYPE").agg(
        F.count(F.lit(1)).alias("N_TRANSITIONS")
    )


def u_shape_attribution(
    events: DataFrame,
    touch_types: list[str],
    conversion_type: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution: each
    conversion's value is split across the touch events in its journey --
    40% to the first touch, 40% to the last, 20% spread over the middle
    -- and rolled up by touch channel. The journey for conversion k is
    every touch by the same user after conversion k-1 and at-or-before
    conversion k; conversions with no touches credit a literal 'direct'
    channel. The standard marketing-attribution shape, made exact.

    Exactly-once credit on the cents lattice: weights are ppm integers
    (n=1 -> 1e6; n=2 -> 500k/500k; n>=3 -> 400k / 200k div (n-2) each
    middle / 400k), per-touch credit is cents * w div 1e6 floored for
    every NON-final touch, and the final touch takes the exact
    complement (cents minus the others) -- so per-journey credit sums to
    the conversion's cents EXACTLY, no rounding leak, any engine.

    Scale shape: ONE hash exchange on user_col serves every window
    (journey numbering partitions by user; position numbering by
    (user, journey) -- a subset-key window the user partitioning already
    satisfies, so Catalyst inserts a sort, not a second exchange);
    (user_col, ts_col) must be unique within the filtered types (holds
    for the events fixture; asof_join documents the same contract). The
    rollup is a map-combined groupBy on channel. NULL conversion values
    are treated as 0 cents.

    Returns one row per channel: (CHANNEL, N_TOUCHES -- credited touch
    rows (0 for 'direct'), N_CONVERSIONS -- journeys the channel closed
    credit from, CREDIT_CENTS), ordered by CHANNEL."""
    ev = events.where(
        F.col(type_col).isin(*touch_types, conversion_type)
    ).select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__ts"),
        F.col(type_col).alias("__ty"),
        F.col(value_col).alias("__val"),
    )
    w_before = (
        Window.partitionBy("__u")
        .orderBy("__ts")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_conv = (F.col("__ty") == conversion_type).cast("int")
    numbered = ev.withColumn(
        "__j", F.coalesce(F.sum(is_conv).over(w_before), F.lit(0)).cast("bigint")
    )
    convs = numbered.where(F.col("__ty") == conversion_type).select(
        "__u",
        "__j",
        F.floor(F.coalesce(F.col("__val"), F.lit(0.0)) * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("__cents"),
    )
    touches = numbered.where(F.col("__ty") != conversion_type).select(
        "__u", "__j", "__ts", "__ty"
    )
    w_j = Window.partitionBy("__u", "__j").orderBy("__ts")
    w_jall = Window.partitionBy("__u", "__j")
    pos = touches.withColumn("__pos", F.row_number().over(w_j)).withColumn(
        "__n", F.count(F.lit(1)).over(w_jall)
    )
    credited = pos.join(convs, ["__u", "__j"], "inner")
    w_ppm = (
        F.when(F.col("__n") == 1, F.lit(1000000))
        .when(F.col("__n") == 2, F.lit(500000))
        .when(F.col("__pos") == 1, F.lit(400000))
        .otherwise(F.expr("200000 div (__n - 2)"))
    )
    with_floor = credited.withColumn("__w", w_ppm.cast("bigint")).withColumn(
        "__floor", F.expr("(__cents * __w) div 1000000")
    )
    others = F.coalesce(
        F.sum(F.when(F.col("__pos") < F.col("__n"), F.col("__floor"))).over(w_jall),
        F.lit(0),
    )
    final = with_floor.withColumn(
        "__credit",
        F.when(F.col("__pos") < F.col("__n"), F.col("__floor")).otherwise(
            F.col("__cents") - others
        ),
    )
    by_channel = final.groupBy(F.col("__ty").alias("CHANNEL")).agg(
        F.count(F.lit(1)).cast("bigint").alias("N_TOUCHES"),
        F.countDistinct("__u", "__j").cast("bigint").alias("N_CONVERSIONS"),
        F.sum("__credit").cast("bigint").alias("CREDIT_CENTS"),
    )
    direct = (
        convs.join(touches.select("__u", "__j").distinct(), ["__u", "__j"], "left_anti")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("__nc"),
            F.coalesce(F.sum("__cents"), F.lit(0)).cast("bigint").alias("__cc"),
        )
        .select(
            F.lit("direct").alias("CHANNEL"),
            F.lit(0).cast("bigint").alias("N_TOUCHES"),
            F.col("__nc").alias("N_CONVERSIONS"),
            F.col("__cc").alias("CREDIT_CENTS"),
        )
    )
    return by_channel.unionByName(direct).orderBy("CHANNEL")
