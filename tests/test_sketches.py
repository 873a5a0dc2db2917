"""HLL distinct-count sketch rollups (operators/sketches.py)."""

import pytest
from pyspark.sql import functions as F

from aws_glue_cdc_metrics_job_spark.operators.sketches import (
    distinct_sketch,
    estimate,
    rollup_sketches,
)
from aws_glue_cdc_metrics_job_spark.sources import read_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return read_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    ).withColumn("week", F.date_trunc("week", "ts").cast("date"))


def test_estimate_within_error_bound(events):
    daily = estimate(distinct_sketch(events, ["day"], "user_id"))
    exact = events.groupBy("day").agg(F.countDistinct("user_id").alias("EXACT"))
    joined = daily.join(exact, "day").collect()
    assert joined
    for r in joined:
        # lg_k=12 -> rse ~1.6%; allow 5% (150 users/day at sf0.001 is tiny)
        assert abs(r["APPROX_DISTINCT"] - r["EXACT"]) <= max(3, 0.05 * r["EXACT"])


def test_union_rollup_equals_direct_sketch(events):
    """Union of daily sketches == sketching the raw week directly: rollups
    answered from the stored sketch zone agree with a from-raw rebuild."""
    daily = distinct_sketch(events, ["week", "day"], "user_id")
    weekly_from_daily = rollup_sketches(daily, ["week"])
    weekly_direct = estimate(distinct_sketch(events, ["week"], "user_id"))
    a = {r["week"]: r["APPROX_DISTINCT"] for r in weekly_from_daily.collect()}
    b = {r["week"]: r["APPROX_DISTINCT"] for r in weekly_direct.collect()}
    assert a == b


def test_no_distinct_expand_in_plan(events):
    """The sketch aggregation must be partial+final (map-side collapse),
    never the exact-distinct Expand shape."""
    plan = (
        distinct_sketch(events, ["day"], "user_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" not in plan, plan
    assert "partial_hll_sketch_agg" in plan, plan


def test_compact_parquet_dir(spark, tmp_path):
    import glob

    from aws_glue_cdc_metrics_job_spark.sources.parquet_io import compact_parquet_dir

    path = str(tmp_path / "zone")
    # simulate many micro-batch appends -> many small files
    for i in range(5):
        spark.range(i * 100, (i + 1) * 100).repartition(4).write.mode("append").parquet(path)
    before = len(glob.glob(path + "/part-*.parquet"))
    assert before >= 20
    n = compact_parquet_dir(spark, path, target_file_bytes=1 << 30)
    after = glob.glob(path + "/part-*.parquet")
    assert len(after) == n == 1
    got = sorted(r["id"] for r in spark.read.parquet(path).collect())
    assert got == list(range(500))


# --- mergeable quantile sketches (DDSketch-style log bins)


def test_quantile_sketch_merge_equals_direct(spark):
    from aws_glue_cdc_metrics_job_spark.operators.sketches import (
        merge_quantile_sketches,
        quantile_sketch,
    )

    rows = [(d, float(v)) for d in range(14) for v in range(1, 50 + d)]
    df = spark.createDataFrame(rows, "day int, value double").withColumn(
        "week", (F.col("day") / 7).cast("int")
    )
    daily = quantile_sketch(df, ["week", "day"], "value", alpha=0.01)
    rolled = merge_quantile_sketches(daily.drop("day"), ["week"])
    direct = quantile_sketch(df, ["week"], "value", alpha=0.01)
    canon = lambda sk: sorted(
        (r["week"], r["SIGN"], r["SIGNED_BIN"], r["N"]) for r in sk.collect()
    )
    # merged-from-daily == sketched-from-raw EXACTLY (integer bin counts)
    assert canon(rolled) == canon(direct)


def test_quantile_sketch_relative_error_bound(spark):
    import numpy as np

    from aws_glue_cdc_metrics_job_spark.operators.sketches import (
        quantile_estimates,
        quantile_sketch,
    )

    rng = np.random.default_rng(3)
    vals = np.concatenate(
        [rng.lognormal(3, 2, 4000), -rng.lognormal(1, 1.5, 1000), np.zeros(50)]
    )
    df = spark.createDataFrame([(float(v),) for v in vals], "value double").withColumn(
        "g", F.lit(1)
    )
    alpha = 0.02
    qs = [0.01, 0.1, 0.5, 0.9, 0.99]
    sk = quantile_sketch(df, ["g"], "value", alpha=alpha)
    est = {r["Q"]: r["VALUE_EST"] for r in quantile_estimates(sk, ["g"], qs, alpha=alpha).collect()}
    srt = np.sort(vals)
    for q in qs:
        true = srt[int(np.floor(q * (len(srt) - 1)))]
        got = est[q]
        if true == 0:
            assert got == 0
        else:
            assert abs(got - true) <= alpha * abs(true) + 1e-12, (q, got, true)


def test_quantile_sketch_bin_cardinality_bounded(spark):
    from aws_glue_cdc_metrics_job_spark.operators.sketches import quantile_sketch

    df = spark.range(1, 100001).select((F.col("id") / 10.0).alias("value"), F.lit(1).alias("g"))
    sk = quantile_sketch(df, ["g"], "value", alpha=0.01)
    # 100k distinct values spanning [0.1, 1e4] collapse to O(log(range)/alpha) bins
    assert sk.count() < 600


class TestCountMin:
    def _toks(self, spark):
        from aws_glue_cdc_metrics_job_spark.operators import text
        from aws_glue_cdc_metrics_job_spark.sources import read_table
        from pyspark.sql import functions as F

        docs = read_table(spark, "/root/testdata/sf0.001", "documents")
        return docs.select(F.explode(text.tokens("text")).alias("TOKEN"))

    def test_overestimate_and_bound(self, spark):
        import math

        from aws_glue_cdc_metrics_job_spark.operators.sketches import (
            CM_D, CM_W, cm_estimate, cm_sketch,
        )
        from pyspark.sql import functions as F

        toks = self._toks(spark)
        sk = cm_sketch(toks, "TOKEN")
        exact = {r["TOKEN"]: r["n"] for r in toks.groupBy("TOKEN").agg(F.count("*").alias("n")).collect()}
        total = sum(exact.values())
        items = spark.createDataFrame([(t,) for t in exact], "TOKEN string")
        est = {r["TOKEN"]: r["EST_COUNT"] for r in cm_estimate(sk, items, "TOKEN").collect()}
        assert all(est[t] >= exact[t] for t in exact)  # never underestimates
        eps = math.e / CM_W
        over = [est[t] - exact[t] for t in exact]
        # the eps*N bound holds per-item w.h.p.; assert no gross violation
        assert max(over) <= 3 * eps * total
        # unseen item estimates (almost surely) near zero, never negative
        ghost = spark.createDataFrame([("zz-unseen-token",)], "TOKEN string")
        g = cm_estimate(sk, ghost, "TOKEN").collect()[0]["EST_COUNT"]
        assert 0 <= g <= 3 * eps * total

    def test_merge_equals_direct_exactly(self, spark):
        from aws_glue_cdc_metrics_job_spark.operators.sketches import cm_merge, cm_sketch
        from pyspark.sql import functions as F

        toks = self._toks(spark).withColumn(
            "half", (F.crc32(F.col("TOKEN")) % 2).cast("int")
        )
        a = cm_sketch(toks.filter("half = 0"), "TOKEN")
        b = cm_sketch(toks.filter("half = 1"), "TOKEN")
        merged = sorted(map(tuple, cm_merge(a.unionByName(b)).collect()))
        direct = sorted(map(tuple, cm_sketch(toks, "TOKEN").collect()))
        assert merged == direct

    def test_bounded_size(self, spark):
        from aws_glue_cdc_metrics_job_spark.operators.sketches import CM_D, CM_W, cm_sketch

        sk = cm_sketch(self._toks(spark), "TOKEN")
        assert sk.count() <= CM_D * CM_W


def test_cm_fast_path_same_guarantees(spark):
    """xxhash64 cells: different sketch values, same structural guarantees
    (overestimate, merge==direct) -- the documented 100TB swap."""
    from aws_glue_cdc_metrics_job_spark.operators.sketches import (
        cm_estimate, cm_merge, cm_sketch,
    )
    from pyspark.sql import functions as F

    toks = spark.createDataFrame(
        [(f"t{i % 37}",) for i in range(1000)], "TOKEN string"
    )
    sk = cm_sketch(toks, "TOKEN", portable=False)
    exact = {r["TOKEN"]: r["n"] for r in toks.groupBy("TOKEN").agg(F.count("*").alias("n")).collect()}
    items = spark.createDataFrame([(t,) for t in exact], "TOKEN string")
    est = {r["TOKEN"]: r["EST_COUNT"] for r in cm_estimate(sk, items, "TOKEN", portable=False).collect()}
    assert all(est[t] >= exact[t] for t in exact)
    half = toks.withColumn("h", (F.crc32("TOKEN") % 2).cast("int"))
    a = cm_sketch(half.filter("h = 0"), "TOKEN", portable=False)
    b = cm_sketch(half.filter("h = 1"), "TOKEN", portable=False)
    assert sorted(map(tuple, cm_merge(a.unionByName(b)).collect())) == sorted(
        map(tuple, sk.collect())
    )
