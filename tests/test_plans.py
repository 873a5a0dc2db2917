"""Plan-shape assertions: the optimizations we rely on at 100TB must be
visible in explain() output, not assumed (SURVEY.md §4)."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from aws_glue_cdc_metrics_job_spark.sources import read_table


@pytest.fixture(scope="module")
def catalog():
    return entrymod.queries()


def _plan(df) -> str:
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_parquet(spark, sf_dir, catalog):
    plan = _plan(catalog["scan_filter_project"](spark, sf_dir))
    assert "PushedFilters:" in plan
    assert "l_returnflag" in plan.split("PushedFilters:")[1].splitlines()[0]


def test_column_pruning(spark, sf_dir):
    df = read_table(spark, sf_dir, "lineitem").select("l_orderkey")
    plan = _plan(df)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_comment" not in read_schema


def test_small_dims_broadcast_in_order_items(spark, sf_dir):
    from aws_glue_cdc_metrics_job_spark.plans import adapters

    plan = _plan(adapters._order_items(spark, sf_dir))
    # customer/part are dimension-sized: at least one broadcast join expected
    assert "BroadcastHashJoin" in plan


def test_whole_stage_codegen_in_aggregation(spark, sf_dir, catalog):
    # Under AQE the codegen annotations only appear in the *final* plan,
    # so execute first, then explain ("[codegen id : N]" tags).
    df = catalog["pricing_summary"](spark, sf_dir)
    df.collect()
    plan = _plan(df)
    assert "HashAggregate" in plan
    assert "codegen id" in plan


def test_entry_contract(spark):
    df = entrymod.entry(spark)
    assert df.schema.simpleString() == (
        "struct<USER_ID:bigint,CREATION_DATE:date,DAILY_REVENUE:double,CUMULATIVE_LTV:double>"
    )
    assert df.count() > 0


@pytest.mark.slow  # ~4 min: excluded from the default suite (pytest.ini); run with -m ""
def test_every_query_runs_at_smoke_scale(spark, sf_dir, catalog):
    """Every catalog entry must build and execute (schema + >=0 rows)."""
    for name, fn in catalog.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(5).collect()


def test_oracle_queries_have_matching_spark_entries():
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())


def test_asof_join_is_single_shuffle(spark, sf_dir, catalog):
    # union + running-last as-of: exactly ONE SEMANTIC Exchange (hash on
    # the key), never a join node -- the piecewise-merge shape
    # (operators/temporal.py). read_table's single-split parallelism floor
    # adds RoundRobin repartitions in local mode (absent at scale, where
    # scans split naturally); only hash/range exchanges are the operator's
    # own shuffles.
    plan = _plan(catalog["events_asof_attribution"](spark, sf_dir))
    assert plan.count("Arguments: hashpartitioning") == 1
    assert "rangepartitioning" not in plan
    assert "Join" not in plan
    assert "Window" in plan


def test_hash_sample_is_stateless_map(spark, sf_dir, catalog):
    # md5-threshold sampling must not shuffle on any KEY: scan -> filter ->
    # project only (the parallelism-floor RoundRobin is layout, not
    # semantics -- see test_asof_join_is_single_shuffle)
    plan = _plan(catalog["lineitem_hash_sample"](spark, sf_dir))
    assert "hashpartitioning" not in plan and "rangepartitioning" not in plan


def test_interval_join_is_equi_join(spark, sf_dir, catalog):
    # banded range join: a hash/broadcast equi-join on (key, bucket), NOT a
    # BroadcastNestedLoopJoin / cartesian the bare BETWEEN would produce
    plan = _plan(catalog["events_interval_join"](spark, sf_dir))
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan) or ("ShuffledHashJoin" in plan)


def test_catalog_rejects_duplicate_query_names():
    import pytest as _pytest

    from aws_glue_cdc_metrics_job_spark.plans import catalog

    @catalog.query("_dup_guard_probe")
    def probe_a(spark, sf_dir):  # pragma: no cover - registration only
        return None

    with _pytest.raises(ValueError, match="already registered"):

        @catalog.query("_dup_guard_probe")
        def probe_b(spark, sf_dir):  # pragma: no cover
            return None

    # same function re-registering (module reload) stays allowed
    catalog.query("_dup_guard_probe")(probe_a)
    catalog.QUERIES.pop("_dup_guard_probe", None)


def test_partition_pruned_read_lists_only_matching_dirs(spark, sf_dir):
    """The pruning demo's contract: the filter becomes PartitionFilters
    and only the 7 in-range date directories contribute input files."""
    from aws_glue_cdc_metrics_job_spark.plans.queries_ops import (
        q_events_partition_pruned_read,
    )

    df = q_events_partition_pruned_read(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "EVENT_DATE" in plan.split("PartitionFilters")[1][:200]
    # runtime proof (inputFiles() is pre-pruning): the files actually read
    # are exactly the 7 in-range date directories
    import hashlib
    import os
    import tempfile

    from pyspark.sql import functions as F

    h = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"evpart_{h}")
    read = (
        spark.read.parquet(path)
        .filter(F.col("EVENT_DATE").between("2024-01-10", "2024-01-16"))
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    )
    dates = {r["f"].split("EVENT_DATE=")[1].split("/")[0] for r in read}
    assert dates == {f"2024-01-1{d}" for d in range(0, 7)}


def test_name_fuzzy_pairs_neighborhood_matches_brute_force(spark, tmp_path):
    """The r8-opt rewrite of customers_name_fuzzy_pairs replaces the
    per-block quadratic (nation, len) self-join + levenshtein residual
    with a masked-position neighborhood equi-join. Equivalence pinned on
    the adversarial shapes the testdata lacks: identical names (match at
    every mask -> exactly one output row), one substitution (match),
    transposition of adjacent chars (distance 2, MUST NOT match even
    though halves collide), distance-2 double substitution, same name in
    different nations (no pair), different lengths (no pair)."""
    from pyspark.sql import functions as F

    from aws_glue_cdc_metrics_job_spark.plans.queries_ops import (
        q_customers_name_fuzzy_pairs,
    )

    rows = [
        (1, 0, "alpha"),   # identical with 2
        (2, 0, "alpha"),
        (3, 0, "alphq"),   # one substitution vs alpha
        (4, 0, "aplha"),   # transposition vs alpha: distance 2
        (5, 0, "alxhq"),   # two substitutions vs alpha: distance 2
        (6, 1, "alpha"),   # other nation: never pairs with 1..5
        (7, 0, "alphas"),  # other length: never pairs
        (8, 0, "b"),       # 1-char names: masked variant is ""
        (9, 0, "c"),       # lev("b","c")=1 -> pair
    ]
    df = spark.createDataFrame(rows, "c_custkey long, c_nationkey long, c_name string")
    df.write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))

    got = {
        (r["NATION_ID"], r["ID_A"], r["ID_B"], r["EDIT_DISTANCE"])
        for r in q_customers_name_fuzzy_pairs(spark, str(tmp_path)).collect()
    }
    a, b = df.alias("a"), df.alias("b")
    brute = (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.length("a.c_name") == F.length("b.c_name"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .where(F.levenshtein(F.col("a.c_name"), F.col("b.c_name")) <= 1)
        .select(
            F.col("a.c_nationkey"), F.col("a.c_custkey"), F.col("b.c_custkey"),
            F.levenshtein(F.col("a.c_name"), F.col("b.c_name")).cast("bigint"),
        )
    )
    exp = {tuple(r) for r in brute.collect()}
    assert got == exp
    assert (0, 1, 2, 0) in got and (0, 1, 3, 1) in got and (0, 8, 9, 1) in got
    assert not any(r[1] == 1 and r[2] == 4 for r in got)  # transposition excluded
    assert not any(r[1] == 1 and r[2] == 5 for r in got)  # double-sub excluded
