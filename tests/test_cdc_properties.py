"""Property-based CDC invariants (SURVEY.md §5 item 4), via hypothesis:
for arbitrary prev/cur snapshot pairs,

- insert/update/delete key sets are disjoint,
- |cur| = |prev| - |deletes| + |inserts| on key sets,
- apply_changes(prev, diff) == cur (MERGE roundtrip),
- diff(cur, cur) is empty (idempotence).

Spark jobs are slow per-example, so examples are few but each is a whole
snapshot pair; the deterministic unit tests in test_cdc.py cover the
targeted edge cases (nulls, empties)."""

import pytest
from pyspark.sql import functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aws_glue_cdc_metrics_job_spark.operators.cdc import apply_changes, cdc_diff

KEYS = st.integers(min_value=0, max_value=15)
VALS = st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))
SNAPSHOT = st.dictionaries(KEYS, st.tuples(VALS, st.integers(0, 3)), max_size=10)


def _df(spark, snap):
    rows = [(k, v, n) for k, (v, n) in snap.items()]
    return spark.createDataFrame(rows, "pk int, attr string, n int")


@pytest.mark.slow
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(prev=SNAPSHOT, cur=SNAPSHOT)
def test_cdc_invariants(spark, prev, cur):
    dfp, dfc = _df(spark, prev), _df(spark, cur)
    diff = cdc_diff(dfc, dfp, pks=["pk"]).collect()
    by_action = {"insert": set(), "update": set(), "delete": set()}
    for r in diff:
        by_action[r["cdc_action"]].add(r["pk"])

    # key-set algebra
    assert by_action["insert"] == set(cur) - set(prev)
    assert by_action["delete"] == set(prev) - set(cur)
    assert by_action["update"] == {k for k in set(cur) & set(prev) if cur[k] != prev[k]}
    assert len(cur) == len(prev) - len(by_action["delete"]) + len(by_action["insert"])

    # MERGE roundtrip
    merged = apply_changes(dfp, cdc_diff(dfc, dfp, pks=["pk"]), pks=["pk"])
    assert sorted(merged.collect()) == sorted(dfc.collect())


@pytest.mark.slow
@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(snap=SNAPSHOT)
def test_diff_self_is_empty(spark, snap):
    df = _df(spark, snap)
    assert cdc_diff(df, df, pks=["pk"]).isEmpty()


# --- changelog compaction: for ARBITRARY consistent change logs,
# applying the compacted set equals replaying the log step by step.

ACTION_SEQS = st.lists(
    st.sampled_from(["update", "delete", "insert"]), min_size=1, max_size=4
)
LOG_KEYS = st.dictionaries(KEYS, ACTION_SEQS, min_size=1, max_size=8)


def _consistent_log(key_actions):
    """Rewrite an arbitrary action list into a CONSISTENT history given
    the key starts existing (so step-wise apply is well-defined):
    exists -> update/delete allowed; absent -> only insert."""
    rows = []
    for k, seq in key_actions.items():
        exists = True
        for i, a in enumerate(seq):
            if exists and a == "insert":
                a = "update"
            if not exists and a != "insert":
                a = "insert"
            rows.append((k, f"v{k}_{i}", i, a))
            exists = a != "delete"
    return rows


@pytest.mark.slow
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(LOG_KEYS)
def test_compacted_apply_equals_replay(spark, key_actions):
    from aws_glue_cdc_metrics_job_spark.operators.cdc import compact_changelog

    rows = _consistent_log(key_actions)
    log = spark.createDataFrame(rows, "pk int, attr string, SEQ int, cdc_action string")
    snapshot = spark.createDataFrame(
        [(k, "base") for k in key_actions], "pk int, attr string"
    )
    replay = snapshot
    for seq in sorted({r[2] for r in rows}):
        step = log.filter(F.col("SEQ") == seq).drop("SEQ")
        replay = apply_changes(replay, step, ["pk"])
    compacted = compact_changelog(log, ["pk"], ["SEQ"])
    direct = apply_changes(snapshot, compacted, ["pk"])
    assert sorted(map(tuple, replay.collect())) == sorted(map(tuple, direct.collect()))
