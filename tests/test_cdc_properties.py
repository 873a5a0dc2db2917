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
