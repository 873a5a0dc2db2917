"""Snapshot-diff CDC semantics (SURVEY.md C2/C3, scripts/cdc_metrics_job.py:91-112)."""

import pytest
from pyspark.sql import functions as F

from aws_glue_cdc_metrics_job_spark.operators.cdc import apply_changes, cdc_diff, tag_appends


@pytest.fixture(scope="module")
def snapshots(spark):
    prev = spark.createDataFrame(
        [
            (1, "a", 10.0),   # unchanged
            (2, "b", 20.0),   # value update
            (3, "c", 30.0),   # deleted in cur
            (4, None, 40.0),  # null -> value transition
            (5, "e", 50.0),   # value -> null transition
        ],
        "pk int, attr string, amount double",
    )
    cur = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b2", 20.0),
            (4, "d", 40.0),
            (5, None, 50.0),
            (6, "f", 60.0),   # inserted
        ],
        "pk int, attr string, amount double",
    )
    return cur, prev


def _by_action(rows):
    out = {}
    for r in rows:
        out.setdefault(r["cdc_action"], set()).add(r["pk"])
    return out


def test_keyed_diff_null_safe(snapshots):
    cur, prev = snapshots
    got = _by_action(cdc_diff(cur, prev, pks=["pk"]).collect())
    assert got == {"insert": {6}, "delete": {3}, "update": {2, 4, 5}}


def test_keyed_diff_null_hostile_reproduces_reference(snapshots):
    """The reference's `<>` predicate (scripts/cdc_metrics_job.py:106) drops
    NULL->value and value->NULL transitions."""
    cur, prev = snapshots
    got = _by_action(cdc_diff(cur, prev, pks=["pk"], null_safe=False).collect())
    assert got["update"] == {2}


def test_fullrow_mode_matches_keyed_on_clean_data(snapshots):
    cur, prev = snapshots
    keyed = _by_action(cdc_diff(cur, prev, pks=["pk"]).collect())
    fullrow = _by_action(cdc_diff(cur, prev, pks=["pk"], mode="fullrow").collect())
    # fullrow classifies a changed row as insert+delete rather than update
    assert fullrow["insert"] == keyed["insert"] | keyed["update"]
    assert fullrow["delete"] == keyed["delete"] | keyed["update"]


def test_update_keeps_current_image(snapshots):
    cur, prev = snapshots
    upd = {
        r["pk"]: r["attr"]
        for r in cdc_diff(cur, prev, pks=["pk"]).filter(F.col("cdc_action") == "update").collect()
    }
    assert upd[2] == "b2" and upd[4] == "d"


def test_apply_changes_roundtrip(snapshots):
    """prev + diff(cur, prev) == cur (the MERGE identity)."""
    cur, prev = snapshots
    changes = cdc_diff(cur, prev, pks=["pk"])
    merged = apply_changes(prev, changes, pks=["pk"])
    assert sorted(merged.collect()) == sorted(cur.collect())


def test_diff_empty_previous_is_all_inserts(spark, snapshots):
    cur, _ = snapshots
    empty = spark.createDataFrame([], cur.schema)
    got = _by_action(cdc_diff(cur, empty, pks=["pk"]).collect())
    assert got == {"insert": {1, 2, 4, 5, 6}}


def test_tag_appends(snapshots):
    cur, _ = snapshots
    tagged = tag_appends(cur, "2024-01-01 00:00:00")
    rows = tagged.collect()
    assert all(r["cdc_action"] == "insert" for r in rows)
    assert len(rows) == cur.count()


class TestEvolvedSchemaDiff:
    def _frames(self, spark):
        cur = spark.createDataFrame(
            [(1, "a", "NEW"), (2, "b", None), (3, "c", "X")],
            "pk long, val string, added string",
        )
        prev = spark.createDataFrame(
            [(1, "a", True), (2, "b", False), (4, "d", True)],
            "pk long, val string, dropped boolean",
        )
        return cur, prev

    def test_alignment_semantics(self, spark):
        from aws_glue_cdc_metrics_job_spark.operators.cdc import cdc_diff

        cur, prev = self._frames(spark)
        got = {
            r["pk"]: r["cdc_action"]
            for r in cdc_diff(cur, prev, pks=["pk"], evolve_schema=True).collect()
        }
        # pk1: added col NULL->'NEW' => update; pk2: NULL->NULL, dropped col
        # invisible => no change; pk3 insert; pk4 delete
        assert got == {1: "update", 3: "insert", 4: "delete"}

    def test_output_speaks_current_schema(self, spark):
        from aws_glue_cdc_metrics_job_spark.operators.cdc import cdc_diff

        cur, prev = self._frames(spark)
        out = cdc_diff(cur, prev, pks=["pk"], evolve_schema=True)
        assert "dropped" not in out.columns and "added" in out.columns
        # the delete row carries a typed NULL for the added column
        dels = out.filter("cdc_action = 'delete'").collect()
        assert dels[0]["added"] is None

    def test_missing_pk_raises(self, spark):
        import pytest

        from aws_glue_cdc_metrics_job_spark.operators.cdc import cdc_diff

        cur, _ = self._frames(spark)
        prev = spark.createDataFrame([(1,)], "other long")
        with pytest.raises(ValueError, match="primary key"):
            cdc_diff(cur, prev, pks=["pk"], evolve_schema=True)


class TestCompactChangelog:
    def _log(self, spark):
        rows = [
            # key 1: insert then update -> net insert with last image
            (1, "a1", 1, "insert"), (1, "a2", 2, "update"),
            # key 2: insert then delete -> vanishes
            (2, "b1", 1, "insert"), (2, "b2", 2, "delete"),
            # key 3: update then delete -> net delete
            (3, "c1", 1, "update"), (3, "c2", 2, "delete"),
            # key 4: delete then re-insert -> net update with last image
            (4, "d1", 1, "delete"), (4, "d2", 2, "insert"),
            # key 5: lone update
            (5, "e1", 1, "update"),
        ]
        return spark.createDataFrame(rows, "pk long, val string, SEQ int, cdc_action string")

    def test_net_semantics(self, spark):
        from aws_glue_cdc_metrics_job_spark.operators.cdc import compact_changelog

        rows = compact_changelog(self._log(spark), ["pk"], ["SEQ"]).collect()
        got = {r["pk"]: (r["cdc_action"], r["val"]) for r in rows}
        assert got == {
            1: ("insert", "a2"),
            3: ("delete", "c2"),
            4: ("update", "d2"),
            5: ("update", "e1"),
        }
        # order_cols carry through from the last image (r3 ADVICE): a
        # consumer replaying net changes keeps the sequence column
        assert {r["pk"]: r["SEQ"] for r in rows} == {1: 2, 3: 2, 4: 2, 5: 1}

    def test_replay_equivalence(self, spark):
        """Applying the compacted set == replaying the log change by change."""
        from aws_glue_cdc_metrics_job_spark.operators.cdc import apply_changes, compact_changelog

        snapshot = spark.createDataFrame(
            [(3, "c0"), (4, "d0"), (5, "e0"), (9, "z0")], "pk long, val string"
        )
        log = self._log(spark)
        replay = snapshot
        for seq in (1, 2):
            step = log.filter(f"SEQ = {seq}").drop("SEQ")
            replay = apply_changes(replay, step, ["pk"])
        compacted = compact_changelog(log, ["pk"], ["SEQ"])
        direct = apply_changes(snapshot, compacted, ["pk"])
        assert sorted(map(tuple, replay.collect())) == sorted(map(tuple, direct.collect()))
