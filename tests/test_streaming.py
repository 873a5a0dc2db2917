"""Structured Streaming operators: each driven with a file source +
availableNow trigger and checked against its batch equivalent."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from aws_glue_cdc_metrics_job_spark import streaming as S

D = dt.datetime

EVENT_SCHEMA = "event_id long, ts timestamp, user_id long, value double"

BATCH1 = [
    (1, D(2024, 1, 1, 10, 0), 1, 10.0),
    (2, D(2024, 1, 1, 10, 5), 1, 5.0),
    (3, D(2024, 1, 1, 12, 0), 2, 7.0),
]
BATCH2 = [
    (4, D(2024, 1, 2, 9, 0), 1, 3.0),
    (2, D(2024, 1, 1, 10, 5), 1, 5.0),  # duplicate event_id within watermark
]


@pytest.fixture()
def event_dir(spark, tmp_path):
    src = str(tmp_path / "events_in")
    spark.createDataFrame(BATCH1, EVENT_SCHEMA).write.mode("append").parquet(src)
    spark.createDataFrame(BATCH2, EVENT_SCHEMA).write.mode("append").parquet(src)
    return src


def _run_to_memory(df, name, tmp_path, output_mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_tumbling_aggregate_matches_batch(spark, tmp_path, event_dir):
    stream = S.read_event_stream(spark, event_dir, EVENT_SCHEMA)
    _run_to_memory(
        S.tumbling_aggregate(stream, window="1 hour", watermark="0 seconds"),
        "tumbling",
        tmp_path,
        output_mode="complete",
    )
    got = {
        r["WINDOW_START"]: (r["N_EVENTS"], r["TOTAL_VALUE"])
        for r in spark.sql("SELECT * FROM tumbling").collect()
    }
    assert got[D(2024, 1, 1, 10)] == (3, 20.0)  # includes the duplicate row
    assert got[D(2024, 1, 1, 12)] == (1, 7.0)
    assert got[D(2024, 1, 2, 9)] == (1, 3.0)


def test_hopping_aggregate_matches_batch(spark, tmp_path, event_dir):
    stream = S.read_event_stream(spark, event_dir, EVENT_SCHEMA)
    _run_to_memory(
        S.tumbling_aggregate(stream, window="2 hours", slide="1 hour", watermark="0 seconds"),
        "hopping",
        tmp_path,
        output_mode="complete",
    )
    got = {
        r["WINDOW_START"]: (r["N_EVENTS"], r["TOTAL_VALUE"])
        for r in spark.sql("SELECT * FROM hopping").collect()
    }
    # each event appears in exactly window/slide = 2 overlapping windows
    assert got[D(2024, 1, 1, 9)] == (3, 20.0)  # covers [9:00,11:00): events 1,2,dup
    assert got[D(2024, 1, 1, 10)] == (3, 20.0)  # covers [10:00,12:00)
    assert got[D(2024, 1, 1, 11)] == (1, 7.0)  # covers [11:00,13:00): event 3
    assert got[D(2024, 1, 1, 12)] == (1, 7.0)
    # batch parity: same plan shape over a static read of the same files
    batch = (
        spark.read.schema(EVENT_SCHEMA)
        .parquet(event_dir)
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("N"), F.sum("value").alias("V"))
        .collect()
    )
    assert {r["w"]["start"]: (r["N"], r["V"]) for r in batch} == got


def test_streaming_dedup_drops_watermark_duplicates(spark, tmp_path, event_dir):
    stream = S.read_event_stream(spark, event_dir, EVENT_SCHEMA)
    _run_to_memory(
        S.streaming_dedup(stream, ["event_id"], watermark="10 days"), "dedup", tmp_path
    )
    rows = spark.sql("SELECT * FROM dedup").collect()
    assert sorted(r["event_id"] for r in rows) == [1, 2, 3, 4]


def test_session_windows(spark, tmp_path, event_dir):
    stream = S.read_event_stream(spark, event_dir, EVENT_SCHEMA)
    _run_to_memory(
        S.session_windows(stream, gap="30 minutes", watermark="0 seconds"),
        "sessions",
        tmp_path,
        output_mode="complete",
    )
    rows = spark.sql("SELECT * FROM sessions").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append((r["SESSION_START"], r["N_EVENTS"]))
    # user 1: events at 10:00/10:05 fuse into one session (+ dup row), 9:00 next day separate
    u1 = sorted(by_user[1])
    assert len(u1) == 2
    assert u1[0] == (D(2024, 1, 1, 10, 0), 3)
    assert by_user[2] == [(D(2024, 1, 1, 12, 0), 1)]


def test_stateful_running_total_across_batches(spark, tmp_path, event_dir):
    stream = S.read_event_stream(spark, event_dir, EVENT_SCHEMA)
    _run_to_memory(
        S.stateful_running_total(stream), "totals", tmp_path, output_mode="update"
    )
    rows = spark.sql("SELECT * FROM totals").collect()
    # keep the final update per key (cumulative across micro-batches)
    final = {}
    for r in rows:
        if r["user_id"] not in final or r["N"] > final[r["user_id"]][1]:
            final[r["user_id"]] = (r["TOTAL"], r["N"])
    assert final[1] == (23.0, 4)
    assert final[2] == (7.0, 1)


def test_cdc_upsert_sink(spark, tmp_path):
    changes_dir = str(tmp_path / "changes_in")
    snap_path = str(tmp_path / "snapshot")
    schema = "pk long, val string, cdc_action string"
    # seed snapshot
    spark.createDataFrame([(1, "a"), (2, "b")], "pk long, val string").write.parquet(snap_path)
    spark.createDataFrame(
        [(2, "b2", "update"), (3, "c", "insert"), (1, None, "delete")], schema
    ).write.mode("append").parquet(changes_dir)
    changes = spark.readStream.schema(schema).parquet(changes_dir)
    q = S.cdc_upsert_sink(changes, spark, snap_path, ["pk"], str(tmp_path / "ckpt_cdc"))
    q.awaitTermination(120)
    got = {r["pk"]: r["val"] for r in spark.read.parquet(snap_path).collect()}
    assert got == {2: "b2", 3: "c"}


def test_decontaminate_sink_blocks_contaminated_docs(spark, tmp_path):
    DOC_SCHEMA = "doc_id long, text string"
    bench = spark.createDataFrame([(100, "b c d e")], DOC_SCHEMA)
    src = str(tmp_path / "docs_in")
    spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y z w")], DOC_SCHEMA  # 1 shares 'b c d'
    ).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(3, "c d e f g"), (4, "m n o p")], DOC_SCHEMA  # 3 shares 'c d e'
    ).write.mode("append").parquet(src)

    stream = S.read_event_stream(spark, src, DOC_SCHEMA)
    clean_path = str(tmp_path / "clean")
    q = S.decontaminate_sink(
        stream, bench, clean_path, checkpoint=str(tmp_path / "ckpt_decon"), n=3
    )
    q.awaitTermination(120)

    clean_ids = {r["doc_id"] for r in spark.read.parquet(clean_path).collect()}
    assert clean_ids == {2, 4}

    # batch/stream agreement: the batch operator on the full input set
    # flags exactly the complement
    from aws_glue_cdc_metrics_job_spark.operators.decontam import decontaminate

    full = spark.read.parquet(src)
    flags = {r["doc_id"]: r["CONTAMINATED"] for r in decontaminate(full, bench, n=3).collect()}
    assert {d for d, c in flags.items() if not c} == clean_ids


def test_incremental_mart_sink_across_batches(spark, tmp_path):
    changes_dir = str(tmp_path / "mchanges_in")
    mart_path = str(tmp_path / "mart")
    ckpt = str(tmp_path / "ckpt_mart")
    schema = (
        "k long, g string, amt double, cdc_action string, "
        "cdc_old struct<k: long, g: string, amt: double>"
    )
    # batch 1: the natural cold start — pure inserts
    spark.createDataFrame(
        [
            (1, "a", 10.0, "insert", None),
            (2, "a", 20.0, "insert", None),
            (3, "b", 5.0, "insert", None),
        ],
        schema,
    ).write.mode("append").parquet(changes_dir)
    changes = spark.readStream.schema(schema).parquet(changes_dir)
    q = S.incremental_mart_sink(
        changes, spark, mart_path, ["g"], ["amt"], ckpt,
        count_col="N", decimal_scale=2,
    )
    q.awaitTermination(120)
    got = {r["g"]: (float(r["SUM_amt"]), r["N"]) for r in spark.read.parquet(mart_path).collect()}
    assert got == {"a": (30.0, 2), "b": (5.0, 1)}

    # batch 2: key-migrating update (k2: a->b, 20->25) and a delete (k3)
    spark.createDataFrame(
        [
            (2, "b", 25.0, "update", (2, "a", 20.0)),
            (3, "b", 5.0, "delete", (3, "b", 5.0)),
        ],
        schema,
    ).write.mode("append").parquet(changes_dir)
    changes2 = spark.readStream.schema(schema).parquet(changes_dir)
    q2 = S.incremental_mart_sink(
        changes2, spark, mart_path, ["g"], ["amt"], ckpt,
        count_col="N", decimal_scale=2,
    )
    q2.awaitTermination(120)
    got = {r["g"]: (float(r["SUM_amt"]), r["N"]) for r in spark.read.parquet(mart_path).collect()}
    assert got == {"a": (10.0, 1), "b": (25.0, 1)}


def test_incremental_mart_sink_refuses_bad_cold_start(spark, tmp_path):
    changes_dir = str(tmp_path / "badchanges_in")
    schema = (
        "k long, g string, amt double, cdc_action string, "
        "cdc_old struct<k: long, g: string, amt: double>"
    )
    spark.createDataFrame(
        [(9, "z", 1.0, "delete", (9, "z", 1.0))], schema
    ).write.mode("append").parquet(changes_dir)
    changes = spark.readStream.schema(schema).parquet(changes_dir)
    q = S.incremental_mart_sink(
        changes, spark, str(tmp_path / "never_mart"), ["g"], ["amt"],
        str(tmp_path / "ckpt_bad"), decimal_scale=2,
    )
    try:
        q.awaitTermination(120)
    except Exception:
        pass  # a failing foreachBatch surfaces as a query exception
    assert q.exception() is not None
    assert "cold start" in str(q.exception())


def test_scd2_dimension_sink_across_batches(spark, tmp_path):
    """Streaming Type-2 maintenance: cold-start build, then an incremental
    batch that closes an open version, no-ops another, and adds a key;
    final dimension equals a batch scd2_from_log over the whole log."""
    from aws_glue_cdc_metrics_job_spark.operators.scd import scd2_from_log

    log_dir = str(tmp_path / "scdlog_in")
    dim_path = str(tmp_path / "scddim")
    ckpt = str(tmp_path / "ckpt_scd")
    schema = "k long, ts timestamp, i long, v string, cdc_action string"
    b1 = [
        (1, D(2024, 1, 1), 1, "a", "update"),
        (2, D(2024, 1, 1), 2, "x", "update"),
    ]
    spark.createDataFrame(b1, schema).write.mode("append").parquet(log_dir)
    stream = spark.readStream.schema(schema).parquet(log_dir)
    kw = dict(pks=["k"], ts_col="ts", attr_cols=["v"], order_cols=["i"])
    q = S.scd2_dimension_sink(stream, spark, dim_path, checkpoint=ckpt, **kw)
    q.awaitTermination(120)
    assert spark.read.parquet(dim_path).count() == 2

    b2 = [
        (1, D(2024, 1, 5), 3, "b", "update"),  # real change: closes v=a
        (2, D(2024, 1, 5), 4, "x", "update"),  # no-op: extends open version
        (3, D(2024, 1, 5), 5, "z", "update"),  # new key
    ]
    spark.createDataFrame(b2, schema).write.mode("append").parquet(log_dir)
    stream2 = spark.readStream.schema(schema).parquet(log_dir)
    q2 = S.scd2_dimension_sink(stream2, spark, dim_path, checkpoint=ckpt, **kw)
    q2.awaitTermination(120)

    merged = spark.read.parquet(dim_path)
    full = scd2_from_log(spark.createDataFrame(b1 + b2, schema), **kw)
    sym = merged.exceptAll(full).count() + full.exceptAll(merged).count()
    assert sym == 0
    assert merged.count() == 4  # k1: a(closed)+b(open); k2: x(open); k3: z(open)


def test_quantile_sketch_sink_equals_direct(spark, tmp_path, event_dir):
    from aws_glue_cdc_metrics_job_spark.operators.sketches import quantile_sketch

    stream = S.read_event_stream(spark, event_dir, EVENT_SCHEMA)
    zone = str(tmp_path / "sketch_zone")
    q = S.quantile_sketch_sink(
        stream.withColumn("d", F.to_date("ts")),
        spark,
        zone,
        ["d"],
        "value",
        checkpoint=str(tmp_path / "ckpt_qs"),
        alpha=0.02,
    )
    q.awaitTermination(120)
    got = sorted(
        (r["d"].isoformat(), r["SIGN"], r["SIGNED_BIN"], r["N"])
        for r in spark.read.parquet(zone).collect()
    )
    # streamed accumulation == one-shot sketch over the same raw data, EXACTLY
    direct = quantile_sketch(
        spark.read.schema(EVENT_SCHEMA).parquet(event_dir).withColumn("d", F.to_date("ts")),
        ["d"],
        "value",
        alpha=0.02,
    )
    want = sorted(
        (r["d"].isoformat(), r["SIGN"], r["SIGNED_BIN"], r["N"]) for r in direct.collect()
    )
    assert got == want and got


def test_chunk_encode_sink_matches_batch(spark, tmp_path):
    DOC_SCHEMA = "doc_id long, text string"
    vocab = spark.createDataFrame(
        [("w%d" % i, i) for i in range(10)], "TOKEN string, TOKEN_ID long"
    )
    src = str(tmp_path / "rag_in")
    long_doc = " ".join("w%d" % (i % 10) for i in range(20))
    spark.createDataFrame([(1, long_doc)], DOC_SCHEMA).write.mode("append").parquet(src)
    spark.createDataFrame([(2, "w1 w2 oov")], DOC_SCHEMA).write.mode("append").parquet(src)

    stream = S.read_event_stream(spark, src, DOC_SCHEMA)
    chunks_path = str(tmp_path / "chunks")
    q = S.chunk_encode_sink(
        stream, vocab, chunks_path, checkpoint=str(tmp_path / "ckpt_rag"),
        chunk_tokens=8, stride=6,
    )
    q.awaitTermination(120)

    got = spark.read.parquet(chunks_path).collect()
    by_key = {(r["doc_id"], r["CHUNK_IDX"]): r for r in got}
    # doc 1: 20 tokens, starts 0/6/12 (18 dropped: suffix-duplicate runt);
    # doc 2: 1 chunk
    assert len(by_key) == 4
    # encoding agrees with the batch operators run on the full input
    from aws_glue_cdc_metrics_job_spark.operators.text import chunk_documents, encode_token_ids
    from pyspark.sql import functions as F

    full = chunk_documents(spark.read.parquet(src), chunk_tokens=8, stride=6).select(
        "doc_id", "CHUNK_IDX",
        (F.col("doc_id") * (1 << 20) + F.col("CHUNK_IDX")).alias("CHUNK_ID"),
        F.col("CHUNK_TEXT").alias("text"),
    )
    exp = {
        (r["CHUNK_ID"] >> 20, r["CHUNK_ID"] & ((1 << 20) - 1)): r["TOKEN_IDS"]
        for r in encode_token_ids(full, vocab, id_col="CHUNK_ID").collect()
    }
    for k, r in by_key.items():
        assert list(r["TOKEN_IDS"]) == list(exp[k])
    # OOV maps to -1
    assert list(by_key[(2, 0)]["TOKEN_IDS"]) == [1, 2, -1]


def test_anomaly_alert_sink_matches_batch(spark, tmp_path):
    import datetime as dt

    SCHEMA = "metric string, ts timestamp, value double"
    t0 = dt.datetime(2024, 1, 1)
    pts = [("m1", t0 + dt.timedelta(days=i), 10.0) for i in range(6)]
    pts.append(("m1", t0 + dt.timedelta(days=6), 10.2))   # calm
    pts.append(("m1", t0 + dt.timedelta(days=7), 99.0))   # spike
    pts.append(("m1", t0 + dt.timedelta(days=8), 10.1))   # back to normal
    src = str(tmp_path / "metrics_in")
    # two in-order micro-batches
    spark.createDataFrame(pts[:5], SCHEMA).write.mode("append").parquet(src)
    spark.createDataFrame(pts[5:], SCHEMA).write.mode("append").parquet(src)

    stream = S.read_event_stream(spark, src, SCHEMA)
    series, alerts = str(tmp_path / "series"), str(tmp_path / "alerts")
    q = S.anomaly_alert_sink(
        stream, spark, series, alerts, ["metric"], "ts", "value",
        n=5, z_threshold=2.0, checkpoint=str(tmp_path / "ckpt_anom"),
    )
    q.awaitTermination(120)

    got = {(r["metric"], r["ts"]) for r in spark.read.parquet(alerts).collect()}
    # batch replay over the final series flags the same points
    from aws_glue_cdc_metrics_job_spark.operators.monitoring import rolling_zscore

    full = spark.read.parquet(series)
    exp = {
        (r["metric"], r["ts"])
        for r in rolling_zscore(full, ["metric"], "ts", "value", n=5, min_periods=2)
        .filter("IS_ANOMALY = 1")
        .collect()
    }
    assert got == exp and got  # the spike is flagged, nothing else
    assert all(ts == t0 + dt.timedelta(days=7) for _, ts in got)


def test_dedup_ingest_sink_matches_batch(spark, tmp_path):
    DOC_SCHEMA = "doc_id long, text string"
    src = str(tmp_path / "dedup_in")
    # batch 1: 1 and 2 duplicate content (min-id 1 survives)
    spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha  beta gamma"), (3, "unique one")],
        DOC_SCHEMA,
    ).write.mode("append").parquet(src)
    # batch 2: 4 duplicates batch-1 content, 5 is new
    spark.createDataFrame(
        [(4, "ALPHA beta gamma"), (5, "another unique")], DOC_SCHEMA
    ).write.mode("append").parquet(src)

    stream = S.read_event_stream(spark, src, DOC_SCHEMA)
    corpus, index = str(tmp_path / "corpus"), str(tmp_path / "fp_index")
    q = S.dedup_ingest_sink(
        stream, spark, corpus, index, checkpoint=str(tmp_path / "ckpt_dd")
    )
    q.awaitTermination(120)

    admitted = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert admitted == {1, 3, 5}
    # index holds exactly the admitted fingerprints
    assert spark.read.parquet(index).distinct().count() == 3
    # batch replay over the combined input admits the same set
    from aws_glue_cdc_metrics_job_spark.operators.dedup import exact_dedup_incremental

    empty = spark.createDataFrame([], "FINGERPRINT string")
    combined = exact_dedup_incremental(spark.read.parquet(src), empty)
    assert {r["doc_id"] for r in combined.collect()} == admitted


def test_dedup_ingest_replay_idempotent(spark, tmp_path):
    """A micro-batch replayed with the same batch_id (foreachBatch retry)
    must not re-admit documents or duplicate index fingerprints."""
    from aws_glue_cdc_metrics_job_spark.streaming.jobs import _dedup_ingest_apply

    corpus, index = str(tmp_path / "corpus"), str(tmp_path / "fp_index")
    apply_fn = _dedup_ingest_apply(spark, corpus, index)
    DOC_SCHEMA = "doc_id long, text string"
    b0 = spark.createDataFrame([(1, "alpha beta"), (2, "alpha  beta")], DOC_SCHEMA)
    b1 = spark.createDataFrame([(3, "ALPHA beta"), (4, "new content")], DOC_SCHEMA)

    apply_fn(b0, 0)
    apply_fn(b0, 0)  # retry of batch 0 after a simulated failure
    apply_fn(b1, 1)
    apply_fn(b1, 1)  # retry of batch 1

    admitted = sorted(r["doc_id"] for r in spark.read.parquet(corpus).collect())
    assert admitted == [1, 4]  # each doc exactly once despite replays
    fps = [r["FINGERPRINT"] for r in spark.read.parquet(index).collect()]
    assert len(fps) == len(set(fps)) == 2


def test_dedup_ingest_replay_after_partial_failure(spark, tmp_path):
    """Failure between the corpus write and the index write: the replay
    must converge to the same corpus/index state (the r3 ADVICE hazard --
    the old append-mode sink re-admitted the batch's docs)."""
    from aws_glue_cdc_metrics_job_spark.operators.dedup import exact_dedup_incremental
    from aws_glue_cdc_metrics_job_spark.streaming.jobs import _dedup_ingest_apply

    corpus, index = str(tmp_path / "corpus2"), str(tmp_path / "fp_index2")
    apply_fn = _dedup_ingest_apply(spark, corpus, index)
    DOC_SCHEMA = "doc_id long, text string"
    b0 = spark.createDataFrame([(1, "alpha beta"), (2, "gamma delta")], DOC_SCHEMA)

    # simulate the partial failure: corpus delta lands, index delta doesn't
    empty = spark.createDataFrame([], "FINGERPRINT string")
    staged = exact_dedup_incremental(b0, empty)
    staged.write.mode("overwrite").parquet(f"{corpus}/batch_id=0")

    apply_fn(b0, 0)  # the retry
    assert sorted(r["doc_id"] for r in spark.read.parquet(corpus).collect()) == [1, 2]
    assert spark.read.parquet(index).count() == 2


def test_anomaly_alert_replay_idempotent(spark, tmp_path):
    """Replaying a micro-batch must not duplicate series points (which
    would skew every later trailing-n baseline) nor duplicate alerts."""
    from aws_glue_cdc_metrics_job_spark.streaming.jobs import _anomaly_alert_apply

    series, alerts = str(tmp_path / "series_r"), str(tmp_path / "alerts_r")
    apply_fn = _anomaly_alert_apply(spark, series, alerts, ["metric"], "ts", "value", 5, 2.0)
    SCHEMA = "metric string, ts timestamp, value double"
    t0 = D(2024, 1, 1)
    calm = [("m1", t0 + dt.timedelta(days=i), 10.0 + (i % 2) * 0.2) for i in range(6)]
    spike = [("m1", t0 + dt.timedelta(days=6), 99.0)]

    b0 = spark.createDataFrame(calm, SCHEMA)
    b1 = spark.createDataFrame(spike, SCHEMA)
    apply_fn(b0, 0)
    apply_fn(b0, 0)  # retry: series must not double the baseline points
    apply_fn(b1, 1)
    apply_fn(b1, 1)  # retry: the alert must appear exactly once

    assert spark.read.parquet(series).count() == 7
    flagged = spark.read.parquet(alerts).collect()
    assert len(flagged) == 1 and flagged[0]["ts"] == t0 + dt.timedelta(days=6)


def test_anomaly_alert_numeric_looking_string_keys(spark, tmp_path):
    """String keys that look numeric ('01') must round-trip through the
    partitioned series zone exactly (partition-dir inference would read
    them back as 1 and break the key predicate)."""
    from aws_glue_cdc_metrics_job_spark.streaming.jobs import _anomaly_alert_apply

    series, alerts = str(tmp_path / "series_k"), str(tmp_path / "alerts_k")
    apply_fn = _anomaly_alert_apply(spark, series, alerts, ["metric"], "ts", "value", 5, 2.0)
    SCHEMA = "metric string, ts timestamp, value double"
    t0 = D(2024, 1, 1)
    pts = [("01", t0 + dt.timedelta(days=i), 10.0 + (i % 2) * 0.2) for i in range(6)]
    apply_fn(spark.createDataFrame(pts, SCHEMA), 0)
    apply_fn(spark.createDataFrame([("01", t0 + dt.timedelta(days=6), 99.0)], SCHEMA), 1)

    flagged = spark.read.parquet(alerts).collect()
    assert len(flagged) == 1
    assert flagged[0]["metric"] == "01"  # exact string, not inferred int


def test_dsir_selection_sink_matches_batch(spark, tmp_path):
    import pyspark.sql.functions as F

    from aws_glue_cdc_metrics_job_spark.operators.text import dsir_model, dsir_score

    DOC_SCHEMA = "doc_id long, text string"
    # reference corpus: target slice repeats "good data", raw repeats "bad junk"
    ref_rows = [(i, "good data " * 8) for i in range(8)]
    ref_rows += [(100 + i, "bad junk " * 8) for i in range(8)]
    ref = spark.createDataFrame(ref_rows, DOC_SCHEMA)
    model_path = str(tmp_path / "dsir_model")
    dsir_model(ref, target=F.col("doc_id") < 100).write.parquet(model_path)

    src = str(tmp_path / "docs_in")
    batch1 = [(200, "good data good data"), (201, "bad junk bad junk")]
    batch2 = [(202, "good data bad junk good data")]
    spark.createDataFrame(batch1, DOC_SCHEMA).write.mode("append").parquet(src)
    spark.createDataFrame(batch2, DOC_SCHEMA).write.mode("append").parquet(src)

    stream = S.read_event_stream(spark, src, DOC_SCHEMA)
    selected_path = str(tmp_path / "selected")
    q = S.dsir_selection_sink(
        stream, spark, model_path, selected_path,
        checkpoint=str(tmp_path / "ckpt_dsir"), min_log_weight=0.0,
    )
    q.awaitTermination(120)

    got = {r["doc_id"]: r["LOG_WEIGHT"] for r in spark.read.parquet(selected_path).collect()}
    # batch/stream agreement: the batch scorer on the full input keeps the same set
    full = spark.read.parquet(src)
    model = spark.read.parquet(model_path)
    exp = {
        r["doc_id"]: r["LOG_WEIGHT"]
        for r in dsir_score(full, model).filter(F.col("LOG_WEIGHT") >= 0.0).collect()
    }
    assert got == exp
    assert 200 in got and 201 not in got  # target-like kept, junk-like blocked



def test_k_anonymity_release_gate_heals_groups(spark, tmp_path):
    """Rows wait (derived quarantine) until their quasi-group reaches k
    across released + pending; later arrivals heal a waiting group; a row
    whose group is already public releases immediately."""
    from aws_glue_cdc_metrics_job_spark.streaming.jobs import (
        _k_anonymity_apply,
        k_anonymity_quarantine,
    )

    intake, rel = str(tmp_path / "intake"), str(tmp_path / "released")
    apply_fn = _k_anonymity_apply(spark, intake, rel, ["lang", "source"], "doc_id", 3)
    SCHEMA = "doc_id long, lang string, source string"

    # batch 0: en/a has 2 (< 3, waits), fr/b has 3 (released)
    apply_fn(
        spark.createDataFrame(
            [(1, "en", "a"), (2, "en", "a"), (3, "fr", "b"), (4, "fr", "b"), (5, "fr", "b")],
            SCHEMA,
        ),
        0,
    )
    assert {r["doc_id"] for r in spark.read.parquet(rel).collect()} == {3, 4, 5}
    held = k_anonymity_quarantine(spark, intake, rel)
    assert {r["doc_id"] for r in held.collect()} == {1, 2}

    # batch 1: one more en/a heals the group (2 waiting + 1 = 3);
    # one fr/b rides the already-public group alone; de/c waits
    apply_fn(
        spark.createDataFrame([(6, "en", "a"), (7, "fr", "b"), (8, "de", "c")], SCHEMA),
        1,
    )
    assert {r["doc_id"] for r in spark.read.parquet(rel).collect()} == {
        1, 2, 3, 4, 5, 6, 7,
    }
    held = k_anonymity_quarantine(spark, intake, rel)
    assert {r["doc_id"] for r in held.collect()} == {8}

    # invariant: every released quasi-group has >= 3 members
    sizes = spark.read.parquet(rel).groupBy("lang", "source").count().collect()
    assert all(r["count"] >= 3 for r in sizes)


def test_k_anonymity_release_replay_idempotent(spark, tmp_path):
    """Micro-batches replayed with the same batch_id (foreachBatch retry
    after a fully-successful first attempt -- the hard case for
    snapshot-state sinks) must not double-release, lose, or re-quarantine
    rows: every piece of state is an idempotent per-batch directory."""
    from aws_glue_cdc_metrics_job_spark.streaming.jobs import (
        _k_anonymity_apply,
        k_anonymity_quarantine,
    )

    intake, rel = str(tmp_path / "intake"), str(tmp_path / "released")
    apply_fn = _k_anonymity_apply(spark, intake, rel, ["lang"], "doc_id", 2)
    SCHEMA = "doc_id long, lang string"
    b0 = spark.createDataFrame([(1, "en"), (2, "en"), (3, "fr")], SCHEMA)
    b1 = spark.createDataFrame([(4, "fr")], SCHEMA)

    apply_fn(b0, 0)
    apply_fn(b0, 0)  # retry of batch 0 after full success
    apply_fn(b1, 1)  # fr healed: 3 (waiting) + 4 release together
    apply_fn(b1, 1)  # retry of batch 1 after full success

    out = sorted(r["doc_id"] for r in spark.read.parquet(rel).collect())
    assert out == [1, 2, 3, 4]  # each row exactly once, none lost
    assert k_anonymity_quarantine(spark, intake, rel).count() == 0


def test_k_anonymity_sink_end_to_end(spark, tmp_path):
    from aws_glue_cdc_metrics_job_spark.streaming import jobs as S2

    SCHEMA = "doc_id long, lang string"
    src = str(tmp_path / "kanon_in")
    spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "fr")], SCHEMA
    ).write.mode("append").parquet(src)
    stream = S2.read_event_stream(spark, src, SCHEMA)
    q = S2.k_anonymity_release_sink(
        stream,
        spark,
        str(tmp_path / "intake"),
        str(tmp_path / "released"),
        checkpoint=str(tmp_path / "ckpt_ka"),
        quasi_cols=["lang"],
        k=2,
    )
    q.awaitTermination(120)
    out = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "released")).collect()}
    assert out == {1, 2}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        S2.k_anonymity_release_sink(
            stream, spark, "x", "y", checkpoint="z", quasi_cols=["lang"], k=1
        )


def test_k_anonymity_compact_preserves_decisions(spark, tmp_path):
    """Intake compaction (the maintenance job bounding per-batch probe
    cost) drops only already-released rows, leaves the quarantine view
    bit-identical, and later release decisions match an uncompacted twin
    (ADVICE r4: O(total history) probe growth)."""
    from aws_glue_cdc_metrics_job_spark.streaming.jobs import (
        _k_anonymity_apply,
        k_anonymity_compact,
        k_anonymity_quarantine,
    )

    SCHEMA = "doc_id long, lang string, source string"
    b0 = [(1, "en", "a"), (2, "en", "a"), (3, "fr", "b"), (4, "fr", "b"), (5, "fr", "b")]
    b1 = [(6, "en", "a"), (7, "fr", "b"), (8, "de", "c")]
    b2 = [(9, "de", "c"), (10, "de", "c"), (11, "fr", "b")]

    def run(base, compact_after_b1):
        intake, rel = str(base / "intake"), str(base / "released")
        apply_fn = _k_anonymity_apply(spark, intake, rel, ["lang", "source"], "doc_id", 3)
        apply_fn(spark.createDataFrame(b0, SCHEMA), 0)
        apply_fn(spark.createDataFrame(b1, SCHEMA), 1)
        if compact_after_b1:
            held_before = {
                r["doc_id"]
                for r in k_anonymity_quarantine(spark, intake, rel).collect()
            }
            # batches <= 0 are final; batch 1 stays replayable
            dropped = k_anonymity_compact(
                spark, intake, rel, "doc_id", up_to_batch_id=0
            )
            assert dropped == 3  # batch-0 released fr/b rows 3,4,5
            held_after = {
                r["doc_id"]
                for r in k_anonymity_quarantine(spark, intake, rel).collect()
            }
            assert held_after == held_before
            # replay of batch 1 (the still-replayable frontier) after
            # compaction stays idempotent
            apply_fn(spark.createDataFrame(b1, SCHEMA), 1)
        apply_fn(spark.createDataFrame(b2, SCHEMA), 2)
        released = {r["doc_id"] for r in spark.read.parquet(rel).collect()}
        held = {r["doc_id"] for r in k_anonymity_quarantine(spark, intake, rel).collect()}
        return released, held

    plain = run(tmp_path / "plain", compact_after_b1=False)
    compacted = run(tmp_path / "compacted", compact_after_b1=True)
    assert compacted == plain
    # de/c healed at batch 2 (1 waiting + 2 new = 3); everything released
    assert compacted[0] == {1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11}
    assert compacted[1] == set()


def test_bloom_prune_sink_matches_batch(spark, tmp_path):
    """Stream == batch for the Bloom membership gate: the sink's surviving
    rows equal bloom_semi_join == the plain semi-join on the full input,
    across micro-batches, and a round-tripped saved filter probes
    identically."""
    EV = "event_id long, user_id long"
    dim = spark.createDataFrame([(u,) for u in (2, 3, 5, 8)], "c long")
    src = str(tmp_path / "bloom_in")
    spark.createDataFrame([(1, 1), (2, 2), (3, 3)], EV).write.mode("append").parquet(src)
    spark.createDataFrame([(4, 5), (5, 6), (6, 8)], EV).write.mode("append").parquet(src)

    cached_before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    stream = S.read_event_stream(spark, src, EV)
    out = str(tmp_path / "bloom_out")
    q = S.bloom_prune_sink(
        stream, dim, out, checkpoint=str(tmp_path / "ckpt_bloom"),
        fact_key="user_id", dim_key="c", num_bits=1 << 10,
    )
    q.awaitTermination(120)

    got = {r["event_id"] for r in spark.read.parquet(out).collect()}
    assert got == {2, 3, 4, 6}

    # lifecycle: the termination listener released the cached words/keys
    # frames -- nothing the sink persisted may outlive its query.
    import time

    deadline = time.time() + 30  # listener bus delivery is async
    while time.time() < deadline:
        if spark.sparkContext._jsc.sc().getPersistentRDDs().size() <= cached_before:
            break
        time.sleep(0.5)
    leftovers = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    assert leftovers <= cached_before, (
        f"bloom_prune_sink left {leftovers - cached_before} frames cached"
    )

    from aws_glue_cdc_metrics_job_spark.operators.bloom import (
        bloom_load, bloom_save, bloom_semi_join, bloom_words, might_contain,
    )

    full = spark.read.parquet(src)
    batch = {r["event_id"] for r in bloom_semi_join(full, dim, "user_id", "c").collect()}
    assert batch == got

    # save/load round trip probes identically to the in-memory words
    words = bloom_words(dim, "c", num_bits=1 << 10)
    bloom_save(words, str(tmp_path / "bf.parquet"))
    loaded = bloom_load(spark, str(tmp_path / "bf.parquet"))
    assert loaded.collect()[0]["BF"] == words.collect()[0]["BF"]


def test_stream_stream_attribution_matches_batch(spark, tmp_path):
    """True watermarked stream-stream inner join == the batch interval
    join over the same data: only conversions within the window attribute,
    multi-view keys fan out exactly as in batch."""
    import datetime as dtm

    EV = "user_id long, ts timestamp"
    base = dtm.datetime(2024, 1, 1, 12, 0, 0)

    def _t(mins):
        return base + dtm.timedelta(minutes=mins)

    views = [(1, _t(0)), (1, _t(30)), (2, _t(0)), (3, _t(0))]
    convs = [(1, _t(45)), (2, _t(90)), (3, _t(20)), (9, _t(5))]
    vsrc, csrc = str(tmp_path / "views"), str(tmp_path / "convs")
    spark.createDataFrame(views, EV).write.parquet(vsrc)
    spark.createDataFrame(convs, EV).write.parquet(csrc)

    joined = S.stream_stream_attribution(
        S.read_event_stream(spark, vsrc, EV),
        S.read_event_stream(spark, csrc, EV),
        within_seconds=3600,
    )
    out = str(tmp_path / "attr_out")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt_attr"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["KEY"], r["VIEW_TS"], r["CONV_TS"], r["LAG_MICROS"])
        for r in spark.read.parquet(out).collect()
    }
    # batch oracle: same interval join in plain DataFrame land
    v = spark.createDataFrame(views, EV).alias("v")
    c = spark.createDataFrame(convs, EV).alias("c")
    from pyspark.sql import functions as FF

    cond = (
        (FF.col("v.user_id") == FF.col("c.user_id"))
        & (FF.col("c.ts") >= FF.col("v.ts"))
        & (FF.col("c.ts") <= FF.col("v.ts") + FF.expr("INTERVAL 3600 SECONDS"))
    )
    want = {
        (r["user_id"], r["vts"], r["cts"], (r["cts"] - r["vts"]).total_seconds() * 1_000_000)
        for r in v.join(c, cond)
        .select(FF.col("v.user_id"), FF.col("v.ts").alias("vts"), FF.col("c.ts").alias("cts"))
        .collect()
    }
    assert {(k, vt, ct, lm) for k, vt, ct, lm in got} == want
    # user 1: both views within the hour of the conversion -> 2 rows;
    # user 2's conversion is outside; user 9 never viewed
    keys = sorted(k for k, *_ in got)
    assert keys == [1, 1, 3]


def test_k_anonymity_compact_interleaved_lifecycle(spark, tmp_path):
    """The gate's long-run cost bound, pinned (VERDICT r5 item 5): run N
    batches, compact, run N more -- release decisions are bit-identical
    to an uncompacted twin, the derived quarantine is unchanged, and the
    intake zone after compaction holds ONLY the pending rows (the probe
    reads |quarantine|, not O(total history))."""
    from aws_glue_cdc_metrics_job_spark.streaming.jobs import (
        _k_anonymity_apply,
        k_anonymity_compact,
        k_anonymity_quarantine,
    )

    SCHEMA = "doc_id long, lang string"
    # same 4-batch tape for both runs: en heals at b1, de heals at b3,
    # zz never heals (stays quarantined across the compaction)
    TAPE = [
        [(1, "en"), (2, "zz")],
        [(3, "en"), (4, "de")],
        [(5, "de"), (6, "fr")],          # de: 4 waiting + 5 -> k=2 releases
        [(7, "fr"), (8, "en")],          # fr heals; en rides public group
    ]

    def run(root, compact_after=None):
        intake, rel = str(root / "intake"), str(root / "released")
        apply_fn = _k_anonymity_apply(spark, intake, rel, ["lang"], "doc_id", 2)
        released_at = []
        for b, rows in enumerate(TAPE):
            apply_fn(spark.createDataFrame(rows, SCHEMA), b)
            released_at.append(
                frozenset(r["doc_id"] for r in spark.read.parquet(rel).collect())
            )
            if compact_after is not None and b == compact_after:
                # stream stopped between micro-batches; only batches that
                # can no longer replay (<= last committed - 1) compact
                dropped = k_anonymity_compact(
                    spark, intake, rel, up_to_batch_id=b - 1
                )
                assert dropped > 0  # b1's released rows left intake
                # the probe's working set is now quarantine-sized
                pend = k_anonymity_quarantine(spark, intake, rel)
                assert (
                    spark.read.parquet(intake).count()
                    == pend.count() + spark.read.parquet(rel).filter(
                        F.col("batch_id") > b - 1
                    ).count()
                )
        return released_at, frozenset(
            r["doc_id"] for r in k_anonymity_quarantine(spark, intake, rel).collect()
        )

    plain_rel, plain_q = run(tmp_path / "plain")
    comp_rel, comp_q = run(tmp_path / "compacted", compact_after=2)
    assert comp_rel == plain_rel  # per-batch release decisions unchanged
    assert comp_q == plain_q == frozenset({2})  # zz still quarantined
    # fully-released batch dirs physically disappeared from intake
    import os

    dirs = {
        d for d in os.listdir(tmp_path / "compacted" / "intake")
        if d.startswith("batch_id=")
    }
    assert "batch_id=0" not in dirs or spark.read.parquet(
        str(tmp_path / "compacted" / "intake" / "batch_id=0")
    ).count() > 0


def test_span_scrub_sink_matches_batch_operator(spark, tmp_path):
    import time as _time

    DOC_SCHEMA = "doc_id long, text string"
    src = str(tmp_path / "scrub_in")
    boiler = "b1 b2 b3 b4"
    # batch 1 introduces the boilerplate (admitted verbatim -- nothing to
    # match yet) plus a clean doc. ONE file per delivery +
    # maxFilesPerTrigger=1 below forces two separate micro-batches (the
    # stepwise semantics under test); the mtime gap keeps file order.
    spark.createDataFrame(
        [(1, f"{boiler} novel tail one"), (2, "totally unique words here")],
        DOC_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(src)
    _time.sleep(1.1)
    # batch 2: doc 3 repeats the indexed boilerplate, doc 4 is clean
    spark.createDataFrame(
        [(3, f"fresh lead {boiler} fresh tail"), (4, "still clean content")],
        DOC_SCHEMA,
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    corpus, index = str(tmp_path / "scrub_corpus"), str(tmp_path / "wh_index")
    q = S.span_scrub_sink(
        stream, spark, corpus, index, checkpoint=str(tmp_path / "ckpt_scrub"), k=4
    )
    q.awaitTermination(120)

    got = {
        r["doc_id"]: r["CLEAN_TEXT"] for r in spark.read.parquet(corpus).collect()
    }
    # batch-1 docs pass through untouched (index was empty, no intra-batch dup)
    assert got[1] == f"{boiler} novel tail one"
    assert got[2] == "totally unique words here"
    # batch-2 doc 3 had the indexed boilerplate cut; doc 4 untouched
    assert got[3] == "fresh lead fresh tail"
    assert got[4] == "still clean content"
    # the index holds batch hashes from BOTH batches (original text, so
    # boilerplate stays matchable)
    from aws_glue_cdc_metrics_job_spark.operators.dedup import substring_hash_index

    all_docs = spark.read.parquet(src)
    expect_ix = {r["WHASH"] for r in substring_hash_index(all_docs, k=4).collect()}
    assert {r["WHASH"] for r in spark.read.parquet(index).collect()} == expect_ix


def test_span_scrub_replay_idempotent(spark, tmp_path):
    """A foreachBatch retry with the same batch_id must not scrub against
    the batch's own index delta (which would cut every doc to nothing)."""
    from aws_glue_cdc_metrics_job_spark.streaming.jobs import _span_scrub_apply

    corpus, index = str(tmp_path / "scrub_corpus"), str(tmp_path / "wh_index")
    apply_fn = _span_scrub_apply(spark, corpus, index, k=4)
    DOC_SCHEMA = "doc_id long, text string"
    b0 = spark.createDataFrame(
        [(1, "b1 b2 b3 b4 novel tail one"), (2, "totally unique words here")],
        DOC_SCHEMA,
    )
    apply_fn(b0, 0)
    first = sorted(
        (r["doc_id"], r["CLEAN_TEXT"]) for r in spark.read.parquet(corpus).collect()
    )
    apply_fn(b0, 0)  # simulated retry
    second = sorted(
        (r["doc_id"], r["CLEAN_TEXT"]) for r in spark.read.parquet(corpus).collect()
    )
    assert first == second
    assert first[0][1] == "b1 b2 b3 b4 novel tail one"  # NOT scrubbed to nothing


def test_versioned_commit_sink_stream_and_time_travel(spark, tmp_path):
    """Each micro-batch becomes one table version; earlier versions stay
    readable after later appends (streaming time travel)."""
    from aws_glue_cdc_metrics_job_spark.sources.parquet_io import (
        read_version,
        table_versions,
    )

    SCHEMA = "k long, v string"
    src = str(tmp_path / "vc_in")
    spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA).write.mode("append").parquet(src)
    spark.createDataFrame([(3, "c")], SCHEMA).write.mode("append").parquet(src)

    stream = S.read_event_stream(spark, src, SCHEMA)
    table = str(tmp_path / "vc_table")
    q = S.versioned_commit_sink(stream, table, checkpoint=str(tmp_path / "ckpt_vc"))
    q.awaitTermination(120)

    versions = table_versions(table)
    assert versions  # at least one committed version
    # the latest version sees every row, exactly once
    latest = sorted(r["k"] for r in read_version(spark, table).collect())
    assert latest == [1, 2, 3]
    # every committed version is a prefix-consistent snapshot
    seen_counts = [read_version(spark, table, v).count() for v in versions]
    assert seen_counts == sorted(seen_counts)


def test_versioned_commit_replay_idempotent(spark, tmp_path):
    """foreachBatch retries with the same batch_id must commit nothing
    twice -- the batch_id handshake in versioned_write."""
    from aws_glue_cdc_metrics_job_spark.sources.parquet_io import (
        read_version,
        table_versions,
    )
    from aws_glue_cdc_metrics_job_spark.streaming.jobs import _versioned_commit_apply

    table = str(tmp_path / "vc_table2")
    apply_fn = _versioned_commit_apply(table)
    SCHEMA = "k long, v string"
    b0 = spark.createDataFrame([(1, "a")], SCHEMA)
    b1 = spark.createDataFrame([(2, "b")], SCHEMA)

    apply_fn(b0, 0)
    apply_fn(b0, 0)  # retry of batch 0
    apply_fn(b1, 1)
    apply_fn(b1, 1)  # retry of batch 1
    apply_fn(spark.createDataFrame([], SCHEMA), 2)  # empty batch: no commit

    assert table_versions(table) == [1, 2]
    assert sorted(r["k"] for r in read_version(spark, table).collect()) == [1, 2]
    assert sorted(r["k"] for r in read_version(spark, table, 1).collect()) == [1]


def test_anomaly_alert_key_collect_capped(spark, tmp_path):
    """The per-batch distinct-key collect is bounded (VERDICT r7): a batch
    keyed on something row-like must raise, not grow the driver."""
    import pytest as _pytest

    from aws_glue_cdc_metrics_job_spark.streaming.jobs import _anomaly_alert_apply

    series = str(tmp_path / "series_cap")
    alerts = str(tmp_path / "alerts_cap")
    apply_fn = _anomaly_alert_apply(
        spark, series, alerts, ["metric"], "ts", "value", 5, 2.0, max_keys=10
    )
    wide = spark.range(25).selectExpr(
        "concat('m', id) AS metric", "date_add(date'2024-01-01', 0) AS ts", "1.0 AS value"
    )
    with _pytest.raises(ValueError, match="distinct alert keys"):
        apply_fn(wide, 0)
    # under the cap: same shape, 5 keys, applies cleanly
    ok = spark.range(5).selectExpr(
        "concat('m', id) AS metric", "date_add(date'2024-01-01', 0) AS ts", "1.0 AS value"
    )
    apply_fn(ok, 1)
    assert spark.read.parquet(series).count() == 5
