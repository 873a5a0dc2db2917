"""Multimodal plumbing: binary payloads, typed metadata, mapInPandas stage."""

import pytest

from aws_glue_cdc_metrics_job_spark.operators import multimodal


@pytest.fixture(scope="module")
def payloads(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "byte payload éé")],
        "doc_id long, text string",
    )
    return multimodal.as_binary_column(df)


def test_binary_column_type(payloads):
    assert dict(payloads.dtypes)["payload"] == "binary"


def test_payload_meta(payloads):
    got = {r["doc_id"]: r["payload_meta"] for r in multimodal.with_payload_meta(payloads).collect()}
    assert got[1]["n_bytes"] == 11
    assert got[2]["n_bytes"] == 0
    assert got[3]["n_bytes"] == len("byte payload éé".encode())
    assert got[1]["media_type"] == "application/octet-stream"
    assert len(got[1]["md5"]) == 32


def test_map_in_pandas_features_deterministic(payloads):
    a = sorted(multimodal.map_in_pandas_features(payloads).collect())
    b = sorted(multimodal.map_in_pandas_features(payloads, batch_partitions=2).collect())
    assert a == b
    by_id = {r["doc_id"]: r for r in a}
    assert by_id[1]["n_bytes"] == 11 and by_id[1]["feat_dim"] == 64
    assert by_id[2]["feat_mean"] == 0.0


def test_decode_stub_matches_python(payloads):
    feats = {r["doc_id"]: r["feat_mean"] for r in multimodal.map_in_pandas_features(payloads).collect()}
    raw = b"hello world"
    assert feats[1] == sum(raw[:64]) / min(len(raw), 64)


def test_decode_real_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        multimodal.decode_real(b"x", "image/png")
