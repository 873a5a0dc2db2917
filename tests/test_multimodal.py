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


def test_decode_real_behavior_matches_environment():
    # Without PIL: a NAMED NotImplementedError (honest env limitation).
    # With PIL (if the sandbox ever gains it): decodes a real 1x1 PNG and
    # honors the decode_stub feature contract.
    try:
        import PIL  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    if not have_pil:
        with pytest.raises(NotImplementedError, match="PIL"):
            multimodal.decode_real(b"x", "image/png")
    else:
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("L", (2, 2), color=128).save(buf, format="PNG")
        feats = multimodal.decode_real(buf.getvalue(), "image/png")
        assert feats["feat_dim"] == 4 and feats["feat_mean"] == 128.0
    # non-image media always raises, naming the missing dependency
    with pytest.raises(NotImplementedError):
        multimodal.decode_real(b"x", "audio/wav")


def test_map_in_pandas_features_custom_decoder(spark):
    # the decoder slot is real plumbing: any bytes -> dict callable works
    df = spark.createDataFrame([(1, b"abc")], "doc_id long, payload binary")
    rows = multimodal.map_in_pandas_features(
        df, decoder=lambda p: {"n_bytes": len(p), "feat_mean": 7.0, "feat_dim": 1}
    ).collect()
    assert rows[0]["feat_mean"] == 7.0 and rows[0]["n_bytes"] == 3


def test_frame_sample_slicing_and_bounds(spark):
    # 300 bytes @ frame_bytes=100 -> frames 0,1,2 (last short); every_k=2
    # keeps 0 and 2; max_frames=8 doesn't bind.
    payload = bytes(range(256)) + bytes(44)
    df = spark.createDataFrame([(1, payload), (2, b""), (3, None)],
                               "doc_id long, payload binary")
    rows = multimodal.frame_sample(
        df, frame_bytes=100, every_k=2, max_frames=8
    ).orderBy("doc_id", "FRAME_IDX").collect()
    # empty and NULL payloads produce no frames
    assert [r["doc_id"] for r in rows] == [1, 1]
    assert [r["FRAME_IDX"] for r in rows] == [0, 2]
    assert [r["N_FRAME_BYTES"] for r in rows] == [100, 100]
    assert rows[0]["FRAME_HEX"] == payload[:100].hex().upper()
    assert rows[1]["FRAME_HEX"] == payload[200:300].hex().upper()


def test_frame_sample_max_frames_caps_fanout(spark):
    df = spark.createDataFrame([(1, bytes(1000))], "doc_id long, payload binary")
    rows = multimodal.frame_sample(
        df, frame_bytes=10, every_k=3, max_frames=4
    ).collect()
    assert sorted(r["FRAME_IDX"] for r in rows) == [0, 3, 6, 9]
    with pytest.raises(ValueError):
        multimodal.frame_sample(df, frame_bytes=0)


def test_resize_payload_truncates(spark):
    df = spark.createDataFrame([(1, b"abcdef"), (2, b"xy")],
                               "doc_id long, payload binary")
    rows = {r["doc_id"]: r["payload_resized"]
            for r in multimodal.resize_payload(df, target_bytes=4).collect()}
    assert bytes(rows[1]) == b"abcd" and bytes(rows[2]) == b"xy"
    with pytest.raises(ValueError):
        multimodal.resize_payload(df, target_bytes=-1)


def test_frame_sample_reconstructs_payload(spark):
    """every_k=1 with a generous cap is a lossless byte partition: unhexing
    and concatenating the frames reproduces the payload exactly."""
    payloads = [bytes(range(256)) * 3 + b"tail", b"x" * 63, b"y" * 64, b"z" * 65]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "doc_id long, payload binary"
    )
    rows = multimodal.frame_sample(
        df, frame_bytes=64, every_k=1, max_frames=1000
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["FRAME_IDX"], r["FRAME_HEX"]))
    for i, p in enumerate(payloads):
        joined = b"".join(
            bytes.fromhex(hx) for _, hx in sorted(by_doc[i])
        )
        assert joined == p, f"doc {i} reconstruction mismatch"
