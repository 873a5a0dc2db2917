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


class TestPngCodec:
    def test_roundtrip_exact(self):
        from aws_glue_cdc_metrics_job_spark.operators.multimodal import (
            _decode_png_gray,
            encode_png_gray,
        )

        px = bytes(range(64))
        png = encode_png_gray(px, 8, 8)
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        assert _decode_png_gray(png) == (8, 8, px)
        with pytest.raises(ValueError):
            encode_png_gray(px, 8, 7)

    def test_all_filter_types_reconstruct(self):
        """Decoder must unfilter every PNG filter type (0 none, 1 sub,
        2 up, 3 average, 4 Paeth) -- hand-filter a known image per spec
        and assert exact reconstruction."""
        import struct
        import zlib

        from aws_glue_cdc_metrics_job_spark.operators.multimodal import (
            _decode_png_gray,
        )

        w = 5
        rows = [bytes([(r * 37 + c * 11) % 256 for c in range(w)]) for r in range(5)]

        def paeth(a, b, c):
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

        raw = bytearray()
        prev = bytes(w)
        for ft, row in enumerate(rows):  # one row per filter type, then 0
            ft = ft % 5
            raw.append(ft)
            for i in range(w):
                a = row[i - 1] if i else 0
                b = prev[i]
                c = prev[i - 1] if i else 0
                pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2, 4: paeth(a, b, c)}[ft]
                raw.append((row[i] - pred) & 0xFF)
            prev = row

        def chunk(tag, body):
            return (
                struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
            )

        png = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, 5, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )
        assert _decode_png_gray(png) == (w, 5, b"".join(rows))

    def test_decode_real_png_without_pil(self):
        """decode_real must decode the built-in PNG subset in THIS
        environment (no PIL installed) -- NotImplementedError unreachable
        for these payloads."""
        from aws_glue_cdc_metrics_job_spark.operators.multimodal import (
            decode_real,
            encode_png_gray,
        )

        px = bytes([10] * 32 + [20] * 32)
        out = decode_real(encode_png_gray(px, 8, 8), "image/png")
        assert out["feat_dim"] == 64 and out["feat_mean"] == 15.0
        with pytest.raises(NotImplementedError):
            decode_real(b"\xffnot-an-image", "image/jpeg")
        with pytest.raises(NotImplementedError):
            decode_real(b"RIFF....", "audio/wav")

    def test_decode_real_pil_parity(self):
        """When PIL IS installed, its decode of our PNGs must agree with
        the built-in decoder (skipped where PIL is absent)."""
        pytest.importorskip("PIL")
        from aws_glue_cdc_metrics_job_spark.operators.multimodal import (
            _decode_png_gray,
            decode_real,
            encode_png_gray,
        )

        px = bytes((i * 7) % 256 for i in range(64))
        png = encode_png_gray(px, 8, 8)
        out = decode_real(png, "image/png")
        _, _, raw = _decode_png_gray(png)
        assert out["feat_mean"] == sum(raw) / 64 and out["feat_dim"] == 64

    def test_synth_payloads_spark_roundtrip(self, spark):
        from aws_glue_cdc_metrics_job_spark.operators.multimodal import (
            _decode_png_gray,
            synth_png_payloads,
        )

        df = spark.createDataFrame(
            [(1, "hello"), (2, ""), (3, "x" * 200)], "doc_id long, text string"
        )
        got = {r["doc_id"]: bytes(r["payload"]) for r in synth_png_payloads(df).collect()}
        w, h, px = _decode_png_gray(got[1])
        assert (w, h) == (8, 8) and px == (b"hello" + b"\x00" * 64)[:64]
        assert _decode_png_gray(got[2])[2] == b"\x00" * 64
        assert _decode_png_gray(got[3])[2] == b"x" * 64
