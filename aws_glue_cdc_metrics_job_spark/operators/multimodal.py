"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side plumbing is real and tested: binary payload columns, typed
metadata structs, Arrow-batched ``mapInPandas`` decode/feature stages with
explicit output schemas, and partition-count control so one executor batch
holds a bounded number of payloads. The actual media decoding is stubbed
(image/audio libs are not in this container): ``decode_stub`` produces
deterministic fake features; ``decode_real`` raises NotImplementedError and
documents the intended integration point.

Scale notes: binary payloads must never pass through a wide shuffle --
extract features first (narrow map stage), then shuffle the small feature
rows. ``with_payload_meta`` is scan-stage only; ``map_in_pandas_features``
is a mapPartitions-shaped stage with no shuffle at all.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAYLOAD_META_SCHEMA = T.StructType(
    [
        T.StructField("n_bytes", T.LongType()),
        T.StructField("md5", T.StringType()),
        T.StructField("media_type", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feat_mean", T.DoubleType()),
        T.StructField("feat_dim", T.IntegerType()),
    ]
)


def as_binary_column(df: DataFrame, text_col: str = "text", out_col: str = "payload") -> DataFrame:
    """Treat a column as an opaque binary payload (stand-in for real media
    bytes; utf-8 encodes text). Typed, nullable, columnar."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


def with_payload_meta(df: DataFrame, payload_col: str = "payload", media_type: str = "application/octet-stream") -> DataFrame:
    """Attach a typed metadata struct computed JVM-side (no decode needed)."""
    return df.withColumn(
        "payload_meta",
        F.struct(
            F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
            F.md5(F.col(payload_col)).alias("md5"),
            F.lit(media_type).alias("media_type"),
        ),
    )


def decode_stub(payload: bytes) -> dict:
    """Deterministic fake decode: derives a small feature dict from the raw
    bytes. Replace with a real decoder (PIL / torchaudio / pyav) when the
    libraries are available."""
    n = len(payload)
    mean = (sum(payload[:64]) / min(n, 64)) if n else 0.0
    return {"n_bytes": n, "feat_mean": float(mean), "feat_dim": 64}


def decode_real(payload: bytes, media_type: str) -> dict:
    """Real media decode behind a try-import: images via PIL when the
    library is installed (same feature-dict contract as decode_stub:
    n_bytes + a mean intensity + a dimension), NotImplementedError with
    the missing dependency named otherwise. The sandbox ships no media
    libraries, so only the stub path is exercised here -- COVERAGE.md
    claims 'plumbing only' accordingly -- but the Spark-side schema,
    partitioning, and Arrow batch shape around either decoder are real
    and tested."""
    if media_type.startswith("image/"):
        try:
            from PIL import Image
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "image decode requires PIL (pillow), not installed in this "
                "environment; map_in_pandas_features(decoder=decode_stub) is "
                "the available path"
            ) from exc
        import io

        img = Image.open(io.BytesIO(payload)).convert("L")
        px = list(img.getdata())
        return {
            "n_bytes": len(payload),
            "feat_mean": (sum(px) / len(px)) if px else 0.0,
            "feat_dim": img.width * img.height,
        }
    raise NotImplementedError(
        f"no decoder wired for media_type={media_type!r}; audio/video need "
        "torchaudio/pyav (absent here)"
    )


def map_in_pandas_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    batch_partitions: int | None = None,
    decoder=decode_stub,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads: the real
    multimodal hot path. Narrow (no shuffle); each pandas batch holds a
    bounded slice of one partition. ``decoder`` is any bytes -> feature
    dict callable with decode_stub's contract; pass
    ``lambda p: decode_real(p, "image/png")`` when the media libraries
    exist."""
    if batch_partitions:
        df = df.repartition(batch_partitions)
    cols = [id_col, payload_col]

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(p if p is not None else b"") for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "feat_mean": [f["feat_mean"] for f in feats],
                    "feat_dim": [f["feat_dim"] for f in feats],
                }
            )

    return df.select(*cols).mapInPandas(extract, FEATURE_SCHEMA)


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_bytes: int = 64,
    every_k: int = 4,
    max_frames: int = 8,
) -> DataFrame:
    """Frame sampling over opaque media payloads: slice the binary into
    fixed-size frames and keep every ``every_k``-th one, at most
    ``max_frames`` per payload -- the video-pipeline "sample k frames per
    clip" stage, with byte-range slicing standing in for container-aware
    keyframe extraction (a real demuxer slots into the same
    explode-of-slices shape; pyav is absent here).

    Entirely JVM-side: frame indices come from sequence() (a generate,
    no join), frames from substring() on the binary column -- per-row
    fan-out is bounded by max_frames, so the explode cannot amplify a
    payload into unbounded rows. No Python, no shuffle; downstream
    per-frame featurization (map_in_pandas_features) sees small frame
    rows instead of whole payloads.

    Returns (id, FRAME_IDX, N_FRAME_BYTES, FRAME_HEX) -- the frame bytes
    rendered as uppercase hex, the portable cross-engine encoding (both
    Spark and DuckDB hex blobs identically, so the operator is
    oracle-checkable end to end)."""
    if frame_bytes <= 0 or every_k <= 0 or max_frames <= 0:
        raise ValueError("frame_bytes, every_k and max_frames must be positive")
    payload = F.col(payload_col)
    n_frames = F.ceil(F.length(payload) / F.lit(frame_bytes)).cast("int")
    last = F.least(n_frames - 1, F.lit(every_k * (max_frames - 1)))
    idxs = F.when(
        n_frames > 0,
        F.sequence(F.lit(0), last, F.lit(every_k)),
    ).otherwise(F.array().cast("array<int>"))
    frame = F.substring(payload, F.col("FRAME_IDX") * frame_bytes + 1, frame_bytes)
    return (
        df.select(F.col(id_col), payload, F.explode(idxs).alias("FRAME_IDX"))
        .select(
            F.col(id_col),
            "FRAME_IDX",
            F.length(frame).cast("long").alias("N_FRAME_BYTES"),
            F.hex(frame).alias("FRAME_HEX"),
        )
    )


def resize_payload(
    df: DataFrame,
    payload_col: str = "payload",
    target_bytes: int = 1024,
    out_col: str = "payload_resized",
) -> DataFrame:
    """Deterministic stand-in for media resizing: truncate the payload to
    ``target_bytes`` (a real image resize -- PIL thumbnail + re-encode --
    slots into the same binary -> binary column contract via
    map_in_pandas_features's decoder hook). JVM-side substring, scan
    stage only; the point at 100 TB is that resize happens BEFORE any
    shuffle so wide payloads never ride an exchange."""
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    return df.withColumn(out_col, F.substring(F.col(payload_col), 1, target_bytes))
