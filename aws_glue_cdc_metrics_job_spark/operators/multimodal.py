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
