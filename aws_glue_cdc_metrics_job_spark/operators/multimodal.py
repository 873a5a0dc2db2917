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


def decode_real(payload: bytes, media_type: str):  # pragma: no cover - stub
    raise NotImplementedError(
        "media decoding requires PIL/torchaudio/pyav, not present in this "
        "environment; wire the library call here and keep the mapInPandas "
        "plumbing in map_in_pandas_features unchanged"
    )


def map_in_pandas_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    batch_partitions: int | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads: the real
    multimodal hot path. Narrow (no shuffle); each pandas batch holds a
    bounded slice of one partition. Uses decode_stub -- swap in decode_real
    for actual media."""
    if batch_partitions:
        df = df.repartition(batch_partitions)
    cols = [id_col, payload_col]

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_stub(p if p is not None else b"") for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "feat_mean": [f["feat_mean"] for f in feats],
                    "feat_dim": [f["feat_dim"] for f in feats],
                }
            )

    return df.select(*cols).mapInPandas(extract, FEATURE_SCHEMA)
