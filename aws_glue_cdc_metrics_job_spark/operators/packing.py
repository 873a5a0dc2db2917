"""Sequence packing: assign documents to fixed-token-budget packs (context
windows) for training -- the step between tokenization and batch assembly.

Exact bin packing is NP-hard and inherently sequential, so the scalable
shape is shard-then-pack: a deterministic hash shard bounds each packing
problem, and packing runs independently per shard (embarrassingly parallel,
one shuffle). Within a shard, docs are processed in deterministic key order
with greedy next-fit -- the standard streaming heuristic (>=50% utilization
guaranteed when docs fit the budget; far better in practice).

The per-shard pass is a pandas loop inside ``applyInPandas`` -- the
sanctioned Arrow-batched escape hatch for genuinely sequential logic.
Everything around it (sharding, ordering, the output contract) is plain
DataFrame ops.

Pack ids are globally unique and reproducible: ``shard * 2^40 + local``,
independent of cluster size or input partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SHARD_SHIFT = 1 << 40  # local pack counter space per shard


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    len_col: str = "N_TOKENS",
    num_shards: int = 64,
    seed: str = "0",
) -> DataFrame:
    """Assign each row to a pack so that each pack's total ``len_col`` stays
    within ``budget``. Returns (id_col, len_col, PACK_ID, PACK_POS).

    - A document longer than ``budget`` gets a pack of its own (callers
      truncate/split upstream; packing never drops data).
    - Deterministic: shard = crc32(key|seed) % num_shards, in-shard order =
      key order, so output is identical at any partitioning/cluster size.
    - Scale: one shuffle (repartition on shard); each shard packs
      independently. num_shards bounds per-task memory: at 100 TB raise it
      so a shard's (id, len) pairs -- ~16 bytes/doc -- fit comfortably.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    shard = (
        F.crc32(F.concat_ws("|", F.col(id_col).cast("string"), F.lit(seed))) % num_shards
    ).cast("int")
    slim = df.select(
        F.col(id_col),
        F.col(len_col).cast("long").alias(len_col),
        shard.alias("__shard"),
    )

    out_schema = f"{id_col} long, {len_col} long, PACK_ID long, PACK_POS long"

    def pack_one_shard(pdf):
        import pandas as pd

        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        shard_id = int(pdf["__shard"].iloc[0])
        pack_ids, pack_pos = [], []
        local, used, pos = 0, 0, 0
        for ln in pdf[len_col]:
            ln = int(ln)
            if used > 0 and used + ln > budget:
                local += 1
                used, pos = 0, 0
            pack_ids.append(shard_id * _SHARD_SHIFT + local)
            pack_pos.append(pos)
            used += ln
            pos += 1
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                len_col: pdf[len_col],
                "PACK_ID": pack_ids,
                "PACK_POS": pack_pos,
            }
        )

    return (
        slim.repartition(num_shards, "__shard")
        .groupBy("__shard")
        .applyInPandas(pack_one_shard, schema=out_schema)
    )


def pack_summary(packed: DataFrame, len_col: str = "N_TOKENS") -> DataFrame:
    """Per-pack rollup: document count and token total -- the frame a batch
    assembler consumes, and the one tests assert the budget invariant on."""
    return packed.groupBy("PACK_ID").agg(
        F.count("*").cast("long").alias("N_DOCS"),
        F.sum(len_col).cast("long").alias("TOTAL_TOKENS"),
    )
