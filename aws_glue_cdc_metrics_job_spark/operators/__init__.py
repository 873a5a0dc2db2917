from . import (
    cdc,
    dedup,
    incremental,
    multimodal,
    relational,
    sampling,
    similarity,
    temporal,
    text,
)

__all__ = [
    "cdc",
    "dedup",
    "incremental",
    "multimodal",
    "relational",
    "sampling",
    "similarity",
    "temporal",
    "text",
]
