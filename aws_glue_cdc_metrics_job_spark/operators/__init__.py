from . import cdc, dedup, incremental, multimodal, relational, similarity, temporal, text

__all__ = [
    "cdc",
    "dedup",
    "incremental",
    "multimodal",
    "relational",
    "similarity",
    "temporal",
    "text",
]
