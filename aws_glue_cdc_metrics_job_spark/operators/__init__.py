from . import cdc, dedup, incremental, multimodal, relational, similarity, text

__all__ = ["cdc", "dedup", "incremental", "multimodal", "relational", "similarity", "text"]
