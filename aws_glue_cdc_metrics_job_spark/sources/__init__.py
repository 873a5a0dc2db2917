from .parquet_io import MedallionLayout, read_parquet, read_table, write_parquet

__all__ = ["MedallionLayout", "read_parquet", "read_table", "write_parquet"]
