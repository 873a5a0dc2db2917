"""BI-edge helpers: the engine-side counterpart of the reference's
Streamlit dashboard layer (streamlit_app/app.py).

The reference's consumer globs gold parquet into pandas and re-aggregates
there (value_counts / groupby / map / sort_values, SURVEY.md A9/F10/T2/S11).
Here those presentation aggregations run in Spark -- at 100 TB the mart may
be small but the pattern should not depend on it -- and only the final
frame crosses to pandas via Arrow (`to_pandas`), the single sanctioned
pandas round-trip in the engine (SURVEY.md S10)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_mart(spark: SparkSession, path: str) -> DataFrame:
    """Read one gold mart (the marts are flat, partition-pruned parquet --
    the engine's contract with any BI tool, SURVEY.md S11)."""
    return spark.read.parquet(path)


def to_pandas(df: DataFrame):
    """Arrow-batched export at the BI edge (enabled in session.py).
    Keep this at the very end of a plan: everything before it is
    distributed, everything after is driver-local pandas."""
    return df.toPandas()


def distribution(df: DataFrame, col: str, n_col: str = "N") -> DataFrame:
    """pandas ``value_counts`` equivalent (streamlit_app/app.py:58):
    grouped count, largest first, with a deterministic tiebreak."""
    return df.groupBy(col).agg(F.count(F.lit(1)).alias(n_col)).orderBy(
        F.col(n_col).desc(), F.col(col)
    )


def label_flags(df: DataFrame, col: str, mapping: dict, out_col: str | None = None) -> DataFrame:
    """pandas ``Series.map({...})`` equivalent (streamlit_app/app.py:240,334):
    literal-map lookup, unmapped values pass through as NULL."""
    kv = []
    for k, v in mapping.items():
        kv += [F.lit(k), F.lit(v)]
    return df.withColumn(out_col or col, F.element_at(F.create_map(*kv), F.col(col)))


def top_ranked(df: DataFrame, rank_col: str, k: int = 1) -> DataFrame:
    """Presentation top-k by a precomputed rank column
    (streamlit_app/app.py:290 REVENUE_RANK == 1)."""
    return df.filter(F.col(rank_col) <= k)
