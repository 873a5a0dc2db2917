"""Graded query catalog: name -> (spark, sf_dir) -> DataFrame, plus the
matching DuckDB oracle SQL (driver contract, __spark_entry__.py).

Every query here is one SURVEY.md §2 operator/mart made observable. Queries
without an oracle entry (genuinely non-SQL ops, e.g. MinHash-LSH) get the
driver's weaker rows-only check and say so in their docstring."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query-defining module (idempotent)."""
    from . import queries_analytics, queries_marts, queries_ops, queries_pipeline  # noqa: F401
