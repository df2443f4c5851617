"""Analytical operator surface (SURVEY.md §2.2 engine surface + §2.3
extensions). Each module registers queries in its own QUERIES/ORACLE
dicts via the @query decorator; __spark_entry__ merges them all."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def make_registry():
    """Per-module (QUERIES, ORACLE, decorator) triple.

    A query registered with sql=... gets the full duckdb-oracle
    hash-compare; sql=None marks a genuinely non-SQL-expressible op
    (LSH banding, iterative algorithms) → driver's rows-only check.
    """
    queries: dict[str, QueryFn] = {}
    oracle: dict[str, str] = {}

    def query(name: str, sql: str | None = None):
        def deco(fn: QueryFn) -> QueryFn:
            queries[name] = fn
            if sql is not None:
                oracle[name] = sql
            return fn
        return deco

    return queries, oracle, query
