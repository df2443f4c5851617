"""Analytical operator surface (SURVEY.md §2.2 engine surface + §2.3
extensions). Each module registers queries in its own QUERIES/ORACLE
dicts via the @query decorator; __spark_entry__ merges them all."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ._oracleutil import materialize_multiref_ctes

QueryFn = Callable[[SparkSession, str], DataFrame]


def make_registry():
    """Per-module (QUERIES, ORACLE, decorator) triple.

    A query registered with sql=... gets the full duckdb-oracle
    hash-compare; sql=None marks a genuinely non-SQL-expressible op
    (LSH banding, iterative algorithms) → driver's rows-only check.

    Every registered oracle passes through materialize_multiref_ctes
    so a multi-referenced CTE chain can never inline exponentially in
    DuckDB (the round-6 k-core ~88 GB lesson, applied uniformly).
    Recursive CTEs are left untouched — MATERIALIZED is not valid on
    a self-referencing CTE and DuckDB already evaluates them once.
    """
    queries: dict[str, QueryFn] = {}
    oracle: dict[str, str] = {}

    def query(name: str, sql: str | None = None):
        def deco(fn: QueryFn) -> QueryFn:
            queries[name] = fn
            if sql is not None:
                if "RECURSIVE" not in sql.upper():
                    sql_hardened = materialize_multiref_ctes(sql)
                else:
                    sql_hardened = sql
                oracle[name] = sql_hardened
            return fn
        return deco

    return queries, oracle, query
