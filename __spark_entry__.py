"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship query (TPC-H Q1 shape) on sf0.001.
queries()       — every implemented operator from SURVEY.md §2
                  (relational surface + LLM-pipeline extensions).
oracle_sql()    — DuckDB-equivalent SQL for each hash-checkable query;
                  omitted only for genuinely non-SQL ops (LSH banding,
                  SimHash, mapInPandas stubs) → rows-only check.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from mongo_cdc_spark.operators import (  # noqa: E402
    cdc_batch, dedup, multimodal, relational, similarity, text, tpch_full,
)

_MODULES = (cdc_batch, relational, tpch_full, dedup, similarity, text, multimodal)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return relational.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        merged.update(mod.QUERIES)
    return merged


def oracle_sql() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _MODULES:
        merged.update(mod.ORACLE)
    return merged
