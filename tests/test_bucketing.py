"""Bucketing: pre-shuffled, co-located storage for repeated big-big
joins — the 100 TB answer to "this join shuffles every time".

Writing both fact tables bucketed by the join key lets Spark join them
with ZERO exchanges (each bucket pair joins independently). This is the
strategy SURVEY §7/M4 declares for repeated lineitem⋈orders joins at
scale; the test proves the plan property locally.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongo_cdc_spark.io import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    loc = tmp_path_factory.mktemp("bucketdb")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{loc}'")
    (load_table(spark, sf_dir, "lineitem")
     .select("l_orderkey", "l_quantity", "l_extendedprice")
     .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .mode("overwrite").saveAsTable("bucketdb.li_b"))
    (load_table(spark, sf_dir, "orders")
     .select("o_orderkey", "o_orderpriority")
     .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable("bucketdb.o_b"))
    yield "bucketdb.li_b", "bucketdb.o_b"
    spark.sql("DROP DATABASE bucketdb CASCADE")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a non-broadcast join so the bucketing is what saves us
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = spark.table(li_t)
        o = spark.table(o_t)
        joined = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, (
            "bucketed join must read co-located buckets, not re-shuffle")
        # and it still returns the right row count
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_no_shuffle(spark, bucketed_tables):
    """Aggregation on the bucket key also reuses the bucket layout."""
    li_t, _ = bucketed_tables
    agg = spark.table(li_t).groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("q"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
