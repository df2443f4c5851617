"""Skew helpers: salted join / salted two-phase agg must be
result-identical to their unsalted equivalents, and the salt must
actually spread the hot key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongo_cdc_spark.io import load_table
from mongo_cdc_spark.operators.skew import salted_join, salted_sum_count


def _sorted_rows(df, cols):
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


def test_salted_join_matches_plain_inner(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority").withColumnRenamed(
        "o_orderkey", "l_orderkey")
    plain = li.join(o, "l_orderkey")
    salted = salted_join(li, o, "l_orderkey", n_salts=4)
    cols = ["l_orderkey", "l_quantity", "o_orderpriority"]
    assert _sorted_rows(salted, cols) == _sorted_rows(plain, cols)


def test_salted_join_matches_plain_left(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_orderpriority") == "1-URGENT")
         .groupBy(F.col("o_custkey").alias("c_custkey"))
         .agg(F.count(F.lit(1)).alias("n_urgent")))
    plain = c.join(o, "c_custkey", "left")
    salted = salted_join(c, o, "c_custkey", how="left", n_salts=4)
    cols = ["c_custkey", "n_urgent"]
    assert _sorted_rows(salted, cols) == _sorted_rows(plain, cols)


def test_salted_join_rejects_right_outer(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    with pytest.raises(ValueError):
        salted_join(li, li, "l_orderkey", how="right")


def test_salt_spreads_hot_key(spark, sf_dir):
    """All rows of one hot key must land on >1 salt value."""
    li = load_table(spark, sf_dir, "lineitem")
    hot = li.withColumn("k", F.lit(1))  # everything is one key
    salted = salted_join(
        hot, hot.groupBy("k").agg(F.count(F.lit(1)).alias("n")),
        "k", n_salts=8)
    # recompute the salt the same way the helper does on the joined rows:
    # distinct l_linenumber×l_orderkey rows hash to many salts
    n_distinct_salts = (
        hot.withColumn(
            "s", F.pmod(F.xxhash64(*[F.col(c) for c in hot.columns]),
                        F.lit(8)))
        .select("s").distinct().count())
    assert n_distinct_salts > 1
    assert salted.count() == li.count()


def test_salted_sum_count_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = (li.groupBy("l_returnflag")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.round(F.sum("l_quantity"), 2).alias("sum_l_quantity"),
                  F.round(F.avg("l_quantity"), 6).alias("avg_l_quantity")))
    salted = salted_sum_count(li, ["l_returnflag"], ["l_quantity"],
                              n_salts=8).select(
        "l_returnflag", "n",
        F.round("sum_l_quantity", 2).alias("sum_l_quantity"),
        F.round("avg_l_quantity", 6).alias("avg_l_quantity"))
    cols = ["l_returnflag", "n", "sum_l_quantity", "avg_l_quantity"]
    assert _sorted_rows(salted, cols) == _sorted_rows(plain, cols)


def test_fuzzy_blocking_bounds_hot_token(spark):
    """A dominant first token must NOT collapse the fuzzy join into one
    giant block: the length-band second key subdivides it, and the
    result still equals the unblocked ground truth."""
    from mongo_cdc_spark.operators.dedup import (
        _LEV_BAND, _LEV_MAX, fuzzy_name_pairs)

    # 300 names, ALL sharing the hot first token, lengths 10..70
    rows = [(f"hot {'x' * (6 + i % 60)}{i:03d}",) for i in range(300)]
    names = spark.createDataFrame(rows, "p_name string")
    got = {(r.name1, r.name2, r.dist)
           for r in fuzzy_name_pairs(names).collect()}
    a = names.select(F.col("p_name").alias("name1"))
    b = names.select(F.col("p_name").alias("name2"))
    brute = {
        (r.name1, r.name2, r.dist)
        for r in a.join(b, F.col("name1") < F.col("name2"))
        .withColumn("dist", F.levenshtein("name1", "name2"))
        .filter(F.col("dist") <= _LEV_MAX).collect()
    }
    assert got == brute and len(brute) > 0
    # the blocking actually subdivides: max rows per (blk, band) key is
    # far below the hot-block total
    per_key = (
        names.select(
            F.substring_index("p_name", " ", 1).alias("blk"),
            F.floor(F.length("p_name") / _LEV_BAND).alias("band"))
        .groupBy("blk", "band").count().agg(F.max("count")).first()[0])
    assert per_key <= 300 / 5


def test_bloom_semi_reduction_matches_plain_join(spark, sf_dir):
    """The bloom pre-filter must be invisible in the result (false
    positives die in the exact join) and visible in the plan (a
    broadcast semi-join feeding the real join)."""
    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.skew import join_bloom_semi_reduction
    from pyspark.sql import functions as F

    got = join_bloom_semi_reduction(spark, sf_dir).toPandas()
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    want = (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2).alias("rev"))
            ).first()
    assert len(got) == 1
    assert int(got.n_items.iloc[0]) == want.n
    assert abs(float(got.revenue.iloc[0]) - want.rev) < 0.01
    plan = join_bloom_semi_reduction(spark, sf_dir)._jdf.queryExecution(
        ).executedPlan().toString()
    assert "LeftSemi" in plan and "Broadcast" in plan


def test_salting_plan_matches_pandas_and_bounds(spark, sf_dir):
    """Pandas recompute + plan guarantees: fan-out covers every key
    under the budget and salting never increases the skew factor."""
    import math

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.skew import (
        SALT_TARGET_ROWS, skew_salting_plan)

    ev = load_table(spark, sf_dir, "events").groupBy("event_type") \
        .count().toPandas().set_index("event_type")["count"]
    got = skew_salting_plan(spark, sf_dir).toPandas().set_index("key")
    assert set(got.index) == set(ev.index)
    n_total = int(ev.sum())
    for k, n in ev.items():
        g = got.loc[k]
        salts = max(1, math.ceil(n / SALT_TARGET_ROWS)) \
            if n > SALT_TARGET_ROWS else 1
        assert int(g.n_rows) == n
        assert int(g.n_salts) == salts
        assert int(g.rows_per_salt) == math.ceil(n / salts)
        # the budget actually holds after salting (hot keys only)
        if n > SALT_TARGET_ROWS:
            assert g.rows_per_salt <= SALT_TARGET_ROWS
        assert abs(g.share - round(n / n_total, 6)) < 2e-6
    assert abs(got.share.sum() - 1.0) < 1e-4
    r = got.iloc[0]
    assert r.skew_after <= r.skew_before + 1e-9
    # descending size order
    assert list(got.n_rows) == sorted(got.n_rows, reverse=True)
