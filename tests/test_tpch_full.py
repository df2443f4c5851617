"""Plan-shape tests for the full TPC-H sweep (tpch_full module).

Correctness is covered by the duckdb-oracle gate; these assert the
100 TB scale posture — semi/anti rewrites, broadcast dims, scalar
subquery handling — so a plan regression fails fast.
"""

from __future__ import annotations

from mongo_cdc_spark.operators import tpch_full


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q4_uses_semi_join(spark, sf_dir):
    """EXISTS must become a LEFT SEMI join (no fan-out, no dedup agg)."""
    plan = _plan(tpch_full.q4_order_priority(spark, sf_dir))
    assert "LeftSemi" in plan


def test_q16_uses_anti_join_and_broadcast(spark, sf_dir):
    """NOT IN on the non-null supplier list must be a broadcast anti
    join, never a shuffle."""
    plan = _plan(tpch_full.q16_supplier_cnt(spark, sf_dir))
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan


def test_q21_rewrites_exists_pair(spark, sf_dir):
    """EXISTS → LEFT SEMI and NOT EXISTS → LEFT ANTI via Catalyst's
    RewritePredicateSubquery — per-row probing would die at scale."""
    plan = _plan(tpch_full.q21_waiting_supplier(spark, sf_dir))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_q9_broadcasts_all_dims(spark, sf_dir):
    """part/supplier/nation are broadcast; the only shuffle join is
    lineitem⋈orders."""
    plan = _plan(tpch_full.q9_product_profit(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3


def test_q15_scalar_max_is_broadcast(spark, sf_dir):
    """The MAX(total_revenue) scalar joins back via broadcast — a
    1-row build side, not a shuffle."""
    plan = _plan(tpch_full.q15_top_supplier(spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_q14_single_aggregate_pass(spark, sf_dir):
    """The conditional ratio must be ONE aggregate (two sums), not a
    self-join of two filtered aggregates."""
    plan = _plan(tpch_full.q14_promo_effect(spark, sf_dir))
    assert "SortMergeJoin" not in plan


def test_q13_no_sort_merge_join(spark, sf_dir):
    """customer⋈orders at sf0.001 broadcasts; at scale AQE decides —
    the guarded property is that the two groupBys share the custkey
    exchange (only 2 shuffles total: join+agg, final agg)."""
    plan = _plan(tpch_full.q13_customer_distribution(spark, sf_dir))
    shuffles = (plan.count("Exchange hashpartitioning")
                + plan.count("Exchange rangepartitioning"))
    assert shuffles <= 3


def test_q17_decorrelated_avg_rows(spark, sf_dir):
    """The correlated AVG path returns a single plausible row."""
    row = tpch_full.q17_small_quantity(spark, sf_dir).collect()[0]
    assert row.avg_yearly is None or row.avg_yearly >= 0
