"""Pure-SQL front end (operators/sqlfront.py): every query must enter
through spark.sql TEXT (parser/analyzer/catalog path), produce results
consistent with independent recomputation, and compile to the same
scale-safe physical shapes as the DataFrame twins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongo_cdc_spark.operators import sqlfront


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


# --------------------------------------------------- spark.sql entry


def test_every_sqlfront_query_is_sql_text(spark, sf_dir):
    """The module's contract: each registered callable's plan derives
    from a SQL statement, not DataFrame DSL — re-running the shared
    template through spark.sql directly must produce an identical
    result (same rows, same columns)."""
    views = sqlfront._views(spark, sf_dir, "customer", "orders",
                            "lineitem", "supplier", "nation", "region",
                            suffix="q5t")
    direct = spark.sql(sqlfront._Q5_SQL.format(**views))
    via_registry = sqlfront.QUERIES["sql_tpch_q5_text"](spark, sf_dir)
    assert direct.columns == via_registry.columns
    assert direct.collect() == via_registry.collect()


def test_sqlfront_templates_share_text_with_oracle():
    """The verbatim-sharing claim: the registered oracle SQL equals
    the template the Spark side executes, modulo table names and the
    registry's AS MATERIALIZED hardening (CTAS states the same
    pipeline as CTEs and is exempt from the verbatim rule)."""
    q5_oracle = sqlfront.ORACLE["sql_tpch_q5_text"]
    assert q5_oracle.replace("MATERIALIZED ", "") == sqlfront._Q5_SQL.format(
        customer="customer", orders="orders", lineitem="lineitem",
        supplier="supplier", nation="nation", region="region"
    ).replace("MATERIALIZED ", "")
    gs = sqlfront.ORACLE["sql_grouping_sets_revenue"]
    assert "GROUPING SETS ((n_name, yr), (n_name), (yr), ())" in gs
    so = sqlfront.ORACLE["sql_set_ops_customer_activity"]
    for kw in ("INTERSECT", "EXCEPT", "UNION ALL"):
        assert kw in so


# --------------------------------------------------- value references


def test_q5_text_matches_dataframe_recompute(spark, sf_dir):
    from mongo_cdc_spark.io import load_table

    got = {r["n_name"]: (r["revenue"], r["n_lines"])
           for r in sqlfront.sql_tpch_q5_text(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp")))
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE")
    ref = (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
           .join(cust, (F.col("o_custkey") == F.col("c_custkey")))
           .join(supp, (F.col("l_suppkey") == F.col("s_suppkey"))
                 & (F.col("c_nationkey") == F.col("s_nationkey")))
           .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
           .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
           .groupBy("n_name")
           .agg(F.round(F.sum(F.col("l_extendedprice")
                              * (1 - F.col("l_discount"))), 2)
                .alias("revenue"),
                F.count(F.lit(1)).alias("n_lines"))).collect()
    assert got == {r["n_name"]: (r["revenue"], r["n_lines"])
                   for r in ref}
    assert got  # EUROPE/1995 must be non-empty at sf0.001


def test_grouping_sets_flags_and_grand_total(spark, sf_dir):
    rows = sqlfront.sql_grouping_sets_revenue(spark, sf_dir).collect()
    # flags disambiguate rolled-up NULLs: n_name IS NULL iff g_nation=1
    for r in rows:
        assert (r["n_name"] is None) == (r["g_nation"] == 1)
        assert (r["yr"] is None) == (r["g_year"] == 1)
    # the () grand-total row equals the sum of the (n_name, yr) cells
    detail = [r for r in rows if r["g_nation"] == 0 and r["g_year"] == 0]
    grand = [r for r in rows if r["g_nation"] == 1 and r["g_year"] == 1]
    assert len(grand) == 1
    assert grand[0]["n_lines"] == sum(r["n_lines"] for r in detail)
    assert grand[0]["revenue"] == pytest.approx(
        sum(r["revenue"] for r in detail), abs=0.05 * len(detail))
    # all four grouping sets are present
    combos = {(r["g_nation"], r["g_year"]) for r in rows}
    assert combos == {(0, 0), (0, 1), (1, 0), (1, 1)}


def test_ctas_lifecycle_views_exist_and_match(spark, sf_dir):
    from mongo_cdc_spark.io import load_table

    got = {r["segment"]: r for r in
           sqlfront.sql_view_lifecycle_ctas(spark, sf_dir).collect()}
    # DDL went through the catalog: both temp views resolvable
    for v in ("customer_orders_ctas_v1", "segment_stats_ctas_v2"):
        assert spark.catalog.tableExists(v), v
    ref = (load_table(spark, sf_dir, "orders")
           .join(load_table(spark, sf_dir, "customer"),
                 F.col("o_custkey") == F.col("c_custkey"))
           .groupBy("c_mktsegment")
           .agg(F.countDistinct("c_custkey").alias("n_customers"),
                F.count(F.lit(1)).alias("n_orders"),
                (F.sum(F.round(F.col("o_totalprice") * 100)
                       .cast("bigint")) / 100.0).alias("total")))
    for r in ref.collect():
        g = got[r["c_mktsegment"]]
        assert g["n_customers"] == r["n_customers"]
        assert g["n_orders"] == r["n_orders"]
        assert g["total_price"] == pytest.approx(round(r["total"], 2))
        assert g["avg_order_price"] == pytest.approx(
            round(r["total"] / r["n_orders"], 4))


def test_set_ops_cohort_identity(spark, sf_dir):
    got = {r["cohort"]: r["n_customers"] for r in
           sqlfront.sql_set_ops_customer_activity(spark, sf_dir)
           .collect()}
    assert set(got) == {"both_years", "only_1995", "only_1996",
                        "either_year"}
    assert (got["both_years"] + got["only_1995"] + got["only_1996"]
            == got["either_year"])
    assert got["either_year"] > 0


# --------------------------------------------------- plan posture


def test_q5_text_plan_broadcasts_dims(spark, sf_dir):
    """The SQL-text Q5 must compile to the same physical posture as
    the DataFrame twin: broadcast joins for the dims, zero
    sort-merge joins anywhere (plan_audit records 5 bhj / 0 smj)."""
    plan = _plan(sqlfront.sql_tpch_q5_text(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_grouping_sets_plan_has_one_expand(spark, sf_dir):
    plan = _plan(sqlfront.sql_grouping_sets_revenue(spark, sf_dir))
    assert plan.count("Expand") >= 1
    # the expand happens once at data grain, not per grouping set
    assert plan.count("Expand [") <= 1 or "Expand (" in plan


def test_window_share_matches_dataframe_recompute(spark, sf_dir):
    from pyspark.sql import Window as W_

    from mongo_cdc_spark.io import load_table

    got = {(r["segment"], str(r["month"])): r for r in
           sqlfront.sql_window_running_share(spark, sf_dir).collect()}
    monthly = (load_table(spark, sf_dir, "orders")
               .join(load_table(spark, sf_dir, "customer"),
                     F.col("o_custkey") == F.col("c_custkey"))
               .groupBy(F.col("c_mktsegment").alias("segment"),
                        F.date_trunc("month", "o_orderdate")
                        .alias("month"))
               .agg(F.sum(F.round(F.col("o_totalprice") * 100)
                          .cast("bigint")).alias("cents")))
    w_run = (W_.partitionBy("segment").orderBy("month")
             .rowsBetween(W_.unboundedPreceding, W_.currentRow))
    w_all = W_.partitionBy("segment")
    ref = (monthly
           .withColumn("cum", F.sum("cents").over(w_run))
           .withColumn("tot", F.sum("cents").over(w_all))
           .collect())
    assert len(ref) == len(got) > 0
    for r in ref:
        g = got[(r["segment"], str(r["month"]))]
        assert g["revenue"] == round(r["cents"] / 100.0, 2)
        assert g["cum_revenue"] == round(r["cum"] / 100.0, 2)
        assert g["share_of_segment"] == round(r["cents"] / r["tot"], 6)
    # shares sum to ~1 per segment
    from collections import defaultdict
    acc = defaultdict(float)
    for (seg, _), r in got.items():
        acc[seg] += r["share_of_segment"]
    for seg, total in acc.items():
        assert abs(total - 1.0) < 1e-3, seg


# --------------------------- subquery decorrelation (round 9)


def test_not_exists_decorrelates_to_anti_join(spark, sf_dir):
    """NOT EXISTS must compile to a LEFT ANTI join, never a
    per-customer re-scan; result must match the DataFrame anti-join
    and include never-ordered customers."""
    df = sqlfront.sql_not_exists_no_urgent(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "InMemoryRelation" not in plan

    from mongo_cdc_spark.io import load_table
    cust = load_table(spark, sf_dir, "customer")
    urgent = (load_table(spark, sf_dir, "orders")
              .where(F.col("o_orderpriority") == "1-URGENT")
              .select("o_custkey"))
    ref = (cust.join(urgent,
                     F.col("c_custkey") == F.col("o_custkey"),
                     "left_anti")
           .groupBy("c_mktsegment").count().collect())
    want = {r["c_mktsegment"]: r["count"] for r in ref}
    got = {r["segment"]: r["n_customers"] for r in df.collect()}
    assert got == want


def test_scalar_subquery_decorrelates_to_aggregate_join(spark,
                                                        sf_dir):
    """The correlated per-part AVG must rewrite to ONE partkey-grain
    aggregate joined back (no nested per-row subquery stage left in
    the executed plan), and match a manual two-pass recompute."""
    df = sqlfront.sql_scalar_subquery_small_qty(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # decorrelated: a join against an aggregated lineitem subtree;
    # no remaining correlated-subquery execution node
    assert "Join" in plan
    assert "ScalarSubquery" not in plan

    from mongo_cdc_spark.io import load_table
    li = load_table(spark, sf_dir, "lineitem")
    p = (load_table(spark, sf_dir, "part")
         .where(F.col("p_size") <= 10).select("p_partkey"))
    avg_q = li.groupBy("l_partkey").agg(
        F.avg("l_quantity").alias("aq"))
    ref = (li.join(p, li.l_partkey == p.p_partkey)
           .join(avg_q, "l_partkey")
           .where(F.col("l_quantity") < 0.5 * F.col("aq"))
           .groupBy("l_returnflag").count().collect())
    want = {r["l_returnflag"]: r["count"] for r in ref}
    got = {r["l_returnflag"]: r["n_small_lines"]
           for r in df.collect()}
    assert got == want


def test_in_subquery_decorrelates_to_semi_join(spark, sf_dir):
    """IN (subquery) must compile to a LEFT SEMI join: each order
    counts once however many lines match."""
    df = sqlfront.sql_in_semijoin_returned(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan

    from mongo_cdc_spark.io import load_table
    matched = (load_table(spark, sf_dir, "lineitem")
               .where((F.col("l_shipdate")
                       >= F.lit("1998-01-01").cast("timestamp"))
                      & (F.col("l_returnflag") == "R"))
               .select("l_orderkey").distinct())
    ref = (load_table(spark, sf_dir, "orders")
           .join(matched,
                 F.col("o_orderkey") == F.col("l_orderkey"),
                 "left_semi")
           .groupBy("o_orderpriority").count().collect())
    want = {r["o_orderpriority"]: r["count"] for r in ref}
    got = {r["o_orderpriority"]: r["n_orders"] for r in df.collect()}
    assert got == want


def test_sql_pivot_matches_dataframe_pivot(spark, sf_dir):
    """The SQL-text PIVOT must agree with groupBy().pivot() on counts
    and exact-cents totals, including zero cells."""
    from mongo_cdc_spark.io import load_table

    got = {r["priority"]: r for r in
           sqlfront.sql_pivot_text(spark, sf_dir).collect()}
    ref = (load_table(spark, sf_dir, "orders")
           .groupBy("o_orderpriority")
           .pivot("o_orderstatus", ["O", "F", "P"])
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("o_totalprice") * 100)
                      .cast("bigint")).alias("cents"))
           .collect())
    assert len(ref) == len(got) > 0
    for r in ref:
        g = got[r["o_orderpriority"]]
        for st, ncol, tcol in (("O", "n_open", "total_open"),
                               ("F", "n_filled", "total_filled"),
                               ("P", "n_pending", "total_pending")):
            n = r[f"{st}_n"] or 0
            cents = r[f"{st}_cents"] or 0
            assert g[ncol] == n, (r["o_orderpriority"], st)
            assert g[tcol] == round(cents / 100.0, 2)


def test_sql_unpivot_matches_dataframe_unpivot(spark, sf_dir):
    """The SQL-text UNPIVOT must agree with DataFrame unpivot() run at
    the same data grain, and the plan must contain the Expand."""
    from mongo_cdc_spark.io import load_table

    got = {(r["l_returnflag"], r["component"]): r for r in
           sqlfront.sql_unpivot_text(spark, sf_dir).collect()}
    cents = lambda c: F.round(c * 100).cast("bigint")  # noqa: E731
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.select(
        "l_returnflag",
        cents(F.col("l_extendedprice")).alias("gross"),
        cents(F.col("l_extendedprice") * F.col("l_discount"))
        .alias("discount_amt"),
        cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))
              * F.col("l_tax")).alias("tax_amt"))
    ref = (wide.unpivot(["l_returnflag"],
                        ["gross", "discount_amt", "tax_amt"],
                        "component", "cents")
           .groupBy("l_returnflag", "component")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("cents").alias("c"))
           .collect())
    assert len(ref) == len(got) > 0
    for r in ref:
        g = got[(r["l_returnflag"], r["component"])]
        assert g["n_rows"] == r["n"]
        assert g["total"] == round(r["c"] / 100.0, 2)
        assert g["avg_amount"] == round(r["c"] / r["n"] / 100.0, 6)
    plan = (sqlfront.sql_unpivot_text(spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Expand" in plan


def test_group_by_all_matches_explicit_group_by(spark, sf_dir):
    """GROUP BY ALL must infer (yr, status, priority) — identical
    result to the explicit GROUP BY statement."""
    df = sqlfront.sql_group_by_all_text(spark, sf_dir)
    views = sqlfront._views(spark, sf_dir, "orders", suffix="gballt")
    explicit = spark.sql(sqlfront._GROUPBYALL_SQL.replace(
        "GROUP BY ALL",
        "GROUP BY EXTRACT(year FROM o_orderdate), o_orderstatus,"
        " o_orderpriority").format(**views))
    assert df.columns == explicit.columns
    assert df.collect() == explicit.collect()


def test_values_inline_dim_broadcasts_local_relation(spark, sf_dir):
    """The 3-row VALUES relation must plan as a broadcast local table
    — no shuffle join against the literal dim — and unmapped
    priorities must land in the COALESCE default bucket."""
    df = sqlfront.sql_values_inline_dim(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan
    assert "BroadcastHashJoin" in plan

    from collections import defaultdict
    from mongo_cdc_spark.io import load_table
    tiers = {"1-URGENT": "expedite", "2-HIGH": "expedite",
             "3-MEDIUM": "queue"}
    agg = defaultdict(lambda: [0, set(), 0])
    for r in load_table(spark, sf_dir, "orders").select(
            "o_orderpriority", "o_custkey", "o_totalprice").collect():
        t = tiers.get(r["o_orderpriority"], "standard")
        agg[t][0] += 1
        agg[t][1].add(r["o_custkey"])
        agg[t][2] += round(r["o_totalprice"] * 100)
    got = {r["tier"]: r for r in df.collect()}
    assert set(got) == set(agg)
    for t, (n, custs, cents) in agg.items():
        assert got[t]["n_orders"] == n
        assert got[t]["n_customers"] == len(custs)
        assert abs(got[t]["revenue"] - round(cents / 100, 2)) < 1e-6


def test_range_interval_frame_shrinks_on_gaps(spark, sf_dir):
    """RANGE INTERVAL semantics: the trailing-7-day totals must match
    a calendar-window recompute (not a 7-ROW recompute)."""
    from collections import defaultdict
    from datetime import timedelta

    from mongo_cdc_spark.io import load_table

    df = sqlfront.sql_range_interval_window(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "value").collect()
    daily = defaultdict(lambda: [0, 0])
    for r in ev:
        k = (r["event_type"], r["ts"].date())
        daily[k][0] += 1
        daily[k][1] += round(r["value"] * 100)
    for r in df.collect():
        et, d = r["event_type"], r["day"].date()
        n7 = sum(daily[(et, d - timedelta(days=o))][0]
                 for o in range(7) if (et, d - timedelta(days=o))
                 in daily)
        c7 = sum(daily[(et, d - timedelta(days=o))][1]
                 for o in range(7) if (et, d - timedelta(days=o))
                 in daily)
        assert r["trailing7_events"] == n7, (et, d)
        assert abs(r["trailing7_value"] - round(c7 / 100, 2)) < 1e-9


def test_named_window_matches_inline_recompute(spark, sf_dir):
    """Named-window references must resolve to the same results as
    the equivalent inline windows, and the two cum aggregates must
    share one Window operator in the plan."""
    df = sqlfront.sql_named_window_text(spark, sf_dir)
    views = sqlfront._views(spark, sf_dir, "events", suffix="nwt")
    inline = spark.sql("""
        WITH daily AS (
          SELECT event_type, date_trunc('day', ts) AS day,
                 COUNT(*) AS n_events
          FROM {events}
          GROUP BY event_type, date_trunc('day', ts)
        )
        SELECT event_type, day,
               CAST(n_events AS BIGINT) AS n_events,
               CAST(SUM(n_events) OVER (PARTITION BY event_type
                    ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS cum_events,
               CAST(MAX(n_events) OVER (PARTITION BY event_type
                    ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS peak_so_far,
               CAST(RANK() OVER (PARTITION BY event_type
                    ORDER BY n_events DESC, day) AS INT)
                 AS loudest_day_rank
        FROM daily ORDER BY event_type, day
    """.format(**views))
    assert df.columns == inline.columns
    assert df.collect() == inline.collect()
    # both cum aggregates resolve into ONE logical Window node (the
    # executedPlan string is AQE-duplicated, so count the optimized
    # logical plan instead: one node for cum, one for ld)
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    assert logical.count("Window [") == 2


def test_filtered_agg_matches_case_when_twin(spark, sf_dir):
    """The FILTER-clause statement must agree with an independently
    built CASE-WHEN DataFrame plan (the pre-SQL:2003 spelling)."""
    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.sqlfront import sql_filtered_agg_text
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    fin = F.col("o_orderstatus") == "F"
    since = F.col("o_orderdate") >= F.lit("1995-01-01").cast("date")
    twin = (o.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.sum(fin.cast("long")).alias("n_finished"),
                 F.countDistinct(
                     F.when(F.col("o_orderstatus") == "O",
                            F.col("o_custkey"))).alias("n_open"),
                 F.round(F.sum(F.when(fin, cents)) / 100.0, 2)
                 .alias("finished_revenue"),
                 F.round(F.sum(F.when(since, cents))
                         / (100.0 * F.sum(since.cast("long"))), 6)
                 .alias("avg_since"))
            .orderBy("o_orderpriority")).collect()
    got = sql_filtered_agg_text(spark, sf_dir).collect()
    assert len(got) == len(twin) == 5
    for g, w in zip(got, twin):
        assert g.o_orderpriority == w.o_orderpriority
        assert g.n_orders == w.n_orders
        assert g.n_finished == w.n_finished
        assert g.n_open_customers == w.n_open
        assert float(g.finished_revenue) == float(w.finished_revenue)
        assert abs(float(g.avg_price_since_95)
                   - float(w.avg_since)) < 1e-6
