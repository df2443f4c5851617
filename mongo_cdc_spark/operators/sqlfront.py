"""Pure-SQL front end: queries that enter the engine as SQL TEXT.

Round-7 verdict: only 2 of 326 registered queries exercised the
parser/catalog half of the engine (`spark.sql` text → logical plan),
leaving the SQL surface the least-graded path. This module adds
entry points whose Spark side is ONE SQL statement (plus, for the
lifecycle query, `CREATE TEMPORARY VIEW` DDL through the same
parser) — the statement is shared VERBATIM with the DuckDB oracle,
templated only on table names, so the driver hash-grades Spark's SQL
parser, analyzer, and catalog resolution against an independent
engine rather than grading a DataFrame plan we built ourselves.

Reference parity note: the reference relay (main.go) has no SQL
surface; this is the SURVEY §2.2 "SQL front-end" engine category.

Scale posture: every statement here compiles to the same physical
plans as its DataFrame twins — Catalyst broadcasts the fixed-size
dims (region/nation/supplier ride io.BROADCAST_DIMS' statistics),
pushes the date filters into the parquet scans, and map-side-combines
the aggregates; the GROUPING SETS query uses ONE data-grain Expand
(4 grouping sets over a pre-joined frame whose join keys are the
usual lineitem⋈orders shuffle), and the set-ops query collapses to
DISTINCT custkey frames (sub-linear) before any INTERSECT/EXCEPT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import load_table
from . import make_registry

QUERIES, ORACLE, query = make_registry()


def _views(spark: SparkSession, sf_dir: str, *tables: str,
           suffix: str) -> dict[str, str]:
    """Register temp views for the given tables; returns the name map
    used to format the shared SQL template (DuckDB sees the bare
    table names, Spark sees the session views)."""
    names: dict[str, str] = {}
    for t in tables:
        view = f"{t}_{suffix}_v"
        load_table(spark, sf_dir, t).createOrReplaceTempView(view)
        names[t] = view
    return names


# ------------------------------------------------ TPC-H Q5 as SQL text

_Q5_SQL = """
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS n_lines
    FROM {customer}
    JOIN {orders}   ON c_custkey = o_custkey
    JOIN {lineitem} ON l_orderkey = o_orderkey
    JOIN {supplier} ON l_suppkey = s_suppkey
                   AND c_nationkey = s_nationkey
    JOIN {nation}   ON s_nationkey = n_nationkey
    JOIN {region}   ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
      AND o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate <  TIMESTAMP '1996-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
"""


@query("sql_tpch_q5_text",
       sql=_Q5_SQL.format(customer="customer", orders="orders",
                          lineitem="lineitem", supplier="supplier",
                          nation="nation", region="region"))
def sql_tpch_q5_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume) stated entirely as SQL text —
    the 6-table star join enters through spark.sql, not the DataFrame
    DSL, so the parser, analyzer, star-join reordering, and broadcast
    selection are what this query grades (EUROPE/1995 parameters so
    it is not a result-duplicate of the DataFrame-built
    q5_local_supplier_volume, which uses ASIA/1996).

    Scale: identical physical shape to the DataFrame twin — Catalyst
    broadcasts region→nation→supplier, pushes the o_orderdate range
    into the orders scan, and the only data-grain shuffles are
    lineitem⋈orders and orders⋈customer on their join keys."""
    names = _views(spark, sf_dir, "customer", "orders", "lineitem",
                   "supplier", "nation", "region", suffix="q5t")
    return spark.sql(_Q5_SQL.format(**names))


# ------------------------------------- GROUPING SETS stated in SQL

_GSETS_SQL = """
    WITH base AS (
      SELECT n_name,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
             l_extendedprice * (1 - l_discount) AS rev
      FROM {lineitem}
      JOIN {orders}   ON l_orderkey = o_orderkey
      JOIN {customer} ON o_custkey = c_custkey
      JOIN {nation}   ON c_nationkey = n_nationkey
    )
    SELECT n_name, yr,
           CAST(GROUPING(n_name) AS INT) AS g_nation,
           CAST(GROUPING(yr) AS INT) AS g_year,
           ROUND(SUM(rev), 2) AS revenue,
           COUNT(*) AS n_lines
    FROM base
    GROUP BY GROUPING SETS ((n_name, yr), (n_name), (yr), ())
    ORDER BY g_nation, g_year,
             n_name NULLS FIRST, yr NULLS FIRST
"""


@query("sql_grouping_sets_revenue",
       sql=_GSETS_SQL.format(lineitem="lineitem", orders="orders",
                             customer="customer", nation="nation"))
def sql_grouping_sets_revenue(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """GROUPING SETS stated in SQL: customer-nation × order-year
    revenue with all four rollup combinations and explicit GROUPING()
    flags (the flags disambiguate a NULL group key from a rolled-up
    one — the standard cube-report idiom). NULLS FIRST is spelled out
    because Spark and DuckDB default opposite NULL sort orders.

    Scale: one data-grain join pipeline (nation broadcasts, the
    lineitem⋈orders shuffle is the cost), then ONE Expand node
    replicates each row 4× at nation×year grain — the aggregate
    input after map-side partials is ≤ |nations|·|years|·4 rows."""
    names = _views(spark, sf_dir, "lineitem", "orders", "customer",
                   "nation", suffix="gsets")
    return spark.sql(_GSETS_SQL.format(**names))


# ------------------------- temp-view lifecycle (DDL through the parser)

_CTAS_VIEW1 = """
    CREATE OR REPLACE TEMPORARY VIEW {v1} AS
    SELECT c_custkey, c_mktsegment,
           COUNT(*) AS n_orders,
           SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
    FROM {orders}
    JOIN {customer} ON o_custkey = c_custkey
    GROUP BY c_custkey, c_mktsegment
"""

_CTAS_VIEW2 = """
    CREATE OR REPLACE TEMPORARY VIEW {v2} AS
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(n_orders) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS cents
    FROM {v1}
    GROUP BY c_mktsegment
"""

_CTAS_QUERY = """
    SELECT c_mktsegment AS segment,
           n_customers,
           n_orders,
           ROUND(CAST(cents AS DOUBLE) / 100.0, 2) AS total_price,
           ROUND(CAST(cents AS DOUBLE) / 100.0 / n_orders, 4)
             AS avg_order_price
    FROM {v2}
    ORDER BY segment
"""


@query("sql_view_lifecycle_ctas", sql="""
    WITH v1 AS (
      SELECT c_custkey, c_mktsegment,
             COUNT(*) AS n_orders,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      GROUP BY c_custkey, c_mktsegment
    ), v2 AS (
      SELECT c_mktsegment,
             COUNT(*) AS n_customers,
             CAST(SUM(n_orders) AS BIGINT) AS n_orders,
             CAST(SUM(cents) AS BIGINT) AS cents
      FROM v1
      GROUP BY c_mktsegment
    )
    SELECT c_mktsegment AS segment,
           n_customers,
           n_orders,
           ROUND(CAST(cents AS DOUBLE) / 100.0, 2) AS total_price,
           ROUND(CAST(cents AS DOUBLE) / 100.0 / n_orders, 4)
             AS avg_order_price
    FROM v2
    ORDER BY segment
""")
def sql_view_lifecycle_ctas(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Temp-view catalog lifecycle: two CREATE OR REPLACE TEMPORARY
    VIEW DDL statements (a customer-grain aggregate view, then a
    segment-grain view defined ON the first — view-on-view catalog
    resolution), then a final SELECT over the derived view. All three
    statements go through spark.sql, so this grades the DDL parser,
    the session catalog's name resolution across the view chain, and
    lazy view expansion at query time; the DuckDB oracle states the
    same pipeline as a two-CTE query. Exact-cents totals on both
    engines (never round-then-sum doubles).

    Scale: the view chain expands into the same logical plan as the
    CTE form — one customer-grain shuffle partial-agg pipeline
    collapsing to |segments| rows; views add zero runtime cost."""
    names = _views(spark, sf_dir, "orders", "customer", suffix="ctas")
    v1, v2 = "customer_orders_ctas_v1", "segment_stats_ctas_v2"
    spark.sql(_CTAS_VIEW1.format(v1=v1, **names))
    spark.sql(_CTAS_VIEW2.format(v1=v1, v2=v2))
    return spark.sql(_CTAS_QUERY.format(v2=v2))


# ---------------------------------------- set operations stated in SQL

_SETOPS_SQL = """
    WITH y95 AS (
      SELECT DISTINCT o_custkey FROM {orders}
      WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate <  TIMESTAMP '1996-01-01'
    ), y96 AS (
      SELECT DISTINCT o_custkey FROM {orders}
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1997-01-01'
    )
    SELECT 'both_years' AS cohort, COUNT(*) AS n_customers
      FROM (SELECT o_custkey FROM y95
            INTERSECT
            SELECT o_custkey FROM y96) AS t_both
    UNION ALL
    SELECT 'only_1995' AS cohort, COUNT(*) AS n_customers
      FROM (SELECT o_custkey FROM y95
            EXCEPT
            SELECT o_custkey FROM y96) AS t_only95
    UNION ALL
    SELECT 'only_1996' AS cohort, COUNT(*) AS n_customers
      FROM (SELECT o_custkey FROM y96
            EXCEPT
            SELECT o_custkey FROM y95) AS t_only96
    UNION ALL
    SELECT 'either_year' AS cohort, COUNT(*) AS n_customers
      FROM (SELECT o_custkey FROM y95
            UNION
            SELECT o_custkey FROM y96) AS t_either
    ORDER BY cohort
"""


@query("sql_set_ops_customer_activity",
       sql=_SETOPS_SQL.format(orders="orders"))
def sql_set_ops_customer_activity(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION stated in SQL: the 1995-vs-1996
    active-customer cohort decomposition (retained / churned / new /
    either). The identity n(both) + n(only95) + n(only96) =
    n(either) is pinned in pytest as an internal consistency check
    independent of either engine.

    Scale: each year CTE collapses to a DISTINCT custkey frame with
    the date filter pushed to the orders scan (map-side partial
    distinct), so the set operations run on sub-linear key frames;
    the four COUNT branches each reduce to one row before the final
    4-row UNION ALL."""
    names = _views(spark, sf_dir, "orders", suffix="setops")
    return spark.sql(_SETOPS_SQL.format(**names))


# -------------------------------- window functions stated in SQL

_WINSHARE_SQL = """
    WITH monthly AS (
      SELECT c_mktsegment AS segment,
             date_trunc('month', o_orderdate) AS month,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
      FROM {orders}
      JOIN {customer} ON o_custkey = c_custkey
      GROUP BY c_mktsegment, date_trunc('month', o_orderdate)
    )
    SELECT segment, month,
           ROUND(CAST(cents AS DOUBLE) / 100.0, 2) AS revenue,
           ROUND(CAST(SUM(cents) OVER (
               PARTITION BY segment ORDER BY month
               ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 100.0, 2)
             AS cum_revenue,
           ROUND(cents * 1e0 / SUM(cents) OVER (PARTITION BY segment),
                 6) AS share_of_segment,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY segment ORDER BY cents DESC, month)
             AS INT) AS month_rank_in_segment
    FROM monthly
    ORDER BY segment, month
"""


@query("sql_window_running_share",
       sql=_WINSHARE_SQL.format(orders="orders", customer="customer"))
def sql_window_running_share(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Window functions stated in SQL text: per-segment monthly
    revenue with a running total (ROWS frame), each month's share of
    its segment's total (unordered partition window), and the
    month's revenue rank within the segment — three distinct window
    shapes through the SQL parser in one statement, shared verbatim
    with the oracle. Exact integer cents through every window sum;
    division happens once per output cell.

    Scale: one data-grain join+agg to (segment, month) grain; all
    three windows then run PARTITIONED by segment over
    calendar-bounded frames — never a global window."""
    names = _views(spark, sf_dir, "orders", "customer",
                   suffix="winshare")
    return spark.sql(_WINSHARE_SQL.format(**names))


# --------------------------- subquery forms stated in SQL (round 9)

_NOTEXISTS_SQL = """
    SELECT c_mktsegment AS segment,
           COUNT(*) AS n_customers,
           ROUND(CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT))
                      AS DOUBLE) / 100.0 / COUNT(*), 4) AS avg_bal
    FROM {customer} c
    WHERE NOT EXISTS (SELECT 1 FROM {orders} o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    ORDER BY segment
"""


@query("sql_not_exists_no_urgent",
       sql=_NOTEXISTS_SQL.format(customer="customer", orders="orders"))
def sql_not_exists_no_urgent(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """NOT EXISTS stated as SQL text (the TPC-H Q21/Q22 subquery
    shape): customers with NO urgent order — including customers who
    never ordered at all, the semantics that distinguish NOT EXISTS
    from a plain inner-join-and-filter. Segment-grain counts plus an
    exact-cents mean balance.

    The parser path is the point: Spark's analyzer must decorrelate
    the EXISTS predicate into a LEFT ANTI join (RewritePredicate-
    Subquery), never a per-customer re-scan of orders —
    tests/test_sqlfront.py asserts LeftAnti in the physical plan.
    Scale: one anti join on the customer key (the filtered orders
    side collapses to distinct urgent custkeys), then a ~5-row
    aggregate with map-side partials."""
    names = _views(spark, sf_dir, "customer", "orders",
                   suffix="nexurg")
    return spark.sql(_NOTEXISTS_SQL.format(**names))


_SCALARSUB_SQL = """
    SELECT l.l_returnflag,
           COUNT(*) AS n_small_lines,
           ROUND(CAST(SUM(CAST(ROUND(l.l_extendedprice * 100)
                               AS BIGINT)) AS DOUBLE) / 100.0, 2)
             AS small_qty_revenue
    FROM {lineitem} l
    JOIN {part} p ON p.p_partkey = l.l_partkey
    WHERE p.p_size <= 10
      AND l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                          FROM {lineitem} l2
                          WHERE l2.l_partkey = l.l_partkey)
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
"""


@query("sql_scalar_subquery_small_qty",
       sql=_SCALARSUB_SQL.format(lineitem="lineitem", part="part"))
def sql_scalar_subquery_small_qty(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Correlated SCALAR subquery stated as SQL text (the TPC-H Q17
    shape): lineitems of small parts whose quantity falls below half
    of their part's average quantity. The per-part average is a
    correlated scalar subquery the analyzer must rewrite into ONE
    partkey-grain aggregate joined back (RewriteCorrelatedScalar-
    Subquery) — a naive per-row re-scan of lineitem would be O(N^2);
    tests/test_sqlfront.py asserts the decorrelated aggregate-join
    plan. Quantity is integer-valued in the fixture so each part's
    AVG is an exact integer sum divided once — deterministic on both
    engines — and revenue is exact cents.

    Scale: one partkey-grain aggregate over lineitem (map-side
    combined), one shuffle join back on partkey, the p_size filter
    pushed to the part scan; output is a ≤3-row report."""
    names = _views(spark, sf_dir, "lineitem", "part",
                   suffix="sclsub")
    return spark.sql(_SCALARSUB_SQL.format(**names))


_INSEMI_SQL = """
    SELECT o.o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(CAST(SUM(CAST(ROUND(o.o_totalprice * 100)
                               AS BIGINT)) AS DOUBLE) / 100.0, 2)
             AS total_price
    FROM {orders} o
    WHERE o.o_orderkey IN (SELECT l.l_orderkey
                           FROM {lineitem} l
                           WHERE l.l_shipdate >= TIMESTAMP '1998-01-01'
                             AND l.l_returnflag = 'R')
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
"""


@query("sql_in_semijoin_returned",
       sql=_INSEMI_SQL.format(orders="orders", lineitem="lineitem"))
def sql_in_semijoin_returned(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """IN (subquery) stated as SQL text (the TPC-H Q4/Q12 membership
    shape): orders containing at least one 1998 returned line,
    counted per priority with exact-cents totals. The IN predicate
    must become a LEFT SEMI join on the order key (each order counts
    ONCE however many lines match — the semantics a plain inner join
    would get wrong); tests/test_sqlfront.py asserts LeftSemi in the
    physical plan.

    Scale: the lineitem side collapses under the pushed shipdate/
    returnflag filters before the semi join's orderkey shuffle; the
    priority rollup is a 5-row map-side-combined aggregate."""
    names = _views(spark, sf_dir, "orders", "lineitem",
                   suffix="insemi")
    return spark.sql(_INSEMI_SQL.format(**names))


# ------------------------------------ PIVOT stated in SQL (round 9)

_PIVOT_SQL = """
    SELECT priority,
           COALESCE(o_n, 0) AS n_open,
           COALESCE(f_n, 0) AS n_filled,
           COALESCE(p_n, 0) AS n_pending,
           ROUND(COALESCE(CAST(o_cents AS DOUBLE), 0.0) / 100.0, 2)
             AS total_open,
           ROUND(COALESCE(CAST(f_cents AS DOUBLE), 0.0) / 100.0, 2)
             AS total_filled,
           ROUND(COALESCE(CAST(p_cents AS DOUBLE), 0.0) / 100.0, 2)
             AS total_pending
    FROM (SELECT o_orderpriority AS priority, o_orderstatus,
                 CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
          FROM {orders})
    PIVOT (COUNT(*) AS n, SUM(cents) AS cents
           FOR o_orderstatus IN ('O' AS o, 'F' AS f, 'P' AS p))
    ORDER BY priority
"""


@query("sql_pivot_text", sql="""
    SELECT o_orderpriority AS priority,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_open,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_filled,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pending,
           ROUND(CAST(SUM(CASE WHEN o_orderstatus = 'O'
                     THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                     ELSE 0 END) AS DOUBLE) / 100.0, 2) AS total_open,
           ROUND(CAST(SUM(CASE WHEN o_orderstatus = 'F'
                     THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                     ELSE 0 END) AS DOUBLE) / 100.0, 2)
             AS total_filled,
           ROUND(CAST(SUM(CASE WHEN o_orderstatus = 'P'
                     THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                     ELSE 0 END) AS DOUBLE) / 100.0, 2)
             AS total_pending
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY priority
""")
def sql_pivot_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT stated as SQL text: order counts and exact-cents totals
    per priority, statuses O/F/P pivoted to columns through Spark's
    PIVOT clause (multi-aggregate form — COUNT and SUM in one pivot,
    aliased value list). The DataFrame twin pivot_status_by_priority
    covers groupBy().pivot(); THIS entry grades the parser/analyzer
    path, which expands the clause into the same Expand+aggregate
    plan. The oracle states the equivalent CASE aggregation (DuckDB's
    PIVOT syntax differs; the CASE form is the portable semantics of
    the clause). NULL pivot cells (a priority with no orders in a
    status) are COALESCEd to 0 on both engines.

    Scale: one map-side-combined shuffle on the 5-value priority key;
    the pivot adds columns, not rows."""
    names = _views(spark, sf_dir, "orders", suffix="pivtxt")
    return spark.sql(_PIVOT_SQL.format(**names))


# --------------------------------------------- UNPIVOT as SQL text

_UNPIVOT_SQL = """
    WITH charges AS (
      SELECT l_returnflag,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS gross,
             CAST(ROUND(l_extendedprice * l_discount * 100) AS BIGINT)
               AS discount_amt,
             CAST(ROUND(l_extendedprice * (1 - l_discount) * l_tax
                        * 100) AS BIGINT) AS tax_amt
      FROM {lineitem}
    )
    SELECT l_returnflag, component,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(CAST(SUM(cents) AS DOUBLE) / 100.0, 2) AS total,
           ROUND(CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100.0, 6)
             AS avg_amount
    FROM charges
    UNPIVOT (cents FOR component IN (gross, discount_amt, tax_amt))
    GROUP BY l_returnflag, component
    ORDER BY l_returnflag, component
"""


@query("sql_unpivot_text",
       sql=_UNPIVOT_SQL.format(lineitem="lineitem"))
def sql_unpivot_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT stated as SQL text and shared VERBATIM with the oracle
    (DuckDB accepts the same `UNPIVOT (val FOR name IN (...))` clause)
    — the wide→long inverse of sql_pivot_text through the
    parser/analyzer path. Unlike the DataFrame twin
    unpivot_lineitem_metrics (which melts a pre-aggregated 3-row
    frame), THIS statement unpivots at DATA GRAIN — each lineitem row
    fans out to 3 charge-component rows inside the scan stage — and
    aggregates after, grading the Expand-then-partial-agg plan shape
    a real metrics melt produces at scale.

    Scale: the unpivot Expand is a narrow per-row generate (x3 rows,
    no exchange); the only shuffle is the map-side-combined
    (flag, component) aggregation — 15 groups. Charge components are
    EXACT integer cents (each rounds per row before any sum), so
    totals and means are exact-integer ratios on both engines."""
    names = _views(spark, sf_dir, "lineitem", suffix="unpivtxt")
    return spark.sql(_UNPIVOT_SQL.format(**names))


# ------------------- modern grouping sugar + inline literal tables

_GROUPBYALL_SQL = """
    SELECT EXTRACT(year FROM o_orderdate) AS yr,
           o_orderstatus AS status,
           o_orderpriority AS priority,
           COUNT(*) AS n_orders,
           ROUND(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                      AS DOUBLE) / 100.0, 2) AS revenue
    FROM {orders}
    WHERE o_orderdate >= DATE '1995-01-01'
      AND o_orderdate <  DATE '1997-01-01'
    GROUP BY ALL
    ORDER BY yr, status, priority
"""


@query("sql_group_by_all_text",
       sql=_GROUPBYALL_SQL.format(orders="orders"))
def sql_group_by_all_text(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """GROUP BY ALL stated as SQL text: the analyzer must infer the
    grouping keys from the select list's non-aggregate items —
    including the COMPUTED EXTRACT(year ...) expression, the case
    that separates real GROUP BY ALL support from sugar over bare
    columns. Both engines (Spark >= 3.4, DuckDB) accept the statement
    verbatim, so the driver hash-grades two independent
    implementations of the same inference rule. Money sums ride the
    exact-cents discipline (sum BIGINT cents, divide once).

    Scale: compiles to the identical physical plan as an explicit
    GROUP BY — one map-side-combined hash aggregate over the
    date-pruned orders scan (the two date predicates push down to
    the parquet reader); grouping-key inference is analysis-time
    only."""
    names = _views(spark, sf_dir, "orders", suffix="gball")
    return spark.sql(_GROUPBYALL_SQL.format(**names))


_VALUESDIM_SQL = """
    SELECT COALESCE(t.tier, 'standard') AS tier,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o.o_custkey) AS n_customers,
           ROUND(CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                      AS DOUBLE) / 100.0, 2) AS revenue
    FROM {orders} o
    LEFT JOIN (VALUES ('1-URGENT', 'expedite'),
                      ('2-HIGH',   'expedite'),
                      ('3-MEDIUM', 'queue')) AS t(prio, tier)
      ON o.o_orderpriority = t.prio
    GROUP BY COALESCE(t.tier, 'standard')
    ORDER BY tier
"""


@query("sql_values_inline_dim",
       sql=_VALUESDIM_SQL.format(orders="orders"))
def sql_values_inline_dim(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """An inline VALUES derived table stated as SQL text: the
    priority -> routing-tier mapping lives IN the statement (the
    ad-hoc lookup-table idiom analysts reach for before a dim table
    exists), LEFT-joined so unmapped priorities fall through to a
    COALESCE default — exercising the parser's VALUES-with-column-
    aliases grammar, derived-table aliasing, and null-producing
    outer-join semantics in one shot, verbatim on both engines.

    Scale: the VALUES relation is a 3-row LocalRelation — Catalyst
    broadcasts it, so the join adds zero shuffles to the single
    map-side-combined aggregate over the orders scan (the pytest
    plan test pins the BroadcastHashJoin + LocalTableScan shape)."""
    names = _views(spark, sf_dir, "orders", suffix="valdim")
    return spark.sql(_VALUESDIM_SQL.format(**names))


_RANGEWIN_SQL = """
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             COUNT(*) AS n_events,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
      FROM {events}
      GROUP BY event_type, date_trunc('day', ts)
    )
    SELECT event_type, day,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(SUM(n_events) OVER (
               PARTITION BY event_type ORDER BY day
               RANGE BETWEEN INTERVAL 6 DAY PRECEDING
               AND CURRENT ROW) AS BIGINT) AS trailing7_events,
           ROUND(CAST(SUM(cents) OVER (
               PARTITION BY event_type ORDER BY day
               RANGE BETWEEN INTERVAL 6 DAY PRECEDING
               AND CURRENT ROW) AS DOUBLE) / 100.0, 2)
             AS trailing7_value
    FROM daily
    ORDER BY event_type, day
"""


@query("sql_range_interval_window",
       sql=_RANGEWIN_SQL.format(events="events"))
def sql_range_interval_window(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """A CALENDAR-range window frame stated as SQL text: trailing
    7-day event count and value per type via RANGE BETWEEN INTERVAL
    6 DAY PRECEDING — the frame kind that differs semantically from
    ROWS whenever days are missing (a RANGE frame looks back by TIME,
    so a gap shrinks the window; a ROWS 6 PRECEDING frame would
    silently reach further back). Both engines parse the statement
    verbatim, so the driver hash-grades two independent
    interval-frame implementations against each other. Exact integer
    cents through the window sum; one division per output row.

    Scale: one data-grain map-side-combined (type, day) rollup; both
    interval windows share ONE partitioned sort over calendar-grain
    rows — never a global window."""
    names = _views(spark, sf_dir, "events", suffix="rangewin")
    return spark.sql(_RANGEWIN_SQL.format(**names))


_NAMEDWIN_SQL = """
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             COUNT(*) AS n_events
      FROM {events}
      GROUP BY event_type, date_trunc('day', ts)
    )
    SELECT event_type, day,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(SUM(n_events) OVER cum AS BIGINT) AS cum_events,
           CAST(MAX(n_events) OVER cum AS BIGINT) AS peak_so_far,
           CAST(RANK() OVER ld AS INT) AS loudest_day_rank
    FROM daily
    WINDOW cum AS (PARTITION BY event_type ORDER BY day
                   ROWS UNBOUNDED PRECEDING),
           ld AS (PARTITION BY event_type
                  ORDER BY n_events DESC, day)
    ORDER BY event_type, day
"""


@query("sql_named_window_text",
       sql=_NAMEDWIN_SQL.format(events="events"))
def sql_named_window_text(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """The named-WINDOW clause stated as SQL text: two window specs
    declared once in a WINDOW clause and referenced by NAME from the
    select list (`cum` reused by two aggregates, `ld` by the rank) —
    the grammar feature that keeps multi-window statements readable
    and lets the analyzer prove frame sharing. Both engines parse the
    statement verbatim, so the driver hash-grades two independent
    implementations of named-window resolution.

    Scale: one data-grain map-side-combined (type, day) rollup; both
    named windows are event-type-PARTITIONED over calendar-grain rows
    and the two `cum` aggregates share ONE sort."""
    names = _views(spark, sf_dir, "events", suffix="namedwin")
    return spark.sql(_NAMEDWIN_SQL.format(**names))


_FILTERAGG_SQL = """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F')
                AS BIGINT) AS n_finished,
           CAST(COUNT(DISTINCT o_custkey)
                  FILTER (WHERE o_orderstatus = 'O')
                AS BIGINT) AS n_open_customers,
           ROUND(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                   FILTER (WHERE o_orderstatus = 'F')
                 / 100e0, 2) AS finished_revenue,
           ROUND(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                   FILTER (WHERE o_orderdate >= DATE '1995-01-01')
                 / (100e0 * COUNT(*)
                      FILTER (WHERE o_orderdate >= DATE '1995-01-01')),
                 6) AS avg_price_since_95
    FROM {orders}
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


@query("sql_filtered_agg_text",
       sql=_FILTERAGG_SQL.format(orders="orders"))
def sql_filtered_agg_text(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """The SQL:2003 aggregate FILTER clause stated as SQL text: five
    aggregates over ONE scan, each with its own per-aggregate
    predicate — plain COUNT, filtered COUNT, filtered
    COUNT(DISTINCT), a filtered exact-cents SUM (the r9 money
    convention: integer sub-units summed, divided once), and a
    filtered exact mean built as filtered-SUM over filtered-COUNT.
    FILTER is the standard way to fold k conditional rollups into
    one pass without CASE-wrapping every argument (and unlike CASE,
    composes with DISTINCT); both engines parse the statement
    verbatim, so the driver hash-grades two independent FILTER
    implementations — including the distinct-rewrite interaction,
    where Spark's Expand must route each filter to its own
    aggregate group. QUALIFY was considered for this slot and
    rejected: open-source Spark 4.1 does not parse it.

    Scale: one parquet scan, one map-side-combined groupBy on the
    5-value priority key; the single COUNT(DISTINCT) triggers one
    Expand over the filtered rows only. No joins, no windows."""
    names = _views(spark, sf_dir, "orders", suffix="filteragg")
    return spark.sql(_FILTERAGG_SQL.format(**names))
