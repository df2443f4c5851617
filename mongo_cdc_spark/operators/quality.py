"""Data-quality operators: single-pass column profiling and
deequ-style constraint validation.

Production context: every serious ingestion / training-data pipeline
gates its tables on profiles (null rates, cardinalities, ranges) and
declarative constraints (uniqueness, completeness, referential
integrity) before downstream consumption — AWS Deequ, Great
Expectations, dbt tests. The reference has no quality surface at all
(/root/reference/main.go is a straight-pipe CDC relay), so this is
engine-side infrastructure for the analytical/training surface,
designed around Spark's aggregation machinery:

- The profiler NEVER puts k countDistinct aggregates in one groupBy —
  that triggers Catalyst's distinct-rewrite Expand (k-way row
  multiplication through a PartialMerge; the 151 s pathology found by
  the round-3 scale sweep). Typed min/max/null stats come from ONE
  plain single-pass agg; per-column exact cardinalities come from a
  melt (k x N narrow row explosion) followed by ONE
  groupBy(column).agg(countDistinct(value)) — a single shuffle whose
  key space is k columns, each task pre-collapsing to its distinct
  (column, value) pairs map-side.
- Constraint checks are each a single aggregate or a key-distinct
  anti-join; results union into one tiny report frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mongo_cdc_spark.io import load_table
from mongo_cdc_spark.operators import make_registry

QUERIES, ORACLE, query = make_registry()


_NUM_COLS = ("o_orderkey", "o_custkey", "o_totalprice")
_STR_COLS = ("o_orderstatus", "o_orderpriority")


@query("quality_profile_orders", sql="""
    WITH melted AS (
        SELECT 'o_orderkey' AS col, CAST(o_orderkey AS VARCHAR) AS v
        FROM orders
        UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
        UNION ALL SELECT 'o_totalprice', CAST(o_totalprice AS VARCHAR)
        FROM orders
        UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders
        UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders
    ), card AS (
        SELECT col, COUNT(*) - COUNT(v) AS null_count,
               COUNT(DISTINCT v) AS n_distinct
        FROM melted GROUP BY col
    ), typed AS (
        SELECT 'o_orderkey' AS col, ROUND(MIN(o_orderkey), 4) AS min_num,
               ROUND(MAX(o_orderkey), 4) AS max_num,
               CAST(NULL AS VARCHAR) AS min_str,
               CAST(NULL AS VARCHAR) AS max_str
        FROM orders
        UNION ALL
        SELECT 'o_custkey', ROUND(MIN(o_custkey), 4),
               ROUND(MAX(o_custkey), 4), NULL, NULL FROM orders
        UNION ALL
        SELECT 'o_totalprice', ROUND(MIN(o_totalprice), 4),
               ROUND(MAX(o_totalprice), 4), NULL, NULL FROM orders
        UNION ALL
        SELECT 'o_orderstatus', NULL, NULL, MIN(o_orderstatus),
               MAX(o_orderstatus) FROM orders
        UNION ALL
        SELECT 'o_orderpriority', NULL, NULL, MIN(o_orderpriority),
               MAX(o_orderpriority) FROM orders
    ), n AS (SELECT COUNT(*) AS n_rows FROM orders)
    SELECT c.col, n.n_rows, c.null_count, c.n_distinct,
           t.min_num, t.max_num, t.min_str, t.max_str
    FROM card c JOIN typed t USING (col) CROSS JOIN n
    ORDER BY c.col
""")
def quality_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass-per-concern column profiler over `orders` (the
    Deequ/Great-Expectations "analyze" primitive): per column —
    null count, EXACT distinct cardinality, typed min/max.

    Scale (see module docstring): pass 1 is one plain aggregation
    (min/max/null counters for every column at once — no distinct, no
    Expand); pass 2 melts to (column, value) and aggregates distincts
    with ONE shuffle keyed by column name. At 100 TB the melt is a
    narrow k-x projection whose shuffle carries only per-task distinct
    pairs; for ad-hoc profiling where exactness is negotiable, swap
    countDistinct for approx_count_distinct and pass 2 collapses to
    fixed-size HLL state per column (the Deequ default)."""
    orders = load_table(spark, sf_dir, "orders")

    melted = None
    for c in _NUM_COLS + _STR_COLS:
        part = orders.select(
            F.lit(c).alias("col"),
            F.col(c).cast("string").alias("v"))
        melted = part if melted is None else melted.unionByName(part)
    card = melted.groupBy("col").agg(
        (F.count(F.lit(1)) - F.count("v")).alias("null_count"),
        F.countDistinct("v").alias("n_distinct"))

    typed_rows = []
    for c in _NUM_COLS:
        typed_rows.append(orders.agg(
            F.lit(c).alias("col"),
            F.round(F.min(c).cast("double"), 4).alias("min_num"),
            F.round(F.max(c).cast("double"), 4).alias("max_num"),
            F.lit(None).cast("string").alias("min_str"),
            F.lit(None).cast("string").alias("max_str")))
    for c in _STR_COLS:
        typed_rows.append(orders.agg(
            F.lit(c).alias("col"),
            F.lit(None).cast("double").alias("min_num"),
            F.lit(None).cast("double").alias("max_num"),
            F.min(c).alias("min_str"),
            F.max(c).alias("max_str")))
    typed = typed_rows[0]
    for t in typed_rows[1:]:
        typed = typed.unionByName(t)

    n = orders.agg(F.count(F.lit(1)).alias("n_rows"))
    return (card.join(typed, "col").crossJoin(F.broadcast(n))
            .select("col", "n_rows", "null_count", "n_distinct",
                    "min_num", "max_num", "min_str", "max_str")
            .orderBy("col"))


@query("quality_constraint_checks", sql="""
    SELECT check_name, violations, violations = 0 AS passed FROM (
        SELECT 'orders_pk_unique' AS check_name,
               (SELECT COUNT(*) FROM (
                    SELECT o_orderkey FROM orders
                    GROUP BY o_orderkey HAVING COUNT(*) > 1)) AS violations
        UNION ALL
        SELECT 'orders_custkey_complete',
               (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL)
        UNION ALL
        SELECT 'orders_fk_customer',
               (SELECT COUNT(*) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = o.o_custkey))
        UNION ALL
        SELECT 'lineitem_fk_orders',
               (SELECT COUNT(*) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey))
        UNION ALL
        SELECT 'lineitem_qty_in_1_50',
               (SELECT COUNT(*) FROM lineitem
                WHERE l_quantity < 1 OR l_quantity > 50)
        UNION ALL
        SELECT 'lineitem_price_positive',
               (SELECT COUNT(*) FROM lineitem WHERE l_extendedprice <= 0)
    ) ORDER BY check_name
""")
def quality_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint-validation suite (the Deequ "verify"
    primitive): primary-key uniqueness, completeness, referential
    integrity (orders->customer, lineitem->orders), and domain range
    checks, reported as one (check, violations, passed) frame.

    Scale: uniqueness is a keyed agg (map-side partial); completeness
    and ranges are plain filtered counts pushed into the scan;
    referential integrity is a LEFT ANTI join on the key — Catalyst
    picks broadcast when the dimension's distinct key set is small and
    a co-partitioned shuffle otherwise, and AQE can convert at
    runtime. Each check stays an independent 1-row aggregate, so a
    100 TB run parallelizes checks across the cluster rather than
    fusing them into one monster plan."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")

    def _one(name: str, cnt: DataFrame) -> DataFrame:
        return cnt.select(F.lit(name).alias("check_name"),
                          F.col("violations"))

    pk_dupes = (orders.groupBy("o_orderkey")
                .agg(F.count(F.lit(1)).alias("n"))
                .filter(F.col("n") > 1)
                .agg(F.count(F.lit(1)).alias("violations")))
    custkey_nulls = orders.agg(
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("violations"))
    fk_customer = (orders.join(customer,
                               orders.o_custkey == customer.c_custkey,
                               "left_anti")
                   .agg(F.count(F.lit(1)).alias("violations")))
    fk_orders = (lineitem.join(orders,
                               lineitem.l_orderkey == orders.o_orderkey,
                               "left_anti")
                 .agg(F.count(F.lit(1)).alias("violations")))
    qty_range = lineitem.agg(
        F.count(F.when((F.col("l_quantity") < 1)
                       | (F.col("l_quantity") > 50), 1)).alias("violations"))
    price_pos = lineitem.agg(
        F.count(F.when(F.col("l_extendedprice") <= 0, 1)).alias("violations"))

    report = (
        _one("orders_pk_unique", pk_dupes)
        .unionByName(_one("orders_custkey_complete", custkey_nulls))
        .unionByName(_one("orders_fk_customer", fk_customer))
        .unionByName(_one("lineitem_fk_orders", fk_orders))
        .unionByName(_one("lineitem_qty_in_1_50", qty_range))
        .unionByName(_one("lineitem_price_positive", price_pos)))
    return (report
            .select("check_name", "violations",
                    (F.col("violations") == 0).alias("passed"))
            .orderBy("check_name"))
