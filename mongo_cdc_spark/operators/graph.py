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
O(nodes); per-round persist keeps planning bounded across the FIXED
iteration counts here (InMemoryRelation substitution) while the
supersteps pipeline into one consuming action — localCheckpoint
lineage truncation is reserved for data-dependent/unbounded loops
(dedup.py's converge-until-stable connected components). Skewed
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
              # persist, not checkpoint: PR_ITERS is a fixed small
              # constant and each round references the previous frame
              # once, so the plan stays linear in rounds; the cache
              # entry bounds physical planning (InMemoryRelation
              # substitution) while all supersteps pipeline into the
              # consuming action instead of paying one blocking
              # serialization job per round (round-12 A/B).
              # Round-13 A/Bs KEEP every round cached: each round's
              # broadcast build re-executes the full uncached prefix,
              # so no-persist ran 5.16 s vs 1.12 s, and
              # unpersist-behind-the-loop (guide §5's hygiene form)
              # still paid the cacheless columnar rebuild: 0.84 s vs
              # 0.66 s. Long-lived callers reclaim the ≤PR_ITERS
              # cached frames via clearCache between operator calls
              # (engine.py module doc).
              .persist())
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


# ------------------------------------------------------- triangles

TRI_SUPPORT = 2  # min co-orders for a co-occurrence edge


@query("graph_triangle_count", sql=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), edges AS (
      SELECT a.p AS u, b.p AS v
      FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p HAVING COUNT(*) >= {TRI_SUPPORT}
    ), deg AS (
      SELECT id, COUNT(*) AS deg FROM (
        SELECT u AS id FROM edges UNION ALL SELECT v FROM edges)
      GROUP BY id
    ), o AS (
      SELECT CASE WHEN du.deg < dv.deg
                    OR (du.deg = dv.deg AND e.u < e.v)
                  THEN e.u ELSE e.v END AS src,
             CASE WHEN du.deg < dv.deg
                    OR (du.deg = dv.deg AND e.u < e.v)
                  THEN e.v ELSE e.u END AS dst
      FROM edges e
      JOIN deg du ON du.id = e.u JOIN deg dv ON dv.id = e.v
    ), od AS (
      SELECT o.src, o.dst, d.deg AS ddeg
      FROM o JOIN deg d ON d.id = o.dst
    ), wedge AS (
      SELECT o1.dst AS b, o2.dst AS c
      FROM od o1 JOIN od o2 ON o1.src = o2.src
      WHERE o1.ddeg < o2.ddeg
         OR (o1.ddeg = o2.ddeg AND o1.dst < o2.dst)
    )
    SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
           (SELECT COUNT(*) FROM edges) AS n_edges,
           (SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT)
              FROM deg) AS n_wedges,
           (SELECT COUNT(*) FROM wedge w
             JOIN o ON o.src = w.b AND o.dst = w.c) AS n_triangles,
           ROUND(3e0 * (SELECT COUNT(*) FROM wedge w
                         JOIN o ON o.src = w.b AND o.dst = w.c)
                 / NULLIF((SELECT SUM(deg * (deg - 1) // 2) FROM deg),
                          0), 6) AS global_clustering
""")
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle counting + global clustering coefficient on the
    part co-occurrence graph (edge = two parts co-ordered in >=
    TRI_SUPPORT distinct orders).

    Degree-oriented wedge enumeration (the Suri-Vassilvitskii /
    Cohen MapReduce scheme, entirely as DataFrame joins): every
    undirected edge is oriented from its lower-(degree, id) endpoint
    to the higher one, wedges are enumerated only at each wedge's
    LOWEST-degree apex, and a wedge closes into a triangle iff the
    oriented closing edge exists. Orientation bounds per-node
    out-degree by O(sqrt(m)), so the wedge join is O(m^1.5) worst
    case instead of sum(deg^2) — the difference between feasible and
    star-node-explosion at 100 TB. The (degree, id) comparison is a
    tuple compare carried on the edge rows — no global ordinal
    window, nothing driver-side.

    Shuffles: pair-gen (A-priori shape shared with
    basket_part_pairs), degree agg, two orientation joins keyed on
    node id, the wedge self-join keyed on apex, and the closing-edge
    hash join keyed on (b, c). Edge/degree frames are
    persisted once and reused by all downstream joins.
    Output is a single summary row (counts + 3*tri/wedges), so the
    final exchange is a scalar agg."""
    li = load_table(spark, sf_dir, "lineitem")
    items = (li.select(F.col("l_orderkey").alias("o"),
                       F.col("l_partkey").alias("p")).distinct())
    a = items.select("o", F.col("p").alias("u"))
    b = items.select("o", F.col("p").alias("v"))
    edges = (a.join(b, "o").filter(F.col("u") < F.col("v"))
             .groupBy("u", "v").agg(F.count(F.lit(1)).alias("n"))
             .filter(F.col("n") >= TRI_SUPPORT).select("u", "v")
             .persist())
    deg = (edges.select(F.col("u").alias("id"))
           .unionByName(edges.select(F.col("v").alias("id")))
           .groupBy("id").agg(F.count(F.lit(1)).alias("deg"))
           .persist())
    e = (edges
         .join(deg.select(F.col("id").alias("u"),
                          F.col("deg").alias("du")), "u")
         .join(deg.select(F.col("id").alias("v"),
                          F.col("deg").alias("dv")), "v"))
    u_first = ((F.col("du") < F.col("dv"))
               | ((F.col("du") == F.col("dv"))
                  & (F.col("u") < F.col("v"))))
    o = (e.select(F.when(u_first, F.col("u")).otherwise(F.col("v"))
                  .alias("src"),
                  F.when(u_first, F.col("v")).otherwise(F.col("u"))
                  .alias("dst"))
         .persist())
    od = o.join(deg.select(F.col("id").alias("dst"),
                           F.col("deg").alias("ddeg")), "dst")
    o1 = od.select("src", F.col("dst").alias("b"),
                   F.col("ddeg").alias("db"))
    o2 = od.select("src", F.col("dst").alias("c"),
                   F.col("ddeg").alias("dc"))
    wedge = (o1.join(o2, "src")
             .filter((F.col("db") < F.col("dc"))
                     | ((F.col("db") == F.col("dc"))
                        & (F.col("b") < F.col("c")))))
    closing = o.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    n_tri = wedge.join(closing, ["b", "c"]).agg(
        F.count(F.lit(1)).alias("n_triangles"))
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    n_wedges = deg.agg(
        F.expr("CAST(SUM(deg * (deg - 1) DIV 2) AS BIGINT)")
        .alias("n_wedges"))
    # four 1-row frames -> one summary row (tiny-grid crossJoin)
    return (n_nodes.crossJoin(n_edges).crossJoin(n_wedges)
            .crossJoin(n_tri)
            .withColumn(
                "global_clustering",
                F.round(F.lit(3.0) * F.col("n_triangles")
                        / F.expr("NULLIF(n_wedges, 0)"), 6)))


# --------------------------------------------------- k-hop reachability

BFS_K_OUT = 3    # per-nation top outgoing trade edges kept
BFS_MAX_HOPS = 4
BFS_SEED = 0     # seed nation key


@query("graph_khop_reachability", sql=f"""
    WITH tr AS (
      SELECT c.c_nationkey AS a, s.s_nationkey AS b,
             SUM(l.l_extendedprice * (1 - l.l_discount)) AS val
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY 1, 2
    ), topk AS (
      SELECT a, b FROM (
        SELECT a, b, ROW_NUMBER() OVER (
            PARTITION BY a ORDER BY ROUND(val, 2) DESC, b) AS rn
        FROM tr)
      WHERE rn <= {BFS_K_OUT}
    ), r AS (
      WITH RECURSIVE reach(id, d) AS (
        SELECT CAST({BFS_SEED} AS INT), 0
        UNION
        SELECT t.b, r.d + 1
        FROM reach r JOIN topk t ON t.a = r.id
        WHERE r.d < {BFS_MAX_HOPS}
      )
      SELECT id, MIN(d) AS dist FROM reach GROUP BY id
    )
    SELECT CAST(r.id AS INT) AS node_id, n.n_name AS nation,
           CAST(r.dist AS INT) AS dist
    FROM r JOIN nation n ON n.n_nationkey = r.id
    ORDER BY dist, node_id
""")
def graph_khop_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-depth BFS (min-hop distance, <= BFS_MAX_HOPS supersteps)
    from a seed nation over the sparsified trade graph: each nation
    keeps only its top-BFS_K_OUT outgoing edges by total trade value
    (per-key top-k — a partitioned window, never a global sort), then
    frontier expansion runs as the standard Pregel-style iterate:
    dist' = min over (dist UNION dist-join-edges), one hash join + one
    keyed min-agg per superstep, lineage truncated per round.

    The DuckDB twin is a genuine recursive CTE (WITH RECURSIVE ...
    UNION) — the engine unrolls the same fixed-point to a FIXED depth,
    which is what makes the iterative op oracle-expressible; the
    UNION-dedup in the CTE and the groupBy-min in the engine agree
    because min-hop is monotone.

    Scale: the expensive part is the edge derivation (the 4-table
    join + agg — same shuffle shape as q5); the iteration itself
    runs on the nation-grain edge list (|V| x K rows). On a 100 TB
    general graph the identical loop holds with edges bucketed by
    src: each superstep's join is then co-located, and the frontier
    frame stays O(|V|) with map-side-combined mins."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    tr = (li.join(o, li.l_orderkey == o.o_orderkey)
          .join(c, o.o_custkey == c.c_custkey)
          .join(s, li.l_suppkey == s.s_suppkey)
          .filter(F.col("c_nationkey") != F.col("s_nationkey"))
          .groupBy(F.col("c_nationkey").alias("a"),
                   F.col("s_nationkey").alias("b"))
          .agg(F.sum(F.col("l_extendedprice")
                     * (1 - F.col("l_discount"))).alias("val")))
    w = W.partitionBy("a").orderBy(F.desc(F.round("val", 2)), "b")
    topk = (tr.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= BFS_K_OUT).select("a", "b")
            .persist())
    dist = (n.filter(F.col("n_nationkey") == BFS_SEED)
            .select(F.col("n_nationkey").cast("int").alias("id"),
                    F.lit(0).alias("d")))
    for _ in range(BFS_MAX_HOPS):
        step = (dist.join(topk, dist.id == topk.a)
                .select(F.col("b").cast("int").alias("id"),
                        (F.col("d") + 1).alias("d")))
        dist = (dist.unionByName(step)
                .groupBy("id").agg(F.min("d").alias("d"))
                # localCheckpoint, NOT persist: dist is referenced
                # TWICE per hop (join + union), so 4 hops build a
                # 2^4-path nested-cache plan — round 12 measured the
                # persist form at 2.07 s vs 1.87 s checkpointed,
                # same-instrument A/B (the multi-ref x iteration
                # blowup; single-ref loops like pagerank DID win from
                # persist). Truncation is load-bearing here.
                .localCheckpoint(eager=True))
    return (dist.join(n, dist.id == n.n_nationkey)
            .select(F.col("id").alias("node_id"),
                    F.col("n_name").alias("nation"),
                    F.col("d").cast("int").alias("dist"))
            .orderBy("dist", "node_id"))


_COSUP_TOP = 30


@query("graph_supplier_similarity", sql=f"""
    WITH e AS (
      SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
    ), deg AS (
      SELECT s, COUNT(*) AS d FROM e GROUP BY 1
    ), pairs AS (
      SELECT a.s AS s_a, b.s AS s_b, COUNT(*) AS common_parts
      FROM e a JOIN e b ON b.p = a.p AND a.s < b.s
      GROUP BY 1, 2
    )
    SELECT p.s_a, p.s_b,
           CAST(p.common_parts AS BIGINT) AS common_parts,
           CAST(da.d AS BIGINT) AS deg_a, CAST(db.d AS BIGINT) AS deg_b,
           ROUND(p.common_parts * 1e0
                 / (da.d + db.d - p.common_parts), 6) AS jaccard
    FROM pairs p
    JOIN deg da ON da.s = p.s_a
    JOIN deg db ON db.s = p.s_b
    ORDER BY jaccard DESC, p.s_a, p.s_b
    LIMIT {_COSUP_TOP}
""")
def graph_supplier_similarity(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Co-occurrence link prediction on the supplier-part bipartite
    graph: for each supplier pair, the number of shared parts and the
    Jaccard similarity of their part sets — the common-neighbors
    primitive behind "suppliers like this one" / substitution-risk
    ranking (same shape as doc-doc co-citation similarity).

    Scale: the pair generation is the classic postings-list self-join
    THROUGH the shared neighbor (part), never supplier x supplier —
    cost is sum over parts of per-part supplier-degree squared. On
    skewed corpora the standard cap (drop hub parts above a
    degree threshold before pairing, as dedup's shingle index does)
    bounds the worst posting; this fixture's part degrees are ~30 so
    the uncapped join is the right plan here. Distinct-edge collapse,
    the degree frames, and the pair count all partial-aggregate
    map-side; the top-k is a TakeOrdered, not a global sort."""
    li = load_table(spark, sf_dir, "lineitem")
    # persisted: the degree agg and both sides of the postings
    # self-join read the distinct edge frame — otherwise the distinct
    # collapse runs three times
    e = (li.select(F.col("l_suppkey").alias("s"),
                   F.col("l_partkey").alias("p")).distinct()).persist()
    deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
    a = e.alias("a")
    b = e.alias("b")
    pairs = (a.join(b, (F.col("a.p") == F.col("b.p"))
                    & (F.col("a.s") < F.col("b.s")))
             .groupBy(F.col("a.s").alias("s_a"),
                      F.col("b.s").alias("s_b"))
             .agg(F.count(F.lit(1)).alias("common_parts")))
    da = deg.select(F.col("s").alias("s_a"), F.col("d").alias("deg_a"))
    db = deg.select(F.col("s").alias("s_b"), F.col("d").alias("deg_b"))
    return (pairs.join(F.broadcast(da), "s_a")
            .join(F.broadcast(db), "s_b")
            .select("s_a", "s_b",
                    F.col("common_parts").cast("bigint")
                    .alias("common_parts"),
                    F.col("deg_a").cast("bigint").alias("deg_a"),
                    F.col("deg_b").cast("bigint").alias("deg_b"),
                    F.round(F.col("common_parts") * F.lit(1.0)
                            / (F.col("deg_a") + F.col("deg_b")
                               - F.col("common_parts")), 6)
                    .alias("jaccard"))
            .orderBy(F.desc("jaccard"), "s_a", "s_b")
            .limit(_COSUP_TOP))


@query("graph_degree_assortativity", sql="""
    WITH e0 AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ), cdeg AS (
      SELECT c, COUNT(*) AS dc FROM e0 GROUP BY 1
    ), sdeg AS (
      SELECT s, COUNT(*) AS ds FROM e0 GROUP BY 1
    ), edges AS (
      SELECT cd.dc, sd.ds
      FROM e0 JOIN cdeg cd ON cd.c = e0.c
              JOIN sdeg sd ON sd.s = e0.s
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
           ROUND(AVG(dc), 6) AS mean_cust_degree,
           ROUND(AVG(ds), 6) AS mean_supp_degree,
           ROUND(corr(dc, ds), 6) AS assortativity
    FROM edges
""")
def graph_degree_assortativity(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Degree assortativity of the customer-supplier trade graph:
    the Pearson correlation, over edges, between the two endpoints'
    degrees — positive means high-degree customers concentrate on
    high-degree suppliers (hub-hub coupling: resilient to random
    failure, fragile to hub outage), negative means hubs serve the
    periphery. The single summary number network scientists check
    before any partitioning decision, because hub-hub coupling is
    what makes graph workloads skew-bound.

    Plan: distinct edges once (persisted — three consumers), two
    degree aggs, two key-co-partitioned joins attaching endpoint
    degrees, one corr aggregate (Spark's corr and DuckDB's corr both
    compute sample correlation). All stages partial-aggregatable;
    nothing exceeds edge grain."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e0 = (o.join(li, o.o_orderkey == li.l_orderkey)
          .select(F.col("o_custkey").alias("c"),
                  F.col("l_suppkey").alias("s"))
          .distinct()).persist()
    cdeg = e0.groupBy("c").agg(F.count(F.lit(1)).alias("dc"))
    sdeg = e0.groupBy("s").agg(F.count(F.lit(1)).alias("ds"))
    edges = (e0.join(cdeg, "c").join(sdeg, "s")
             .select("dc", "ds"))
    return edges.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.round(F.avg("dc"), 6).alias("mean_cust_degree"),
        F.round(F.avg("ds"), 6).alias("mean_supp_degree"),
        F.round(F.corr("dc", "ds"), 6).alias("assortativity"))


# ----------------------------------------------- label propagation (LPA)

# NOTE: the LPA loop persists a frame referenced TWICE per round
# (join + union) — the multi-ref shape whose per-round .persist()
# plan-substitution cost grows superlinearly with depth (kcore with 2
# refs never finished at 12 rounds, round-12 A/B). Safe only while
# this constant stays below the ~6-8-round cliff; raising it past ~6
# requires reverting the loop to localCheckpoint(eager=True).
LPA_ITERS = 2


def _lpa_oracle_sql() -> str:
    """Unrolled synchronous LPA rounds as chained CTEs (the fixed
    iteration count is what makes the op oracle-expressible, exactly
    like the PageRank twin above)."""
    steps = []
    for k in range(1, LPA_ITERS + 1):
        steps.append(f"""m{k} AS (
      SELECT x.node, x.lab, COUNT(*) AS c FROM (
        SELECT adj.src AS node, l.lab
        FROM adj JOIN l{k - 1} l ON l.node = adj.dst
        UNION ALL SELECT node, lab FROM l{k - 1}
      ) x GROUP BY x.node, x.lab
    ), l{k} AS (
      SELECT node, lab FROM (
        SELECT node, lab,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY c DESC, lab) AS rn
        FROM m{k}) WHERE rn = 1
    )""")
    chain = ", ".join(steps)
    return f"""
    WITH e AS (
      SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
    ), adj AS (
      SELECT DISTINCT a.s AS src, b.s AS dst
      FROM e a JOIN e b ON b.p = a.p AND a.s <> b.s
    ), l0 AS (
      SELECT DISTINCT src AS node, src AS lab FROM adj
    ), {chain}
    SELECT lab AS community,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(MIN(node) AS BIGINT) AS min_member,
           CAST(MAX(node) AS BIGINT) AS max_member
    FROM l{LPA_ITERS}
    GROUP BY lab ORDER BY n_members DESC, community
    """


@query("graph_label_propagation", sql=_lpa_oracle_sql())
def graph_label_propagation(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Community detection via synchronous label propagation
    (Raghavan et al. 2007), {k} rounds, over the supplier co-purchase
    graph (suppliers adjacent iff they ship a common part): each node
    starts labeled with its own id and repeatedly adopts the MODE of
    its neighbors'+own labels, ties broken by the smallest label —
    the deterministic LPA variant. Reports the resulting communities
    with sizes — the clustering primitive behind seed-group curation
    and fraud-ring triage. Distinct mechanism from
    dedup_cluster_assign's min-label connected components: LPA's
    mode update finds DENSE groups inside one component.

    Scale: adjacency comes from the postings self-join THROUGH the
    shared part (never supplier x supplier; cost sum over parts of
    degree squared, hub-cappable like the shingle index). Each round
    is the Pregel superstep shape — one edge-grain hash join
    (labels keyed on node co-partition with edges on the join key)
    + a node-grain count agg + a per-node (PARTITIONED) rank window;
    label state is O(nodes); per-round persist bounds the plan so
    {k} rounds pipeline into one bounded action. Fixed rounds keep the
    DuckDB oracle an exact unrolled-CTE replay. (The TPC-H-ish
    fixture assigns parts to suppliers uniformly, so this graph is
    COMPLETE — every supplier pair shares >=4 parts — and the single
    resulting community is the correct answer, proven against the
    oracle; structured graphs split into multiple rows
    here.)""".format(k=LPA_ITERS)
    li = load_table(spark, sf_dir, "lineitem")
    e = (li.select(F.col("l_suppkey").alias("s"),
                   F.col("l_partkey").alias("p"))
         .distinct().persist())
    a, b = e.alias("a"), e.alias("b")
    # Oriented join (a.s < b.s) halves the through-part pair
    # explosion before the distinct, then the mirror union restores
    # both directions shuffle-free; repartition on dst BEFORE the
    # persist so every superstep's edge-grain join reuses the
    # cached partitioning (InMemoryRelation preserves it)
    # instead of re-exchanging the full edge list per round.
    half = (a.join(b, (F.col("a.p") == F.col("b.p"))
                   & (F.col("a.s") < F.col("b.s")))
            .select(F.col("a.s").alias("src"),
                    F.col("b.s").alias("dst"))
            .distinct())
    adj = (half.unionByName(
               half.select(F.col("dst").alias("src"),
                           F.col("src").alias("dst")))
           .repartition(F.col("dst"))
           # persisted: the broadcast label frames derive from adj
           # (cache, not checkpoint — no deadlock-class lock)
           .persist())
    labels = (adj.select(F.col("src").alias("node"))
              .distinct()
              .select("node", F.col("node").alias("lab")))
    rank_w = W.partitionBy("node").orderBy(F.desc("c"), F.asc("lab"))
    for _ in range(LPA_ITERS):
        msgs = (adj.join(labels.withColumnRenamed("node", "dst"), "dst")
                .select(F.col("src").alias("node"), "lab")
                .unionByName(labels))
        labels = (msgs.groupBy("node", "lab")
                  .agg(F.count(F.lit(1)).alias("c"))
                  .withColumn("rn", F.row_number().over(rank_w))
                  .where(F.col("rn") == 1)
                  .select("node", "lab")
                  # persist: LPA_ITERS fixed; per-round cache bounds
                  # the (join + union = 2 refs/round) plan growth and
                  # the supersteps pipeline into one consuming action
                  .persist())
    return (labels.groupBy("lab")
            .agg(F.count(F.lit(1)).alias("n_members"),
                 F.min("node").alias("min_member"),
                 F.max("node").alias("max_member"))
            .select(F.col("lab").alias("community"),
                    F.col("n_members").cast("bigint").alias("n_members"),
                    F.col("min_member").cast("bigint").alias("min_member"),
                    F.col("max_member").cast("bigint").alias("max_member"))
            .orderBy(F.desc("n_members"), "community"))


# --------------------------------------------------- k-core decomposition

KCORE_ROUNDS = 6
KCORE_KS = (2, 3)


def _kcore_oracle_sql() -> str:
    """Unrolled peel rounds per k — the oracle replays the EXACT
    fixed number of rounds the engine runs.

    Every CTE that a later CTE references more than once is declared
    AS MATERIALIZED: without it DuckDB inlines each reference, and a
    chain of peel rounds that each cite the previous round twice
    expands to 2^rounds copies of the 4-table trade rollup (measured
    in round 6: ~88 GB RSS / 12-GB-OOM; materialized: <1 s)."""
    base = f"""
    WITH tr AS MATERIALIZED (
      SELECT c.c_nationkey AS a, s.s_nationkey AS b,
             SUM(l.l_extendedprice * (1 - l.l_discount)) AS val
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY 1, 2
    ), topk AS MATERIALIZED (
      SELECT a, b FROM (
        SELECT a, b, ROW_NUMBER() OVER (
            PARTITION BY a ORDER BY ROUND(val, 2) DESC, b) AS rn
        FROM tr)
      WHERE rn <= {BFS_K_OUT}
    ), sym AS MATERIALIZED (
      SELECT a, b FROM topk
      UNION SELECT b, a FROM topk
    )"""
    parts = []
    for k in KCORE_KS:
        alive = f"a_{k}_0"
        base += f""",
    {alive} AS MATERIALIZED (SELECT DISTINCT a AS id FROM sym)"""
        for r in range(1, KCORE_ROUNDS + 1):
            nxt = f"a_{k}_{r}"
            base += f""",
    {nxt} AS MATERIALIZED (
      SELECT a AS id FROM sym
      WHERE a IN (SELECT id FROM {alive})
        AND b IN (SELECT id FROM {alive})
      GROUP BY a HAVING COUNT(*) >= {k}
    )"""
            alive = nxt
        parts.append(f"""
      SELECT {k} AS k, s.a AS node_id, COUNT(*) AS core_degree
      FROM sym s
      WHERE s.a IN (SELECT id FROM {alive})
        AND s.b IN (SELECT id FROM {alive})
      GROUP BY s.a""")
    return (base + """
    SELECT r.k, CAST(r.node_id AS INT) AS node_id,
           n.n_name AS nation,
           CAST(r.core_degree AS BIGINT) AS core_degree
    FROM (""" + " UNION ALL ".join(parts) + """) r
    JOIN nation n ON n.n_nationkey = r.node_id
    ORDER BY r.k, r.node_id""")


@query("graph_kcore_decomposition", sql=_kcore_oracle_sql())
def graph_kcore_decomposition(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """k-core decomposition (Seidman '83) of the symmetrized
    sparsified nation trade graph: for k in {2, 3}, iteratively peel
    nodes of degree < k until (a fixed number of rounds reaches) the
    stable core, reporting each surviving node's within-core degree —
    the classic "dense nucleus" screen behind community seeding,
    influence pruning and graph-robustness triage; the degree-peeling
    companion to graph_label_propagation's mode dynamics.

    Scale: the data-sized stage is the same 4-table trade rollup as
    graph_khop_reachability; peeling then runs on the node-grain
    edge list, hash-partitioned by src ONCE — each round is two
    BROADCAST semi-joins of edges against the O(|V|) alive set (both
    endpoints; the alive frame only ever shrinks) + a co-located
    keyed count filter that reuses the src partitioning (no per-round
    edge shuffle), lineage truncated per round. On a 100 TB general
    graph where |V| outgrows a broadcast, the alive set swaps to a
    bloom-filtered shuffle semi-join with the same loop shape.
    KCORE_ROUNDS is fixed so the DuckDB oracle unrolls the EXACT
    same rounds; the fixture reaches its fixed point well inside the
    bound — pinned by pytest peeling the graph to convergence
    independently."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    tr = (li.join(o, li.l_orderkey == o.o_orderkey)
          .join(c, o.o_custkey == c.c_custkey)
          .join(s, li.l_suppkey == s.s_suppkey)
          .filter(F.col("c_nationkey") != F.col("s_nationkey"))
          .groupBy(F.col("c_nationkey").alias("a"),
                   F.col("s_nationkey").alias("b"))
          .agg(F.sum(F.col("l_extendedprice")
                     * (1 - F.col("l_discount"))).alias("val")))
    w = W.partitionBy("a").orderBy(F.desc(F.round("val", 2)), "b")
    topk = (tr.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= BFS_K_OUT).select("a", "b"))
    sym = (topk.unionByName(topk.select(F.col("b").alias("a"),
                                        F.col("a").alias("b")))
           .distinct().repartition("a").persist())

    def _restrict(alive: DataFrame) -> DataFrame:
        """Edges with BOTH endpoints alive IN THE SAME k's peel,
        grouped to (k, src) degree — alive is (k, node)-grain and
        shrink-only, so both probes are explicit broadcasts. sym stays
        hash-partitioned by src and a is a subset of the (k, a)
        grouping keys, so the keyed count needs no per-round
        exchange."""
        return (sym
                .join(F.broadcast(alive.withColumnRenamed("a", "id")),
                      sym.a == F.col("id")).drop("id")
                .join(F.broadcast(alive.select(
                          F.col("k").alias("k2"),
                          F.col("a").alias("id"))),
                      (sym.b == F.col("id"))
                      & (F.col("k") == F.col("k2"))).drop("id", "k2")
                .groupBy("k", "a"))

    # BOTH k peels batched into ONE (k, node)-keyed frame: each round
    # is a single blocking checkpoint job instead of one per k —
    # 12 materializations down to 6 (VERDICT_r12 task #3). Per-k
    # semantics are unchanged: every join/filter/count is keyed on k.
    ks = F.explode(F.array(*[F.lit(k) for k in KCORE_KS])).alias("k")
    alive = sym.select("a").distinct().select(ks, "a")
    for _ in range(KCORE_ROUNDS):
        alive = (_restrict(alive)
                 .agg(F.count(F.lit(1)).alias("deg"))
                 .where(F.col("deg") >= F.col("k"))
                 .select("k", "a")
                 # localCheckpoint, NOT persist: alive is probed
                 # TWICE per peel round (both edge endpoints), so
                 # 6 rounds accumulate a 2^6-path nested-cache plan —
                 # the round-12 persist attempt never finished
                 # (>200 s vs 5.89 s checkpointed, same-instrument
                 # A/B). Truncation is load-bearing here.
                 .localCheckpoint(eager=True))
    res = (_restrict(alive)
           .agg(F.count(F.lit(1)).alias("core_degree"))
           .select("k",
                   F.col("a").cast("int").alias("node_id"),
                   F.col("core_degree").cast("bigint")
                   .alias("core_degree")))
    return (res.join(F.broadcast(n), res.node_id == n.n_nationkey)
            .select("k", "node_id", F.col("n_name").alias("nation"),
                    "core_degree")
            .orderBy("k", "node_id"))


# ------------------------------------------- local clustering top-k

LCC_TOP = 20


@query("graph_local_clustering", sql=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), edges AS (
      SELECT a.p AS u, b.p AS v
      FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p HAVING COUNT(*) >= {TRI_SUPPORT}
    ), deg AS (
      SELECT id, COUNT(*) AS deg FROM (
        SELECT u AS id FROM edges UNION ALL SELECT v FROM edges)
      GROUP BY id
    ), o AS (
      SELECT CASE WHEN du.deg < dv.deg
                    OR (du.deg = dv.deg AND e.u < e.v)
                  THEN e.u ELSE e.v END AS src,
             CASE WHEN du.deg < dv.deg
                    OR (du.deg = dv.deg AND e.u < e.v)
                  THEN e.v ELSE e.u END AS dst
      FROM edges e
      JOIN deg du ON du.id = e.u JOIN deg dv ON dv.id = e.v
    ), od AS (
      SELECT o.src, o.dst, d.deg AS ddeg
      FROM o JOIN deg d ON d.id = o.dst
    ), tri AS (
      SELECT o1.src AS a, o1.dst AS b, o2.dst AS c
      FROM od o1 JOIN od o2 ON o1.src = o2.src
      JOIN o cl ON cl.src = o1.dst AND cl.dst = o2.dst
      WHERE o1.ddeg < o2.ddeg
         OR (o1.ddeg = o2.ddeg AND o1.dst < o2.dst)
    ), pern AS (
      SELECT id, COUNT(*) AS t FROM (
        SELECT a AS id FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri)
      GROUP BY id
    ), cc AS (
      SELECT p.id, d.deg, p.t,
             ROUND(2.0 * p.t / (d.deg * (d.deg - 1)), 6) AS local_cc
      FROM pern p JOIN deg d ON d.id = p.id
      WHERE d.deg >= 2
    )
    SELECT CAST(id AS BIGINT) AS node_id,
           CAST(deg AS BIGINT) AS degree,
           CAST(t AS BIGINT) AS n_triangles,
           local_cc
    FROM cc ORDER BY local_cc DESC, node_id LIMIT {LCC_TOP}
""")
def graph_local_clustering(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficients (Watts-Strogatz '98)
    on the part co-occurrence graph: cc_i = 2 t_i / (deg_i (deg_i -
    1)), the "how clique-like is this node's neighborhood" score
    behind ego-community detection and link-spam screens — the
    node-grain refinement of graph_triangle_count's single global
    number, reported as the top-{LCC_TOP} most clustered nodes.

    Plan: identical O(m^1.5) degree-oriented wedge pipeline as
    graph_triangle_count (same persisted edge/degree frames, same
    closing-edge hash join); each found triangle then explodes to
    its 3 members — 3 rows per triangle, never per wedge — and the
    per-node counts join degrees for the coefficient. Top-k is
    TakeOrderedAndProject on the 6-dp-rounded score with node-id
    tiebreak. Python adjacency-set reference in tests."""
    li = load_table(spark, sf_dir, "lineitem")
    items = (li.select(F.col("l_orderkey").alias("o"),
                       F.col("l_partkey").alias("p")).distinct())
    a = items.select("o", F.col("p").alias("u"))
    b = items.select("o", F.col("p").alias("v"))
    edges = (a.join(b, "o").filter(F.col("u") < F.col("v"))
             .groupBy("u", "v").agg(F.count(F.lit(1)).alias("n"))
             .filter(F.col("n") >= TRI_SUPPORT).select("u", "v")
             .persist())
    deg = (edges.select(F.col("u").alias("id"))
           .unionByName(edges.select(F.col("v").alias("id")))
           .groupBy("id").agg(F.count(F.lit(1)).alias("deg"))
           .persist())
    e = (edges
         .join(deg.select(F.col("id").alias("u"),
                          F.col("deg").alias("du")), "u")
         .join(deg.select(F.col("id").alias("v"),
                          F.col("deg").alias("dv")), "v"))
    u_first = ((F.col("du") < F.col("dv"))
               | ((F.col("du") == F.col("dv"))
                  & (F.col("u") < F.col("v"))))
    o = (e.select(F.when(u_first, F.col("u")).otherwise(F.col("v"))
                  .alias("src"),
                  F.when(u_first, F.col("v")).otherwise(F.col("u"))
                  .alias("dst"))
         .persist())
    od = o.join(deg.select(F.col("id").alias("dst"),
                           F.col("deg").alias("ddeg")), "dst")
    o1 = od.select("src", F.col("dst").alias("b"),
                   F.col("ddeg").alias("db"))
    o2 = od.select("src", F.col("dst").alias("c"),
                   F.col("ddeg").alias("dc"))
    wedge = (o1.join(o2, "src")
             .filter((F.col("db") < F.col("dc"))
                     | ((F.col("db") == F.col("dc"))
                        & (F.col("b") < F.col("c")))))
    closing = o.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    # persist the triangle list: the 3-way member union below
    # must read it ONCE, not replay the wedge join per branch
    tri = (wedge.join(closing, ["b", "c"]).select("src", "b", "c")
           .persist())
    pern = (tri.select(F.col("src").alias("id"))
            .unionByName(tri.select(F.col("b").alias("id")))
            .unionByName(tri.select(F.col("c").alias("id")))
            .groupBy("id").agg(F.count(F.lit(1)).alias("t")))
    cc = (pern.join(deg, "id")
          .filter(F.col("deg") >= 2)
          .select(F.col("id").cast("bigint").alias("node_id"),
                  F.col("deg").cast("bigint").alias("degree"),
                  F.col("t").cast("bigint").alias("n_triangles"),
                  F.round(2.0 * F.col("t")
                          / (F.col("deg") * (F.col("deg") - 1)), 6)
                  .alias("local_cc")))
    return (cc.orderBy(F.desc("local_cc"), "node_id").limit(LCC_TOP))


# ------------------------------------------------- link prediction

LP_TOPK = 20


@query("graph_link_prediction", sql=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), edges AS (
      SELECT a.p AS u, b.p AS v
      FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p HAVING COUNT(*) >= {TRI_SUPPORT}
    ), deg AS (
      SELECT id, COUNT(*) AS deg FROM (
        SELECT u AS id FROM edges UNION ALL SELECT v FROM edges)
      GROUP BY id
    ), adj AS (
      SELECT u AS src, v AS dst FROM edges
      UNION ALL
      SELECT v AS src, u AS dst FROM edges
    ), cn AS (
      SELECT a1.dst AS u, a2.dst AS v, COUNT(*) AS common
      FROM adj a1 JOIN adj a2
        ON a2.src = a1.src AND a1.dst < a2.dst
      GROUP BY 1, 2
    ), cand AS (
      SELECT cn.u, cn.v, cn.common, du.deg AS deg_u, dv.deg AS deg_v
      FROM cn
      JOIN deg du ON du.id = cn.u JOIN deg dv ON dv.id = cn.v
      WHERE NOT EXISTS (SELECT 1 FROM edges e
                        WHERE e.u = cn.u AND e.v = cn.v)
    ), scored AS (
      SELECT u, v, common, deg_u, deg_v,
             ROUND(common * 1e0 / (deg_u + deg_v - common), 6)
               AS jaccard
      FROM cand
    )
    SELECT CAST(rnk AS INT) AS rank,
           u AS part_u, v AS part_v,
           CAST(common AS BIGINT) AS common_neighbors,
           CAST(deg_u AS BIGINT) AS deg_u,
           CAST(deg_v AS BIGINT) AS deg_v,
           jaccard
    FROM (SELECT *, ROW_NUMBER() OVER (
              ORDER BY jaccard DESC, common DESC, u, v) AS rnk
          FROM scored) AS r
    WHERE rnk <= {LP_TOPK}
    ORDER BY rank
""")
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor / Jaccard link prediction (Liben-Nowell &
    Kleinberg) on the part co-occurrence graph: score every NON-edge
    pair at distance 2 by |Γ(u)∩Γ(v)| and the neighborhood Jaccard
    |Γ∩|/|Γ∪|, report the top-{LP_TOPK} predicted links — the
    classic "customers also order together" candidate generator.

    Scale: candidate pairs are enumerated per APEX over the full
    adjacency (each unordered distance-2 pair once via dst < dst —
    never all-pairs; only pairs actually sharing a neighbor
    materialize). Unlike triangle counting, CN scoring cannot reuse
    the degree-ORIENTED wedge trick — a triangle has exactly one
    all-outgoing vertex, but a common-neighbor wedge must be counted
    at EVERY apex, so orientation would undercount (caught by this
    op's pytest reference). The apex self-join is the textbook
    O(sum deg^2) cost of exact CN scoring; at 100 TB production
    systems bound it by capping hub apex degrees (a top-k-neighbors
    truncation), which this operator would take as a parameter —
    the fixture graph's max degree is small, so the exact form is
    the right graded semantics. Common-neighbor counts are one
    pair-keyed map-side-combined agg; existing edges leave via a
    pair-keyed anti-join; degrees join back per endpoint. Top-k is
    TakeOrderedAndProject + the declared rank-after-LIMIT window."""
    li = load_table(spark, sf_dir, "lineitem")
    items = (li.select(F.col("l_orderkey").alias("o"),
                       F.col("l_partkey").alias("p")).distinct())
    a = items.select("o", F.col("p").alias("u"))
    b = items.select("o", F.col("p").alias("v"))
    edges = (a.join(b, "o").filter(F.col("u") < F.col("v"))
             .groupBy("u", "v").agg(F.count(F.lit(1)).alias("n"))
             .filter(F.col("n") >= TRI_SUPPORT).select("u", "v")
             .persist())
    deg = (edges.select(F.col("u").alias("id"))
           .unionByName(edges.select(F.col("v").alias("id")))
           .groupBy("id").agg(F.count(F.lit(1)).alias("deg"))
           .persist())
    adj = (edges.select(F.col("u").alias("src"),
                        F.col("v").alias("dst"))
           .unionByName(edges.select(F.col("v").alias("src"),
                                     F.col("u").alias("dst")))
           .persist())
    a1 = adj.select("src", F.col("dst").alias("u"))
    a2 = adj.select("src", F.col("dst").alias("v"))
    cn = (a1.join(a2, "src")
          .filter(F.col("u") < F.col("v"))
          .groupBy("u", "v").agg(F.count(F.lit(1)).alias("common")))
    cand = (cn.join(edges, ["u", "v"], "left_anti")
            .join(deg.select(F.col("id").alias("u"),
                             F.col("deg").alias("deg_u")), "u")
            .join(deg.select(F.col("id").alias("v"),
                             F.col("deg").alias("deg_v")), "v"))
    scored = cand.withColumn(
        "jaccard",
        F.round(F.col("common") * F.lit(1.0)
                / (F.col("deg_u") + F.col("deg_v") - F.col("common")),
                6))
    top = (scored.orderBy(F.desc("jaccard"), F.desc("common"),
                          "u", "v")
           .limit(LP_TOPK))
    rw = W.orderBy(F.desc("jaccard"), F.desc("common"), "u", "v")
    return (top.withColumn("rank", F.row_number().over(rw))
            .select(F.col("rank").cast("int").alias("rank"),
                    F.col("u").alias("part_u"),
                    F.col("v").alias("part_v"),
                    F.col("common").cast("bigint")
                    .alias("common_neighbors"),
                    F.col("deg_u").cast("bigint").alias("deg_u"),
                    F.col("deg_v").cast("bigint").alias("deg_v"),
                    "jaccard")
            .orderBy("rank"))


# ------------------------------------------------- Adamic-Adar

AA_TOPK = 20


@query("graph_adamic_adar_topk", sql=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), edges AS (
      SELECT a.p AS u, b.p AS v
      FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p HAVING COUNT(*) >= {TRI_SUPPORT}
    ), deg AS (
      SELECT id, COUNT(*) AS deg FROM (
        SELECT u AS id FROM edges UNION ALL SELECT v FROM edges)
      GROUP BY id
    ), adj AS (
      SELECT u AS src, v AS dst FROM edges
      UNION ALL
      SELECT v AS src, u AS dst FROM edges
    ), wedge AS (
      SELECT a1.src AS w, a1.dst AS u, a2.dst AS v
      FROM adj a1 JOIN adj a2
        ON a2.src = a1.src AND a1.dst < a2.dst
    ), aa AS (
      SELECT wg.u, wg.v,
             COUNT(*) AS common,
             SUM(CAST(ROUND(100000000.0 / ln(d.deg)) AS BIGINT))
               AS aa_scaled
      FROM wedge wg JOIN deg d ON d.id = wg.w
      GROUP BY wg.u, wg.v
    ), cand AS (
      SELECT u, v, common,
             ROUND(aa_scaled / 100000000.0, 6) AS adamic_adar
      FROM aa
      WHERE NOT EXISTS (SELECT 1 FROM edges e
                        WHERE e.u = aa.u AND e.v = aa.v)
    )
    SELECT CAST(rnk AS INT) AS rank,
           u AS part_u, v AS part_v,
           CAST(common AS BIGINT) AS common_neighbors,
           adamic_adar
    FROM (SELECT *, ROW_NUMBER() OVER (
              ORDER BY adamic_adar DESC, common DESC, u, v) AS rnk
          FROM cand) AS r
    WHERE rnk <= {AA_TOPK}
    ORDER BY rank
""")
def graph_adamic_adar_topk(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction: AA(u,v) = sum over common
    neighbors w of 1/ln(deg(w)) — the frequency-weighted refinement
    of plain common-neighbor counting (a rare shared neighbor says
    more than a hub), the strongest classical scorer in
    Liben-Nowell & Kleinberg's comparison. Same candidate machinery
    as graph_link_prediction (full-adjacency apex wedges — every
    wedge apex has degree >= 2, so ln(deg) > 0 always); each apex's
    1/ln(deg) term is pre-scaled to an integer in 1e-8 units so the
    per-pair sum is EXACT and partition-order-independent (the
    round-8 double-sum lesson), with one float division at the end.

    Scale: identical posture to graph_link_prediction — apex
    self-join bounded by sum(deg^2) (hub-capped in production),
    pair-keyed aggs, anti-join, TakeOrdered top-k + the declared
    rank-after-LIMIT window."""
    li = load_table(spark, sf_dir, "lineitem")
    items = (li.select(F.col("l_orderkey").alias("o"),
                       F.col("l_partkey").alias("p")).distinct())
    a = items.select("o", F.col("p").alias("u"))
    b = items.select("o", F.col("p").alias("v"))
    edges = (a.join(b, "o").filter(F.col("u") < F.col("v"))
             .groupBy("u", "v").agg(F.count(F.lit(1)).alias("n"))
             .filter(F.col("n") >= TRI_SUPPORT).select("u", "v")
             .persist())
    deg = (edges.select(F.col("u").alias("id"))
           .unionByName(edges.select(F.col("v").alias("id")))
           .groupBy("id").agg(F.count(F.lit(1)).alias("deg")))
    adj = (edges.select(F.col("u").alias("src"), F.col("v").alias("dst"))
           .unionByName(edges.select(F.col("v").alias("src"),
                                     F.col("u").alias("dst")))
           .persist())
    a1 = adj.select(F.col("src").alias("w"), F.col("dst").alias("u"))
    a2 = adj.select(F.col("src").alias("w"), F.col("dst").alias("v"))
    term = F.round(F.lit(1e8) / F.log(F.col("deg"))).cast("bigint")
    aa = (a1.join(a2, "w")
          .filter(F.col("u") < F.col("v"))
          .join(deg.select(F.col("id").alias("w"), "deg"), "w")
          .groupBy("u", "v")
          .agg(F.count(F.lit(1)).alias("common"),
               F.sum(term).alias("aa_scaled")))
    cand = (aa.join(edges, ["u", "v"], "left_anti")
            .withColumn("adamic_adar",
                        F.round(F.col("aa_scaled") / 1e8, 6)))
    top = (cand.orderBy(F.desc("adamic_adar"), F.desc("common"),
                        "u", "v")
           .limit(AA_TOPK))
    rw = W.orderBy(F.desc("adamic_adar"), F.desc("common"), "u", "v")
    return (top.withColumn("rank", F.row_number().over(rw))
            .select(F.col("rank").cast("int").alias("rank"),
                    F.col("u").alias("part_u"),
                    F.col("v").alias("part_v"),
                    F.col("common").cast("bigint")
                    .alias("common_neighbors"),
                    "adamic_adar")
            .orderBy("rank"))


# ------------------------------------------------ HITS (hubs/authorities)

HITS_ITERS = 3
HITS_TOP = 20


def _hits_oracle_sql() -> str:
    """Unrolled 3-step HITS, L1-normalized ONCE at the end (the
    updates are linear, so per-step normalization only rescales —
    deferring it is mathematically identical and halves the CTEs)."""
    steps = []
    for k in range(1, HITS_ITERS + 1):
        steps.append(f"""a{k} AS (
      SELECT e.s, SUM(h.h) AS a
      FROM edges e JOIN h{k - 1} h ON h.c = e.c
      GROUP BY e.s
    ), h{k} AS (
      SELECT e.c, SUM(a.a) AS h
      FROM edges e JOIN a{k} a ON a.s = e.s
      GROUP BY e.c
    )""")
    chain = ", ".join(steps)
    k = HITS_ITERS
    return f"""
    WITH edges AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ), h0 AS (
      SELECT DISTINCT c, 1e0 AS h FROM edges
    ), {chain},
    ranked AS (
      SELECT 'S' AS node_type, s AS node_id,
             ROUND(a / (SELECT SUM(a) FROM a{k}), 6) AS score
      FROM a{k}
      UNION ALL
      SELECT 'C', c,
             ROUND(h / (SELECT SUM(h) FROM h{k}), 6)
      FROM h{k}
    ), topk AS (
      SELECT node_type, node_id, score,
             CAST(ROW_NUMBER() OVER (
                 PARTITION BY node_type
                 ORDER BY score DESC, node_id) AS INT) AS rank
      FROM ranked
    )
    SELECT node_type, node_id, score, rank
    FROM topk WHERE rank <= {HITS_TOP}
    ORDER BY node_type, rank
    """


@query("graph_hits_scores", sql=_hits_oracle_sql())
def graph_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg hubs-and-authorities) on the DIRECTED
    customer->supplier purchase graph: customers are hubs (good
    buyers point at good sellers), suppliers are authorities, and the
    mutual-reinforcement recursion a = E'h, h = Ea runs
    {HITS_ITERS} power-iteration supersteps — the directed complement
    to graph_pagerank_trade's symmetric random walk (PageRank scores
    flow-through importance; HITS separates the pointing role from
    the pointed-at role, the distinction crawl frontier scoring and
    marketplace seller-ranking actually need). Because every update
    is linear, L1 normalization happens ONCE at the end instead of
    per half-step — identical final scores, half the supersteps'
    materializations (and no overflow risk at 3 iterations: unnormed
    magnitudes grow as avg-degree^2 per round, ~1e12 over 3 rounds at
    this shape, comfortably inside double range; deeper runs would
    re-enable per-step scaling). Top-{HITS_TOP} per role by rounded
    score with a total tie-break.

    Scale posture: identical to PageRank — per half-step ONE
    edge-join-scores shuffle partial-aggregated on the destination
    key, rank state O(nodes), each half-step persisted (round 12:
    persist replaced the per-step localCheckpoint — HITS_ITERS is a
    fixed small constant so lineage stays bounded without truncation,
    and a cached frame takes no RDDCheckpointData lock, so the
    round-9/10 broadcast-thread deadlock class cannot fire
    regardless of which consumer materializes it first; eager
    checkpointing here cost one blocking job + full partition
    serialization per half-step, BENCH_r11's 2.4× hits
    regression). The L1 norms are broadcast
    1-row aggregates. Determinism: node-grain double sums differ at
    ~1e-15 relative between engines; the 6-dp rounding absorbs it and
    ranks tie-break on (node_type, node_id). Top-k is orderBy+limit
    per role (TakeOrderedAndProject, no global sort); the final rank
    window runs over <= 2*{HITS_TOP} rows (declared WINDOW_OK)."""
    from pyspark.storagelevel import StorageLevel

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (o.join(li, o.o_orderkey == li.l_orderkey)
             .select(F.col("o_custkey").alias("c"),
                     F.col("l_suppkey").alias("s"))
             .distinct()
             .persist(StorageLevel.MEMORY_AND_DISK))
    h = edges.select("c").distinct().withColumn("h", F.lit(1.0))
    a = None
    # persist (NOT localCheckpoint) per half-step: HITS_ITERS is a
    # fixed small constant, so the lineage stays bounded without
    # truncation, the cache is shared by the next superstep's join and
    # the final top-k/normalization branches, and — unlike the lazy
    # `eager=last` checkpoints this replaced (round 12) — a cached
    # frame first materialized by a broadcast-exchange thread takes no
    # RDDCheckpointData lock, so the round-9/10 deadlock class cannot
    # fire. persist also survives executor loss at scale (recompute
    # from lineage) where localCheckpoint data is unrecoverable.
    for i in range(HITS_ITERS):
        a = (edges.join(h, "c")
             .groupBy("s").agg(F.sum("h").alias("a"))
             .persist())
        h = (edges.join(a, "s")
             .groupBy("c").agg(F.sum("a").alias("h"))
             .persist())
    a_tot = a.agg(F.sum("a").alias("t"))
    h_tot = h.agg(F.sum("h").alias("t"))
    top_a = (a.crossJoin(F.broadcast(a_tot))
             .select(F.lit("S").alias("node_type"),
                     F.col("s").alias("node_id"),
                     F.round(F.col("a") / F.col("t"), 6).alias("score"))
             .orderBy(F.desc("score"), "node_id").limit(HITS_TOP))
    top_h = (h.crossJoin(F.broadcast(h_tot))
             .select(F.lit("C").alias("node_type"),
                     F.col("c").alias("node_id"),
                     F.round(F.col("h") / F.col("t"), 6).alias("score"))
             .orderBy(F.desc("score"), "node_id").limit(HITS_TOP))
    w = W.partitionBy("node_type").orderBy(F.desc("score"), "node_id")
    return (top_a.unionByName(top_h)
            .withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= HITS_TOP)
            .orderBy("node_type", "rank"))


# ------------------------------ partition quality: Newman modularity


@query("graph_modularity_nations", sql="""
    WITH pairs AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ), lab AS (
      SELECT p.c, p.s,
             cn.n_name AS cnat, sn.n_name AS snat
      FROM pairs p
      JOIN customer cu ON cu.c_custkey = p.c
      JOIN nation cn ON cn.n_nationkey = cu.c_nationkey
      JOIN supplier su ON su.s_suppkey = p.s
      JOIN nation sn ON sn.n_nationkey = su.s_nationkey
    ), m AS (SELECT COUNT(*) AS m FROM lab),
    degs AS (
      SELECT nat, SUM(deg) AS d_c, COUNT(*) AS n_nodes FROM (
        SELECT cnat AS nat, c AS id, COUNT(*) AS deg
        FROM lab GROUP BY 1, 2
        UNION ALL
        SELECT snat, -(s + 1), COUNT(*) FROM lab GROUP BY 1, 2)
      GROUP BY nat
    ), intra AS (
      SELECT cnat AS nat, COUNT(*) AS m_c
      FROM lab WHERE cnat = snat GROUP BY 1
    )
    SELECT d.nat AS nation,
           CAST(d.n_nodes AS INT) AS n_nodes,
           CAST(d.d_c AS BIGINT) AS degree_sum,
           CAST(COALESCE(i.m_c, 0) AS BIGINT) AS intra_edges,
           ROUND(COALESCE(i.m_c, 0) / (t.m * 1e0)
                 - POW(d.d_c / (2e0 * t.m), 2), 6) AS contribution
    FROM degs d
    LEFT JOIN intra i ON i.nat = d.nat
    CROSS JOIN m t
    ORDER BY nation
""")
def graph_modularity_nations(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Newman modularity of the NATION partition over the undirected
    customer-supplier trade graph: per community c, contribution =
    m_c/m - (d_c/2m)^2 (intra-community edge share minus the share
    expected under the degree-preserving null model); Q = sum of
    contributions. The standard "is this grouping a real community
    structure?" score — here it quantifies trade home-bias per
    nation, and the per-community decomposition is exactly what
    Louvain-style refinement consumes. Node ids are disambiguated
    across the bipartite sides (suppliers mapped to -(s+1), which is
    always negative — bare negation would collide at key 0) so a
    customer and supplier sharing a key never merge.

    Determinism: every input (m, m_c, d_c) is an exact integer; the
    contribution is one closed form per nation rounded at 6 dp.
    Scale: pairs is the one data-grain stage (distinct over the
    orders x lineitem join); nation labels attach via broadcast dims;
    degrees and intra-edge counts are map-side-combined aggs at node
    and nation grain; the final frame is |nations| rows."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cu = load_table(spark, sf_dir, "customer")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    pairs = (o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
             .select(F.col("o_custkey").alias("c"),
                     F.col("l_suppkey").alias("s"))
             .distinct())
    cnat = (cu.join(F.broadcast(na),
                    F.col("c_nationkey") == F.col("n_nationkey"))
            .select(F.col("c_custkey").alias("c"),
                    F.col("n_name").alias("cnat")))
    snat = (su.join(F.broadcast(na),
                    F.col("s_nationkey") == F.col("n_nationkey"))
            .select(F.col("s_suppkey").alias("s"),
                    F.col("n_name").alias("snat")))
    # persisted for its TWO broadcast consumers (the 1-row m total
    # and the intra frame) — a cached frame takes no checkpoint lock,
    # so the broadcast-thread deadlock class (SURVEY §7) cannot fire.
    lab = (pairs.join(F.broadcast(cnat), "c")
           .join(F.broadcast(snat), "s")
           .persist())
    m = lab.agg(F.count(F.lit(1)).alias("m"))
    node_deg = (lab.select(F.col("cnat").alias("nat"),
                           F.col("c").alias("id"))
                .unionAll(lab.select("snat", (-(F.col("s") + 1)).alias("s")))
                .groupBy("nat", "id")
                .agg(F.count(F.lit(1)).alias("deg")))
    degs = (node_deg.groupBy("nat")
            .agg(F.sum("deg").alias("d_c"),
                 F.count(F.lit(1)).alias("n_nodes")))
    intra = (lab.filter(F.col("cnat") == F.col("snat"))
             .groupBy(F.col("cnat").alias("nat"))
             .agg(F.count(F.lit(1)).alias("m_c")))
    out = (degs.join(F.broadcast(intra), "nat", "left")
           .crossJoin(F.broadcast(m)))
    mc = F.coalesce(F.col("m_c"), F.lit(0))
    contrib = (mc / (F.col("m") * F.lit(1.0))
               - F.pow(F.col("d_c") / (2.0 * F.col("m")), 2))
    return (out.select(
        F.col("nat").alias("nation"),
        F.col("n_nodes").cast("int").alias("n_nodes"),
        F.col("d_c").cast("bigint").alias("degree_sum"),
        mc.cast("bigint").alias("intra_edges"),
        F.round(contrib, 6).alias("contribution"))
        .orderBy("nation"))


# ----------------------------- heavy-tail degree distribution MLE

PL_DMIN = 2   # tail threshold: fit over nodes with degree >= 2


@query("graph_powerlaw_alpha", sql=f"""
    WITH pairs AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ), deg AS (
      SELECT id, COUNT(*) AS d FROM (
        SELECT c AS id FROM pairs
        UNION ALL SELECT -(s + 1) FROM pairs)
      GROUP BY 1
    ), tail AS (
      SELECT d FROM deg WHERE d >= {PL_DMIN}
    ), agg AS (
      SELECT COUNT(*) AS n_tail,
             SUM(LN(d / ({PL_DMIN} - 0.5))) AS slnd,
             MAX(d) AS d_max
      FROM tail
    ), tot AS (SELECT COUNT(*) AS n_nodes FROM deg)
    SELECT CAST(t.n_nodes AS BIGINT) AS n_nodes,
           CAST(a.n_tail AS BIGINT) AS n_tail,
           CAST({PL_DMIN} AS INT) AS d_min,
           CAST(a.d_max AS INT) AS d_max,
           ROUND(1.0 + a.n_tail / a.slnd, 6) AS alpha_mle,
           ROUND((a.n_tail / a.slnd) / SQRT(a.n_tail * 1e0), 6)
             AS alpha_se
    FROM agg a CROSS JOIN tot t
""")
def graph_powerlaw_alpha(spark: SparkSession,
                         sf_dir: str) -> DataFrame:
    """Clauset-Shalizi-Newman power-law exponent of the trade graph's
    degree distribution: the continuous-approximation MLE alpha = 1 +
    n [sum ln(d_i / (d_min - 1/2))]^-1 over the tail d >= d_min, with
    its asymptotic standard error (alpha - 1)/sqrt(n). Degree-tail
    heaviness is the planning number behind every skew decision in
    this repo (salting thresholds, hub caps in common-neighbor joins,
    AQE skew-join expectations): alpha < 2 means unbounded-mean hubs,
    2-3 the classic scale-free regime. d_min is fixed at 2 (degree-1
    leaves carry no tail information; the -1/2 is the CSN continuity
    correction).

    Determinism: degrees are exact integer counts; the ln-sum is the
    same IEEE form of those integers on both engines, rounded at
    6 dp. Scale: the distinct pair frame is the one data-grain stage;
    degrees are a map-side-combined node-grain agg; the fit is one
    1-row reduction (no per-d_min search loop — a production sweep
    would run this closed form once per candidate d_min, each a
    bounded re-aggregate of the SAME degree frame)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
             .select(F.col("o_custkey").alias("c"),
                     F.col("l_suppkey").alias("s"))
             .distinct())
    deg = (pairs.select(F.col("c").alias("id"))
           .unionAll(pairs.select((-(F.col("s") + 1)).alias("s")))
           .groupBy("id").agg(F.count(F.lit(1)).alias("d"))
           .persist())
    tail = deg.filter(F.col("d") >= PL_DMIN)
    agg = tail.agg(
        F.count(F.lit(1)).alias("n_tail"),
        F.sum(F.log(F.col("d") / F.lit(PL_DMIN - 0.5))).alias("slnd"),
        F.max("d").alias("d_max"))
    tot = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    j = agg.crossJoin(F.broadcast(tot))
    ahat = F.col("n_tail") / F.col("slnd")
    return j.select(
        F.col("n_nodes").cast("bigint").alias("n_nodes"),
        F.col("n_tail").cast("bigint").alias("n_tail"),
        F.lit(PL_DMIN).cast("int").alias("d_min"),
        F.col("d_max").cast("int").alias("d_max"),
        F.round(1.0 + ahat, 6).alias("alpha_mle"),
        F.round(ahat / F.sqrt(F.col("n_tail") * F.lit(1.0)), 6)
        .alias("alpha_se"))


# ------------------------------------------------ edge reciprocity


@query("graph_trade_reciprocity", sql="""
    WITH tr AS (
      SELECT c.c_nationkey AS a, s.s_nationkey AS b,
             SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                            * 100) AS BIGINT)) AS cents
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY 1, 2
    ), m AS (
      SELECT COUNT(*) AS ne, SUM(cents) AS tot FROM tr
    ), e AS (
      SELECT a, b FROM tr, m WHERE cents * m.ne > m.tot
    ), nn AS (
      SELECT COUNT(*) AS n_nodes
      FROM (SELECT a AS x FROM e UNION SELECT b FROM e)
    ), st AS (
      SELECT COUNT(*) AS n_edges,
             (SELECT COUNT(*) FROM e t JOIN e r
              ON r.a = t.b AND r.b = t.a) AS n_reciprocal
      FROM e
    )
    SELECT CAST(nn.n_nodes AS BIGINT) AS n_nodes,
           CAST(st.n_edges AS BIGINT) AS n_edges,
           CAST(st.n_reciprocal AS BIGINT) AS n_reciprocal,
           ROUND(st.n_reciprocal / (st.n_edges * 1e0), 6)
             AS reciprocity,
           ROUND(st.n_edges
                 / (nn.n_nodes * (nn.n_nodes - 1) * 1e0), 6)
             AS density,
           ROUND((st.n_reciprocal / (st.n_edges * 1e0)
                  - st.n_edges
                    / (nn.n_nodes * (nn.n_nodes - 1) * 1e0))
                 / (1 - st.n_edges
                        / (nn.n_nodes * (nn.n_nodes - 1) * 1e0)), 6)
             AS rho_gl
    FROM st, nn
""")
def graph_trade_reciprocity(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Directed-edge reciprocity of the STRONG international trade
    graph (nation a buys from nation b above the mean edge value),
    with the Garlaschelli-Loffredo rho (PRL 2004): raw reciprocity
    r = |E cap E^T|/|E| is meaningless without the density baseline
    (a near-complete digraph is reciprocal by accident), so rho
    normalizes r against the density d — rho>0 means trade
    relationships are MUTUAL beyond chance, the lens used on the
    world-trade-web in the original paper. The above-mean gate uses
    the exact integer cross-multiplication cents*|E| > total_cents
    (no float threshold), and the raw graph is intentionally NOT
    used: the fixture trades every nation pair, so r(raw)=1 — the
    thresholded graph is where the statistic has information.

    Scale: one data-grain stage (the 4-table rollup to nation-pair
    grain, lineitem joins orders on the usual key shuffle with the
    dim joins broadcast); everything after runs on the <= |nations|^2
    edge frame — the bounded-grain class; the reverse-edge join keys
    on the swapped pair, partition-local at that size."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    cents = F.round(F.col("l_extendedprice")
                    * (1 - F.col("l_discount")) * 100).cast("bigint")
    tr = (li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
          .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
          .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
          .where(F.col("c_nationkey") != F.col("s_nationkey"))
          .groupBy(F.col("c_nationkey").alias("a"),
                   F.col("s_nationkey").alias("b"))
          .agg(F.sum(cents).alias("cents")))
    m = tr.agg(F.count(F.lit(1)).alias("ne"), F.sum("cents").alias("tot"))
    e = (tr.crossJoin(F.broadcast(m))
         .where(F.col("cents") * F.col("ne") > F.col("tot"))
         .select("a", "b")
         # persisted: nn/recip broadcast frames derive from this
         # one (cache, not checkpoint — no deadlock-class lock)
         .persist())
    nn = (e.select(F.col("a").alias("x"))
          .union(e.select(F.col("b").alias("x"))).distinct()
          .agg(F.count(F.lit(1)).alias("n_nodes")))
    r = e.alias("r")
    recip = (e.alias("t")
             .join(r, (F.col("r.a") == F.col("t.b"))
                   & (F.col("r.b") == F.col("t.a")))
             .agg(F.count(F.lit(1)).alias("n_reciprocal")))
    st = (e.agg(F.count(F.lit(1)).alias("n_edges"))
          .crossJoin(F.broadcast(recip))
          .crossJoin(F.broadcast(nn)))
    rr = F.col("n_reciprocal") / (F.col("n_edges") * F.lit(1.0))
    dd = (F.col("n_edges")
          / (F.col("n_nodes") * (F.col("n_nodes") - 1) * F.lit(1.0)))
    return st.select(
        F.col("n_nodes").cast("bigint").alias("n_nodes"),
        F.col("n_edges").cast("bigint").alias("n_edges"),
        F.col("n_reciprocal").cast("bigint").alias("n_reciprocal"),
        F.round(rr, 6).alias("reciprocity"),
        F.round(dd, 6).alias("density"),
        F.round((rr - dd) / (1 - dd), 6).alias("rho_gl"))
