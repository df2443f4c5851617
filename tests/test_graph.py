"""PageRank operator tests: independent NumPy power-iteration
reference and structural invariants."""

from __future__ import annotations

import numpy as np

from mongo_cdc_spark.io import load_table
from mongo_cdc_spark.operators.graph import (
    PR_DAMP, PR_ITERS, PR_TOP, graph_pagerank_trade)


def _numpy_pagerank(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey").toPandas()
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey").toPandas()
    m = o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    pairs = {(int(c), int(s)) for c, s in zip(m.o_custkey, m.l_suppkey)}
    nodes = sorted({("C", c) for c, _ in pairs}
                   | {("S", s) for _, s in pairs})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    adj: list[list[int]] = [[] for _ in range(n)]
    deg = np.zeros(n)
    for c, s in pairs:
        ci, si = idx[("C", c)], idx[("S", s)]
        adj[si].append(ci)   # in-neighbours of ci include si and v.v.
        adj[ci].append(si)
        deg[ci] += 1
        deg[si] += 1
    pr = np.full(n, 1.0 / n)
    for _ in range(PR_ITERS):
        new = np.full(n, (1 - PR_DAMP) / n)
        for v in range(n):
            new[v] += PR_DAMP * sum(pr[u] / deg[u] for u in adj[v])
        pr = new
    return nodes, pr


def test_pagerank_matches_numpy_power_iteration(spark, sf_dir):
    nodes, pr = _numpy_pagerank(spark, sf_dir)
    order = sorted(range(len(nodes)),
                   key=lambda i: (-round(pr[i], 6), nodes[i]))
    want = [(nodes[i][0], nodes[i][1], round(pr[i], 6))
            for i in order[:PR_TOP]]
    got = graph_pagerank_trade(spark, sf_dir).toPandas()
    have = [(r.node_type, int(r.node_id), r.pagerank)
            for r in got.itertuples()]
    for (wt, wid, wpr), (ht, hid, hpr) in zip(want, have):
        assert (wt, wid) == (ht, hid)
        assert abs(wpr - hpr) < 2e-6


def test_pagerank_output_shape_and_monotonicity(spark, sf_dir):
    got = graph_pagerank_trade(spark, sf_dir).toPandas()
    assert list(got["rank"]) == list(range(1, PR_TOP + 1))
    assert (got.pagerank.diff().dropna() <= 1e-12).all()
    assert (got.pagerank > 0).all()
    # rank mass: every node's floor is (1-d)/n, so top-30 exceeds it
    n_nodes = len(_numpy_pagerank(spark, sf_dir)[0])
    assert (got.pagerank >= (1 - PR_DAMP) / n_nodes - 1e-9).all()
