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


# --------------------------------------------------------- triangles


def _python_cooccurrence_edges(spark, sf_dir):
    from mongo_cdc_spark.operators.graph import TRI_SUPPORT

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey").toPandas()
    from collections import Counter, defaultdict

    baskets: dict[int, set[int]] = defaultdict(set)
    for o, p in zip(li.l_orderkey, li.l_partkey):
        baskets[int(o)].add(int(p))
    cnt: Counter = Counter()
    for parts in baskets.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1:]:
                cnt[(u, v)] += 1
    return {e for e, n in cnt.items() if n >= TRI_SUPPORT}


def test_triangle_count_matches_python_bruteforce(spark, sf_dir):
    from collections import defaultdict

    from mongo_cdc_spark.operators.graph import graph_triangle_count

    edges = _python_cooccurrence_edges(spark, sf_dir)
    adj: dict[int, set[int]] = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    nodes = sorted(adj)
    wedges = sum(len(a) * (len(a) - 1) // 2 for a in adj.values())
    tri = 0
    for u, v in edges:
        tri += len(adj[u] & adj[v])   # each triangle seen via 3 edges
    tri //= 3
    row = graph_triangle_count(spark, sf_dir).collect()[0]
    assert row.n_nodes == len(nodes)
    assert row.n_edges == len(edges)
    assert row.n_wedges == wedges
    assert row.n_triangles == tri
    if wedges:
        assert abs(row.global_clustering - round(3 * tri / wedges, 6)) \
            < 2e-6


# --------------------------------------------------- k-hop reachability


def test_khop_reachability_matches_python_bfs(spark, sf_dir):
    from collections import defaultdict

    from mongo_cdc_spark.operators.graph import (
        BFS_K_OUT, BFS_MAX_HOPS, BFS_SEED, graph_khop_reachability)

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    ).toPandas()
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey").toPandas()
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey").toPandas()
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey").toPandas()
    m = (li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
         .merge(c, left_on="o_custkey", right_on="c_custkey")
         .merge(s, left_on="l_suppkey", right_on="s_suppkey"))
    m = m[m.c_nationkey != m.s_nationkey]
    m["val"] = m.l_extendedprice * (1 - m.l_discount)
    tr = m.groupby(["c_nationkey", "s_nationkey"]).val.sum()
    out: dict[int, list[tuple[float, int]]] = defaultdict(list)
    for (a, b), v in tr.items():
        out[int(a)].append((-round(v, 2), int(b)))
    edges: dict[int, list[int]] = {
        a: [b for _, b in sorted(dsts)[:BFS_K_OUT]]
        for a, dsts in out.items()}
    dist = {BFS_SEED: 0}
    frontier = [BFS_SEED]
    for d in range(1, BFS_MAX_HOPS + 1):
        nxt = []
        for u in frontier:
            for v in edges.get(u, ()):
                if v not in dist:
                    dist[v] = d
                    nxt.append(v)
        frontier = nxt
    got = graph_khop_reachability(spark, sf_dir).toPandas()
    assert {int(r.node_id): int(r.dist)
            for r in got.itertuples()} == dist
    # output ordered by (dist, node_id)
    key = list(zip(got.dist, got.node_id))
    assert key == sorted(key)


def test_supplier_similarity_jaccard_bounds(spark, sf_dir):
    from mongo_cdc_spark.operators import graph
    got = graph.graph_supplier_similarity(spark, sf_dir).toPandas()
    assert len(got) > 0
    assert ((got.jaccard > 0) & (got.jaccard <= 1)).all()
    # |A ∩ B| <= min(|A|, |B|), strict pair ordering, sorted output
    assert (got.common_parts <= got[["deg_a", "deg_b"]].min(axis=1)).all()
    assert (got.s_a < got.s_b).all()
    assert (got.jaccard.diff().dropna() <= 1e-12).all()


def test_degree_assortativity_is_valid_correlation(spark, sf_dir):
    from mongo_cdc_spark.operators import graph
    got = graph.graph_degree_assortativity(spark, sf_dir).toPandas()
    r = got.iloc[0]
    assert -1 <= r.assortativity <= 1
    assert r.n_edges > 0
    assert r.mean_cust_degree > 0 and r.mean_supp_degree > 0


def test_label_propagation_matches_python_lpa(spark, sf_dir):
    from collections import Counter, defaultdict

    from mongo_cdc_spark.operators import graph

    li = load_table(spark, sf_dir, "lineitem") \
        .select("l_suppkey", "l_partkey").distinct().collect()
    by_part = defaultdict(set)
    for r in li:
        by_part[r.l_partkey].add(r.l_suppkey)
    adj = defaultdict(set)
    for sup in by_part.values():
        for x in sup:
            for y in sup:
                if x != y:
                    adj[x].add(y)
    labels = {n: n for n in adj}
    for _ in range(graph.LPA_ITERS):
        nxt = {}
        for n, nbrs in adj.items():
            cnt = Counter(labels[m] for m in nbrs)
            cnt[labels[n]] += 1
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[n] = best[0]
        labels = nxt
    want = Counter(labels.values())
    got = graph.graph_label_propagation(spark, sf_dir).collect()
    assert {(r.community, r.n_members) for r in got} \
        == {(lab, c) for lab, c in want.items()}
    # deterministic across runs
    again = graph.graph_label_propagation(spark, sf_dir).collect()
    assert got == again


def test_kcore_matches_python_peel_to_convergence(spark, sf_dir):
    """Independent peel: iterate to the TRUE fixed point (no round
    bound) and require (a) the engine's fixed-round answer equals it
    and (b) the fixture converges inside KCORE_ROUNDS, validating the
    unrolled oracle's round budget."""
    from collections import defaultdict

    from mongo_cdc_spark.operators.graph import (
        BFS_K_OUT, KCORE_KS, KCORE_ROUNDS, graph_kcore_decomposition)

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    ).toPandas()
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey").toPandas()
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey").toPandas()
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey").toPandas()
    m = (li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
         .merge(c, left_on="o_custkey", right_on="c_custkey")
         .merge(s, left_on="l_suppkey", right_on="s_suppkey"))
    m = m[m.c_nationkey != m.s_nationkey]
    m["val"] = m.l_extendedprice * (1 - m.l_discount)
    tr = m.groupby(["c_nationkey", "s_nationkey"]).val.sum()
    out: dict[int, list[tuple[float, int]]] = defaultdict(list)
    for (a, b), v in tr.items():
        out[int(a)].append((-round(v, 2), int(b)))
    edges = {(a, b) for a, dsts in out.items()
             for _, b in sorted(dsts)[:BFS_K_OUT]}
    sym = edges | {(b, a) for a, b in edges}

    want: dict[int, dict[int, int]] = {}
    for k in KCORE_KS:
        alive = {a for a, _ in sym}
        rounds = 0
        while True:
            deg = defaultdict(int)
            for a, b in sym:
                if a in alive and b in alive:
                    deg[a] += 1
            nxt = {a for a, d in deg.items() if d >= k}
            if nxt == alive:
                break
            alive = nxt
            rounds += 1
        assert rounds <= KCORE_ROUNDS, \
            f"k={k} needs {rounds} peel rounds > budget {KCORE_ROUNDS}"
        want[k] = {a: d for a, d in deg.items() if a in alive}

    got = graph_kcore_decomposition(spark, sf_dir).toPandas()
    have: dict[int, dict[int, int]] = defaultdict(dict)
    for r in got.itertuples():
        have[int(r.k)][int(r.node_id)] = int(r.core_degree)
    assert dict(have) == want
    # nested cores: the 3-core is a subset of the 2-core
    assert set(want[3]) <= set(want[2])
    # sorted output
    key = list(zip(got.k, got.node_id))
    assert key == sorted(key)


def test_local_clustering_matches_python_adjacency(spark, sf_dir):
    """Independent adjacency-set recompute of every node's triangle
    count and coefficient; the operator's top-k must match the
    reference's (rounded cc, node) ordering exactly."""
    from collections import defaultdict
    from itertools import combinations

    from mongo_cdc_spark.operators.graph import (
        LCC_TOP, TRI_SUPPORT, graph_local_clustering)

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey").distinct().collect()
    by_order = defaultdict(set)
    for r in li:
        by_order[r.l_orderkey].add(r.l_partkey)
    pair_n = defaultdict(int)
    for parts in by_order.values():
        for u, v in combinations(sorted(parts), 2):
            pair_n[(u, v)] += 1
    adj = defaultdict(set)
    for (u, v), c in pair_n.items():
        if c >= TRI_SUPPORT:
            adj[u].add(v)
            adj[v].add(u)
    want = []
    for node, nbrs in adj.items():
        d = len(nbrs)
        if d < 2:
            continue
        t = sum(len(adj[x] & nbrs) for x in nbrs) // 2
        if t:
            want.append((node, d, t, round(2.0 * t / (d * (d - 1)), 6)))
    want.sort(key=lambda r: (-r[3], r[0]))
    got = graph_local_clustering(spark, sf_dir).toPandas()
    have = [(int(r.node_id), int(r.degree), int(r.n_triangles),
             r.local_cc) for r in got.itertuples()]
    assert have == want[:LCC_TOP]
    assert (got.local_cc <= 1.0).all() and (got.local_cc > 0).all()


def test_link_prediction_matches_python_reference(spark, sf_dir):
    """Pure-Python recompute: adjacency sets of the TRI_SUPPORT
    co-occurrence graph -> CN/Jaccard over all distance-2 non-edges ->
    identical top-k table."""
    from collections import defaultdict
    from itertools import combinations

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.graph import (LP_TOPK, TRI_SUPPORT,
                                                 graph_link_prediction)

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey").distinct().collect()
    orders = defaultdict(set)
    for r in li:
        orders[r["l_orderkey"]].add(r["l_partkey"])
    pair_n = defaultdict(int)
    for parts in orders.values():
        for u, v in combinations(sorted(parts), 2):
            pair_n[(u, v)] += 1
    edges = {p for p, n in pair_n.items() if n >= TRI_SUPPORT}
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    cand = defaultdict(int)
    for w, nbrs in adj.items():
        for u, v in combinations(sorted(nbrs), 2):
            cand[(u, v)] += 1
    rows = []
    for (u, v), common in cand.items():
        if (u, v) in edges:
            continue
        du, dv = len(adj[u]), len(adj[v])
        rows.append((round(common / (du + dv - common), 6),
                     common, u, v, du, dv))
    rows.sort(key=lambda t: (-t[0], -t[1], t[2], t[3]))
    want = [(i + 1, u, v, c, du, dv, j)
            for i, (j, c, u, v, du, dv) in enumerate(rows[:LP_TOPK])]
    got = [(r["rank"], r["part_u"], r["part_v"], r["common_neighbors"],
            r["deg_u"], r["deg_v"], round(r["jaccard"], 6))
           for r in graph_link_prediction(spark, sf_dir).collect()]
    assert got == want


def test_adamic_adar_matches_python_reference(spark, sf_dir):
    """Pure-Python AA over the same adjacency must reproduce the
    integer-scaled scores and ranking."""
    import math
    from collections import defaultdict
    from itertools import combinations

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.graph import (AA_TOPK, TRI_SUPPORT,
                                                 graph_adamic_adar_topk)

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey").distinct().collect()
    orders = defaultdict(set)
    for r in li:
        orders[r["l_orderkey"]].add(r["l_partkey"])
    pair_n = defaultdict(int)
    for parts in orders.values():
        for u, v in combinations(sorted(parts), 2):
            pair_n[(u, v)] += 1
    edges = {p for p, c in pair_n.items() if c >= TRI_SUPPORT}
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    acc = defaultdict(lambda: [0, 0])  # (u,v) -> [common, aa_scaled]
    for w, nbrs in adj.items():
        t = round(1e8 / math.log(len(nbrs)))
        for u, v in combinations(sorted(nbrs), 2):
            acc[(u, v)][0] += 1
            acc[(u, v)][1] += t
    rows = [(round(s / 1e8, 6), c, u, v)
            for (u, v), (c, s) in acc.items() if (u, v) not in edges]
    rows.sort(key=lambda t: (-t[0], -t[1], t[2], t[3]))
    want = [(i + 1, u, v, c, aa)
            for i, (aa, c, u, v) in enumerate(rows[:AA_TOPK])]
    got = [(r["rank"], r["part_u"], r["part_v"], r["common_neighbors"],
            round(r["adamic_adar"], 6))
           for r in graph_adamic_adar_topk(spark, sf_dir).collect()]
    assert got == want


def test_hits_matches_python_reference(spark, sf_dir):
    """Pure-Python 3-step HITS with end-normalization on the same
    directed customer->supplier edge set."""
    from collections import defaultdict

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.graph import (HITS_ITERS, HITS_TOP,
                                                 graph_hits_scores)

    o = {r["o_orderkey"]: r["o_custkey"] for r in
         load_table(spark, sf_dir, "orders").collect()}
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey").collect()
    edges = {(o[r["l_orderkey"]], r["l_suppkey"]) for r in li}
    h = {c: 1.0 for c, _ in edges}
    a = {}
    for _ in range(HITS_ITERS):
        a = defaultdict(float)
        for c, s in edges:
            a[s] += h[c]
        h = defaultdict(float)
        for c, s in edges:
            h[c] += a[s]
    at, ht = sum(a.values()), sum(h.values())
    exp_a = sorted(((round(v / at, 6), k) for k, v in a.items()),
                   key=lambda x: (-x[0], x[1]))[:HITS_TOP]
    exp_h = sorted(((round(v / ht, 6), k) for k, v in h.items()),
                   key=lambda x: (-x[0], x[1]))[:HITS_TOP]
    got = graph_hits_scores(spark, sf_dir).collect()
    got_a = [(r["score"], r["node_id"]) for r in got
             if r["node_type"] == "S"]
    got_h = [(r["score"], r["node_id"]) for r in got
             if r["node_type"] == "C"]
    assert got_a == exp_a
    assert got_h == exp_h
    # ranks are 1..k within each role
    for role in ("S", "C"):
        ranks = [r["rank"] for r in got if r["node_type"] == role]
        assert ranks == list(range(1, len(ranks) + 1))


def test_modularity_matches_python_reference(spark, sf_dir):
    """Per-nation contributions and the Q = sum(contributions)
    identity over the exact pair/degree counts."""
    import math
    from collections import defaultdict

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.graph import (
        graph_modularity_nations)

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey").collect()
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey").collect()
    cu = {r["c_custkey"]: r["c_nationkey"] for r in load_table(
        spark, sf_dir, "customer").collect()}
    su = {r["s_suppkey"]: r["s_nationkey"] for r in load_table(
        spark, sf_dir, "supplier").collect()}
    nn = {r["n_nationkey"]: r["n_name"] for r in load_table(
        spark, sf_dir, "nation").collect()}
    cust_of = defaultdict(list)
    for r in o:
        cust_of[r["o_orderkey"]].append(r["o_custkey"])
    pairs = set()
    for r in li:
        for c in cust_of.get(r["l_orderkey"], ()):
            pairs.add((c, r["l_suppkey"]))
    m = len(pairs)
    d_c = defaultdict(int)
    nodes = defaultdict(set)
    m_c = defaultdict(int)
    for c, s in pairs:
        cn, sn = nn[cu[c]], nn[su[s]]
        d_c[cn] += 1
        d_c[sn] += 1
        nodes[cn].add(("C", c))
        nodes[sn].add(("S", s))
        if cn == sn:
            m_c[cn] += 1
    got = {r["nation"]: r
           for r in graph_modularity_nations(spark, sf_dir).collect()}
    assert set(got) == set(d_c)
    q = 0.0
    for nat in d_c:
        contrib = m_c.get(nat, 0) / m - (d_c[nat] / (2 * m)) ** 2
        r = got[nat]
        assert r["n_nodes"] == len(nodes[nat])
        assert r["degree_sum"] == d_c[nat]
        assert r["intra_edges"] == m_c.get(nat, 0)
        assert math.isclose(r["contribution"], contrib, abs_tol=1e-6)
        q += contrib
    # Q of a real partition is finite and bounded: -0.5 <= Q < 1
    assert -0.5 <= q < 1.0
    assert math.isclose(
        sum(r["contribution"] for r in got.values()), q, abs_tol=1e-4)


def test_powerlaw_alpha_matches_python_reference(spark, sf_dir):
    """CSN continuous-approximation MLE over the degree tail."""
    import math
    from collections import defaultdict

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.graph import (
        PL_DMIN, graph_powerlaw_alpha)

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey").collect()
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey").collect()
    cust_of = defaultdict(list)
    for r in o:
        cust_of[r["o_orderkey"]].append(r["o_custkey"])
    pairs = set()
    for r in li:
        for c in cust_of.get(r["l_orderkey"], ()):
            pairs.add((c, r["l_suppkey"]))
    deg = defaultdict(int)
    for c, s in pairs:
        deg[("C", c)] += 1
        deg[("S", s)] += 1
    tail = [d for d in deg.values() if d >= PL_DMIN]
    slnd = sum(math.log(d / (PL_DMIN - 0.5)) for d in tail)
    alpha = 1 + len(tail) / slnd
    se = (len(tail) / slnd) / math.sqrt(len(tail))
    row = graph_powerlaw_alpha(spark, sf_dir).collect()[0]
    assert row["n_nodes"] == len(deg)
    assert row["n_tail"] == len(tail)
    assert row["d_min"] == PL_DMIN
    assert row["d_max"] == max(deg.values())
    assert math.isclose(row["alpha_mle"], alpha, abs_tol=1e-5)
    assert math.isclose(row["alpha_se"], se, abs_tol=1e-5)


def test_trade_reciprocity_matches_python_reference(spark, sf_dir):
    """Edge set, reciprocal count, and the Garlaschelli-Loffredo rho
    recomputed in pure Python from the exact-cents trade rollup."""
    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.graph import graph_trade_reciprocity
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    rows = (li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
            .join(c, F.col("c_custkey") == F.col("o_custkey"))
            .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
            .where(F.col("c_nationkey") != F.col("s_nationkey"))
            .select(F.col("c_nationkey").alias("a"),
                    F.col("s_nationkey").alias("b"),
                    F.round(F.col("l_extendedprice")
                            * (1 - F.col("l_discount")) * 100)
                    .cast("bigint").alias("cents"))
            .collect())
    tr: dict[tuple[int, int], int] = {}
    for r in rows:
        tr[(r.a, r.b)] = tr.get((r.a, r.b), 0) + r.cents
    ne, tot = len(tr), sum(tr.values())
    e = {k for k, v in tr.items() if v * ne > tot}
    nodes = {x for ab in e for x in ab}
    recip = sum(1 for (a, b) in e if (b, a) in e)
    n, m = len(nodes), len(e)
    r_ = recip / m
    d_ = m / (n * (n - 1))
    got = graph_trade_reciprocity(spark, sf_dir).collect()
    assert len(got) == 1
    g = got[0]
    assert (g.n_nodes, g.n_edges, g.n_reciprocal) == (n, m, recip)
    assert abs(g.reciprocity - round(r_, 6)) < 1e-9
    assert abs(g.density - round(d_, 6)) < 1e-9
    assert abs(g.rho_gl - round((r_ - d_) / (1 - d_), 6)) < 1e-9
