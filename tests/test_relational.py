"""Relational-surface tests that the hash-oracle can't express:
sketch accuracy bounds and plan-shape assertions (broadcast, pushdown).
"""

from __future__ import annotations

from mongo_cdc_spark.io import load_table
from mongo_cdc_spark.operators import relational


def test_approx_sketches_within_bounds(spark, sf_dir):
    """The query emits exact companions + in-bound booleans (so the
    oracle can hash-check them); independently recompute the exact side
    and require every sketch-bound flag to hold."""
    got = relational.agg_approx_sketches(spark, sf_dir).toPandas()
    from pyspark.sql import functions as F
    exact = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("nd"),
             F.count(F.lit(1)).alias("n"))
        .toPandas().set_index("l_returnflag")
    )
    assert got.approx_cd_ok.all()
    assert got.approx_median_ok.all()
    for _, row in got.iterrows():
        assert row.exact_orders == exact.loc[row.l_returnflag, "nd"]
        assert row.n == exact.loc[row.l_returnflag, "n"]


def test_q5_broadcasts_dims(spark, sf_dir):
    """The small dims must broadcast — a shuffle join on region/nation
    at 100 TB would be a plan bug."""
    plan = relational.q5_local_supplier_volume(
        spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_q1_pushes_filter_and_prunes_columns(spark, sf_dir):
    """Predicate pushdown + column pruning must reach the parquet scan."""
    plan = relational.q1_pricing_summary(
        spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # the scan must not read columns q1 doesn't touch
    assert "l_comment" not in plan


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = relational.topk_expensive_lineitems(
        spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_stratified_sample_fraction_exact(spark, sf_dir):
    """Every stratum must be sampled at exactly ceil(10%) — the
    property Bernoulli sampling cannot give."""
    import math

    got = relational.sample_stratified_orders(spark, sf_dir).toPandas()
    assert len(got) == 5  # all priorities represented
    for _, r in got.iterrows():
        assert r.n_sampled == math.ceil(r.stratum_size * 0.1)


def test_rfm_segments_partition_customers(spark, sf_dir, oracle):
    """RFM output partitions the ordering customers: segment counts sum
    to the distinct customer count, labels are quartile triples."""
    from mongo_cdc_spark.operators import relational

    got = relational.rfm_customer_segments(spark, sf_dir).toPandas()
    n_cust = oracle.sql(
        "SELECT COUNT(DISTINCT o_custkey) FROM orders").fetchone()[0]
    assert got.n_customers.sum() == n_cust
    assert got.rfm.str.fullmatch("[1-4]{3}").all()
    assert (got.avg_monetary > 0).all()


def test_sessions_interval_overlap_invariants(spark, sf_dir):
    """Overlap pairs are canonical (user1 < user2), counts positive,
    and overlap seconds can't exceed the fixture's total time span."""
    from mongo_cdc_spark.operators import relational

    got = relational.sessions_interval_overlap(spark, sf_dir).toPandas()
    assert len(got) > 0
    assert (got.user1 < got.user2).all()
    assert (got.n_overlaps >= 1).all()
    assert (got.total_overlap_s >= 0).all()


def test_join_hint_forces_shuffled_hash_join(spark, sf_dir):
    """The shuffle_hash hint must land a ShuffledHashJoin in the
    physical plan (no broadcast, no sort-merge) without changing
    results — physical strategy is user-controllable per join."""
    from mongo_cdc_spark.operators import relational

    df = relational.join_hint_shuffle_hash(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan
    assert "SortMergeJoin" not in plan


def test_bitmap_rollup_is_exact(spark, sf_dir, oracle):
    """Bitmap distinct is EXACT, not approximate: every daily row and
    the merged ALL row must equal DuckDB's COUNT(DISTINCT)."""
    got = (relational.events_bitmap_distinct_rollup(spark, sf_dir)
           .toPandas().set_index("day"))
    exact = oracle.sql("""
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               COUNT(DISTINCT user_id) AS du FROM events GROUP BY 1
    """).df().set_index("day")
    for day, row in exact.iterrows():
        assert got.loc[day, "distinct_users"] == row.du
    all_exact = oracle.sql(
        "SELECT COUNT(DISTINCT user_id) FROM events").fetchone()[0]
    assert got.loc["ALL", "distinct_users"] == all_exact


def test_kll_rollup_brackets_hold(spark, sf_dir):
    """Every sketch quantile (daily and merged) must land inside the
    exact +/-4%-rank bracket the oracle grades."""
    got = relational.events_kll_quantile_rollup(spark, sf_dir).toPandas()
    assert len(got) > 1 and "ALL" in set(got.day)
    assert got.p50_in_bounds.all() and got.p95_in_bounds.all()


def test_theta_setops_bounds_and_algebra(spark, sf_dir):
    """Set-algebra invariant: |A∩B| + |A\\B| = |A| on the exact
    companions, and every theta estimate is in bounds."""
    got = (relational.events_theta_distinct_setops(spark, sf_dir)
           .toPandas().set_index("op"))
    assert got.est_in_bounds.all()
    from pyspark.sql import functions as F
    clicks = (load_table(spark, sf_dir, "events")
              .filter(F.col("event_type") == "click")
              .select("user_id").distinct().count())
    assert (got.loc["click_and_purchase", "exact_users"]
            + got.loc["click_minus_purchase", "exact_users"]) == clicks


def test_countmin_never_underestimates(spark, sf_dir):
    """The CM one-sided error guarantee (est >= exact) must hold for
    every reported key, and the top-1 estimate must be >= the true
    heaviest key's exact count (CM can only inflate)."""
    got = relational.events_countmin_heavy_hitters(spark, sf_dir).toPandas()
    assert (got.est_cnt >= got.exact_cnt).all()
    assert got.never_underestimates.all()
    from pyspark.sql import functions as F
    true_max = (load_table(spark, sf_dir, "events")
                .groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
                .agg(F.max("c")).first()[0])
    assert got.est_cnt.iloc[0] >= true_max


def test_scd2_intervals_partition_history(spark, sf_dir):
    """Per user: exactly one open (current) version, intervals are
    contiguous (each valid_to equals the next valid_from), and
    valid_from never decreases."""
    got = relational.scd2_user_state_history(spark, sf_dir).toPandas()
    for uid, g in got.groupby("user_id"):
        g = g.sort_values(["valid_from", "event_id"]).reset_index(drop=True)
        assert int(g.is_current.sum()) == 1
        assert g.is_current.iloc[-1]
        assert (g.valid_to.iloc[:-1].values
                == g.valid_from.iloc[1:].values).all()


def test_sliding_distinct_users_window_semantics(spark, sf_dir):
    """users_3d must equal the exact distinct over the trailing 3
    calendar days, and dominate users_1d; windows crossing silent
    days must not over-count."""
    from mongo_cdc_spark.operators.relational import (
        events_sliding_distinct_users)

    got = events_sliding_distinct_users(spark, sf_dir).toPandas()
    ev = (load_table(spark, sf_dir, "events")
          .selectExpr("date_trunc('day', ts) AS d", "user_id").toPandas())
    ev["day"] = ev.d.dt.strftime("%Y-%m-%d")
    by_day = {d: set(g.user_id) for d, g in ev.groupby("day")}
    import pandas as pd
    for r in got.itertuples():
        day = pd.Timestamp(r.day)
        wdays = [(day - pd.Timedelta(days=k)).strftime("%Y-%m-%d")
                 for k in range(3)]
        want = set().union(*(by_day.get(d, set()) for d in wdays))
        assert r.users_3d == len(want), r.day
        assert r.users_1d == len(by_day[r.day])
        assert r.users_3d >= r.users_1d


def test_seasonal_anomaly_flags_only_beyond_2_sigma(spark, sf_dir):
    from mongo_cdc_spark.operators.relational import events_seasonal_anomaly

    got = events_seasonal_anomaly(spark, sf_dir).toPandas()
    assert (got.z.abs() > 2).all()
    assert (got.sigma > 0).all()
    # z recomputes from the reported baseline
    import numpy as np
    z = (got.n - got.mu) / got.sigma
    assert np.allclose(z.round(4), got.z)
    # baselines match per-clock-hour means computed independently
    ev = (load_table(spark, sf_dir, "events")
          .selectExpr("event_type", "date_trunc('hour', ts) AS h")
          .toPandas())
    hourly = ev.groupby(["event_type", "h"]).size().reset_index(name="n")
    hourly["hod"] = hourly.h.dt.hour
    base = (hourly.groupby(["event_type", "hod"]).n
            .agg(["mean", "std"]).round(6))
    for r in got.itertuples():
        mu = base.loc[(r.event_type, r.h.hour), "mean"]
        assert abs(mu - r.mu) < 1e-6


def test_attribution_conserves_purchases_and_revenue(spark, sf_dir):
    from mongo_cdc_spark.operators.relational import (
        events_attribution_last_touch)

    got = events_attribution_last_touch(spark, sf_dir).toPandas()
    buys = (load_table(spark, sf_dir, "events")
            .filter("event_type = 'purchase'")
            .selectExpr("count(*) AS n", "round(sum(value), 4) AS rev")
            .collect()[0])
    # every purchase lands in exactly one bucket (attributed hour or
    # the unattributed NULL row): counts and revenue conserve
    assert got.n_purchases.sum() == buys.n
    assert abs(got.revenue.sum() - buys.rev) < 1e-2
    assert (got.click_hour.isna().sum()) <= 1


def test_weighted_median_matches_numpy_reference(spark, sf_dir):
    import numpy as np

    from mongo_cdc_spark.operators.relational import agg_weighted_median

    got = (agg_weighted_median(spark, sf_dir)
           .toPandas().set_index("flag"))
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_returnflag", "l_extendedprice", "l_quantity",
                  "l_orderkey", "l_linenumber").toPandas())
    for flag, g in li.groupby("l_returnflag"):
        g = g.sort_values(["l_extendedprice", "l_orderkey",
                           "l_linenumber"])
        cum = g.l_quantity.cumsum()
        tot = g.l_quantity.sum()
        price = g.l_extendedprice[cum >= tot / 2].iloc[0]
        row = got.loc[flag]
        assert abs(row.weighted_median_price - round(price, 2)) < 1e-9
        assert abs(row.total_weight - round(tot, 2)) < 1e-6
        # the weighted median is a real data point inside the range
        assert g.l_extendedprice.min() <= price <= g.l_extendedprice.max()


def test_basket_pairs_counts_match_pandas(spark, sf_dir):
    from itertools import combinations

    from mongo_cdc_spark.operators.relational import basket_part_pairs

    got = basket_part_pairs(spark, sf_dir).toPandas()
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_orderkey", "l_partkey").distinct().toPandas())
    sup = li.groupby("l_partkey").size()
    keep = set(sup[sup >= 2].index)
    counts: dict = {}
    for _, g in li.groupby("l_orderkey"):
        parts = sorted(p for p in set(g.l_partkey) if p in keep)
        for p1, p2 in combinations(parts, 2):
            counts[(p1, p2)] = counts.get((p1, p2), 0) + 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    have = [((r.p1, r.p2), r.n_orders) for r in got.itertuples()]
    assert have == [((p1, p2), n) for (p1, p2), n in want]
    assert list(got["rank"]) == list(range(1, len(got) + 1))


def test_time_to_convert_gaps_are_in_window(spark, sf_dir):
    from mongo_cdc_spark.operators.relational import events_time_to_convert

    got = events_time_to_convert(spark, sf_dir).toPandas()
    assert (got.n_conversions > 0).all()
    # every gap statistic lies inside the 30-minute attribution window
    for c in ("avg_gap_sec", "p50_gap_sec", "p90_gap_sec"):
        assert (got[c] >= 0).all() and (got[c] <= 1800).all()
    assert (got.p50_gap_sec <= got.p90_gap_sec).all()


def test_interval_candidates_exact_boundaries(spark):
    """Window edges: a click exactly 30 min before (inclusive), at the
    same instant (inclusive), 1 s outside (excluded), and after the
    purchase (excluded) — including pairs that straddle an epoch
    boundary."""
    from mongo_cdc_spark.operators.relational import _interval_candidates

    buys = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 100)],
        "user_id int, buy_ts string, buy_id int").selectExpr(
        "user_id", "CAST(buy_ts AS TIMESTAMP) AS buy_ts", "buy_id")
    clicks = spark.createDataFrame(
        [(1, "2024-01-01 09:30:00", 1),   # exactly -30 min: in
         (1, "2024-01-01 10:00:00", 2),   # same instant: in
         (1, "2024-01-01 09:29:59", 3),   # 1 s too early: out
         (1, "2024-01-01 10:00:01", 4),   # after purchase: out
         (1, "2024-01-01 09:45:00", 5),   # straddles the epoch edge
         (2, "2024-01-01 09:45:00", 6)],  # other user: out
        "user_id int, click_ts string, click_id int").selectExpr(
        "user_id", "CAST(click_ts AS TIMESTAMP) AS click_ts", "click_id")
    got = sorted(r.click_id for r in _interval_candidates(
        buys, clicks, "user_id", "buy_ts", "click_ts").collect())
    assert got == [1, 2, 5]


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _offsets = st.lists(
        st.tuples(st.integers(min_value=1, max_value=3),      # user
                  st.integers(min_value=0, max_value=7200)),  # sec offset
        max_size=12)

    @settings(max_examples=10, deadline=None)
    @given(_offsets, _offsets)
    def test_interval_candidates_equals_bruteforce_property(cl, bu):
        """The bucketed equi-join plan returns EXACTLY the brute-force
        interval-predicate pairs for any event placement."""
        from mongo_cdc_spark.operators.relational import (
            _interval_candidates)
        from mongo_cdc_spark.session import get_spark
        spark = get_spark("pytest")
        base = 1704100000

        def df(rows, ts_name, id_name):
            data = [(u, int(base + off), i)
                    for i, (u, off) in enumerate(rows)]
            return spark.createDataFrame(
                data, f"user_id int, _e long, {id_name} int"
            ).selectExpr("user_id", f"timestamp_seconds(_e) AS {ts_name}",
                         id_name)

        got = {(r.buy_id, r.click_id) for r in _interval_candidates(
            df(bu, "buy_ts", "buy_id"), df(cl, "click_ts", "click_id"),
            "user_id", "buy_ts", "click_ts").collect()}
        want = {(bi, ci)
                for bi, (bu_u, bo) in enumerate(bu)
                for ci, (cl_u, co) in enumerate(cl)
                if bu_u == cl_u and co <= bo and co >= bo - 1800}
        assert got == want
except ImportError:  # pragma: no cover - hypothesis is in this image
    pass


def test_scd2_point_in_time_matches_python_asof(spark, sf_dir):
    """The union-window formulation must equal a per-user pure-Python
    as-of scan over the (ts, event_id)-sorted history."""
    import pandas as pd

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.relational import (
        scd2_point_in_time_join)

    ev = (load_table(spark, sf_dir, "events")
          .filter("user_id < 10")
          .select("user_id", "event_id", "event_type", "ts")
          .toPandas())
    got = scd2_point_in_time_join(spark, sf_dir).toPandas()
    for uid, g in ev.groupby("user_id"):
        hist = (g[g.event_type != "click"]
                .sort_values(["ts", "event_id"]).reset_index(drop=True))
        clicks = g[g.event_type == "click"]
        sub = got[got.user_id == uid].set_index("click_id")
        assert len(sub) == len(clicks)
        for r in clicks.itertuples():
            prior = hist[hist.ts <= r.ts]
            row = sub.loc[r.event_id]
            if prior.empty:
                assert pd.isna(row.state) and pd.isna(row.state_since)
            else:
                last = prior.iloc[-1]
                assert row.state == last.event_type
                assert row.state_since == last.ts


def test_linear_attribution_conserves_revenue(spark, sf_dir):
    """Equal-split credit must conserve total purchase revenue across
    attributed + unattributed buckets (up to the 4-dp rounding)."""
    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.relational import (
        events_attribution_linear)

    got = events_attribution_linear(spark, sf_dir).toPandas()
    total = (load_table(spark, sf_dir, "events")
             .filter("event_type = 'purchase'")
             .agg({"value": "sum"}).collect()[0][0])
    assert abs(got.revenue.sum() - total) < 1e-2 + 5e-4 * len(got)
    assert (got.n_touches > 0).all()


def test_path_trigrams_matches_pandas(spark, sf_dir):
    from collections import Counter

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.relational import events_path_trigrams

    ev = (load_table(spark, sf_dir, "events")
          .select("user_id", "event_type", "ts", "event_id").toPandas()
          .sort_values(["user_id", "ts", "event_id"]))
    cnt: Counter = Counter()
    for _, g in ev.groupby("user_id"):
        t = list(g.event_type)
        cnt.update(" > ".join(t[i:i + 3]) for i in range(len(t) - 2))
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    got = events_path_trigrams(spark, sf_dir).toPandas()
    assert [(r.path, r.n) for r in got.itertuples()] == want


def test_percent_rank_formula(spark, sf_dir):
    """percent_rank = (rank-1)/(n-1), cume_dist = rank_rows/n within
    each segment — recomputed from the full distribution in pandas."""
    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.relational import (
        window_percent_rank_spend)

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment").toPandas()
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice").toPandas()
    spend = (o.merge(c, left_on="o_custkey", right_on="c_custkey")
             .groupby(["c_custkey", "c_mktsegment"]).o_totalprice
             .sum().round(2).rename("v").reset_index())
    got = window_percent_rank_spend(spark, sf_dir).toPandas()
    assert (got.c_custkey < 300).all()
    for seg, g in spend.groupby("c_mktsegment"):
        g = g.sort_values(["v", "c_custkey"]).reset_index(drop=True)
        n = len(g)
        sub = got[got.c_mktsegment == seg].set_index("c_custkey")
        for pos, r in g.iterrows():
            if r.c_custkey not in sub.index:
                continue
            row = sub.loc[r.c_custkey]
            want_pr = 0.0 if n == 1 else pos / (n - 1)
            assert abs(row.pct_rank - round(want_pr, 6)) < 2e-6
            assert abs(row.cume_dist - round((pos + 1) / n, 6)) < 2e-6


def test_mode_per_segment_matches_pandas(spark, sf_dir):
    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.relational import agg_mode_per_segment

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment").toPandas()
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority").toPandas()
    m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    got = agg_mode_per_segment(spark, sf_dir).toPandas()
    for row in got.itertuples():
        g = m[m.c_mktsegment == row.c_mktsegment]
        cnt = g.o_orderpriority.value_counts()
        best = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert (row.mode_priority, row.mode_n) == best
        assert row.n_orders == len(g)
        assert abs(row.mode_share - round(best[1] / len(g), 6)) < 2e-6


def test_left_join_replay_covers_all_purchases(spark, sf_dir):
    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.relational import (
        streaming_interval_join_replay, streaming_interval_left_join_replay)

    left = streaming_interval_left_join_replay(spark, sf_dir).toPandas()
    inner = streaming_interval_join_replay(spark, sf_dir).toPandas()
    n_buys = (load_table(spark, sf_dir, "events")
              .filter("event_type = 'purchase'").count())
    # every purchase appears; matched pairs equal the inner join; the
    # rest are exactly the null-extended unmatched purchases
    assert left.buy_id.nunique() == n_buys
    matched = left[left.click_id.notna()]
    assert (set(zip(matched.buy_id, matched.click_id.astype(int)))
            == set(zip(inner.buy_id, inner.click_id)))
    unmatched = left[left.click_id.isna()]
    assert set(unmatched.buy_id) == (set(left.buy_id)
                                     - set(matched.buy_id))


def test_funnel_steps_matches_pandas(spark, sf_dir):
    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.relational import (
        FUNNEL_STEPS, events_funnel_steps)

    ev = (load_table(spark, sf_dir, "events")
          .select("user_id", "event_type", "ts").toPandas())
    prev = (ev[ev.event_type == FUNNEL_STEPS[0]]
            .groupby("user_id").ts.min())
    counts, gaps = [len(prev)], [None]
    for step in FUNNEL_STEPS[1:]:
        m = ev[ev.event_type == step].merge(
            prev.rename("prev_t"), on="user_id")
        m = m[m.ts > m.prev_t]
        cur = m.groupby("user_id").agg(t=("ts", "min"),
                                       prev_t=("prev_t", "first"))
        counts.append(len(cur))
        gaps.append(((cur.t - cur.prev_t).dt.total_seconds() / 3600
                     ).mean() if len(cur) else None)
        prev = cur.t
    got = events_funnel_steps(spark, sf_dir).toPandas()
    assert list(got.n_users) == counts
    # strictly shrinking funnel
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    for k in range(1, len(FUNNEL_STEPS)):
        assert abs(got.conv_from_prev[k]
                   - round(counts[k] / counts[k - 1], 6)) < 2e-6
        assert abs(got.avg_gap_hours[k] - round(gaps[k], 4)) < 2e-4


def test_survival_km_matches_pure_python_estimator(spark, sf_dir):
    """Engine curve vs a textbook Kaplan-Meier computed row-by-row in
    Python from the same (duration, converted) subjects."""
    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.relational import events_survival_km

    ev = (load_table(spark, sf_dir, "events")
          .select("user_id", "event_type", "ts").toPandas())
    t0 = (ev[ev.event_type == "signup"].groupby("user_id").ts.min())
    subj = []
    for uid, start in t0.items():
        g = ev[ev.user_id == uid]
        conv = g[(g.event_type == "purchase") & (g.ts > start)]
        if len(conv):
            dur = int((conv.ts.min() - start).total_seconds() // 86400)
            subj.append((dur, True))
        else:
            dur = int((g.ts.max() - start).total_seconds() // 86400)
            subj.append((dur, False))
    import collections
    per_day = collections.defaultdict(lambda: [0, 0])  # d, ending
    for dur, c in subj:
        per_day[dur][0] += 1 if c else 0
        per_day[dur][1] += 1
    n_risk = len(subj)
    s = 1.0
    want = []
    for day in sorted(per_day):
        d, ending = per_day[day]
        if d > 0:
            s *= (1 - d / n_risk)
        want.append((day, n_risk, d, ending - d, s))
        n_risk -= ending
    got = events_survival_km(spark, sf_dir).toPandas()
    assert len(got) == len(want)
    for row, (day, nr, d, cens, s) in zip(got.itertuples(), want):
        assert (row.day, row.n_at_risk, row.n_converted,
                row.n_censored) == (day, nr, d, cens)
        assert abs(row.survival - s) < 2e-6
    # survival is monotone non-increasing in [0, 1]
    assert (got.survival.diff().dropna() <= 1e-12).all()
    assert got.survival.between(0, 1).all()


def test_basket_rules_lift_matches_python(spark, sf_dir):
    from collections import Counter, defaultdict

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.relational import (
        RULE_MIN_CO, RULE_TOP, basket_rules_lift)

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey").toPandas()
    baskets = defaultdict(set)
    for o, p in zip(li.l_orderkey, li.l_partkey):
        baskets[int(o)].add(int(p))
    supp: Counter = Counter()
    co: Counter = Counter()
    for parts in baskets.values():
        supp.update(parts)
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1:]:
                co[(u, v)] += 1
                co[(v, u)] += 1
    n = len(baskets)
    rules = []
    for (a, b), c in co.items():
        if c >= RULE_MIN_CO:
            rules.append((round(c * n / (supp[a] * supp[b]), 6), a, b,
                          c, round(c / n, 6), round(c / supp[a], 6)))
    rules.sort(key=lambda t: (-t[0], t[1], t[2]))
    got = basket_rules_lift(spark, sf_dir).toPandas()
    assert len(got) == min(RULE_TOP, len(rules))
    for row, (lift, a, b, c, s, conf) in zip(got.itertuples(), rules):
        assert (row.antecedent, row.consequent, row.co) == (a, b, c)
        assert abs(row.lift - lift) < 2e-6
        assert abs(row.support - s) < 2e-6
        assert abs(row.confidence - conf) < 2e-6


def test_revenue_concentration_matches_python(spark, sf_dir):
    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.relational import (
        events_revenue_concentration)

    ev = (load_table(spark, sf_dir, "events")
          .filter("event_type = 'purchase'")
          .select("user_id", "value").toPandas())
    rev = ev.groupby("user_id").value.sum().round(6)
    xs = sorted(rev)
    n, total = len(xs), sum(xs)
    gini = 2 * sum((i + 1) * x for i, x in enumerate(xs)) \
        / (n * total) - (n + 1) / n
    row = events_revenue_concentration(spark, sf_dir).collect()[0]
    assert row.n_users == n
    assert abs(row.gini - round(gini, 6)) < 2e-6
    t20 = sum(xs[(n * 4) // 5:]) / total
    t10 = sum(xs[(n * 9) // 10:]) / total
    assert abs(row.top20pct_share - round(t20, 6)) < 2e-6
    assert abs(row.top10pct_share - round(t10, 6)) < 2e-6
    assert 0 <= row.gini <= 1
    assert row.top10pct_share <= row.top20pct_share <= 1


def test_dau_wau_stickiness_bounds(spark, sf_dir):
    got = relational.events_dau_wau_stickiness(spark, sf_dir).toPandas()
    assert len(got) > 0
    # DAU can never exceed the trailing-7-day WAU; ratio in (0, 1]
    assert (got.dau <= got.wau).all()
    assert ((got.stickiness > 0) & (got.stickiness <= 1)).all()
    # a 1-day window degenerate check: first day's WAU >= its DAU and
    # WAU is bounded by total distinct users
    from mongo_cdc_spark.io import load_table
    n_users = load_table(spark, sf_dir, "events").toPandas().user_id.nunique()
    assert (got.wau <= n_users).all()


def test_ltv_curve_monotone_and_anchored(spark, sf_dir):
    got = relational.customer_ltv_curve(spark, sf_dir).toPandas()
    from mongo_cdc_spark.io import load_table
    orders = load_table(spark, sf_dir, "orders").toPandas()
    # cumulative LTV never decreases within a cohort
    for _, g in got.groupby("cohort"):
        vals = g.sort_values("age_m").cum_ltv_per_customer
        assert (vals.diff().dropna() >= -1e-9).all()
    # cohort sizes partition the customer base that ordered
    sizes = got.groupby("cohort").cohort_size.first()
    assert sizes.sum() == orders.o_custkey.nunique()
    # the final cumulative value accounts for all revenue
    final = (got.sort_values("age_m").groupby("cohort").tail(1))
    total = (final.cum_ltv_per_customer * final.cohort_size).sum()
    assert abs(total - orders.o_totalprice.sum()) / orders.o_totalprice.sum() < 1e-6


def test_user_lifecycle_accounting_identities(spark, sf_dir):
    got = relational.events_user_lifecycle(spark, sf_dir).toPandas()
    from mongo_cdc_spark.io import load_table
    ev = load_table(spark, sf_dir, "events").toPandas()
    n_users = ev.user_id.nunique()
    # every user is NEW exactly once
    assert got.n_new.sum() == n_users
    # first week: everyone is new, nobody retained/resurrected/churned
    first = got.iloc[0]
    assert first.n_retained == 0 and first.n_resurrected == 0
    assert first.n_churned == 0
    # growth-accounting identity: actives(w) = new + retained +
    # resurrected, and actives(w) = actives(w-1) - churned(w) + new(w)
    # + resurrected(w)
    ev["w"] = ev.ts.dt.to_period("W").dt.start_time
    actives = ev.groupby("w").user_id.nunique().sort_index()
    got = got.sort_values("week").reset_index(drop=True)
    for i, r in got.iterrows():
        a = actives.iloc[i]
        assert r.n_new + r.n_retained + r.n_resurrected == a
        if i > 0:
            prev_a = actives.iloc[i - 1]
            assert a == prev_a - r.n_churned + r.n_new + r.n_resurrected


def test_peak_concurrency_bounds(spark, sf_dir):
    got = relational.events_peak_concurrency(spark, sf_dir).toPandas()
    from mongo_cdc_spark.io import load_table
    ev = load_table(spark, sf_dir, "events").toPandas()
    ev["d"] = ev.ts.dt.floor("D")
    dau = ev.groupby("d").user_id.nunique()
    assert len(got) == len(dau)
    got = got.sort_values("day").reset_index(drop=True)
    # peak is at least 1 and can never exceed that day's distinct users
    assert (got.peak_concurrency >= 1).all()
    assert (got.peak_concurrency.values <= dau.sort_index().values).all()
    # the first peak instant lies within (or at the release boundary
    # just past) its day
    assert (got.first_peak_at.dt.floor("D") >= got.day).all()


def test_watermark_lag_profile_invariants(spark, sf_dir):
    got = relational.events_watermark_lag_profile(spark, sf_dir).toPandas()
    assert (got.n_late <= got.n_events).all()
    assert ((got.late_frac >= 0) & (got.late_frac <= 1)).all()
    assert (got.p95_lateness_us <= got.max_lateness_us).all()
    assert (got.max_lateness_us >= 0).all()


def test_join_hint_forces_sort_merge_join(spark, sf_dir):
    """The merge hint must land a SortMergeJoin in the physical plan
    (no broadcast, no shuffled-hash) without changing results."""
    df = relational.join_hint_merge(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_bot_score_components_consistent(spark, sf_dir):
    got = relational.events_bot_score(spark, sf_dir).toPandas()
    assert ((got.bot_points >= 0) & (got.bot_points <= 3)).all()
    assert (got.max_burst_1min >= 1).all()
    assert (got.gap_cv > 0).all()
    # each flag matches its own threshold re-derived from the output
    import numpy as np
    expect = ((got.events_per_active_hour > 2.0).astype(int)
              + (got.max_burst_1min >= 3).astype(int)
              + (got.gap_cv < 0.5).astype(int))
    assert (got.bot_points == expect).all()


def test_pareto_skyline_matches_bruteforce(spark, sf_dir):
    """The two-phase strict-cummax skyline must equal the O(n^2)
    dominance definition computed directly on the fixture."""
    from pyspark.sql import functions as F

    from mongo_cdc_spark.operators import relational

    got = relational.parts_pareto_skyline(spark, sf_dir).toPandas()
    parts = (relational.load_table(spark, sf_dir, "part")
             .select("p_partkey", F.round("p_retailprice", 2)
                     .alias("price"), "p_size").toPandas())
    keep = []
    for _, r in parts.iterrows():
        dominated = ((parts.price <= r.price) & (parts.p_size >= r.p_size)
                     & ((parts.price < r.price)
                        | (parts.p_size > r.p_size))).any()
        if not dominated:
            keep.append(r.p_partkey)
    assert sorted(got.p_partkey) == sorted(keep)
    # distinct frontier points form a strict staircase: sorted by
    # price asc, the surviving sizes must strictly increase
    stair = (got.drop_duplicates(["price", "size"])
             .sort_values("price")["size"].tolist())
    assert all(b > a for a, b in zip(stair, stair[1:]))


def test_markov_attribution_matches_exact_linear_solve(spark, sf_dir,
                                                       oracle):
    """The 200-step fixed point must agree with the EXACT absorbing-
    chain solution p = (I - Q)^-1 R computed independently from
    DuckDB-derived transition counts — a different algorithm on a
    different engine's counts."""
    import numpy as np

    from mongo_cdc_spark.operators import relational

    got = (relational.events_attribution_markov(spark, sf_dir)
           .toPandas().set_index("channel"))
    tr = oracle.sql("""
        WITH seq AS (
          SELECT user_id, event_type,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM events
        ), firstbuy AS (
          SELECT user_id, MIN(rn) AS buy_rn FROM seq
          WHERE event_type = 'purchase' GROUP BY 1
        ), j AS (
          SELECT s.user_id, s.rn, s.event_type
          FROM seq s LEFT JOIN firstbuy f ON f.user_id = s.user_id
          WHERE f.buy_rn IS NULL OR s.rn <= f.buy_rn
        ), ed AS (
          SELECT event_type AS src,
                 COALESCE(LEAD(event_type) OVER (PARTITION BY user_id
                                                 ORDER BY rn),
                          CASE WHEN event_type = 'purchase' THEN NULL
                               ELSE 'END' END) AS dst
          FROM j
          UNION ALL
          SELECT 'START', event_type FROM j WHERE rn = 1
        )
        SELECT src, dst, COUNT(*) FROM ed
        WHERE dst IS NOT NULL GROUP BY 1, 2""").fetchall()
    states = sorted({r[0] for r in tr} | {r[1] for r in tr}
                    | {"purchase", "END"})
    idx = {s: i for i, s in enumerate(states)}
    p = np.zeros((len(states), len(states)))
    for s, d, n in tr:
        p[idx[s], idx[d]] = n
    p /= p.sum(axis=1, keepdims=True).clip(1e-12)
    for a in ("purchase", "END"):
        p[idx[a]] = 0.0
        p[idx[a], idx[a]] = 1.0

    def exact(removed=None):
        m = p.copy()
        if removed is not None:
            m[:, idx[removed]] = 0.0
        trans = [i for s, i in idx.items()
                 if s not in ("purchase", "END")]
        q = m[np.ix_(trans, trans)]
        r = m[trans, idx["purchase"]]
        sol = np.linalg.solve(np.eye(len(trans)) - q, r)
        return sol[trans.index(idx["START"])]

    base = exact()
    for ch in ("click", "error", "signup", "view"):
        want = 1.0 - exact(ch) / base
        assert abs(got.loc[ch].removal_effect - want) < 1e-5, ch
    assert abs(got.attribution_share.sum() - 1.0) < 5e-6
    assert (got.removal_effect > 0).all()


def test_recursive_reachability_consistent_with_khop(spark, sf_dir):
    """WITH RECURSIVE must be internally consistent: hop-0 is the
    root alone, every min_hops is in [0, 3], and each non-root
    reachable nation has an in-edge from some nation one hop closer
    (triangle property of BFS layers)."""
    from mongo_cdc_spark.operators import relational

    got = (relational.sql_recursive_reachability(spark, sf_dir)
           .toPandas())
    assert ((got.min_hops >= 0) & (got.min_hops <= 3)).all()
    root = got[got.min_hops == 0]
    assert list(root.nation) == [0]
    assert (got.n_walks >= 1).all()
    assert got.nation.is_unique


def test_join_size_estimate_actuals_are_true_join_counts(spark, sf_dir):
    """actual_rows must equal the materialized join's count (computed
    independently here via the raw join the operator never runs),
    q-error >= 1 by construction, and the estimate formula replays."""
    from mongo_cdc_spark.operators.relational import (
        _JSE_PAIRS, stats_join_size_estimate)

    got = (stats_join_size_estimate(spark, sf_dir)
           .toPandas().set_index("pair"))
    for pair, lt, lk, rt, rk in _JSE_PAIRS:
        left = load_table(spark, sf_dir, lt)
        right = load_table(spark, sf_dir, rt)
        true_n = left.join(right, left[lk] == right[rk]).count()
        g = got.loc[pair]
        assert int(g.actual_rows) == true_n
        assert int(g.n_left) == left.count()
        assert int(g.n_right) == right.count()
        assert int(g.ndv_left) == left.select(lk).distinct().count()
        est = g.n_left * g.n_right / max(g.ndv_left, g.ndv_right)
        assert abs(g.est_rows - round(est, 2)) < 1e-6
        assert g.q_error >= 1.0
        # FK joins satisfy uniformity+containment: estimates are tight
        assert g.q_error < 1.5


def test_selectivity_estimate_matches_numpy_histogram(spark, sf_dir):
    """numpy rebuild of the equi-width histogram interpolation and
    exact predicate counts; q-error must stay modest on the smooth
    fixture distribution."""
    import numpy as np

    from mongo_cdc_spark.operators.relational import (
        _SEL_BUCKETS, _SEL_PREDICATES, stats_selectivity_estimate)

    x = np.array([r.o_totalprice for r in
                  load_table(spark, sf_dir, "orders")
                  .select("o_totalprice").collect()])
    mn, mx, n = x.min(), x.max(), len(x)
    w = (mx - mn) / _SEL_BUCKETS
    b = np.clip(((x - mn) / w).astype(int), 0, _SEL_BUCKETS - 1)
    hist = np.bincount(b, minlength=_SEL_BUCKETS)
    got = stats_selectivity_estimate(spark, sf_dir).toPandas() \
        .set_index("pred")
    for name, lo, hi in _SEL_PREDICATES:
        est = 0.0
        for k in range(_SEL_BUCKETS):
            blo, bhi = mn + k * w, mn + (k + 1) * w
            ov = max(0.0, min(bhi, hi) - max(blo, lo)) / w
            est += hist[k] * ov
        actual = int(((x >= lo) & (x < hi)).sum())
        g = got.loc[name]
        assert int(g.n_rows) == n
        assert abs(g.est_rows - round(est, 2)) < 0.5
        assert int(g.actual_rows) == actual
        qe = max((est + 1) / (actual + 1), (actual + 1) / (est + 1))
        assert abs(g.q_error - round(qe, 4)) < 1e-2
        # equi-width on a smooth distribution: within 2x
        assert g.q_error < 2.0


def test_retention_cohorts_properties_and_recompute(spark, sf_dir):
    """Day-0 retention is exactly 1, retention never exceeds 1, and a
    pandas recompute of the cohort matrix matches."""
    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.relational import (
        events_retention_cohorts)

    got = events_retention_cohorts(spark, sf_dir).toPandas()
    d0 = got[got.day_offset == 0]
    assert (d0.retention == 1.0).all()
    assert (d0.n_active == d0.n_cohort).all()
    assert (got.retention <= 1.0).all()

    ev = load_table(spark, sf_dir, "events").toPandas()
    ud = (ev.assign(day=ev.ts.dt.floor("D"))[["user_id", "day"]]
          .drop_duplicates())
    first = ud.groupby("user_id").day.min().rename("cohort")
    act = ud.join(first, on="user_id")
    act["off"] = (act.day - act.cohort).dt.days
    act = act[act.off <= 7]
    ref = (act.groupby([act.cohort.dt.strftime("%Y-%m-%d"), "off"])
           .user_id.nunique())
    for r in got.itertuples():
        assert ref[(r.cohort_day, r.day_offset)] == r.n_active


def test_rfm_scores_cover_and_sum(spark, sf_dir):
    """Scores live in 1..5, cell counts sum to the customer-with-
    orders population, and quintile cells are near-balanced per
    dimension."""
    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.relational import (
        customer_rfm_segments)

    got = customer_rfm_segments(spark, sf_dir).toPandas()
    for c in ("r_score", "f_score", "m_score"):
        assert got[c].between(1, 5).all()
    o = load_table(spark, sf_dir, "orders").toPandas()
    assert got.n_customers.sum() == o.o_custkey.nunique()
    # monetary quintiles partition ~evenly (exact quantile cuts)
    m = got.groupby("m_score").n_customers.sum()
    assert m.max() <= 1.3 * m.min() + 5


def test_ship_latency_quantiles_match_numpy(spark, sf_dir):
    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.relational import orders_ship_latency
    import numpy as np

    li = load_table(spark, sf_dir, "lineitem").toPandas()
    o = load_table(spark, sf_dir, "orders").toPandas()
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j["d"] = (j.l_shipdate - j.o_orderdate).dt.days
    got = orders_ship_latency(spark, sf_dir).toPandas() \
        .set_index("priority")
    for prio, grp in j.groupby("o_orderpriority"):
        g = got.loc[prio]
        assert int(g.n_lines) == len(grp)
        for col, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            ref = np.quantile(grp.d.to_numpy(dtype=float), q,
                              method="linear")
            assert abs(g[col] - round(ref, 4)) < 1e-9, (prio, col)
        assert abs(g.over_90d_frac
                   - round((grp.d > 90).mean(), 6)) < 1e-9


def test_cohort_ltv_identities(spark, sf_dir):
    """Offset-0 actives equal the cohort size, cumulative LTV is
    non-decreasing per cohort, and total revenue reconciles to the
    orders table to the cent."""
    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.relational import orders_cohort_ltv

    got = orders_cohort_ltv(spark, sf_dir).toPandas()
    d0 = got[got.month_offset == 0]
    assert (d0.n_active == d0.n_cohort).all()
    for _, grp in got.groupby("cohort_month"):
        ltv = grp.sort_values("month_offset").cum_ltv_per_customer
        assert (ltv.diff().dropna() >= -1e-9).all()
    o = load_table(spark, sf_dir, "orders").toPandas()
    total = (o.o_totalprice * 100).round().astype("int64").sum() / 100.0
    assert abs(got.revenue.sum() - total) < 0.01
