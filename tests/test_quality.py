"""Data-quality operator tests: profiler invariants and constraint
suite semantics (the hash-oracle checks values; these check meaning)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo_cdc_spark.io import load_table
from mongo_cdc_spark.operators import quality


def test_profile_matches_table_facts(spark, sf_dir):
    got = (quality.quality_profile_orders(spark, sf_dir)
           .toPandas().set_index("col"))
    orders = load_table(spark, sf_dir, "orders")
    n = orders.count()
    assert (got.n_rows == n).all()
    # primary key: distinct == rows, no nulls
    assert got.loc["o_orderkey", "n_distinct"] == n
    assert (got.null_count == 0).all()
    # typed min/max land in the right slots
    assert got.loc["o_totalprice", "min_num"] <= got.loc[
        "o_totalprice", "max_num"]
    assert got.loc["o_orderstatus", "min_str"] is not None
    assert got.loc["o_orderstatus", "min_num"] != got.loc[
        "o_orderstatus", "min_num"]  # NaN


def test_constraint_suite_clean_fixture(spark, sf_dir):
    got = quality.quality_constraint_checks(spark, sf_dir).toPandas()
    assert len(got) == 6
    assert got.passed.all()
    assert (got.violations == 0).all()


def test_constraint_suite_catches_violations(spark, sf_dir, tmp_path):
    """Break the data on purpose: duplicate a PK, null a custkey,
    orphan an FK — the suite must count each violation."""
    orders = (load_table(spark, sf_dir, "orders")
              .orderBy("o_orderkey").limit(100))
    dup = orders.orderBy("o_orderkey").limit(1)
    broken = (
        orders
        .unionByName(dup)  # duplicate one o_orderkey
        .unionByName(
            dup.select(
                (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
                F.lit(None).cast("long").alias("o_custkey"),
                "o_orderstatus", "o_totalprice", "o_orderdate",
                "o_orderpriority")))
    out = tmp_path / "broken"
    broken.write.parquet(str(out / "orders.parquet"))
    for t in ("customer", "lineitem"):
        load_table(spark, sf_dir, t).limit(0).write.parquet(
            str(out / f"{t}.parquet"))
    got = (quality.quality_constraint_checks(spark, str(out))
           .toPandas().set_index("check_name"))
    assert got.loc["orders_pk_unique", "violations"] == 1
    assert got.loc["orders_custkey_complete", "violations"] == 1
    # empty customer table -> every order is an orphan (the NULL
    # custkey row counts too: NOT EXISTS / left_anti keep it in both
    # engines, matching standard FK-check semantics)
    assert got.loc["orders_fk_customer", "violations"] == 102
    assert not got.loc["orders_pk_unique", "passed"]


def test_reconcile_counts_cover_all_orders(spark, sf_dir):
    got = quality.quality_reconcile_order_totals(spark, sf_dir).toPandas()
    orders = load_table(spark, sf_dir, "orders")
    assert got.n_orders.sum() == orders.count()
    assert (got.n_within_1pct <= got.n_orders).all()
    assert (got.n_no_lineitems <= got.n_orders).all()
    assert (got.avg_abs_diff.fillna(0) <= got.max_abs_diff.fillna(0)).all()


def test_mad_outliers_matches_pandas_reference(spark, sf_dir):
    got = (quality.stats_mad_outliers(spark, sf_dir)
           .toPandas().set_index("event_type"))
    ev = (load_table(spark, sf_dir, "events")
          .select("event_type", "value").toPandas())
    for etype, g in ev.groupby("event_type"):
        med = round(g.value.median(), 6)
        mad = round((g.value - med).abs().median(), 6)
        row = got.loc[etype]
        assert abs(row.med - med) < 1e-9
        assert abs(row.mad - mad) < 1e-9
        lo = med - 3 * 1.4826 * mad
        hi = med + 3 * 1.4826 * mad
        assert row.n_out_low == (g.value < lo).sum()
        assert row.n_out_high == (g.value > hi).sum()
        assert row.n == len(g)


# ----------------------------------------------------- distribution drift


def test_schema_drift_matches_pandas(spark, sf_dir):
    import numpy as np

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.quality import (
        DRIFT_SPLIT_DAY, quality_schema_drift)

    ev = load_table(spark, sf_dir, "events").select(
        "ts", "event_type", "value").toPandas()
    ev["half"] = np.where(ev.ts.dt.normalize()
                          <= f"2024-01-{DRIFT_SPLIT_DAY:02d}",
                          "ref", "cur")
    got = quality_schema_drift(spark, sf_dir).toPandas()
    n = ev.groupby(["half", "event_type"]).size()
    tot = ev.groupby("half").size()
    psi_total = 0.0
    for row in got.itertuples():
        nr, nc = n[("ref", row.event_type)], n[("cur", row.event_type)]
        assert (row.n_ref, row.n_cur) == (nr, nc)
        pr, pc = nr / tot["ref"], nc / tot["cur"]
        assert abs(row.share_ref - round(pr, 6)) < 2e-6
        assert abs(row.share_cur - round(pc, 6)) < 2e-6
        want = (pc - pr) * np.log(pc / pr)
        assert abs(row.psi_term - round(want, 6)) < 2e-6
        psi_total += want
        m = ev[ev.event_type == row.event_type].groupby("half").value.mean()
        assert abs(row.mean_shift
                   - (round(m["cur"], 6) - round(m["ref"], 6))) < 2e-5
    # PSI components must be non-negative up to rounding (it's an
    # f-divergence term: (p-q)ln(p/q) >= 0)
    assert (got.psi_term >= -1e-6).all()
    assert psi_total >= 0


def test_benford_digits_matches_python(spark, sf_dir):
    import math
    from collections import Counter

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.quality import quality_benford_digits

    prices = [r.o_totalprice for r in
              load_table(spark, sf_dir, "orders")
              .select("o_totalprice").collect() if r.o_totalprice > 0]
    cnt = Counter(str(round(p * 100))[0] for p in prices)
    got = quality_benford_digits(spark, sf_dir).toPandas()
    t = len(prices)
    assert got.n.sum() == t
    for row in got.itertuples():
        n = cnt[str(row.digit)]
        assert row.n == n
        exp = math.log10(1 + 1 / row.digit)
        assert abs(row.share - round(n / t, 6)) < 2e-6
        assert abs(row.benford_expected - round(exp, 6)) < 2e-6
        assert abs(row.chi2_term
                   - round((n / t - exp) ** 2 / exp * t, 6)) < 2e-4
    # digits are 1..9 only
    assert set(got.digit) <= set(range(1, 10))


def test_chi_square_contingency_consistency(spark, sf_dir):
    got = quality.stats_chi_square_independence(spark, sf_dir).toPandas()
    assert len(got) == 1
    r = got.iloc[0]
    # 5 segments x 5 priorities on the fixture
    assert r.dof == 16
    assert r.chi2 >= 0
    assert 0 <= r.cramers_v <= 1


def test_jackknife_means_bracket_global_mean(spark, sf_dir):
    from mongo_cdc_spark.io import load_table
    got = quality.stats_jackknife_mean(spark, sf_dir).toPandas()
    c = load_table(spark, sf_dir, "customer").toPandas()
    mean_all = c.c_acctbal.mean()
    # every leave-one-out mean is a small perturbation around the
    # global mean, and excluded counts sum to the population
    assert got.n_excluded.sum() == len(c)
    assert (abs(got.loo_mean - mean_all)
            < abs(mean_all) * 0.5 + 500).all()
    # pseudo-values average back to ~the global mean (jackknife identity)
    assert abs(got.pseudo_value.mean() - mean_all) < 1.0


def test_ab_test_split_covers_all_users(spark, sf_dir):
    from mongo_cdc_spark.io import load_table
    got = quality.ab_test_proportions(spark, sf_dir).toPandas()
    ev = load_table(spark, sf_dir, "events").toPandas()
    r = got.iloc[0]
    assert r.n_a + r.n_b == ev.user_id.nunique()
    assert 0 <= r.conv_a <= r.n_a and 0 <= r.conv_b <= r.n_b
    assert 0 <= r.rate_a <= 1 and 0 <= r.rate_b <= 1


def test_winsorized_scale_clip_fractions(spark, sf_dir):
    got = quality.feature_winsorized_scale(spark, sf_dir).toPandas()
    # P5/P95 winsorization clips ~5% each side; interpolation plus the
    # 4-dp threshold rounding allows at most a 2-count overshoot,
    # which dominates at sf0.001's ~25-row segments
    assert (got.n_clip_low <= 0.05 * got.n + 2).all()
    assert (got.n_clip_high <= 0.05 * got.n + 2).all()
    assert (got.iqr >= 0).all()
    # winsorized mean lies within the clip thresholds by construction
    assert got.winsor_mean.notna().all()


def test_ks_two_sample_matches_python_reference(spark, sf_dir):
    import math

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.quality import (_KS_TERMS,
                                                   stats_ks_two_sample)

    got = stats_ks_two_sample(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events") \
        .select("event_type", "value").collect()
    a = sorted(round(r.value, 6) for r in ev
               if r.event_type == "purchase")
    b = sorted(round(r.value, 6) for r in ev if r.event_type == "click")
    import bisect
    pts = sorted(set(a) | set(b))
    d = max(abs(bisect.bisect_right(a, x) / len(a)
                - bisect.bisect_right(b, x) / len(b)) for x in pts)
    en = len(a) * len(b) / (len(a) + len(b))
    lam = (math.sqrt(en) + 0.12 + 0.11 / math.sqrt(en)) * d
    p = 2 * sum((-1) ** (j - 1) * math.exp(-2 * j * j * lam * lam)
                for j in range(1, _KS_TERMS + 1))
    p = min(1.0, max(0.0, p))
    assert got.n1 == len(a) and got.n2 == len(b)
    assert abs(got.ks_stat - d) < 1e-6
    assert abs(got["lambda"] - lam) < 1e-6
    assert abs(got.p_value - p) < 1e-6
    crit = 1.358 * math.sqrt((len(a) + len(b)) / (len(a) * len(b)))
    assert got.reject_05 == (d > crit)


def test_sprt_walk_matches_python_reference(spark, sf_dir):
    import hashlib
    import math

    from mongo_cdc_spark.operators.quality import (_SPRT_DELTA, _SPRT_LO,
                                                   _SPRT_UP,
                                                   ab_test_sequential_sprt)

    got = ab_test_sequential_sprt(spark, sf_dir).collect()
    assert got
    ev = load_table(spark, sf_dir, "events") \
        .select("ts", "user_id", "event_type").collect()

    def is_b(uid):
        return hashlib.md5(str(uid).encode()).hexdigest()[0] >= "8"

    users = {r.user_id for r in ev}
    p0 = sum(1 for u in users if is_b(u)) / len(users)
    p1 = p0 + _SPRT_DELTA
    daily = {}
    for r in ev:
        if r.event_type != "purchase":
            continue
        d = r.ts.date()
        n, k = daily.get(d, (0, 0))
        daily[d] = (n + 1, k + (1 if is_b(r.user_id) else 0))
    nc = kc = 0
    la, lb = math.log(p1 / p0), math.log((1 - p1) / (1 - p0))
    want = []
    for d in sorted(daily):
        n, k = daily[d]
        nc, kc = nc + n, kc + k
        llr = round(kc * la + (nc - kc) * lb, 6)
        dec = ("accept_h1" if llr >= _SPRT_UP
               else "accept_h0" if llr <= _SPRT_LO else "continue")
        want.append((d, nc, kc, llr, dec))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g.day.date(), g.n_events, g.n_from_b) == w[:3]
        assert abs(g.llr - w[3]) < 1e-6
        assert g.decision == w[4]


def test_woe_iv_invariants(spark, sf_dir, oracle):
    """Counts reconcile with the orders table; feature_iv is the
    constant sum of its feature's contributions; smoothed WOE is
    finite everywhere."""
    import numpy as np

    from mongo_cdc_spark.operators import quality

    got = quality.feature_woe_iv(spark, sf_dir).toPandas()
    n_orders = oracle.sql("SELECT COUNT(*) FROM orders").fetchone()[0]
    for feat, grp in got.groupby("feature"):
        assert grp.n.sum() == n_orders
        assert np.isfinite(grp.woe).all()
        # one IV per feature, equal (to rounding) to the contrib sum
        assert grp.feature_iv.nunique() == 1
        assert abs(grp.iv_contrib.sum()
                   - grp.feature_iv.iloc[0]) < 5e-6


def test_target_encode_loo_reconstructs_segment_mean(spark, sf_dir,
                                                     oracle):
    """Closed-form identity: the n-weighted mean of per-cell LOO
    encodings within a segment equals the segment's plain mean —
    LOO redistributes, it never shifts the segment total."""
    from mongo_cdc_spark.operators import quality

    got = quality.feature_target_encode_loo(spark, sf_dir).toPandas()
    seg_means = dict(oracle.sql("""
        SELECT c.c_mktsegment, AVG(o.o_totalprice)
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1""").fetchall())
    for seg, grp in got.groupby("segment"):
        w = (grp.enc_mean * grp.n).sum() / grp.n.sum()
        assert abs(w - seg_means[seg]) < 1e-3, seg
        # every cell's band sits inside [enc_min, enc_max]
        assert (grp.enc_min <= grp.enc_mean).all()
        assert (grp.enc_mean <= grp.enc_max).all()


def test_bootstrap_subsample_ci_envelope(spark, sf_dir, oracle):
    """The replica machinery must behave like a bootstrap: the CI
    brackets the full mean, replica spread is positive, and the
    replica-mean quantiles straddle the replica mean."""
    from mongo_cdc_spark.operators import quality

    got = (quality.stats_bootstrap_subsample_ci(spark, sf_dir)
           .toPandas().iloc[0])
    full = oracle.sql(
        "SELECT AVG(o_totalprice) FROM orders").fetchone()[0]
    assert abs(got.full_mean - full) < 1e-4
    assert got.ci_lo < got.full_mean < got.ci_hi
    assert got.replica_sd > 0
    assert got.q025 <= got.boot_mean <= got.q975
    # half-sampling keeps replica means near the full mean (the
    # subsample SE at this n is < 3% of the mean)
    assert abs(got.boot_mean - got.full_mean) < 0.1 * got.full_mean


def test_permutation_weekend_agrees_with_direct_python(spark, sf_dir,
                                                       oracle):
    """p-value and permutation distribution must match an independent
    pure-Python replay of the same md5 label permutations."""
    import hashlib

    from mongo_cdc_spark.operators import quality
    from mongo_cdc_spark.operators.quality import _PERM_REPS

    got = (quality.stats_permutation_weekend(spark, sf_dir)
           .toPandas().iloc[0])
    rows = oracle.sql("""
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               SUM(value) AS tot,
               CASE WHEN EXTRACT(isodow FROM ts) >= 6
                    THEN 1 ELSE 0 END AS wk
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1, 3""").fetchall()
    n_w = sum(r[2] for r in rows)
    obs = (sum(r[1] for r in rows if r[2]) / n_w
           - sum(r[1] for r in rows if not r[2]) / (len(rows) - n_w))
    assert abs(round(obs, 6) - got.obs_diff) < 2e-6
    hits = 0
    for b in range(1, _PERM_REPS + 1):
        keyed = sorted(
            rows, key=lambda r: (int(hashlib.md5(
                f"{r[0]}_{b}".encode()).hexdigest()[:12], 16), r[0]))
        wk = keyed[:n_w]
        wd = keyed[n_w:]
        d = round(sum(r[1] for r in wk) / n_w
                  - sum(r[1] for r in wd) / len(wd), 6)
        if abs(d) >= abs(round(obs, 6)):
            hits += 1
    assert abs(got.p_value
               - round((1 + hits) / (_PERM_REPS + 1), 6)) < 1e-9


def test_isotonic_calibration_matches_pava(spark, sf_dir):
    """The minimax form must equal the classic sequential
    pool-adjacent-violators fit on the same bins, and be monotone."""
    from mongo_cdc_spark.operators import quality

    got = (quality.stats_isotonic_calibration(spark, sf_dir)
           .toPandas().sort_values("bin").reset_index(drop=True))

    # textbook sequential PAVA on (n, p) blocks
    blocks = [[r.n, r.n_pos] for r in got.itertuples()]
    i = 0
    while i < len(blocks) - 1:
        if (blocks[i][1] / blocks[i][0]
                > blocks[i + 1][1] / blocks[i + 1][0] + 1e-15):
            blocks[i][0] += blocks[i + 1][0]
            blocks[i][1] += blocks[i + 1][1]
            del blocks[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    assert got.iso_rate.is_monotonic_increasing
    # block-level equality: pooled segments share one fitted value
    # and every fitted value equals its pooled block rate
    fitted = got.iso_rate.tolist()
    k = 0
    for n, p in blocks:
        seg_n = 0
        vals = set()
        while seg_n < n:
            vals.add(fitted[k])
            seg_n += got.n[k]
            k += 1
        assert vals == {round(p / n, 6)}, (n, p, vals)
    assert k == len(fitted)


def test_psi_drift_matches_pandas_recompute(spark, sf_dir):
    """Independent pandas PSI: same pivot, reference-derived fixed
    bins, Laplace smoothing — exact per-bin counts and totals."""
    import math

    import numpy as np

    from mongo_cdc_spark.operators.quality import (
        PSI_BINS, PSI_PIVOT, feature_psi_drift)

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_quantity", "l_shipdate").toPandas()
    ref_mask = li.l_shipdate < np.datetime64(PSI_PIVOT)
    got = feature_psi_drift(spark, sf_dir).toPandas()
    for feat, col in [("extprice", "l_extendedprice"),
                      ("qty", "l_quantity")]:
        x = li[col].astype(float)
        mn, mx = x[ref_mask].min(), x[ref_mask].max()
        w = (mx - mn) / PSI_BINS
        b = np.clip(np.floor((x - mn) / w).astype(int), 0, PSI_BINS - 1)
        n_ref = np.bincount(b[ref_mask], minlength=PSI_BINS)
        n_cur = np.bincount(b[~ref_mask], minlength=PSI_BINS)
        rp = (n_ref + 0.5) / (n_ref.sum() + 0.5 * PSI_BINS)
        cp = (n_cur + 0.5) / (n_cur.sum() + 0.5 * PSI_BINS)
        psi = float(((cp - rp) * np.log(cp / rp)).sum())
        g = got[got.feature == feat].sort_values("bin")
        assert list(g.n_ref) == list(n_ref)
        assert list(g.n_cur) == list(n_cur)
        assert abs(g.feature_psi.iloc[0] - round(psi, 6)) < 2e-6
        # smoothed shares each sum to exactly 1
        assert math.isclose(g.ref_pct.sum(), 1.0, abs_tol=1e-4)
        assert math.isclose(g.cur_pct.sum(), 1.0, abs_tol=1e-4)
        # bin edges tile [mn, mx] contiguously
        assert math.isclose(g.bin_lo.iloc[0], round(mn, 4), abs_tol=1e-4)
        assert math.isclose(g.bin_hi.iloc[-1], round(mx, 4), abs_tol=1e-4)
        assert np.allclose(g.bin_hi.values[:-1], g.bin_lo.values[1:],
                           atol=1e-4)


def test_conformal_interval_matches_python_recompute(spark, sf_dir):
    """Independent Python split conformal: same md5 split, same
    rounded coefficients, same k-th order statistic and coverage."""
    import hashlib
    import math

    from mongo_cdc_spark.operators.quality import (
        CONF_ALPHAS, stats_conformal_interval)

    rows = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    ).collect()
    tr, ca, te = [], [], []
    for r in rows:
        h = hashlib.md5(
            f"{r.l_orderkey}:{r.l_linenumber}".encode()).hexdigest()[0]
        rec = (float(r.l_quantity), float(r.l_extendedprice))
        (tr if h < "8" else ca if h < "c" else te).append(rec)
    n = len(tr)
    sx = sum(x for x, _ in tr); sy = sum(y for _, y in tr)
    sxy = sum(x * y for x, y in tr); sxx = sum(x * x for x, _ in tr)
    slope = round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
    inter = round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                  / n, 6)
    cr = sorted(round(abs(y - (inter + slope * x)), 2) for x, y in ca)
    got = stats_conformal_interval(spark, sf_dir).toPandas() \
        .set_index("alpha")
    for alpha in CONF_ALPHAS:
        k = math.ceil((len(ca) + 1) * (1 - alpha))
        q = cr[k - 1]
        trow = [round(abs(y - (inter + slope * x)), 2) for x, y in te]
        coverage = sum(1 for r_ in trow if r_ <= q) / len(trow)
        g = got.loc[alpha]
        assert (int(g.n_train), int(g.n_calib), int(g.n_test)) \
            == (n, len(ca), len(te))
        assert (g.slope, g.intercept) == (slope, inter)
        assert int(g.k) == k and abs(g.q_hat - q) < 1e-9
        assert abs(g.coverage - round(coverage, 6)) < 2e-6
        # guarantee sanity: held-out coverage near/above 1 - alpha
        assert g.coverage >= 1 - alpha - 0.02
    # tighter alpha (0.05) must have the wider (>=) interval
    assert got.loc[0.05, "q_hat"] >= got.loc[0.1, "q_hat"]


def test_diff_in_diff_matches_python_recompute(spark, sf_dir):
    """Independent Python DiD: same md5 assignment, same 2x2 cells,
    same exact-integer moment algebra and A&S p-value."""
    import hashlib
    import math
    from collections import Counter

    from mongo_cdc_spark.operators.quality import (
        DID_PIVOT, ab_test_diff_in_diff)

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase").select("user_id", "ts") \
        .collect()
    y = Counter()
    for r in ev:
        treat = 1 if hashlib.md5(
            str(r.user_id).encode()).hexdigest()[0] < "8" else 0
        period = "pre" if str(r.ts) < DID_PIVOT else "post"
        y[(r.user_id, treat, period)] += 1
    cells = {}
    for (u, t, p), c in y.items():
        n, sy, sy2 = cells.get((t, p), (0, 0, 0))
        cells[(t, p)] = (n + 1, sy + c, sy2 + c * c)
    m, v, n = {}, {}, {}
    for k, (cn, sy, sy2) in cells.items():
        n[k] = cn
        m[k] = sy / cn
        v[k] = (sy2 - sy * sy / cn) / (cn - 1)
    did = (m[(1, "post")] - m[(1, "pre")]) \
        - (m[(0, "post")] - m[(0, "pre")])
    se = math.sqrt(sum(v[k] / n[k] for k in cells))
    az = abs(did / se)
    # A&S 26.2.17 tail
    kk = 1.0 / (1.0 + 0.2316419 * az)
    poly = sum(b * kk ** (i + 1) for i, b in enumerate(
        (0.319381530, -0.356563782, 1.781477937,
         -1.821255978, 1.330274429)))
    p = 2.0 * math.exp(-az * az / 2) / 2.5066282746310002 * poly

    g = ab_test_diff_in_diff(spark, sf_dir).toPandas().iloc[0]
    assert (int(g.n_treat_pre), int(g.n_treat_post)) \
        == (n[(1, "pre")], n[(1, "post")])
    assert (int(g.n_ctrl_pre), int(g.n_ctrl_post)) \
        == (n[(0, "pre")], n[(0, "post")])
    assert abs(g.mean_treat_pre - round(m[(1, "pre")], 6)) < 2e-6
    assert abs(g.did - round(did, 6)) < 2e-6
    assert abs(g.se - round(se, 6)) < 2e-6
    assert abs(g.z_stat - round(did / se, 6)) < 2e-6
    assert abs(g.p_value - round(p, 6)) < 2e-6
    assert 0 < g.p_value <= 1


def test_brier_decomposition_identity_and_python_recompute(spark,
                                                           sf_dir):
    """BS = REL - RES + UNC must hold exactly (same-bin constant
    forecasts), and every term matches an independent recompute
    scoring the test half row by row."""
    import hashlib

    from mongo_cdc_spark.operators.quality import (
        _BRIER_BINS, stats_brier_decomposition)

    got = stats_brier_decomposition(spark, sf_dir).toPandas()
    r = got.iloc[0]
    assert abs(r.brier - (r.reliability - r.resolution
                          + r.uncertainty)) < 5e-6

    rows = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus").collect()
    recs = [(float(x.o_totalprice),
             1 if x.o_orderstatus == "F" else 0,
             hashlib.md5(str(x.o_orderkey).encode()).hexdigest()[0]
             < "8") for x in rows]
    # replicate the 4dp-rounded type-7 decile cuts on the train half
    import numpy as np
    tr = sorted(x for x, _, t in recs if t)
    cuts = [round(float(np.quantile(tr, q, method="linear")), 4)
            for q in [i / _BRIER_BINS for i in range(1, _BRIER_BINS)]]
    f_hat, nst = {}, {}
    for x, y, t in recs:
        b = sum(1 for c in cuts if x > c)
        k = (b, t)
        n, s = nst.get(k, (0, 0))
        nst[k] = (n + 1, s + y)
    test_n = sum(n for (b, t), (n, _) in nst.items() if not t)
    brier = 0.0
    for b in range(_BRIER_BINS):
        m, s = nst[(b, True)]
        f = s / m
        n, o = nst[(b, False)]
        brier += n * f * f - 2 * f * o + o
        g = got[got.bin == b].iloc[0]
        assert int(g.n) == n
        assert abs(g.f_hat - round(f, 6)) < 2e-6
        assert abs(g.obs_rate - round(o / n, 6)) < 2e-6
    assert abs(r.brier - round(brier / test_n, 6)) < 5e-6
    # a probability forecast always beats/meets climatology only via
    # positive resolution; both quadratic terms are non-negative
    assert r.reliability >= 0 and r.resolution >= 0
    assert 0 < r.uncertainty <= 0.25


def test_neyman_allocation_matches_numpy_and_dominates(spark, sf_dir):
    """Independent numpy recompute + the design guarantee:
    Var_neyman <= Var_prop (Cauchy-Schwarz), allocations sum to the
    budget, weights sum to 1."""
    import numpy as np

    from mongo_cdc_spark.operators.quality import (
        NEYMAN_BUDGET, sample_neyman_allocation)

    c = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_acctbal").toPandas()
    c["y"] = (c.c_acctbal * 100).round().astype("int64")
    got = (sample_neyman_allocation(spark, sf_dir)
           .toPandas().set_index("stratum"))
    g = c.groupby("c_mktsegment").y
    nh = g.size()
    sd = {}
    for k, grp in g:
        v = grp.to_numpy(dtype=np.float64)
        sd[k] = float(np.sqrt((v @ v - v.sum() ** 2 / len(v))
                              / (len(v) - 1)) / 100.0)
    n_pop = int(nh.sum())
    sum_ns = sum(nh[k] * sd[k] for k in sd)
    sum_ns2 = sum(nh[k] * sd[k] ** 2 for k in sd)
    for k in sd:
        row = got.loc[k]
        assert int(row.n_stratum) == nh[k]
        assert abs(row.sd_h - round(sd[k], 6)) < 2e-6
        assert abs(row.n_neyman
                   - round(NEYMAN_BUDGET * nh[k] * sd[k] / sum_ns,
                           2)) < 0.02
        assert abs(row.n_prop
                   - round(NEYMAN_BUDGET * nh[k] / n_pop, 2)) < 0.02
    assert abs(got.weight.sum() - 1.0) < 1e-4
    assert abs(got.n_neyman.sum() - NEYMAN_BUDGET) < 0.1
    assert abs(got.n_prop.sum() - NEYMAN_BUDGET) < 0.1
    vn, vp = got.var_neyman.iloc[0], got.var_prop.iloc[0]
    assert abs(vn - round((sum_ns / n_pop) ** 2 / NEYMAN_BUDGET, 6)) \
        < 2e-6
    assert abs(vp - round((sum_ns2 / n_pop) / NEYMAN_BUDGET, 6)) < 2e-6
    assert vn <= vp + 1e-9


def test_kfold_cv_slope_matches_sklearn_style_recompute(spark, sf_dir):
    """Independent recompute: explicit per-fold refits (numpy lstsq
    normal equations) must equal the sum-identity coefficients, and
    each RMSE must equal direct held-out scoring."""
    import hashlib
    import math

    import numpy as np

    from mongo_cdc_spark.operators.quality import (
        CV_FOLDS, stats_kfold_cv_slope)

    rows = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    ).collect()
    folds = [[] for _ in range(CV_FOLDS)]
    for r in rows:
        h = hashlib.md5(
            f"{r.l_orderkey}:{r.l_linenumber}".encode()).hexdigest()[0]
        k = "0123456789abcdef".index(h) // (16 // CV_FOLDS)
        folds[k].append((int(r.l_quantity),
                         int(round(r.l_extendedprice * 100))))
    got = stats_kfold_cv_slope(spark, sf_dir).toPandas() \
        .set_index("fold")
    slopes = []
    for k in range(CV_FOLDS):
        train = [p for j in range(CV_FOLDS) if j != k for p in folds[j]]
        n = len(train)
        sx = sum(x for x, _ in train)
        sy = sum(y for _, y in train)
        sxy = sum(x * y for x, y in train)
        sxx = sum(x * x for x, y in train)
        slope = round((n * sxy - sx * sy) / ((n * sxx - sx * sx)
                                             * 100.0), 6)
        inter = round((sy / 100.0 - (n * sxy - sx * sy)
                       / ((n * sxx - sx * sx) * 100.0) * sx) / n, 6)
        rmse = round(math.sqrt(np.mean(
            [(y / 100.0 - (inter + slope * x)) ** 2
             for x, y in folds[k]])), 4)
        g = got.loc[k]
        assert (int(g.n_train), int(g.n_eval)) == (n, len(folds[k]))
        assert (g.slope, g.intercept) == (slope, inter)
        assert abs(g.rmse - rmse) < 1e-3
        slopes.append(slope)
    assert abs(got.cv_mean_slope.iloc[0]
               - round(float(np.mean(slopes)), 6)) < 2e-6
    assert abs(got.cv_sd_slope.iloc[0]
               - round(float(np.std(slopes, ddof=1)), 6)) < 2e-6
    # folds cover everything exactly once
    assert int(got.n_eval.sum()) == len(rows)


def test_fd_discovery_verdicts_and_g3(spark, sf_dir):
    """Pandas recompute of the g3 measure per candidate; the two
    by-construction FDs must hold, the two independents must not."""
    from mongo_cdc_spark.operators.quality import (
        _FD_CANDIDATES, quality_fd_discovery)

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority").toPandas()
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey").toPandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    got = quality_fd_discovery(spark, sf_dir).toPandas() \
        .set_index("fd")
    for lhs, rhs in _FD_CANDIDATES:
        pair = j.groupby([lhs, rhs]).size().rename("c").reset_index()
        perl = pair.groupby(lhs).c.agg(["sum", "max"])
        viol = int((perl["sum"] - perl["max"]).sum())
        g = got.loc[f"{lhs}->{rhs}"]
        assert int(g.n_groups) == len(perl)
        assert int(g.n_rows) == len(j)
        assert int(g.n_violations) == viol
        assert bool(g.holds) == (viol == 0)
        assert abs(g.g3_conf - round(1 - viol / len(j), 6)) < 2e-6
    assert bool(got.loc["o_custkey->c_mktsegment", "holds"])
    assert bool(got.loc["o_custkey->c_nationkey", "holds"])
    assert not bool(got.loc["c_mktsegment->o_orderpriority", "holds"])
    assert not bool(got.loc["c_nationkey->c_mktsegment", "holds"])


def test_auc_roc_matches_rank_based_reference(spark, sf_dir):
    """Average-rank AUC recompute (the roc_auc_score algorithm) must
    equal the Mann-Whitney U form with tie correction exactly."""
    from collections import Counter

    from mongo_cdc_spark.operators.quality import (
        AUC_POS_MIN, stats_auc_roc)

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type").toPandas()
    g = ev.groupby("user_id").event_type
    score = g.apply(lambda s: (s == "click").sum())
    y = (g.apply(lambda s: (s == "purchase").sum())
         >= AUC_POS_MIN).astype(int)
    # average-rank formulation with ties
    import numpy as np
    order = np.argsort(score.values, kind="mergesort")
    ranks = np.empty(len(score), dtype=float)
    sv = score.values[order]
    i = 0
    r = 1
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (r + (r + (j - i) - 1)) / 2.0
        r += j - i
        i = j
    n_pos = int(y.sum())
    n_neg = len(y) - n_pos
    auc = (ranks[y.values == 1].sum()
           - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
    got = stats_auc_roc(spark, sf_dir).toPandas().iloc[0]
    assert int(got.n_users) == len(y)
    assert (int(got.n_pos), int(got.n_neg)) == (n_pos, n_neg)
    assert abs(got.auc - round(auc, 6)) < 2e-6
    assert abs(got.gini - round(2 * auc - 1, 6)) < 2e-6
    assert 0.0 <= got.auc <= 1.0


def test_srm_check_matches_python_chi_square(spark, sf_dir):
    """Exact chi-square recompute; the clean md5 split must NOT
    flag (it is a genuine 50/50 design)."""
    import hashlib

    from mongo_cdc_spark.operators.quality import ab_test_srm_check

    users = {r.user_id for r in load_table(spark, sf_dir, "events")
             .select("user_id").distinct().collect()}
    n_a = sum(1 for u in users if hashlib.md5(
        str(u).encode()).hexdigest()[0] < "8")
    n_b = len(users) - n_a
    exp = len(users) / 2
    chi2 = (n_a - exp) ** 2 / exp + (n_b - exp) ** 2 / exp
    got = ab_test_srm_check(spark, sf_dir).toPandas() \
        .set_index("variant")
    assert int(got.loc["A", "n_users"]) == n_a
    assert int(got.loc["B", "n_users"]) == n_b
    assert abs(got.chi2.iloc[0] - round(chi2, 6)) < 2e-6
    assert bool(got.srm_flag.iloc[0]) == (chi2 > 3.841)
    # flag is consistent across the two variant rows
    assert got.srm_flag.nunique() == 1


def test_hill_tail_index_matches_numpy(spark, sf_dir):
    """numpy order-statistic recompute at every k; SE identity and
    the k-sweep stability property."""
    import numpy as np

    from mongo_cdc_spark.operators.quality import (
        HILL_KS, stats_hill_tail_index)

    rows = load_table(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderkey").collect()
    xs = sorted(((r.o_totalprice, r.o_orderkey) for r in rows),
                key=lambda t: (-t[0], t[1]))
    got = stats_hill_tail_index(spark, sf_dir).toPandas() \
        .set_index("k")
    for k in HILL_KS:
        thresh = xs[k][0]
        lts = [round(np.log(xs[i][0] / thresh), 8) for i in range(k)]
        alpha = k / sum(lts)
        g = got.loc[k]
        assert abs(g.x_thresh - round(thresh, 2)) < 1e-6
        assert abs(g.hill_alpha - round(alpha, 6)) < 2e-6
        assert abs(g.alpha_se - round(alpha / np.sqrt(k), 6)) < 2e-6
        assert g.hill_alpha > 0
    # SE shrinks with k (same-alpha scale, more order statistics)
    assert got.alpha_se.loc[HILL_KS[-1]] \
        < got.alpha_se.loc[HILL_KS[0]] * 1.5


def test_iv_wald_matches_python_and_surfaces_weak_instrument(
        spark, sf_dir):
    """Python cell recompute; the hash instrument is A/A so the
    first stage must be SMALL and visibly reported (the
    weak-instrument guard a platform needs before trusting LATE)."""
    import hashlib

    from mongo_cdc_spark.operators.quality import (
        IV_HEAVY_MIN, ab_test_iv_wald)

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase").select(
        "user_id", "value").toPandas()
    allu = {r.user_id for r in load_table(spark, sf_dir, "events")
            .select("user_id").distinct().collect()}
    per = ev.groupby("user_id").value.agg(["count", "sum"])
    cells = {0: [0, 0, 0], 1: [0, 0, 0]}   # n, sum_d, sum_yc
    for u in allu:
        z = 1 if hashlib.md5(str(u).encode()).hexdigest()[0] < "8" \
            else 0
        cnt = int(per["count"].get(u, 0))
        yc = int(round(per["sum"].get(u, 0.0) * 100)) if cnt else 0
        # per-user cents: sum of per-event rounded cents
        if cnt:
            yc = int(ev[ev.user_id == u].value.mul(100).round()
                     .astype("int64").sum())
        cells[z][0] += 1
        cells[z][1] += 1 if cnt >= IV_HEAVY_MIN else 0
        cells[z][2] += yc
    n1, sd1, sy1 = cells[1]
    n0, sd0, sy0 = cells[0]
    itt = sy1 / 100 / n1 - sy0 / 100 / n0
    fs = sd1 / n1 - sd0 / n0
    got = ab_test_iv_wald(spark, sf_dir).toPandas().iloc[0]
    assert (int(got.n_encouraged), int(got.n_control)) == (n1, n0)
    assert abs(got.itt_y - round(itt, 6)) < 2e-6
    assert abs(got.first_stage - round(fs, 6)) < 2e-6
    if fs != 0:
        assert abs(got.late_wald - round(itt / fs, 6)) < 2e-4
    assert 0 <= got.takeup_encouraged <= 1
    assert 0 <= got.takeup_control <= 1
    assert -1 <= got.first_stage <= 1


def test_clustered_se_matches_python_delta_method(spark, sf_dir):
    """Python recompute of both SEs; the clustered SE must exceed
    the naive event-level SE on within-user-correlated values."""
    import hashlib
    import math
    from collections import defaultdict

    from mongo_cdc_spark.operators.quality import ab_test_clustered_se

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "value").toPandas()
    per = defaultdict(lambda: [0, 0.0])
    sv2 = defaultdict(float)
    for u, v in zip(ev.user_id, ev.value):
        var = "A" if hashlib.md5(
            str(u).encode()).hexdigest()[0] < "8" else "B"
        per[(var, u)][0] += 1
        per[(var, u)][1] += int(round(v * 100))
        # same integer-cents representation as the per-user sums —
        # both moments share one rounding rule (round-7 ADVICE fix)
        sv2[var] += int(round(v * 100)) ** 2 / 10000.0
    got = ab_test_clustered_se(spark, sf_dir).toPandas() \
        .set_index("variant")
    for var in ("A", "B"):
        users = [(k, s / 100.0) for (vv, _), (k, s) in per.items()
                 if vv == var]
        nu = len(users)
        ne = sum(k for k, _ in users)
        ss = sum(s for _, s in users)
        r = ss / ne
        var_s = sum(s * s for _, s in users) / nu - (ss / nu) ** 2
        var_k = sum(k * k for k, _ in users) / nu - (ne / nu) ** 2
        cov = sum(s * k for k, s in users) / nu - (ss / nu) * (ne / nu)
        kbar = ne / nu
        var_event = sv2[var] / ne - r * r
        se_n = math.sqrt(var_event / ne)
        se_c = math.sqrt(
            (var_s - 2 * r * cov + r * r * var_k) / nu) / kbar
        g = got.loc[var]
        assert (int(g.n_users), int(g.n_events)) == (nu, ne)
        assert abs(g.mean_per_event - round(r, 6)) < 2e-6
        assert abs(g.se_naive - round(se_n, 6)) < 2e-5
        assert abs(g.se_clustered - round(se_c, 6)) < 2e-5
        assert abs(g.design_effect
                   - round(se_c ** 2 / se_n ** 2, 4)) < 2e-3
        assert g.design_effect > 0


def test_eb_shrinkage_matches_python_mom(spark, sf_dir):
    """Python method-of-moments + posterior recompute; shrunken
    rates sit between the raw rate and the prior mean, and data
    weight rises with volume."""
    from collections import defaultdict

    from mongo_cdc_spark.operators.quality import (
        EB_BUCKET_CAP, EB_BUCKET_W, stats_eb_shrinkage)

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type").toPandas()
    per = defaultdict(lambda: [0, 0])
    for u, t in zip(ev.user_id, ev.event_type):
        if t == "click":
            per[u][0] += 1
        if t in ("click", "view"):
            per[u][1] += 1
    rated = [(k, n, k / n) for k, n in per.values() if n > 0]
    nu = len(rated)
    m1 = sum(p for _, _, p in rated) / nu
    v = (sum(p * p for _, _, p in rated) / nu - m1 * m1) \
        * nu / (nu - 1)
    kappa = m1 * (1 - m1) / v - 1
    alpha = round(m1 * kappa, 6)
    beta = round((1 - m1) * kappa, 6)
    buckets = defaultdict(list)
    for k, n, p in rated:
        buckets[min(n // EB_BUCKET_W, EB_BUCKET_CAP)].append((k, n))
    got = stats_eb_shrinkage(spark, sf_dir).toPandas() \
        .set_index("bucket")
    prior_mean = alpha / (alpha + beta)
    for bkt, rows in buckets.items():
        g = got.loc[bkt]
        assert int(g.n_users) == len(rows)
        raw = sum(k for k, _ in rows) / sum(n for _, n in rows)
        shr = sum((k + alpha) / (n + alpha + beta)
                  for k, n in rows) / len(rows)
        w = sum(n / (n + alpha + beta) for _, n in rows) / len(rows)
        assert abs(g.raw_rate - round(raw, 6)) < 2e-6
        assert abs(g.avg_shrunk_rate - round(shr, 6)) < 2e-6
        assert abs(g.avg_data_weight - round(w, 6)) < 2e-6
        assert (g.alpha, g.beta) == (alpha, beta)
        # shrunken mean lies between raw bucket mean-of-rates and
        # the prior mean
        mraw = sum(k / n for k, n in rows) / len(rows)
        lo, hi = sorted((mraw, prior_mean))
        assert lo - 1e-9 <= g.avg_shrunk_rate <= hi + 1e-9
    # monotone: higher-volume buckets trust their own data more
    assert got.avg_data_weight.is_monotonic_increasing


def test_key_discovery_matches_pandas_and_verdicts(spark, sf_dir):
    """Pandas recompute per candidate; the PK must pass and wider
    candidates can only be at least as unique as their subsets."""
    from mongo_cdc_spark.operators.quality import (
        _KEY_CANDIDATES, quality_key_discovery)

    o = load_table(spark, sf_dir, "orders").toPandas()
    got = quality_key_discovery(spark, sf_dir).toPandas() \
        .set_index("candidate")
    uniq = {}
    for cols in _KEY_CANDIDATES:
        name = "+".join(cols)
        key = o[list(cols)].astype(str).agg(":".join, axis=1)
        d = key.nunique()
        g = got.loc[name]
        assert int(g.n_rows) == len(o)
        assert int(g.n_distinct) == d
        assert bool(g.is_key) == (d == len(o))
        assert int(g.n_collisions) == len(o) - d
        uniq[cols] = d
    assert bool(got.loc["o_orderkey", "is_key"])
    # superset monotonicity: adding a column never lowers distinct
    assert uniq[("o_custkey", "o_orderdate", "o_totalprice")] \
        >= uniq[("o_custkey", "o_orderdate")] \
        >= uniq[("o_custkey",)]


def test_fk_orphans_fixture_is_consistent(spark, sf_dir):
    """The generated fixture is referentially intact; the audit must
    say so (and the childless-orders count matches pandas)."""
    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.quality import quality_fk_orphans

    got = quality_fk_orphans(spark, sf_dir).toPandas().set_index("fk")
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    o = load_table(spark, sf_dir, "orders").toPandas()
    childless = (~o.o_orderkey.isin(li.l_orderkey)).sum()
    assert got.loc["orders w/o lineitem (childless)"].n_orphans \
        == childless
    fk_rows = got.drop(index="orders w/o lineitem (childless)")
    assert (fk_rows.n_orphans == 0).all()
    assert fk_rows.fk_holds.all()


def test_levene_matches_python_recompute(spark, sf_dir):
    """Python Brown-Forsythe recompute on the 4-dp-rounded group
    medians the operator declares."""
    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.quality import stats_levene_variance
    import numpy as np

    c = load_table(spark, sf_dir, "customer").toPandas()
    got = stats_levene_variance(spark, sf_dir).toPandas() \
        .set_index("segment")
    groups, zbars = {}, {}
    for seg, grp in c.groupby("c_mktsegment"):
        md = round(float(np.quantile(
            grp.c_acctbal.to_numpy(dtype=float), 0.5,
            method="linear")), 4)
        assert abs(got.loc[seg].seg_median - md) < 1e-9
        z = (grp.c_acctbal - md).abs().to_numpy(dtype=float)
        groups[seg] = z
        assert abs(got.loc[seg].mean_absdev - round(z.mean(), 6)) < 1e-6
    nn = sum(len(z) for z in groups.values())
    k = len(groups)
    zbar = sum(z.sum() for z in groups.values()) / nn
    num = sum(len(z) * (z.mean() - zbar) ** 2 for z in groups.values())
    den = sum(((z - z.mean()) ** 2).sum() for z in groups.values())
    w = (nn - k) / (k - 1) * num / den
    assert abs(got.bf_stat.iloc[0] - round(w, 6)) < 1e-4
    assert int(got.df1.iloc[0]) == k - 1
    assert int(got.df2.iloc[0]) == nn - k


def test_mcnemar_matches_python_recompute(spark, sf_dir):
    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.quality import (
        MCNEMAR_MIN_PURCHASES, MCNEMAR_PIVOT, stats_mcnemar_paired)
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").toPandas()
    pivot = pd.Timestamp(MCNEMAR_PIVOT)
    p = ev[ev.event_type == "purchase"]
    pre = (p[p.ts < pivot].groupby("user_id").size()
           >= MCNEMAR_MIN_PURCHASES)
    post = (p[p.ts >= pivot].groupby("user_id").size()
            >= MCNEMAR_MIN_PURCHASES)
    users = ev.user_id.unique()
    b = sum(bool(pre.get(u, False)) and not post.get(u, False)
            for u in users)
    c = sum(not pre.get(u, False) and bool(post.get(u, False))
            for u in users)
    got = stats_mcnemar_paired(spark, sf_dir).collect()[0]
    assert (got.n_pre_only, got.n_post_only) == (b, c)
    assert (got.n_both + got.n_pre_only + got.n_post_only
            + got.n_neither) == len(users)
    assert abs(got.chi2 - round((b - c) ** 2 / (b + c), 6)) < 1e-9
    cc = (abs(b - c) - 1) ** 2 / (b + c)
    assert abs(got.chi2_cc - round(cc, 6)) < 1e-9
    assert got.reject_05 == (cc > 3.841)


def test_gini_split_search_matches_python_reference(spark, sf_dir):
    """Exhaustive pure-Python split search over the same floored
    feature must reproduce every reported split and impurity."""
    import math
    from collections import defaultdict

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.quality import (_GINI_TOPK,
                                                   stats_gini_split_search)

    rows = load_table(spark, sf_dir, "events").select(
        "value", "event_type").collect()
    counts = defaultdict(lambda: [0, 0])
    for r in rows:
        counts[int(math.floor(r["value"]))][
            0 if r["event_type"] == "purchase" else 1] += 1
    tp = sum(p for p, _ in counts.values())
    tn = sum(q for _, q in counts.values())
    n = tp + tn

    def gini(p, q):
        m = p + q
        return 1 - (p / m) ** 2 - (q / m) ** 2

    cand = []
    pos_l = neg_l = 0
    for fx in sorted(counts):
        pos_l += counts[fx][0]
        neg_l += counts[fx][1]
        n_l = pos_l + neg_l
        if n_l == n:
            continue
        g_w = round((n_l * gini(pos_l, neg_l)
                     + (n - n_l) * gini(tp - pos_l, tn - neg_l)) / n, 6)
        cand.append((g_w, fx, n_l, n - n_l, pos_l, tp - pos_l,
                     round(gini(pos_l, neg_l), 6),
                     round(gini(tp - pos_l, tn - neg_l), 6)))
    cand.sort()
    g_p = round(gini(tp, tn), 6)
    want = [(i + 1, fx, nl, nr, pl, pr, gl, gr, gw, g_p,
             round(g_p - gw, 6))
            for i, (gw, fx, nl, nr, pl, pr, gl, gr)
            in enumerate(cand[:_GINI_TOPK])]
    got = [(r["rank"], r["threshold"], r["n_left"], r["n_right"],
            r["pos_left"], r["pos_right"], r["gini_left"],
            r["gini_right"], r["gini_weighted"], r["gini_parent"],
            r["gini_gain"])
           for r in stats_gini_split_search(spark, sf_dir).collect()]
    assert got == want
    # a split can never beat zero impurity or the parent by chance sign
    for r in got:
        assert 0 <= r[8] <= g_p + 1e-9


def test_data_contract_check_clean_fixture_and_violations(spark, sf_dir):
    """The fixture satisfies the contract; injected violations are
    counted by an independent Python recompute."""
    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.quality import (
        quality_data_contract_check)

    rows = {r["rule"]: r for r in
            quality_data_contract_check(spark, sf_dir).collect()}
    assert set(rows) == {
        "o_custkey_positive", "o_orderdate_range", "o_orderkey_not_null",
        "o_orderkey_unique", "o_orderstatus_domain", "o_totalprice_range"}
    n = load_table(spark, sf_dir, "orders").count()
    for r in rows.values():
        assert r["n_rows"] == n
        assert r["passes"] == (r["n_violations"] == 0)
    # independent recompute of two rules
    data = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice").collect()
    bad_status = sum(1 for d in data
                     if d["o_orderstatus"] not in ("O", "F", "P"))
    dup = len(data) - len({d["o_orderkey"] for d in data})
    assert rows["o_orderstatus_domain"]["n_violations"] == bad_status
    assert rows["o_orderkey_unique"]["n_violations"] == dup


def test_pinball_eval_matches_python_reference(spark, sf_dir):
    """Pure-Python octile fit + pinball scoring over the same md5
    split must reproduce forecasts, losses, and coverage."""
    import hashlib

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.quality import (
        _PINBALL_DEN, stats_pinball_quantile_eval)

    data = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice").collect()
    train, test = [], []
    for d in data:
        h = hashlib.md5(str(d["o_orderkey"]).encode()).hexdigest()
        (train if h[0] < "8" else test).append(d["o_totalprice"])
    train.sort()
    got = {r["qi"]: r for r in
           stats_pinball_quantile_eval(spark, sf_dir).collect()}
    assert set(got) == set(range(1, _PINBALL_DEN))
    for qi in range(1, _PINBALL_DEN):
        q = qi / _PINBALL_DEN
        pos = (len(train) - 1) * q
        lo = int(pos)
        f = train[lo] + (pos - lo) * (train[min(lo + 1, len(train) - 1)]
                                      - train[lo])
        f4 = round(f, 4)
        assert got[qi]["forecast"] == f4, qi
        fs = round(f4 * 10000)
        l8 = sum((qi if round(y * 10000) >= fs else qi - _PINBALL_DEN)
                 * (round(y * 10000) - fs) for y in test)
        want_loss = round(l8 / (_PINBALL_DEN * 10000.0) / len(test), 6)
        assert got[qi]["mean_pinball"] == want_loss, qi
        cov = sum(1 for y in test if round(y * 10000) <= fs) / len(test)
        assert got[qi]["coverage"] == round(cov, 6), qi
        assert got[qi]["n_test"] == len(test)
    # calibration sanity: coverage is nondecreasing in q
    covs = [got[qi]["coverage"] for qi in range(1, _PINBALL_DEN)]
    assert covs == sorted(covs)


def test_g_test_matches_python_reference(spark, sf_dir):
    """Pure-Python G = 2 sum O ln(O/E) over the same contingency."""
    import math
    from collections import Counter

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.quality import (
        stats_g_test_independence)

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority").collect()
    c = {r["c_custkey"]: r["c_mktsegment"] for r in
         load_table(spark, sf_dir, "customer").collect()}
    obs = Counter((c[r["o_custkey"]], r["o_orderpriority"]) for r in o)
    segs = {k[0] for k in obs}
    prios = {k[1] for k in obs}
    n = sum(obs.values())
    row = {s: sum(v for k, v in obs.items() if k[0] == s) for s in segs}
    col = {p: sum(v for k, v in obs.items() if k[1] == p)
           for p in prios}
    g = 2 * sum(obs[(s, p)] * math.log(obs[(s, p)]
                                       / (row[s] * col[p] / n))
                for s in segs for p in prios if obs.get((s, p), 0) > 0)
    got = stats_g_test_independence(spark, sf_dir).collect()[0]
    assert got["n"] == n
    dof = (len(segs) - 1) * (len(prios) - 1)
    assert got["dof"] == dof
    # Threshold must match the ACTUAL dof of the contingency — the
    # operator hardcodes 26.296 (df=16, the 5x5 fixture); derive it
    # here so a fixture-shape change fails loudly.
    crit = {4: 9.488, 16: 26.296}[dof]
    assert got["g_stat"] == round(g, 6)
    assert got["reject_05"] == (round(g, 6) > crit)


def test_qini_matches_python_reference(spark, sf_dir):
    """Pure-Python replay of the rank/decile/cumulative pipeline."""
    import hashlib
    from collections import defaultdict

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.quality import (_QINI_BUCKETS,
                                                   ab_test_uplift_qini)

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value").collect()
    score = defaultdict(int)
    cents = defaultdict(int)
    for r in ev:
        if r["event_type"] == "click":
            score[r["user_id"]] += 1
        if r["event_type"] == "purchase":
            cents[r["user_id"]] += round(r["value"] * 100)
        score.setdefault(r["user_id"], 0)
    users = sorted(score)
    spend = {u: cents.get(u, 0) / 100.0 for u in users}
    sp = sorted(spend.values())
    pos = (len(sp) - 1) * 0.5
    lo = int(pos)
    m = round(sp[lo] + (pos - lo) * (sp[min(lo + 1, len(sp) - 1)]
                                     - sp[lo]), 4)
    # Tie-break on the SALTED rank hash (rk:<user>), NOT the
    # assignment hash — ranking must be independent of treatment.
    rows = sorted(
        ((score[u], hashlib.md5(str(u).encode()).hexdigest(),
          hashlib.md5(f"rk:{u}".encode()).hexdigest(), u)
         for u in users), key=lambda t: (-t[0], t[2]))
    n = len(rows)
    cum = defaultdict(lambda: [0, 0, 0, 0])  # nt nc ct cc per decile
    for rk, (s, h, hr, u) in enumerate(rows, 1):
        d = (rk - 1) * _QINI_BUCKETS // n + 1
        t = 0 if h[0] < "8" else 1
        conv = 1 if spend[u] > m else 0
        cell = cum[d]
        cell[0] += t
        cell[1] += 1 - t
        cell[2] += t * conv
        cell[3] += (1 - t) * conv
    got = {r["decile"]: r for r in
           ab_test_uplift_qini(spark, sf_dir).collect()}
    cnt = cnc = cct = ccc = 0
    for d in sorted(cum):
        nt, nc, ct, cc = cum[d]
        cnt, cnc, cct, ccc = cnt + nt, cnc + nc, cct + ct, ccc + cc
        r = got[d]
        assert (r["n_treat"], r["n_control"], r["conv_treat"],
                r["conv_control"]) == (nt, nc, ct, cc), d
        want_q = round(cct - ccc * (cnt / cnc), 6) if cnc else None
        assert r["qini"] == (want_q + 0.0 if want_q is not None
                             else None), d


def test_anova_matches_python_reference(spark, sf_dir):
    import math
    from collections import defaultdict

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.quality import stats_anova_oneway

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice").collect()
    seg = {r["c_custkey"]: r["c_mktsegment"] for r in
           load_table(spark, sf_dir, "customer").collect()}
    groups = defaultdict(list)
    for r in o:
        groups[seg[r["o_custkey"]]].append(
            round(r["o_totalprice"] * 100))
    # exact rational arithmetic: the cents^2 moments exceed 2^53, so
    # a float reference would itself be the imprecise side
    from fractions import Fraction as Fr

    n = sum(len(v) for v in groups.values())
    k = len(groups)
    s = sum(sum(v) for v in groups.values())
    q = sum(y * y for v in groups.values() for y in v)
    sq_over_n = sum(Fr(sum(v) ** 2, len(v)) for v in groups.values())
    ssb = sq_over_n - Fr(s * s, n)
    ssw = q - sq_over_n
    f = (ssb / (k - 1)) / (ssw / (n - k))
    got = stats_anova_oneway(spark, sf_dir).collect()[0]
    assert got["n"] == n and got["k"] == k
    # the query rounds (6dp / 2dp); compare within one rounding grain
    assert math.isclose(got["f_stat"], float(f), abs_tol=1e-6)
    assert math.isclose(got["eta_squared"],
                        float(ssb / (q - Fr(s * s, n))), abs_tol=1e-6)
    assert math.isclose(got["ss_between_m"], float(ssb) / 1e4 / 1e6,
                        abs_tol=0.01)


def test_kruskal_wallis_matches_python_reference(spark, sf_dir):
    import math
    from collections import Counter, defaultdict

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.quality import stats_kruskal_wallis

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice").collect()
    seg = {r["c_custkey"]: r["c_mktsegment"] for r in
           load_table(spark, sf_dir, "customer").collect()}
    vals = [(seg[r["o_custkey"]], round(r["o_totalprice"] * 100))
            for r in o]
    n = len(vals)
    tcount = Counter(v for _, v in vals)
    midrank = {}
    cum = 0
    for v in sorted(tcount):
        t = tcount[v]
        cum += t
        midrank[v] = cum - (t - 1) / 2
    rj = defaultdict(float)
    nj = defaultdict(int)
    for g, v in vals:
        rj[g] += midrank[v]
        nj[g] += 1
    h_raw = (12.0 / (n * (n + 1))
             * sum(r * r / nj[g] for g, r in rj.items())
             - 3 * (n + 1))
    corr = 1 - sum(t ** 3 - t for t in tcount.values()) / (n ** 3 - n)
    got = stats_kruskal_wallis(spark, sf_dir).collect()[0]
    assert got["n"] == n and got["k"] == len(nj)
    assert math.isclose(got["h_raw"], h_raw,
                        rel_tol=1e-6, abs_tol=1e-5)
    assert math.isclose(got["tie_correction"], corr, rel_tol=1e-8)
    assert math.isclose(got["h_stat"], h_raw / corr,
                        rel_tol=1e-6, abs_tol=1e-5)


def test_cohens_d_matches_python_reference(spark, sf_dir):
    """Exact-moment pooled-SD d and Hedges g from raw daily cents."""
    import math
    from collections import defaultdict

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.quality import stats_cohens_d_effect

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "value").collect()
    daily = defaultdict(int)
    for r in ev:
        wk = 1 if r["ts"].weekday() >= 5 else 0
        daily[(r["event_type"], r["ts"].date(), wk)] += round(
            r["value"] * 100)
    groups = defaultdict(list)
    for (et, _, wk), vc in daily.items():
        groups[(et, wk)].append(vc)
    got = {r["event_type"]: r
           for r in stats_cohens_d_effect(spark, sf_dir).collect()}
    for et in {k[0] for k in groups}:
        wd, we = groups[(et, 0)], groups[(et, 1)]
        n1, n2 = len(wd), len(we)
        m1, m2 = sum(wd) / n1, sum(we) / n2
        ss = (sum(v * v for v in wd) - n1 * m1 * m1
              + sum(v * v for v in we) - n2 * m2 * m2)
        sp = math.sqrt(ss / (n1 + n2 - 2))
        d = (m2 - m1) / sp
        jc = 1 - 3 / (4 * (n1 + n2) - 9)
        r = got[et]
        assert r["n_weekday"] == n1 and r["n_weekend"] == n2
        assert math.isclose(r["mean_diff"], (m2 - m1) / 100, abs_tol=1e-4)
        assert math.isclose(r["cohens_d"], d, abs_tol=1e-5)
        assert math.isclose(r["hedges_g"], d * jc, abs_tol=1e-5)
        lab = ("negligible" if abs(round(d * jc, 6)) < 0.2 else
               "small" if abs(round(d * jc, 6)) < 0.5 else
               "medium" if abs(round(d * jc, 6)) < 0.8 else "large")
        assert r["magnitude"] == lab


def test_theils_u_matches_python_reference(spark, sf_dir):
    """Entropies and U from the exact contingency counts."""
    import math
    from collections import Counter

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.quality import stats_theils_u

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority").collect()
    seg = {r["c_custkey"]: r["c_mktsegment"] for r in
           load_table(spark, sf_dir, "customer").collect()}
    obs = Counter((seg[r["o_custkey"]], r["o_orderpriority"]) for r in o)
    n = sum(obs.values())

    def ent(counts):
        return -sum((c / n) * math.log(c / n) for c in counts if c > 0)

    hj = ent(obs.values())
    hs = ent(Counter(k[0] for k in obs.elements()).values())
    hp = ent(Counter(k[1] for k in obs.elements()).values())
    mi = hp + hs - hj
    got = stats_theils_u(spark, sf_dir).collect()[0]
    assert got["n"] == n
    assert math.isclose(got["h_joint"], hj, abs_tol=1e-5)
    assert math.isclose(got["u_prio_given_seg"], mi / hp, abs_tol=1e-5)
    assert math.isclose(got["u_seg_given_prio"], mi / hs, abs_tol=1e-5)
    assert math.isclose(got["u_symmetric"], 2 * mi / (hp + hs),
                        abs_tol=1e-5)
    # U is a [0,1] measure; MI is symmetric and nonnegative.
    assert 0.0 <= got["u_prio_given_seg"] <= 1.0
    assert 0.0 <= got["u_symmetric"] <= 1.0


def test_wilcoxon_matches_python_reference(spark, sf_dir):
    """Midranks, W+, tie-corrected variance from exact daily cents."""
    import math
    from collections import Counter, defaultdict

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.quality import (
        stats_wilcoxon_signed_rank)

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "value").collect()
    pc, cc = defaultdict(int), defaultdict(int)
    for r in ev:
        if r["event_type"] == "purchase":
            pc[r["ts"].date()] += round(r["value"] * 100)
        elif r["event_type"] == "click":
            cc[r["ts"].date()] += round(r["value"] * 100)
    days = set(pc) | set(cc)
    diffs = [pc[d] - cc[d] for d in days]
    nz = [d for d in diffs if d != 0]
    vc = Counter(abs(d) for d in nz)
    midrank, cum = {}, 0
    for ad in sorted(vc):
        t = vc[ad]
        cum += t
        midrank[ad] = cum - (t - 1) / 2.0
    w_plus = sum(midrank[d] for d in nz if d > 0)
    n = len(nz)
    mu = n * (n + 1) / 4.0
    tie = sum(t ** 3 - t for t in vc.values() if t > 1)
    var = n * (n + 1) * (2 * n + 1) / 24.0 - tie / 48.0
    z = (w_plus - mu) / math.sqrt(var)
    got = stats_wilcoxon_signed_rank(spark, sf_dir).collect()[0]
    assert got["n_pairs"] == len(days)
    assert got["n_zero_dropped"] == len(days) - n
    assert got["w_plus"] == round(w_plus, 1)
    assert got["mu_w"] == round(mu, 1)
    assert math.isclose(got["var_w"], var, rel_tol=1e-9)
    assert math.isclose(got["z"], z, abs_tol=1e-5)
    assert got["reject_05"] == (abs(round(z, 6)) > 1.959964)


def test_column_entropy_profile_matches_python(spark, sf_dir):
    """Exact-count entropy identity per column, recomputed in Python
    over the same canonicalized values."""
    import math
    from collections import Counter

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.quality import (
        quality_column_entropy_profile)

    rows = load_table(spark, sf_dir, "orders").collect()
    cols = {
        "o_orderstatus": lambda r: r["o_orderstatus"],
        "o_orderpriority": lambda r: r["o_orderpriority"],
        "o_custkey": lambda r: str(r["o_custkey"]),
        "o_totalprice_cents":
            lambda r: str(round(r["o_totalprice"] * 100)),
        "o_orderdate": lambda r: str(r["o_orderdate"]),
    }
    got = {r["col"]: r for r in
           quality_column_entropy_profile(spark, sf_dir).collect()}
    assert set(got) == set(cols)
    for col, fn in cols.items():
        c = Counter(fn(r) for r in rows)
        n = sum(c.values())
        h = math.log(n) - sum(v * math.log(v) for v in c.values()) / n
        g = got[col]
        assert g["n"] == n
        assert g["n_distinct"] == len(c)
        assert math.isclose(g["top_value_share"],
                            max(c.values()) / n, abs_tol=1e-5)
        assert math.isclose(g["entropy_nats"], h, abs_tol=1e-5)
        norm = 0.0 if len(c) == 1 else h / math.log(len(c))
        assert math.isclose(g["normalized_entropy"], norm, abs_tol=1e-5)
        assert 0.0 <= g["normalized_entropy"] <= 1.0 + 1e-9


def test_friedman_matches_python_reference(spark, sf_dir):
    """Conover sum-of-squared-ranks Friedman chi2 from raw events."""
    import math
    from collections import defaultdict

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.quality import stats_friedman_test

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts").collect()
    cnt = defaultdict(int)
    for r in ev:
        cnt[(r["ts"].date(), r["event_type"])] += 1
    days = sorted({d for d, _ in cnt})
    types = sorted({t for _, t in cnt})
    n, k = len(days), len(types)
    r_j = defaultdict(float)
    a = 0.0
    for d in days:
        vals = [cnt.get((d, t), 0) for t in types]
        for t, v in zip(types, vals):
            less = sum(1 for x in vals if x < v)
            eq = sum(1 for x in vals if x == v)
            mid = less + (eq + 1) / 2
            r_j[t] += mid
            a += mid * mid
    mu = n * (k + 1) / 2
    d2 = sum((r - mu) ** 2 for r in r_j.values())
    chi2 = (k - 1) * d2 / (a - n * k * (k + 1) ** 2 / 4)
    f_id = (n - 1) * chi2 / (n * (k - 1) - chi2)
    row = stats_friedman_test(spark, sf_dir).collect()[0]
    assert row["n_blocks"] == n and row["k"] == k
    assert math.isclose(row["chi2_f"], chi2, abs_tol=1e-5)
    assert math.isclose(row["iman_davenport_f"], f_id, abs_tol=1e-5)
    assert row["reject_05"] == (round(chi2, 6) > 9.488)


def test_cochran_q_matches_python_reference(spark, sf_dir):
    """Exact-integer Q over (user, day) incidence blocks."""
    import math
    from collections import defaultdict

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.quality import stats_cochran_q

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type").collect()
    pres = {(r["user_id"], r["ts"].date(), r["event_type"])
            for r in ev}
    rows = defaultdict(int)
    cols = defaultdict(int)
    for u, d, t in pres:
        rows[(u, d)] += 1
        cols[t] += 1
    k = len(cols)
    tt = sum(rows.values())
    csq = sum(c * c for c in cols.values())
    rsq = sum(r * r for r in rows.values())
    q = (k - 1) * (k * csq - tt * tt) / (k * tt - rsq)
    row = stats_cochran_q(spark, sf_dir).collect()[0]
    assert row["n_blocks"] == len(rows)
    assert row["k"] == k and row["total_marks"] == tt
    assert math.isclose(row["q_stat"], q, abs_tol=1e-6)
    assert row["dof"] == k - 1
    assert row["reject_05"] == (round(q, 6) > 9.488)


def test_bartlett_matches_python_reference(spark, sf_dir):
    """Bartlett chi2 with correction factor from exact cent moments."""
    import math
    from collections import defaultdict

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.quality import (
        stats_bartlett_variance)

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice").collect()
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment").collect()
    seg_of = {r["c_custkey"]: r["c_mktsegment"] for r in c}
    groups = defaultdict(list)
    for r in o:
        groups[seg_of[r["o_custkey"]]].append(
            round(r["o_totalprice"] * 100))
    n = sum(len(v) for v in groups.values())
    k = len(groups)
    ss = 0.0
    sln = 0.0
    sinv = 0.0
    for vals in groups.values():
        ni = len(vals)
        m = sum(vals) / ni
        s2 = (sum(v * v for v in vals) - ni * m * m) / (ni - 1)
        ss += (ni - 1) * s2
        sln += (ni - 1) * math.log(s2)
        sinv += 1 / (ni - 1)
    sp2 = ss / (n - k)
    corr = 1 + (sinv - 1 / (n - k)) / (3 * (k - 1))
    chi2 = ((n - k) * math.log(sp2) - sln) / corr
    row = stats_bartlett_variance(spark, sf_dir).collect()[0]
    assert row["n"] == n and row["k"] == k
    assert math.isclose(row["pooled_var_dollars"], sp2 / 1e4,
                        rel_tol=1e-9)
    assert math.isclose(row["chi2"], chi2, abs_tol=1e-4)
    assert row["reject_05"] == (round(chi2, 6) > 9.488)


def test_dkw_band_matches_python_reference(spark, sf_dir):
    """DKW simultaneous band around exact ECDF counts."""
    import math

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.quality import stats_dkw_ecdf_band

    prices = [r["o_totalprice"] for r in load_table(
        spark, sf_dir, "orders").select("o_totalprice").collect()]
    n = len(prices)
    eps = math.sqrt(math.log(40.0) / (2 * n))
    got = {r["cut_price"]: r
           for r in stats_dkw_ecdf_band(spark, sf_dir).collect()}
    assert len(got) == 9
    for cut in range(50000, 450001, 50000):
        f = sum(1 for p in prices if p <= cut) / n
        r = got[cut]
        assert r["n"] == n
        assert math.isclose(r["ecdf"], f, abs_tol=1e-6)
        assert math.isclose(r["band_lo"], max(f - eps, 0.0),
                            abs_tol=1e-6)
        assert math.isclose(r["band_hi"], min(f + eps, 1.0),
                            abs_tol=1e-6)


def test_capture_recapture_matches_python_reference(spark, sf_dir):
    """Chapman estimator from exact capture flags."""
    import math
    from collections import defaultdict

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.quality import (
        stats_capture_recapture)

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type").collect()
    flags = defaultdict(lambda: [0, 0])
    users = set()
    for r in ev:
        users.add(r["user_id"])
        if r["event_type"] == "click":
            flags[r["user_id"]][0] = 1
        elif r["event_type"] == "purchase":
            flags[r["user_id"]][1] = 1
    n1 = sum(c for c, _ in flags.values())
    n2 = sum(p for _, p in flags.values())
    m = sum(c * p for c, p in flags.values())
    nhat = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    se = math.sqrt((n1 + 1) * (n2 + 1) * (n1 - m) * (n2 - m)
                   / ((m + 1) ** 2 * (m + 2)))
    row = stats_capture_recapture(spark, sf_dir).collect()[0]
    assert row["n_capture1"] == n1 and row["n_capture2"] == n2
    assert row["n_both"] == m
    assert row["n_observed"] == len(users)
    assert math.isclose(row["chapman_estimate"], nhat, abs_tol=5e-3)
    assert math.isclose(row["chapman_se"], se, abs_tol=5e-5)
    assert math.isclose(row["observed_coverage"], len(users) / nhat,
                        abs_tol=1e-5)


def test_kanonymity_matches_python_reference(spark, sf_dir):
    """Equivalence-class sizes over the exact QI grouping."""
    import math
    from collections import Counter

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.quality import (
        quality_kanonymity_audit)

    cust = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_nationkey", "c_acctbal").collect()
    nat = {r["n_nationkey"]: r["n_name"] for r in load_table(
        spark, sf_dir, "nation").collect()}
    classes = Counter()
    for r in cust:
        band = ("debt" if r["c_acctbal"] < 0
                else "mid" if r["c_acctbal"] < 5000 else "high")
        classes[(r["c_mktsegment"], nat[r["c_nationkey"]], band)] += 1
    n = sum(classes.values())
    row = quality_kanonymity_audit(spark, sf_dir).collect()[0]
    assert row["n_records"] == n
    assert row["n_classes"] == len(classes)
    assert row["k_anonymity"] == min(classes.values())
    assert row["singleton_classes"] == sum(
        1 for s in classes.values() if s == 1)
    assert math.isclose(
        row["risk_share_k5"],
        sum(s for s in classes.values() if s < 5) / n, abs_tol=1e-6)
    assert math.isclose(
        row["expected_class_size"],
        sum(s * s for s in classes.values()) / n, abs_tol=5e-5)


def test_cochran_armitage_matches_python_reference(spark, sf_dir):
    """Exact-integer trend moments over priority-scored return flags."""
    import math
    from collections import defaultdict

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.quality import (
        stats_cochran_armitage_trend)

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag").collect()
    o = {r["o_orderkey"]: int(r["o_orderpriority"][0])
         for r in load_table(spark, sf_dir, "orders").collect()}
    g = defaultdict(lambda: [0, 0])
    for r in li:
        s = o[r["l_orderkey"]]
        g[s][0] += 1
        g[s][1] += 1 if r["l_returnflag"] == "R" else 0
    n = sum(v[0] for v in g.values())
    rr = sum(v[1] for v in g.values())
    t = sum(s * v[1] for s, v in g.items())
    sn = sum(s * v[0] for s, v in g.items())
    s2n = sum(s * s * v[0] for s, v in g.items())
    p = rr / n
    z = (t - p * sn) / math.sqrt(p * (1 - p) * (s2n - sn * (sn / n)))
    row = stats_cochran_armitage_trend(spark, sf_dir).collect()[0]
    assert row["n_lines"] == n and row["n_returned"] == rr
    assert row["k_levels"] == len(g)
    assert math.isclose(row["z_trend"], z, abs_tol=1e-5)
    assert row["reject_05"] == (abs(round(z, 6)) > 1.96)


def test_odds_ratio_risk_matches_python_reference(spark, sf_dir):
    """2x2 cells and both log-scale CIs from exact block flags."""
    import math
    from collections import defaultdict

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.quality import stats_odds_ratio_risk

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type").collect()
    blocks = defaultdict(lambda: [0, 0])
    for r in ev:
        k = (r["user_id"], r["ts"].date())
        blocks[k][0] = 1 if r["ts"].weekday() >= 5 else 0
        if r["event_type"] == "purchase":
            blocks[k][1] = 1
    a = sum(1 for e, o in blocks.values() if e and o)
    b = sum(1 for e, o in blocks.values() if e and not o)
    c = sum(1 for e, o in blocks.values() if not e and o)
    d = sum(1 for e, o in blocks.values() if not e and not o)
    orat = a * d / (b * c)
    se_or = math.sqrt(1 / a + 1 / b + 1 / c + 1 / d)
    rr = (a / (a + b)) / (c / (c + d))
    se_rr = math.sqrt(1 / a - 1 / (a + b) + 1 / c - 1 / (c + d))
    row = stats_odds_ratio_risk(spark, sf_dir).collect()[0]
    assert (row["n_exp_pos"], row["n_exp_neg"],
            row["n_unexp_pos"], row["n_unexp_neg"]) == (a, b, c, d)
    assert math.isclose(row["odds_ratio"], orat, abs_tol=1e-5)
    assert math.isclose(row["or_ci_lo"],
                        math.exp(math.log(orat) - 1.96 * se_or),
                        abs_tol=1e-5)
    assert math.isclose(row["or_ci_hi"],
                        math.exp(math.log(orat) + 1.96 * se_or),
                        abs_tol=1e-5)
    assert math.isclose(row["relative_risk"], rr, abs_tol=1e-5)
    assert math.isclose(row["rr_ci_lo"],
                        math.exp(math.log(rr) - 1.96 * se_rr),
                        abs_tol=1e-5)
    assert math.isclose(row["rr_ci_hi"],
                        math.exp(math.log(rr) + 1.96 * se_rr),
                        abs_tol=1e-5)


def test_cohens_kappa_matches_python_reference(spark, sf_dir):
    """Exact 2x2 agreement cells and the kappa closed form."""
    import math
    import re

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.quality import stats_cohens_kappa

    docs = load_table(spark, sf_dir, "documents").select(
        "text").collect()
    n11 = n10 = n01 = n00 = 0
    for r in docs:
        a = len(r["text"]) >= 300
        b = len(re.split(r"\s+", r["text"])) >= 55
        if a and b:
            n11 += 1
        elif a:
            n10 += 1
        elif b:
            n01 += 1
        else:
            n00 += 1
    n = n11 + n10 + n01 + n00
    po = (n11 + n00) / n
    pe = ((n11 + n10) * (n11 + n01)
          + (n01 + n00) * (n10 + n00)) / (n * n)
    row = stats_cohens_kappa(spark, sf_dir).collect()[0]
    assert (row["both_keep"], row["only_len"], row["only_words"],
            row["both_drop"]) == (n11, n10, n01, n00)
    assert math.isclose(row["observed_agreement"], po, abs_tol=1e-6)
    assert math.isclose(row["chance_agreement"], pe, abs_tol=1e-6)
    assert math.isclose(row["cohens_kappa"], (po - pe) / (1 - pe),
                        abs_tol=1e-6)


def test_jarque_bera_matches_python_reference(spark, sf_dir):
    """Exact 128-bit raw moments -> central-moment expansion -> JB."""
    import math

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.quality import stats_jarque_bera

    xs = [round(r["o_totalprice"] * 100) for r in load_table(
        spark, sf_dir, "orders").select("o_totalprice").collect()]
    n = len(xs)
    s1 = sum(xs)
    s2 = sum(x * x for x in xs)
    s3 = sum(x ** 3 for x in xs)
    s4 = sum(x ** 4 for x in xs)
    mu = s1 / n
    r2, r3, r4 = float(s2) / n, float(s3) / n, float(s4) / n
    m2 = r2 - mu * mu
    m3 = r3 - 3 * mu * r2 + 2 * mu ** 3
    m4 = r4 - 4 * mu * r3 + 6 * mu * mu * r2 - 3 * mu ** 4
    s_ = m3 / m2 ** 1.5
    k_ = m4 / (m2 * m2) - 3
    jb = n / 6 * (s_ ** 2 + k_ ** 2 / 4)
    row = stats_jarque_bera(spark, sf_dir).collect()[0]
    assert row["n"] == n
    assert math.isclose(row["skewness"], s_, abs_tol=1e-5)
    assert math.isclose(row["excess_kurtosis"], k_, abs_tol=1e-5)
    assert math.isclose(row["jb_stat"], jb, rel_tol=1e-6, abs_tol=1e-3)
    assert row["reject_05"] == (round(jb, 4) > 5.991)


def test_wilson_ci_matches_python_reference(spark, sf_dir):
    """Closed-form Wilson interval recomputed in pure Python from the
    collected user frame; overlap flag pinned from the two rows."""
    import hashlib
    import math

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.quality import (
        _WILSON_Z, ab_test_wilson_ci)

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type").collect()
    conv: dict[int, int] = {}
    for r in ev:
        conv[r.user_id] = max(conv.get(r.user_id, 0),
                              int(r.event_type == "purchase"))
    stats: dict[str, list[int]] = {"A": [0, 0], "B": [0, 0]}
    for uid, c in conv.items():
        v = ("A" if hashlib.md5(str(uid).encode()).hexdigest()[0] < "8"
             else "B")
        stats[v][0] += 1
        stats[v][1] += c
    z = _WILSON_Z
    want = {}
    for v, (n, k) in stats.items():
        p = k / n
        z2n = z * z / n
        hw = z * math.sqrt(p * (1 - p) / n + z2n / (4 * n))
        want[v] = (n, k, round(p, 6),
                   round((p + z2n / 2 - hw) / (1 + z2n), 6),
                   round((p + z2n / 2 + hw) / (1 + z2n), 6))
    got = {r.variant: r for r in
           ab_test_wilson_ci(spark, sf_dir).collect()}
    assert set(got) == {"A", "B"}
    for v, (n, k, cvr, lo, hi) in want.items():
        g = got[v]
        assert (g.n_users, g.conversions) == (n, k)
        assert abs(g.cvr - cvr) < 1e-9
        assert abs(g.wilson_lo - lo) < 1e-9
        assert abs(g.wilson_hi - hi) < 1e-9
        # at p=1 the Wilson upper bound is exactly 1 (and at p=0 the
        # lower is exactly 0), so the containment is non-strict
        assert g.wilson_lo <= g.cvr <= g.wilson_hi
        assert g.wilson_lo < g.wilson_hi
    disjoint = (max(w[3] for w in want.values())
                > min(w[4] for w in want.values()))
    assert all(r.intervals_disjoint == disjoint for r in got.values())
