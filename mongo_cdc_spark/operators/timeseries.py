"""Time-series operators: gap filling with linear interpolation and
bounded-window EWMA smoothing.

Production context: metric pipelines (observability rollups, demand
forecasting inputs, feature stores) constantly regularize irregular
event streams onto a fixed grid — "resample + interpolate" in pandas,
`time_bucket_gapfill` in TimescaleDB, `-- fill(linear)` in InfluxQL.
The reference (/root/reference/main.go — a 163-line CDC relay) has no
time-series surface; this is engine-side analytical capability over
the `events`/`orders` fixtures.

Spark-first design, sized for 100 TB:

- The only data-sized shuffle in either operator is the FIRST
  aggregation (raw rows → one row per (key, bucket)). Everything
  after — spine generation, interpolation windows, EWMA frames —
  runs on bucket-grain rows (|keys| x |buckets|), which is orders of
  magnitude smaller than the input and independent of raw data
  volume. That asymmetry is the whole scaling story: a 100x bigger
  input changes only the pre-aggregation stage, which is an
  embarrassingly parallel partial-agg (map-side combine) shuffle.
- The hour spine comes from `sequence()` + `explode()` per key — a
  narrow generate, no driver-side range materialization, no
  crossJoin against a global calendar table.
- Both interpolation passes (last-non-null backward, first-non-null
  forward) sort by the same (key, h ASC) ordering, so Catalyst plans
  ONE sort feeding both Window operators.
- Determinism across engines: bucket aggregates are rounded to 6 dp
  BEFORE interpolation / smoothing, interpolation fractions are exact
  integer-hour ratios, and final values are rounded again — so the
  double arithmetic agrees with the DuckDB oracle bit-for-bit at the
  compared precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mongo_cdc_spark.io import load_table
from mongo_cdc_spark.operators import make_registry

QUERIES, ORACLE, query = make_registry()


@query("ts_gapfill_interpolate", sql="""
    WITH hourly AS (
        SELECT event_type,
               date_trunc('hour', ts) AS h,
               ROUND(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                          AS DOUBLE) / 100.0 / COUNT(*), 6) AS v,
               COUNT(*) AS n_obs
        FROM events GROUP BY 1, 2
    ), b AS (
        SELECT event_type, MIN(h) AS h0, MAX(h) AS h1
        FROM hourly GROUP BY 1
    ), spine AS (
        SELECT event_type,
               unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        FROM b
    ), joined AS (
        SELECT s.event_type, s.h, hr.v, COALESCE(hr.n_obs, 0) AS n_obs
        FROM spine s LEFT JOIN hourly hr USING (event_type, h)
    ), walled AS (
        SELECT *,
            last_value(v IGNORE NULLS) OVER (
                PARTITION BY event_type ORDER BY h
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS pv,
            last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
                OVER (
                PARTITION BY event_type ORDER BY h
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) AS ph,
            first_value(v IGNORE NULLS) OVER (
                PARTITION BY event_type ORDER BY h
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
            ) AS nv,
            first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
                OVER (
                PARTITION BY event_type ORDER BY h
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
            ) AS nh
        FROM joined
    )
    SELECT event_type, h, n_obs,
        CASE WHEN v IS NOT NULL THEN v
             WHEN pv IS NULL THEN nv
             WHEN nv IS NULL THEN pv
             ELSE ROUND(pv + (nv - pv)
                  * ((epoch(h) - epoch(ph)) / (epoch(nh) - epoch(ph))),
                  6)
        END AS v_filled,
        CASE WHEN v IS NOT NULL THEN 'obs'
             WHEN pv IS NULL OR nv IS NULL THEN 'edge'
             ELSE 'interp' END AS fill_kind
    FROM walled
    ORDER BY event_type, h
""")
def ts_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize `events` onto an hourly grid per event_type: average
    `value` per observed hour, generate the full [min, max] hour spine,
    and fill holes by linear interpolation between the neighbouring
    observations (nearest-value at the edges).

    Scale: the groupBy(event_type, hour) pre-aggregation is the only
    input-sized shuffle (partial-agg combine applies); the spine is a
    per-key sequence/explode (narrow, ~|hours| rows per key), the
    spine-to-hourly join and both fill windows run at bucket grain.
    Both window specs share one (event_type, h ASC) sort.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.select("event_type", F.date_trunc("hour", F.col("ts")).alias("h"),
                  "value")
        .groupBy("event_type", "h")
        # exact-cents hourly mean: integer sum, one division, then
        # the shared 6-dp quantization (money AVG flake class)
        .agg(F.round(F.sum(F.round(F.col("value") * 100)
                           .cast("bigint")).cast("double")
                     / 100.0 / F.count(F.lit(1)), 6).alias("v"),
             F.count(F.lit(1)).alias("n_obs")))
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select("event_type",
                F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR")))
                .alias("h")))
    joined = (
        spine.join(hourly, ["event_type", "h"], "left")
        .withColumn("n_obs", F.coalesce("n_obs", F.lit(0))))
    w_prev = (Window.partitionBy("event_type").orderBy("h")
              .rowsBetween(Window.unboundedPreceding, 0))
    w_next = (Window.partitionBy("event_type").orderBy("h")
              .rowsBetween(0, Window.unboundedFollowing))
    obs_h = F.when(F.col("v").isNotNull(), F.col("h"))
    walled = joined.select(
        "event_type", "h", "n_obs", "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(obs_h, ignorenulls=True).over(w_prev).alias("ph"),
        F.first("v", ignorenulls=True).over(w_next).alias("nv"),
        F.first(obs_h, ignorenulls=True).over(w_next).alias("nh"))
    frac = ((F.unix_timestamp("h") - F.unix_timestamp("ph"))
            / (F.unix_timestamp("nh") - F.unix_timestamp("ph")))
    return (
        walled.select(
            "event_type", "h", "n_obs",
            F.when(F.col("v").isNotNull(), F.col("v"))
             .when(F.col("pv").isNull(), F.col("nv"))
             .when(F.col("nv").isNull(), F.col("pv"))
             .otherwise(F.round(
                 F.col("pv") + (F.col("nv") - F.col("pv")) * frac, 6))
             .alias("v_filled"),
            F.when(F.col("v").isNotNull(), F.lit("obs"))
             .when(F.col("pv").isNull() | F.col("nv").isNull(),
                   F.lit("edge"))
             .otherwise(F.lit("interp")).alias("fill_kind"))
        .orderBy("event_type", "h"))


def ewma_columns(df: DataFrame, part: str, order: str, x: str,
                 decay: str = "0.7D", alpha: str = "0.3D",
                 window: int = 30, nd: int = 4) -> DataFrame:
    """Append a normalized bounded-window EWMA column to `df`:
    ewma = sum_j decay^j x_{t-j} / sum_j decay^j over the trailing
    `window` ROWS per `part`, ordered by `order` — pandas
    `ewm(alpha, adjust=True)` semantics once the frame covers the
    series (exactly equal while len(series) <= window; the truncated
    tail differs only by the dropped decay^{>=window} mass).

    decay/alpha are SQL literal STRINGS (not floats) so engine and
    oracle share the exact double constants — deriving alpha as
    1-decay in Python yields 0.30000000000000004 and splits rounding.
    Property-tested against pandas ewm in tests/test_timeseries.py."""
    w = (Window.partitionBy(part).orderBy(order)
         .rowsBetween(-(window - 1), 0))
    fold = f"""
        aggregate(
            transform(_xs, (x, i) -> x * pow({decay}, size(_xs) - 1 - i)),
            0D, (acc, x) -> acc + x)
        / ((1.0D - pow({decay}, size(_xs))) / {alpha})
    """
    return (df.withColumn("_xs", F.collect_list(x).over(w))
            .withColumn("ewma", F.round(F.expr(fold), nd))
            .drop("_xs"))


@query("ts_ewma_trend", sql="""
    WITH daily AS (
        SELECT o_orderpriority AS priority,
               date_trunc('day', o_orderdate) AS d,
               ROUND(SUM(o_totalprice), 4) AS x
        FROM orders GROUP BY 1, 2
    ), r AS (
        SELECT *, row_number() OVER (PARTITION BY priority ORDER BY d)
                  AS rn
        FROM daily
    )
    SELECT a.priority, a.d, a.x AS day_total,
           ROUND(SUM(b.x * POW(0.7, a.rn - b.rn))
                 / SUM(POW(0.7, a.rn - b.rn)), 4) AS ewma
    FROM r a JOIN r b
      ON a.priority = b.priority AND b.rn BETWEEN a.rn - 29 AND a.rn
    GROUP BY a.priority, a.d, a.x
    ORDER BY a.priority, a.d
""")
def ts_ewma_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily order revenue per
    priority class — the classic trend smoother (pandas `ewm`, Holt
    level component) — over a bounded 30-day trailing frame with
    normalized weights w_j = 0.7^j / sum(0.7^j).

    Spark-first: the trailing frame is a windowed `collect_list`
    (frame rows arrive in ORDER BY d order), and the weighted fold is
    a JVM-side higher-order `aggregate(transform(...))` over that
    ≤30-element array — no UDF, no self-join. The denominator uses
    the closed form (1 - 0.7^m) / 0.3; the DuckDB oracle computes the
    same sums via a bounded rn-range self-join, with 4 dp rounding
    absorbing the summation-order difference.

    Scale: groupBy(priority, day) collapses the input (the only
    input-sized shuffle, map-side combine); the window runs on day
    grain. The 30-row frame bounds per-row work at O(30) regardless
    of history length — unlike an unbounded running EWMA, this frame
    is restartable from any 30-day tail (the practical property that
    lets incremental jobs recompute only recent days).
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("priority"),
                 F.date_trunc("day", F.col("o_orderdate")).alias("d"))
        .agg(F.round(F.sum("o_totalprice"), 4).alias("x")))
    return (ewma_columns(daily, "priority", "d", "x")
            .select("priority", "d", F.col("x").alias("day_total"), "ewma")
            .orderBy("priority", "d"))


# ------------------------------------------------------ autocorrelation

ACF_MAX_LAG = 7


@query("ts_autocorr_daily", sql=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             ROUND(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                        AS DOUBLE) / 100.0 / COUNT(*), 6) AS v
      FROM events GROUP BY 1, 2
    )
    SELECT a.event_type, CAST(g.k AS INT) AS lag_days,
           ROUND(CORR(a.v, b.v), 4) AS acf,
           COUNT(*) AS n_pairs
    FROM daily a
    CROSS JOIN range(1, {ACF_MAX_LAG + 1}) g(k)
    JOIN daily b ON b.event_type = a.event_type
                AND b.d = a.d - CAST(g.k AS INT)
    GROUP BY a.event_type, g.k
    ORDER BY a.event_type, lag_days
""")
def ts_autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function (lags 1..ACF_MAX_LAG) of each event
    type's daily mean value — the classic seasonality/persistence
    diagnostic that sits in front of any forecasting pipeline.

    Formulated as a self-join against a tiny lag grid rather than
    {ACF_MAX_LAG} stacked window passes: the daily series (bucket
    grain — |types| x |days| rows regardless of raw volume) joins
    itself on (type, day - k) for every k in the grid, then ONE
    hash-agg computes corr per (type, lag). The raw-data-sized work
    is only the first aggregation (map-side combined); everything
    after runs on bucket-grain rows, the same asymmetry as the
    gap-fill operator above. Lag pairing by calendar join (not row
    offset) means missing days pair up by true distance — lag-k ACF
    over observed days, robust to gaps.

    Determinism: daily means are EXACT integer-cents sums divided
    once, then rounded to 6 dp before pairing (order-dependent double
    AVG of money can flip the quantization); corr rounded to 4 dp
    (the agg_regression_stats precision — corr's partial-merge
    summation order wiggles at ~1e-15)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type",
                        F.to_date("ts").alias("d"))
             .agg(F.round(F.sum(F.round(F.col("value") * 100)
                                .cast("bigint")).cast("double")
                          / 100.0 / F.count(F.lit(1)), 6).alias("v")))
    lags = (spark.range(1, ACF_MAX_LAG + 1)
            .select(F.col("id").cast("int").alias("k")))
    a = daily.select(F.col("event_type"), F.col("d"),
                     F.col("v").alias("va"))
    b = daily.select(F.col("event_type").alias("bt"),
                     F.col("d").alias("bd"), F.col("v").alias("vb"))
    return (a.crossJoin(F.broadcast(lags))
            .join(b, (F.col("bt") == F.col("event_type"))
                  & (F.col("bd") == F.date_sub(F.col("d"),
                                               F.col("k"))))
            .groupBy("event_type", F.col("k").alias("lag_days"))
            .agg(F.round(F.corr("va", "vb"), 4).alias("acf"),
                 F.count(F.lit(1)).alias("n_pairs"))
            .orderBy("event_type", "lag_days"))


# -------------------------------------------------- CUSUM change points

CUSUM_K = 0.5   # drift allowance (in std units)
CUSUM_H = 4.0   # decision threshold (in std units)


@query("ts_cusum_changepoint", sql=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             ROUND(SUM(value), 6) AS x
      FROM events GROUP BY 1, 2
    ), st AS (
      SELECT event_type, ROUND(AVG(x), 6) AS mu,
             ROUND(STDDEV_SAMP(x), 6) AS sd
      FROM daily GROUP BY 1
    ), z AS (
      SELECT d.event_type, d.d,
             (d.x - s.mu) / NULLIF(s.sd, 0) AS z
      FROM daily d JOIN st s ON s.event_type = d.event_type
    ), w AS (
      SELECT event_type, d,
             SUM(z - {CUSUM_K}) OVER (
               PARTITION BY event_type ORDER BY d
               ROWS UNBOUNDED PRECEDING) AS wp,
             SUM(z + {CUSUM_K}) OVER (
               PARTITION BY event_type ORDER BY d
               ROWS UNBOUNDED PRECEDING) AS wn
      FROM z
    ), c AS (
      SELECT event_type, d,
             wp - LEAST(MIN(wp) OVER (
               PARTITION BY event_type ORDER BY d
               ROWS UNBOUNDED PRECEDING), 0) AS cpos,
             GREATEST(MAX(wn) OVER (
               PARTITION BY event_type ORDER BY d
               ROWS UNBOUNDED PRECEDING), 0) - wn AS cneg
      FROM w
    )
    SELECT event_type, d AS day,
           ROUND(cpos, 6) AS cusum_pos, ROUND(cneg, 6) AS cusum_neg,
           CASE WHEN cpos > {CUSUM_H} OR cneg > {CUSUM_H}
                THEN TRUE ELSE FALSE END AS shifted
    FROM c ORDER BY event_type, day
""")
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM mean-shift detection (Page's test) over each
    event type's daily total value — the standard sequential
    change-point monitor for metric pipelines.

    The textbook recursion s_t = max(0, s_(t-1) + z_t - k) is not a
    window aggregate, but it has an exact prefix-scan identity:
    with W_t = Σ_(s<=t)(z_s - k), s_t = W_t - min(0, min_(s<=t) W_s)
    — the empty prefix contributes the 0 — and symmetrically for the
    downward side. So the whole detector is
    two running sums + two running extrema, all computed in ONE sort
    per key (all four windows share the (type, day ASC) spec). That
    identity is what makes CUSUM distributable: no per-row recursion,
    no UDF, just windowed prefix scans over bucket-grain rows.

    Raw-data-sized work is again only the first aggregation; the
    per-type mean/std join is a broadcast of |types| rows.
    Determinism: daily totals and mean/std rounded to 6 dp before
    standardization; prefix sums evaluate sequentially in the same
    (type, day) order on both engines; final 6-dp rounding absorbs
    the residual ulps."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type", F.to_date("ts").alias("d"))
             .agg(F.round(F.sum("value"), 6).alias("x")))
    st = (daily.groupBy("event_type")
          .agg(F.round(F.avg("x"), 6).alias("mu"),
               F.round(F.stddev_samp("x"), 6).alias("sd")))
    z = (daily.join(F.broadcast(st), "event_type")
         .select("event_type", "d",
                 ((F.col("x") - F.col("mu"))
                  / F.expr("NULLIF(sd, 0)")).alias("z")))
    run = (Window.partitionBy("event_type").orderBy("d")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w = z.select(
        "event_type", "d",
        F.sum(F.col("z") - CUSUM_K).over(run).alias("wp"),
        F.sum(F.col("z") + CUSUM_K).over(run).alias("wn"))
    c = w.select(
        "event_type", "d",
        (F.col("wp") - F.least(F.min("wp").over(run), F.lit(0.0)))
        .alias("cpos"),
        (F.greatest(F.max("wn").over(run), F.lit(0.0)) - F.col("wn"))
        .alias("cneg"))
    return (c.select(
        "event_type", F.col("d").alias("day"),
        F.round("cpos", 6).alias("cusum_pos"),
        F.round("cneg", 6).alias("cusum_neg"),
        F.when((F.col("cpos") > CUSUM_H)
               | (F.col("cneg") > CUSUM_H), F.lit(True))
        .otherwise(F.lit(False)).alias("shifted"))
        .orderBy("event_type", "day"))


# --------------------------------------------------- temporal entropy


@query("ts_hourly_entropy", sql="""
    WITH cnt AS (
      SELECT event_type, EXTRACT(hour FROM ts) AS h, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ), tot AS (
      SELECT event_type, SUM(n) AS t, COUNT(*) AS n_hours
      FROM cnt GROUP BY 1
    )
    SELECT c.event_type,
           CAST(t.n_hours AS INT) AS active_hours,
           CAST(t.t AS BIGINT) AS n_events,
           ROUND(-SUM((c.n / (t.t * 1e0)) * LN(c.n / (t.t * 1e0))), 6)
             AS entropy_nats,
           ROUND(EXP(-SUM((c.n / (t.t * 1e0))
                          * LN(c.n / (t.t * 1e0)))), 6) AS perplexity,
           ROUND(-SUM((c.n / (t.t * 1e0)) * LN(c.n / (t.t * 1e0)))
                 / LN(24), 6) AS uniformity
    FROM cnt c JOIN tot t ON t.event_type = c.event_type
    GROUP BY c.event_type, t.t, t.n_hours
    ORDER BY c.event_type
""")
def ts_hourly_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each event type's hour-of-day distribution —
    the burstiness/diurnality signal (uniform around the clock →
    entropy ln(24), a one-hour spike → 0). Reports nats, perplexity
    (effective number of active hours), and uniformity (entropy /
    ln 24) — the normalized form dashboards alert on.

    One data-sized count agg to the (type, hour) grid, then entropy
    is a second tiny agg over ≤24 rows per type. Determinism: counts
    are exact; the p·ln p sum runs over ≤24 identical doubles per
    group with 6-dp rounding absorbing merge-order ulps."""
    ev = load_table(spark, sf_dir, "events")
    cnt = (ev.groupBy("event_type", F.hour("ts").alias("h"))
           .agg(F.count(F.lit(1)).alias("n")))
    tot = (cnt.groupBy("event_type")
           .agg(F.sum("n").alias("t"),
                F.count(F.lit(1)).alias("n_hours")))
    p = F.col("n") / F.col("t")
    ent = -F.sum(p * F.log(p))
    return (cnt.join(F.broadcast(tot), "event_type")
            .groupBy("event_type", "t", "n_hours")
            .agg(F.round(ent, 6).alias("entropy_nats"),
                 F.round(F.exp(ent), 6).alias("perplexity"),
                 F.round(ent / F.log(F.lit(24.0)), 6)
                 .alias("uniformity"))
            .select("event_type",
                    F.col("n_hours").cast("int").alias("active_hours"),
                    F.col("t").alias("n_events"),
                    "entropy_nats", "perplexity", "uniformity")
            .orderBy("event_type"))


@query("ts_ohlc_bars", sql="""
    WITH keyed AS (
      SELECT event_type,
             date_trunc('hour', ts) AS h,
             value,
             epoch(ts)::BIGINT * 10000000 + event_id AS okey
      FROM events
    )
    SELECT event_type, h,
           ROUND(arg_min(value, okey), 6) AS open,
           ROUND(MAX(value), 6) AS high,
           ROUND(MIN(value), 6) AS low,
           ROUND(arg_max(value, okey), 6) AS close,
           CAST(COUNT(*) AS BIGINT) AS volume,
           ROUND(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                      AS DOUBLE) / 100.0 / COUNT(*), 6) AS vwap
    FROM keyed
    GROUP BY event_type, h
    ORDER BY event_type, h
    LIMIT 200
""")
def ts_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick resampling: per (event_type, hour) bar with
    open/high/low/close/volume — the standard downsample for any
    market-data or metrics pipeline (pandas `resample().ohlc()`,
    kdb+ `xbar`, TimescaleDB `candlestick_agg`).

    Spark-first: ONE data-sized partial-aggregatable shuffle.
    open/close use `min_by`/`max_by` against a single BIGINT ordering
    key (epoch-seconds * 1e7 + event_id — unique, overflow-safe to
    year ~31k), so first/last never need a per-bar sort or a window
    over raw rows; high/low/volume ride the same agg. At 100 TB this
    is the textbook map-side-combine plan: every executor emits one
    partial bar per (type, hour) regardless of row count."""
    ev = load_table(spark, sf_dir, "events")
    okey = (F.unix_timestamp("ts") * F.lit(10000000)
            + F.col("event_id")).alias("okey")
    return (
        ev.select("event_type", F.date_trunc("hour", "ts").alias("h"),
                  "value", okey)
        .groupBy("event_type", "h")
        .agg(F.round(F.min_by("value", "okey"), 6).alias("open"),
             F.round(F.max("value"), 6).alias("high"),
             F.round(F.min("value"), 6).alias("low"),
             F.round(F.max_by("value", "okey"), 6).alias("close"),
             F.count(F.lit(1)).alias("volume"),
             # exact-cents mean (money AVG flake class)
             F.round(F.sum(F.round(F.col("value") * 100)
                           .cast("bigint")).cast("double")
                     / 100.0 / F.count(F.lit(1)), 6).alias("vwap"))
        .orderBy("event_type", "h")
        .limit(200)
    )


@query("ts_time_weighted_avg", sql="""
    WITH seq AS (
      SELECT event_type,
             date_trunc('day', ts) AS d,
             value,
             epoch_us(lead(ts) OVER w) - epoch_us(ts) AS dur_us
      FROM events
      WINDOW w AS (PARTITION BY event_type, date_trunc('day', ts)
                   ORDER BY ts, event_id)
    )
    SELECT event_type, d,
           ROUND(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT) * dur_us)
                      AS DOUBLE) / SUM(dur_us) / 100.0, 6) AS twap,
           ROUND(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                      AS DOUBLE) / 100.0 / COUNT(*), 6) AS simple_avg,
           CAST(SUM(dur_us) AS BIGINT) AS covered_us,
           CAST(COUNT(*) AS BIGINT) AS n_intervals
    FROM seq
    WHERE dur_us IS NOT NULL
    GROUP BY event_type, d
    ORDER BY event_type, d
""")
def ts_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP): each observation holds until the
    next one, so irregular sampling doesn't bias the mean toward
    burst periods — the estimator billing/monitoring systems use for
    "average concurrent X" (and trading uses for TWAP fills). The
    day's last observation has no successor and is excluded (open
    interval), mirrored exactly in the oracle.

    Plan: one window (lead) partitioned by (event_type, day) — the
    partition key bounds sort size at any scale — then one
    partial-aggregatable shuffle to daily grain. Weights are exact
    integer MICROSECONDS (`unix_micros` / `epoch_us` — sub-second
    truncation would skew both engines differently); the
    weighted-sum ratio is rounded at 6 dp where double merge-order
    ulps sit far below."""
    ev = load_table(spark, sf_dir, "events")
    d = F.date_trunc("day", "ts")
    w = (Window.partitionBy("event_type", "d")
         .orderBy("ts", "event_id"))
    seq = (ev.select("event_type", d.alias("d"), "value", "ts",
                     "event_id")
           .withColumn("dur_us",
                       F.unix_micros(F.lead("ts").over(w))
                       - F.unix_micros("ts"))
           .where(F.col("dur_us").isNotNull()))
    cents = F.round(F.col("value") * 100).cast("bigint")
    return (
        seq.groupBy("event_type", "d")
        # exact cent-microsecond weights: integer sums, divided once
        # (the double value*dur sum could flip the 6-dp rounding)
        .agg(F.round(F.sum(cents * F.col("dur_us")).cast("double")
                     / F.sum("dur_us") / 100.0, 6).alias("twap"),
             F.round(F.sum(cents).cast("double") / 100.0
                     / F.count(F.lit(1)), 6).alias("simple_avg"),
             F.sum("dur_us").cast("bigint").alias("covered_us"),
             F.count(F.lit(1)).alias("n_intervals"))
        .orderBy("event_type", "d")
    )


@query("streaming_ohlc_replay", sql="""
    WITH keyed AS (
      SELECT event_type,
             date_trunc('hour', ts) AS ws,
             value,
             epoch(ts)::BIGINT * 10000000 + event_id AS okey
      FROM events
    )
    SELECT ws AS window_start,
           ws + INTERVAL 1 HOUR AS window_end,
           event_type,
           ROUND(arg_min(value, okey), 6) AS open,
           ROUND(MAX(value), 6) AS high,
           ROUND(MIN(value), 6) AS low,
           ROUND(arg_max(value, okey), 6) AS close,
           CAST(COUNT(*) AS BIGINT) AS volume
    FROM keyed
    GROUP BY event_type, ws
    ORDER BY event_type, ws
""")
def streaming_ohlc_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch replay twin of `streaming.tumbling_ohlc_bars`: the SAME
    window + min_by/max_by aggregation expressed over the bounded
    events table (F.window in batch mode), giving the streaming
    operator an oracle-graded correctness row. Stream/batch parity is
    additionally pinned by tests/test_streaming.py, which drains the
    streaming version over a file source and asserts frame equality
    with this twin.

    Scale posture matches ts_ohlc_bars: one partial-aggregatable
    shuffle, O(1) state per open bar in the streaming run."""
    ev = load_table(spark, sf_dir, "events")
    okey = (F.unix_timestamp("ts") * F.lit(10000000)
            + F.col("event_id"))
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.round(F.min_by("value", okey), 6).alias("open"),
             F.round(F.max("value"), 6).alias("high"),
             F.round(F.min("value"), 6).alias("low"),
             F.round(F.max_by("value", okey), 6).alias("close"),
             F.count(F.lit(1)).alias("volume"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "open", "high", "low", "close", "volume")
        .orderBy("event_type", "window_start")
    )


@query("events_rate_ci", sql="""
    WITH span AS (
      SELECT event_type, COUNT(*) AS n,
             (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 3600e6 AS hours
      FROM events GROUP BY 1
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_events,
           ROUND(hours, 6) AS span_hours,
           ROUND(n / hours, 6) AS rate_per_hour,
           ROUND(n / hours - 1.96 * SQRT(n) / hours, 6) AS rate_lo,
           ROUND(n / hours + 1.96 * SQRT(n) / hours, 6) AS rate_hi
    FROM span ORDER BY event_type
""")
def events_rate_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type event arrival rate with a 95% normal-approximation
    Poisson confidence interval (rate ± 1.96·sqrt(n)/T) — the
    alerting primitive behind "is this stream's throughput outside
    its expected band".

    One partial-aggregatable pass (count + min/max timestamp per
    type); the CI arithmetic runs on |types| rows. The observation
    span is exact integer microseconds (epoch_us / unix_micros), so
    both engines divide identical doubles."""
    ev = load_table(spark, sf_dir, "events")
    span = (ev.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 ((F.unix_micros(F.max("ts"))
                   - F.unix_micros(F.min("ts"))) / F.lit(3600e6))
                 .alias("hours")))
    rate = F.col("n") / F.col("hours")
    half = F.lit(1.96) * F.sqrt("n") / F.col("hours")
    return (span.select("event_type",
                        F.col("n").cast("bigint").alias("n_events"),
                        F.round("hours", 6).alias("span_hours"),
                        F.round(rate, 6).alias("rate_per_hour"),
                        F.round(rate - half, 6).alias("rate_lo"),
                        F.round(rate + half, 6).alias("rate_hi"))
            .orderBy("event_type"))


@query("ts_seasonal_strength", sql="""
    WITH base AS (
      SELECT event_type, EXTRACT(hour FROM ts) AS hod, value
      FROM events
    ), seas AS (
      SELECT event_type, hod, AVG(value) AS s
      FROM base GROUP BY 1, 2
    ), joined AS (
      SELECT b.event_type, b.value, b.value - s.s AS resid
      FROM base b JOIN seas s
        ON s.event_type = b.event_type AND s.hod = b.hod
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(var_samp(value), 4) AS var_total,
           ROUND(var_samp(resid), 4) AS var_resid,
           ROUND(GREATEST(0, 1 - var_samp(resid) / var_samp(value)), 6)
             AS seasonal_strength
    FROM joined GROUP BY event_type ORDER BY event_type
""")
def ts_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-strength decomposition (the STL-lite diagnostic): fit
    the hour-of-day profile as the seasonal component, measure
    max(0, 1 - Var(residual)/Var(series)) — ~1 means the diurnal
    cycle explains the series, ~0 means the hour-of-day baseline
    (and any alerting built on it, e.g. events_seasonal_anomaly's
    per-clock-hour z-scores) adds nothing for that metric.

    Plan: the seasonal profile is a 24-slot-per-type agg; joining it
    back is a broadcast (|types| x 24 rows) onto one narrow pass, and
    the variance aggregates partial-combine. Two data-sized passes
    total, zero windows. Variances round at 4 dp (they sit in the
    1e3 range; the strength ratio divides unrounded doubles and
    rounds at 6 where engine noise is ~1e-10 relative)."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select("event_type", F.hour("ts").alias("hod"), "value")
    seas = (base.groupBy("event_type", "hod")
            .agg(F.avg("value").alias("s")))
    joined = (base.join(F.broadcast(seas), ["event_type", "hod"])
              .select("event_type", "value",
                      (F.col("value") - F.col("s")).alias("resid")))
    return (joined.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.var_samp("value"), 4).alias("var_total"),
                 F.round(F.var_samp("resid"), 4).alias("var_resid"),
                 F.round(F.greatest(
                     F.lit(0.0),
                     1 - F.var_samp("resid") / F.var_samp("value")), 6)
                 .alias("seasonal_strength"))
            .orderBy("event_type"))


@query("ts_bollinger_bands", sql="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS d,
             ROUND(SUM(value), 6) AS v
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), bands AS (
      SELECT d, v,
             ROUND(AVG(v) OVER w, 6) AS ma,
             ROUND(stddev_samp(v) OVER w, 6) AS sd,
             COUNT(*) OVER w AS n_window
      FROM daily
      WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT d, v, ma,
           ROUND(ma - 2 * sd, 6) AS lower_band,
           ROUND(ma + 2 * sd, 6) AS upper_band,
           CASE WHEN n_window >= 7 AND v > ma + 2 * sd THEN 'above'
                WHEN n_window >= 7 AND v < ma - 2 * sd THEN 'below'
                WHEN n_window >= 7 THEN 'inside'
                ELSE 'warmup' END AS band_state
    FROM bands ORDER BY d
""")
def ts_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands on daily purchase revenue: trailing-7-day
    rolling mean ± 2 rolling standard deviations, with each day
    classified inside/above/below (breakout detection) and the
    partial-window warm-up labeled rather than silently mis-banded —
    the rolling-band complement to the EWMA trend and CUSUM
    change-point operators.

    One data-sized partial-agg to daily grain; the rolling window
    runs on ~60 day-rows. Determinism: daily sums and the rolling
    mean/sd round at 6 dp BEFORE the band comparison, so both
    engines classify identical doubles against identical bands (the
    LTV lesson: never compare unrounded window aggregates)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.where(F.col("event_type") == "purchase")
             .groupBy(F.date_trunc("day", "ts").alias("d"))
             .agg(F.round(F.sum("value"), 6).alias("v")))
    w = Window.orderBy("d").rowsBetween(-6, 0)
    bands = (daily
             .withColumn("ma", F.round(F.avg("v").over(w), 6))
             .withColumn("sd", F.round(F.stddev_samp("v").over(w), 6))
             .withColumn("n_window", F.count(F.lit(1)).over(w)))
    full = F.col("n_window") >= 7
    return (bands.select(
        "d", "v", "ma",
        F.round(F.col("ma") - 2 * F.col("sd"), 6).alias("lower_band"),
        F.round(F.col("ma") + 2 * F.col("sd"), 6).alias("upper_band"),
        F.when(full & (F.col("v") > F.col("ma") + 2 * F.col("sd")),
               "above")
        .when(full & (F.col("v") < F.col("ma") - 2 * F.col("sd")),
              "below")
        .when(full, "inside").otherwise("warmup").alias("band_state"))
        .orderBy("d"))


def _theilsen_group(pdf):
    """Per-group Theil-Sen estimator: median of all pairwise slopes,
    intercept = median(y - slope*x). O(n²) pairs per group — exactly
    the per-group dense-math shape grouped-map applyInPandas exists
    for (n is bounded: one row per DAY per group)."""
    import numpy as np

    pdf = pdf.sort_values("x")
    x = pdf["x"].to_numpy(dtype="float64")
    y = pdf["y"].to_numpy(dtype="float64")
    i, j = np.triu_indices(len(x), k=1)
    slopes = (y[j] - y[i]) / (x[j] - x[i])
    slope = float(np.median(slopes))
    intercept = float(np.median(y - slope * x))
    import pandas as _p
    return _p.DataFrame({"event_type": [pdf["event_type"].iloc[0]],
                         "n_days": [len(x)],
                         "slope_per_day": [slope],
                         "intercept": [intercept]})


@query("ts_theilsen_trend", sql="""
    WITH daily AS (
      SELECT event_type,
             date_diff('day', TIMESTAMP '2024-01-01',
                       date_trunc('day', ts)) AS x,
             ROUND(SUM(value), 6) AS y
      FROM events GROUP BY 1, 2
    ), pairs AS (
      SELECT a.event_type,
             (b.y - a.y) / (b.x - a.x) AS s
      FROM daily a JOIN daily b
        ON b.event_type = a.event_type AND b.x > a.x
    ), sl AS (
      SELECT event_type, quantile_cont(s, 0.5) AS slope
      FROM pairs GROUP BY 1
    )
    SELECT d.event_type,
           CAST(COUNT(*) AS INT) AS n_days,
           ROUND(MAX(sl.slope), 6) AS slope_per_day,
           ROUND(quantile_cont(d.y - sl.slope * d.x, 0.5), 6)
             AS intercept
    FROM daily d JOIN sl ON sl.event_type = d.event_type
    GROUP BY d.event_type ORDER BY d.event_type
""")
def ts_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per event type: the median of all
    pairwise slopes of daily value totals (plus the median-residual
    intercept) — the outlier-immune alternative to OLS for noisy
    operational metrics (one bad day can't move it, unlike
    regr_slope).

    This is the declared GROUPED-MAP extension point
    (df.groupBy().applyInPandas — §2.2 'UDF/UDAF/UDTF'): the O(n²)
    pairwise-slope median is genuinely per-group dense matrix math,
    the shape Arrow grouped-map exists for. State is bounded — one
    row per DAY per group reaches Python, never raw events (the
    data-sized work is the JVM daily pre-aggregation), so at 100 TB
    each group ships ~365 rows/year regardless of event volume.
    Determinism: day index and 6-dp-rounded daily sums are identical
    on both engines; NumPy's median and DuckDB's quantile_cont(0.5)
    both average the two middle values of identical doubles."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.groupBy(
        "event_type",
        F.datediff(F.date_trunc("day", "ts"),
                   F.lit("2024-01-01").cast("timestamp")).alias("x"))
        .agg(F.round(F.sum("value"), 6).alias("y")))
    fitted = (daily.groupBy("event_type").applyInPandas(
        _theilsen_group,
        schema=("event_type string, n_days int, slope_per_day double, "
                "intercept double")))
    return (fitted.select(
        "event_type", "n_days",
        F.round("slope_per_day", 6).alias("slope_per_day"),
        F.round("intercept", 6).alias("intercept"))
        .orderBy("event_type"))


@query("events_incident_windows", sql="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ), stats AS (
      SELECT event_type, AVG(n) AS mu, stddev_samp(n) AS sd
      FROM hourly GROUP BY 1
    ), scored AS (
      SELECT h.event_type, h.h, h.n,
             ROUND((h.n - s.mu) / s.sd, 6) AS z
      FROM hourly h JOIN stats s ON s.event_type = h.event_type
    ), flagged AS (
      SELECT event_type, h, n, z,
             epoch(h)::BIGINT // 3600 AS hidx
      FROM scored WHERE ABS(z) > 2
    ), islands AS (
      SELECT *,
             hidx - ROW_NUMBER() OVER (PARTITION BY event_type
                                       ORDER BY hidx) AS isl
      FROM flagged
    )
    SELECT event_type,
           MIN(h) AS incident_start,
           MAX(h) + INTERVAL 1 HOUR AS incident_end,
           CAST(COUNT(*) AS INT) AS n_hours,
           ROUND(MAX(ABS(z)), 6) AS peak_abs_z,
           CAST(SUM(n) AS BIGINT) AS events_in_incident
    FROM islands
    GROUP BY event_type, isl
    ORDER BY event_type, incident_start
""")
def events_incident_windows(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Incident-window extraction: hourly volume z-scores per type,
    |z| > 2 hours flagged, and CONTIGUOUS flagged hours merged into
    incidents (start, end, duration, peak z, event mass) via
    gaps-and-islands — what turns a pointwise anomaly detector
    (events_anomaly_zscore's grain) into the incident records an
    on-call actually pages on: one row per episode, not one per
    noisy hour.

    Plan: one data-sized count to hour grain, per-type stats on
    bucket rows, islands via (hour-index − row_number) on the FLAGGED
    subset only (tiny), one island rollup. Determinism: z is rounded
    at 6 dp BEFORE the |z|>2 comparison on both engines, so flag
    membership can't flip on a stddev merge-order ulp."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (ev.groupBy("event_type",
                         F.date_trunc("hour", "ts").alias("h"))
              .agg(F.count(F.lit(1)).alias("n")))
    stats = (hourly.groupBy("event_type")
             .agg(F.avg("n").alias("mu"),
                  F.stddev_samp("n").alias("sd")))
    scored = (hourly.join(F.broadcast(stats), "event_type")
              .select("event_type", "h", "n",
                      F.round((F.col("n") - F.col("mu")) / F.col("sd"),
                              6).alias("z")))
    flagged = (scored.where(F.abs("z") > 2)
               .withColumn("hidx",
                           (F.unix_timestamp("h")
                            / F.lit(3600)).cast("bigint")))
    iw = Window.partitionBy("event_type").orderBy("hidx")
    islands = flagged.withColumn(
        "isl", F.col("hidx") - F.row_number().over(iw))
    return (islands.groupBy("event_type", "isl")
            .agg(F.min("h").alias("incident_start"),
                 (F.max("h") + F.expr("INTERVAL 1 HOUR"))
                 .alias("incident_end"),
                 F.count(F.lit(1)).cast("int").alias("n_hours"),
                 F.round(F.max(F.abs("z")), 6).alias("peak_abs_z"),
                 F.sum("n").cast("bigint").alias("events_in_incident"))
            .drop("isl")
            .orderBy("event_type", "incident_start"))


@query("events_wow_growth", sql="""
    WITH weekly AS (
      SELECT event_type, date_trunc('week', ts) AS wk,
             COUNT(*) AS n,
             ROUND(SUM(value), 6) AS total_value
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, wk,
           CAST(n AS BIGINT) AS n_events,
           total_value,
           CAST(lag(n) OVER w AS BIGINT) AS prev_n,
           ROUND((n - lag(n) OVER w) * 1e0
                 / NULLIF(lag(n) OVER w, 0), 6) AS wow_growth,
           ROUND((total_value - lag(total_value) OVER w)
                 / NULLIF(lag(total_value) OVER w, 0), 6)
             AS wow_value_growth
    FROM weekly
    WINDOW w AS (PARTITION BY event_type ORDER BY wk)
    ORDER BY event_type, wk
""")
def events_wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth report per event type: weekly counts and
    value mass with the previous week and relative growth — the
    period-over-period comparison every business dashboard leads
    with, NULL (not fake zero) for the first week and for
    zero-denominator weeks.

    One partial-aggregatable shuffle to week grain; the lag window
    runs on |types| x |weeks| rows. The growth ratio divides the
    pre-rounded weekly aggregates, so both engines compare identical
    doubles."""
    ev = load_table(spark, sf_dir, "events")
    weekly = (ev.groupBy("event_type",
                         F.date_trunc("week", "ts").alias("wk"))
              .agg(F.count(F.lit(1)).alias("n"),
                   F.round(F.sum("value"), 6).alias("total_value")))
    w = Window.partitionBy("event_type").orderBy("wk")
    prev_n = F.lag("n").over(w)
    prev_v = F.lag("total_value").over(w)
    return (weekly.select(
        "event_type", "wk",
        F.col("n").cast("bigint").alias("n_events"),
        "total_value",
        prev_n.cast("bigint").alias("prev_n"),
        F.round((F.col("n") - prev_n) * F.lit(1.0)
                / F.nullif(prev_n, F.lit(0)), 6).alias("wow_growth"),
        F.round((F.col("total_value") - prev_v)
                / F.nullif(prev_v, F.lit(0)), 6)
        .alias("wow_value_growth"))
        .orderBy("event_type", "wk"))


@query("events_burstiness_index", sql="""
    WITH gaps AS (
      SELECT event_type,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
                 PARTITION BY event_type ORDER BY ts, event_id)
               AS g
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(g) AS BIGINT) AS n_gaps,
           ROUND(AVG(g), 2) AS mean_gap_us,
           ROUND(stddev_samp(g), 2) AS sd_gap_us,
           ROUND((stddev_samp(g) - AVG(g))
                 / (stddev_samp(g) + AVG(g)), 6) AS burstiness
    FROM gaps WHERE g IS NOT NULL
    GROUP BY event_type ORDER BY event_type
""")
def events_burstiness_index(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Goh-Barabási burstiness index per event type:
    B = (sigma - mu)/(sigma + mu) of inter-arrival times — -1 for a
    metronome, 0 for a Poisson process, toward +1 for heavy-tailed
    bursts. The single number that says whether a stream's load can
    be provisioned at mean rate (B<=0) or needs burst headroom (B>0);
    the per-user version of the same signal drives
    events_bot_score's regularity flag.

    One per-type ordered window (at 100 TB: sub-partition by day —
    gaps straddling boundaries are a negligible count), one rollup.
    Exact integer microsecond gaps; mean/sd report at 2 dp (1e9-µs
    magnitudes at 6 dp would demand 16 significant digits — past
    cross-engine double determinism; measured a last-digit flip) and
    the scale-free B ratio rounds at 6 dp."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = (ev.select(
        "event_type",
        (F.unix_micros("ts")
         - F.lag(F.unix_micros("ts")).over(w)).alias("g"))
        .where(F.col("g").isNotNull()))
    mu = F.avg("g")
    sd = F.stddev_samp("g")
    return (gaps.groupBy("event_type")
            .agg(F.count("g").alias("n_gaps"),
                 F.round(mu, 2).alias("mean_gap_us"),
                 F.round(sd, 2).alias("sd_gap_us"),
                 F.round((sd - mu) / (sd + mu), 6).alias("burstiness"))
            .orderBy("event_type"))


@query("ts_snaive_backtest", sql="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS d,
             ROUND(SUM(value), 6) AS v
      FROM events GROUP BY 1, 2
    ), joined AS (
      SELECT a.event_type, a.d, a.v, f.v AS forecast
      FROM daily a JOIN daily f
        ON f.event_type = a.event_type
       AND f.d = a.d - INTERVAL 7 DAY
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days_scored,
           ROUND(AVG(ABS(v - forecast) / v), 6) AS mape,
           ROUND(AVG(ABS(v - forecast)), 4) AS mae,
           ROUND(AVG(v - forecast), 4) AS bias
    FROM joined GROUP BY event_type ORDER BY event_type
""")
def ts_snaive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: forecast(d) = value(d - 7
    days), scored with MAPE / MAE / bias per event type — the
    baseline every forecasting system must beat before it earns its
    complexity (M-competition practice), and the cheapest possible
    drift monitor: a rising seasonal-naive MAPE means the weekly
    pattern itself is shifting.

    Plan: one data-sized partial-agg to daily grain, one
    calendar-offset self-join on (type, d-7) — robust to missing days
    (no row-offset lag), grid-sized — one rollup. Daily totals are
    pre-rounded so both engines score identical doubles."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type",
                        F.date_trunc("day", "ts").alias("d"))
             .agg(F.round(F.sum("value"), 6).alias("v"))).persist()
    f = (daily.select("event_type",
                      F.expr("d + INTERVAL 7 DAYS").alias("d"),
                      F.col("v").alias("forecast")))
    joined = daily.join(f, ["event_type", "d"])
    err = F.col("v") - F.col("forecast")
    return (joined.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_days_scored"),
                 F.round(F.avg(F.abs(err) / F.col("v")), 6)
                 .alias("mape"),
                 F.round(F.avg(F.abs(err)), 4).alias("mae"),
                 F.round(F.avg(err), 4).alias("bias"))
            .orderBy("event_type"))


@query("events_transition_entropy", sql="""
    WITH seq AS (
      SELECT user_id, event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ), joint AS (
      SELECT cur, nxt, COUNT(*) AS n FROM seq
      WHERE nxt IS NOT NULL GROUP BY 1, 2
    ), m AS (
      SELECT cur, nxt, n,
             SUM(n) OVER (PARTITION BY cur) AS nc,
             SUM(n) OVER () AS t
      FROM joint
    )
    SELECT CAST(MAX(t) AS BIGINT) AS n_transitions,
           CAST(COUNT(*) AS INT) AS n_pairs,
           ROUND(-SUM((n * 1e0 / t) * LN(n * 1e0 / nc)), 6)
             AS cond_entropy_nats,
           ROUND(EXP(-SUM((n * 1e0 / t) * LN(n * 1e0 / nc))), 6)
             AS branching_factor
    FROM m
""")
def events_transition_entropy(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Conditional entropy of the event-type Markov chain,
    H(next | current) = -Σ p(i,j)·ln p(j|i), with its exponential (the
    effective branching factor): how PREDICTABLE the next user action
    is given the current one. ln(|types|) means the current event
    tells you nothing (this fixture's shape — uniform synthetic
    transitions); near 0 means rigid funnels. The summary number that
    says whether next-event prediction is worth modeling at all, and
    the information-theoretic companion to events_top_transitions'
    raw matrix.

    One per-user lead window (the data-sized stage, user-keyed), one
    count to the |types|² grid, windows + rollup on grid rows."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (ev.select("user_id", F.col("event_type").alias("cur"),
                     F.lead("event_type").over(w).alias("nxt"))
           .where(F.col("nxt").isNotNull()))
    joint = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    m = (joint
         .withColumn("nc", F.sum("n").over(Window.partitionBy("cur")))
         .withColumn("t", F.sum("n").over(
             Window.partitionBy(F.lit(1)))))
    p_joint = F.col("n") * F.lit(1.0) / F.col("t")
    p_cond = F.col("n") * F.lit(1.0) / F.col("nc")
    h = -F.sum(p_joint * F.log(p_cond))
    return m.agg(
        F.max("t").cast("bigint").alias("n_transitions"),
        F.count(F.lit(1)).cast("int").alias("n_pairs"),
        F.round(h, 6).alias("cond_entropy_nats"),
        F.round(F.exp(h), 6).alias("branching_factor"))


@query("events_weekend_welch_test", sql="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS d,
             CASE WHEN EXTRACT(isodow FROM ts) >= 6
                  THEN 1 ELSE 0 END AS is_weekend,
             ROUND(SUM(value), 6) AS v
      FROM events GROUP BY 1, 2, 3
    ), g AS (
      SELECT event_type, is_weekend,
             COUNT(*) AS n, AVG(v) AS m, var_samp(v) AS s2
      FROM daily GROUP BY 1, 2
    ), wide AS (
      SELECT event_type,
             MAX(CASE WHEN is_weekend = 0 THEN n END) AS n_wd,
             MAX(CASE WHEN is_weekend = 0 THEN m END) AS m_wd,
             MAX(CASE WHEN is_weekend = 0 THEN s2 END) AS s2_wd,
             MAX(CASE WHEN is_weekend = 1 THEN n END) AS n_we,
             MAX(CASE WHEN is_weekend = 1 THEN m END) AS m_we,
             MAX(CASE WHEN is_weekend = 1 THEN s2 END) AS s2_we
      FROM g GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_wd AS INT) AS n_weekday,
           CAST(n_we AS INT) AS n_weekend,
           ROUND(m_wd, 6) AS mean_weekday,
           ROUND(m_we, 6) AS mean_weekend,
           ROUND((m_we - m_wd)
                 / SQRT(s2_wd / n_wd + s2_we / n_we), 6) AS welch_t,
           ROUND(POW(s2_wd / n_wd + s2_we / n_we, 2)
                 / (POW(s2_wd / n_wd, 2) / (n_wd - 1)
                    + POW(s2_we / n_we, 2) / (n_we - 1)), 6)
             AS welch_df
    FROM wide ORDER BY event_type
""")
def events_weekend_welch_test(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test of weekend vs weekday daily
    value totals per event type (with the Welch-Satterthwaite degrees
    of freedom) — the two-sample location test that doesn't assume
    equal variances or sizes, the right default for "is weekend load
    actually different" questions the hour/dow heatmap only eyeballs.

    One data-sized partial agg to (type, day) grain with rounded
    totals; the test statistic is closed-form arithmetic on a 2-row
    group summary per type."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type",
                        F.date_trunc("day", "ts").alias("d"),
                        (F.weekday("ts") >= 5).cast("int")
                        .alias("is_weekend"))
             .agg(F.round(F.sum("value"), 6).alias("v")))
    g = (daily.groupBy("event_type", "is_weekend")
         .agg(F.count(F.lit(1)).alias("n"), F.avg("v").alias("m"),
              F.var_samp("v").alias("s2")))
    pick = lambda w, c: F.max(
        F.when(F.col("is_weekend") == w, F.col(c)))
    wide = (g.groupBy("event_type")
            .agg(pick(0, "n").alias("n_wd"), pick(0, "m").alias("m_wd"),
                 pick(0, "s2").alias("s2_wd"),
                 pick(1, "n").alias("n_we"), pick(1, "m").alias("m_we"),
                 pick(1, "s2").alias("s2_we")))
    se2 = F.col("s2_wd") / F.col("n_wd") + F.col("s2_we") / F.col("n_we")
    return (wide.select(
        "event_type",
        F.col("n_wd").cast("int").alias("n_weekday"),
        F.col("n_we").cast("int").alias("n_weekend"),
        F.round("m_wd", 6).alias("mean_weekday"),
        F.round("m_we", 6).alias("mean_weekend"),
        F.round((F.col("m_we") - F.col("m_wd")) / F.sqrt(se2), 6)
        .alias("welch_t"),
        F.round(F.pow(se2, 2)
                / (F.pow(F.col("s2_wd") / F.col("n_wd"), 2)
                   / (F.col("n_wd") - 1)
                   + F.pow(F.col("s2_we") / F.col("n_we"), 2)
                   / (F.col("n_we") - 1)), 6).alias("welch_df"))
        .orderBy("event_type"))


# ------------------------------------------ multiple testing (BH FDR)

_BH_Q = 0.10                     # target false-discovery rate
# Abramowitz & Stegun 26.2.17 constants for the normal CDF tail —
# a pure polynomial-in-exp form both engines evaluate identically.
_AS_B = (0.319381530, -0.356563782, 1.781477937,
         -1.821255978, 1.330274429)
_AS_P = 0.2316419
_SQRT_2PI = 2.5066282746310002


def _norm_sf_sql(x: str) -> str:
    """Upper-tail normal probability 1 - Phi(x) for x >= 0 (A&S
    26.2.17) as a SQL expression string shared by oracle and engine."""
    k = f"(1.0 / (1.0 + {_AS_P} * {x}))"
    poly = " + ".join(f"{b} * POW({k}, {i + 1})"
                      for i, b in enumerate(_AS_B))
    return (f"(EXP(-({x}) * ({x}) / 2.0) / {_SQRT_2PI} * ({poly}))")


@query("stats_fdr_bh_weekend", sql=f"""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS d,
             CASE WHEN EXTRACT(isodow FROM ts) >= 6
                  THEN 1 ELSE 0 END AS is_weekend,
             ROUND(SUM(value), 6) AS v
      FROM events GROUP BY 1, 2, 3
    ), g AS (
      SELECT event_type, is_weekend,
             COUNT(*) AS n, AVG(v) AS m, var_samp(v) AS s2
      FROM daily GROUP BY 1, 2
    ), wide AS (
      SELECT event_type,
             MAX(CASE WHEN is_weekend = 0 THEN n END) AS n_wd,
             MAX(CASE WHEN is_weekend = 0 THEN m END) AS m_wd,
             MAX(CASE WHEN is_weekend = 0 THEN s2 END) AS s2_wd,
             MAX(CASE WHEN is_weekend = 1 THEN n END) AS n_we,
             MAX(CASE WHEN is_weekend = 1 THEN m END) AS m_we,
             MAX(CASE WHEN is_weekend = 1 THEN s2 END) AS s2_we
      FROM g GROUP BY event_type
    ), tstat AS (
      SELECT event_type,
             ABS((m_we - m_wd)
                 / SQRT(s2_wd / n_wd + s2_we / n_we)) AS at
      FROM wide
    ), pv AS (
      SELECT event_type,
             ROUND(2.0 * {_norm_sf_sql('at')}, 6) AS p_value
      FROM tstat
    ), ranked AS (
      SELECT event_type, p_value,
             CAST(ROW_NUMBER() OVER (ORDER BY p_value, event_type)
                  AS INT) AS rnk,
             COUNT(*) OVER () AS m
      FROM pv
    ), cutoff AS (
      SELECT COALESCE(MAX(CASE WHEN p_value * m <= rnk * {_BH_Q}
                               THEN rnk END), 0) AS kmax
      FROM ranked
    )
    SELECT r.event_type, r.p_value, r.rnk AS p_rank,
           ROUND(r.rnk * {_BH_Q} / r.m, 6) AS bh_threshold,
           r.rnk <= c.kmax AS reject
    FROM ranked r CROSS JOIN cutoff c
    ORDER BY r.rnk
""")
def stats_fdr_bh_weekend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR correction over the weekend-effect test
    FAMILY: one Welch test per event type (the same daily-revenue
    statistic events_weekend_welch_test reports), two-sided normal-
    approximation p-values via the Abramowitz-Stegun 26.2.17
    polynomial (portable — no erf on either engine), then the BH
    step-up rule at q = {q}: reject every hypothesis ranked at or
    below the LARGEST k with p(k) <= k/m * q. This is the
    multiple-testing control every metrics platform applies when one
    experiment readout fans out into per-segment tests — without it,
    five 5%-level tests produce a false positive ~23% of the time.

    Plan: the per-type stats are the Welch rollup (day-grain then
    type-grain, partial-aggregatable); everything after — p-values,
    the BH rank window, the step-up cutoff — runs on the |event
    types|-row family frame (declared bounded in the audit). P-values
    round at 6 dp before ranking and thresholding, so both engines
    make identical reject decisions.""".format(q=_BH_Q)
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type",
                        F.date_trunc("day", "ts").alias("d"),
                        (F.dayofweek("ts").isin(1, 7)).cast("int")
                        .alias("is_weekend"))
             .agg(F.round(F.sum("value"), 6).alias("v")))
    g = (daily.groupBy("event_type", "is_weekend")
         .agg(F.count(F.lit(1)).alias("n"), F.avg("v").alias("m"),
              F.var_samp("v").alias("s2")))
    side = lambda c, w: F.max(F.when(F.col("is_weekend") == w,
                                     F.col(c)))  # noqa: E731
    wide = (g.groupBy("event_type")
            .agg(side("n", 0).alias("n_wd"), side("m", 0).alias("m_wd"),
                 side("s2", 0).alias("s2_wd"),
                 side("n", 1).alias("n_we"), side("m", 1).alias("m_we"),
                 side("s2", 1).alias("s2_we")))
    at = F.abs((F.col("m_we") - F.col("m_wd"))
               / F.sqrt(F.col("s2_wd") / F.col("n_wd")
                        + F.col("s2_we") / F.col("n_we")))
    pv = (wide.select("event_type", at.alias("at"))
          .select("event_type",
                  F.round(2.0 * F.expr(_norm_sf_sql("at")), 6)
                  .alias("p_value")))
    rw = Window.orderBy("p_value", "event_type")
    ranked = (pv.withColumn("rnk", F.row_number().over(rw).cast("int"))
              .withColumn("m", F.count(F.lit(1)).over(
                  Window.partitionBy(F.lit(1))))
              .persist())
    cutoff = ranked.agg(
        F.coalesce(F.max(F.when(
            F.col("p_value") * F.col("m") <= F.col("rnk") * _BH_Q,
            F.col("rnk"))), F.lit(0)).alias("kmax"))
    return (ranked.crossJoin(F.broadcast(cutoff))
            .select("event_type", "p_value",
                    F.col("rnk").alias("p_rank"),
                    F.round(F.col("rnk") * _BH_Q / F.col("m"), 6)
                    .alias("bh_threshold"),
                    (F.col("rnk") <= F.col("kmax")).alias("reject"))
            .orderBy("p_rank"))


_MOTIF_W = 7                             # window length in days


@query("ts_motif_discovery", sql=f"""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day, SUM(value) AS rev
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), d2 AS (
      SELECT day, rev, ROW_NUMBER() OVER (ORDER BY day) - 1 AS idx
      FROM daily
    ), win AS (
      SELECT a.idx AS i, b.idx - a.idx AS k, b.rev AS x,
             a.day AS sday
      FROM d2 a JOIN d2 b
        ON b.idx BETWEEN a.idx AND a.idx + {_MOTIF_W - 1}
    ), ws AS (
      SELECT i, MIN(sday) AS sday, AVG(x) AS mu, STDDEV_POP(x) AS sd
      FROM win GROUP BY i HAVING COUNT(*) = {_MOTIF_W}
    ), pair AS (
      SELECT wa.i AS i, wb.i AS j,
             SUM(wa.x * wb.x) / {_MOTIF_W} AS exy
      FROM win wa JOIN win wb
        ON wb.k = wa.k AND wb.i >= wa.i + {_MOTIF_W}
      GROUP BY 1, 2 HAVING COUNT(*) = {_MOTIF_W}
    )
    SELECT sa.sday AS window_a, sb.sday AS window_b,
           ROUND((p.exy - sa.mu * sb.mu) / (sa.sd * sb.sd), 6)
             AS corr,
           ROUND(SQRT(GREATEST(0.0,
                 2 * {_MOTIF_W} * (1 - (p.exy - sa.mu * sb.mu)
                                   / (sa.sd * sb.sd)))), 6) AS zdist
    FROM pair p JOIN ws sa ON sa.i = p.i JOIN ws sb ON sb.i = p.j
    WHERE sa.sd > 1e-9 AND sb.sd > 1e-9
    ORDER BY zdist, window_a, window_b
    LIMIT 3
""")
def ts_motif_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matrix-profile-style motif discovery (Yeh et al., ICDM'16) on
    the daily purchase-revenue series: the top-3 non-overlapping
    {_MOTIF_W}-day window pairs with the smallest z-normalized
    Euclidean distance — the recurring-shape detector behind anomaly
    triage and seasonality mining. The z-distance reduces to
    correlation (d^2 = 2w(1 - r)), so no normalized series ever
    materializes: per-window (mu, sd) plus one aligned-offset
    cross-product aggregate give every pairwise distance.

    Scale: the series is DAY grain — bounded by the calendar, not the
    event count (the one data-sized pass is the daily rollup). The
    window expansion and the offset-aligned pair join are
    calendar^2 at worst, and the top-3 is TakeOrderedAndProject on
    the ROUNDED distance (identical on both engines) with day
    tie-breaks, so rank boundaries can't flip on an ulp."""
    from pyspark.sql import Window as W

    w = _MOTIF_W
    daily = (load_table(spark, sf_dir, "events")
             .where(F.col("event_type") == "purchase")
             .groupBy(F.date_trunc("day", "ts").alias("day"))
             .agg(F.sum("value").alias("rev")))
    # the day-grain index window is calendar-bounded (declared in the
    # plan audit); persist it so the four downstream branches
    # (window expansion sides, per-window stats, pair join) share ONE
    # daily rollup instead of re-running the data-grain scan each
    d2 = (daily.withColumn(
        "idx", F.row_number().over(W.orderBy("day")) - 1)
        .persist())
    # every frame below is calendar-bounded (days / day-windows), so
    # the joins broadcast by construction at ANY data scale — the
    # hints are load-bearing because the cached frame hides sizes
    a = d2.select(F.col("idx").alias("i"), F.col("day").alias("sday"))
    b = d2.select(F.col("idx").alias("bi"), F.col("rev").alias("x"))
    win = (a.join(F.broadcast(b), (F.col("bi") >= F.col("i"))
                  & (F.col("bi") <= F.col("i") + (w - 1)))
           .select("i", (F.col("bi") - F.col("i")).alias("k"),
                   "x", "sday")
           .persist())
    ws = (win.groupBy("i")
          .agg(F.min("sday").alias("sday"), F.avg("x").alias("mu"),
               F.stddev_pop("x").alias("sd"),
               F.count(F.lit(1)).alias("n"))
          .where(F.col("n") == w))
    wa = win.select("i", "k", F.col("x").alias("xa"))
    wb = win.select(F.col("i").alias("j"), F.col("k").alias("k2"),
                    F.col("x").alias("xb"))
    pair = (wa.join(F.broadcast(wb), (F.col("k") == F.col("k2"))
                    & (F.col("j") >= F.col("i") + w))
            .groupBy("i", "j")
            .agg((F.sum(F.col("xa") * F.col("xb")) / w).alias("exy"),
                 F.count(F.lit(1)).alias("n"))
            .where(F.col("n") == w))
    sa = ws.select(F.col("i").alias("i"), F.col("sday").alias("sa_day"),
                   F.col("mu").alias("mu_a"), F.col("sd").alias("sd_a"))
    sb = ws.select(F.col("i").alias("j"), F.col("sday").alias("sb_day"),
                   F.col("mu").alias("mu_b"), F.col("sd").alias("sd_b"))
    r = ((F.col("exy") - F.col("mu_a") * F.col("mu_b"))
         / (F.col("sd_a") * F.col("sd_b")))
    return (pair.join(F.broadcast(sa), "i").join(F.broadcast(sb), "j")
            .where((F.col("sd_a") > 1e-9) & (F.col("sd_b") > 1e-9))
            .select(F.col("sa_day").alias("window_a"),
                    F.col("sb_day").alias("window_b"),
                    F.round(r, 6).alias("corr"),
                    F.round(F.sqrt(F.greatest(
                        F.lit(0.0), 2 * w * (1 - r))), 6)
                    .alias("zdist"))
            .orderBy("zdist", "window_a", "window_b")
            .limit(3))


# ------------------------------------------ binary-seg changepoints


@query("ts_binseg_changepoints", sql="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(ROUND(SUM(value) * 100) AS BIGINT) AS vc
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), idx AS (
      SELECT a.d, a.vc,
             (SELECT COUNT(*) FROM daily b WHERE b.d < a.d) AS i
      FROM daily a
    ), nn AS (SELECT COUNT(*) AS n FROM daily),
    tp AS (
      SELECT t.t,
             COALESCE(SUM(CASE WHEN m.i < t.t
                               THEN CAST(m.vc AS DOUBLE) END), 0)
               AS p,
             COALESCE(SUM(CASE WHEN m.i < t.t
                               THEN CAST(m.vc AS DOUBLE)
                                    * CAST(m.vc AS DOUBLE) END), 0)
               AS p2
      FROM (SELECT i AS t FROM idx UNION SELECT n FROM nn) t, idx m
      GROUP BY t.t
    ), tot AS (
      SELECT a.p AS p0, a.p2 AS p20, b.p AS pn, b.p2 AS p2n, nn.n
      FROM tp a, tp b, nn
      WHERE a.t = 0 AND b.t = nn.n
    ), g1 AS (
      SELECT tp.t,
             ((tot.p2n - tot.p20) - (tot.pn - tot.p0)
                * (tot.pn - tot.p0) / tot.n)
             - ((tp.p2 - tot.p20) - (tp.p - tot.p0)
                  * (tp.p - tot.p0) / tp.t)
             - ((tot.p2n - tp.p2) - (tot.pn - tp.p)
                  * (tot.pn - tp.p) / (tot.n - tp.t)) AS gain
      FROM tp, tot WHERE tp.t >= 1 AND tp.t <= tot.n - 1
    ), b1 AS (
      SELECT t AS t1, ROUND(gain, 4) AS gain1 FROM g1
      ORDER BY ROUND(gain, 4) DESC, t LIMIT 1
    ), s1 AS (
      SELECT b1.t1, b1.gain1, tp.p AS p1, tp.p2 AS p21
      FROM b1 JOIN tp ON tp.t = b1.t1
    ), g2 AS (
      SELECT tp.t,
             CASE WHEN tp.t < s1.t1 THEN
               ((s1.p21 - tot.p20) - (s1.p1 - tot.p0)
                  * (s1.p1 - tot.p0) / s1.t1)
               - ((tp.p2 - tot.p20) - (tp.p - tot.p0)
                    * (tp.p - tot.p0) / tp.t)
               - ((s1.p21 - tp.p2) - (s1.p1 - tp.p)
                    * (s1.p1 - tp.p) / (s1.t1 - tp.t))
             ELSE
               ((tot.p2n - s1.p21) - (tot.pn - s1.p1)
                  * (tot.pn - s1.p1) / (tot.n - s1.t1))
               - ((tp.p2 - s1.p21) - (tp.p - s1.p1)
                    * (tp.p - s1.p1) / (tp.t - s1.t1))
               - ((tot.p2n - tp.p2) - (tot.pn - tp.p)
                    * (tot.pn - tp.p) / (tot.n - tp.t))
             END AS gain
      FROM tp, tot, s1
      WHERE tp.t >= 1 AND tp.t <= tot.n - 1 AND tp.t <> s1.t1
    ), b2 AS (
      SELECT t AS t2, ROUND(gain, 4) AS gain2 FROM g2
      ORDER BY ROUND(gain, 4) DESC, t LIMIT 1
    ), rows_ AS (
      SELECT 1 AS round, s1.t1 AS split_idx, s1.gain1 AS gain FROM s1
      UNION ALL
      SELECT 2, b2.t2, b2.gain2 FROM b2
    )
    SELECT r.round,
           CAST(r.split_idx AS INT) AS split_idx,
           i.d AS split_day,
           ROUND(r.gain / 10000.0, 4) AS gain_sse,
           CAST(nn.n AS INT) AS n_days
    FROM rows_ r JOIN idx i ON i.i = r.split_idx, nn
    ORDER BY r.round
""")
def ts_binseg_changepoints(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Binary-segmentation changepoint detection (Scott-Knott /
    Vostrikova) on daily purchase revenue: round 1 finds the split
    minimizing total within-segment SSE; round 2 re-splits whichever
    side yields the larger further reduction — the multi-changepoint
    upgrade of ts_cusum_changepoint's single-shift alarm, and the
    standard first pass before fitting per-regime forecast models.
    Gains are reported in revenue^2 units (SSE reduction).

    Plan: the data-sized stage is ONE day-grain partial agg (exact
    integer cents); everything after runs on the <= n_days+1 prefix
    frame via triangular joins — prefix sums, candidate gains and
    both argmax selections are bounded by the day grid at ANY corpus
    size, no unpartitioned window anywhere. Cents cast to double
    before squaring (day-sum squares overflow BIGINT); every SSE is
    the same closed-form expression tree on both engines, and gains
    round at 4 dp before each argmax so split selection can't flip
    on an ulp. Exhaustive O(n^2) Python reference in tests."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.filter(F.col("event_type") == "purchase")
             .groupBy(F.col("ts").cast("date").alias("d"))
             .agg(F.round(F.sum("value") * 100).cast("bigint")
                  .alias("vc"))
             .persist())
    a = daily.alias("a")
    b = daily.alias("b")
    idx = (a.join(b, F.col("b.d") < F.col("a.d"), "left")
           .groupBy(F.col("a.d").alias("d"), F.col("a.vc").alias("vc"))
           .agg(F.count(F.col("b.d")).alias("i"))
           .persist())
    nn = daily.agg(F.count(F.lit(1)).alias("n"))
    tpts = (idx.select(F.col("i").alias("t"))
            .unionByName(nn.select(F.col("n").alias("t"))))
    m = idx.select(F.col("i").alias("mi"),
                   F.col("vc").cast("double").alias("mv"))
    tp = (tpts.crossJoin(m)
          .groupBy("t")
          .agg(F.coalesce(F.sum(F.when(F.col("mi") < F.col("t"),
                                       F.col("mv"))), F.lit(0.0))
               .alias("p"),
               F.coalesce(F.sum(F.when(F.col("mi") < F.col("t"),
                                       F.col("mv") * F.col("mv"))),
                          F.lit(0.0)).alias("p2"))
          .persist())
    tot = (tp.filter(F.col("t") == 0)
           .select(F.col("p").alias("p0"), F.col("p2").alias("p20"))
           .crossJoin(nn.join(tp, tp.t == nn.n)
                      .select(F.col("p").alias("pn"),
                              F.col("p2").alias("p2n"), "n")))

    def sse(pa, p2a, pb, p2b, ln):
        return (p2b - p2a) - (pb - pa) * (pb - pa) / ln

    g1 = (tp.crossJoin(F.broadcast(tot))
          .filter((F.col("t") >= 1) & (F.col("t") <= F.col("n") - 1))
          .select("t", (sse(F.col("p0"), F.col("p20"), F.col("pn"),
                            F.col("p2n"), F.col("n"))
                        - sse(F.col("p0"), F.col("p20"), F.col("p"),
                              F.col("p2"), F.col("t"))
                        - sse(F.col("p"), F.col("p2"), F.col("pn"),
                              F.col("p2n"), F.col("n") - F.col("t")))
                  .alias("gain")))
    b1 = (g1.select(F.col("t").alias("t1"),
                    F.round("gain", 4).alias("gain1"))
          .orderBy(F.desc("gain1"), "t1").limit(1))
    s1 = (F.broadcast(b1).join(tp, tp.t == b1.t1)
          .select("t1", "gain1", F.col("p").alias("p1"),
                  F.col("p2").alias("p21")))
    g2_base = (tp.crossJoin(F.broadcast(tot))
               .crossJoin(F.broadcast(s1))
               .filter((F.col("t") >= 1) & (F.col("t") <= F.col("n") - 1)
                       & (F.col("t") != F.col("t1"))))
    left_gain = (sse(F.col("p0"), F.col("p20"), F.col("p1"),
                     F.col("p21"), F.col("t1"))
                 - sse(F.col("p0"), F.col("p20"), F.col("p"),
                       F.col("p2"), F.col("t"))
                 - sse(F.col("p"), F.col("p2"), F.col("p1"),
                       F.col("p21"), F.col("t1") - F.col("t")))
    right_gain = (sse(F.col("p1"), F.col("p21"), F.col("pn"),
                      F.col("p2n"), F.col("n") - F.col("t1"))
                  - sse(F.col("p1"), F.col("p21"), F.col("p"),
                        F.col("p2"), F.col("t") - F.col("t1"))
                  - sse(F.col("p"), F.col("p2"), F.col("pn"),
                        F.col("p2n"), F.col("n") - F.col("t")))
    g2 = g2_base.select(
        "t", F.when(F.col("t") < F.col("t1"), left_gain)
        .otherwise(right_gain).alias("gain"))
    b2 = (g2.select(F.col("t").alias("t2"),
                    F.round("gain", 4).alias("gain2"))
          .orderBy(F.desc("gain2"), "t2").limit(1))
    r1 = s1.select(F.lit(1).alias("round"),
                   F.col("t1").alias("split_idx"),
                   F.col("gain1").alias("gain"))
    r2 = b2.select(F.lit(2).alias("round"),
                   F.col("t2").alias("split_idx"),
                   F.col("gain2").alias("gain"))
    out = r1.unionByName(r2)
    return (out.join(F.broadcast(idx), idx.i == out.split_idx)
            .crossJoin(F.broadcast(nn))
            .select("round",
                    F.col("split_idx").cast("int").alias("split_idx"),
                    F.col("d").alias("split_day"),
                    F.round(F.col("gain") / 10000.0, 4)
                    .alias("gain_sse"),
                    F.col("n").cast("int").alias("n_days"))
            .orderBy("round"))


# ----------------------------------- two-way fixed-effects panel


@query("stats_twoway_fixed_effects", sql="""
    WITH panel AS (
      SELECT event_type AS i, CAST(ts AS DATE) AS t,
             ROUND(SUM(value), 2) AS y,
             COUNT(*) AS x
      FROM events GROUP BY 1, 2
    ), mi AS (
      SELECT i, AVG(y) AS yi, AVG(x * 1.0) AS xi FROM panel GROUP BY 1
    ), mt AS (
      SELECT t, AVG(y) AS yt, AVG(x * 1.0) AS xt FROM panel GROUP BY 1
    ), mg AS (
      SELECT AVG(y) AS yg, AVG(x * 1.0) AS xg,
             COUNT(*) AS n,
             COUNT(DISTINCT i) AS ni, COUNT(DISTINCT t) AS nt
      FROM panel
    ), dm AS (
      SELECT p.y - mi.yi - mt.yt + mg.yg AS yd,
             p.x - mi.xi - mt.xt + mg.xg AS xd,
             mg.n, mg.ni, mg.nt
      FROM panel p
      JOIN mi ON mi.i = p.i JOIN mt ON mt.t = p.t, mg
    ), fit AS (
      SELECT SUM(xd * yd) / SUM(xd * xd) AS b,
             SUM(xd * xd) AS sxx, SUM(yd * yd) AS syy,
             MAX(n) AS n, MAX(ni) AS ni, MAX(nt) AS nt
      FROM dm
    )
    SELECT CAST(n AS BIGINT) AS n_obs,
           CAST(ni AS INT) AS n_types,
           CAST(nt AS INT) AS n_days,
           ROUND(b, 6) AS slope,
           ROUND(SQRT((syy - b * b * sxx)
                      / (n - ni - nt + 1) / sxx), 6) AS se,
           ROUND(b / SQRT((syy - b * b * sxx)
                          / (n - ni - nt + 1) / sxx), 4) AS t_stat,
           ROUND(b * b * sxx / syy, 6) AS r2_within
    FROM fit
""")
def stats_twoway_fixed_effects(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Two-way fixed-effects panel regression (the econometrics
    workhorse): daily revenue on daily volume per event type with
    BOTH type and day fixed effects absorbed by the within
    transformation y - y̅_i - y̅_t + y̅ — the estimator that answers
    "does more traffic cause more revenue" net of each type's level
    and each day's shock, with the correctly-degreed SE
    (df = N - n_i - n_t + 1) and within-R². The quasi-experimental
    sibling of ab_test_diff_in_diff (TWFE generalizes 2x2 DiD).

    Plan: ONE data-grain partial agg collapses events to the
    (type, day) panel — bounded by |types| x |days| at ANY corpus
    size; both fixed-effect mean frames, the demeaning joins and
    the OLS moments all run on that calendar-bounded frame (panel
    y pre-rounded to cents so demeaned algebra starts from
    identical values on both engines). statsmodels-free Python
    within-estimator parity in tests."""
    ev = load_table(spark, sf_dir, "events")
    panel = (ev.groupBy(F.col("event_type").alias("i"),
                        F.col("ts").cast("date").alias("t"))
             .agg(F.round(F.sum("value"), 2).alias("y"),
                  F.count(F.lit(1)).alias("x"))
             .persist())
    mi = panel.groupBy("i").agg(F.avg("y").alias("yi"),
                                F.avg(F.col("x") * 1.0).alias("xi"))
    mt = panel.groupBy("t").agg(F.avg("y").alias("yt"),
                                F.avg(F.col("x") * 1.0).alias("xt"))
    mg = panel.agg(F.avg("y").alias("yg"),
                   F.avg(F.col("x") * 1.0).alias("xg"),
                   F.count(F.lit(1)).alias("n"),
                   F.countDistinct("i").alias("ni"),
                   F.countDistinct("t").alias("nt"))
    dm = (panel.join(F.broadcast(mi), "i")
          .join(F.broadcast(mt), "t")
          .crossJoin(F.broadcast(mg))
          .select((F.col("y") - F.col("yi") - F.col("yt")
                   + F.col("yg")).alias("yd"),
                  (F.col("x") - F.col("xi") - F.col("xt")
                   + F.col("xg")).alias("xd"),
                  "n", "ni", "nt"))
    fit = dm.agg((F.sum(F.col("xd") * F.col("yd"))
                  / F.sum(F.col("xd") * F.col("xd"))).alias("b"),
                 F.sum(F.col("xd") * F.col("xd")).alias("sxx"),
                 F.sum(F.col("yd") * F.col("yd")).alias("syy"),
                 F.max("n").alias("n"), F.max("ni").alias("ni"),
                 F.max("nt").alias("nt"))
    df_ = F.col("n") - F.col("ni") - F.col("nt") + 1
    se = F.sqrt((F.col("syy") - F.col("b") * F.col("b") * F.col("sxx"))
                / df_ / F.col("sxx"))
    return fit.select(
        F.col("n").cast("bigint").alias("n_obs"),
        F.col("ni").cast("int").alias("n_types"),
        F.col("nt").cast("int").alias("n_days"),
        F.round("b", 6).alias("slope"),
        F.round(se, 6).alias("se"),
        F.round(F.col("b") / se, 4).alias("t_stat"),
        F.round(F.col("b") * F.col("b") * F.col("sxx")
                / F.col("syy"), 6).alias("r2_within"))


# -------------------------------------- Markov stationary distribution

_STAT_ITERS = 20


def _stationary_oracle_sql() -> str:
    base = """
    WITH seq AS MATERIALIZED (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ), tc AS MATERIALIZED (
      SELECT prev, event_type AS nxt, COUNT(*) AS n
      FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2
    ), praw AS MATERIALIZED (
      SELECT prev, nxt,
             n * 1.0 / SUM(n) OVER (PARTITION BY prev) AS pr
      FROM tc
    ), sinks AS MATERIALIZED (
      -- types observed only as a transition TARGET have no outgoing
      -- row; without a self-loop their inflow mass would vanish on
      -- the next iteration (round-7 ADVICE fix: conserve mass)
      SELECT DISTINCT nxt FROM tc
      WHERE nxt NOT IN (SELECT prev FROM tc)
    ), p AS MATERIALIZED (
      SELECT prev, nxt, pr FROM praw
      UNION ALL
      SELECT nxt AS prev, nxt, 1.0 AS pr FROM sinks
    ), states AS (SELECT DISTINCT prev AS s FROM p),
    pi0 AS (
      SELECT s, 1.0 / (SELECT COUNT(*) FROM states) AS w FROM states
    )"""
    prev = "pi0"
    for it in range(1, _STAT_ITERS + 1):
        base += f""",
    pi{it} AS (
      SELECT p.nxt AS s, SUM(pi.w * p.pr) AS w
      FROM p JOIN {prev} pi ON pi.s = p.prev GROUP BY 1
    )"""
        prev = f"pi{it}"
    return base + f"""
    SELECT t.s AS event_type,
           ROUND(t.w, 6) AS stationary_prob,
           ROUND(e.emp, 6) AS empirical_share,
           ROUND(ABS(t.w - e.emp), 6) AS abs_gap
    FROM {prev} t
    JOIN (SELECT event_type, COUNT(*) * 1.0
                 / (SELECT COUNT(*) FROM events) AS emp
          FROM events GROUP BY 1) e ON e.event_type = t.s
    ORDER BY t.s"""


@query("events_markov_stationary", sql=_stationary_oracle_sql())
def events_markov_stationary(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Stationary distribution of the user-journey event-type Markov
    chain: {_STAT_ITERS} unrolled power-iteration steps of pi' = pi P
    on the row-normalized transition matrix, reported against each
    type's raw empirical share — where the chain settles vs where the
    traffic currently is, the gap being the "drift pressure" a
    product's flows exert on its mix (the long-run companion to
    events_transition_entropy's predictability number and
    events_attribution_markov's absorbing analysis).

    Plan: the data-sized stage is ONE lag-window pass (per-user
    partitioned) + the transition count agg; the chain then lives at
    |types|^2 grain — a schema-bounded MODEL at any corpus size, so
    the matrix is collected once and the {_STAT_ITERS} power steps run
    driver-side in float64 (the PQ-codebook / PCA-eigensolve
    precedent), replacing 20 per-iteration blocking checkpoint jobs
    with plain arithmetic; the DuckDB oracle replays the exact same
    {_STAT_ITERS} steps. Types observed only as a transition TARGET
    get a self-loop row (pr = 1) so inflow mass is conserved instead
    of silently dropping on the next iteration — the state set is
    prev UNION nxt and stationary_prob sums to 1 (round-7 ADVICE
    fix). Fixed-point convergence (pi P = pi) is pinned in tests via
    an independent eigen solve."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select("user_id", "event_type", "ts", "event_id",
                    F.lag("event_type").over(w).alias("prev"))
    tc = (seq.filter(F.col("prev").isNotNull())
          .groupBy("prev", F.col("event_type").alias("nxt"))
          .agg(F.count(F.lit(1)).alias("n"))
          .persist())
    wp = Window.partitionBy("prev")
    praw = tc.select("prev", "nxt",
                     (F.col("n") * 1.0 / F.sum("n").over(wp))
                     .alias("pr"))
    sinks = (tc.select("nxt").distinct()
             .join(tc.select(F.col("prev").alias("nxt")).distinct(),
                   "nxt", "left_anti"))
    p = praw.unionByName(
        sinks.select(F.col("nxt").alias("prev"), "nxt",
                     F.lit(1.0).alias("pr")))
    # The chain lives at |event-types|² grain — a MODEL, not data: the
    # type set is schema-bounded at any corpus size (the PQ-codebook /
    # PCA-eigensolve precedent, VERDICT_r12 task #2). Collect the
    # bounded matrix once and run the 20 power-iteration steps in
    # float64 on the driver instead of 20 blocking checkpoint jobs
    # (the previous form; round-12 measured a 20-round persist chain
    # hanging, so each round was an eager localCheckpoint — all 20 now
    # collapse into plain arithmetic). Op order per step is the same
    # w*pr multiply and per-nxt accumulation the distributed hash agg
    # ran; accumulation order within a step was never pinned by either
    # engine (Spark hash-agg partial merge vs DuckDB's scan order) —
    # the 6-dp rounded readout is what the oracle checks, as before.
    rows = sorted(p.collect(), key=lambda r: (r["nxt"], r["prev"]))
    states = sorted({r["prev"] for r in rows})
    w0 = 1.0 / len(states) if states else 0.0
    pi_d = {s: w0 for s in states}
    for _ in range(_STAT_ITERS):
        nxt_w = {s: 0.0 for s in states}
        for r in rows:
            nxt_w[r["nxt"]] = nxt_w[r["nxt"]] + pi_d[r["prev"]] * r["pr"]
        pi_d = nxt_w
    pi = spark.createDataFrame(
        [(s, pi_d[s]) for s in states], "s string, w double")
    tot = ev.agg(F.count(F.lit(1)).alias("nt"))
    emp = (ev.groupBy("event_type")
           .agg(F.count(F.lit(1)).alias("c"))
           .crossJoin(F.broadcast(tot))
           .select("event_type",
                   (F.col("c") * 1.0 / F.col("nt")).alias("emp")))
    return (emp.join(F.broadcast(pi), emp.event_type == pi.s)
            .select("event_type",
                    F.round("w", 6).alias("stationary_prob"),
                    F.round("emp", 6).alias("empirical_share"),
                    F.round(F.abs(F.col("w") - F.col("emp")), 6)
                    .alias("abs_gap"))
            .orderBy("event_type"))


# --------------------------------- simple exponential smoothing (SES)

_SES_ALPHA = 0.3


@query("ts_exponential_smoothing", sql=f"""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS y
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), idx AS (
      SELECT day, y, ROW_NUMBER() OVER (ORDER BY day) AS t
      FROM daily
    ), lvl AS (
      SELECT a.t, a.day, a.y,
             ROUND(SUM(CASE WHEN s.t = 1
                            THEN ROUND(POW(1 - {_SES_ALPHA}, a.t - 1), 8)
                            ELSE ROUND({_SES_ALPHA}
                                 * POW(1 - {_SES_ALPHA}, a.t - s.t), 8)
                        END * s.y), 6) AS level
      FROM idx a JOIN idx s ON s.t <= a.t
      GROUP BY a.t, a.day, a.y
    )
    SELECT strftime(c.day, '%Y-%m-%d') AS day,
           CAST(c.t AS INT) AS t,
           ROUND(c.y, 2) AS revenue,
           c.level,
           p.level AS forecast,
           ROUND(ABS(c.y - p.level), 6) AS abs_err
    FROM lvl c LEFT JOIN lvl p ON p.t = c.t - 1
    ORDER BY c.t
""")
def ts_exponential_smoothing(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Simple exponential smoothing (Brown/Holt) of daily purchase
    revenue with a one-step-ahead backtest: the recursion
    l_t = a*y_t + (1-a)*l_(t-1), l_1 = y_1 is unrolled into its CLOSED
    form l_t = (1-a)^(t-1) y_1 + a * sum (1-a)^(t-s) y_s — pure
    aggregation algebra, no sequential scan — and each day's forecast
    is the previous day's level, with the absolute error the backtest
    MAE aggregates over. The level-only EWMA baseline every demand
    forecast starts from (and the control-chart smoother behind
    EWMA monitoring).

    Plan: ONE data-grain stage (the per-day cents-exact revenue agg);
    the unrolled-recursion self-join runs at day grain — O(n_days^2)
    pairs, calendar-bounded at any data volume (a year is ~365 rows →
    133k pairs). Decay coefficients round at 8 dp before the weighted
    sum so both engines sum identical terms; levels round at 6 dp.
    The day-index window is calendar-bounded (declared WINDOW_OK).
    Recursion-vs-closed-form identity pinned in tests."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.where(F.col("event_type") == "purchase")
             .groupBy(F.date_trunc("day", "ts").alias("day"))
             .agg((F.sum(F.round(F.col("value") * 100).cast("bigint"))
                   / 100.0).alias("y")))
    idx = (daily.withColumn(
        "t", F.row_number().over(Window.orderBy("day")))
        .persist())
    a_, s_ = idx.alias("a"), idx.alias("s")
    alpha = _SES_ALPHA
    coef = F.when(F.col("s.t") == 1,
                  F.round(F.pow(F.lit(1 - alpha), F.col("a.t") - 1), 8)) \
        .otherwise(F.round(F.lit(alpha)
                           * F.pow(F.lit(1 - alpha),
                                   F.col("a.t") - F.col("s.t")), 8))
    lvl = (a_.join(F.broadcast(s_), F.col("s.t") <= F.col("a.t"))
           .groupBy(F.col("a.t").alias("t"), F.col("a.day").alias("day"),
                    F.col("a.y").alias("y"))
           .agg(F.round(F.sum(coef * F.col("s.y")), 6).alias("level"))
           .persist())
    prev = lvl.select((F.col("t") + 1).alias("t"),
                      F.col("level").alias("forecast"))
    return (lvl.join(F.broadcast(prev), "t", "left")
            .select(F.date_format("day", "yyyy-MM-dd").alias("day"),
                    F.col("t").cast("int").alias("t"),
                    F.round("y", 2).alias("revenue"),
                    "level", "forecast",
                    F.round(F.abs(F.col("y") - F.col("forecast")), 6)
                    .alias("abs_err"))
            .orderBy("t"))


# ------------------------------- day-of-week seasonal decomposition

@query("ts_dow_seasonality", sql="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day,
             EXTRACT(isodow FROM date_trunc('day', ts)) AS dow,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS y
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ), idx AS (
      SELECT day, dow, y, ROW_NUMBER() OVER (ORDER BY day) AS t,
             COUNT(*) OVER () AS n
      FROM daily
    ), tr AS (
      SELECT a.day, a.dow, a.y,
             CASE WHEN a.t >= 4 AND a.t <= a.n - 3
                  THEN ROUND(AVG(s.y), 6) END AS trend
      FROM idx a JOIN idx s ON s.t BETWEEN a.t - 3 AND a.t + 3
      GROUP BY a.day, a.dow, a.y, a.t, a.n
    ), det AS (
      SELECT dow, y - trend AS d FROM tr WHERE trend IS NOT NULL
    )
    SELECT CAST(dow AS INT) AS dow,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(AVG(d), 6) AS seasonal,
           ROUND(MIN(d), 6) AS min_detrended,
           ROUND(MAX(d), 6) AS max_detrended
    FROM det GROUP BY dow ORDER BY dow
""")
def ts_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal profile by classical additive
    decomposition: daily purchase revenue minus its centered 7-day
    moving-average trend (full windows only, the textbook rule),
    averaged per ISO weekday — the seasonal index that says "how much
    of Monday is just Monday", prerequisite to any deseasonalized
    anomaly rule or weekday-adjusted target. Companion to
    ts_snaive_backtest (which exploits this structure) and
    events_wow_growth (which ignores it).

    Plan: ONE data-grain stage (per-day cents-exact revenue agg);
    the centered-MA join and the per-dow rollup run at day grain —
    calendar-bounded at any volume. The day-index window is
    calendar-bounded (declared WINDOW_OK); trend rounds at 6 dp so
    the detrended residuals match across engines."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.where(F.col("event_type") == "purchase")
             .groupBy(F.date_trunc("day", "ts").alias("day"))
             .agg((F.sum(F.round(F.col("value") * 100).cast("bigint"))
                   / 100.0).alias("y"))
             .withColumn("dow", F.weekday("day") + 1))
    idx = (daily.withColumn(
        "t", F.row_number().over(Window.orderBy("day")))
        .withColumn("n", F.count(F.lit(1)).over(
            Window.partitionBy(F.lit(1))))
        .persist())
    a_, s_ = idx.alias("a"), idx.alias("s")
    tr = (a_.join(F.broadcast(s_),
                  (F.col("s.t") >= F.col("a.t") - 3)
                  & (F.col("s.t") <= F.col("a.t") + 3))
          .groupBy(F.col("a.day").alias("day"),
                   F.col("a.dow").alias("dow"),
                   F.col("a.y").alias("y"),
                   F.col("a.t").alias("t"), F.col("a.n").alias("n"))
          .agg(F.round(F.avg("s.y"), 6).alias("ma"))
          .select("dow", "y",
                  F.when((F.col("t") >= 4) & (F.col("t") <= F.col("n") - 3),
                         F.col("ma")).alias("trend")))
    det = tr.where(F.col("trend").isNotNull()) \
        .select("dow", (F.col("y") - F.col("trend")).alias("d"))
    return (det.groupBy("dow")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_days"),
                 F.round(F.avg("d"), 6).alias("seasonal"),
                 F.round(F.min("d"), 6).alias("min_detrended"),
                 F.round(F.max("d"), 6).alias("max_detrended"))
            .select(F.col("dow").cast("int").alias("dow"),
                    "n_days", "seasonal", "min_detrended",
                    "max_detrended")
            .orderBy("dow"))


# ------------------------------------------ Kendall tau-b (daily)

@query("ts_kendall_tau", sql="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS p,
             SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v
      FROM events GROUP BY 1
    ), pairs AS (
      SELECT CASE WHEN (a.p - b.p) * (a.v - b.v) > 0 THEN 1 ELSE 0 END
               AS conc,
             CASE WHEN (a.p - b.p) * (a.v - b.v) < 0 THEN 1 ELSE 0 END
               AS disc,
             CASE WHEN a.p = b.p AND a.v <> b.v THEN 1 ELSE 0 END AS tx,
             CASE WHEN a.v = b.v AND a.p <> b.p THEN 1 ELSE 0 END AS ty
      FROM daily a JOIN daily b ON a.day < b.day
    )
    SELECT CAST((SELECT COUNT(*) FROM daily) AS BIGINT) AS n_days,
           CAST(SUM(conc) AS BIGINT) AS n_concordant,
           CAST(SUM(disc) AS BIGINT) AS n_discordant,
           CAST(SUM(tx) AS BIGINT) AS n_ties_x,
           CAST(SUM(ty) AS BIGINT) AS n_ties_y,
           ROUND((SUM(conc) - SUM(disc))
                 / SQRT((SUM(conc) + SUM(disc) + SUM(tx)) * 1e0
                        * (SUM(conc) + SUM(disc) + SUM(ty))), 6)
             AS tau_b
    FROM pairs
""")
def ts_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation between daily purchase and view
    counts — the tie-corrected, outlier-immune monotone-association
    test (Kendall 1938): concordant minus discordant day pairs over
    the tie-adjusted pair count. The rank-based companion to
    stats_mutual_information (association without monotonicity) and
    ts_theilsen_trend (whose estimator is Kendall's dual); preferred
    over Pearson when heavy days would dominate moments.

    Plan: ONE data-grain stage (the per-day conditional counts,
    map-side combined); the exact pairwise comparison is a day-grain
    self-join — O(n_days^2) integer sign tests, calendar-bounded at
    any data volume. All counts are exact integers, so tau_b is a
    single deterministic expression on both engines."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.groupBy(F.date_trunc("day", "ts").alias("day"))
             .agg(F.sum(F.when(F.col("event_type") == "purchase", 1)
                        .otherwise(0)).alias("p"),
                  F.sum(F.when(F.col("event_type") == "view", 1)
                        .otherwise(0)).alias("v"))
             .persist())
    a_, b_ = daily.alias("a"), daily.alias("b")
    dp = F.col("a.p") - F.col("b.p")
    dv = F.col("a.v") - F.col("b.v")
    pairs = (a_.join(F.broadcast(b_), F.col("a.day") < F.col("b.day"))
             .select((dp * dv > 0).cast("int").alias("conc"),
                     (dp * dv < 0).cast("int").alias("disc"),
                     ((dp == 0) & (dv != 0)).cast("int").alias("tx"),
                     ((dv == 0) & (dp != 0)).cast("int").alias("ty")))
    n = daily.agg(F.count(F.lit(1)).alias("n_days"))
    return (pairs.agg(F.sum("conc").alias("c"), F.sum("disc").alias("d"),
                      F.sum("tx").alias("tx"), F.sum("ty").alias("ty"))
            .crossJoin(F.broadcast(n))
            .select(F.col("n_days").cast("bigint").alias("n_days"),
                    F.col("c").cast("bigint").alias("n_concordant"),
                    F.col("d").cast("bigint").alias("n_discordant"),
                    F.col("tx").cast("bigint").alias("n_ties_x"),
                    F.col("ty").cast("bigint").alias("n_ties_y"),
                    F.round((F.col("c") - F.col("d"))
                            / F.sqrt((F.col("c") + F.col("d") + F.col("tx"))
                                     * F.lit(1.0)
                                     * (F.col("c") + F.col("d")
                                        + F.col("ty"))), 6)
                    .alias("tau_b")))


# --------------------------------------- Spearman rho (daily, exact)

@query("ts_spearman_daily", sql="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day,
             SUM(CASE WHEN event_type = 'purchase'
                      THEN CAST(ROUND(value * 100) AS BIGINT)
                      ELSE 0 END) AS cents,
             COUNT(DISTINCT user_id) AS users
      FROM events GROUP BY 1
    ), ranked AS (
      SELECT a.day,
             (SELECT COUNT(*) FROM daily b
              WHERE (b.cents, b.day) < (a.cents, a.day)) + 1 AS rx,
             (SELECT COUNT(*) FROM daily b
              WHERE (b.users, b.day) < (a.users, a.day)) + 1 AS ry
      FROM daily a
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(1 - 6.0 * SUM(POW(rx - ry, 2))
                 / (COUNT(*) * (POW(COUNT(*), 2) - 1)), 6)
             AS spearman_rho
    FROM ranked
""")
def ts_spearman_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Spearman rank correlation between daily purchase revenue
    and daily distinct active users — the monotone-association
    companion to ts_kendall_tau on the same calendar frame (Spearman
    weights the rank displacement, Kendall counts inversions); the
    fast screen for "does engagement move revenue" before any model.
    Ranks break ties deterministically by day (lexicographic on
    (value, day) — the same rule on both engines), so rho is the
    classic 1 - 6*sum(d^2)/(n(n^2-1)) on distinct ranks.

    Plan: ONE data-grain stage (the per-day cents + distinct-user
    agg); ranks come from a day-grain triangular self-join count —
    O(n_days^2) integer comparisons, calendar-bounded, NO window
    anywhere (not even a declared-bounded one)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.groupBy(F.date_trunc("day", "ts").alias("day"))
             .agg(F.sum(F.when(F.col("event_type") == "purchase",
                               F.round(F.col("value") * 100)
                               .cast("bigint")).otherwise(0))
                  .alias("cents"),
                  F.countDistinct("user_id").alias("users"))
             .persist())
    a_, b_ = daily.alias("a"), daily.alias("b")
    lt = lambda col: (  # noqa: E731
        (F.col(f"b.{col}") < F.col(f"a.{col}"))
        | ((F.col(f"b.{col}") == F.col(f"a.{col}"))
           & (F.col("b.day") < F.col("a.day")))).cast("int")
    ranked = (a_.join(F.broadcast(b_), F.lit(True))
              .groupBy(F.col("a.day").alias("day"))
              .agg((F.sum(lt("cents")) + 1).alias("rx"),
                   (F.sum(lt("users")) + 1).alias("ry")))
    n = F.count(F.lit(1))
    return ranked.agg(
        n.cast("bigint").alias("n_days"),
        F.round(1 - 6.0 * F.sum(F.pow(F.col("rx") - F.col("ry"), 2))
                / (n * (F.pow(n, 2) - 1)), 6).alias("spearman_rho"))


# -------------------------------------------- Ljung-Box portmanteau

_LB_MAX_LAG = 7
# chi-square 0.05 critical values for df = 1..7
_LB_CRIT = (3.841, 5.991, 7.815, 9.488, 11.070, 12.592, 14.067)


@query("ts_ljungbox_whiteness", sql=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS y
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), mom AS (
      SELECT AVG(y) AS mu, COUNT(*) AS n,
             SUM(POW(y - (SELECT AVG(y) FROM daily), 2)) AS s0
      FROM daily
    ), rk AS (
      SELECT g.k,
             ROUND(SUM((a.y - m.mu) * (b.y - m.mu)) / MAX(m.s0), 6)
               AS r
      FROM daily a
      CROSS JOIN range(1, {_LB_MAX_LAG + 1}) g(k)
      JOIN daily b ON b.d = a.d + CAST(g.k AS INT)
      CROSS JOIN mom m
      GROUP BY g.k
    ), q AS (
      SELECT rk.k, rk.r, m.n,
             SUM(rk.r * rk.r / (m.n - rk.k))
               OVER (ORDER BY rk.k) * m.n * (m.n + 2) AS qraw
      FROM rk CROSS JOIN mom m
    )
    SELECT CAST(k AS INT) AS lag,
           r AS acf,
           ROUND(qraw, 6) AS q_stat,
           CAST(k AS INT) AS df,
           ROUND(qraw, 6) > [{', '.join(str(c) for c in _LB_CRIT)}][k]
             AS reject_white_05
    FROM q ORDER BY lag
""")
def ts_ljungbox_whiteness(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau whiteness test on daily purchase
    revenue: the textbook ACF r_k = sum (y_t - mu)(y_(t+k) - mu) /
    sum (y - mu)^2 for lags 1..{_LB_MAX_LAG}, with the cumulative
    Q(K) = n(n+2) sum r_k^2/(n-k) against the chi-square(K) 0.05
    critical value per lag — "is there ANY autocorrelation left",
    the residual-diagnostic gate every fitted forecaster
    (ts_snaive_backtest, ts_exponential_smoothing) should pass
    before its intervals are believed. Completes the ACF family:
    ts_autocorr_daily reads the correlogram, this tests it.

    Plan: ONE data-grain stage (per-day cents agg); the lag products
    come from the same calendar-join-against-a-lag-grid shape as
    ts_autocorr_daily — day-grain rows only; r_k rounds at 6 dp
    before squaring so Q is identical across engines. The cumulative
    Q window runs over {_LB_MAX_LAG} lag rows (declared bounded)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.where(F.col("event_type") == "purchase")
             .groupBy(F.date_trunc("day", "ts").cast("date").alias("d"))
             .agg((F.sum(F.round(F.col("value") * 100).cast("bigint"))
                   / 100.0).alias("y"))
             .persist())
    mom = daily.agg(F.avg("y").alias("mu"),
                    F.count(F.lit(1)).alias("n"))
    s0 = (daily.crossJoin(F.broadcast(mom))
          .agg(F.sum(F.pow(F.col("y") - F.col("mu"), 2)).alias("s0"),
               F.max("mu").alias("mu"), F.max("n").alias("n")))
    ks = spark.range(1, _LB_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("k"))
    a_, b_ = daily.alias("a"), daily.alias("b")
    rk = (a_.crossJoin(F.broadcast(ks))
          .join(b_, F.col("b.d") == F.expr("date_add(a.d, k)"))
          .crossJoin(F.broadcast(s0))
          .groupBy("k")
          .agg(F.round(F.sum((F.col("a.y") - F.col("mu"))
                             * (F.col("b.y") - F.col("mu")))
                       / F.max("s0"), 6).alias("r"),
               F.max("n").alias("n")))
    qw = (Window.orderBy("k")
          .rowsBetween(Window.unboundedPreceding, 0))
    crit = F.array(*[F.lit(c) for c in _LB_CRIT])
    q = (rk.withColumn(
        "qraw", F.sum(F.col("r") * F.col("r")
                      / (F.col("n") - F.col("k"))).over(qw)
        * F.col("n") * (F.col("n") + 2)))
    return (q.select(F.col("k").cast("int").alias("lag"),
                     F.col("r").alias("acf"),
                     F.round("qraw", 6).alias("q_stat"),
                     F.col("k").cast("int").alias("df"),
                     (F.round("qraw", 6)
                      > F.element_at(crit, F.col("k")))
                     .alias("reject_white_05"))
            .orderBy("lag"))


# ------------------------------------------ Wald-Wolfowitz runs test

@query("ts_runs_test", sql="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS y
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), med AS (
      SELECT quantile_cont(CAST(y AS DOUBLE), 0.5) AS m FROM daily
    ), signed AS (
      SELECT d, CASE WHEN y > m THEN 1 ELSE 0 END AS s
      FROM daily, med WHERE y <> m
    ), runs AS (
      SELECT s,
             CASE WHEN LAG(s) OVER (ORDER BY d) IS NULL
                  OR LAG(s) OVER (ORDER BY d) <> s
                  THEN 1 ELSE 0 END AS new_run
      FROM signed
    ), agg AS (
      SELECT SUM(new_run) AS r,
             SUM(s) AS n1, SUM(1 - s) AS n2
      FROM runs
    )
    SELECT CAST(r AS BIGINT) AS n_runs,
           CAST(n1 AS BIGINT) AS n_above,
           CAST(n2 AS BIGINT) AS n_below,
           ROUND(2.0 * n1 * n2 / (n1 + n2) + 1, 6) AS expected_runs,
           ROUND((r - (2.0 * n1 * n2 / (n1 + n2) + 1))
                 / SQRT(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                        / (POW(n1 + n2, 2) * (n1 + n2 - 1))), 6)
             AS z_stat,
           ABS((r - (2.0 * n1 * n2 / (n1 + n2) + 1))
               / SQRT(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                      / (POW(n1 + n2, 2) * (n1 + n2 - 1)))) > 1.959964
             AS reject_random_05
    FROM agg
""")
def ts_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test for randomness of daily purchase
    revenue around its median: count maximal runs of above/below-
    median days (median-equal days excluded, the standard rule) and
    compare to the exact null mean 2*n1*n2/(n1+n2) + 1 with the
    normal approximation z — too FEW runs means trending/clustering,
    too MANY means oscillation; the assumption check behind
    "iid residuals" claims, complementing ts_ljungbox_whiteness
    (linear correlation) with a sign-pattern test.

    Plan: ONE data-grain stage (per-day cents agg); the median runs
    over the calendar-bounded day frame (the declared bounded-grain
    percentile class — the 64-replica bootstrap precedent), and the
    run-boundary lag window is over the same bounded day rows
    (declared WINDOW_OK). Exact integers into one closed-form row;
    the decision derives from the reported z."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.where(F.col("event_type") == "purchase")
             .groupBy(F.date_trunc("day", "ts").cast("date").alias("d"))
             .agg((F.sum(F.round(F.col("value") * 100).cast("bigint"))
                   / 100.0).alias("y"))
             .persist())
    med = daily.agg(F.percentile("y", 0.5).alias("m"))
    signed = (daily.crossJoin(F.broadcast(med))
              .where(F.col("y") != F.col("m"))
              .select("d", (F.col("y") > F.col("m")).cast("int")
                      .alias("s")))
    lag_s = F.lag("s").over(Window.orderBy("d"))
    runs = signed.select(
        "s", F.when(lag_s.isNull() | (lag_s != F.col("s")), 1)
        .otherwise(0).alias("new_run"))
    agg = runs.agg(F.sum("new_run").alias("r"),
                   F.sum("s").alias("n1"),
                   F.sum(1 - F.col("s")).alias("n2"))
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    mu = 2.0 * n1 * n2 / (n1 + n2) + 1
    sd = F.sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                / (F.pow(n1 + n2, 2) * (n1 + n2 - 1)))
    z = (r - mu) / sd
    return agg.select(
        r.cast("bigint").alias("n_runs"),
        n1.cast("bigint").alias("n_above"),
        n2.cast("bigint").alias("n_below"),
        F.round(mu, 6).alias("expected_runs"),
        F.round(z, 6).alias("z_stat"),
        (F.abs(z) > 1.959964).alias("reject_random_05"))


@query("ts_mann_kendall_trend", sql="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS xc
      FROM events GROUP BY 1, 2
    ), s AS (
      SELECT a.event_type,
             CAST(SUM(CASE WHEN b.xc > a.xc THEN 1
                           WHEN b.xc < a.xc THEN -1
                           ELSE 0 END) AS BIGINT) AS s_stat
      FROM daily a JOIN daily b
        ON b.event_type = a.event_type AND b.d > a.d
      GROUP BY 1
    ), n AS (
      SELECT event_type, COUNT(*) AS nd FROM daily GROUP BY 1
    ), ties AS (
      SELECT event_type,
             CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0)
                  AS BIGINT) AS tie_term
      FROM (SELECT event_type, xc, COUNT(*) AS t
            FROM daily GROUP BY 1, 2) g
      WHERE t > 1
      GROUP BY 1
    ), v AS (
      SELECT n.event_type, n.nd, s.s_stat,
             (CAST(n.nd AS DOUBLE) * (n.nd - 1) * (2 * n.nd + 5)
              - COALESCE(t.tie_term, 0)) / 18.0 AS var_s
      FROM n JOIN s ON s.event_type = n.event_type
      LEFT JOIN ties t ON t.event_type = n.event_type
    )
    SELECT event_type,
           CAST(nd AS INT) AS n_days,
           s_stat,
           ROUND(var_s, 4) AS var_s,
           ROUND(CASE WHEN s_stat > 0
                        THEN (s_stat - 1) / SQRT(var_s)
                      WHEN s_stat < 0
                        THEN (s_stat + 1) / SQRT(var_s)
                      ELSE 0.0 END, 6) AS z,
           ABS(ROUND(CASE WHEN s_stat > 0
                            THEN (s_stat - 1) / SQRT(var_s)
                          WHEN s_stat < 0
                            THEN (s_stat + 1) / SQRT(var_s)
                          ELSE 0.0 END, 6)) > 1.959964
             AS reject_05
    FROM v ORDER BY event_type
""")
def ts_mann_kendall_trend(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test per event type over daily
    revenue — the nonparametric workhorse for "is this metric
    drifting?" (hydrology/monitoring standard; no linearity or
    normality assumed, robust to outliers): S = sum of
    sign(x_j - x_i) over all ordered day pairs, variance with the
    standard tie correction sum t(t-1)(2t+5), and the
    continuity-corrected z against the two-sided 95% critical value
    1.959964. Complements ts_theil_sen-style slope fits (direction +
    significance, not magnitude) and the CUSUM/binseg changepoint
    family (global trend, not level shifts).

    Determinism: day totals are EXACT integer cents so every
    sign() is exact (a double tie would be fp-fragile — ties are
    common in low-volume types); S and the tie term are exact
    integers; z is one deterministic expression of them. Scale: ONE
    data-grain map-side-combined (type, day) rollup; the pairwise
    self-join is day-grain (|days|^2 per type, calendar-bounded —
    365 days = 66k pairs, metadata next to any corpus), the same
    bounded-frame class as ts_binseg/ts_motif."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type", F.to_date("ts").alias("d"))
             .agg(F.sum(F.round(F.col("value") * 100).cast("bigint"))
                  .alias("xc"))
             .persist())
    b = daily.select(F.col("event_type").alias("bt"),
                     F.col("d").alias("bd"), F.col("xc").alias("bx"))
    s = (daily.join(b, (F.col("bt") == F.col("event_type"))
                    & (F.col("bd") > F.col("d")))
         .groupBy("event_type")
         .agg(F.sum(F.when(F.col("bx") > F.col("xc"), 1)
                    .when(F.col("bx") < F.col("xc"), -1)
                    .otherwise(0)).cast("bigint").alias("s_stat")))
    n = daily.groupBy("event_type").agg(F.count(F.lit(1)).alias("nd"))
    ties = (daily.groupBy("event_type", "xc")
            .agg(F.count(F.lit(1)).alias("t"))
            .where(F.col("t") > 1)
            .groupBy("event_type")
            .agg(F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1)
                      * (2 * F.col("t") + 5)), F.lit(0))
                .cast("bigint").alias("tie_term")))
    v = (n.join(s, "event_type")
         .join(ties, "event_type", "left")
         .select("event_type", "nd", "s_stat",
                 ((F.col("nd").cast("double") * (F.col("nd") - 1)
                   * (2 * F.col("nd") + 5)
                   - F.coalesce(F.col("tie_term"), F.lit(0))) / 18.0)
                 .alias("var_s")))
    z = (F.when(F.col("s_stat") > 0,
                (F.col("s_stat") - 1) / F.sqrt(F.col("var_s")))
         .when(F.col("s_stat") < 0,
               (F.col("s_stat") + 1) / F.sqrt(F.col("var_s")))
         .otherwise(0.0))
    return (v.select("event_type",
                     F.col("nd").cast("int").alias("n_days"),
                     "s_stat",
                     F.round("var_s", 4).alias("var_s"),
                     F.round(z, 6).alias("z"),
                     (F.abs(F.round(z, 6)) > 1.959964)
                     .alias("reject_05"))
            .orderBy("event_type"))


# ------------------------- Brown's double (linear) smoothing backtest

_DES_ALPHA = 0.3


@query("ts_brown_double_smoothing", sql=f"""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS y
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), idx AS (
      SELECT day, y, ROW_NUMBER() OVER (ORDER BY day) AS t
      FROM daily
    ), l1 AS (
      SELECT a.t, a.day, a.y,
             ROUND(SUM(CASE WHEN s.t = 1
                            THEN ROUND(POW(1 - {_DES_ALPHA}, a.t - 1), 8)
                            ELSE ROUND({_DES_ALPHA}
                                 * POW(1 - {_DES_ALPHA}, a.t - s.t), 8)
                        END * s.y), 6) AS lvl1
      FROM idx a JOIN idx s ON s.t <= a.t
      GROUP BY a.t, a.day, a.y
    ), l2 AS (
      SELECT a.t, a.day, a.y, a.lvl1,
             ROUND(SUM(CASE WHEN s.t = 1
                            THEN ROUND(POW(1 - {_DES_ALPHA}, a.t - 1), 8)
                            ELSE ROUND({_DES_ALPHA}
                                 * POW(1 - {_DES_ALPHA}, a.t - s.t), 8)
                        END * s.lvl1), 6) AS lvl2
      FROM l1 a JOIN l1 s ON s.t <= a.t
      GROUP BY a.t, a.day, a.y, a.lvl1
    ), ab AS (
      SELECT t, day, y, lvl1, lvl2,
             ROUND(2 * lvl1 - lvl2, 6) AS a_t,
             ROUND({_DES_ALPHA} / (1 - {_DES_ALPHA})
                   * (lvl1 - lvl2), 6) AS b_t
      FROM l2
    )
    SELECT strftime(c.day, '%Y-%m-%d') AS day,
           CAST(c.t AS INT) AS t,
           ROUND(c.y, 2) AS revenue,
           c.lvl1, c.lvl2, c.a_t, c.b_t,
           ROUND(p.a_t + p.b_t, 6) AS forecast,
           ROUND(ABS(c.y - ROUND(p.a_t + p.b_t, 6)), 6) AS abs_err
    FROM ab c LEFT JOIN ab p ON p.t = c.t - 1
    ORDER BY c.t
""")
def ts_brown_double_smoothing(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Brown's double (linear) exponential smoothing of daily purchase
    revenue with a one-step-ahead backtest — the trend-aware upgrade
    of ts_exponential_smoothing: a second SES pass over the first
    pass's levels yields the local level a_t = 2*l1 - l2 and trend
    b_t = a/(1-a) * (l1 - l2), and tomorrow's forecast a_t + b_t
    tracks a drifting series SES permanently lags. Same recursion-to-
    closed-form trick applied twice: each smoothing is the unrolled
    weighted sum over the (rounded) inputs, so there is no sequential
    scan anywhere.

    Determinism: decay coefficients round at 8 dp and each
    smoothing's levels round at 6 dp BEFORE feeding the next stage,
    so both engines sum identical terms at every stage (the
    ts_exponential_smoothing contract, cascaded). Scale: ONE
    data-grain stage (the cents-exact daily rollup); both unrolled
    self-joins run at day grain — O(n_days^2) calendar-bounded pairs
    (a year = 133k), metadata next to any corpus. The day-index
    window is calendar-bounded (declared WINDOW_OK, same as SES);
    recursion-vs-closed-form identity pinned in tests."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.where(F.col("event_type") == "purchase")
             .groupBy(F.date_trunc("day", "ts").alias("day"))
             .agg((F.sum(F.round(F.col("value") * 100).cast("bigint"))
                   / 100.0).alias("y")))
    idx = (daily.withColumn(
        "t", F.row_number().over(Window.orderBy("day")))
        .persist())
    alpha = _DES_ALPHA

    def smooth(frame: DataFrame, src: str, out: str) -> DataFrame:
        a_, s_ = frame.alias("a"), frame.alias("s")
        coef = (F.when(F.col("s.t") == 1,
                       F.round(F.pow(F.lit(1 - alpha),
                                     F.col("a.t") - 1), 8))
                .otherwise(F.round(
                    F.lit(alpha) * F.pow(F.lit(1 - alpha),
                                         F.col("a.t") - F.col("s.t")),
                    8)))
        keep = [F.col(f"a.{c}").alias(c) for c in frame.columns]
        return (a_.join(F.broadcast(s_), F.col("s.t") <= F.col("a.t"))
                .groupBy(*keep)
                .agg(F.round(F.sum(coef * F.col(f"s.{src}")), 6)
                     .alias(out)))

    # two cascaded smoothings; persist between them so the second
    # pass consumes the ROUNDED first-pass levels once, not a
    # recomputed lineage (l1 feeds both sides of the second
    # self-join; a cached frame takes no checkpoint lock, so the
    # round-9 broadcast-race class cannot fire).
    l1 = smooth(idx, "y", "lvl1").persist()
    l2 = smooth(l1, "lvl1", "lvl2")
    ab = (l2.withColumn("a_t", F.round(2 * F.col("lvl1")
                                       - F.col("lvl2"), 6))
          .withColumn("b_t", F.round(F.lit(alpha / (1 - alpha))
                                     * (F.col("lvl1") - F.col("lvl2")),
                                     6))
          .persist())
    prev = ab.select((F.col("t") + 1).alias("t"),
                     F.round(F.col("a_t") + F.col("b_t"), 6)
                     .alias("forecast"))
    return (ab.join(F.broadcast(prev), "t", "left")
            .select(F.date_format("day", "yyyy-MM-dd").alias("day"),
                    F.col("t").cast("int").alias("t"),
                    F.round("y", 2).alias("revenue"),
                    "lvl1", "lvl2", "a_t", "b_t", "forecast",
                    F.round(F.abs(F.col("y") - F.col("forecast")), 6)
                    .alias("abs_err"))
            .orderBy("t"))


# ----------------------------------- Page-Hinkley mean-drift monitor


@query("ts_page_hinkley_drift", sql="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS d,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS xc
      FROM events GROUP BY 1, 2
    ), sig AS (
      SELECT event_type,
             COUNT(*) AS nd,
             SQRT((SUM(CAST(xc AS HUGEINT) * xc)
                   - SUM(xc) / (COUNT(*) * 1e0) * SUM(xc))
                  / (COUNT(*) * 1e0)) AS sigma
      FROM daily GROUP BY 1
    ), seq AS (
      SELECT event_type, d, xc,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY d) AS t,
             SUM(xc) OVER (PARTITION BY event_type ORDER BY d
                           ROWS UNBOUNDED PRECEDING) AS cum
      FROM daily
    ), term AS (
      SELECT event_type, d, t,
             xc - cum / (t * 1e0) AS dev
      FROM seq
    ), m AS (
      SELECT event_type, d, t,
             SUM(dev) OVER (PARTITION BY event_type ORDER BY t
                            ROWS UNBOUNDED PRECEDING) AS m_t
      FROM term
    ), ph AS (
      SELECT event_type, d, t, m_t,
             m_t - MIN(m_t) OVER (PARTITION BY event_type ORDER BY t
                                  ROWS UNBOUNDED PRECEDING) AS ph_up,
             MAX(m_t) OVER (PARTITION BY event_type ORDER BY t
                            ROWS UNBOUNDED PRECEDING) - m_t AS ph_dn
      FROM m
    ), flagged AS (
      SELECT p.event_type, p.d, p.t,
             p.ph_up / s.sigma AS up_n, p.ph_dn / s.sigma AS dn_n,
             s.nd, s.sigma
      FROM ph p JOIN sig s ON s.event_type = p.event_type
    )
    SELECT event_type,
           CAST(MAX(nd) AS INT) AS n_days,
           ROUND(MAX(sigma) / 100.0, 4) AS sigma_daily,
           ROUND(MAX(up_n), 6) AS ph_up_max,
           ROUND(MAX(dn_n), 6) AS ph_down_max,
           MAX(up_n) > 3.0 OR MAX(dn_n) > 3.0 AS drift_alarm,
           MIN(CASE WHEN up_n > 3.0 OR dn_n > 3.0
                    THEN strftime(d, '%Y-%m-%d') END) AS first_alarm_day
    FROM flagged GROUP BY event_type ORDER BY event_type
""")
def ts_page_hinkley_drift(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """Page-Hinkley mean-drift monitor on daily value totals per event
    type — the classic sequential change detector (the streaming
    cousin of CUSUM that ML-monitoring stacks run on model inputs and
    conversion rates): m_t = sum of deviations from the RUNNING mean,
    and an alarm when m_t leaves its historical min (upward drift) or
    max (downward drift) by more than lambda = 3 standard deviations
    of the daily series. Reports both one-sided maxima normalized by
    sigma, the alarm flag, and the first alarm day — complements
    ts_cusum_changepoint (fixed reference mean) by tracking the
    running mean, which is what you deploy when the baseline itself
    is unknown upfront.

    Determinism: day totals are EXACT integer cents; the running-mean
    prefix sums are exact integers, so each deviation is an identical
    double on both engines; the m_t prefix sum and its running
    min/max accumulate over the SAME day order on both engines
    (sequential IEEE sums agree bit-for-bit), and outputs round at
    6 dp. Sigma is population SD from exact integer moments (second
    moment in 128-bit). Scale: ONE data-grain map-side-combined
    (type, day) rollup; every window is PARTITIONED by event_type
    over day-grain rows — calendar-bounded frames, no global window,
    no data-sized state."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type",
                        F.date_trunc("day", "ts").alias("d"))
             .agg(F.sum(F.round(F.col("value") * 100).cast("bigint"))
                  .alias("xc"))
             .persist())
    sig = (daily.groupBy("event_type")
           .agg(F.count(F.lit(1)).alias("nd"),
                F.sqrt((F.sum(F.col("xc").cast("decimal(38,0)")
                              * F.col("xc")).cast("double")
                        - F.sum("xc") / (F.count(F.lit(1)) * F.lit(1.0))
                        * F.sum("xc"))
                       / (F.count(F.lit(1)) * F.lit(1.0)))
                .alias("sigma")))
    w = Window.partitionBy("event_type").orderBy("d")
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wt = (Window.partitionBy("event_type").orderBy("t")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    seq = (daily.withColumn("t", F.row_number().over(w))
           .withColumn("cum", F.sum("xc").over(wr)))
    term = seq.withColumn(
        "dev", F.col("xc") - F.col("cum") / (F.col("t") * F.lit(1.0)))
    m = term.withColumn("m_t", F.sum("dev").over(wt))
    ph = (m.withColumn("ph_up", F.col("m_t") - F.min("m_t").over(wt))
          .withColumn("ph_dn", F.max("m_t").over(wt) - F.col("m_t")))
    flagged = (ph.join(sig, "event_type")
               .select("event_type", "d", "nd", "sigma",
                       (F.col("ph_up") / F.col("sigma")).alias("up_n"),
                       (F.col("ph_dn") / F.col("sigma")).alias("dn_n")))
    alarm = (F.col("up_n") > 3.0) | (F.col("dn_n") > 3.0)
    return (flagged.groupBy("event_type")
            .agg(F.max("nd").cast("int").alias("n_days"),
                 F.round(F.max("sigma") / 100.0, 4).alias("sigma_daily"),
                 F.round(F.max("up_n"), 6).alias("ph_up_max"),
                 F.round(F.max("dn_n"), 6).alias("ph_down_max"),
                 ((F.max("up_n") > 3.0) | (F.max("dn_n") > 3.0))
                 .alias("drift_alarm"),
                 F.min(F.when(alarm, F.date_format("d", "yyyy-MM-dd")))
                 .alias("first_alarm_day"))
            .orderBy("event_type"))


# --------------------------- session-window replay twin (streaming)


@query("streaming_session_window_replay", sql="""
    WITH seq AS (
      SELECT user_id, ts,
             CAST(ROUND(value * 100) AS BIGINT) AS vc,
             epoch_us(ts) AS us,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    ), marked AS (
      SELECT user_id, us, vc,
             SUM(CASE WHEN gap_us IS NULL OR gap_us >= 600000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY us
                     ROWS UNBOUNDED PRECEDING) AS sid
      FROM seq
    ), sess AS (
      SELECT user_id, sid,
             COUNT(*) AS n_events,
             SUM(vc) AS cents,
             MIN(us) AS first_us,
             MAX(us) AS last_us
      FROM marked GROUP BY 1, 2
    ), bucketed AS (
      SELECT CAST(FLOOR((last_us + 600000000 - first_us) / 60000000.0)
                  AS INT) AS duration_minutes,
             n_events, cents
      FROM sess
    )
    SELECT duration_minutes,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(n_events) AS BIGINT) AS total_events,
           CAST(MAX(n_events) AS BIGINT) AS max_events,
           ROUND(CAST(SUM(cents) AS DOUBLE) / 100.0, 2) AS total_value
    FROM bucketed GROUP BY duration_minutes
    ORDER BY duration_minutes
""")
def streaming_session_window_replay(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Batch replay twin of `streaming.session_window_stats`: the SAME
    F.session_window(gap=10 min) per-user aggregation run over the
    bounded events table, rolled up to a session-duration-minute
    histogram (sessions, events, peak session size, exact-cents
    value per bucket) — giving the native session-window streaming
    operator an oracle-graded correctness row. The oracle replays
    Spark's merge semantics as SQL island detection: a new session
    starts when the event-time gap is >= the 10-minute gap at FULL
    MICROSECOND precision (session_window's window_end = last event
    + gap, merge iff next start < previous end), and duration is
    (last - first + gap). Stream/batch parity for the helper itself
    is additionally pinned in tests/test_streaming.py by draining
    the streaming version over a file source.

    Scale posture: one shuffle on user_id into Spark's session-merge
    aggregation (streaming state O(open sessions)); the histogram is
    a second map-side-combined agg on the bounded duration key.
    Event values ride as exact integer cents (integer-valued doubles
    through the helper's sum — exact), so bucket totals hash
    identically."""
    from mongo_cdc_spark.streaming.analytics import session_window_stats

    ev = load_table(spark, sf_dir, "events")
    evc = ev.withColumn(
        "value", F.round(F.col("value") * 100).cast("bigint")
        .cast("double"))
    sess = session_window_stats(evc, gap="10 minutes")
    dur = F.floor(
        (F.unix_micros("session_end") - F.unix_micros("session_start"))
        / F.lit(60000000.0)).cast("int")
    return (sess.select(dur.alias("duration_minutes"),
                        "n_events", "session_value")
            .groupBy("duration_minutes")
            .agg(F.count(F.lit(1)).alias("n_sessions"),
                 F.sum("n_events").alias("total_events"),
                 F.max("n_events").alias("max_events"),
                 F.round(F.sum("session_value") / 100.0, 2)
                 .alias("total_value"))
            .orderBy("duration_minutes"))


# ---------------------- regression-residual autocorrelation (DW)


@query("ts_durbin_watson", sql="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS yc
      FROM events GROUP BY 1
    ), idx AS (
      SELECT day, yc,
             ROW_NUMBER() OVER (ORDER BY day) AS t
      FROM daily
    ), s AS (
      SELECT COUNT(*) AS n, SUM(t) AS st, SUM(t * t) AS st2,
             SUM(yc) AS sy, SUM(t * yc) AS sty
      FROM idx
    ), fit AS (
      SELECT i.day, i.t, i.yc, s.n,
             (s.n * s.sty - s.st * s.sy)
               / ((s.n * s.st2 - s.st * s.st) * 1e0) AS b,
             (s.sy - (s.n * s.sty - s.st * s.sy)
                     / ((s.n * s.st2 - s.st * s.st) * 1e0) * s.st)
               / (s.n * 1e0) AS a
      FROM idx i CROSS JOIN s
    ), res AS (
      SELECT t, n, b, yc - a - b * t AS e,
             LAG(yc - a - b * t) OVER (ORDER BY t) AS e_prev
      FROM fit
    )
    SELECT CAST(MAX(n) AS INT) AS n_days,
           ROUND(MAX(b) / 100.0, 6) AS slope_dollars_per_day,
           ROUND(SUM(CASE WHEN e_prev IS NULL THEN 0
                          ELSE (e - e_prev) * (e - e_prev) END)
                 / SUM(e * e), 6) AS dw_stat,
           ROUND(SUM(CASE WHEN e_prev IS NULL THEN 0
                          ELSE (e - e_prev) * (e - e_prev) END)
                 / SUM(e * e), 6) < 1.352 AS positive_autocorr,
           ROUND(SUM(CASE WHEN e_prev IS NULL THEN 0
                          ELSE (e - e_prev) * (e - e_prev) END)
                 / SUM(e * e), 6) > 2.648 AS negative_autocorr
    FROM res
""")
def ts_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson test for first-order autocorrelation in the
    residuals of the daily-revenue-on-time OLS trend — the regression
    diagnostic that tells a forecasting pipeline whether its
    trend-only model leaves serial structure on the table (DW ~ 2 =
    white residuals; the ts_ljungbox_whiteness companion tests the
    raw series, DW tests the DE-TRENDED one). Decision bounds are the
    exact n=30, k=1, alpha=.05 Durbin-Watson tables: dL = 1.352
    (below = positive autocorrelation) and 4 - dL = 2.648 (above =
    negative) — the 30-day fixture span is SF-independent, so the
    constants hold at every scale factor.

    Determinism: daily totals are exact integer cents; the OLS slope
    is a ratio of exact BIGINT cross-moments (single division), so
    residuals are identical IEEE doubles on both engines; DW rounds
    at 6 dp and the verdicts compare the ROUNDED value. Scale: ONE
    data-grain map-side-combined day rollup; the index/lag windows
    and regression algebra run on the 30-row calendar frame
    (declared calendar-grain global windows)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.groupBy(F.date_trunc("day", "ts").alias("day"))
             .agg(F.sum(F.round(F.col("value") * 100).cast("bigint"))
                  .alias("yc"))
             .persist())
    idx = daily.withColumn(
        "t", F.row_number().over(Window.orderBy("day")))
    s = idx.agg(F.count(F.lit(1)).alias("n"),
                F.sum("t").alias("st"),
                F.sum(F.col("t") * F.col("t")).alias("st2"),
                F.sum("yc").alias("sy"),
                F.sum(F.col("t") * F.col("yc")).alias("sty"))
    fit = idx.crossJoin(F.broadcast(s))
    b = ((F.col("n") * F.col("sty") - F.col("st") * F.col("sy"))
         / ((F.col("n") * F.col("st2") - F.col("st") * F.col("st"))
            * F.lit(1.0)))
    a = (F.col("sy") - b * F.col("st")) / (F.col("n") * F.lit(1.0))
    res = fit.select(
        "t", "n", b.alias("b"),
        (F.col("yc") - a - b * F.col("t")).alias("e"))
    res = res.withColumn(
        "e_prev", F.lag("e").over(Window.orderBy("t")))
    dw = (F.sum(F.when(F.col("e_prev").isNull(), F.lit(0.0))
                .otherwise(F.pow(F.col("e") - F.col("e_prev"), 2)))
          / F.sum(F.col("e") * F.col("e")))
    return res.agg(
        F.max("n").cast("int").alias("n_days"),
        F.round(F.max("b") / 100.0, 6).alias("slope_dollars_per_day"),
        F.round(dw, 6).alias("dw_stat"),
        (F.round(dw, 6) < 1.352).alias("positive_autocorr"),
        (F.round(dw, 6) > 2.648).alias("negative_autocorr"))


# ----------------------- Lo-MacKinlay variance-ratio random walk

VR_Q = 5   # the aggregation horizon (trading week)


@query("ts_variance_ratio", sql=f"""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS yc
      FROM events GROUP BY 1
    ), x AS (
      SELECT day, LN(yc * 1e0) AS x,
             LAG(LN(yc * 1e0), 1) OVER (ORDER BY day) AS x1,
             LAG(LN(yc * 1e0), {VR_Q}) OVER (ORDER BY day) AS xq
      FROM daily
    ), consts AS (
      SELECT COUNT(*) - 1 AS t,
             (MAX_BY(x, day) - MIN_BY(x, day))
               / ((COUNT(*) - 1) * 1e0) AS mu
      FROM x
    ), v AS (
      SELECT c.t, c.mu,
             SUM(CASE WHEN x.x1 IS NULL THEN 0
                      ELSE POW(x.x - x.x1 - c.mu, 2) END)
               / (c.t * 1e0) AS var1,
             SUM(CASE WHEN x.xq IS NULL THEN 0
                      ELSE POW(x.x - x.xq - {VR_Q} * c.mu, 2) END)
               / ({VR_Q} * (c.t - {VR_Q} + 1) * 1e0) AS varq
      FROM x CROSS JOIN consts c
      GROUP BY c.t, c.mu
    )
    SELECT CAST(t + 1 AS INT) AS n_days,
           CAST({VR_Q} AS INT) AS q,
           ROUND(varq / var1, 6) AS vr,
           ROUND((varq / var1 - 1)
                 / SQRT(2.0 * (2 * {VR_Q} - 1) * ({VR_Q} - 1)
                        / (3.0 * {VR_Q} * t)), 6) AS z_stat,
           ABS(ROUND((varq / var1 - 1)
                 / SQRT(2.0 * (2 * {VR_Q} - 1) * ({VR_Q} - 1)
                        / (3.0 * {VR_Q} * t)), 6)) > 1.96 AS reject_05
    FROM v
""")
def ts_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo-MacKinlay variance-ratio test of the random-walk hypothesis
    on daily log revenue: VR(q) compares the variance of q-day
    log-changes to q times the 1-day variance — VR ~ 1 under a random
    walk, < 1 under mean reversion, > 1 under momentum/trending. The
    overlapping-difference estimator (all T-q+1 q-day spans) with the
    drift mu = (x_T - x_1)/T, plus the homoskedastic asymptotic
    z = (VR-1) / sqrt(2(2q-1)(q-1) / 3qT). q = 5, the trading-week
    horizon, on the SF-independent 30-day fixture span.

    Determinism: daily totals are exact integer cents; x = ln(cents)
    and every downstream term is the same IEEE closed form of those
    exact integers on both engines; VR and z round at 6 dp and the
    verdict compares the ROUNDED z. Scale: ONE data-grain day rollup;
    the two lag windows and the variance algebra run on the 30-row
    calendar frame (declared calendar-grain global windows)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.groupBy(F.date_trunc("day", "ts").alias("day"))
             .agg(F.sum(F.round(F.col("value") * 100).cast("bigint"))
                  .alias("yc"))
             .persist())
    wd = Window.orderBy("day")
    x = daily.select(
        "day", F.log(F.col("yc") * F.lit(1.0)).alias("x"))
    x = (x.withColumn("x1", F.lag("x", 1).over(wd))
         .withColumn("xq", F.lag("x", VR_Q).over(wd)))
    consts = x.agg(
        (F.count(F.lit(1)) - 1).alias("t"),
        ((F.max_by("x", "day") - F.min_by("x", "day"))
         / ((F.count(F.lit(1)) - 1) * F.lit(1.0))).alias("mu"))
    v = (x.crossJoin(F.broadcast(consts))
         .groupBy("t", "mu")
         .agg((F.sum(F.when(F.col("x1").isNull(), F.lit(0.0))
                     .otherwise(F.pow(F.col("x") - F.col("x1")
                                      - F.col("mu"), 2)))
               / (F.col("t") * F.lit(1.0))).alias("var1"),
              (F.sum(F.when(F.col("xq").isNull(), F.lit(0.0))
                     .otherwise(F.pow(F.col("x") - F.col("xq")
                                      - VR_Q * F.col("mu"), 2)))
               / (VR_Q * (F.col("t") - VR_Q + 1) * F.lit(1.0)))
              .alias("varq")))
    vr = F.col("varq") / F.col("var1")
    se = F.sqrt(2.0 * (2 * VR_Q - 1) * (VR_Q - 1)
                / (3.0 * VR_Q * F.col("t")))
    z = F.round((vr - 1) / se, 6)
    return v.select(
        (F.col("t") + 1).cast("int").alias("n_days"),
        F.lit(VR_Q).cast("int").alias("q"),
        F.round(vr, 6).alias("vr"),
        z.alias("z_stat"),
        (F.abs(z) > 1.96).alias("reject_05"))


# ---------------------- cross-correlation lead-lag discovery

CCF_MAX_LAG = 3   # days each side


@query("ts_crosscorr_leadlag", sql=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS x,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS y
      FROM events GROUP BY 1
    ), lagged AS (
      SELECT g.l AS lag, d1.x, d2.y
      FROM generate_series({-CCF_MAX_LAG}, {CCF_MAX_LAG}) g(l)
      JOIN daily d1 ON TRUE
      JOIN daily d2 ON d2.day = d1.day + CAST(g.l AS INTEGER)
    ), m AS (
      SELECT lag, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sx2, SUM(y * y) AS sy2
      FROM lagged GROUP BY 1
    )
    SELECT CAST(lag AS INT) AS lag_days,
           CAST(n AS INT) AS n_days,
           ROUND((n * sxy - sx * sy)
                 / SQRT((n * sx2 - sx * sx * 1e0)
                        * (n * sy2 - sy * sy)), 6) AS ccf
    FROM m ORDER BY lag_days
""")
def ts_crosscorr_leadlag(spark: SparkSession,
                         sf_dir: str) -> DataFrame:
    """Cross-correlation function between daily click volume and
    daily purchase volume at lags -3..+3 days — the lead-lag
    discovery step before any 'clicks predict purchases k days out'
    claim (ts_autocorr_daily is the AUTO-correlation twin; this is
    the pairwise version marketing-mix and demand models start
    from). Positive lag correlates today's clicks with purchases
    LAG days LATER over the overlapping day span.

    Determinism: daily counts are exact integers; each lag's Pearson
    r is one closed form of six exact integer moments, rounded at
    6 dp. Scale: ONE data-grain day rollup computes both series in
    the same pass; the 7-lag expansion and the day-keyed self-join
    run on the 30-row calendar frame."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.groupBy(F.to_date("ts").alias("day"))
             .agg(F.sum((F.col("event_type") == "click")
                        .cast("int")).alias("x"),
                  F.sum((F.col("event_type") == "purchase")
                        .cast("int")).alias("y"))
             .persist())
    lags = spark.range(-CCF_MAX_LAG, CCF_MAX_LAG + 1) \
        .select(F.col("id").cast("int").alias("lag"))
    d1 = daily.crossJoin(F.broadcast(lags)) \
        .select("lag", "x", F.date_add("day", F.col("lag"))
                .alias("tday"))
    d2 = daily.select(F.col("day").alias("tday"),
                      F.col("y").alias("y2"))
    lagged = d1.join(d2, "tday")
    m = (lagged.groupBy("lag")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum("x").alias("sx"), F.sum("y2").alias("sy"),
              F.sum(F.col("x") * F.col("y2")).alias("sxy"),
              F.sum(F.col("x") * F.col("x")).alias("sx2"),
              F.sum(F.col("y2") * F.col("y2")).alias("sy2")))
    r = ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
         / F.sqrt((F.col("n") * F.col("sx2")
                   - F.col("sx") * F.col("sx") * F.lit(1.0))
                  * (F.col("n") * F.col("sy2")
                     - F.col("sy") * F.col("sy"))))
    return (m.select(
        F.col("lag").cast("int").alias("lag_days"),
        F.col("n").cast("int").alias("n_days"),
        F.round(r, 6).alias("ccf"))
        .orderBy("lag_days"))


# -------------------- classical additive seasonal decomposition


@query("ts_classical_decompose", sql="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS yc
      FROM events GROUP BY 1
    ), idx AS (
      SELECT day, yc,
             ROW_NUMBER() OVER (ORDER BY day) AS t,
             SUM(yc) OVER (ORDER BY day
                           ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS s7,
             COUNT(*) OVER (ORDER BY day
                            ROWS BETWEEN 3 PRECEDING
                            AND 3 FOLLOWING) AS w7
      FROM daily
    ), core AS (
      -- first 3 FULL weeks of trend-defined days: each ISO dow
      -- appears exactly 3 times, keeping every mean a fixed-
      -- denominator exact rational
      SELECT day, yc, s7,
             EXTRACT(isodow FROM day) - 1 AS dow,
             7 * yc - s7 AS d
      FROM idx WHERE w7 = 7 AND t BETWEEN 4 AND 24
    ), a_ AS (
      SELECT dow, SUM(d) AS a, COUNT(*) AS n_obs
      FROM core GROUP BY 1
    ), tot AS (SELECT SUM(d) AS tt FROM core)
    SELECT c.day,
           CAST(c.dow AS INT) AS dow,
           ROUND(c.yc / 100.0, 2) AS revenue,
           ROUND(c.s7 / 700.0, 4) AS trend,
           ROUND((7 * a_.a - t.tt) / 14700.0, 4) AS seasonal,
           ROUND((147 * c.yc - 21 * c.s7 - (7 * a_.a - t.tt))
                 / 14700.0, 4) AS remainder
    FROM core c JOIN a_ USING (dow) CROSS JOIN tot t
    ORDER BY c.day
""")
def ts_classical_decompose(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of daily revenue
    (the statsmodels seasonal_decompose / pre-STL standard): trend =
    centered 7-day moving average, weekly seasonal = per-ISO-dow mean
    of the detrended series re-centered to sum to zero, remainder =
    what neither explains. Restricted to the first THREE FULL WEEKS
    of trend-defined days so every day-of-week appears exactly 3
    times — that fixed design is what makes the whole decomposition
    EXACT integer arithmetic: detrended values scale to 7*cents
    (d = 7y - S7), dow means to 21ths (C = 7*A_dow - T), and the
    remainder to the common 147*cents grain, each divided ONCE at
    output. y = trend + seasonal + remainder holds exactly by
    construction (pinned in pytest).

    Scale: ONE data-grain day rollup; the index/MA windows and the
    7-row dow algebra run on the 30-day calendar frame (declared
    calendar-grain global windows)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.groupBy(F.to_date("ts").alias("day"))
             .agg(F.sum(F.round(F.col("value") * 100).cast("bigint"))
                  .alias("yc"))
             .persist())
    wma = Window.orderBy("day").rowsBetween(-3, 3)
    idx = (daily
           .withColumn("t", F.row_number().over(Window.orderBy("day")))
           .withColumn("s7", F.sum("yc").over(wma))
           .withColumn("w7", F.count(F.lit(1)).over(wma)))
    core = (idx.filter((F.col("w7") == 7) & F.col("t").between(4, 24))
            .withColumn("dow", F.weekday("day"))
            .withColumn("d", 7 * F.col("yc") - F.col("s7"))
            .persist())
    a_ = core.groupBy("dow").agg(F.sum("d").alias("a"))
    tot = core.agg(F.sum("d").alias("tt"))
    j = (core.join(F.broadcast(a_), "dow")
         .crossJoin(F.broadcast(tot)))
    c_scaled = 7 * F.col("a") - F.col("tt")
    return (j.select(
        "day",
        F.col("dow").cast("int").alias("dow"),
        F.round(F.col("yc") / 100.0, 2).alias("revenue"),
        F.round(F.col("s7") / 700.0, 4).alias("trend"),
        F.round(c_scaled / 14700.0, 4).alias("seasonal"),
        F.round((147 * F.col("yc") - 21 * F.col("s7") - c_scaled)
                / 14700.0, 4).alias("remainder"))
        .orderBy("day"))


# ------------------------------------------------ Hurst exponent (R/S)

HURST_NS = (8, 16, 32, 64)   # block sizes over the ~720-hour grid


@query("ts_hurst_rs_exponent", sql=f"""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS x
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ), idx AS (
      SELECT x, ROW_NUMBER() OVER (ORDER BY h) AS t,
             COUNT(*) OVER () AS nt
      FROM hourly
    ), ns AS (
      SELECT UNNEST(ARRAY[{', '.join(str(n) for n in HURST_NS)}]) AS n
    ), g AS (
      SELECT ns.n, i.x, i.t,
             (i.t - 1) // ns.n AS blk,
             (i.t - 1) % ns.n + 1 AS j
      FROM idx i CROSS JOIN ns
      WHERE i.t <= ns.n * (i.nt // ns.n)
    ), wd AS (
      SELECT n, blk, j, x,
             SUM(x) OVER (PARTITION BY n, blk ORDER BY t
                          ROWS UNBOUNDED PRECEDING) AS prefix,
             SUM(x) OVER (PARTITION BY n, blk) AS s1
      FROM g
    ), per_block AS (
      SELECT n, blk,
             MAX(n * prefix - j * s1) - MIN(n * prefix - j * s1)
               AS rn,
             CAST(n AS HUGEINT)
               * SUM(CAST(x AS HUGEINT) * x)
               - CAST(MAX(s1) AS HUGEINT) * MAX(s1) AS varn
      FROM wd GROUP BY n, blk
    ), per_n AS (
      SELECT n, CAST(COUNT(*) AS BIGINT) AS n_blocks,
             ROUND(AVG(ROUND(rn / sqrt(CAST(varn AS DOUBLE)), 6)), 4)
               AS rs_mean
      FROM per_block WHERE varn > 0 GROUP BY n
    ), pts AS (
      SELECT n, n_blocks, rs_mean,
             log10(CAST(n AS DOUBLE)) AS lx, log10(rs_mean) AS ly
      FROM per_n
    ), ols AS (
      SELECT ROUND((COUNT(*) * SUM(lx * ly) - SUM(lx) * SUM(ly))
                   / (COUNT(*) * SUM(lx * lx) - SUM(lx) * SUM(lx)),
                   4) AS hurst
      FROM pts
    )
    SELECT CAST(p.n AS INT) AS block_n, p.n_blocks, p.rs_mean,
           o.hurst AS hurst_exponent
    FROM pts p CROSS JOIN ols o
    ORDER BY p.n
""")
def ts_hurst_rs_exponent(spark: SparkSession,
                         sf_dir: str) -> DataFrame:
    """Hurst exponent of hourly purchase revenue via classical
    rescaled-range analysis (Hurst 1951; Mandelbrot-Wallis 1969):
    for each block size n the series splits into complete blocks,
    each block reports R/S = (range of cumulative deviations from
    the block mean) / (population sd), and the Hurst exponent is the
    OLS slope of log10(mean R/S) on log10(n) — H≈0.5 for a random
    walk, >0.5 persistent (trends compound), <0.5 anti-persistent
    (mean-reverting). The long-memory diagnostic that says whether
    naive sqrt(T) confidence scaling on aggregated metrics is even
    valid.

    Exactness: hourly revenue is integer cents; within a block the
    scaled deviation n*prefix_j - j*S1 and the scaled variance
    n*S2 - S1^2 are EXACT integers (128-bit on both engines — Spark
    decimal(38,0), DuckDB HUGEINT), so R/S = Rn/sqrt(n*S2 - S1^2)
    feeds sqrt identical integers; per-block ratios round at 6 dp
    before the per-n mean (4 dp), and the 4-point OLS runs on
    pre-rounded doubles. Zero-variance blocks are excluded
    identically (varn > 0).

    Scale: one data-grain stage (the hour rollup); the hour-grid
    index is a calendar-bounded window (~720 rows, declared
    WINDOW_OK), block prefixes are PARTITIONED windows at (n, block)
    grain, and everything downstream is <= |grid| x |HURST_NS| rows
    — the bounded-frame class."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (ev.where(F.col("event_type") == "purchase")
              .groupBy(F.date_trunc("hour", "ts").alias("h"))
              .agg(F.sum(F.round(F.col("value") * 100).cast("bigint"))
                   .alias("x")))
    idx = (hourly.withColumn(
        "t", F.row_number().over(Window.orderBy("h")))
        .persist())
    nt = idx.agg(F.count(F.lit(1)).alias("nt"))
    ns = spark.createDataFrame([(n,) for n in HURST_NS], "n int")
    g = (idx.crossJoin(F.broadcast(ns))
         .crossJoin(F.broadcast(nt))
         .where(F.col("t") <= F.col("n")
                * F.floor(F.col("nt") / F.col("n")))
         .select("n", "x", "t",
                 ((F.col("t") - 1) / F.col("n")).cast("long")
                 .alias("blk"),
                 ((F.col("t") - 1) % F.col("n") + 1).alias("j")))
    wb = Window.partitionBy("n", "blk")
    wp = wb.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    wd = (g.withColumn("prefix", F.sum("x").over(wp))
          .withColumn("s1", F.sum("x").over(wb)))
    d = F.col("n") * F.col("prefix") - F.col("j") * F.col("s1")
    per_block = (wd.groupBy("n", "blk")
                 .agg((F.max(d) - F.min(d)).alias("rn"),
                      (F.first("n").cast("decimal(38,0)")
                       * F.sum(F.col("x").cast("decimal(38,0)")
                               * F.col("x"))
                       - F.max("s1").cast("decimal(38,0)")
                       * F.max("s1")).alias("varn")))
    per_n = (per_block.where(F.col("varn") > 0)
             .groupBy("n")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
                  F.round(F.avg(F.round(
                      F.col("rn")
                      / F.sqrt(F.col("varn").cast("double")), 6)), 4)
                  .alias("rs_mean")))
    pts = (per_n.withColumn("lx", F.log10(F.col("n").cast("double")))
           .withColumn("ly", F.log10("rs_mean"))
           .persist())
    ols = pts.agg(F.round(
        (F.count(F.lit(1)) * F.sum(F.col("lx") * F.col("ly"))
         - F.sum("lx") * F.sum("ly"))
        / (F.count(F.lit(1)) * F.sum(F.col("lx") * F.col("lx"))
           - F.sum("lx") * F.sum("lx")), 4).alias("hurst"))
    return (pts.crossJoin(F.broadcast(ols))
            .select(F.col("n").cast("int").alias("block_n"),
                    "n_blocks", "rs_mean",
                    F.col("hurst").alias("hurst_exponent"))
            .orderBy("block_n"))
