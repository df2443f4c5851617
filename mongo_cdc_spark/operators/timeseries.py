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
               ROUND(AVG(value), 6) AS v,
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
        .agg(F.round(F.avg("value"), 6).alias("v"),
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
