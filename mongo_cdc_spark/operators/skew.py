"""Skew-mitigation utilities for 100 TB joins and aggregations.

Spark's first line of defense is AQE (`OptimizeSkewedJoin` splits
oversized post-shuffle partitions at runtime) and broadcasting small
sides — both enabled by `mongo_cdc_spark.session.get_spark`. These
helpers cover the case AQE can't: an extreme hot key on a join where
NEITHER side broadcasts (AQE splits the probe side but every split
still reads the same giant build partition), or a single-key groupBy
whose state exceeds one executor.

The reference has no joins or aggregations at all
(/root/reference/main.go is a straight-pipe CDC relay), so this is
engine-side scale infrastructure for the analytical surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__mcs_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    *,
    how: str = "inner",
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join with the hot-key shuffle fanned out ``n_salts`` ways.

    The LEFT (large, skewed) side gets a deterministic salt derived by
    hashing ALL of its columns — content-derived, so task retries and
    speculative attempts recompute identical salts (``rand()`` would
    too, being seed-per-partition, but only while the upstream
    partitioning is stable; content hashing has no such caveat). The
    RIGHT side is replicated ``n_salts``× via an inline explode. Join
    keys become (key..., salt), so one hot key spreads over ``n_salts``
    reducers instead of melting one.

    Cost model: replicating the right side multiplies its shuffle
    volume by ``n_salts`` — use only when right is far smaller than the
    hot key's row count and still too big to broadcast. Supports
    inner/left joins (the salt never changes join cardinality: every
    left row holds exactly one salt value, and every right row exists
    for all salt values).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    left_s = left.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]),
                      F.lit(n_salts)).cast("int"))
    right_s = right.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    joined = left_s.join(right_s, keys + [_SALT], how)
    return joined.drop(_SALT)


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    value_cols: list[str],
    *,
    n_salts: int = 32,
) -> DataFrame:
    """Two-phase count/sum/avg over a hot key: groupBy(keys + salt)
    partial, then groupBy(keys) final merge.

    Spark's map-side partial aggregation usually makes this
    unnecessary — but when a single key dominates *many* map tasks,
    all its partials still meet in one reducer. The salt inserts an
    intermediate reduce so the final step merges only ``n_salts`` rows
    per key.

    Output schema: ``keys…, n`` (count), and ``sum_<c>`` / ``avg_<c>``
    per value column. Only algebraic aggregates (count/sum and
    avg=sum/count) fan in correctly through two phases; holistic ones
    (median, distinct) need sketches instead — see
    `relational.agg_approx_sketches`.
    """
    salted = df.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
                      F.lit(n_salts)).cast("int"))
    partial = (
        salted.groupBy(*keys, _SALT)
        .agg(F.count(F.lit(1)).alias("__cnt"),
             *[F.sum(c).alias(f"__s_{c}") for c in value_cols])
    )
    return partial.groupBy(*keys).agg(
        F.sum("__cnt").alias("n"),
        *[F.sum(f"__s_{c}").alias(f"sum_{c}") for c in value_cols],
        *[(F.sum(f"__s_{c}") / F.sum("__cnt")).alias(f"avg_{c}")
          for c in value_cols],
    )


# --- graded query: the salted two-phase aggregation is semantics-
# preserving (its output must hash-match the plain one-phase SQL) -----

from pyspark.sql import SparkSession  # noqa: E402

from mongo_cdc_spark.io import load_table  # noqa: E402
from mongo_cdc_spark.operators import make_registry  # noqa: E402

QUERIES, ORACLE, query = make_registry()


@query("skew_salted_flag_totals", sql="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_val
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
""")
def skew_salted_flag_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation over an EXTREMELY hot key:
    l_returnflag has 3 values, so a one-phase groupBy funnels every
    partial into 3 reducers; `salted_sum_count` inserts a 32-way salt
    reduce first, bounding any single reducer's input at
    rows/(3×32) — then merges 32 tiny partials per flag.

    Graded against the PLAIN one-phase SQL: salting must never change
    results, only the shuffle fan-in. Sums run over DECIMAL(18,2) so
    the two-phase regrouping can't perturb float addition order into a
    different rounding.
    """
    li = (load_table(spark, sf_dir, "lineitem")
          .select("l_returnflag",
                  F.col("l_extendedprice").cast("decimal(18,2)")
                  .alias("val")))
    agg = salted_sum_count(li, ["l_returnflag"], ["val"])
    return (agg.select("l_returnflag", "n",
                       F.col("sum_val").cast("double").alias("sum_val"))
            .orderBy("l_returnflag"))


@query("join_bloom_semi_reduction", sql="""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
""")
def join_bloom_semi_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter (bloom-style) join reduction: before the real
    lineitem⋈orders join, probe rows are pre-filtered by a BROADCAST
    membership filter built from the selective side's join keys —
    hash(key) mod 8192 distinct buckets, a coarse Bloom filter with
    one hash function expressed as a broadcast semi-join. False
    positives (~|keys|/8192 density) are eliminated by the exact join
    that follows, so the result is provably identical to the plain
    join — which is exactly what the oracle grades (the un-filtered
    SQL).

    Why it matters at 100 TB: the big fact side is cut BEFORE its
    shuffle — with a 20%-selective dimension predicate, ~80% of
    lineitem rows never leave their input tasks. This is the manual,
    any-join form of the runtime filtering engines apply behind the
    scenes (Spark's own `spark.sql.optimizer.runtime.bloomFilter` /
    dynamic partition pruning cover only specific shapes); the bucket
    set stays a few KB regardless of data volume (8192 longs), so the
    broadcast never becomes the bottleneck the full key list would.

    Plan: broadcast semi-join (the filter) -> exact join -> one-row
    agg; the exact join is hint-free so AQE size-selects broadcast vs
    shuffle for the urgent-orders side."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    sel = (orders.filter(F.col("o_orderpriority") == "1-URGENT")
           .select("o_orderkey", "o_orderpriority"))
    buckets = (sel.select(F.pmod(F.xxhash64("o_orderkey"), F.lit(8192))
                          .alias("b"))
               .distinct())
    pre = lineitem.join(
        F.broadcast(buckets),
        F.pmod(F.xxhash64("l_orderkey"), F.lit(8192)) == F.col("b"),
        "left_semi")
    return (pre.join(sel, pre.l_orderkey == sel.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("revenue"))
            .orderBy("o_orderpriority"))


# ------------------------------------------------- salting plan table

SALT_TARGET_ROWS = 5_000     # per-reducer row budget (fixture-sized;
#                              production: rows that fit one task's
#                              memory/runtime envelope)


@query("skew_salting_plan", sql=f"""
    WITH kc AS (
      SELECT event_type AS key, COUNT(*) AS n_rows
      FROM events GROUP BY 1
    ), tot AS (
      SELECT SUM(n_rows) AS n_total, COUNT(*) AS n_keys,
             MAX(n_rows) AS max_before
      FROM kc
    ), plan AS (
      SELECT k.key, k.n_rows,
             k.n_rows * 1.0 / t.n_total AS share,
             CASE WHEN k.n_rows > {SALT_TARGET_ROWS}
                  THEN CAST(CEIL(k.n_rows * 1.0
                                 / {SALT_TARGET_ROWS}) AS BIGINT)
                  ELSE 1 END AS n_salts,
             t.n_total, t.n_keys, t.max_before
      FROM kc k, tot t
    ), after AS (
      SELECT MAX(-((-n_rows) // n_salts)) AS max_after FROM plan
    )
    SELECT p.key,
           CAST(p.n_rows AS BIGINT) AS n_rows,
           ROUND(p.share, 6) AS share,
           p.n_salts,
           CAST(-((-p.n_rows) // p.n_salts) AS BIGINT)
             AS rows_per_salt,
           ROUND(p.max_before * 1.0 * p.n_keys / p.n_total, 4)
             AS skew_before,
           ROUND(a.max_after * 1.0
                 * (SELECT SUM(n_salts) FROM plan) / p.n_total, 4)
             AS skew_after
    FROM plan p, after a ORDER BY p.n_rows DESC, p.key
""")
def skew_salting_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key salting plan for the case AQE cannot fix (a build-side
    hot key every probe split still reads): per join key, the row
    count, its share, the salt fan-out ceil(n / target) that brings
    every reducer under the {SALT_TARGET_ROWS}-row budget, and the
    max-over-avg skew factor before vs after salting — the planning
    table `skew.salted_join` / `salted_sum_count` consume as
    n_salts. Emitting the plan as data (instead of hard-coding 16)
    is what lets a nightly job adapt fan-out to drift.

    Plan: ONE data-grain partial-agg count shuffle; everything after
    runs on the |keys|-row frame with a broadcast totals row. All
    inputs integers; ceil via the portable -((-n) // s) identity
    (no float division near integer boundaries on either engine)."""
    ev = load_table(spark, sf_dir, "events")
    kc = (ev.groupBy(F.col("event_type").alias("key"))
          .agg(F.count(F.lit(1)).alias("n_rows"))
          .persist())
    tot = kc.agg(F.sum("n_rows").alias("n_total"),
                 F.count(F.lit(1)).alias("n_keys"),
                 F.max("n_rows").alias("max_before"))
    plan = (kc.crossJoin(F.broadcast(tot))
            .withColumn("n_salts", F.when(
                F.col("n_rows") > SALT_TARGET_ROWS,
                F.ceil(F.col("n_rows") * 1.0 / SALT_TARGET_ROWS)
                .cast("bigint")).otherwise(F.lit(1).cast("bigint")))
            # integer ceil via -((-n) DIV s): Spark's / on bigint
            # is double-valued, DIV is the exact integer twin
            .withColumn("rows_per_salt", F.expr(
                "CAST(-((-n_rows) DIV n_salts) AS BIGINT)")))
    after = plan.agg(F.max("rows_per_salt").alias("max_after"),
                     F.sum("n_salts").alias("sum_salts"))
    return (plan.crossJoin(F.broadcast(after))
            .select("key",
                    F.col("n_rows").cast("bigint").alias("n_rows"),
                    F.round(F.col("n_rows") * 1.0 / F.col("n_total"), 6)
                    .alias("share"),
                    "n_salts", "rows_per_salt",
                    F.round(F.col("max_before") * 1.0 * F.col("n_keys")
                            / F.col("n_total"), 4).alias("skew_before"),
                    F.round(F.col("max_after") * 1.0 * F.col("sum_salts")
                            / F.col("n_total"), 4).alias("skew_after"))
            .orderBy(F.desc("n_rows"), "key"))
