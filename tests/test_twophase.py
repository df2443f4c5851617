"""Two-phase global ordering (operators/_twophase.py) and the plan
shape of the five operators the round-5 verdict flagged for
single-partition windows (Gini, ABC, curriculum ntile, interleave
merge, Heaps prefix-sum)."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from plan_audit import count_global_windows  # noqa: E402

from mongo_cdc_spark.operators import relational, text, training  # noqa: E402
from mongo_cdc_spark.operators._twophase import with_global_order  # noqa: E402


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_global_rank_and_cumsum_match_single_sort(spark):
    df = spark.range(1, 5001).select(
        (F.col("id") * 37 % 997).alias("v"), F.col("id").alias("k"))
    out = with_global_order(df, [F.asc("v"), F.asc("k")],
                            rank_col="g", cumsums={"v": "cum_v"})
    got = {(r.v, r.k): (r.g, r.cum_v) for r in out.collect()}
    cum = 0
    for i, r in enumerate(df.orderBy("v", "k").collect(), 1):
        cum += r.v
        assert got[(r.v, r.k)] == (i, cum)


def test_global_rank_desc_ordering(spark):
    df = spark.range(1, 2001).select(
        (F.col("id") * 13 % 211).alias("v"), F.col("id").alias("k"))
    out = with_global_order(df, [F.desc("v"), F.asc("k")], rank_col="g")
    got = {(r.v, r.k): r.g for r in out.collect()}
    ref = df.orderBy(F.desc("v"), "k").collect()
    assert all(got[(r.v, r.k)] == i for i, r in enumerate(ref, 1))


def test_helper_plan_has_no_unpartitioned_window(spark):
    df = spark.range(1000).select(
        (F.col("id") % 7).alias("v"), F.col("id").alias("k"))
    out = with_global_order(df, [F.asc("v"), F.asc("k")],
                            rank_col="g", cumsums={"v": "c"})
    assert count_global_windows(_plan(out)) == 0


def test_detector_sees_unpartitioned_window(spark):
    from pyspark.sql import Window as W
    df = spark.range(100).select((F.col("id") % 7).alias("v"), "id")
    bad = df.withColumn("r", F.row_number().over(W.orderBy("v", "id")))
    assert count_global_windows(_plan(bad)) == 1
    good = df.withColumn(
        "r", F.row_number().over(W.partitionBy("v").orderBy("id")))
    assert count_global_windows(_plan(good)) == 0


def test_two_phased_operators_have_no_unpartitioned_window(spark, sf_dir):
    for fn in (relational.events_revenue_concentration,
               relational.parts_abc_classification,
               training.train_curriculum_order,
               training.train_interleave_schedule,
               text.text_heaps_law_fit):
        assert count_global_windows(_plan(fn(spark, sf_dir))) == 0, fn


def test_curriculum_phase_matches_sql_ntile(spark, sf_dir, oracle):
    """The hand-rolled ANSI-ntile arithmetic must agree with a real
    ntile for every row (bucket sizes ceil/floor split)."""
    got = training.train_curriculum_order(spark, sf_dir) \
        .select("doc_id", "phase").toPandas()
    ref = oracle.sql("""
        SELECT doc_id, CAST(ntile(4) OVER (
            ORDER BY difficulty, doc_id) AS INT) AS phase
        FROM (
          SELECT doc_id,
                 ROUND(len(w) * (len(list_distinct(w)) * 1.0 / len(w)),
                       4) AS difficulty
          FROM (SELECT doc_id,
                       regexp_split_to_array(text, '\\s+') AS w
                FROM documents)
        ) ORDER BY doc_id
    """).df()
    merged = got.merge(ref, on="doc_id", suffixes=("_got", "_ref"))
    assert len(merged) == len(got)
    assert (merged.phase_got == merged.phase_ref).all()


def test_global_order_across_partition_counts_and_ties(spark):
    df = spark.range(1, 1201).select(
        (F.col("id") % 11).alias("v"),          # heavy ties
        (-F.col("id") % 7).alias("w"),          # negatives in cumsum src
        F.col("id").alias("k"))
    ref = df.orderBy("v", "k").collect()
    ref_ranks = {(r.v, r.k): i for i, r in enumerate(ref, 1)}
    cum = 0
    ref_cums = {}
    for r in ref:
        cum += r.w
        ref_cums[(r.v, r.k)] = cum
    for nparts in (1, 2, 7, 32, 64):
        out = with_global_order(df, [F.asc("v"), F.asc("k")],
                                rank_col="g", cumsums={"w": "cw"},
                                num_partitions=nparts).collect()
        assert len(out) == 1200, nparts
        for r in out:
            assert r.g == ref_ranks[(r.v, r.k)], nparts
            assert r.cw == ref_cums[(r.v, r.k)], nparts


def test_global_order_empty_frame(spark):
    df = spark.range(0).select(F.col("id").alias("v"),
                               F.col("id").alias("k"))
    out = with_global_order(df, [F.asc("v"), F.asc("k")],
                            rank_col="g", cumsums={"v": "c"})
    assert out.count() == 0
    assert {"v", "k", "g", "c"} <= set(out.columns)


def test_global_order_noop_without_outputs(spark):
    df = spark.range(5).select(F.col("id").alias("v"))
    assert with_global_order(df, [F.asc("v")]) is df


def test_strict_cummax_matches_single_partition_window(spark):
    """strict_cummaxes must equal the textbook exclusive running max
    (max over all strictly-preceding rows; NULL for the first)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from mongo_cdc_spark.operators._twophase import with_global_order

    df = (spark.range(0, 997)
          .withColumn("k", (F.col("id") * 7919) % 997)
          .withColumn("v", (F.col("id") * 104729) % 1009))
    got = (with_global_order(df, [F.asc("k")],
                             strict_cummaxes={"v": "sm"},
                             num_partitions=8)
           .select("k", "sm").toPandas().set_index("k").sm)
    ref = (df.withColumn(
        "sm", F.max("v").over(
            W.orderBy("k").rowsBetween(W.unboundedPreceding, -1)))
        .select("k", "sm").toPandas().set_index("k").sm)
    got, ref = got.sort_index(), ref.sort_index()
    assert got.isna().sum() == ref.isna().sum() == 1
    assert (got.dropna() == ref.dropna()).all()


# ------------------------- exact_quantiles (round-7 percentile class)


def test_exact_quantiles_matches_percentile_aggregate(spark):
    """Bit-parity with Spark's exact `percentile` (and therefore
    DuckDB quantile_cont — same 0-based interpolation formula),
    grouped and ungrouped, across partition counts."""
    from mongo_cdc_spark.operators._twophase import exact_quantiles

    df = (spark.range(0, 4007)
          .select(F.col("id"),
                  (F.col("id") % 3).cast("string").alias("g"),
                  ((F.col("id") * 104729) % 99991 / 7.0).alias("x")))
    probs = {"p05": 0.05, "p50": 0.5, "p90": 0.9, "p95": 0.95}
    import math

    ref = df.agg(*[F.percentile("x", p).alias(k)
                   for k, p in probs.items()]).collect()[0]
    for nparts in (1, 4, 32):
        got = exact_quantiles(df, "x", probs, ["id"],
                              num_partitions=nparts).collect()[0]
        for k in probs:
            # identical bracketing order statistics; the final
            # interpolation may differ from Spark's by 1 ulp
            # (a*(1-f)+b*f vs a+f*(b-a)) — relative tolerance.
            assert math.isclose(ref[k], got[k], rel_tol=1e-13), \
                (nparts, k)
    refg = {r["g"]: r for r in df.groupBy("g").agg(
        *[F.percentile("x", p).alias(k) for k, p in probs.items()])
        .collect()}
    gotg = {r["g"]: r for r in exact_quantiles(
        df, "x", probs, ["id"], ["g"]).collect()}
    assert set(refg) == set(gotg)
    for g in refg:
        for k in probs:
            assert math.isclose(refg[g][k], gotg[g][k],
                                rel_tol=1e-13), (g, k)


def test_exact_quantiles_edges(spark):
    from mongo_cdc_spark.operators._twophase import exact_quantiles

    one = spark.createDataFrame([(1, 5.0)], "id long, x double")
    r = exact_quantiles(one, "x", {"p50": 0.5, "p95": 0.95},
                        ["id"]).collect()[0]
    assert r["p50"] == 5.0 and r["p95"] == 5.0
    two = spark.createDataFrame([(1, 1.0), (2, 2.0)],
                                "id long, x double")
    r = exact_quantiles(two, "x", {"p50": 0.5}, ["id"]).collect()[0]
    assert abs(r["p50"] - 1.5) < 1e-12
    # heavy ties: quantiles of a constant column are that constant
    ties = spark.range(100).select(F.col("id"), F.lit(7.0).alias("x"))
    r = exact_quantiles(ties, "x", {"p25": 0.25, "p75": 0.75},
                        ["id"]).collect()[0]
    assert r["p25"] == 7.0 and r["p75"] == 7.0


def test_exact_quantiles_ignores_nulls(spark):
    """NULLs must be ignored (Spark percentile / DuckDB quantile_cont
    semantics), not ranked first — round-7 ADVICE: a NULL in value_col
    silently shifted every quantile before the isNotNull filter."""
    import math

    from mongo_cdc_spark.operators._twophase import exact_quantiles

    rows = [(i, (i % 3), None if i % 4 == 0 else float((i * 37) % 101))
            for i in range(200)]
    df = spark.createDataFrame(rows, "id long, g int, x double")
    probs = {"p10": 0.1, "p50": 0.5, "p90": 0.9}
    ref = df.agg(*[F.percentile("x", p).alias(k)
                   for k, p in probs.items()]).collect()[0]
    got = exact_quantiles(df, "x", probs, ["id"],
                          num_partitions=8).collect()[0]
    for k in probs:
        assert math.isclose(ref[k], got[k], rel_tol=1e-13), k
    refg = {r["g"]: r for r in df.groupBy("g").agg(
        *[F.percentile("x", p).alias(k) for k, p in probs.items()])
        .collect()}
    gotg = {r["g"]: r for r in exact_quantiles(
        df, "x", probs, ["id"], ["g"]).collect()}
    assert set(refg) == set(gotg)
    for g in refg:
        for k in probs:
            assert math.isclose(refg[g][k], gotg[g][k],
                                rel_tol=1e-13), (g, k)
    # ungrouped all-NULL frame: one row of NULL quantiles, exactly
    # like df.agg(percentile(...)) — the global agg has no group keys
    allnull = spark.createDataFrame(
        [(1, None), (2, None)], "id long, x double")
    rows = exact_quantiles(allnull, "x", {"p50": 0.5}, ["id"]).collect()
    assert len(rows) == 1 and rows[0]["p50"] is None
    # grouped all-NULL group vanishes (documented caveat)
    gnull = spark.createDataFrame(
        [(1, 0, None), (2, 0, None), (3, 1, 4.0)],
        "id long, g int, x double")
    grows = {r["g"]: r["p50"] for r in exact_quantiles(
        gnull, "x", {"p50": 0.5}, ["id"], ["g"]).collect()}
    assert grows == {1: 4.0}


def test_exact_quantiles_plan_has_no_unpartitioned_window(spark):
    from mongo_cdc_spark.operators._twophase import exact_quantiles

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 5).alias("g"),
        (F.col("id") * 31 % 101 / 3.0).alias("x"))
    out = exact_quantiles(df, "x", {"p50": 0.5}, ["id"], ["g"])
    assert count_global_windows(_plan(out)) == 0


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=8, deadline=None)
    @given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                              allow_nan=False, allow_infinity=False,
                              width=32),
                    min_size=1, max_size=200),
           st.lists(st.floats(min_value=0.001, max_value=0.999,
                              allow_nan=False),
                    min_size=1, max_size=4))
    def test_exact_quantiles_property_vs_percentile(values, probs):
        """For ANY value list and probability set, exact_quantiles
        must match Spark's exact percentile aggregate to relative
        1e-12 (same bracketing order statistics, interpolation may
        differ by an ulp)."""
        import math

        from mongo_cdc_spark.operators._twophase import exact_quantiles
        from mongo_cdc_spark.session import get_spark

        spark = get_spark("pytest")
        pm = {f"p{i}": p for i, p in enumerate(probs)}
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(values)], "id long, x double")
        ref = df.agg(*[F.percentile("x", p).alias(k)
                       for k, p in pm.items()]).collect()[0]
        got = exact_quantiles(df, "x", pm, ["id"],
                              num_partitions=4).collect()[0]
        for k in pm:
            assert math.isclose(ref[k], got[k],
                                rel_tol=1e-12, abs_tol=1e-9), k
except ImportError:  # pragma: no cover - hypothesis is in this image
    pass


def test_eviction_recompute_determinism(spark, monkeypatch):
    """VERDICT_r12 'what's wrong' #3: an evicted persisted block
    RECOMPUTES (unlike checkpointed data), and the helpers' internal
    row_number windows run over a post-shuffle partition — so the
    recompute path must assign identical ranks. Simulate total
    eviction (the worst case: EVERY reference recomputes from lineage)
    by disabling persist entirely, on a ties-heavy frame, and require
    results identical to the cached run."""
    import pyspark.sql.dataframe as dfmod

    from mongo_cdc_spark.operators._twophase import (
        exact_quantiles, with_global_order)

    # ties-heavy: only 7 distinct values over 4k rows, unique key k
    df = spark.range(1, 4001).select(
        (F.col("id") % 7).cast("double").alias("v"),
        F.col("id").alias("k"))

    def run_both(build):
        cached = build(df).collect()
        monkeypatch.setattr(dfmod.DataFrame, "persist",
                            lambda self, *a, **kw: self)
        try:
            evicted = build(df).collect()
        finally:
            monkeypatch.undo()
        return cached, evicted

    got_c, got_e = run_both(lambda d: with_global_order(
        d, [F.asc("v"), F.asc("k")], rank_col="g",
        cumsums={"v": "cum_v"}, strict_cummaxes={"v": "max_v"}))
    assert sorted(map(tuple, got_c)) == sorted(map(tuple, got_e))

    got_c, got_e = run_both(lambda d: exact_quantiles(
        d, "v", {"p25": 0.25, "p50": 0.5, "p99": 0.99}, ["k"]))
    assert sorted(map(tuple, got_c)) == sorted(map(tuple, got_e))
