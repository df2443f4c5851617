"""Two-phase distributed global ordering (rank / prefix-sum).

An unpartitioned Spark window (``W.orderBy(...)`` with no
``partitionBy``) moves the ENTIRE frame to one task — Spark itself
warns "No Partition Defined for Window operation! Moving all data to a
single partition." At 100 TB that is one executor sorting the full
frame: the round-4/5 verdicts' only flagged scale-killer class.

This helper replaces that plan with the textbook two-phase form:

  phase 1  ``repartitionByRange`` on the sort expressions (Spark's
           RangePartitioner: sampled boundaries, never a global sort),
           then rank / running-sum WITHIN each range partition via a
           window keyed on ``spark_partition_id()`` — every task sorts
           only its own slice;
  phase 2  per-partition row counts / sums collapse to a frame with ≤
           ``spark.sql.shuffle.partitions`` rows (metadata-grain at any
           data size); an exclusive prefix-sum over that tiny frame
           yields each partition's global offset, broadcast-joined back.

Because range partitioning puts every row with a smaller sort tuple in
an earlier-or-equal partition, ``offset + local_rank`` equals the exact
global ``row_number`` (the sort tuple must be UNIQUE — callers all
carry a unique tie-break key, the repo-wide determinism rule), and
``offset_sum + local_running_sum`` equals the exact global running sum.

The offsets prefix-sum runs as a triangular self-join over the tiny
per-partition frame (≤ shuffle-partition rows — bounded by cluster
config, not data), so NO unpartitioned window appears anywhere in the
plan.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_PID = "__tp_pid"
_LRANK = "__tp_lrank"


def exact_quantiles(df: DataFrame,
                    value_col: str,
                    probs: Mapping[str, float],
                    tiebreak_cols: Sequence[str],
                    group_cols: Sequence[str] = (),
                    num_partitions: int | None = None) -> DataFrame:
    """Exact PERCENTILE_CONT quantiles without a single-task buffer.

    Spark's exact ``percentile`` aggregate merges a per-distinct-value
    counts map onto ONE task — on a continuous column distinct ≈ rows,
    so at 100 TB the final merge buffers the whole column (per group).
    This helper computes the identical linearly-interpolated value via
    the two-phase exact global rank: range-repartition on
    (group, value, tiebreak), per-partition row_number, per-(partition,
    group) counts collapsed to a metadata-grain offsets frame, then ONE
    broadcast equi-join probes exactly the two bracketing order
    statistics per (group, prob). Interpolation uses the same 0-based
    position formula as Spark's Percentile and DuckDB's quantile_cont:
    pos = (n-1)*p; result = x[floor]+(pos-floor)*(x[ceil]-x[floor]).

    df             input frame.
    value_col      numeric column (cast to double).
    probs          {out_col: p} — one output column per entry.
    tiebreak_cols  columns making (value, *tiebreaks) unique per row
                   (ranks must be well-defined; ties in value alone are
                   fine — equal values interpolate to themselves).
    group_cols     optional grouping: one output row per group (the
                   group count must be bounded — the offsets and probe
                   frames are |groups| x partitions / |groups| x probs
                   and broadcast). Empty → a single global row.
    Returns        DataFrame[*group_cols, *probs.keys()].

    NULL semantics match Spark's ``percentile`` and DuckDB's
    ``quantile_cont``: NULL values are ignored — they are filtered
    before the range repartition, so group counts, ranks, and the
    interpolation positions all derive from the non-NULL rows only.
    (Ungrouped, an all-NULL frame still yields the single global row
    with NULL quantiles, exactly like ``df.agg(percentile(...))``; a
    GROUP whose values are all NULL yields no output row where the
    aggregates would yield a NULL cell — callers grouping frames that
    can be entirely NULL must outer-join the group spine back.)
    """
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    gcols = list(group_cols)
    order = [F.col("__tq_v")] + [F.col(c) for c in tiebreak_cols]
    vals = (df.select(*gcols,
                      F.col(value_col).cast("double").alias("__tq_v"),
                      *tiebreak_cols)
            .where(F.col("__tq_v").isNotNull()))
    ranged = (vals.repartitionByRange(
        num_partitions, *[F.col(c) for c in gcols], *order)
        .withColumn(_PID, F.spark_partition_id()))
    local = (ranged.withColumn(
        _LRANK,
        F.row_number().over(W.partitionBy(_PID, *gcols).orderBy(*order)))
        .persist())
    per = local.groupBy(_PID, *gcols).agg(
        F.count(F.lit(1)).alias("__tq_cnt"))
    # both sides are the metadata-grain per-(partition, group) count
    # frame (≤ partitions × groups rows) — broadcast the probe side so
    # the triangular prefix join can never plan as a sort-merge:
    a, b = per.alias("__tq_a"), F.broadcast(per.alias("__tq_b"))
    same_group = [F.col(f"__tq_a.{c}").eqNullSafe(F.col(f"__tq_b.{c}"))
                  for c in gcols]
    cond = F.col(f"__tq_b.{_PID}") < F.col(f"__tq_a.{_PID}")
    for eq in same_group:
        cond = cond & eq
    offsets = (a.join(b, cond, "left")
               .groupBy(F.col(f"__tq_a.{_PID}").alias(_PID),
                        *[F.col(f"__tq_a.{c}").alias(c) for c in gcols])
               .agg(F.coalesce(F.sum(f"__tq_b.__tq_cnt"), F.lit(0))
                    .alias("__tq_off")))
    ranked = (local.join(F.broadcast(offsets), [_PID, *gcols])
              .withColumn("__tq_rk", F.col("__tq_off") + F.col(_LRANK)))
    # group sizes from the already-collapsed per-partition counts —
    # metadata-grain, no second scan of the data.
    counts = per.groupBy(*gcols).agg(F.sum("__tq_cnt").alias("__tq_n"))
    entries = F.array(*[
        F.struct(F.lit(k).alias("__tq_qk"),
                 F.lit(float(p)).alias("__tq_qp"))
        for k, p in probs.items()])
    needed = (counts.select(*gcols, "__tq_n",
                            F.explode(entries).alias("__tq_e"))
              .select(*gcols, "__tq_n",
                      F.col("__tq_e.__tq_qk").alias("__tq_qk"),
                      F.col("__tq_e.__tq_qp").alias("__tq_qp"))
              .withColumn("__tq_pos",
                          (F.col("__tq_n") - 1) * F.col("__tq_qp"))
              .withColumn("__tq_lo",
                          F.floor("__tq_pos").cast("bigint"))
              .withColumn("__tq_frac",
                          F.col("__tq_pos") - F.col("__tq_lo"))
              .select(*gcols, "__tq_qk", "__tq_lo", "__tq_frac",
                      F.explode(F.array_distinct(F.array(
                          F.col("__tq_lo") + 1,
                          F.ceil("__tq_pos").cast("bigint") + 1)))
                      .alias("__tq_rkn")))
    probe = needed.select(
        *[F.col(c).alias(f"__tq_g_{c}") for c in gcols],
        "__tq_qk", "__tq_lo", "__tq_frac", "__tq_rkn")
    jcond = ranked["__tq_rk"] == probe["__tq_rkn"]
    for c in gcols:
        jcond = jcond & ranked[c].eqNullSafe(probe[f"__tq_g_{c}"])
    hits = ranked.join(F.broadcast(probe), jcond)
    v_lo = F.max(F.when(F.col("__tq_rk") == F.col("__tq_lo") + 1,
                        F.col("__tq_v")))
    v_hi = F.max(F.when(F.col("__tq_rk") == F.col("__tq_lo") + 2,
                        F.col("__tq_v")))
    # frac == 0 → the bracket is a single order statistic (x[ceil] row
    # may not exist when pos is integral at the frame's end) — emit
    # x[floor] directly instead of interpolating with a NULL v_hi.
    tall = (hits.groupBy(*gcols, "__tq_qk")
            .agg(F.when(F.max("__tq_frac") == 0, v_lo)
                 .otherwise(v_lo + F.max("__tq_frac") * (v_hi - v_lo))
                 .alias("__tq_qv")))
    return (tall.groupBy(*gcols)
            .agg(*[F.max(F.when(F.col("__tq_qk") == k,
                                F.col("__tq_qv"))).alias(k)
                   for k in probs]))


def with_global_order(df: DataFrame,
                      order_exprs: Sequence[Column],
                      *,
                      rank_col: str | None = None,
                      cumsums: Mapping[str, str] | None = None,
                      strict_cummaxes: Mapping[str, str] | None = None,
                      num_partitions: int | None = None) -> DataFrame:
    """Attach exact global-order columns without a single-partition sort.

    order_exprs    sort expressions (may carry .desc()); the tuple must
                   be unique per row for ranks to be well-defined.
    rank_col       if set, adds the global row_number under this name.
    cumsums        {source_col: out_col} inclusive global running sums
                   in the same order.
    strict_cummaxes {source_col: out_col} EXCLUSIVE global running max
                   — max over all rows strictly before this one in the
                   order (NULL for the global first row). Same
                   two-phase shape: per-partition strict running max +
                   the max of every earlier partition's total, merged
                   with greatest() (which skips NULLs).
    num_partitions range-partition count; defaults to the session's
                   spark.sql.shuffle.partitions.
    """
    cumsums = dict(cumsums or {})
    strict_cummaxes = dict(strict_cummaxes or {})
    if rank_col is None and not cumsums and not strict_cummaxes:
        return df
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    ranged = (df.repartitionByRange(num_partitions, *order_exprs)
              .withColumn(_PID, F.spark_partition_id()))
    # spark_partition_id() is nondeterministic, so Catalyst pins the
    # projection below the pid-keyed window exchange — the ids the
    # window groups on are exactly the range-partition ids.
    local = ranged
    if rank_col is not None:
        local = local.withColumn(
            _LRANK,
            F.row_number().over(W.partitionBy(_PID).orderBy(*order_exprs)))
    run_w = (W.partitionBy(_PID).orderBy(*order_exprs)
             .rowsBetween(W.unboundedPreceding, W.currentRow))
    for src, out in cumsums.items():
        local = local.withColumn(f"__tp_run_{out}", F.sum(src).over(run_w))
    strict_w = (W.partitionBy(_PID).orderBy(*order_exprs)
                .rowsBetween(W.unboundedPreceding, -1))
    for src, out in strict_cummaxes.items():
        local = local.withColumn(f"__tp_runm_{out}",
                                 F.max(src).over(strict_w))
    # Shared by the offsets agg and the final join — persist so the
    # (sampled, pid-stamped) frame is computed once and both branches
    # see identical partition ids. A cached frame takes no checkpoint
    # lock (deadlock-class safe), and an evicted block recomputes
    # deterministically: spark_partition_id is the plan-fixed
    # partition index and repartitionByRange's boundary sampling is
    # seeded per partition, so recomputed rows keep their pids.
    local = local.persist()

    aggs = [F.count(F.lit(1)).alias("__tp_cnt")]
    aggs += [F.sum(src).alias(f"__tp_tot_{out}")
             for src, out in cumsums.items()]
    aggs += [F.max(src).alias(f"__tp_totm_{out}")
             for src, out in strict_cummaxes.items()]
    per_part = local.groupBy(_PID).agg(*aggs)
    # Exclusive prefix-sum over the ≤ num_partitions-row frame via a
    # triangular self-join (b.pid < a.pid): O(P²) pairs on a frame
    # bounded by cluster config, not data — no window, no global sort.
    a, b = per_part.alias("__tp_a"), per_part.alias("__tp_b")
    tri = a.join(b, F.col(f"__tp_b.{_PID}") < F.col(f"__tp_a.{_PID}"),
                 "left")
    off_aggs = []
    if rank_col is not None:
        off_aggs.append(
            F.coalesce(F.sum("__tp_b.__tp_cnt"), F.lit(0))
            .alias("__tp_off_rank"))
    off_aggs += [
        F.coalesce(F.sum(f"__tp_b.__tp_tot_{out}"), F.lit(0))
        .alias(f"__tp_off_{out}")
        for out in cumsums.values()]
    # max's identity is NULL (left join yields no b-rows for the first
    # partition) — greatest() below skips NULLs, so no coalesce here.
    off_aggs += [
        F.max(f"__tp_b.__tp_totm_{out}").alias(f"__tp_offm_{out}")
        for out in strict_cummaxes.values()]
    offsets = (tri.groupBy(F.col(f"__tp_a.{_PID}").alias(_PID))
               .agg(*off_aggs))

    res = local.join(F.broadcast(offsets), _PID)
    drop = [_PID]
    if rank_col is not None:
        res = res.withColumn(rank_col,
                             F.col("__tp_off_rank") + F.col(_LRANK))
        drop += [_LRANK, "__tp_off_rank"]
    for out in cumsums.values():
        res = res.withColumn(
            out, F.col(f"__tp_off_{out}") + F.col(f"__tp_run_{out}"))
        drop += [f"__tp_run_{out}", f"__tp_off_{out}"]
    for out in strict_cummaxes.values():
        res = res.withColumn(
            out, F.greatest(F.col(f"__tp_offm_{out}"),
                            F.col(f"__tp_runm_{out}")))
        drop += [f"__tp_runm_{out}", f"__tp_offm_{out}"]
    return res.drop(*drop)
