"""Data-layout operators: multi-dimensional clustering for scan pruning.

At 100 TB the dominant cost of most queries is the scan, and the
dominant lever on the scan is FILE LAYOUT: parquet readers prune whole
files/row-groups from min/max column statistics, but linear layouts
only bound ONE column tightly. Z-ordering (bit-interleaving the
bucketed key dimensions, then range-partitioning on the interleaved
value) bounds EVERY interleaved dimension at once — each output
partition covers a small hyper-rectangle of the key space, so
predicates on either dimension skip most files. This is the layout
strategy behind Delta/Iceberg `OPTIMIZE ZORDER BY`, re-expressed as a
plain DataFrame transform: compute z-values narrowly at scan time and
let `repartitionByRange(z)` do the clustering shuffle.

The graded query assigns every event a z-value over (user bucket,
hour bucket) and reports each z-range partition's bounding box — the
per-file min/max stats a reader would prune with. The bounding-box
areas being small IS the data-skipping property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from mongo_cdc_spark.io import load_table
from mongo_cdc_spark.operators import make_registry

QUERIES, ORACLE, query = make_registry()

# 8 bits per dimension -> 16-bit z-value; 64 range partitions of 1024
# z-values each (= 16x16 cells of the 256x256 key grid per partition).
Z_BITS = 8
Z_PARTS = 64
_PART_SHIFT = (2 * Z_BITS) - 6  # 2^16 z-values / 64 partitions


def _zvalue_sql(u: str, t: str, shift_fmt) -> str:
    """Morton interleave of two Z_BITS-wide ints as an explicit
    16-term sum (bit positions are disjoint, so + == OR). Pure integer
    arithmetic — bit-identical on any engine; `shift_fmt` adapts the
    shift syntax (Spark: shiftright/shiftleft fns, DuckDB: >>/<<)."""
    terms = []
    for b in range(Z_BITS):
        terms.append(shift_fmt(u, b, 2 * b + 1))
        terms.append(shift_fmt(t, b, 2 * b))
    return " + ".join(terms)


def _spark_shift(col: str, right: int, left: int) -> str:
    return f"shiftleft(shiftright({col}, {right}) & 1, {left})"


def _duck_shift(col: str, right: int, left: int) -> str:
    return f"((({col} >> {right}) & 1) << {left})"


@query("layout_zorder_events", sql=f"""
    WITH keyed AS (
      SELECT event_id,
             CAST(user_id % 256 AS INT) AS ub,
             CAST((epoch_us(ts) // 3600000000) % 256 AS INT) AS tb
      FROM events
    ), z AS (
      SELECT event_id, ub, tb,
             {_zvalue_sql('ub', 'tb', _duck_shift)} AS zval
      FROM keyed
    )
    SELECT CAST(zval >> {_PART_SHIFT} AS INT) AS part_id,
           COUNT(*) AS n_events,
           CAST(MIN(ub) AS INT) AS min_ub, CAST(MAX(ub) AS INT) AS max_ub,
           CAST(MIN(tb) AS INT) AS min_tb, CAST(MAX(tb) AS INT) AS max_tb,
           CAST(MIN(zval) AS INT) AS min_z, CAST(MAX(zval) AS INT) AS max_z
    FROM z
    GROUP BY part_id
    ORDER BY part_id
""")
def layout_zorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout assignment over events keyed by (user bucket,
    hour bucket), reporting each of the 64 z-range partitions'
    row count and per-dimension bounding box.

    The z-value is a 16-bit Morton code: 8 bits of user_id%256
    interleaved with 8 bits of hour-index%256, emitted as an explicit
    16-term shift/mask sum (built-in integer expressions, codegen'd —
    no UDF). Writing files ordered by this value gives every file a
    min/max envelope that is TIGHT in both user and time, so a reader
    filtering on either dimension prunes ~sqrt-fraction of files
    instead of all-but-one-dimension's worth — the same guarantee
    `OPTIMIZE ZORDER BY (user_id, ts)` provides in lakehouse table
    formats, derived here from first principles (Morton 1966 /
    Hilbert-curve clustering literature).

    Scale: z-value computation is a narrow projection at scan speed;
    the ONLY shuffle is the summary groupBy on 64 keys (in a
    real write path: the repartitionByRange(z) clustering exchange,
    which replaces — not adds to — the write's existing shuffle).
    Bucket widths (256x256 grid) size the partition count independent
    of data volume; at 100 TB raise Z_BITS, not the operator shape.
    """
    hour_idx = F.expr("unix_micros(ts) div 3600000000")
    keyed = (
        load_table(spark, sf_dir, "events")
        .select("event_id",
                (F.col("user_id") % 256).cast("int").alias("ub"),
                (hour_idx % 256).cast("int").alias("tb"))
    )
    z = keyed.select(
        "event_id", "ub", "tb",
        F.expr(_zvalue_sql("ub", "tb", _spark_shift)).alias("zval"))
    return (
        z.groupBy(F.shiftright("zval", _PART_SHIFT).cast("int")
                  .alias("part_id"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.min("ub").alias("min_ub"), F.max("ub").alias("max_ub"),
             F.min("tb").alias("min_tb"), F.max("tb").alias("max_tb"),
             F.min("zval").cast("int").alias("min_z"),
             F.max("zval").cast("int").alias("max_z"))
        .orderBy("part_id")
    )


def _hilbert_steps():
    """The 8 (s, s*s) scale levels of the order-8 Hilbert walk."""
    return [(1 << b, 1 << (2 * b)) for b in range(Z_BITS - 1, -1, -1)]


def _hilbert_sql_ctes(src: str) -> tuple[str, str]:
    """DuckDB CTE chain computing the Lam–Shapiro xy2d Hilbert index
    over (x, y) from CTE `src`: one CTE per scale level, each folding
    this level's quadrant digit into d and applying the reflect+swap
    rotation. Pure integer CASE arithmetic — bit-identical anywhere."""
    prev, ctes = src, []
    for i, (s, s2) in enumerate(_hilbert_steps()):
        cur = f"h{i}"
        rx = f"CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END"
        ry = f"CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END"
        ctes.append(f"""{cur} AS (
      SELECT event_id,
             d + {s2} * xor(3 * ({rx}), {ry}) AS d,
             CASE WHEN ({ry}) = 0
                  THEN CASE WHEN ({rx}) = 1 THEN {s - 1} - y ELSE y END
                  ELSE x END AS x,
             CASE WHEN ({ry}) = 0
                  THEN CASE WHEN ({rx}) = 1 THEN {s - 1} - x ELSE x END
                  ELSE y END AS y
      FROM {prev}
    )""")
        prev = cur
    return ", ".join(ctes), prev


_H_CTES, _H_LAST = _hilbert_sql_ctes("keyed")


@query("layout_hilbert_events", sql=f"""
    WITH keyed AS (
      SELECT event_id,
             CAST(user_id % 256 AS INT) AS x,
             CAST((epoch_us(ts) // 3600000000) % 256 AS INT) AS y,
             0 AS d
      FROM events
    ), {_H_CTES}, z AS (
      SELECT k.event_id, k.x AS ub, k.y AS tb, h.d AS hval
      FROM keyed k JOIN {_H_LAST} h ON k.event_id = h.event_id
    )
    SELECT CAST(hval >> {_PART_SHIFT} AS INT) AS part_id,
           COUNT(*) AS n_events,
           CAST(MIN(ub) AS INT) AS min_ub, CAST(MAX(ub) AS INT) AS max_ub,
           CAST(MIN(tb) AS INT) AS min_tb, CAST(MAX(tb) AS INT) AS max_tb,
           CAST(MIN(hval) AS INT) AS min_h, CAST(MAX(hval) AS INT) AS max_h
    FROM z
    GROUP BY part_id
    ORDER BY part_id
""")
def layout_hilbert_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve layout assignment over the same (user bucket,
    hour bucket) grid as `layout_zorder_events`, reporting each of the
    64 curve-range partitions' bounding box.

    The index is the order-8 Hilbert distance (Lam–Shapiro xy2d: 8
    unrolled scale levels, each folding a quadrant digit into d and
    applying the reflect+swap rotation — all integer when/xor
    expressions, codegen'd, no UDF). Hilbert beats Z-order on the
    metric that matters for data skipping: every aligned 4^k run of
    curve positions is a CONTIGUOUS k-level subsquare, so each of the
    64 partitions here (1024 = 4^5 positions) covers exactly one 32x32
    cell block — bounded in BOTH dimensions, where the Z-order
    partition spans 32x64 (the curve's "jumps" double one side). That
    tighter envelope is why lakehouse OPTIMIZE implementations moved
    from Morton to Hilbert clustering; tests/test_layout.py asserts
    the 32x32 property and the cross-layout comparison.

    Scale: identical posture to the Z-order query — the index is a
    narrow projection at scan speed (the 8 levels are one fused
    whole-stage-codegen expression tree per row); the ONLY shuffle is
    the 64-key summary groupBy (in a write path:
    repartitionByRange(hval), replacing the write's existing
    exchange)."""
    keyed = (
        load_table(spark, sf_dir, "events")
        .select("event_id",
                (F.col("user_id") % 256).cast("int").alias("x"),
                F.expr("cast((unix_micros(ts) div 3600000000) % 256"
                       " as int)").alias("y"))
    )
    df = keyed.select("event_id", "x", "y",
                      F.col("x").alias("ub"), F.col("y").alias("tb"),
                      F.lit(0).alias("d"))
    for s, s2 in _hilbert_steps():
        rx = (F.col("x").bitwiseAND(F.lit(s)) > 0).cast("int")
        ry = (F.col("y").bitwiseAND(F.lit(s)) > 0).cast("int")
        flip = (ry == 0) & (rx == 1)
        tx = F.when(flip, F.lit(s - 1) - F.col("x")).otherwise(F.col("x"))
        ty = F.when(flip, F.lit(s - 1) - F.col("y")).otherwise(F.col("y"))
        df = df.select(
            "event_id", "ub", "tb",
            (F.col("d") + F.lit(s2) * (rx * 3).bitwiseXOR(ry)).alias("d"),
            F.when(ry == 0, ty).otherwise(F.col("x")).alias("x"),
            F.when(ry == 0, tx).otherwise(F.col("y")).alias("y"))
    return (
        df.groupBy(F.shiftright("d", _PART_SHIFT).cast("int")
                   .alias("part_id"))
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.min("ub").alias("min_ub"), F.max("ub").alias("max_ub"),
             F.min("tb").alias("min_tb"), F.max("tb").alias("max_tb"),
             F.min("d").cast("int").alias("min_h"),
             F.max("d").cast("int").alias("max_h"))
        .orderBy("part_id")
    )


@query("layout_compaction_plan", sql="""
    WITH files AS (
        SELECT date_trunc('hour', ts) AS file_hour,
               COUNT(*) AS file_rows
        FROM events GROUP BY 1
    ), planned AS (
        SELECT file_hour, file_rows,
               CAST(FLOOR(
                   COALESCE(SUM(file_rows) OVER (ORDER BY file_hour
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   / 2000.0) AS BIGINT) AS grp
        FROM files
    )
    SELECT grp, COUNT(*) AS n_files,
           CAST(SUM(file_rows) AS BIGINT) AS total_rows,
           MIN(file_hour) AS from_hour, MAX(file_hour) AS to_hour
    FROM planned GROUP BY grp ORDER BY grp
""")
def layout_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner (the metadata half of Delta/
    Iceberg OPTIMIZE): treat each events hour-partition as one "file"
    (row count as its size proxy), walk the time-ordered manifest, and
    chunk consecutive files into rewrite groups of ~2000 rows via an
    exclusive prefix-sum — group id = floor(prefix_rows / target).
    Consecutive-chunking preserves the existing sort order (time), so
    each rewrite group stays a contiguous, pruning-friendly range —
    the same policy OPTIMIZE applies to a sorted file list.

    Scale: planning is METADATA-ONLY — the window runs over the file
    manifest (thousands of rows at 100 TB), never the data; a single
    unpartitioned ordered window over a manifest is the correct,
    bounded plan (manifests fit one partition by construction; the
    data-touching half — rewriting each group — is embarrassingly
    parallel per group and is exercised by the CDC snapshot
    compaction in cdc/apply.py). The per-hour file stats themselves
    aggregate map-side like any rollup."""
    files = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("file_hour"))
        .agg(F.count(F.lit(1)).alias("file_rows")))
    w = (W.orderBy("file_hour")
         .rowsBetween(W.unboundedPreceding, -1))
    planned = files.select(
        "file_hour", "file_rows",
        F.floor(F.coalesce(F.sum("file_rows").over(w), F.lit(0)) / 2000.0)
        .cast("long").alias("grp"))
    return (planned.groupBy("grp")
            .agg(F.count(F.lit(1)).alias("n_files"),
                 F.sum("file_rows").alias("total_rows"),
                 F.min("file_hour").alias("from_hour"),
                 F.max("file_hour").alias("to_hour"))
            .orderBy("grp"))


@query("layout_zonemap_skipping", sql="""
    WITH zm AS (
        SELECT date_trunc('month', o_orderdate) AS file_month,
               COUNT(*) AS n_rows,
               MIN(o_orderdate) AS min_date, MAX(o_orderdate) AS max_date,
               MIN(o_totalprice) AS min_total, MAX(o_totalprice) AS max_total,
               COUNT(CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                           AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
                           AND o_totalprice > 200000 THEN 1 END) AS pred_rows
        FROM orders GROUP BY 1
    )
    SELECT file_month, n_rows, min_date, max_date,
           ROUND(min_total, 2) AS min_total, ROUND(max_total, 2) AS max_total,
           (max_date >= TIMESTAMP '1996-01-01 00:00:00'
            AND min_date < TIMESTAMP '1997-01-01 00:00:00'
            AND max_total > 200000) AS must_scan,
           pred_rows
    FROM zm ORDER BY file_month
""")
def layout_zonemap_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (min/max statistics) file skipping, made explicit:
    treat each month partition of `orders` as one ingestion file,
    compute the per-file column statistics a parquet footer carries
    (min/max orderdate, min/max totalprice, row count), and evaluate
    the skip decision for a fixed conjunctive predicate
    (orderdate in 1996 AND totalprice > 200k) exactly the way a
    reader prunes row groups: a file must be scanned iff every
    conjunct's [min, max] interval intersects the predicate range.
    `pred_rows` — the actual matching rows per file — is carried
    alongside so the zone map's soundness is checkable in the result
    itself: a skipped file always has pred_rows = 0 (zone maps are
    sound; the converse — scanned files with 0 matches — is the
    false-positive cost that clustering, e.g. layout_zorder_events,
    exists to shrink).

    Scale: this is the pruning arithmetic Spark's parquet reader and
    Delta/Iceberg data-skipping indexes run per file at planning
    time. Computing the maps here is ONE map-side-combined groupBy on
    the partition key (no sort, no global window); at 100 TB the maps
    come free from parquet footers and the decision runs on the
    manifest only — this operator exists to pin the semantics (and to
    audit real footers against recomputed stats when corruption is
    suspected)."""
    o = load_table(spark, sf_dir, "orders")
    d0 = F.lit("1996-01-01 00:00:00").cast("timestamp")
    d1 = F.lit("1997-01-01 00:00:00").cast("timestamp")
    pred = ((F.col("o_orderdate") >= d0) & (F.col("o_orderdate") < d1)
            & (F.col("o_totalprice") > 200000))
    zm = (o.groupBy(F.date_trunc("month", "o_orderdate")
                    .alias("file_month"))
          .agg(F.count(F.lit(1)).alias("n_rows"),
               F.min("o_orderdate").alias("min_date"),
               F.max("o_orderdate").alias("max_date"),
               F.min("o_totalprice").alias("min_total_raw"),
               F.max("o_totalprice").alias("max_total_raw"),
               F.count(F.when(pred, 1)).alias("pred_rows")))
    return (zm.select(
        "file_month", "n_rows", "min_date", "max_date",
        F.round("min_total_raw", 2).alias("min_total"),
        F.round("max_total_raw", 2).alias("max_total"),
        ((F.col("max_date") >= d0) & (F.col("min_date") < d1)
         & (F.col("max_total_raw") > 200000)).alias("must_scan"),
        "pred_rows")
        .orderBy("file_month"))


_RANGE_PARTS = 8
_FRACS = "[" + ", ".join(
    f"{i}/{_RANGE_PARTS}.0" for i in range(1, _RANGE_PARTS)) + "]"


@query("layout_range_bounds", sql=f"""
    WITH samp AS (
      SELECT l_extendedprice FROM lineitem
      WHERE ('0x' || substr(md5(l_orderkey || '-' || l_linenumber),
                            1, 8))::BIGINT % 10 = 0
    ), b AS (
      SELECT list_transform(
                 quantile_cont(l_extendedprice, {_FRACS}),
                 x -> ROUND(x, 4)) AS bounds
      FROM samp
    ), tot AS (
      SELECT COUNT(*) AS n_total FROM lineitem
    ), bucketed AS (
      SELECT len(list_filter(b.bounds, x -> l.l_extendedprice > x))
               AS bucket,
             l.l_extendedprice, tot.n_total
      FROM lineitem l CROSS JOIN b CROSS JOIN tot
    )
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(MIN(l_extendedprice), 2) AS lo,
           ROUND(MAX(l_extendedprice), 2) AS hi,
           ROUND(COUNT(*) * {_RANGE_PARTS}.0 / MAX(n_total), 6)
             AS balance_ratio
    FROM bucketed
    GROUP BY bucket ORDER BY bucket
""")
def layout_range_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partition boundary planner: compute {n}-way balanced
    split points of l_extendedprice from exact percentiles, assign
    every row to its range bucket, and report per-bucket row counts
    with a balance ratio (1.0 = perfectly even) — the planning step
    behind `repartitionByRange` / Iceberg sort-order writes, made
    inspectable. A ratio far from 1 on some bucket is exactly the
    signal that range-writing this column would produce skewed files.

    Scale: the split points come from a deterministic md5 row-sample
    (the RangePartitioner design — bounds never need the full sort),
    sized 10% here; the assignment is a 7-element broadcast array
    probed by a JVM higher-order filter — a narrow map, no join, no
    shuffle beyond the final per-bucket count. The per-bucket counts
    and balance audit still run over EVERY row, so the report shows
    the true skew the sampled bounds would produce.
    Bounds are rounded to 4 dp on BOTH engines before any comparison
    so bucket membership can't flip on interpolation ulps.""".format(
        n=_RANGE_PARTS)
    li = load_table(spark, sf_dir, "lineitem")
    # Bounds come from a DETERMINISTIC 10% md5 row-sample — exactly
    # what RangePartitioner does (sample, never the full sort), and the md5
    # selection replays bit-identically in DuckDB. The exact-percentile
    # full-column form was the bench's worst query (8-11 s at sf0.1:
    # a single task sorting every row); the sampled form was the
    # round-4 fix, and round 7 removed the residual single-task
    # buffer over the sample itself via the two-phase exact quantile.
    samp = li.where(
        F.conv(F.substring(F.md5(F.concat_ws(
            "-", F.col("l_orderkey"), F.col("l_linenumber"))), 1, 8),
            16, 10).cast("bigint") % 10 == 0)
    # the sample's exact interpolated quantiles via the two-phase
    # global rank (no single-task percentile buffer even at sample
    # grain — round 7 retired that class repo-wide):
    from mongo_cdc_spark.operators._twophase import exact_quantiles
    qs = exact_quantiles(
        samp.select("l_extendedprice", "l_orderkey", "l_linenumber"),
        "l_extendedprice",
        {f"b{i}": i / _RANGE_PARTS for i in range(1, _RANGE_PARTS)},
        ["l_orderkey", "l_linenumber"])
    bounds = qs.select(F.array(*[
        F.round(F.col(f"b{i}"), 4)
        for i in range(1, _RANGE_PARTS)]).alias("bounds"))
    tot = li.agg(F.count(F.lit(1)).alias("n_total"))
    b = bounds.crossJoin(tot)
    bucketed = (li.crossJoin(F.broadcast(b))
                .select(F.size(F.filter(
                    "bounds",
                    lambda x: F.col("l_extendedprice") > x))
                    .alias("bucket"),
                    "l_extendedprice", "n_total"))
    return (bucketed.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.round(F.min("l_extendedprice"), 2).alias("lo"),
                 F.round(F.max("l_extendedprice"), 2).alias("hi"),
                 F.round(F.count(F.lit(1)) * F.lit(float(_RANGE_PARTS))
                         / F.max("n_total"), 6).alias("balance_ratio"))
            .select(F.col("bucket").cast("int").alias("bucket"),
                    "n_rows", "lo", "hi", "balance_ratio")
            .orderBy("bucket"))


@query("layout_clustering_depth", sql="""
    WITH zm AS (
      -- lo/hi round to cents HERE so the overlap predicate below
      -- compares the same 2-dp bounds the Spark side joins on
      -- (round-7 ADVICE fix; o_totalprice is 2-dp on this fixture,
      -- so values are unchanged)
      SELECT date_trunc('month', o_orderdate) AS file_month,
             COUNT(*) AS n_rows,
             ROUND(MIN(o_totalprice), 2) AS lo,
             ROUND(MAX(o_totalprice), 2) AS hi
      FROM orders GROUP BY 1
    )
    SELECT a.file_month,
           CAST(a.n_rows AS BIGINT) AS n_rows,
           a.lo AS lo, a.hi AS hi,
           CAST(COUNT(b.file_month) AS INT) AS overlap_depth,
           ROUND((COUNT(b.file_month) + 1) * 1e0
                 / (SELECT COUNT(*) FROM zm), 6) AS read_amplification
    FROM zm a
    LEFT JOIN zm b
      ON b.file_month <> a.file_month
     AND b.lo <= a.hi AND a.lo <= b.hi
    GROUP BY a.file_month, a.n_rows, a.lo, a.hi
    ORDER BY a.file_month
""")
def layout_clustering_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-health metric for a sort/cluster column: treating
    each month partition of `orders` as one file, how many OTHER
    files each file's [min, max] o_totalprice envelope overlaps —
    Delta/Iceberg's "clustering depth". Depth ~= |files| (as here:
    totalprice is uncorrelated with ingestion month, every envelope
    spans the full range) means a point query on the column must read
    EVERY file and re-clustering (layout_range_bounds' split points,
    or a Z-order write) pays for itself; depth ~= small constant means
    the layout already prunes. read_amplification = fraction of files
    a worst-case point lookup inside this file's range must touch —
    the number a re-clustering decision thresholds on.

    Scale: the envelope stats are ONE map-side-combined groupBy (free
    from parquet footers in production); the overlap join runs on the
    FILE MANIFEST only (thousands of rows at 100 TB, like
    layout_compaction_plan) — an interval self-join at manifest grain,
    never data grain. Bounds round to cents on both engines before
    the overlap comparison."""
    o = load_table(spark, sf_dir, "orders")
    zm = (o.groupBy(F.date_trunc("month", "o_orderdate")
                    .alias("file_month"))
          .agg(F.count(F.lit(1)).alias("n_rows"),
               F.round(F.min("o_totalprice"), 2).alias("lo"),
               F.round(F.max("o_totalprice"), 2).alias("hi"))
          .persist())
    nf = zm.agg(F.count(F.lit(1)).alias("n_files"))
    a, b = zm.alias("a"), zm.alias("b")
    return (a.join(b, (F.col("b.file_month") != F.col("a.file_month"))
                   & (F.col("b.lo") <= F.col("a.hi"))
                   & (F.col("a.lo") <= F.col("b.hi")), "left")
            .groupBy(F.col("a.file_month").alias("file_month"),
                     F.col("a.n_rows").alias("n_rows"),
                     F.col("a.lo").alias("lo"), F.col("a.hi").alias("hi"))
            .agg(F.count(F.col("b.file_month")).cast("int")
                 .alias("overlap_depth"))
            .crossJoin(F.broadcast(nf))
            .select("file_month",
                    F.col("n_rows").cast("bigint").alias("n_rows"),
                    "lo", "hi", "overlap_depth",
                    F.round((F.col("overlap_depth") + 1) * F.lit(1.0)
                            / F.col("n_files"), 6)
                    .alias("read_amplification"))
            .orderBy("file_month"))


# ---------------------------------------------- bloom design audit

BLOOM_M = 4096                    # filter bits
BLOOM_KS = (2, 4, 6)              # hash-count configurations


def _bloom_oracle_sql() -> str:
    ks = ", ".join(str(k) for k in BLOOM_KS)
    return f"""
    WITH members AS (
      SELECT DISTINCT o_custkey AS key FROM orders
    ), probes AS (
      -- adversarial non-member probes: offset keys, provably
      -- disjoint (and re-checked with the anti-filter)
      SELECT c_custkey + 10000000 AS key FROM customer
      WHERE c_custkey + 10000000 NOT IN (SELECT key FROM members)
    ), cfg AS (
      SELECT k.k, i.i
      FROM (SELECT UNNEST(ARRAY[{ks}]) AS k) k,
           generate_series(0, {max(BLOOM_KS) - 1}) i(i)
      WHERE i.i < k.k
    ), bits AS (
      SELECT DISTINCT cfg.k,
             ('0x' || substr(md5(CAST(m.key AS VARCHAR) || ':'
                                 || CAST(cfg.i AS VARCHAR)), 1, 15))
               ::BIGINT % {BLOOM_M} AS bit
      FROM members m, cfg
    ), ph AS (
      SELECT cfg.k, p.key,
             ('0x' || substr(md5(CAST(p.key AS VARCHAR) || ':'
                                 || CAST(cfg.i AS VARCHAR)), 1, 15))
               ::BIGINT % {BLOOM_M} AS bit
      FROM probes p, cfg
    ), hits AS (
      SELECT ph.k, ph.key, COUNT(b.bit) AS n_hit
      FROM ph LEFT JOIN bits b ON b.k = ph.k AND b.bit = ph.bit
      GROUP BY 1, 2
    ), meas AS (
      SELECT k, COUNT(*) AS n_probes,
             SUM(CASE WHEN n_hit = k THEN 1 ELSE 0 END) AS fp
      FROM hits GROUP BY 1
    ), sizes AS (
      SELECT k, COUNT(*) AS bits_set FROM bits GROUP BY 1
    ), nm AS (SELECT COUNT(*) AS n FROM members)
    SELECT m.k,
           {BLOOM_M} AS m_bits,
           CAST(nm.n AS BIGINT) AS n_members,
           CAST(m.n_probes AS BIGINT) AS n_probes,
           CAST(s.bits_set AS BIGINT) AS bits_set,
           ROUND(s.bits_set * 1.0 / {BLOOM_M}, 6) AS fill_ratio,
           CAST(m.fp AS BIGINT) AS fp_count,
           ROUND(m.fp * 1.0 / m.n_probes, 6) AS fpr_measured,
           ROUND(POWER(1.0 - POWER(1.0 - 1.0 / {BLOOM_M},
                                   m.k * nm.n), m.k), 6) AS fpr_theory
    FROM meas m JOIN sizes s ON s.k = m.k, nm
    ORDER BY m.k"""


@query("layout_bloom_design", sql=_bloom_oracle_sql())
def layout_bloom_design(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter design audit for the runtime-filter family
    (join_bloom_semi_reduction's production knob): for each
    hash-count k, build the m-bit filter over the distinct order
    custkeys with engine-portable 60-bit md5 hashes, probe it with
    guaranteed non-member keys (offset probe ids, anti-join
    re-checked), and report measured false-positive rate next to the
    textbook (1 - (1 - 1/m)^(kn))^k — the table that picks k before
    a nightly job trusts a runtime filter's pruning factor. The
    measured-vs-theory gap also smoke-tests hash uniformity.

    Plan: member/probe sets are data-grain (distinct + anti-join);
    the (k, i) hash grid is a {sum(BLOOM_KS)}-row broadcast, bit
    sets collapse to <= m rows per k via map-side-combined distinct,
    and the probe verdict is one LEFT join on (k, bit) + a per-probe
    count — every stage integer-exact, FPR a ratio of exact counts.
    At 100 TB the filter build is the same one-pass agg the real
    bloom build runs; only the audit's probe join is extra."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    members = o.select(F.col("o_custkey").alias("key")).distinct() \
        .persist()
    probes = (c.select((F.col("c_custkey") + 10_000_000).alias("key"))
              .join(members, "key", "left_anti")
              .persist())
    cfg_rows = [(k, i) for k in BLOOM_KS for i in range(k)]
    cfg = spark.createDataFrame(cfg_rows, "k int, i int")

    def bit_of(key_col, i_col):
        h = F.md5(F.concat_ws(":", key_col.cast("string"),
                              i_col.cast("string")).cast("binary"))
        return (F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
                % BLOOM_M)

    bits = (members.crossJoin(F.broadcast(cfg))
            .select("k", bit_of(F.col("key"), F.col("i")).alias("bit"))
            .distinct())
    ph = (probes.crossJoin(F.broadcast(cfg))
          .select("k", "key",
                  bit_of(F.col("key"), F.col("i")).alias("bit")))
    bset = bits.select(F.col("k").alias("bk"),
                       F.col("bit").alias("b"))
    # the bit set is bounded by |configs| * m bits — broadcast it
    hits = (ph.join(F.broadcast(bset),
                    (ph.k == bset.bk) & (ph.bit == bset.b), "left")
            .groupBy("k", "key")
            .agg(F.count("b").alias("n_hit")))
    meas = (hits.groupBy("k")
            .agg(F.count(F.lit(1)).alias("n_probes"),
                 F.sum((F.col("n_hit") == F.col("k")).cast("int"))
                 .alias("fp")))
    sizes = bits.groupBy("k").agg(F.count(F.lit(1)).alias("bits_set"))
    nm = members.agg(F.count(F.lit(1)).alias("n"))
    return (meas.join(F.broadcast(sizes), "k")
            .crossJoin(F.broadcast(nm))
            .select("k", F.lit(BLOOM_M).alias("m_bits"),
                    F.col("n").cast("bigint").alias("n_members"),
                    F.col("n_probes").cast("bigint").alias("n_probes"),
                    F.col("bits_set").cast("bigint").alias("bits_set"),
                    F.round(F.col("bits_set") * 1.0 / BLOOM_M, 6)
                    .alias("fill_ratio"),
                    F.col("fp").cast("bigint").alias("fp_count"),
                    F.round(F.col("fp") * 1.0 / F.col("n_probes"), 6)
                    .alias("fpr_measured"),
                    F.round(F.pow(1.0 - F.pow(
                        F.lit(1.0) - 1.0 / BLOOM_M,
                        F.col("k") * F.col("n")), F.col("k")), 6)
                    .alias("fpr_theory"))
            .orderBy("k"))


# ------------------------------------- partition granularity plan

PART_TARGET_ROWS = 20_000      # rows per partition the writer wants
#                                (fixture-sized; production: rows
#                                 that give ~128 MB files)


@query("layout_partition_granularity_plan", sql=f"""
    WITH g AS (
      SELECT 'day' AS granularity, date_trunc('day', ts) AS b
      FROM events
      UNION ALL
      SELECT 'week', date_trunc('week', ts) FROM events
      UNION ALL
      SELECT 'month', date_trunc('month', ts) FROM events
    ), pc AS (
      SELECT granularity, b, COUNT(*) AS c FROM g GROUP BY 1, 2
    )
    SELECT granularity,
           CAST(COUNT(*) AS BIGINT) AS n_partitions,
           CAST(MIN(c) AS BIGINT) AS rows_min,
           ROUND(AVG(c), 2) AS rows_avg,
           CAST(MAX(c) AS BIGINT) AS rows_max,
           ROUND(AVG(CASE WHEN c < {PART_TARGET_ROWS}
                          THEN 1.0 ELSE 0.0 END), 4)
             AS frac_below_target,
           ROUND(MAX(c) * 1.0 / AVG(c), 4) AS skew_factor,
           AVG(c) >= {PART_TARGET_ROWS} AS meets_target
    FROM pc GROUP BY 1
    ORDER BY CASE granularity WHEN 'day' THEN 1
                              WHEN 'week' THEN 2 ELSE 3 END
""")
def layout_partition_granularity_plan(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """Time-partition granularity planning: for day/week/month
    partitioning of the event stream, the partition count, row
    distribution, small-partition fraction against the
    {PART_TARGET_ROWS}-row writer budget, and the max/avg skew — the
    table that decides PARTITIONED BY (day) vs (month) before a
    table fills with millions of tiny files (the small-files problem
    layout_compaction_plan then has to clean up; this op prevents
    it at design time). The coarsest granularity failing
    meets_target marks where partition pruning stops paying for
    file-count overhead.

    Plan: one melted scan (three date_trunc projections of the same
    column-pruned read), ONE (granularity, bucket) count shuffle
    with map-side combine, calendar-bounded rollup — at 100 TB the
    bucket grid is still days/weeks/months."""
    ev = load_table(spark, sf_dir, "events")
    gs = None
    for g in ("day", "week", "month"):
        part = ev.select(F.lit(g).alias("granularity"),
                         F.date_trunc(g, "ts").alias("b"))
        gs = part if gs is None else gs.unionByName(part)
    pc = (gs.groupBy("granularity", "b")
          .agg(F.count(F.lit(1)).alias("c")))
    order = F.when(F.col("granularity") == "day", 1) \
        .when(F.col("granularity") == "week", 2).otherwise(3)
    return (pc.groupBy("granularity")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_partitions"),
                 F.min("c").cast("bigint").alias("rows_min"),
                 F.round(F.avg("c"), 2).alias("rows_avg"),
                 F.max("c").cast("bigint").alias("rows_max"),
                 F.round(F.avg((F.col("c") < PART_TARGET_ROWS)
                               .cast("double")), 4)
                 .alias("frac_below_target"),
                 F.round(F.max("c") * 1.0 / F.avg("c"), 4)
                 .alias("skew_factor"),
                 (F.avg("c") >= PART_TARGET_ROWS).alias("meets_target"))
            .orderBy(order))


def compaction_execute(spark: SparkSession, source_dir: str,
                       out_dir: str, target_rows: int = 2000) -> dict:
    """Execute a small-file compaction per layout_compaction_plan's
    policy: read an hour-partitioned parquet table whose per-hour
    dirs are the "small files", assign each hour to a rewrite group
    by the exclusive prefix-sum rule (group = floor(prefix_rows /
    target_rows) over the time-ordered manifest), and rewrite each
    group as ONE file under out_dir/grp=N/ — consecutive chunking
    preserves time order, so every compacted file still covers a
    contiguous, pruning-friendly time range.

    Crash-safe by construction: out_dir is a FRESH directory (the
    source is never overwritten); callers swap directories after the
    write commits, the versioned-base pattern compact_merge_on_read
    uses. Returns {'groups': n, 'files_before': n_hours,
    'files_after': n_groups, 'rows': total} for the caller's
    manifest. Pruning preservation (disjoint, ordered zone maps per
    group; identical row content) is pinned in tests/test_layout.py.

    Scale: the plan is metadata-grain (hour manifest); the rewrite
    repartitions on grp so each group compacts in one task,
    embarrassingly parallel across groups — the same shape as
    cdc.apply.compact_snapshot, which compacts by bucket."""
    df = spark.read.parquet(source_dir)
    files = (df.groupBy("hour").agg(F.count(F.lit(1)).alias("n"))
             .persist())
    w = W.orderBy("hour").rowsBetween(W.unboundedPreceding, -1)
    plan = files.select(
        "hour",
        F.floor(F.coalesce(F.sum("n").over(w), F.lit(0))
                / float(target_rows)).cast("long").alias("grp"))
    n_groups = plan.select("grp").distinct().count()
    out = (df.join(F.broadcast(plan), "hour")
           .repartition(max(n_groups, 1), "grp"))
    (out.write.mode("overwrite").partitionBy("grp").parquet(out_dir))
    rows = df.count()
    return {"groups": n_groups, "files_before": files.count(),
            "files_after": n_groups, "rows": rows}


@query("layout_compaction_zonemap_audit", sql="""
    WITH files AS (
        SELECT date_trunc('hour', ts) AS file_hour,
               COUNT(*) AS file_rows,
               MIN(ts) AS lo, MAX(ts) AS hi
        FROM events GROUP BY 1
    ), planned AS (
        SELECT file_hour, file_rows, lo, hi,
               CAST(FLOOR(
                   COALESCE(SUM(file_rows) OVER (ORDER BY file_hour
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   / 2000.0) AS BIGINT) AS grp
        FROM files
    ), groups AS (
        SELECT grp, COUNT(*) AS n_files,
               CAST(SUM(file_rows) AS BIGINT) AS total_rows,
               MIN(lo) AS zone_lo, MAX(hi) AS zone_hi
        FROM planned GROUP BY grp
    )
    SELECT grp, n_files, total_rows, zone_lo, zone_hi,
           COALESCE(zone_hi < LEAD(zone_lo) OVER (ORDER BY grp), TRUE)
             AS disjoint_from_next
    FROM groups ORDER BY grp
""")
def layout_compaction_zonemap_audit(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """Post-compaction zone-map audit — the check that OPTIMIZE did
    not break pruning: for every rewrite group the compaction
    executor (compaction_execute) would produce under the
    layout_compaction_plan policy, the actual row-level min/max ts
    zone of the compacted file, and the disjointness flag against
    the next group's zone. All flags TRUE = a time-range predicate
    prunes compacted files exactly as well as it pruned the
    originals (consecutive chunking of a time-sorted manifest can
    never interleave zones; this query PROVES it on the data rather
    than asserting it). The file-writing half is pinned in
    tests/test_layout.py against real parquet dirs.

    Scale: one map-side-combined hour rollup carries min/max ts as
    the zone stats; the prefix-sum window and the group rollup run
    at manifest grain (thousands of rows at 100 TB); the LEAD is
    group-grain."""
    files = (load_table(spark, sf_dir, "events")
             .groupBy(F.date_trunc("hour", "ts").alias("file_hour"))
             .agg(F.count(F.lit(1)).alias("file_rows"),
                  F.min("ts").alias("lo"), F.max("ts").alias("hi")))
    w = W.orderBy("file_hour").rowsBetween(W.unboundedPreceding, -1)
    planned = files.select(
        "file_hour", "file_rows", "lo", "hi",
        F.floor(F.coalesce(F.sum("file_rows").over(w), F.lit(0))
                / 2000.0).cast("long").alias("grp"))
    groups = (planned.groupBy("grp")
              .agg(F.count(F.lit(1)).alias("n_files"),
                   F.sum("file_rows").cast("bigint").alias("total_rows"),
                   F.min("lo").alias("zone_lo"),
                   F.max("hi").alias("zone_hi")))
    wl = W.orderBy("grp")
    return (groups.select(
        "grp", "n_files", "total_rows", "zone_lo", "zone_hi",
        F.coalesce(F.col("zone_hi") < F.lead("zone_lo").over(wl),
                   F.lit(True)).alias("disjoint_from_next"))
        .orderBy("grp"))


# ------------------------------------------- sort-order advisor

ADV_BLOCKS = 16   # simulated row-group count per layout


@query("layout_sort_order_advisor", sql=f"""
    WITH base AS (
      SELECT DATE_DIFF('day', TIMESTAMP '1995-01-01', l_shipdate)
               AS v1,
             l_orderkey AS v2, l_partkey AS v3,
             CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                   AND l_shipdate <  TIMESTAMP '1997-04-01'
                  THEN 1 ELSE 0 END AS m
      FROM lineitem
    ), stats AS (
      SELECT MIN(v1) AS n1, MAX(v1) AS x1,
             MIN(v2) AS n2, MAX(v2) AS x2,
             MIN(v3) AS n3, MAX(v3) AS x3
      FROM base
    ), pairs AS (
      SELECT 'l_shipdate' AS sort_key,
             ((v1 - n1) * {ADV_BLOCKS}) // (x1 - n1 + 1) AS blk, m
      FROM base CROSS JOIN stats
      UNION ALL
      SELECT 'l_orderkey',
             ((v2 - n2) * {ADV_BLOCKS}) // (x2 - n2 + 1), m
      FROM base CROSS JOIN stats
      UNION ALL
      SELECT 'l_partkey',
             ((v3 - n3) * {ADV_BLOCKS}) // (x3 - n3 + 1), m
      FROM base CROSS JOIN stats
    ), blocks AS (
      SELECT sort_key, blk, COUNT(*) AS n, SUM(m) AS mm
      FROM pairs GROUP BY 1, 2
    )
    SELECT sort_key,
           CAST(COUNT(*) AS INT) AS populated_blocks,
           CAST(SUM(CASE WHEN mm > 0 THEN 1 ELSE 0 END) AS INT)
             AS qualifying_blocks,
           ROUND(1.0 - SUM(CASE WHEN mm > 0 THEN 1 ELSE 0 END)
                 / {ADV_BLOCKS}.0, 6) AS skip_fraction,
           ROUND(SUM(CASE WHEN mm > 0 THEN n ELSE 0 END)
                 / (SUM(n) * 1e0), 6) AS scan_fraction,
           ROUND(SUM(mm) / (SUM(n) * 1e0), 6) AS selectivity
    FROM blocks GROUP BY 1 ORDER BY 1
""")
def layout_sort_order_advisor(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Sort-order advisor: for each candidate sort key, simulate the
    zone maps a 16-row-group range layout on that key would produce
    (equal-WIDTH blocks over the key's exact [min, max] — what a
    uniform range-partitioned write gives) and measure how many
    blocks a representative workload predicate (Q1-1997 shipdate
    quarter) would actually have to scan. Sorting by the predicate
    column itself gives near-perfect skipping; an uncorrelated key
    (l_partkey) gives none; a time-correlated surrogate (l_orderkey)
    lands in between — the measured skip/scan fractions are exactly
    the numbers a table-layout decision (Z-order vs single-key sort
    vs leave-as-is) should be made on, turning the zone-map machinery
    (layout_zonemap_skipping) from a report into an advisor.

    Determinism: block ids are EXACT integer arithmetic
    ((v - min) * B) div (max - min + 1) — no double division anywhere
    near a block boundary; counts are exact; the three fractions
    round at 6 dp. Scale: ONE data-grain pass computes all three
    candidate block ids against the broadcast 1-row min/max frame;
    the explode to (candidate, block) pairs is a narrow 3x generate
    feeding ONE map-side-combined (candidate, block) agg — block
    grain (48 cells) thereafter."""
    li = load_table(spark, sf_dir, "lineitem")
    b = ADV_BLOCKS
    base = li.select(
        F.datediff(F.col("l_shipdate"), F.lit("1995-01-01"))
        .cast("bigint").alias("v1"),
        F.col("l_orderkey").alias("v2"),
        F.col("l_partkey").alias("v3"),
        ((F.col("l_shipdate") >= "1997-01-01")
         & (F.col("l_shipdate") < "1997-04-01"))
        .cast("int").alias("m"))
    stats = base.agg(
        F.min("v1").alias("n1"), F.max("v1").alias("x1"),
        F.min("v2").alias("n2"), F.max("v2").alias("x2"),
        F.min("v3").alias("n3"), F.max("v3").alias("x3"))
    j = base.crossJoin(F.broadcast(stats))

    def blk(v, lo, hi):
        return F.expr(f"(({v} - {lo}) * {b}) div ({hi} - {lo} + 1)")

    pairs = j.select(
        F.explode(F.array(
            F.struct(F.lit("l_shipdate").alias("sort_key"),
                     blk("v1", "n1", "x1").alias("blk")),
            F.struct(F.lit("l_orderkey").alias("sort_key"),
                     blk("v2", "n2", "x2").alias("blk")),
            F.struct(F.lit("l_partkey").alias("sort_key"),
                     blk("v3", "n3", "x3").alias("blk"))))
        .alias("p"), "m").select("p.*", "m")
    blocks = (pairs.groupBy("sort_key", "blk")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum("m").alias("mm")))
    qual = (F.col("mm") > 0).cast("int")
    return (blocks.groupBy("sort_key")
            .agg(F.count(F.lit(1)).cast("int")
                 .alias("populated_blocks"),
                 F.sum(qual).cast("int").alias("qualifying_blocks"),
                 F.round(1.0 - F.sum(qual) / float(b), 6)
                 .alias("skip_fraction"),
                 F.round(F.sum(F.when(F.col("mm") > 0, F.col("n"))
                               .otherwise(F.lit(0)))
                         / (F.sum("n") * F.lit(1.0)), 6)
                 .alias("scan_fraction"),
                 F.round(F.sum("mm") / (F.sum("n") * F.lit(1.0)), 6)
                 .alias("selectivity"))
            .orderBy("sort_key"))
