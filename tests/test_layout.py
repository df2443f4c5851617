"""Z-order layout tests: the bounding-box tightness that makes the
interleaved layout prune on every dimension."""

from __future__ import annotations

from mongo_cdc_spark.io import load_table
from mongo_cdc_spark.operators import layout


def test_zorder_partitions_cover_all_events(spark, sf_dir):
    got = layout.layout_zorder_events(spark, sf_dir).toPandas()
    total = load_table(spark, sf_dir, "events").count()
    assert got.n_events.sum() == total
    assert got.part_id.between(0, layout.Z_PARTS - 1).all()
    assert got.part_id.is_monotonic_increasing


def test_zorder_bounding_boxes_tight_in_both_dims(spark, sf_dir):
    """Each z-range partition fixes the top 3 user-bucket bits and the
    top 2 time-bucket bits, so its bounding box spans at most 32 user
    buckets AND at most 64 time buckets — the two-dimensional min/max
    envelope a linear layout cannot provide. Also: z-ranges of distinct
    partitions must not overlap (they are contiguous code ranges)."""
    got = layout.layout_zorder_events(spark, sf_dir).toPandas()
    assert ((got.max_ub - got.min_ub) < 32).all()
    assert ((got.max_tb - got.min_tb) < 64).all()
    srt = got.sort_values("part_id")
    assert (srt.min_z.to_numpy()[1:] > srt.max_z.to_numpy()[:-1]).all()


def test_hilbert_partitions_are_exact_subsquares(spark, sf_dir):
    """Every 1024-position Hilbert range is one 32x32 subsquare (4^5
    positions = a level-5 block, contiguous on the curve) — strictly
    tighter than the Z-order partition's 32x64 envelope, the reason
    lakehouse OPTIMIZE moved from Morton to Hilbert clustering."""
    got = layout.layout_hilbert_events(spark, sf_dir).toPandas()
    assert ((got.max_ub - got.min_ub) < 32).all()
    assert ((got.max_tb - got.min_tb) < 32).all()
    total = load_table(spark, sf_dir, "events").count()
    assert got.n_events.sum() == total
    srt = got.sort_values("part_id")
    assert (srt.min_h.to_numpy()[1:] > srt.max_h.to_numpy()[:-1]).all()


def test_hilbert_tighter_than_zorder(spark, sf_dir):
    """Cross-layout comparison on identical keys: the worst-case
    bounding-box area of a Hilbert partition must not exceed the
    Z-order one (32x32 vs 32x64 at this grid/partition size)."""
    hil = layout.layout_hilbert_events(spark, sf_dir).toPandas()
    zor = layout.layout_zorder_events(spark, sf_dir).toPandas()
    h_area = ((hil.max_ub - hil.min_ub + 1)
              * (hil.max_tb - hil.min_tb + 1)).max()
    z_area = ((zor.max_ub - zor.min_ub + 1)
              * (zor.max_tb - zor.min_tb + 1)).max()
    assert h_area <= z_area


def test_compaction_plan_partitions_manifest(spark, sf_dir):
    """Groups must be contiguous ids, cover every row exactly once,
    and stay time-disjoint (to_hour of group g precedes from_hour of
    g+1) so each rewrite group is a contiguous time range."""
    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.layout import layout_compaction_plan

    got = layout_compaction_plan(spark, sf_dir).toPandas()
    assert list(got.grp) == list(range(len(got)))
    total = load_table(spark, sf_dir, "events").count()
    assert int(got.total_rows.sum()) == total
    for i in range(len(got) - 1):
        assert got.to_hour.iloc[i] < got.from_hour.iloc[i + 1]


def test_zonemap_skipping_is_sound(spark, sf_dir):
    """A file the zone map skips may never contain a matching row, and
    in-range months with a qualifying max price must be scanned."""
    from mongo_cdc_spark.operators.layout import layout_zonemap_skipping
    got = layout_zonemap_skipping(spark, sf_dir).toPandas()
    skipped = got[~got.must_scan]
    assert (skipped.pred_rows == 0).all()
    assert (got.min_date <= got.max_date).all()
    assert (got.min_total <= got.max_total).all()
    # every month is one file: partition key bounds nest in the month
    assert (got.min_date.dt.to_period("M")
            == got.file_month.dt.to_period("M")).all()
    # the fixture spans several years -> out-of-range months exist and
    # are skipped, in-range qualifying months exist and are scanned
    assert len(skipped) > 0 and got.must_scan.any()


def test_clustering_depth_counts_pairwise_overlaps(spark, sf_dir):
    from mongo_cdc_spark.operators import layout

    rows = layout.layout_clustering_depth(spark, sf_dir).collect()
    assert rows
    ivals = {r.file_month: (r.lo, r.hi) for r in rows}
    n = len(ivals)
    for r in rows:
        lo, hi = ivals[r.file_month]
        want = sum(1 for m, (l2, h2) in ivals.items()
                   if m != r.file_month and l2 <= hi and lo <= h2)
        assert r.overlap_depth == want
        assert abs(r.read_amplification - (want + 1) / n) < 1e-6


def test_bloom_design_matches_python_filter(spark, sf_dir):
    """Independent Python bloom build+probe with the same md5 hashes:
    exact bit sets, exact FP counts, and theory within sanity range."""
    import hashlib

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.layout import (
        BLOOM_KS, BLOOM_M, layout_bloom_design)

    members = {r.o_custkey for r in load_table(spark, sf_dir, "orders")
               .select("o_custkey").distinct().collect()}
    cust = [r.c_custkey for r in load_table(spark, sf_dir, "customer")
            .select("c_custkey").collect()]
    probes = [c + 10_000_000 for c in cust
              if c + 10_000_000 not in members]

    def h(key, i):
        return int(hashlib.md5(f"{key}:{i}".encode())
                   .hexdigest()[:15], 16) % BLOOM_M

    got = layout_bloom_design(spark, sf_dir).toPandas() \
        .set_index("k")
    for k in BLOOM_KS:
        bits = {h(m, i) for m in members for i in range(k)}
        fp = sum(1 for p in probes
                 if all(h(p, i) in bits for i in range(k)))
        g = got.loc[k]
        assert int(g.n_members) == len(members)
        assert int(g.n_probes) == len(probes)
        assert int(g.bits_set) == len(bits)
        assert int(g.fp_count) == fp
        assert abs(g.fpr_measured - round(fp / len(probes), 6)) < 2e-6
        th = (1 - (1 - 1 / BLOOM_M) ** (k * len(members))) ** k
        assert abs(g.fpr_theory - round(th, 6)) < 2e-6
        # hash uniformity sanity: measured within a loose factor of
        # theory (tiny fixture -> wide tolerance, zero-FP allowed
        # only when theory is already sub-1%)
        if th > 0.01:
            assert g.fpr_measured < max(5 * th, 0.1)
    # more hashes fill more bits
    assert got.bits_set.is_monotonic_increasing


def test_partition_granularity_plan_matches_pandas(spark, sf_dir):
    """Pandas recompute per granularity + the structural
    guarantees: coarser granularity -> fewer partitions, bigger
    average, and partition counts nest."""
    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.layout import (
        PART_TARGET_ROWS, layout_partition_granularity_plan)

    ev = load_table(spark, sf_dir, "events").select("ts").toPandas()
    got = layout_partition_granularity_plan(spark, sf_dir) \
        .toPandas().set_index("granularity")
    sizes = {}
    for g, freq in (("day", "D"), ("week", "W-MON"), ("month", "MS")):
        if g == "week":
            b = ev.ts.dt.to_period("W-SUN").dt.start_time
        elif g == "day":
            b = ev.ts.dt.normalize()
        else:
            b = ev.ts.dt.to_period("M").dt.start_time
        c = b.value_counts()
        sizes[g] = c
        r = got.loc[g]
        assert int(r.n_partitions) == len(c)
        assert int(r.rows_min) == int(c.min())
        assert int(r.rows_max) == int(c.max())
        assert abs(r.rows_avg - round(float(c.mean()), 2)) < 0.05
        assert abs(r.frac_below_target
                   - round((c < PART_TARGET_ROWS).mean(), 4)) < 1e-3
        assert abs(r.skew_factor
                   - round(float(c.max() / c.mean()), 4)) < 1e-3
        assert bool(r.meets_target) == (c.mean() >= PART_TARGET_ROWS)
    assert (got.loc["day", "n_partitions"]
            >= got.loc["week", "n_partitions"]
            >= got.loc["month", "n_partitions"])
    assert got.loc["month", "rows_avg"] >= got.loc["day", "rows_avg"]


def test_compaction_execute_preserves_rows_and_pruning(spark, sf_dir,
                                                       tmp_path):
    """The executor must rewrite hour-files into per-group files with
    (a) identical row content, (b) fewer files, and (c) disjoint,
    time-ordered zone maps per group — pruning preserved."""
    from pyspark.sql import functions as F

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.layout import compaction_execute

    src = str(tmp_path / "hourly")
    out = str(tmp_path / "compacted")
    ev = (load_table(spark, sf_dir, "events")
          .select("event_id", "ts",
                  F.date_trunc("hour", "ts").alias("hour")))
    ev.write.partitionBy("hour").parquet(src)

    report = compaction_execute(spark, src, out, target_rows=2000)
    n_hours = len(list((tmp_path / "hourly").glob("hour=*")))
    n_groups = len(list((tmp_path / "compacted").glob("grp=*")))
    assert report["files_before"] == n_hours
    assert report["files_after"] == report["groups"] == n_groups
    assert 0 < n_groups < n_hours

    before = spark.read.parquet(src)
    after = spark.read.parquet(out)
    assert report["rows"] == before.count() == after.count()
    # content identical (event_id is unique in the fixture)
    assert after.select("event_id").exceptAll(
        before.select("event_id")).count() == 0

    # zone maps per group: disjoint and ordered by group id
    zones = (after.groupBy("grp")
             .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
             .orderBy("grp").collect())
    for a, b in zip(zones, zones[1:]):
        assert a["hi"] < b["lo"], (a["grp"], b["grp"])
    # each group dir holds exactly ONE data file
    for g in (tmp_path / "compacted").glob("grp=*"):
        assert len(list(g.glob("*.parquet"))) == 1, g


def test_sort_order_advisor_matches_python_reference(spark, sf_dir):
    """Exact equal-width block simulation per candidate key."""
    import math
    from collections import defaultdict
    from datetime import datetime

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.layout import (
        ADV_BLOCKS, layout_sort_order_advisor)

    rows = load_table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_orderkey", "l_partkey").collect()
    epoch = datetime(1995, 1, 1)
    lo_p = datetime(1997, 1, 1)
    hi_p = datetime(1997, 4, 1)
    vals = {"l_shipdate": [], "l_orderkey": [], "l_partkey": []}
    ms = []
    for r in rows:
        vals["l_shipdate"].append((r["l_shipdate"] - epoch).days)
        vals["l_orderkey"].append(r["l_orderkey"])
        vals["l_partkey"].append(r["l_partkey"])
        ms.append(1 if lo_p <= r["l_shipdate"] < hi_p else 0)
    got = {r["sort_key"]: r for r in
           layout_sort_order_advisor(spark, sf_dir).collect()}
    assert set(got) == set(vals)
    for key, vs in vals.items():
        lo, hi = min(vs), max(vs)
        blocks = defaultdict(lambda: [0, 0])
        for v, m in zip(vs, ms):
            blk = ((v - lo) * ADV_BLOCKS) // (hi - lo + 1)
            blocks[blk][0] += 1
            blocks[blk][1] += m
        qual = sum(1 for n, mm in blocks.values() if mm > 0)
        scanned = sum(n for n, mm in blocks.values() if mm > 0)
        total = sum(n for n, _ in blocks.values())
        g = got[key]
        assert g["populated_blocks"] == len(blocks)
        assert g["qualifying_blocks"] == qual
        assert math.isclose(g["skip_fraction"],
                            1 - qual / ADV_BLOCKS, abs_tol=1e-6)
        assert math.isclose(g["scan_fraction"], scanned / total,
                            abs_tol=1e-6)
        assert math.isclose(g["selectivity"], sum(ms) / total,
                            abs_tol=1e-6)
    # the advisor's point: sorting by the predicate column must skip
    # strictly more than an uncorrelated key
    assert (got["l_shipdate"]["skip_fraction"]
            > got["l_partkey"]["skip_fraction"])
