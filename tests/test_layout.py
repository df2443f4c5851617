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
