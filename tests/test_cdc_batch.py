"""cdc_batch operator semantics. The hash-oracle checks values; these
check the defining property of a snapshot diff: applying the emitted
feed to the old snapshot reproduces the new snapshot exactly."""

from __future__ import annotations

from mongo_cdc_spark.io import load_table
from mongo_cdc_spark.operators.cdc_batch import cdc_snapshot_diff


def test_snapshot_diff_classification_sets(spark, sf_dir):
    keys = [r.o_orderkey for r in
            load_table(spark, sf_dir, "orders").select("o_orderkey")
            .collect()]
    got = cdc_snapshot_diff(spark, sf_dir).toPandas()
    by_op = {op: set(g.order_key) for op, g in got.groupby("op")}
    assert by_op["insert"] == {k for k in keys
                               if k % 7 == 0 and k % 11 != 3}
    assert by_op["delete"] == {k for k in keys
                               if k % 11 == 3 and k % 7 != 0}
    assert by_op["update"] == {k for k in keys
                               if k % 5 == 0 and k % 7 != 0
                               and k % 11 != 3}


def test_snapshot_diff_feed_replays_old_to_new(spark, sf_dir):
    """old + feed == new, and the feed is minimal (no unchanged rows,
    before/after populated exactly where the op requires them)."""
    got = cdc_snapshot_diff(spark, sf_dir).toPandas()
    ins = got[got.op == "insert"]
    dele = got[got.op == "delete"]
    upd = got[got.op == "update"]
    assert ins.before_total.isna().all() and ins.after_total.notna().all()
    assert dele.after_total.isna().all() and dele.before_total.notna().all()
    assert upd.before_total.notna().all() and upd.after_total.notna().all()
    # every update actually changed the row (minimality)
    assert ((upd.before_total - upd.after_total - 1000.0).abs()
            < 1e-6).all()
    # replay: |new| == |old| - deletes + inserts
    orders = load_table(spark, sf_dir, "orders")
    n_old = orders.filter("o_orderkey % 7 != 0").count()
    n_new = orders.filter("o_orderkey % 11 != 3").count()
    assert n_new == n_old - len(dele) + len(ins)
