"""CDC apply: change stream → maintained parquet snapshot.

Batch semantics (latest-per-key, delete wins, tie-break on resume
token) and the streaming materializer end-to-end, including that only
touched buckets are rewritten."""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import functions as F

from mongo_cdc_spark.cdc.apply import (
    apply_batch_to_snapshot,
    latest_change_per_key,
    materialize_stream,
)
from mongo_cdc_spark.cdc.pipeline import read_change_stream_files
from mongo_cdc_spark.cdc.schema import CHANGE_EVENT_SCHEMA


def _ev(key, op="insert", doc=None, ts="2024-11-08T00:00:01Z", rt="rt1"):
    return {
        "_id": {"_data": rt}, "operationType": op, "clusterTime": ts,
        "ns": {"db": "shop", "coll": "orders"},
        "documentKey": {"_id": key},
        "fullDocument": doc,
    }


def _events_df(spark, events):
    return spark.read.schema(CHANGE_EVENT_SCHEMA).json(
        spark.sparkContext.parallelize([json.dumps(e) for e in events]))


def _snapshot(spark, path):
    return {r.doc_key: r.doc
            for r in spark.read.parquet(path).collect()}


def test_latest_change_per_key_tiebreak(spark):
    df = _events_df(spark, [
        _ev("a", doc='{"v":1}', ts="2024-11-08T00:00:01Z", rt="r1"),
        _ev("a", op="update", doc='{"v":2}', ts="2024-11-08T00:00:05Z",
            rt="r2"),
        # same clusterTime as r2: higher resume token must win
        _ev("a", op="update", doc='{"v":3}', ts="2024-11-08T00:00:05Z",
            rt="r3"),
        _ev("b", doc='{"v":9}', rt="r4"),
    ])
    got = {r["documentKey"]["_id"]: json.loads(r["fullDocument"])
           for r in latest_change_per_key(df).collect()}
    assert got == {"a": {"v": 3}, "b": {"v": 9}}


def test_apply_upsert_then_delete(spark, tmp_path: Path):
    snap = str(tmp_path / "snap")
    apply_batch_to_snapshot(spark, snap, _events_df(spark, [
        _ev("a", doc='{"v":1}', rt="r1"),
        _ev("b", doc='{"v":2}', rt="r2"),
    ]))
    assert _snapshot(spark, snap) == {"a": '{"v":1}', "b": '{"v":2}'}

    apply_batch_to_snapshot(spark, snap, _events_df(spark, [
        _ev("a", op="update", doc='{"v":10}',
            ts="2024-11-08T00:01:00Z", rt="r3"),
        _ev("b", op="delete", doc=None,
            ts="2024-11-08T00:01:00Z", rt="r4"),
        _ev("c", doc='{"v":3}', ts="2024-11-08T00:01:00Z", rt="r5"),
    ]))
    assert _snapshot(spark, snap) == {"a": '{"v":10}', "c": '{"v":3}'}


def test_apply_rewrites_only_touched_buckets(spark, tmp_path: Path):
    """An update must not rewrite the parquet files of buckets its
    batch never touched (the O(touched) update-cost property)."""
    snap = tmp_path / "snap"
    keys = [f"k{i}" for i in range(40)]
    apply_batch_to_snapshot(spark, str(snap), _events_df(spark, [
        _ev(k, doc='{"v":0}', rt=f"r{i}") for i, k in enumerate(keys)
    ]), n_buckets=8)
    before = {p: p.stat().st_mtime
              for p in snap.glob("bucket=*/*.parquet")}

    target_bucket = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit("k0")), F.lit(8)).cast("int")).first()[0]
    apply_batch_to_snapshot(spark, str(snap), _events_df(spark, [
        _ev("k0", op="update", doc='{"v":1}',
            ts="2024-11-08T00:09:00Z", rt="z1"),
    ]), n_buckets=8)

    untouched_same = [
        p for p, m in before.items()
        if p.exists() and p.stat().st_mtime == m
        and f"bucket={target_bucket}/" not in str(p)]
    assert untouched_same, "expected untouched bucket files to survive"
    got = _snapshot(spark, str(snap))
    assert got["k0"] == '{"v":1}' and len(got) == 40


def test_materialize_stream_end_to_end(spark, tmp_path: Path):
    src = tmp_path / "src"
    src.mkdir()
    snap = str(tmp_path / "snap")
    q = materialize_stream(read_change_stream_files(spark, str(src)),
                          snap, checkpoint=str(tmp_path / "ckpt"),
                          n_buckets=4)
    batches = [
        [_ev("a", doc='{"v":1}', rt="r1"), _ev("b", doc='{"v":2}', rt="r2")],
        [_ev("a", op="delete", doc=None,
             ts="2024-11-08T00:02:00Z", rt="r3"),
         _ev("c", doc='{"v":5}', ts="2024-11-08T00:02:00Z", rt="r4")],
    ]
    for i, evs in enumerate(batches):
        with open(src / f"b{i}.json", "w") as f:
            for e in evs:
                f.write(json.dumps(e) + "\n")
        q.processAllAvailable()
    q.stop()
    assert _snapshot(spark, snap) == {"b": '{"v":2}', "c": '{"v":5}'}


def test_compact_snapshot_reduces_files_preserves_content(
        spark, tmp_path: Path):
    """Many small batches accumulate files per bucket; compaction must
    collapse each bucket to one file with content-identical rows."""
    from mongo_cdc_spark.cdc.apply import compact_snapshot

    snap = str(tmp_path / "snap")
    for i in range(3):
        evs = [_ev(f"k{j}", doc=f'{{"v":{i * 10 + j}}}',
                   ts=f"2024-11-08T00:0{i}:00Z", rt=f"r{i}")
               for j in range(8)]
        apply_batch_to_snapshot(spark, snap, _events_df(spark, evs),
                                n_buckets=4)
    # the apply path's whole-bucket overwrite keeps ~1 file per bucket;
    # fragmentation in production comes from AQE skew-splits or bigger
    # writes — simulate it by rewriting with a tiny maxRecordsPerFile
    frag = spark.read.parquet(snap).localCheckpoint(eager=True)
    (frag.write.mode("overwrite").partitionBy("bucket")
     .option("partitionOverwriteMode", "dynamic")
     .option("maxRecordsPerFile", 1).parquet(snap))
    before = _snapshot(spark, snap)
    files_before = len(list(Path(snap).glob("bucket=*/*.parquet")))
    report = compact_snapshot(spark, snap)
    files_after = len(list(Path(snap).glob("bucket=*/*.parquet")))
    buckets = len(list(Path(snap).glob("bucket=*")))
    assert report["files_before"] == files_before
    assert report["files_after"] == files_after
    assert files_after == buckets < files_before
    assert _snapshot(spark, snap) == before  # content-identical
    # compaction is idempotent
    again = compact_snapshot(spark, snap)
    assert again["files_after"] == files_after
    assert _snapshot(spark, snap) == before


def test_compact_snapshot_skips_concurrently_modified_bucket(
        spark, tmp_path: Path, monkeypatch):
    """Lost-update guard: a micro-batch that commits to a bucket
    between compaction's read and its overwrite must NOT be discarded —
    the changed bucket is detected by the file-listing compare and
    excluded from the overwrite (reported in skipped_buckets)."""
    from mongo_cdc_spark.cdc.apply import compact_snapshot

    snap = str(tmp_path / "snap")
    evs = [_ev(f"k{j}", doc=f'{{"v":{j}}}', rt=f"r{j}") for j in range(8)]
    apply_batch_to_snapshot(spark, snap, _events_df(spark, evs), n_buckets=4)

    # patch the RUNTIME DataFrame class (pyspark 4 classic/connect
    # subclasses override the pyspark.sql.DataFrame base methods)
    DataFrame = type(spark.range(1))
    orig = DataFrame.localCheckpoint
    state = {"fired": False}

    def hooked(self, eager=True):
        ckpt = orig(self, eager)
        if not state["fired"]:
            # fire exactly once, INSIDE compact's read->overwrite window
            # (apply_batch_to_snapshot below also calls localCheckpoint,
            # so the flag must flip before the recursive call)
            state["fired"] = True
            apply_batch_to_snapshot(
                spark, snap,
                _events_df(spark, [_ev("k0", doc='{"v":999}',
                                       ts="2024-11-08T01:00:00Z",
                                       rt="z9")]),
                n_buckets=4)
        return ckpt

    monkeypatch.setattr(DataFrame, "localCheckpoint", hooked)
    report = compact_snapshot(spark, snap)
    monkeypatch.setattr(DataFrame, "localCheckpoint", orig)

    assert state["fired"]
    assert report["skipped_buckets"], \
        "the concurrently-written bucket must be excluded from compaction"
    final = _snapshot(spark, snap)
    assert final["k0"] == '{"v":999}', "concurrent update was lost"
    assert {k: v for k, v in final.items() if k != "k0"} == \
        {f"k{j}": f'{{"v":{j}}}' for j in range(1, 8)}


def test_snapshot_diff_feed_converges_apply_store(spark, tmp_path: Path):
    """Cross-module integration: a snapshot_diff feed, replayed as
    change events through the CDC apply store, converges the store
    from the old snapshot to the new one exactly — diff generation
    and apply are mutual inverses."""
    from pyspark.sql import functions as F

    from mongo_cdc_spark.cdc.apply import apply_batch_to_snapshot
    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators.cdc_batch import snapshot_diff

    from tests.conftest import SF_DIR

    base = (load_table(spark, SF_DIR, "orders")
            .orderBy("o_orderkey").limit(200)
            .select(F.col("o_orderkey").cast("string").alias("k"),
                    F.round("o_totalprice", 2).alias("p"),
                    F.col("o_orderstatus").alias("st")))
    old = (base.filter(F.col("k").cast("long") % 3 != 0)
           .withColumn("p", F.when(F.col("k").cast("long") % 5 == 0,
                                   F.col("p") + 7.0).otherwise(F.col("p"))))
    new = base.filter(F.col("k").cast("long") % 4 != 1)

    def to_events(df, op_col, doc_cols, ts):
        doc = (F.to_json(F.struct(*doc_cols))
               if doc_cols else F.lit(None).cast("string"))
        return df.select(
            F.struct(F.concat(F.lit("rt-"), F.col("k")).alias("_data"))
             .alias("_id"),
            op_col.alias("operationType"),
            F.struct(F.col("k").alias("_id")).alias("documentKey"),
            doc.alias("fullDocument"),
            F.lit(ts).cast("timestamp").alias("clusterTime"))

    store = str(tmp_path / "snap")
    # seed the store with the OLD snapshot as plain inserts
    seed = to_events(old, F.lit("insert"),
                     [F.col("p"), F.col("st")], "2024-11-08 00:00:01")
    apply_batch_to_snapshot(spark, store, seed, n_buckets=4)

    # diff old -> new, replay the feed as change events
    feed = snapshot_diff(old, new, "k", ("p", "st"))
    upserts = to_events(
        feed.filter(F.col("op") != "delete")
            .select("k", F.col("new_p").alias("p"),
                    F.col("new_st").alias("st")),
        F.lit("update"), [F.col("p"), F.col("st")], "2024-11-08 00:00:02")
    deletes = to_events(
        feed.filter(F.col("op") == "delete").select("k"),
        F.lit("delete"), None, "2024-11-08 00:00:02")
    apply_batch_to_snapshot(spark, store, upserts.unionByName(deletes),
                            n_buckets=4)

    got = {r.doc_key: json.loads(r.doc)
           for r in spark.read.parquet(store).collect()}
    want = {r.k: {"p": r.p, "st": r.st} for r in new.collect()}
    assert got == want


# ----------------------------------------------- merge-on-read surface


def _mor_state(spark, path, policy="last_writer_wins"):
    from mongo_cdc_spark.cdc.apply import read_merge_on_read
    return {r.doc_key: r.doc
            for r in read_merge_on_read(spark, str(path), policy)
            .collect()}


def test_mor_apply_read_lifecycle(spark, tmp_path: Path):
    """Appends only, no base rewrite; read resolves base+delta+dv."""
    from mongo_cdc_spark.cdc.apply import (compact_merge_on_read,
                                           merge_on_read_apply)

    t = tmp_path / "mor"
    # batch 0: three inserts
    merge_on_read_apply(spark, str(t), _events_df(spark, [
        _ev("a", doc='{"v":1}', rt="r1"),
        _ev("b", doc='{"v":2}', rt="r2"),
        _ev("c", doc='{"v":3}', rt="r3"),
    ]), batch_seq=0)
    assert _mor_state(spark, t) == {"a": '{"v":1}', "b": '{"v":2}',
                                    "c": '{"v":3}'}
    # batch 1: update a, delete b — base/ still absent, only appends
    merge_on_read_apply(spark, str(t), _events_df(spark, [
        _ev("a", op="update", doc='{"v":10}',
            ts="2024-11-08T00:00:09Z", rt="r4"),
        _ev("b", op="delete", ts="2024-11-08T00:00:09Z", rt="r5"),
    ]), batch_seq=1)
    assert not (t / "base").exists()
    assert _mor_state(spark, t) == {"a": '{"v":10}', "c": '{"v":3}'}

    # compaction folds delta+dv into a fresh VERSIONED base (base-1;
    # the _SUCCESS marker is the commit point) and clears the logs
    stats = compact_merge_on_read(spark, str(t))
    assert stats["rows"] == 2
    assert stats["base_dir"] == "base-1"
    assert (t / "base-1" / "_SUCCESS").exists()
    assert not (t / "delta").exists() and not (t / "dv").exists()
    assert _mor_state(spark, t) == {"a": '{"v":10}', "c": '{"v":3}'}

    # post-compaction commits keep working against the new base
    merge_on_read_apply(spark, str(t), _events_df(spark, [
        _ev("c", op="delete", ts="2024-11-08T00:00:30Z", rt="r6"),
        _ev("d", doc='{"v":4}', ts="2024-11-08T00:00:30Z", rt="r7"),
    ]), batch_seq=2)
    assert _mor_state(spark, t) == {"a": '{"v":10}', "d": '{"v":4}'}


def test_mor_conflict_policies(spark, tmp_path: Path):
    """last_writer_wins vs first_writer_wins over the same log."""
    from mongo_cdc_spark.cdc.apply import merge_on_read_apply

    t = tmp_path / "mor_pol"
    merge_on_read_apply(spark, str(t), _events_df(spark, [
        _ev("k", doc='{"v":"old"}', ts="2024-11-08T00:00:01Z", rt="r1"),
    ]), batch_seq=0)
    merge_on_read_apply(spark, str(t), _events_df(spark, [
        _ev("k", op="update", doc='{"v":"new"}',
            ts="2024-11-08T00:00:05Z", rt="r2"),
    ]), batch_seq=1)
    assert _mor_state(spark, t, "last_writer_wins") == {
        "k": '{"v":"new"}'}
    # reject-out-of-order semantics: the FIRST writer holds the key
    assert _mor_state(spark, t, "first_writer_wins") == {
        "k": '{"v":"old"}'}
    import pytest as _pytest
    from mongo_cdc_spark.cdc.apply import read_merge_on_read
    with _pytest.raises(ValueError, match="unknown merge policy"):
        read_merge_on_read(spark, str(t), "coin_flip").collect()


def test_mor_replayed_batch_is_idempotent(spark, tmp_path: Path):
    """A checkpoint-replayed commit appends byte-identical rows; the
    seq-deduped read path must collapse them to the same state."""
    from mongo_cdc_spark.cdc.apply import merge_on_read_apply

    t = tmp_path / "mor_replay"
    batch = [_ev("x", doc='{"v":1}', rt="r1"),
             _ev("y", doc='{"v":2}', rt="r2")]
    merge_on_read_apply(spark, str(t), _events_df(spark, batch),
                        batch_seq=0)
    before = _mor_state(spark, t)
    merge_on_read_apply(spark, str(t), _events_df(spark, batch),
                        batch_seq=0)  # same epoch replayed
    assert _mor_state(spark, t) == before


def test_mor_resolver_matches_cow_apply(spark, tmp_path: Path):
    """MoR and copy-on-write must converge to the same table state
    from the same event stream."""
    from mongo_cdc_spark.cdc.apply import merge_on_read_apply

    batches = [
        [_ev("a", doc='{"v":1}', rt="r1"),
         _ev("b", doc='{"v":2}', rt="r2")],
        [_ev("a", op="update", doc='{"v":3}',
             ts="2024-11-08T00:00:10Z", rt="r3"),
         _ev("c", doc='{"v":4}', ts="2024-11-08T00:00:10Z", rt="r4")],
        [_ev("b", op="delete", ts="2024-11-08T00:00:20Z", rt="r5")],
    ]
    cow = tmp_path / "cow"
    mor = tmp_path / "mor_conv"
    for i, b in enumerate(batches):
        apply_batch_to_snapshot(spark, str(cow), _events_df(spark, b))
        merge_on_read_apply(spark, str(mor), _events_df(spark, b),
                            batch_seq=i)
    assert _snapshot(spark, str(cow)) == _mor_state(spark, mor)


def test_mor_time_travel_as_of(spark, tmp_path: Path):
    """VERSION AS OF reads reconstruct each commit's state from the
    append-only log."""
    from mongo_cdc_spark.cdc.apply import merge_on_read_apply

    t = tmp_path / "mor_tt"
    merge_on_read_apply(spark, str(t), _events_df(spark, [
        _ev("a", doc='{"v":1}', rt="r1"),
        _ev("b", doc='{"v":2}', rt="r2"),
    ]), batch_seq=0)
    merge_on_read_apply(spark, str(t), _events_df(spark, [
        _ev("a", op="update", doc='{"v":9}',
            ts="2024-11-08T00:00:09Z", rt="r3"),
    ]), batch_seq=1)
    merge_on_read_apply(spark, str(t), _events_df(spark, [
        _ev("b", op="delete", ts="2024-11-08T00:00:20Z", rt="r4"),
    ]), batch_seq=2)

    def _at(s):
        from mongo_cdc_spark.cdc.apply import read_merge_on_read
        return {r.doc_key: r.doc
                for r in read_merge_on_read(spark, str(t),
                                            as_of=s).collect()}

    assert _at(0) == {"a": '{"v":1}', "b": '{"v":2}'}
    assert _at(1) == {"a": '{"v":9}', "b": '{"v":2}'}
    assert _at(2) == {"a": '{"v":9}'}
    # as_of at the newest commit equals the plain (latest) read
    assert _at(2) == _mor_state(spark, t)


def test_mor_crashed_compaction_dir_is_ignored(spark, tmp_path: Path):
    """A base-N dir WITHOUT its _SUCCESS marker (compaction crashed
    mid-write) must be invisible: reads resolve from the previous
    committed base, and the next compaction claims a fresh version."""
    from mongo_cdc_spark.cdc.apply import (compact_merge_on_read,
                                           merge_on_read_apply)

    t = tmp_path / "mor_crash"
    merge_on_read_apply(spark, str(t), _events_df(spark, [
        _ev("a", doc='{"v":1}', rt="r1"),
    ]), batch_seq=0)
    stats = compact_merge_on_read(spark, str(t))
    assert stats["base_dir"] == "base-1"

    # simulate a compaction that died mid-write: partial dir, no marker
    fake = t / "base-2" / "bucket=0"
    fake.mkdir(parents=True)
    (fake / "part-00000.parquet").write_bytes(b"torn")
    assert _mor_state(spark, t) == {"a": '{"v":1}'}  # still base-1

    # the next commit + compaction supersede it with a committed base-3
    merge_on_read_apply(spark, str(t), _events_df(spark, [
        _ev("b", doc='{"v":2}', ts="2024-11-08T00:00:09Z", rt="r2"),
    ]), batch_seq=1)
    stats = compact_merge_on_read(spark, str(t))
    # version counter moves past the torn dir's number iff the torn
    # dir is older; either way the new dir is committed and readable
    assert (t / stats["base_dir"] / "_SUCCESS").exists()
    assert _mor_state(spark, t) == {"a": '{"v":1}', "b": '{"v":2}'}


def test_mor_torn_commit_heals_on_replay(spark, tmp_path: Path):
    """dv written, delta not (crash between the two appends): interim
    reads UNDER-report the touched keys — never duplicate them — and
    the checkpointed replay of the same batch_seq restores them."""
    from mongo_cdc_spark.cdc.apply import merge_on_read_apply

    t = tmp_path / "mor_torn"
    merge_on_read_apply(spark, str(t), _events_df(spark, [
        _ev("a", doc='{"v":1}', rt="r1"),
        _ev("b", doc='{"v":2}', rt="r2"),
    ]), batch_seq=0)
    from mongo_cdc_spark.cdc.apply import compact_merge_on_read
    compact_merge_on_read(spark, str(t))

    # torn batch 1: ONLY the dv append lands (update a)
    ev = _events_df(spark, [_ev("a", op="update", doc='{"v":9}',
                                ts="2024-11-08T00:00:09Z", rt="r3")])
    from mongo_cdc_spark.cdc.apply import latest_change_per_key
    from pyspark.sql import functions as SF
    torn = latest_change_per_key(ev).select(
        SF.col("documentKey._id").alias("doc_key"),
        SF.lit(1).cast("long").alias("seq"),
        SF.pmod(SF.xxhash64(SF.col("documentKey._id")),
                SF.lit(16)).cast("int").alias("bucket"))
    torn.write.mode("append").parquet(str(t / "dv"))

    # interim: 'a' masked pending replay (under-report, no duplicate)
    state = _mor_state(spark, t)
    assert state == {"b": '{"v":2}'}

    # replay of the SAME batch completes both appends; dedup collapses
    merge_on_read_apply(spark, str(t), ev, batch_seq=1)
    assert _mor_state(spark, t) == {"a": '{"v":9}', "b": '{"v":2}'}
