"""The SURVEY §3c lifecycle builder (mongo_cdc_spark/engine.py):
engine.pipeline(source_cfg).transform(...).sink(sink_cfg).start(),
driven hermetically — file-stream change events to a memory sink, and
the batch table path with a parquet sink."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from mongo_cdc_spark import engine
from mongo_cdc_spark.cdc.transform import to_kafka_records


def _event(db="shop", coll="orders", op="insert", key='{"$oid": "abc"}',
           full='{"qty": 3, "price": 9.5}', rt="rt1",
           ts="2024-11-08T00:00:01Z"):
    return {
        "_id": {"_data": rt}, "operationType": op, "clusterTime": ts,
        "ns": {"db": db, "coll": coll}, "documentKey": {"_id": key},
        "fullDocument": full,
    }


@pytest.fixture()
def event_dir(tmp_path):
    lines = [
        json.dumps(_event()),
        "{not json",                                   # skip-on-error
        json.dumps(_event(db="d2", coll="c2", rt="rt2",
                          key='{"$oid": "k2"}')),
        json.dumps(_event(op="delete", full=None, rt="rt3",
                          key='{"$oid": "k3"}')),
    ]
    (tmp_path / "events.jsonl").write_text("\n".join(lines))
    return str(tmp_path)


def test_streaming_files_to_memory_sink(spark, event_dir):
    q = (engine.pipeline({"kind": "files", "path": event_dir},
                         spark=spark)
         .transform(lambda df: df.withColumn(
             "topic", F.concat_ws(".", F.col("ns.db"), F.col("ns.coll"))))
         .sink({"kind": "memory", "name": "eng_out"})
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT topic FROM eng_out").collect()
    # corrupt line dropped at the source (main.go:104-108 semantics);
    # the delete without fullDocument survives
    assert sorted(r.topic for r in rows) == ["d2.c2", "shop.orders",
                                             "shop.orders"]


def test_streaming_serialize_matches_relay_records(spark, event_dir):
    """.serialize() must produce exactly the relay's Connect-envelope
    records (same topic/key/value columns and bytes)."""
    q = (engine.pipeline({"kind": "files", "path": event_dir},
                         spark=spark)
         .serialize()
         .sink({"kind": "memory", "name": "eng_ser"})
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r.topic, r.key, r.value)
           for r in spark.sql("SELECT * FROM eng_ser").collect()}
    from mongo_cdc_spark.cdc.pipeline import read_change_stream_files
    ref_q = (to_kafka_records(read_change_stream_files(spark, event_dir))
             .writeStream.format("memory").queryName("eng_ser_ref")
             .start())
    try:
        ref_q.processAllAvailable()
    finally:
        ref_q.stop()
    ref = {(r.topic, r.key, r.value)
           for r in spark.sql("SELECT * FROM eng_ser_ref").collect()}
    assert got == ref and len(got) == 3


def test_batch_table_transform_run(spark, sf_dir):
    df = (engine.pipeline({"kind": "table", "sf_dir": sf_dir,
                           "table": "nation"}, spark=spark)
          .transform(lambda d: d.filter(F.col("n_regionkey") == 0)
                     .select("n_name"))
          .run())
    assert not df.isStreaming
    assert df.columns == ["n_name"]
    assert df.count() == 5


def test_batch_parquet_sink_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "out.parquet")
    df = (engine.pipeline({"kind": "table", "sf_dir": sf_dir,
                           "table": "region"}, spark=spark)
          .sink({"kind": "parquet", "path": out, "mode": "overwrite"})
          .run())
    assert spark.read.parquet(out).count() == df.count() == 5


def test_config_validation():
    with pytest.raises(ValueError, match="unknown source kind"):
        engine.Pipeline({"kind": "carrier-pigeon"}, spark=object())
    p = engine.Pipeline.__new__(engine.Pipeline)
    p._source_cfg = {"kind": "files"}
    with pytest.raises(ValueError, match="unknown sink kind"):
        engine.Pipeline.sink(p, {"kind": "blackhole"})


def test_streaming_guards(spark, event_dir, sf_dir):
    p = engine.pipeline({"kind": "files", "path": event_dir}, spark=spark)
    with pytest.raises(ValueError, match="use .start"):
        p.run()
    with pytest.raises(ValueError, match="no sink configured"):
        p.start()
    b = engine.pipeline({"kind": "table", "sf_dir": sf_dir,
                         "table": "region"}, spark=spark)
    with pytest.raises(ValueError, match="use .run"):
        b.start()


# ------------------------- named transforms / corpus-release lifecycle


def test_named_transform_composition_frame_equal(spark, sf_dir):
    """VERDICT_r7 #5's done-criterion: composing >=2 registered
    operator stages through engine.pipeline must be frame-equal to
    calling the stage functions directly."""
    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators import training

    via_engine = (engine.pipeline({"kind": "table", "sf_dir": sf_dir,
                                   "table": "documents"}, spark=spark)
                  .transform("corpus_dedup_keep_best",
                             "corpus_quality_keep")
                  .run())
    direct = training.corpus_quality_keep(
        training.corpus_dedup_keep_best(
            load_table(spark, sf_dir, "documents")))
    assert via_engine.columns == direct.columns
    a = {r["doc_id"] for r in via_engine.select("doc_id").collect()}
    b = {r["doc_id"] for r in direct.select("doc_id").collect()}
    assert a == b and a


def test_named_transform_unknown_raises(spark, sf_dir):
    p = engine.pipeline({"kind": "table", "sf_dir": sf_dir,
                         "table": "documents"}, spark=spark)
    with pytest.raises(ValueError, match="unknown named transform"):
        p.transform("not_a_stage")


def test_engine_explain_passthrough(spark, sf_dir):
    plan = (engine.pipeline({"kind": "table", "sf_dir": sf_dir,
                             "table": "documents"}, spark=spark)
            .transform("corpus_dedup_keep_best")
            .explain())
    assert "Physical Plan" in plan
    # the keep-best rank window is fingerprint-partitioned, not global
    assert "Window" in plan


def test_corpus_stages_match_graded_operators(spark, sf_dir):
    """Each release stage reproduces its graded twin's verdicts."""
    from mongo_cdc_spark.io import load_table
    from mongo_cdc_spark.operators import training

    raw = load_table(spark, sf_dir, "documents")
    n_raw = raw.count()

    # dedup stage: keeps exactly (all docs) - (dropped dup copies)
    kept = training.corpus_dedup_keep_best(raw)
    report = training.train_dedup_keep_best(spark, sf_dir)
    n_dropped = sum(r["n_dropped"] for r in report.collect())
    assert kept.count() == n_raw - n_dropped
    # every reported keeper survives the stage
    keeper_ids = {r["keeper_doc_id"] for r in report.collect()}
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert keeper_ids <= kept_ids

    # quality stage: identical keep-set to train_quality_filter
    qkept = {r["doc_id"] for r in
             training.corpus_quality_keep(raw).select("doc_id").collect()}
    verdicts = {r["doc_id"]: r["keep"] for r in
                training.train_quality_filter(spark, sf_dir).collect()}
    assert qkept == {d for d, k in verdicts.items() if k}

    # decontaminate stage (applied to the raw frame): drops bench docs
    # plus exactly train_decontaminate's contaminated set
    bench = training.corpus_benchmark_shingles(raw)
    dkept = {r["doc_id"] for r in
             training.corpus_decontaminate(bench)(raw)
             .select("doc_id").collect()}
    contaminated = {r["doc_id"] for r in
                    training.train_decontaminate(spark, sf_dir).collect()
                    if r["contaminated"]}
    bench_ids = {r["doc_id"] for r in raw.select("doc_id").collect()
                 if r["doc_id"] % training._BENCH_MOD == 0}
    assert dkept == ({r["doc_id"] for r in raw.select("doc_id").collect()}
                     - bench_ids - contaminated)


def test_corpus_release_manifest_consistency(spark, sf_dir):
    from mongo_cdc_spark.operators import training

    rows = training.train_corpus_release(spark, sf_dir).collect()
    assert rows and all(0 <= r["shard"] < training._N_SHARDS
                        for r in rows)
    # sharding is a partition of the released docs: totals must equal
    # running the same stage chain without the shard split
    from mongo_cdc_spark.io import load_table
    raw = load_table(spark, sf_dir, "documents")
    bench = training.corpus_benchmark_shingles(raw)
    released = training.corpus_decontaminate(bench)(
        training.corpus_quality_keep(
            training.corpus_dedup_keep_best(raw)))
    assert sum(r["n_docs"] for r in rows) == released.count()


def test_streaming_serialize_by_name(spark, event_dir, tmp_path):
    """The named-transform registry works on the streaming path too:
    .transform('serialize') must equal .serialize()."""
    import pandas as pd

    out_a, out_b = [], []
    qa = (engine.pipeline({"kind": "files", "path": event_dir},
                          spark=spark)
          .transform("serialize")
          .sink({"kind": "foreach_batch",
                 "fn": lambda b, i: out_a.append(b.toPandas())})
          .start())
    qa.processAllAvailable()
    qa.stop()
    qb = (engine.pipeline({"kind": "files", "path": event_dir},
                          spark=spark)
          .serialize()
          .sink({"kind": "foreach_batch",
                 "fn": lambda b, i: out_b.append(b.toPandas())})
          .start())
    qb.processAllAvailable()
    qb.stop()
    a = pd.concat(out_a).sort_values("key").reset_index(drop=True)
    b = pd.concat(out_b).sort_values("key").reset_index(drop=True)
    assert a.equals(b) and len(a) > 0
