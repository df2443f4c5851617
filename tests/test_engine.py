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
