"""Python DataSource API: the synthetic change-stream source feeds the
real relay transform, batch and streaming, without any fixture files."""

from __future__ import annotations

import pandas as pd

from mongo_cdc_spark.cdc.transform import parse_change_events, to_kafka_records
from mongo_cdc_spark.sources import register_sources
from mongo_cdc_spark.sources.cdc_source import SOURCE_NAME


def test_batch_read_partitions_and_determinism(spark):
    register_sources(spark)
    df = (spark.read.format(SOURCE_NAME)
          .option("rows", 97).option("numPartitions", 5).load())
    assert df.count() == 97
    # deterministic content: same options → identical frame
    again = (spark.read.format(SOURCE_NAME)
             .option("rows", 97).option("numPartitions", 5).load())
    assert sorted(r.value for r in df.collect()) \
        == sorted(r.value for r in again.collect())


def test_batch_source_through_relay_transform(spark):
    register_sources(spark)
    raw = (spark.read.format(SOURCE_NAME).option("rows", 60).load())
    parsed = parse_change_events(raw)
    records = to_kafka_records(parsed).toPandas()
    assert len(records) == 60
    # routing law: topic is {db}.{coll} over the two synthetic dbs/colls
    assert set(records.topic) == {"shop.orders", "crm.orders",
                                  "shop.users", "crm.users"}
    assert records.key.str.startswith('{"schema"').all()


def test_stream_source_offsets_drain_to_cap(spark, tmp_path):
    register_sources(spark)
    raw = (spark.readStream.format(SOURCE_NAME)
           .option("rows", 100).option("rowsPerBatch", 32).load())
    out: list[pd.DataFrame] = []
    q = (raw.writeStream
         .foreachBatch(lambda b, i: out.append(b.toPandas()))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    q.processAllAvailable()
    q.stop()
    total = sum(len(b) for b in out)
    assert total == 100  # drained exactly to the cap, no dupes
    assert max(len(b) for b in out) <= 32  # micro-batch bound respected
    # per-batch frames concatenate to the same deterministic event set
    values = sorted(pd.concat(out).value)
    batch = (spark.read.format(SOURCE_NAME).option("rows", 100).load())
    assert values == sorted(r.value for r in batch.collect())


def _relay_records_expected(spark, n):
    """foreachBatch twin: the same relay transform collected directly."""
    from mongo_cdc_spark.cdc.transform import (
        parse_change_events, to_kafka_records)
    raw = spark.read.format(SOURCE_NAME).option("rows", n).load()
    recs = to_kafka_records(parse_change_events(raw))

    def _b(x):
        return x.encode() if isinstance(x, str) else bytes(x)

    return {(r.topic, _b(r.key), _b(r.value)) for r in recs.collect()}


def test_stream_sink_commits_relay_records(spark, tmp_path):
    """End-to-end through BOTH custom V2 seams: synthetic change-stream
    source → relay transform → kafka_stub_sink. Committed output must
    byte-match the foreachBatch twin, and each manifest's per-topic
    delivered counts must add up."""
    from mongo_cdc_spark.cdc.transform import (
        parse_change_events, to_kafka_records)
    from mongo_cdc_spark.sources import read_committed, register_sources

    register_sources(spark)
    out = tmp_path / "sink"
    raw = (spark.readStream.format(SOURCE_NAME)
           .option("rowsPerBatch", 40).option("maxRows", 120).load())
    recs = to_kafka_records(parse_change_events(raw))
    q = (recs.writeStream.format("kafka_stub_sink")
         .option("path", str(out))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    q.processAllAvailable()
    q.stop()

    got = read_committed(str(out))
    assert {(g["topic"], g["key"], g["value"]) for g in got} \
        == _relay_records_expected(spark, 120)
    # manifests: per-topic delivered counts sum to records written
    import json as _json
    total = 0
    for mf in sorted((out / "_commits").glob("*.json")):
        man = _json.loads(mf.read_text())
        total += sum(man["delivered_per_topic"].values())
        assert man["acks"] == "all" and man["retries"] == 5
    assert total == 120
    # no staged leftovers once every batch committed
    assert list((out / "_staging").glob("*")) == []


def test_stream_sink_replayed_epoch_is_idempotent(tmp_path):
    """Driving the writer contract directly: committing the same
    batchId twice keeps ONE copy (duplicate staging dropped), abort
    removes staging without publishing."""
    from pyspark.sql import Row

    from mongo_cdc_spark.sources.kafka_sink import (
        _StubStreamWriter, read_committed)

    base = str(tmp_path / "sink")
    w = _StubStreamWriter(base, {})
    rows = [Row(topic="shop.orders", key=b"k1", value=b"v1"),
            Row(topic="crm.users", key=b"k2", value=b"v2")]
    m1 = w.write(iter(rows))
    w.commit([m1], batchId=0)
    assert len(read_committed(base)) == 2
    # redelivery of epoch 0 after a restart: same data staged again
    m_dup = w.write(iter(rows))
    w.commit([m_dup], batchId=0)
    got = read_committed(base)
    assert len(got) == 2, "replayed epoch must not duplicate records"
    assert {g["topic"] for g in got} == {"shop.orders", "crm.users"}
    # abort: staged but never published
    m_ab = w.write(iter(rows))
    w.abort([m_ab], batchId=1)
    assert len(read_committed(base)) == 2
    import os
    assert os.listdir(os.path.join(base, "_staging")) == []


def test_stream_sink_sweeps_orphaned_task_attempts(tmp_path):
    """A staged file from a task attempt that died before reporting a
    commit message is swept at the next successful commit — and never
    becomes visible to readers."""
    import os

    from pyspark.sql import Row

    from mongo_cdc_spark.sources.kafka_sink import (
        _StubStreamWriter, read_committed)

    base = str(tmp_path / "sink")
    w = _StubStreamWriter(base, {})
    # simulate a dead attempt: staged data, no commit message returned
    w.write(iter([Row(topic="t", key=b"zombie", value=b"z")]))
    m = w.write(iter([Row(topic="t", key=b"k", value=b"v")]))
    w.commit([m], batchId=0)
    assert os.listdir(os.path.join(base, "_staging")) == []
    got = read_committed(base)
    assert [g["key"] for g in got] == [b"k"]
