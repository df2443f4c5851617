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
