"""End-to-end CDC pipeline: source → transform → sink.

This is the whole reference program (/root/reference/main.go:26-163) as a
single-stage Structured Streaming query, plus the strict improvements
Spark gives for free and we flag as such (SURVEY.md §2.1 notes):
checkpointed resume position (the reference loses its place on crash,
main.go:95,103) and exactly-once batch commits to idempotent sinks.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from mongo_cdc_spark.cdc.schema import CHANGE_EVENT_SCHEMA_PERMISSIVE
from mongo_cdc_spark.cdc.transform import parse_change_events, to_kafka_records
from mongo_cdc_spark.config import Config


def read_change_stream_mongo(spark: SparkSession, cfg: Config) -> DataFrame:
    """Production source: MongoDB change stream via the Spark connector
    (uses change streams underneath; fullDocument=updateLookup mirrors
    main.go:92). The connector jar is not in this image — callers get a
    clear error instead of a stack trace."""
    try:
        return (spark.readStream.format("mongodb")
                .options(**cfg.mongo_reader_options()).load())
    except Exception as exc:  # pragma: no cover - connector not in image
        raise RuntimeError(
            "mongodb connector jar not on classpath; use "
            "read_change_stream_files/kafka for hermetic runs") from exc


def read_change_stream_files(spark: SparkSession, path: str) -> DataFrame:
    """Hermetic source: a file stream of JSON-lines change events (the
    FIXTURES.md §1 shape). Used by tests and local runs; identical
    downstream plan to the Mongo/Kafka sources."""
    return (spark.readStream
            .schema(CHANGE_EVENT_SCHEMA_PERMISSIVE)
            .option("mode", "PERMISSIVE")
            .json(path))


def read_change_stream_kafka(spark: SparkSession, cfg: Config,
                             topic: str) -> DataFrame:
    raw = (spark.readStream.format("kafka")
           .option("kafka.bootstrap.servers", cfg.kafka_bootstrap_servers)
           .option("subscribe", topic)
           .load())
    return parse_change_events(raw, value_col="value")


def relay_to_kafka(events: DataFrame, cfg: Config) -> StreamingQuery:
    """The reference's sink: async Kafka producer with acks=all/retries=5
    (main.go:39-47,145-154). Spark's Kafka sink flushes within each epoch
    before the batch commits — same at-least-once semantics, plus durable
    offsets via the checkpoint (improvement over main.go's lost cursor)."""
    records = to_kafka_records(events)
    writer = (records.writeStream.format("kafka")
              .options(**cfg.kafka_writer_options()))
    if cfg.checkpoint_location:
        writer = writer.option("checkpointLocation", cfg.checkpoint_location)
    return writer.start()


def relay_foreach_batch(events: DataFrame,
                        sink: Callable[[DataFrame, int], None],
                        checkpoint: str | None = None) -> StreamingQuery:
    """Test/alternate sinks (parquet, memory, console) via foreachBatch —
    used to verify the pipeline without a Kafka broker."""
    records = to_kafka_records(events)
    writer = records.writeStream.foreachBatch(sink)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


def run_relay(spark: SparkSession, cfg: Config | None = None,
              source_path: str | None = None) -> StreamingQuery:
    """Wire the full relay: Mongo (or file fixture) → transform → Kafka.

    Equivalent of func main (main.go:26-163); blocking drain is the
    caller's awaitTermination, graceful stop is query.stop() (Spark
    flushes the in-flight epoch — the 15 s Flush at main.go:158)."""
    cfg = cfg or Config()
    if source_path is not None:
        events = read_change_stream_files(spark, source_path)
        events = events.filter(
            "ns.db is not null and ns.coll is not null "
            "and documentKey._id is not null")
    else:
        events = read_change_stream_mongo(spark, cfg)
    return relay_to_kafka(events, cfg)
