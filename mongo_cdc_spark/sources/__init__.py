"""Custom sources built on Spark 4's Python DataSource API.

The reference's only source is a MongoDB change-stream cursor
(/root/reference/main.go:90-99) and its only sink a Kafka producer
(main.go:39-62,145-154). In production our engine uses the mongodb
streaming connector and the kafka sink (cdc/pipeline.py); this package
adds HERMETIC twins implemented against the same DataSource V2
contracts the real connectors implement — batch reader with partition
planning, streaming reader with offset tracking, and a streaming
WRITER with two-phase task-stage/driver-commit + replayed-epoch
idempotence — so both ends of the relay seam are exercised end-to-end
without a live Mongo or broker.
"""

from mongo_cdc_spark.sources.cdc_source import (  # noqa: F401
    SyntheticChangeStreamDataSource,
)
from mongo_cdc_spark.sources.cdc_source import (
    register_sources as _register_reader,
)
from mongo_cdc_spark.sources.kafka_sink import (  # noqa: F401
    KafkaStubSink,
    read_committed,
)


def register_sources(spark) -> None:
    """Idempotent registration of all custom Python data sources."""
    _register_reader(spark)
    spark.dataSource.register(KafkaStubSink)
