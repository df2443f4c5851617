"""Engine configuration.

Reads the same environment variables with the same defaults as the
reference relay (/root/reference/main.go:28-36,66-79), so a deployment of
the reference can switch to this engine without changing its env wiring.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _env(name: str, default: str) -> str:
    v = os.environ.get(name, "")
    return v if v else default


@dataclass
class Config:
    # Kafka producer side (main.go:28-47)
    kafka_bootstrap_servers: str = field(
        default_factory=lambda: _env("KAFKA_BOOTSTRAP_SERVERS", "localhost:9092"))
    kafka_acks: str = field(default_factory=lambda: _env("KAFKA_ACKS", "all"))
    kafka_retries: int = 5  # main.go:42 (hard-coded in the reference)

    # MongoDB source side (main.go:66-79)
    mongo_uri: str = field(
        default_factory=lambda: _env("MONGO_URI", "mongodb://localhost:27017"))
    mongo_db: str = field(default_factory=lambda: _env("MONGO_DB", "test"))
    mongo_collection: str = field(
        default_factory=lambda: _env("MONGO_COLLECTION", "test_new"))

    # Spark-side additions (strict improvements over the reference, which
    # has no durable resume position — main.go:95,103 re-subscribes at "now").
    checkpoint_location: str | None = None

    def kafka_writer_options(self) -> dict[str, str]:
        """writeStream.format('kafka') options preserving reference
        producer semantics: acks=all, retries=5 (main.go:39-43)."""
        return {
            "kafka.bootstrap.servers": self.kafka_bootstrap_servers,
            "kafka.acks": self.kafka_acks,
            "kafka.retries": str(self.kafka_retries),
        }

    def mongo_reader_options(self) -> dict[str, str]:
        """readStream.format('mongodb') options mirroring
        Watch(fullDocument=updateLookup, batchSize=100) (main.go:90-99)."""
        return {
            "spark.mongodb.connection.uri": self.mongo_uri,
            "spark.mongodb.database": self.mongo_db,
            "spark.mongodb.collection": self.mongo_collection,
            "spark.mongodb.change.stream.lookup.full.document": "updateLookup",
        }
