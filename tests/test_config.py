"""Config parity with the reference's env wiring (main.go:28-36,66-79):
same variables, same defaults, same fallback-on-empty behavior."""

from __future__ import annotations

import os
from unittest import mock

from mongo_cdc_spark.config import Config


def test_defaults_match_reference():
    with mock.patch.dict(os.environ, {}, clear=True):
        cfg = Config()
    assert cfg.kafka_bootstrap_servers == "localhost:9092"
    assert cfg.kafka_acks == "all"
    assert cfg.kafka_retries == 5
    assert cfg.mongo_uri == "mongodb://localhost:27017"
    assert cfg.mongo_db == "test"
    assert cfg.mongo_collection == "test_new"


def test_env_overrides():
    with mock.patch.dict(os.environ, {
        "KAFKA_BOOTSTRAP_SERVERS": "broker:9092",
        "KAFKA_ACKS": "1",
        "MONGO_URI": "mongodb://m:27017",
        "MONGO_DB": "shop",
        "MONGO_COLLECTION": "orders",
    }):
        cfg = Config()
    assert cfg.kafka_bootstrap_servers == "broker:9092"
    assert cfg.kafka_acks == "1"
    assert cfg.mongo_db == "shop"
    assert cfg.mongo_collection == "orders"


def test_empty_env_falls_back_to_default():
    # main.go:66-79's getEnv treats empty string as unset
    with mock.patch.dict(os.environ, {"MONGO_DB": ""}):
        assert Config().mongo_db == "test"


def test_kafka_writer_options_preserve_semantics():
    opts = Config().kafka_writer_options()
    assert opts["kafka.acks"] == "all"
    assert opts["kafka.retries"] == "5"


def test_mongo_reader_options_update_lookup():
    opts = Config().mongo_reader_options()
    assert opts["spark.mongodb.change.stream.lookup.full.document"] == \
        "updateLookup"
