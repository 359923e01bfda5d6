"""Connector adapter parity: no Pulsar/ES servers exist in this
container, but the OPTION MAPS the adapters emit are the contract the
real connectors consume — pin them to the reference's configuration
(pulsar.go:27-37, es.go:33-44,160-213, .env) so drift is caught."""

from __future__ import annotations

import pytest


def test_pulsar_option_map_matches_reference_config():
    from go_pulsar_elasticsearch_spark.sources.pulsar import PulsarOptions

    opts = PulsarOptions().to_options()
    assert opts["topics"] == "persistent://public/default/index_topic"
    assert opts["predefinedSubscription"] == "spark-ingest"
    assert opts["pulsar.reader.receiverQueueSize"] == "1000"  # .env:7
    assert opts["service.url"].startswith("pulsar://")
    assert opts["admin.url"].startswith("http://")


def test_es_option_map_matches_reference_config():
    from go_pulsar_elasticsearch_spark.sources.es_sink import EsSinkOptions

    opts = EsSinkOptions().to_options("index_data_2024-01-01")
    assert opts["es.resource"] == "index_data_2024-01-01"  # es.go:79-81
    assert opts["es.mapping.id"] == "uuid"                 # es.go:186
    assert opts["es.write.operation"] == "index"           # last-write-wins
    assert opts["es.batch.size.entries"] == "1000"         # MAX_BATCH_SIZE
    assert opts["es.batch.size.bytes"] == "5mb"            # es.go:166
    assert opts["es.batch.write.retry.count"] == "10"      # RETRIES .env:11
    assert opts["es.batch.write.retry.wait"] == "10s"      # .env:20


def test_pulsar_stream_gates_loudly_without_connector(spark):
    from go_pulsar_elasticsearch_spark.sources.pulsar import (
        PulsarOptions,
        pulsar_stream,
    )

    with pytest.raises(RuntimeError, match="pulsar-spark connector"):
        pulsar_stream(spark, PulsarOptions())
