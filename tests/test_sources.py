"""Source surface tests (SURVEY §2.1 S1/T8): the Kafka reader's option
surface, verified WITHOUT the spark-sql-kafka jar (absent in this
environment) — the risk a never-executed reader carries is option typos, and
the option dict is a pure function we can pin to the reference's values
(TransactionalCdcProcessingApp.scala:85-92; reference.conf:33-36)."""

from __future__ import annotations

import pytest

from pyspark_cdc_engine.sources import kafka_options, read_kafka_stream


def test_kafka_option_surface_matches_reference():
    opts = kafka_options("broker1:9092,broker2:9092", "ora-cdc-topic")
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "ora-cdc-topic",
        "startingOffsets": "earliest",  # reference replays from the beginning
        "failOnDataLoss": "false",  # tolerate compacted/expired offsets
    }


def test_kafka_offsets_and_data_loss_overrides():
    """T8: offsets/replay knobs pass through verbatim, booleans lowercased the
    way the Kafka source expects."""
    opts = kafka_options(
        "b:9092", "t", starting_offsets="latest", fail_on_data_loss=True
    )
    assert opts["startingOffsets"] == "latest"
    assert opts["failOnDataLoss"] == "true"
    json_offsets = '{"t":{"0":1234}}'
    assert kafka_options("b:9092", "t", starting_offsets=json_offsets)[
        "startingOffsets"
    ] == json_offsets


def test_read_kafka_stream_reaches_source_resolution(spark):
    """The full builder path executes up to DataSource lookup: without the
    Kafka jar the failure must be the missing-provider error (options were
    accepted), not a Python-side error in our builder."""
    with pytest.raises(Exception, match="(?i)kafka"):
        read_kafka_stream(spark, "localhost:9092", "topic")
