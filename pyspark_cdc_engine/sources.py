"""Batch + streaming readers (SURVEY §2.1 S1-S4).

Kafka needs the spark-sql-kafka jar on the classpath (absent in this
environment); the reader is written to the same option surface the reference
uses (TransactionalCdcProcessingApp.scala:85-92) and fails with a clear error
if the integration isn't available. File/text sources stand in for Kafka in
tests (same downstream contract: a ``value`` string column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    fail_on_data_loss: bool = False,
) -> dict[str, str]:
    """The exact option set the reference passes to its Kafka reader
    (TransactionalCdcProcessingApp.scala:85-92; reference.conf:33-36), as a pure
    dict so the surface is unit-testable without the Kafka jar on the
    classpath (tests/test_sources.py)."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    fail_on_data_loss: bool = False,
) -> DataFrame:
    """Kafka streaming source, decoded to a ``value`` string column
    (S1+S2; options per reference.conf:33-36)."""
    opts = kafka_options(bootstrap_servers, topic, starting_offsets, fail_on_data_loss)
    return (
        spark.readStream.format("kafka")
        .options(**opts)
        .load()
        .select(F.col("value").cast("string").alias("value"))
    )


def read_text_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-based stand-in for a Kafka topic: one JSON doc per line, exposed as
    the same ``value`` column contract."""
    return spark.readStream.text(path).select(F.col("value"))


def read_text_batch(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.text(path).select(F.col("value"))
