"""Batch + streaming readers (SURVEY §2.1 S1-S4).

Kafka needs the spark-sql-kafka jar on the classpath (absent in this
environment); the reader is written to the same option surface the reference
uses (TransactionalCdcProcessingApp.scala:85-92) and fails with a clear error
if the integration isn't available. Two stand-ins cover tests: the
wire-compatible fake broker (:mod:`pyspark_cdc_engine.fake_kafka`, a PySpark 4
Python data source with Kafka's exact schema/options/offset semantics —
``read_kafka_stream(format_name="fakekafka")`` exercises this module's real
code path end to end), and plain file/text sources (same downstream contract:
a ``value`` string column).
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
    format_name: str = "kafka",
    extra_options: dict[str, str] | None = None,
) -> DataFrame:
    """Kafka streaming source, decoded to a ``value`` string column
    (S1+S2; options per reference.conf:33-36).

    ``format_name`` swaps the wire-compatible test double in
    (:mod:`pyspark_cdc_engine.fake_kafka`, format ``"fakekafka"`` + a
    ``path`` extra option) for environments without the Kafka jar — the
    decode projection and everything downstream are identical either way,
    which is what makes S1 executable end to end in tests."""
    opts = kafka_options(bootstrap_servers, topic, starting_offsets, fail_on_data_loss)
    opts.update(extra_options or {})
    return (
        spark.readStream.format(format_name)
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
