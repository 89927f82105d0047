"""CDC parsing: raw JSON strings -> typed, schema-unified event frames.

Reference parity: parseDataChangeEvents / parseTransactionMetadata
(TransactionalCdcProcessingApp.scala:94-133) — from_json with a declared
schema, project, tag with event_type, pad the other family's columns with
typed nulls so the streams union by position/name (U1), then filter unkeyed
rows (P4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_cdc_engine.schemas import CDC_EVENT_SCHEMA, TX_METADATA_SCHEMA


def parse_data_change_events(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """GG 'op'-format JSON -> typed CDC rows, tagged DATA, metadata columns padded
    with typed nulls (TransactionalCdcProcessingApp.scala:94-113)."""
    data = raw.select(
        F.from_json(F.col(value_col).cast("string"), CDC_EVENT_SCHEMA).alias("d")
    )
    return data.select(
        F.col("d.table").alias("table"),
        F.col("d.op_type").alias("op_type"),
        F.col("d.op_ts").alias("op_ts"),
        F.col("d.current_ts").alias("current_ts"),
        F.col("d.pos").alias("pos"),
        F.col("d.csn").alias("csn"),
        F.col("d.xid").alias("xid"),
        F.col("d.before").alias("before"),
        F.col("d.after").alias("after"),
        F.lit("DATA").alias("event_type"),
        F.lit(None).cast("int").alias("expected_count"),
        F.lit(None)
        .cast("array<struct<data_collection:string,event_count:int>>")
        .alias("data_collections"),
    )


def parse_transaction_metadata(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Tx-metadata JSON -> typed control rows, tagged METADATA, CDC columns padded
    (TransactionalCdcProcessingApp.scala:115-133)."""
    data = raw.select(
        F.from_json(F.col(value_col).cast("string"), TX_METADATA_SCHEMA).alias("d")
    )
    return data.select(
        F.lit(None).cast("string").alias("table"),
        F.lit(None).cast("string").alias("op_type"),
        F.lit(None).cast("string").alias("op_ts"),
        F.col("d.tx_ts").alias("current_ts"),
        F.lit(None).cast("string").alias("pos"),
        F.col("d.csn").alias("csn"),
        F.col("d.xid").alias("xid"),
        F.lit(None).cast("map<string,string>").alias("before"),
        F.lit(None).cast("map<string,string>").alias("after"),
        F.lit("METADATA").alias("event_type"),
        F.col("d.event_count").alias("expected_count"),
        F.col("d.data_collections").alias("data_collections"),
    )


def unify_event_streams(cdc: DataFrame, metadata: DataFrame) -> DataFrame:
    """Union the tagged streams and drop unkeyed events
    (TransactionalCdcProcessingApp.scala:59-63) + build the tx grouping key
    (xid:csn, :71)."""
    unioned = cdc.unionByName(metadata)
    return unioned.filter(
        F.col("xid").isNotNull() & F.col("csn").isNotNull()
    ).withColumn("tx_key", F.concat_ws(":", "xid", "csn"))
