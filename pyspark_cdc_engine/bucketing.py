"""Bucketed tables: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a fact-fact join is the shuffle of both sides.
Hive-style bucketing spends that shuffle ONCE at write time: rows are hashed
into ``num_buckets`` files per partition by the join key, and every later join
(or aggregation) keyed on the bucket columns reads matching buckets
pair-wise — Catalyst plans a SortMergeJoin with NO Exchange on either side.
For a current-state table joined every micro-batch (the reference's
``orders_current`` pattern), write-once/join-many bucketing turns the
per-batch shuffle into a per-bootstrap one.

Bucketed tables must be saved through the catalog (``saveAsTable``) — the
bucket spec lives in table metadata, not in the files; ``path`` makes the
table external so the data location stays caller-controlled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by the join key.

    ``sort_cols`` additionally sorts within each bucket file, letting the
    join skip its per-task sort (scan emits the required ordering).
    Bucket counts must match across tables meant to join shuffle-free; pick
    a count that divides the cluster's cores and keeps each bucket's data
    under an executor's memory at full scale."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    """Catalog read — bucket metadata only survives via the catalog, never
    ``spark.read.parquet`` on the files."""
    return spark.table(table_name)
