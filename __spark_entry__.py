"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star-join on sf0.001; ``queries()`` /
``oracle_sql()`` expose the operator registry
(:mod:`pyspark_cdc_engine.operators`) — one named entry per implemented
SURVEY §2 inventory row, each with a DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession

from pyspark_cdc_engine.operators import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["region_revenue"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.spark for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted → rows-only check)."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
