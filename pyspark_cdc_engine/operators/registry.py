"""Query registry: one named entry per implemented operator (SURVEY §2).

Every query carries its PySpark implementation and, where expressible, the
equivalent ANSI SQL for the DuckDB oracle. The driver hash-compares the two at
sf0.01 (order-insensitive, columns sorted by name), so:

- every computed column is aliased identically on both sides;
- double aggregations are summed as DECIMAL (exact, order-independent) and cast
  back to DOUBLE, so Spark's and DuckDB's different reduction orders cannot
  produce differing floats;
- timestamps cross the boundary as strings (Spark session TZ pinned to UTC).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@dataclass(frozen=True)
class Query:
    name: str
    survey: str  # SURVEY §2 rows this exercises, e.g. "A2,O1"
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check
    description: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, survey: str, oracle: str | None, description: str = ""):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name, survey, fn, oracle, description or (fn.__doc__ or "").strip())
        return fn

    return deco


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS), which Spark's vectorized reader
        # rejects; read nanos as long and truncate to micros — exactly what DuckDB
        # does natively, so oracle comparisons line up.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        # integer division: double division loses sub-microsecond exactness for
        # nanosecond epochs beyond 2^53 and lands 1us off DuckDB's truncation
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def dsum(col: Column | str, scale: int = 6, precision: int = 28) -> Column:
    """Order-independent double sum: sum as DECIMAL, return DOUBLE.

    Casting each term to decimal is deterministic per row; decimal addition is
    exact, so the reduction order Spark/DuckDB pick cannot change the result.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def dsum_sql(expr: str, scale: int = 6, precision: int = 28) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"


def davg(col: Column | str, scale: int = 6) -> Column:
    """avg = exact decimal sum cast to double, / count — identical both engines."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def davg_sql(expr: str, scale: int = 6) -> str:
    return f"{dsum_sql(expr, scale)} / COUNT({expr})"
