"""literal_frame (r12 optimization): LocalRelation literals must be
bit-identical to the classic createDataFrame(list) path and must actually
plan as LocalTableScan (no 32-slice ExistingRDD — the per-scan 32-task
stages were measured at ~2 s per literal materialization on the bench box,
vs ~0.1 s for the LocalRelation form)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

from pyspark_cdc_engine.operators.registry import literal_frame

_SCHEMA = StructType(
    [
        StructField("centroid_id", IntegerType(), False),
        StructField("cemb", ArrayType(DoubleType(), False), False),
    ]
)


def _rows():
    # values with awkward float shapes: exact dyadics, repeating binary,
    # negatives — Arrow float64 must round-trip them all exactly
    return [
        (i, [float(i) + 0.1 * j - 1.0 / (j + 3) for j in range(8)])
        for i in range(5)
    ]


def test_literal_frame_values_identical_to_rdd_path(spark):
    lit = literal_frame(spark, _rows(), _SCHEMA)
    classic = spark.createDataFrame(_rows(), _SCHEMA)
    assert lit.schema == classic.schema
    assert sorted(map(tuple, lit.collect())) == sorted(
        map(tuple, classic.collect())
    )


def test_literal_frame_plans_as_local_relation(spark):
    lit = literal_frame(spark, _rows(), _SCHEMA)
    plan = lit._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan, plan
    assert "ExistingRDD" not in plan, plan


def test_literal_frame_str_schema_and_downstream_agg(spark):
    lit = literal_frame(
        spark, [(0, 1.5), (1, 2.5)], "band_id int, lo double"
    )
    got = lit.agg(F.sum("lo").alias("s")).collect()[0]["s"]
    assert got == 4.0
