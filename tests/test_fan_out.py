"""Structural gates for the r13 fan_out optimization (guide §2.5) and the
r12/r13 shared-kernel plan claims — asserting the *shape*, not the timing,
so a future refactor can't silently regress them (r12 verdict ask #6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_cdc_engine.operators.registry import fan_out
from tests.conftest import SF_DIR

# The gate only fans inputs >= engine.fan-out-min-bytes (128 KB default):
# the sf0.001 test corpus sits below the floor BY DESIGN (fanning it only
# slows the oracle lane), so the gate tests read the sf0.1 file, which is
# in the fan window (800 KB, one row group, one split).
SF01_EMB = "/root/testdata/sf0.1/embeddings.parquet"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_fan_out_raises_single_split_scan_to_core_count(spark):
    df = spark.read.parquet(SF01_EMB)
    assert df.rdd.getNumPartitions() == 1  # the bench corpora under-split
    fanned = fan_out(df)
    assert fanned.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_fan_out_is_noop_when_scan_already_parallelizes(spark):
    df = spark.read.parquet(SF01_EMB)
    prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        # shrink the split size so the SAME file is estimated to out-split
        # the core count — the production-scale shape
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
        fanned = fan_out(df)
        assert "Exchange" not in _plan(fanned)
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev)


def test_fan_out_does_not_stack_on_composition(spark):
    df = spark.read.parquet(SF01_EMB)
    once = fan_out(df)
    twice = fan_out(once.select("vec_id", "embedding"))
    assert _plan(twice).count("Exchange") == 1


def test_fan_out_skips_materialized_frames(spark):
    df = spark.read.parquet(SF01_EMB)
    cut = fan_out(df, cut=True)
    assert cut.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    refan = fan_out(cut.select("vec_id"))
    assert "Exchange" not in _plan(refan)


def test_fan_out_preserves_rows(spark):
    df = spark.read.parquet(SF01_EMB).select("vec_id")
    a = sorted(r.vec_id for r in df.collect())
    b = sorted(r.vec_id for r in fan_out(df).collect())
    assert a == b


def test_fan_out_floor_skips_tiny_inputs(spark):
    """Inputs below engine.fan-out-min-bytes never fan — the exchange's
    fixed cost cannot amortize on a few-KB frame (the oracle corpora)."""
    tiny = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")  # ~10 KB
    assert "Exchange" not in _plan(fan_out(tiny))


def test_pq_exact_topk_is_zip_with_free(spark):
    """r12 win #11: the exact PQ ground truth must stay the exploded
    codegen decimal agg, never the interpreted per-pair zip_with fold."""
    from pyspark_cdc_engine.operators.dedup_scale import _pq_exact_topk

    assert "zip_with" not in _plan(_pq_exact_topk(spark, SF_DIR))


def test_hard_negative_mining_single_cross_join(spark):
    """r12 win #1: the pos/neg split must share ONE Q×N cross join (the
    best-positive MAX rides the rank window's exchange)."""
    from pyspark_cdc_engine.operators.vectors import hard_negative_mining

    plan = _plan(hard_negative_mining(spark, SF_DIR))
    assert plan.count("BroadcastNestedLoopJoin") == 1
