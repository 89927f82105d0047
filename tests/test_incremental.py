"""Incremental aggregate maintenance (materialized-view refresh) over the
deltalite change feed: summary == full recompute after every refresh, folds
are O(delta) merges for append-only windows, and non-append commits force a
(correct) full rebuild."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_cdc_engine.incremental import IncrementalAggregate
from pyspark_cdc_engine.tables import DeltaliteTable, MergeClause


def _rows(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id", "id % 4 AS grp", "CAST(id AS DOUBLE) / 2 AS v"
    )


def _expected(base):
    return {
        (r.grp, r.cnt, round(r.sum_v, 6))
        for r in base.read()
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("v").cast("decimal(28,6)")).cast("double").alias("sum_v"),
        )
        .collect()
    }


def _got(mv):
    return {(r.grp, r.cnt, round(r.sum_v, 6)) for r in mv.read().collect()}


def test_incremental_refresh_matches_full_recompute(spark, tmp_path):
    base = DeltaliteTable(spark, str(tmp_path / "base"))
    base.append(_rows(spark, 0, 100))
    mv = IncrementalAggregate(
        spark, base, str(tmp_path / "mv"), keys=["grp"], sum_cols=["v"]
    )
    assert mv.refresh() == 0  # bootstrap
    assert _got(mv) == _expected(base)

    base.append(_rows(spark, 100, 160))           # v1
    base.append(_rows(spark, 160, 200))           # v2
    assert mv.refresh() == 2
    assert _got(mv) == _expected(base)
    # the fold was a MERGE of the delta, not a rebuild
    ops = [h["operation"] for h in mv.summary.history()]
    assert "merge" in ops and ops.count("overwrite") == 1

    # idempotent / no-op
    assert mv.refresh() == 2
    assert _got(mv) == _expected(base)

    # physical-only commit: watermark advances, no data change
    base.compact(target_partitions=1)             # v3
    assert mv.refresh() == 3
    assert _got(mv) == _expected(base)

    # a merge on the base is not incrementally foldable -> full rebuild
    upd = spark.range(0, 10).selectExpr("id", "id % 4 AS grp", "CAST(999 AS DOUBLE) AS v")
    base.merge(
        upd,
        "target.id = source.id",
        [MergeClause("update", None, {"v": "source.v"})],
    )                                              # v4
    assert mv.refresh() == 4
    assert _got(mv) == _expected(base)
    ops = [h["operation"] for h in mv.summary.history()]
    assert ops.count("overwrite") == 2  # rebuild happened
