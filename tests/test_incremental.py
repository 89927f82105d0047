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


def test_streaming_refresh_via_foreachbatch(spark, tmp_path):
    """The MV refresh in its natural habitat: a file stream appends to the
    base table inside foreachBatch and refreshes the summary in the same
    hook — after the stream drains, the summary equals the full recompute
    and every fold after bootstrap was incremental."""
    src = _rows(spark, 0, 300)
    in_dir = tmp_path / "in"
    src.repartition(3).write.mode("overwrite").parquet(str(in_dir))

    base = DeltaliteTable(spark, str(tmp_path / "sbase"))
    mv = IncrementalAggregate(
        spark, base, str(tmp_path / "smv"), keys=["grp"], sum_cols=["v"]
    )

    def sink(df, batch_id):
        base.append(df, txn_app="mv_demo", txn_version=batch_id)
        mv.refresh()

    q = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    assert _got(mv) == _expected(base)
    assert mv.last_refreshed_version() == base.latest_version()
    ops = [h["operation"] for h in mv.summary.history()]
    assert ops.count("overwrite") == 1  # bootstrap only; the rest were merges


def test_crash_between_fold_and_watermark_then_new_appends(spark, tmp_path):
    """Crash after the fold commit but before the watermark commit, THEN new
    base appends before the re-run: the resumed refresh must start from the
    folded version (recorded by the fold commit's txn tag), not the stale
    watermark — otherwise the (since, upto] delta is double-counted."""
    base = DeltaliteTable(spark, str(tmp_path / "base"))
    base.append(_rows(spark, 0, 100))             # v0
    mv = IncrementalAggregate(
        spark, base, str(tmp_path / "mv"), keys=["grp"], sum_cols=["v"]
    )
    mv.refresh()                                   # bootstrap @ v0

    base.append(_rows(spark, 100, 150))           # v1
    orig = mv._record_watermark
    mv._record_watermark = lambda upto: (_ for _ in ()).throw(RuntimeError("crash"))
    try:
        try:
            mv.refresh()                           # folds v1, dies pre-watermark
        except RuntimeError:
            pass
    finally:
        mv._record_watermark = orig

    assert mv.last_refreshed_version() == 1        # fold commit counts

    base.append(_rows(spark, 150, 200))           # v2 lands before the re-run
    assert mv.refresh() == 2
    assert _got(mv) == _expected(base)             # v1 delta folded exactly once

    # and a plain replay is still a no-op
    assert mv.refresh() == 2
    assert _got(mv) == _expected(base)
