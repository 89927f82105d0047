"""Generated columns (GENERATED ALWAYS AS — Delta's generated-columns
analog): declared at overwrite, computed for writes that omit them,
enforced by auto-registered gen_<name> CHECK constraints for writes that
provide them, and usable as (derived) partition columns for pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_cdc_engine.tables import DeltaliteTable


def _mk(spark, path):
    t = DeltaliteTable(spark, str(path))
    t.overwrite(
        spark.range(10).selectExpr("id", "id * 100 AS cents"),
        generated={"dollars": "cents div 100"},
    )
    return t


def test_generated_computed_at_bootstrap_and_append(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    assert t.generated_columns() == {"dollars": "cents div 100"}
    got = {r.id: r.dollars for r in t.read().collect()}
    assert got == {i: i for i in range(10)}
    # an append OMITTING the column gets it computed
    t.append(spark.range(10, 12).selectExpr("id", "id * 100 AS cents"))
    got = {r.id: r.dollars for r in t.read().collect()}
    assert got == {i: i for i in range(12)}


def test_provided_consistent_value_accepted_inconsistent_rejected(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    ok = spark.range(20, 22).selectExpr("id", "id * 100 AS cents", "id AS dollars")
    t.append(ok)
    bad = spark.range(30, 32).selectExpr("id", "id * 100 AS cents", "id + 1 AS dollars")
    with pytest.raises(ValueError, match="gen_dollars"):
        t.append(bad)
    assert t.read().count() == 12  # the bad write never landed


def test_generated_partition_column_prunes(spark, tmp_path):
    t = DeltaliteTable(spark, str(tmp_path / "p"))
    t.overwrite(
        spark.range(100).selectExpr("id", "id * 1.0 AS v"),
        generated={"bucket": "id div 25"},
        partition_by=["bucket"],
    )
    # derived partition column appears and partitions the layout
    assert sorted({r.bucket for r in t.read().collect()}) == [0, 1, 2, 3]
    plan = t.read().filter("bucket = 2")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert t.read().filter("bucket = 2").count() == 25


def test_spec_survives_overwrite_and_dml(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    # overwrite WITHOUT restating the spec keeps it and recomputes
    t.overwrite(spark.range(5).selectExpr("id", "id * 200 AS cents"))
    assert t.generated_columns() == {"dollars": "cents div 100"}
    assert {r.id: r.dollars for r in t.read().collect()} == {i: 2 * i for i in range(5)}
    # DML rewrites carry the column through untouched
    t.delete("id = 0")
    t.update({"cents": "cents + 100", "dollars": "dollars + 1"}, "id = 1")
    assert {r.id: r.dollars for r in t.read().collect()} == {1: 3, 2: 4, 3: 6, 4: 8}
    # explicit empty spec drops generation, but the gen_ CHECK constraint
    # stays until dropped (documented): consistent data passes...
    t.overwrite(spark.range(3).selectExpr("id", "id * 100 AS cents", "id AS dollars"),
                generated={})
    assert t.generated_columns() == {}
    # ...inconsistent data still fails until the constraint is dropped
    with pytest.raises(ValueError, match="gen_dollars"):
        t.append(spark.range(3, 4).selectExpr("id", "id AS cents", "id * 7 AS dollars"))
    t.drop_constraint("gen_dollars")
    t.append(spark.range(3, 4).selectExpr("id", "id AS cents", "id * 7 AS dollars"))
    assert t.read().count() == 4


def test_update_recomputes_generated_columns(spark, tmp_path):
    """Delta recomputes GENERATED ALWAYS AS columns whose inputs a cow
    UPDATE modifies; a stale value would otherwise fail the gen_ CHECK and
    refuse the whole update (r6 advice)."""
    t = _mk(spark, tmp_path / "t")
    t.update({"cents": "cents + 100"}, "id < 3")
    got = {r.id: (r.cents, r.dollars) for r in t.read().collect()}
    for i in range(10):
        expect_cents = i * 100 + (100 if i < 3 else 0)
        assert got[i] == (expect_cents, expect_cents // 100), i


def test_update_recompute_keeps_cdf_postimages_consistent(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.enable_cdf()
    v0 = t.latest_version()
    t.update({"cents": "cents + 100"}, "id = 1")
    feed = t.read_changes(v0).collect()
    post = [r for r in feed if r["_change_type"] == "update_postimage"]
    assert len(post) == 1 and post[0]["dollars"] == post[0]["cents"] // 100


def test_update_explicit_generated_value_still_checked(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    with pytest.raises(ValueError, match="gen_dollars"):
        t.update({"dollars": "dollars + 5"}, "id = 0")
