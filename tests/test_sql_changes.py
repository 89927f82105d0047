"""SQL-only change-feed surface: the ``deltalite_changes`` UDTF and the
``deltalite_cdf`` batch data source (``CREATE TEMPORARY VIEW ... USING``)
must match ``DeltaliteTable.read_changes`` verbatim — Delta's
``table_changes(tbl, from, to)`` analog (db/query_scd1_table.sql:157-158),
inclusive window semantics on both ends."""

import pytest
from pyspark.sql import functions as F

from pyspark_cdc_engine.maintenance import register_sql_maintenance_functions
from pyspark_cdc_engine.tables import DeltaliteTable


@pytest.fixture()
def table(spark, tmp_path):
    t = DeltaliteTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.range(10).select("id", (F.col("id") * 1.5).alias("v")))  # v0
    t.append(spark.range(10, 13).select("id", (F.col("id") * 1.5).alias("v")))  # v1
    t.delete("id >= 11", mode="dv")  # v2
    t.update({"v": "v + 100.0"}, "id = 4", mode="dv")  # v3
    return t


def _key(rows):
    return sorted(
        (
            r["id"],
            r["v"],
            r["_change_type"],
            r["_commit_version"],
            r["_commit_timestamp"],
        )
        for r in rows
    )


def test_udtf_equals_read_changes_verbatim(spark, table):
    register_sql_maintenance_functions(spark)
    got = spark.sql(f"SELECT * FROM deltalite_changes('{table.path}', 0, 3)")
    want = table.read_changes(-1, 3)
    assert got.columns == want.columns
    assert _key(got.collect()) == _key(want.collect())


def test_udtf_window_subset_and_clamp(spark, table):
    register_sql_maintenance_functions(spark)
    got = spark.sql(f"SELECT * FROM deltalite_changes('{table.path}', 2, 3)")
    assert _key(got.collect()) == _key(table.read_changes(1, 3).collect())
    # an end beyond the latest commit clamps, like read_changes
    got2 = spark.sql(f"SELECT * FROM deltalite_changes('{table.path}', 0, 99)")
    assert _key(got2.collect()) == _key(table.read_changes(-1).collect())


def test_udtf_composes_in_plain_sql(spark, table):
    """The point of the SQL surface: aggregate over the feed without any
    Python API in sight."""
    register_sql_maintenance_functions(spark)
    got = {
        (r["_change_type"], r["n"])
        for r in spark.sql(
            f"SELECT _change_type, COUNT(*) AS n "
            f"FROM deltalite_changes('{table.path}', 0, 3) "
            f"GROUP BY _change_type"
        ).collect()
    }
    assert got == {
        ("insert", 13),
        ("delete", 2),
        ("update_preimage", 1),
        ("update_postimage", 1),
    }


def test_udtf_refuses_non_constant_args(spark, table):
    register_sql_maintenance_functions(spark)
    with pytest.raises(Exception, match="constant literal"):
        spark.sql(
            "SELECT c.* FROM VALUES ('x') AS t(p), "
            "LATERAL deltalite_changes(t.p, 0, 3) c"
        ).collect()


def test_batch_view_using_data_source(spark, table):
    """CREATE TEMPORARY VIEW ... USING deltalite_cdf — the DISTRIBUTED SQL
    surface (real Spark scan tasks, Arrow batches) — equals read_changes."""
    from pyspark_cdc_engine.cdf_source import register_cdf_source

    register_cdf_source(spark)
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW changes_v "
        f"USING deltalite_cdf "
        f"OPTIONS (path '{table.path}', "
        f"startingVersion '0', endingVersion '3')"
    )
    got = spark.sql("SELECT * FROM changes_v")
    want = table.read_changes(-1, 3)
    assert got.columns == want.columns
    assert _key(got.collect()) == _key(want.collect())


def test_batch_read_defaults_cover_full_history(spark, table):
    from pyspark_cdc_engine.cdf_source import FORMAT_NAME, register_cdf_source

    register_cdf_source(spark)
    got = spark.read.format(FORMAT_NAME).option("path", table.path).load()
    assert _key(got.collect()) == _key(table.read_changes(-1).collect())
    # subset window via options
    sub = (
        spark.read.format(FORMAT_NAME)
        .option("path", table.path)
        .option("startingVersion", "1")
        .option("endingVersion", "2")
        .load()
    )
    assert _key(sub.collect()) == _key(table.read_changes(0, 2).collect())


def test_sql_surface_refuses_restore_windows(spark, table):
    """RESTORE diffs need prev-state scans — only read_changes derives them;
    the executor-side SQL surfaces must refuse, not silently skip."""
    table.restore(1)  # v4: logical rewind
    register_sql_maintenance_functions(spark)
    with pytest.raises(Exception, match="RESTORE"):
        spark.sql(
            f"SELECT * FROM deltalite_changes('{table.path}', 0, 4)"
        ).collect()
    # but a window NOT covering the restore still works
    got = spark.sql(f"SELECT * FROM deltalite_changes('{table.path}', 0, 3)")
    assert _key(got.collect()) == _key(table.read_changes(-1, 3).collect())


def test_batch_read_empty_window_yields_zero_rows(spark, table):
    """startingVersion beyond the latest commit plans zero slices — an
    empty frame with the full schema, not an error."""
    from pyspark_cdc_engine.cdf_source import FORMAT_NAME, register_cdf_source

    register_cdf_source(spark)
    got = (
        spark.read.format(FORMAT_NAME)
        .option("path", table.path)
        .option("startingVersion", str(table.latest_version() + 1))
        .load()
    )
    assert got.count() == 0
    assert "_change_type" in got.columns
