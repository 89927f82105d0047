"""Column mapping: ALTER TABLE RENAME/DROP COLUMN as LOG-ONLY commits with
stable physical names (db/schema_evolution.sql:25-40 under
delta.columnMapping.mode=name), plus the documented DOUBLE->DECIMAL migration
recipe (db/schema_evolution.sql:52-104)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_cdc_engine.tables import DeltaliteTable, MergeClause


def _mk(spark, path, rows=5):
    t = DeltaliteTable(spark, str(path))
    df = spark.range(rows).select(
        F.col("id").alias("order_id"),
        (F.col("id") * 10.0 + 0.5).alias("total_amount"),
        F.concat(F.lit("s"), F.col("id")).alias("status"),
    )
    t.overwrite(df)
    return t


def test_rename_column_is_log_only(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    live_before = t._read_commit(t.latest_version())["live"]
    v = t.rename_column("total_amount", "grand_total")
    commit = t._read_commit(v)
    assert commit["live"] == live_before  # no data rewritten
    assert commit["operation"] == "rename_column"
    got = t.read()
    assert got.columns == ["order_id", "grand_total", "status"]
    assert sorted(r.grand_total for r in got.collect()) == [
        0.5, 10.5, 20.5, 30.5, 40.5,
    ]
    # physical files still carry the ORIGINAL name — existing parquet valid
    import pyarrow.parquet as pq

    f = next((t._root / live_before[0]).rglob("*.parquet"))
    assert "total_amount" in pq.ParquetFile(f).schema_arrow.names
    # time travel shows the pre-rename schema
    assert "total_amount" in t.read(version=v - 1).columns


def test_rename_validations(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    with pytest.raises(ValueError, match="no such column"):
        t.rename_column("ghost", "x")
    with pytest.raises(ValueError, match="column exists"):
        t.rename_column("status", "order_id")
    t.add_constraint("amt_pos", "total_amount >= 0")
    with pytest.raises(ValueError, match="constraint"):
        t.rename_column("total_amount", "amt")


def test_rename_partition_column_rejected(spark, tmp_path):
    t = DeltaliteTable(spark, str(tmp_path / "p"))
    df = spark.range(4).select(
        F.col("id"), (F.col("id") % 2).alias("bucket")
    )
    t.overwrite(df, partition_by=["bucket"])
    with pytest.raises(ValueError, match="partition column"):
        t.rename_column("bucket", "b2")
    with pytest.raises(ValueError, match="partition column"):
        t.drop_column("bucket")


def test_append_and_merge_after_rename(spark, tmp_path):
    """New writes land under the PHYSICAL name; merges on the logical name
    work, and write-time stats pruning still keys correctly."""
    t = _mk(spark, tmp_path / "t")
    t.rename_column("total_amount", "grand_total")
    more = spark.createDataFrame(
        [(100, 999.0, "s100")], ["order_id", "grand_total", "status"]
    )
    t.append(more)
    assert t.read().count() == 6
    import pyarrow.parquet as pq

    latest_commit = t._read_commit(t.latest_version())
    new_dir = [d for d in latest_commit["live"]][-1]
    f = next((t._root / new_dir).rglob("*.parquet"))
    names = pq.ParquetFile(f).schema_arrow.names
    assert "total_amount" in names and "grand_total" not in names

    src = spark.createDataFrame([(100, 111.0)], ["order_id", "grand_total"])
    t.merge(
        src,
        "target.order_id = source.order_id",
        [MergeClause("update", None, {"grand_total": "source.grand_total"})],
        prune_on="order_id",
    )
    assert t.read().filter("order_id = 100").first().grand_total == 111.0
    # scan pruning on the logical name routes through the mapping
    assert t.scan(key_bounds={"order_id": (100, None)}).count() == 1


def test_drop_column_log_only_and_never_resurrects(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    live_before = t._read_commit(t.latest_version())["live"]
    v = t.drop_column("status")
    commit = t._read_commit(v)
    assert commit["live"] == live_before  # log-only
    got = t.read()
    assert got.columns == ["order_id", "total_amount"]
    # bytes remain in the files (Delta semantics), the scan just prunes them
    import pyarrow.parquet as pq

    f = next((t._root / live_before[0]).rglob("*.parquet"))
    assert "status" in pq.ParquetFile(f).schema_arrow.names
    # time travel to pre-drop still surfaces the column
    assert "status" in t.read(version=v - 1).columns
    # re-adding the same name maps to a FRESH physical column: all nulls,
    # the old bytes cannot leak back
    t.add_column("status", "string")
    vals = [r.status for r in t.read().collect()]
    assert vals == [None] * 5
    assert t._mapping(t._read_commit(t.latest_version()))["status"].startswith("col-")
    # and new writes of it round-trip
    t.append(
        spark.createDataFrame([(7, 70.5, "fresh")],
                              ["order_id", "total_amount", "status"])
    )
    assert t.read().filter("order_id = 7").first().status == "fresh"


def test_drop_column_validations(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    with pytest.raises(ValueError, match="no such column"):
        t.drop_column("ghost")
    t.add_constraint("amt_pos", "total_amount >= 0")
    with pytest.raises(ValueError, match="constraint"):
        t.drop_column("total_amount")


def test_restore_across_rename_pins_old_mapping(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    v0 = t.latest_version()
    t.rename_column("total_amount", "grand_total")
    assert "grand_total" in t.read().columns
    t.restore(v0)
    got = t.read()
    assert got.columns == ["order_id", "total_amount", "status"]
    assert sorted(r.total_amount for r in got.collect())[0] == 0.5


def test_stream_after_rename(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.rename_column("total_amount", "grand_total")
    sdf = t.read_stream()
    assert sdf.columns == ["order_id", "grand_total", "status"]


def test_decimal_migration_recipe(spark, tmp_path):
    """The documented DOUBLE->DECIMAL type migration
    (db/schema_evolution.sql:52-104): add a DECIMAL column, backfill with a
    cast, drop the DOUBLE original, rename the new column into its place."""
    t = _mk(spark, tmp_path / "t")
    t.add_column("total_amount_dec", "decimal(20,4)")
    backfilled = t.read().withColumn(
        "total_amount_dec", F.col("total_amount").cast("decimal(20,4)")
    )
    t.overwrite(backfilled)
    t.drop_column("total_amount")
    t.rename_column("total_amount_dec", "total_amount")

    got = t.read()
    # the migrated column sits where add_column appended it (no reorder op,
    # same as Delta); the logical surface is otherwise identical
    assert got.columns == ["order_id", "status", "total_amount"]
    assert dict(got.dtypes)["total_amount"] == "decimal(20,4)"
    from decimal import Decimal

    assert sorted(r.total_amount for r in got.collect()) == [
        Decimal("0.5000"), Decimal("10.5000"), Decimal("20.5000"),
        Decimal("30.5000"), Decimal("40.5000"),
    ]
    # appends under the migrated schema keep working and enforce the new type
    t.append(
        spark.createDataFrame(
            [(9, "s9", Decimal("99.1234"))],
            "order_id long, status string, total_amount decimal(20,4)",
        )
    )
    assert t.read().count() == 6
    # the log-only tail of the migration cost zero data rewrites
    ops = [c["operation"] for c in t.history()]
    assert ops[1:3] == ["rename_column", "drop_column"]


def test_compact_and_zorder_preserve_mapping(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.rename_column("total_amount", "grand_total")
    t.append(
        spark.createDataFrame([(50, 5.0, "x")],
                              ["order_id", "grand_total", "status"])
    )
    t.compact()
    got = t.read()
    assert got.columns == ["order_id", "grand_total", "status"]
    assert got.count() == 6
    t.zorder_by("order_id")
    assert t.read().columns == ["order_id", "grand_total", "status"]
    assert t.scan(key_bounds={"order_id": (50, None)}).count() == 1


def test_partition_promotion_of_renamed_column_rejected(spark, tmp_path):
    """Review r5: partitionBy on a RENAMED column would write physical-named
    data under logical-named dirs — must be rejected loudly, not silently
    split."""
    t = _mk(spark, tmp_path / "t")
    t.rename_column("status", "state")
    with pytest.raises(ValueError, match="renamed column"):
        t.overwrite(
            spark.createDataFrame(
                [(1, 2.0, "x")], ["order_id", "total_amount", "state"]
            ),
            partition_by=["state"],
        )


def test_change_feed_spans_rename_under_latest_names(spark, tmp_path):
    """read_changes across a RENAME COLUMN must surface ONE consistent set of
    logical names (the end version's) — physical names are stable, so
    pre-rename dirs read fine under the latest schema."""
    t = _mk(spark, tmp_path / "t")       # v0: 5 rows
    t.append(spark.createDataFrame(
        [(10, 1.0, "s10")], ["order_id", "total_amount", "status"]))  # v1
    t.rename_column("total_amount", "grand_total")                    # v2
    t.append(spark.createDataFrame(
        [(11, 2.0, "s11")], ["order_id", "grand_total", "status"]))   # v3
    feed = t.read_changes(0)
    assert set(feed.columns) == {
        "order_id", "grand_total", "status", "_change_type", "_commit_version",
        "_commit_timestamp",
    }
    got = {(r.order_id, r.grand_total) for r in feed.collect()}
    assert got == {(10, 1.0), (11, 2.0)}


def test_incremental_aggregate_survives_rename_of_key(spark, tmp_path):
    """The MV refresh machinery reads through the change feed: a rename of a
    non-aggregated column between refreshes must not break folding."""
    from pyspark_cdc_engine.incremental import IncrementalAggregate

    t = DeltaliteTable(spark, str(tmp_path / "base"))
    t.overwrite(spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], ["id", "grp", "amt"]))
    mv = IncrementalAggregate(spark, t, str(tmp_path / "mv"), ["grp"], ["amt"])
    mv.refresh()
    t.rename_column("id", "row_id")  # untouched by the aggregate
    t.append(spark.createDataFrame([(3, "a", 5.0)], ["row_id", "grp", "amt"]))
    mv.refresh()
    got = {r.grp: (r.cnt, r.sum_amt) for r in mv.read().collect()}
    assert got == {"a": (2, 15.0), "b": (1, 20.0)}
    # the log-only rename must NOT have forced a snapshot rebuild: the fold
    # landed as an O(delta) merge, not an overwrite
    fold_ops = [c["operation"] for c in mv.summary.history()
                if c["operation"] not in ("refresh",)]
    assert "merge" in fold_ops[:2]


def test_incremental_rebuilds_when_schema_commit_touches_its_columns(
    spark, tmp_path
):
    """Review r5b: drop-then-re-add of a SUMMED column must force a rebuild —
    additive folding across the shadowing would mix old and new physical
    columns and silently diverge from the MV's definition."""
    from pyspark.sql import functions as F

    from pyspark_cdc_engine.incremental import IncrementalAggregate

    t = DeltaliteTable(spark, str(tmp_path / "base"))
    t.overwrite(spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], ["id", "grp", "amt"]))
    mv = IncrementalAggregate(spark, t, str(tmp_path / "mv"), ["grp"], ["amt"])
    mv.refresh()
    t.drop_column("amt")
    t.add_column("amt", "double")  # fresh physical column: old rows read null
    t.append(spark.createDataFrame([(3, "a", 5.0)], ["id", "grp", "amt"]))
    mv.refresh()
    got = {r.grp: (r.cnt, r.sum_amt) for r in mv.read().collect()}
    # rebuild semantics: old rows' amt is NULL now, only the new row sums
    assert got == {"a": (2, 5.0), "b": (1, None)}
    ops = [c["operation"] for c in mv.summary.history() if c["operation"] != "refresh"]
    assert ops[0] == "overwrite"  # the fold was a rebuild, not a merge


def test_dml_after_rename_reads_and_writes_physical_names(spark, tmp_path):
    """DELETE/UPDATE on a renamed column must read physical names and write
    them back — the full DML x column-mapping matrix."""
    t = _mk(spark, tmp_path / "t")  # (order_id, total_amount, status)
    t.rename_column("total_amount", "grand_total")
    t.update({"grand_total": "grand_total + 1.0"}, "order_id = 0")
    t.delete("grand_total > 35.0")  # drops order_id 4 (40.5)
    got = t.read()
    assert got.columns == ["order_id", "grand_total", "status"]
    vals = {r.order_id: r.grand_total for r in got.collect()}
    assert vals == {0: 1.5, 1: 10.5, 2: 20.5, 3: 30.5}
    # new files still carry the PHYSICAL name
    import pyarrow.parquet as pq

    latest = t._read_commit(t.latest_version())["live"][-1]
    f = next((t._root / latest).rglob("*.parquet"))
    names = pq.ParquetFile(f).schema_arrow.names
    assert "total_amount" in names and "grand_total" not in names
    # and the change feed reconstructs the deleted row under current names
    feed = t.read_changes(0).filter("_change_type = 'delete'")
    assert [r.order_id for r in feed.collect()] == [4]


def test_merge_schema_append_cannot_resurrect_dropped_bytes(spark, tmp_path):
    """Schema evolution via append(merge_schema=True) must apply the same
    retired-physical-name guard as add_column: re-introducing a dropped
    column through the merge path gets a FRESH physical name, so the old
    files' bytes read as nulls instead of silently resurrecting."""
    t = _mk(spark, tmp_path / "t")  # (order_id, total_amount, status)
    t.drop_column("status")
    t.append(
        spark.createDataFrame([(9, 90.5, "new9")],
                              ["order_id", "total_amount", "status"]),
        merge_schema=True,
    )
    mapping = t._mapping(t._read_commit(t.latest_version()))
    assert mapping["status"].startswith("col-")
    vals = {r.order_id: r.status for r in t.read().collect()}
    assert vals[9] == "new9"
    assert all(vals[i] is None for i in range(5))  # pre-drop rows: no leak
    # new file on disk carries the generated physical name, not 'status'
    import pyarrow.parquet as pq

    latest = t._read_commit(t.latest_version())["live"][-1]
    f = next((t._root / latest).rglob("*.parquet"))
    names = pq.ParquetFile(f).schema_arrow.names
    assert mapping["status"] in names and "status" not in names


def test_merge_schema_append_after_rename_no_duplicate_physical(spark, tmp_path):
    """Re-adding a renamed-AWAY name via merge-schema append must not map two
    logical columns onto one physical field in the scan schema."""
    t = _mk(spark, tmp_path / "t")
    t.rename_column("status", "state")  # physical 'status' still in files
    t.append(
        spark.createDataFrame([(9, 90.5, "st9", "tag9")],
                              ["order_id", "total_amount", "state", "status"]),
        merge_schema=True,
    )
    mapping = t._mapping(t._read_commit(t.latest_version()))
    assert mapping["state"] == "status"          # rename mapping intact
    assert mapping["status"].startswith("col-")  # fresh physical, no dup
    got = {r.order_id: (r.state, r.status) for r in t.read().collect()}
    assert got[9] == ("st9", "tag9")
    assert got[0] == ("s0", None)  # old rows: renamed col reads, new col null


def test_overwrite_prunes_dangling_mapping(spark, tmp_path):
    """overwrite replaces all files: mapping entries for columns absent from
    the new schema must be pruned (and retired physicals reset) or a later
    add_column of the old logical name maps two logicals onto one physical
    and every read fails."""
    t = _mk(spark, tmp_path / "t")
    t.rename_column("total_amount", "grand_total")  # grand_total -> total_amount
    t.overwrite(
        spark.createDataFrame([(1, 11.0)], ["order_id", "total_amount"])
    )
    commit = t._read_commit(t.latest_version())
    assert commit["column_mapping"] == {}
    assert commit["retired_physical"] == []
    t.add_column("grand_total", "double")  # the old logical name, reused
    got = t.read()
    assert got.columns == ["order_id", "total_amount", "grand_total"]
    row = got.first()
    assert (row.total_amount, row.grand_total) == (11.0, None)


def test_overwrite_keeps_mapping_for_surviving_columns(spark, tmp_path):
    """A renamed column still present in the overwrite frame keeps its stable
    physical name across the rewrite (streaming readers project by physical
    name across commits)."""
    t = _mk(spark, tmp_path / "t")
    t.rename_column("total_amount", "grand_total")
    t.overwrite(
        spark.createDataFrame([(1, 11.0, "x")],
                              ["order_id", "grand_total", "status"])
    )
    commit = t._read_commit(t.latest_version())
    assert commit["column_mapping"] == {"grand_total": "total_amount"}
    import pyarrow.parquet as pq

    f = next((t._root / commit["live"][0]).rglob("*.parquet"))
    assert "total_amount" in pq.ParquetFile(f).schema_arrow.names
    assert t.read().first().grand_total == 11.0


def test_overwrite_drops_mapping_on_physical_name_collision(spark, tmp_path):
    """rename a->b then overwrite with BOTH a and b present: keeping b->a
    would write two physical 'a' fields into one parquet schema. The entry is
    dropped; b rebinds to its own name in the rewritten files."""
    t = _mk(spark, tmp_path / "t")
    t.rename_column("total_amount", "grand_total")
    t.overwrite(
        spark.createDataFrame(
            [(1, 11.0, 99.0)], ["order_id", "grand_total", "total_amount"]
        )
    )
    commit = t._read_commit(t.latest_version())
    assert commit["column_mapping"] == {}
    row = t.read().first()
    assert (row.grand_total, row.total_amount) == (11.0, 99.0)


def test_update_images_in_feed_after_rename(spark, tmp_path):
    """CDF update_preimage/update_postimage × column mapping: the UPDATE's
    predicate and SET were recorded under the commit's logical names; a feed
    read AFTER a later rename must surface both images under the END
    version's names (stable physical identity), with pre/post values
    correct."""
    t = _mk(spark, tmp_path / "t")  # (order_id, total_amount, status), 5 rows
    t.update({"total_amount": "total_amount + 100.0"}, "order_id <= 1")  # v1
    t.rename_column("total_amount", "grand_total")                      # v2
    feed = t.read_changes(0)
    assert "grand_total" in feed.columns and "total_amount" not in feed.columns
    pre = {r.order_id: r.grand_total
           for r in feed.filter("_change_type = 'update_preimage'").collect()}
    post = {r.order_id: r.grand_total
            for r in feed.filter("_change_type = 'update_postimage'").collect()}
    assert pre == {0: 0.5, 1: 10.5}
    assert post == {0: 100.5, 1: 110.5}
    assert feed.filter("_change_type LIKE 'update%'").count() == 4
