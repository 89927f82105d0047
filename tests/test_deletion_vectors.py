"""Deletion vectors (merge-on-read DELETE, delete(mode="dv")): tombstone
sidecars instead of file rewrites — the Delta DV feature re-expressed on
deltalite. No data file is touched by the delete; every reader anti-joins the
(file, row_index) tombstones; compact() materializes them away."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_cdc_engine.tables import DeltaliteTable, MergeClause


def _mk(spark, path, n=20):
    t = DeltaliteTable(spark, str(path))
    t.overwrite(
        spark.range(n).select(
            F.col("id"), (F.col("id") % 4).alias("k"), (F.col("id") * 1.5).alias("v")
        )
    )
    return t


def test_dv_delete_is_log_plus_sidecar_only(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    live_before = t._read_commit(t.latest_version())["live"]
    v = t.delete("id >= 15", mode="dv")
    commit = t._read_commit(v)
    assert commit["live"] == live_before          # zero data files rewritten
    assert commit["operation"] == "delete" and commit["dv_delete"] is True
    assert len(commit["dv_files"]) == 1
    assert (t._root / commit["dv_files"][0]).is_dir()
    got = sorted(r.id for r in t.read().collect())
    assert got == list(range(15))
    # time travel to the pre-delete version still sees every row
    assert t.read(version=v - 1).count() == 20


def test_dv_stacking_and_scan(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete("id < 3", mode="dv")
    v2 = t.delete("id >= 17", mode="dv")
    assert len(t._read_commit(v2)["dv_files"]) == 2
    assert sorted(r.id for r in t.read().collect()) == list(range(3, 17))
    # scan() applies DVs too (stats pruning composes with tombstones)
    assert sorted(
        r.id for r in t.scan(key_bounds={"id": (0, 5)}).collect()
    ) == [3, 4, 5]


def test_dv_survives_appends_and_feeds_changes(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")                       # v0
    v1 = t.delete("id = 7", mode="dv")                   # v1
    t.append(spark.range(20, 25).select(
        F.col("id"), (F.col("id") % 4).alias("k"), (F.col("id") * 1.5).alias("v")
    ))                                                   # v2
    assert sorted(r.id for r in t.read().collect()) == [
        i for i in range(25) if i != 7
    ]
    feed = t.read_changes(0)
    dels = feed.filter("_change_type = 'delete'").collect()
    assert [(r.id, r._commit_version) for r in dels] == [(7, v1)]
    ins = feed.filter("_change_type = 'insert'")
    assert sorted(r.id for r in ins.collect()) == [20, 21, 22, 23, 24]


def test_second_dv_delete_attributes_only_new_rows(spark, tmp_path):
    """An overlapping predicate must not re-emit rows a prior DV already
    tombstoned — each deleted row belongs to exactly one commit."""
    t = _mk(spark, tmp_path / "t")
    v1 = t.delete("id >= 18", mode="dv")
    v2 = t.delete("id >= 16", mode="dv")      # 18,19 already tombstoned
    feed = t.read_changes(0).filter("_change_type = 'delete'")
    by_commit = {
        v: sorted(r.id for r in feed.filter(f"_commit_version = {v}").collect())
        for v in (v1, v2)
    }
    assert by_commit == {v1: [18, 19], v2: [16, 17]}


def test_compact_materializes_dvs(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete("id % 2 = 1", mode="dv")
    want = sorted(r.id for r in t.read().collect())
    v = t.compact(target_partitions=1)
    commit = t._read_commit(v)
    assert commit.get("dv_files") == []       # tombstones materialized away
    assert sorted(r.id for r in t.read().collect()) == want
    # with DVs gone, the gated surfaces work again
    t.read_stream()  # no raise
    from pyspark_cdc_engine.delta_export import export_delta_snapshot, read_delta_snapshot

    export_delta_snapshot(t, str(tmp_path / "delta"))
    assert read_delta_snapshot(spark, str(tmp_path / "delta")).count() == len(want)


def test_cow_dml_and_merge_do_not_revive_tombstones(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete("id = 5", mode="dv")
    t.update({"v": "v + 100.0"}, "id = 6")    # cow rewrite of every dir
    got = {r.id: r.v for r in t.read().collect()}
    assert 5 not in got and got[6] == pytest.approx(109.0)
    # merge keyed on a tombstoned id must treat it as NOT MATCHED
    src = spark.createDataFrame([(5, 0, 0.0)], ["id", "k", "v"])
    t.merge(
        src,
        "target.id = source.id",
        [MergeClause("update", None, {"v": "source.v"}),
         MergeClause("insert", "source.id >= 0", None)],
    )
    got = {r.id: r.v for r in t.read().collect()}
    assert got[5] == 0.0                      # re-INSERTED, not updated in place
    assert t.read().filter("id = 5").count() == 1


def test_dv_guards_and_restore(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    v_pre = t.latest_version()
    v_dv = t.delete("id < 5", mode="dv")
    with pytest.raises(ValueError, match="deletion vectors"):
        t.read_stream()
    # shallow clone carries the DVs (absolute sidecar refs, like the cloned
    # data dirs): the clone sees the logical snapshot, and DML on the clone
    # never touches the source
    clone = t.clone_to(str(tmp_path / "clone"))
    assert sorted(r.id for r in clone.read().collect()) == sorted(
        r.id for r in t.read().collect()
    )
    clone.delete("id = 7", mode="dv")
    assert clone.read().filter("id = 7").count() == 0
    assert t.read().filter("id = 7").count() == 1
    clone.compact(target_partitions=1)  # materializes: no source _dv refs left
    assert clone._read_commit(clone.latest_version())["dv_files"] == []
    assert sorted(r.id for r in clone.read().collect()) == sorted(
        r.id for r in t.read().filter("id != 7").collect()
    )
    # export MATERIALIZES active DVs per affected file (tombstoned positions
    # dropped during the copy): the destination is plain Delta, equal to the
    # logical snapshot
    from pyspark_cdc_engine.delta_export import (
        export_delta_snapshot,
        read_delta_snapshot,
    )

    export_delta_snapshot(t, str(tmp_path / "delta"))
    back = read_delta_snapshot(spark, str(tmp_path / "delta"))
    assert sorted(r.id for r in back.collect()) == sorted(
        r.id for r in t.read().collect()
    )
    # restore to the pre-DV version clears the tombstones...
    t.restore(v_pre)
    assert t.read().count() == 20
    assert t._read_commit(t.latest_version())["dv_files"] == []
    # ...and restore back onto the DV version re-applies them
    t.restore(v_dv)
    assert sorted(r.id for r in t.read().collect()) == list(range(5, 20))


def test_dv_on_partitioned_table(spark, tmp_path):
    t = DeltaliteTable(spark, str(tmp_path / "p"))
    t.overwrite(
        spark.range(12).select(F.col("id"), (F.col("id") % 3).alias("b")),
        partition_by=["b"],
    )
    t.delete("id >= 9", mode="dv")
    assert sorted(r.id for r in t.read().collect()) == list(range(9))
    assert sorted(r.id for r in t.read().filter("b = 0").collect()) == [0, 3, 6]


def test_dv_stats_pruning_and_txn_idempotency(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    # bounds exclude every dir: commit records the predicate, no sidecar
    v = t.delete("id > 1000", prune_bounds={"id": (1001, None)}, mode="dv")
    assert t._read_commit(v).get("dv_files") is None or \
        t._read_commit(v).get("dv_files") == []
    assert t.read().count() == 20
    # txn replay: the same (app, version) delete is a no-op
    v1 = t.delete("id = 0", mode="dv", txn_app="j", txn_version=1)
    v2 = t.delete("id = 1", mode="dv", txn_app="j", txn_version=1)  # replayed
    assert v2 == v1
    assert sorted(r.id for r in t.read().collect()) == list(range(1, 20))


def test_vacuum_cleans_superseded_dv_sidecars(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete("id = 3", mode="dv")
    dv_rel = t._read_commit(t.latest_version())["dv_files"][0]
    t.compact(target_partitions=1)  # materializes; sidecar now unreferenced
    assert (t._root / dv_rel).is_dir()
    dead = t.vacuum(retain_hours=0.0)
    assert dv_rel in dead
    assert not (t._root / dv_rel).exists()
    assert sorted(r.id for r in t.read().collect()) == [
        i for i in range(20) if i != 3
    ]


def test_dv_delete_after_rename_uses_logical_names(spark, tmp_path):
    """Column mapping composes with DVs: the predicate binds logical names,
    the tombstones are positional (physical-name-agnostic)."""
    t = DeltaliteTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("x")))
    t.rename_column("x", "y")
    t.delete("y >= 14", mode="dv")
    got = sorted((r.id, r.y) for r in t.read().collect())
    assert got == [(i, i * 2) for i in range(7)]
    feed = t.read_changes(1).filter("_change_type = 'delete'")
    assert sorted(r.id for r in feed.collect()) == [7, 8, 9]


def test_dv_update_appends_images_without_rewrites(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    live_before = t._read_commit(t.latest_version())["live"]
    v = t.update({"v": "v + 100.0"}, "id IN (2, 3)", mode="dv")
    commit = t._read_commit(v)
    assert commit["operation"] == "update" and commit["dv_update"] is True
    assert set(live_before) < set(commit["live"])     # old dirs UNTOUCHED
    assert len(commit["dv_files"]) == 1
    assert commit["dv_rows_added"] == 2
    got = {r.id: r.v for r in t.read().collect()}
    assert len(got) == 20
    assert got[2] == pytest.approx(103.0) and got[3] == pytest.approx(104.5)
    assert got[4] == pytest.approx(6.0)               # untouched row intact
    # time travel to pre-update
    assert {r.id: r.v for r in t.read(version=v - 1).collect()}[2] == pytest.approx(3.0)


def test_dv_update_feed_and_stacking_with_dv_delete(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")                         # v0
    v1 = t.delete("id = 2", mode="dv")                     # v1
    v2 = t.update({"v": "0.0 - v"}, "id IN (2, 5)", mode="dv")  # v2: id=2 gone
    got = {r.id: r.v for r in t.read().collect()}
    assert 2 not in got and got[5] == pytest.approx(-7.5)
    feed = t.read_changes(0)
    assert [r.id for r in feed.filter("_change_type = 'delete'").collect()] == [2]
    pre = feed.filter(f"_change_type = 'update_preimage' AND _commit_version = {v2}")
    post = feed.filter(f"_change_type = 'update_postimage' AND _commit_version = {v2}")
    # the tombstoned id=2 was never updated: exactly one pre/post pair (id=5)
    assert [(r.id, r.v) for r in pre.collect()] == [(5, 7.5)]
    assert [(r.id, r.v) for r in post.collect()] == [(5, -7.5)]


def test_dv_update_respects_constraints_and_health_probe(spark, tmp_path):
    from pyspark_cdc_engine.maintenance import table_health

    t = _mk(spark, tmp_path / "t")
    t.add_constraint("v_nonneg", "v >= 0")
    with pytest.raises(ValueError, match="constraint"):
        t.update({"v": "0.0 - v"}, "id = 5", mode="dv")
    t.delete("id < 2", mode="dv")
    t.update({"v": "v + 1.0"}, "id = 9", mode="dv")
    h = table_health(t)
    assert h["dv_sidecars"] == 2 and h["dv_tombstones"] == 3
    assert h["needs_compact_dvs"] is False
    t.compact(target_partitions=1)
    h = table_health(t)
    assert h["dv_sidecars"] == 0 and h["dv_tombstones"] == 0
    got = {r.id: r.v for r in t.read().collect()}
    assert len(got) == 18 and got[9] == pytest.approx(14.5)
