"""Merge-on-read MERGE (tables.merge mode="dv"): clause parity with the
copy-on-write path, no-rewrite guarantee, exact change-feed emission, and
end-to-end streamability through the replicator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_cdc_engine.tables import DeltaliteTable, MergeClause


def _snap(t):
    return sorted(tuple(r) for r in t.read().collect())


def _mk(spark, path, rows):
    t = DeltaliteTable(spark, str(path))
    t.overwrite(spark.createDataFrame(rows, ["id", "v", "status"]))
    return t


_ROWS = [(i, float(i), "old") for i in range(8)]


def _clauses():
    return [
        MergeClause("delete", condition="source.op = 'D'"),
        MergeClause(
            "update",
            condition="source.v > target.v",
            assignments={"v": "source.v", "status": "'updated'"},
        ),
        MergeClause(
            "insert",
            condition="source.op != 'D'",
            assignments={"id": "source.id", "v": "source.v", "status": "'new'"},
        ),
    ]


def _source(spark):
    # id 1: delete; id 2: update fires (v larger); id 3: update does NOT fire
    # (v smaller — matched, no clause satisfied, must stay untouched);
    # id 20: insert; id 21: unmatched delete (applies as nothing)
    return spark.createDataFrame(
        [(1, 99.0, "D"), (2, 22.0, "U"), (3, 0.5, "U"),
         (20, 20.0, "U"), (21, 21.0, "D")],
        ["id", "v", "op"],
    )


def test_dv_merge_matches_cow_merge(spark, tmp_path):
    cow = _mk(spark, tmp_path / "cow", _ROWS)
    dv = _mk(spark, tmp_path / "dv", _ROWS)
    cond = "target.id = source.id"
    cow.merge(_source(spark), cond, _clauses())
    dv.merge(_source(spark), cond, _clauses(), mode="dv")
    assert _snap(dv) == _snap(cow)
    got = {r[0]: (r[1], r[2]) for r in _snap(dv)}
    assert 1 not in got
    assert got[2] == (22.0, "updated")
    assert got[3] == (3.0, "old")
    assert got[20] == (20.0, "new")
    assert 21 not in got


def test_dv_merge_rewrites_no_preexisting_file(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", _ROWS)
    before = set(t._read_commit(t.latest_version())["live"])
    t.merge(_source(spark), "target.id = source.id", _clauses(), mode="dv")
    after = t._read_commit(t.latest_version())
    assert before <= set(after["live"])  # every pre-merge dir still live
    assert after.get("dv_merge") is True
    assert after.get("dv_merge_delete_dvs") and after.get("dv_merge_update_dvs")
    assert after.get("dv_merge_update_dirs") and after.get("dv_merge_insert_dirs")
    # tombstones: id 1 (delete) + id 2 (update pre-image) = 2 positions
    assert after["dv_rows_added"] == 2


def test_dv_merge_change_feed_emits_all_four_kinds(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", _ROWS)
    v = t.merge(_source(spark), "target.id = source.id", _clauses(), mode="dv")
    feed = t.read_changes(v - 1, v)
    by = {}
    for r in feed.collect():
        by.setdefault(r._change_type, []).append((r.id, r.v, r.status))
    assert by["delete"] == [(1, 1.0, "old")]
    assert by["update_preimage"] == [(2, 2.0, "old")]
    assert by["update_postimage"] == [(2, 22.0, "updated")]
    assert by["insert"] == [(20, 20.0, "new")]
    assert all(r._commit_version == v for r in feed.collect())


def test_dv_merge_stacks_on_prior_dvs(spark, tmp_path):
    """Rows tombstoned by an earlier DV delete are invisible to the merge:
    an update-everything clause must not resurrect or re-tombstone them."""
    t = _mk(spark, tmp_path / "t", _ROWS)
    t.delete("id >= 6", mode="dv")
    src = spark.createDataFrame(
        [(i, 100.0 + i, "U") for i in range(8)], ["id", "v", "op"]
    )
    v = t.merge(
        src,
        "target.id = source.id",
        [
            MergeClause("update", condition=None,
                        assignments={"v": "source.v", "status": "'u'"}),
            MergeClause("insert", condition=None),
        ],
        mode="dv",
    )
    got = {r[0]: r[1] for r in _snap(t)}
    # 0-5 updated in place; 6,7 were deleted, so the merge re-INSERTS them
    # (unmatched source) — Delta semantics: a deleted row is gone, a new
    # source row with its key is an insert
    assert got == {i: 100.0 + i for i in range(8)}
    pre = t.read_changes(v - 1, v).filter("_change_type = 'update_preimage'")
    assert sorted(r.id for r in pre.collect()) == [0, 1, 2, 3, 4, 5]
    ins = t.read_changes(v - 1, v).filter("_change_type = 'insert'")
    assert sorted(r.id for r in ins.collect()) == [6, 7]


def test_dv_merge_txn_idempotent(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", _ROWS)
    v1 = t.merge(_source(spark), "target.id = source.id", _clauses(),
                 mode="dv", txn_app="app", txn_version=1)
    snap = _snap(t)
    v2 = t.merge(_source(spark), "target.id = source.id", _clauses(),
                 mode="dv", txn_app="app", txn_version=1)
    assert v2 == v1 and _snap(t) == snap  # replayed batch: no-op


def test_dv_merge_prune_scan_correct(spark, tmp_path):
    """prune_on narrows the scan to dirs whose key range can match; results
    must be identical with and without it."""
    a = DeltaliteTable(spark, str(tmp_path / "a"))
    b = DeltaliteTable(spark, str(tmp_path / "b"))
    for t in (a, b):
        t.overwrite(spark.range(0, 50).select(
            "id", (F.col("id") * 1.0).alias("v"), F.lit("old").alias("status")))
        t.append(spark.range(100, 150).select(
            "id", (F.col("id") * 1.0).alias("v"), F.lit("old").alias("status")))
    src = spark.createDataFrame([(5, 500.0, "U"), (7, 700.0, "D")],
                                ["id", "v", "op"])
    a.merge(src, "target.id = source.id", _clauses(), mode="dv")
    b.merge(src, "target.id = source.id", _clauses(), mode="dv", prune_on="id")
    assert _snap(a) == _snap(b)


def test_dv_merge_replicates_through_stream(spark, tmp_path):
    from pyspark_cdc_engine.streaming.replicate import replicate_stream

    src = _mk(spark, tmp_path / "src", _ROWS)
    q = replicate_stream(spark, src.path, str(tmp_path / "dest"), ["id"],
                         str(tmp_path / "ck"))
    q.awaitTermination(240)
    src.merge(_source(spark), "target.id = source.id", _clauses(), mode="dv")
    q = replicate_stream(spark, src.path, str(tmp_path / "dest"), ["id"],
                         str(tmp_path / "ck"))
    q.awaitTermination(240)
    dest = DeltaliteTable(spark, str(tmp_path / "dest"))
    assert _snap(dest) == _snap(src)


def test_dv_merge_validates_constraints(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", _ROWS)
    t.add_constraint("v_nonneg", "v >= 0")
    with pytest.raises(Exception, match="v_nonneg"):
        t.merge(
            spark.createDataFrame([(2, -5.0, "U")], ["id", "v", "op"]),
            "target.id = source.id",
            [MergeClause("update", condition=None,
                         assignments={"v": "source.v"})],
            mode="dv",
        )
    assert {r[0]: r[1] for r in _snap(t)}[2] == 2.0  # nothing applied


def test_dv_merge_on_partitioned_table(spark, tmp_path):
    """Images land under the partition spec; tombstones reference files in
    partition dirs; the feed reconstructs all four kinds."""
    t = DeltaliteTable(spark, str(tmp_path / "p"))
    t.overwrite(
        spark.range(10).select(
            "id", (F.col("id") % 3).alias("part"), (F.col("id") * 1.0).alias("v")
        ),
        partition_by=["part"],
    )
    src = spark.createDataFrame(
        [(1, 99.0, "U"), (2, 0.0, "D"), (20, 2.0, "U")], ["id", "v", "op"]
    )
    v = t.merge(
        src,
        "target.id = source.id",
        [
            MergeClause("delete", "source.op = 'D'"),
            MergeClause("update", None, {"v": "source.v"}),
            MergeClause("insert", "source.op != 'D'",
                        {"id": "source.id", "part": "source.id % 3",
                         "v": "source.v"}),
        ],
        mode="dv",
    )
    got = sorted((r.id, r.part, r.v) for r in t.read().collect())
    assert (1, 1, 99.0) in got and (20, 2, 2.0) in got
    assert not any(r[0] == 2 for r in got)
    feed = t.read_changes(v - 1, v)
    assert sorted((r._change_type, r.id) for r in feed.collect()) == [
        ("delete", 2), ("insert", 20),
        ("update_postimage", 1), ("update_preimage", 1),
    ]


def test_dv_merge_after_rename_uses_stable_physical_names(spark, tmp_path):
    """Clause expressions bind to the renamed LOGICAL names; images write
    the stable PHYSICAL names; the feed surfaces end-version names."""
    t = DeltaliteTable(spark, str(tmp_path / "r"))
    t.overwrite(spark.range(5).select("id", (F.col("id") * 1.0).alias("amount")))
    t.rename_column("amount", "total")
    src = spark.createDataFrame(
        [(1, 11.0, "U"), (2, 0.0, "D"), (9, 9.0, "U")], ["id", "total", "op"]
    )
    t.merge(
        src,
        "target.id = source.id",
        [
            MergeClause("delete", "source.op = 'D'"),
            MergeClause("update", None, {"total": "source.total"}),
            MergeClause("insert", "source.op != 'D'"),
        ],
        mode="dv",
    )
    assert sorted((r.id, r.total) for r in t.read().collect()) == [
        (0, 0.0), (1, 11.0), (3, 3.0), (4, 4.0), (9, 9.0)
    ]
    feed = t.read_changes(0)
    assert sorted(
        (r._change_type, r.id, r.total) for r in feed.collect()
    ) == [
        ("delete", 2, 2.0), ("insert", 9, 9.0),
        ("update_postimage", 1, 11.0), ("update_preimage", 1, 1.0),
    ]


def test_dv_merge_bad_mode_rejected(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", _ROWS)
    with pytest.raises(ValueError, match="cow|dv"):
        t.merge(_source(spark), "target.id = source.id", _clauses(),
                mode="nope")
