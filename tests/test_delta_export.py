"""Delta-protocol snapshot export (delta_export.py): the emitted _delta_log
follows the public Delta transaction-log contract, add actions cover exactly
the live files, and partitioned tables carry partitionValues."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from pyspark.sql.types import StructType

from pyspark_cdc_engine.delta_export import export_delta_snapshot
from pyspark_cdc_engine.tables import DeltaliteTable


def _read_actions(dest: Path) -> list[dict]:
    commit = dest / "_delta_log" / f"{0:020d}.json"
    return [json.loads(ln) for ln in commit.read_text().splitlines() if ln.strip()]


def test_export_plain_table_roundtrip(spark, tmp_path):
    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(100).selectExpr("id", "id * 2 AS dbl"))
    t.append(spark.range(100, 120).selectExpr("id", "id * 2 AS dbl"))
    dest = tmp_path / "delta"
    summary = export_delta_snapshot(t, str(dest))
    assert summary["n_files"] >= 2 and summary["version_exported"] == 1

    actions = _read_actions(dest)
    kinds = [next(iter(a)) for a in actions]
    assert kinds[0] == "commitInfo" and kinds[1] == "protocol" and kinds[2] == "metaData"
    proto = actions[1]["protocol"]
    assert (proto["minReaderVersion"], proto["minWriterVersion"]) == (1, 2)
    meta = actions[2]["metaData"]
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    assert [f.name for f in schema.fields] == ["id", "dbl"]
    adds = [a["add"] for a in actions if "add" in a]
    assert len(adds) == summary["n_files"]
    # every add path exists, sizes match, and together they hold every row
    paths = [dest / a["path"] for a in adds]
    assert all(p.is_file() for p in paths)
    assert all(a["size"] == p.stat().st_size for a, p in zip(adds, paths))
    assert all(a["dataChange"] is True for a in adds)
    got = spark.read.parquet(*[str(p) for p in paths])
    assert got.count() == 120
    assert {r.id for r in got.collect()} == set(range(120))


def test_export_respects_time_travel_version(spark, tmp_path):
    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(10).toDF("id"))     # v0
    t.append(spark.range(10, 30).toDF("id"))    # v1
    dest = tmp_path / "delta_v0"
    export_delta_snapshot(t, str(dest), version=0)
    adds = [a["add"] for a in _read_actions(dest) if "add" in a]
    got = spark.read.parquet(*[str(dest / a["path"]) for a in adds])
    assert got.count() == 10


def test_export_partitioned_carries_partition_values(spark, tmp_path):
    t = DeltaliteTable(spark, str(tmp_path / "src"))
    df = spark.range(40).selectExpr("id", "CAST(id % 2 AS STRING) AS bucket")
    t.overwrite(df, partition_by=["bucket"])
    dest = tmp_path / "delta_part"
    export_delta_snapshot(t, str(dest))
    actions = _read_actions(dest)
    assert actions[2]["metaData"]["partitionColumns"] == ["bucket"]
    adds = [a["add"] for a in actions if "add" in a]
    assert adds and all(set(a["partitionValues"]) == {"bucket"} for a in adds)
    assert {a["partitionValues"]["bucket"] for a in adds} == {"0", "1"}
    # file paths keep the Hive-style layout the values were parsed from
    assert all(f"bucket={a['partitionValues']['bucket']}" in a["path"] for a in adds)


# ---------------------------------------------------------------- delta READ


def test_read_back_roundtrip_through_real_format(spark, tmp_path):
    """Export then import through the actual on-disk Delta format: the two
    independent codepaths must agree with the original table exactly."""
    from pyspark_cdc_engine.delta_export import read_delta_snapshot

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(50).selectExpr("id", "CAST(id % 3 AS STRING) AS g"),
                partition_by=["g"])
    dest = tmp_path / "delta"
    export_delta_snapshot(t, str(dest))
    got = read_delta_snapshot(spark, str(dest))
    assert [f.name for f in got.schema.fields] == ["id", "g"]
    assert sorted((r.id, r.g) for r in got.collect()) == sorted(
        (r.id, r.g) for r in t.read().collect()
    )


def test_remove_actions_and_version_time_travel(spark, tmp_path):
    """A later commit's remove action drops that file from the snapshot;
    version= replays only up to the requested commit."""
    from pyspark_cdc_engine.delta_export import read_delta_snapshot

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(10).toDF("id"))
    t.append(spark.range(10, 25).toDF("id"))
    dest = tmp_path / "delta"
    export_delta_snapshot(t, str(dest))

    actions = _read_actions(dest)
    adds = [a["add"] for a in actions if "add" in a]
    victim = adds[0]["path"]
    victim_rows = spark.read.parquet(str(dest / victim)).count()
    commit1 = dest / "_delta_log" / f"{1:020d}.json"
    commit1.write_text(json.dumps({"remove": {"path": victim, "dataChange": True}}) + "\n")

    full = read_delta_snapshot(spark, str(dest), version=0).count()
    pruned = read_delta_snapshot(spark, str(dest), version=1).count()
    assert full == 25 and pruned == 25 - victim_rows
    assert read_delta_snapshot(spark, str(dest)).count() == pruned  # latest = v1


def test_read_from_parquet_checkpoint(spark, tmp_path):
    """Snapshot state can come from a parquet checkpoint with only LATER json
    commits present — the standard long-history layout."""
    from pyspark.sql.types import StructType

    from pyspark_cdc_engine.delta_export import read_delta_snapshot

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(30).toDF("id"))
    dest = tmp_path / "delta"
    export_delta_snapshot(t, str(dest))
    actions = _read_actions(dest)
    meta = actions[2]["metaData"]
    adds = [a["add"] for a in actions if "add" in a]

    ckpt_schema = (
        "metaData struct<id:string,schemaString:string,partitionColumns:array<string>>, "
        "add struct<path:string,partitionValues:map<string,string>>, "
        "remove struct<path:string>"
    )
    rows = [
        {"metaData": {"id": meta["id"], "schemaString": meta["schemaString"],
                      "partitionColumns": meta["partitionColumns"]},
         "add": None, "remove": None}
    ] + [
        {"metaData": None,
         "add": {"path": a["path"], "partitionValues": a["partitionValues"]},
         "remove": None}
        for a in adds
    ]
    log = dest / "_delta_log"
    ckpt_tmp = tmp_path / "ckpt_build"
    spark.createDataFrame(rows, ckpt_schema).coalesce(1).write.parquet(str(ckpt_tmp))
    part = next(p for p in ckpt_tmp.iterdir() if p.suffix == ".parquet")
    part.rename(log / f"{0:020d}.checkpoint.parquet")
    (log / f"{0:020d}.json").unlink()  # only the checkpoint carries v0 now
    # one later json commit on top of the checkpoint
    extra = spark.range(30, 40).toDF("id")
    extra_dir = tmp_path / "extra"
    extra.coalesce(1).write.parquet(str(extra_dir))
    epart = next(p for p in extra_dir.iterdir() if p.suffix == ".parquet")
    (dest / "extra.parquet").write_bytes(epart.read_bytes())
    (log / f"{1:020d}.json").write_text(
        json.dumps({"add": {"path": "extra.parquet", "partitionValues": {},
                            "dataChange": True}}) + "\n"
    )
    got = read_delta_snapshot(spark, str(dest))
    assert got.count() == 40
    assert {r.id for r in got.collect()} == set(range(40))


def test_read_checkpoint_only_log(spark, tmp_path):
    """Metadata-cleaned Delta tables keep ONLY a parquet checkpoint (json
    commits retired) — still a complete, readable snapshot."""
    from pyspark_cdc_engine.delta_export import read_delta_snapshot

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(12).toDF("id"))
    dest = tmp_path / "delta"
    export_delta_snapshot(t, str(dest))
    actions = _read_actions(dest)
    meta = actions[2]["metaData"]
    adds = [a["add"] for a in actions if "add" in a]
    rows = [
        {"metaData": {"id": meta["id"], "schemaString": meta["schemaString"],
                      "partitionColumns": meta["partitionColumns"]},
         "add": None, "remove": None}
    ] + [
        {"metaData": None,
         "add": {"path": a["path"], "partitionValues": a["partitionValues"]},
         "remove": None}
        for a in adds
    ]
    ckpt_schema = (
        "metaData struct<id:string,schemaString:string,partitionColumns:array<string>>, "
        "add struct<path:string,partitionValues:map<string,string>>, "
        "remove struct<path:string>"
    )
    log = dest / "_delta_log"
    build = tmp_path / "b"
    spark.createDataFrame(rows, ckpt_schema).coalesce(1).write.parquet(str(build))
    next(p for p in build.iterdir() if p.suffix == ".parquet").rename(
        log / f"{0:020d}.checkpoint.parquet"
    )
    (log / f"{0:020d}.json").unlink()  # NO json commits remain
    got = read_delta_snapshot(spark, str(dest))
    assert got.count() == 12


def test_time_travel_export_uses_that_versions_schema(spark, tmp_path):
    """Exporting v0 of a schema-evolved table must advertise v0's schema, not
    the latest — a Delta reader applies schemaString against the files."""
    from pyspark.sql.types import StructType

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(4).toDF("id"))                                   # v0: (id)
    t.append(spark.range(4, 6).selectExpr("id", "id * 2 AS extra"),
             merge_schema=True)                                              # v1: (id, extra)
    dest0 = tmp_path / "delta_v0"
    export_delta_snapshot(t, str(dest0), version=0)
    meta = _read_actions(dest0)[2]["metaData"]
    fields = [f.name for f in StructType.fromJson(json.loads(meta["schemaString"])).fields]
    assert fields == ["id"]
    dest1 = tmp_path / "delta_v1"
    export_delta_snapshot(t, str(dest1), version=1)
    meta1 = _read_actions(dest1)[2]["metaData"]
    fields1 = [f.name for f in StructType.fromJson(json.loads(meta1["schemaString"])).fields]
    assert fields1 == ["id", "extra"]


# ----------------------------------------------- protocol + mapping guards


def test_column_mapped_table_exports_and_reads_back(spark, tmp_path):
    """A renamed-column deltalite table exports with REAL Delta columnMapping
    metadata (mode=name, per-field physicalName, protocol 2/5) and the
    independent reader resolves files through it — round-trip exact."""
    from pyspark_cdc_engine.delta_export import read_delta_snapshot

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(
        spark.range(20).selectExpr("id", "CAST(id * 2.0 AS DOUBLE) AS amount")
    )
    t.rename_column("amount", "total")
    t.append(spark.createDataFrame([(99, 5.0)], ["id", "total"]))
    dest = tmp_path / "delta_cm"
    export_delta_snapshot(t, str(dest))

    actions = _read_actions(dest)
    proto = actions[1]["protocol"]
    assert (proto["minReaderVersion"], proto["minWriterVersion"]) == (2, 5)
    meta = actions[2]["metaData"]
    assert meta["configuration"]["delta.columnMapping.mode"] == "name"
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    f = {x.name: x for x in schema.fields}
    assert f["total"].metadata["delta.columnMapping.physicalName"] == "amount"
    assert f["id"].metadata["delta.columnMapping.physicalName"] == "id"

    got = read_delta_snapshot(spark, str(dest))
    assert got.columns == ["id", "total"]
    assert got.count() == 21
    assert got.filter("id = 99").first().total == 5.0
    expect = {(r.id, r.total) for r in t.read().collect()}
    assert {(r.id, r.total) for r in got.collect()} == expect


def test_reader_rejects_unsupported_features_and_dvs(spark, tmp_path):
    """ADVICE: minReaderVersion>1 features we don't implement must fail loudly
    (deletion vectors silently resurrect deleted rows otherwise)."""
    import pytest

    from pyspark_cdc_engine.delta_export import read_delta_snapshot

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(5).toDF("id"))
    dest = tmp_path / "delta"
    export_delta_snapshot(t, str(dest))
    commit = dest / "_delta_log" / f"{0:020d}.json"
    actions = [json.loads(ln) for ln in commit.read_text().splitlines()]

    # reader-version-3 feature set beyond our support (deletionVectors,
    # columnMapping, timestampNtz, typeWidening and variantType are
    # implemented now — collations is not)
    mutated = list(actions)
    mutated[1] = {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                               "readerFeatures": ["collations"]}}
    commit.write_text("\n".join(json.dumps(a) for a in mutated) + "\n")
    with pytest.raises(ValueError, match="readerFeatures"):
        read_delta_snapshot(spark, str(dest))

    # a malformed deletion-vector descriptor on an add action still refuses
    # loudly (unknown storage type — never guess)
    mutated = list(actions)
    for a in mutated:
        if "add" in a:
            a["add"]["deletionVector"] = {
                "storageType": "x", "pathOrInlineDv": "x", "offset": 1,
                "sizeInBytes": 40, "cardinality": 2,
            }
            break
    commit.write_text("\n".join(json.dumps(a) for a in mutated) + "\n")
    with pytest.raises(ValueError, match="storageType"):
        read_delta_snapshot(spark, str(dest))

    # a column-mapping mode we've never heard of (name and id are supported)
    mutated = [json.loads(ln) for ln in commit.read_text().splitlines()]
    for a in mutated:
        if "add" in a:
            a["add"].pop("deletionVector", None)
        if "metaData" in a:
            a["metaData"]["configuration"] = {
                "delta.columnMapping.mode": "telepathy"
            }
    commit.write_text("\n".join(json.dumps(a) for a in mutated) + "\n")
    with pytest.raises(ValueError, match="columnMapping.mode"):
        read_delta_snapshot(spark, str(dest))


def test_reader_rejects_multipart_checkpoint_with_cleaned_log(spark, tmp_path):
    """ADVICE: a multi-part checkpoint our glob can't even see must not
    degrade to a partial-but-plausible snapshot when JSON commits were
    retention-cleaned."""
    import pytest

    from pyspark_cdc_engine.delta_export import read_delta_snapshot

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(5).toDF("id"))
    dest = tmp_path / "delta"
    export_delta_snapshot(t, str(dest))
    log = dest / "_delta_log"
    # simulate: commits 0..4 existed, 0..3 cleaned, multi-part ckpt at 3
    (log / f"{0:020d}.json").rename(log / f"{4:020d}.json")
    (log / "_last_checkpoint").write_text(
        json.dumps({"version": 3, "size": 10, "parts": 4})
    )
    with pytest.raises(ValueError, match="multi-part"):
        read_delta_snapshot(spark, str(dest))
    # with the full JSON history present, the checkpoint is unnecessary and
    # the guard stays quiet
    (log / f"{4:020d}.json").rename(log / f"{0:020d}.json")
    (log / "_last_checkpoint").write_text(
        json.dumps({"version": 0, "size": 10, "parts": 4})
    )
    assert read_delta_snapshot(spark, str(dest)).count() == 5


def test_partition_null_sentinel_and_url_encoding(spark, tmp_path):
    """ADVICE: Hive's __HIVE_DEFAULT_PARTITION__ must surface as JSON null in
    partitionValues (not a literal sentinel string), and escaped dir values
    URL-decode."""
    from pyspark.sql import functions as F

    from pyspark_cdc_engine.delta_export import read_delta_snapshot

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    df = spark.range(6).select(
        "id",
        F.when(F.col("id") < 2, F.lit(None))
         .when(F.col("id") < 4, F.lit("a b"))   # space -> escaped dir name
         .otherwise(F.lit("plain")).alias("k"),
    )
    t.overwrite(df, partition_by=["k"])
    dest = tmp_path / "delta"
    export_delta_snapshot(t, str(dest))
    adds = [a["add"] for a in _read_actions(dest) if "add" in a]
    vals = {a["partitionValues"]["k"] for a in adds}
    assert vals == {None, "a b", "plain"}
    got = read_delta_snapshot(spark, str(dest))
    by_k = {r.k: r.cnt for r in got.groupBy("k").count().toDF("k", "cnt").collect()}
    assert by_k == {None: 2, "a b": 2, "plain": 2}


def test_reader_rejects_v3_protocol_without_features(spark, tmp_path):
    """Review r5: minReaderVersion=3 with no readerFeatures is unknowable —
    must raise, not silently proceed."""
    import pytest

    from pyspark_cdc_engine.delta_export import read_delta_snapshot

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(3).toDF("id"))
    dest = tmp_path / "delta"
    export_delta_snapshot(t, str(dest))
    commit = dest / "_delta_log" / f"{0:020d}.json"
    actions = [json.loads(ln) for ln in commit.read_text().splitlines()]
    actions[1] = {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7}}
    commit.write_text("\n".join(json.dumps(a) for a in actions) + "\n")
    with pytest.raises(ValueError, match="no readerFeatures"):
        read_delta_snapshot(spark, str(dest))


def test_reader_rejects_invisible_checkpoint_even_without_metadata_keys(
    spark, tmp_path
):
    """Review r5: real writers often put only {version,size} in
    _last_checkpoint — the guard must key on 'no parseable checkpoint file
    exists', not on optional metadata fields."""
    import pytest

    from pyspark_cdc_engine.delta_export import read_delta_snapshot

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(5).toDF("id"))
    dest = tmp_path / "delta"
    export_delta_snapshot(t, str(dest))
    log = dest / "_delta_log"
    # simulate retention-cleaned log: only commit 4 survives; the pointer
    # names a v2/UUID checkpoint our glob cannot see, with NO format keys
    (log / f"{0:020d}.json").rename(log / f"{4:020d}.json")
    (log / "_last_checkpoint").write_text(json.dumps({"version": 3, "size": 9}))
    with pytest.raises(ValueError, match="refusing to return"):
        read_delta_snapshot(spark, str(dest))


def test_dml_triad_roundtrip_through_real_delta(spark, tmp_path):
    """VERDICT r5 #5: the DELETE+UPDATE copy-on-write commits must survive
    the real _delta_log protocol — export the post-DML snapshot, re-read it
    through the independent Delta-reader codepath, and match the table
    exactly; the change feed's reconstructed delete rows must account for
    both the DELETE's victims and the UPDATE's pre-images."""
    from tests.conftest import SF_DIR
    from pyspark_cdc_engine.delta_export import read_delta_snapshot

    o = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    t = DeltaliteTable(spark, str(tmp_path / "orders_dml"))
    t.overwrite(o)                                                   # v0
    t.delete("o_orderstatus = 'F' AND o_totalprice < 1000")          # v1
    t.update({"o_totalprice": "o_totalprice * 1.1"},
             "o_orderstatus = 'P'")                                  # v2

    dest = tmp_path / "delta"
    export_delta_snapshot(t, str(dest))
    got = read_delta_snapshot(spark, str(dest))
    want = t.read()
    assert [f.name for f in got.schema.fields] == [f.name for f in want.schema.fields]
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0

    # the change feed reconstructs every mutated row: DELETE victims appear
    # as delete rows with their original values; UPDATE contributes a
    # delete(pre-image)/insert(post-image) pair per repriced order
    feed = t.read_changes(0).cache()
    try:
        deleted = feed.filter("_change_type = 'delete' AND _commit_version = 1")
        want_deleted = o.filter("o_orderstatus = 'F' AND o_totalprice < 1000")
        assert deleted.count() == want_deleted.count()
        assert (
            deleted.select("o_orderkey", "o_totalprice")
            .exceptAll(want_deleted.select("o_orderkey", "o_totalprice"))
            .count()
            == 0
        )
        pre = feed.filter("_change_type = 'update_preimage' AND _commit_version = 2")
        post = feed.filter("_change_type = 'update_postimage' AND _commit_version = 2")
        pending = o.filter("o_orderstatus = 'P'")
        assert pre.count() == post.count() == pending.count()
        # pre-images carry the ORIGINAL price, post-images the repriced one
        assert (
            pre.select("o_orderkey", "o_totalprice")
            .exceptAll(pending.select("o_orderkey", "o_totalprice"))
            .count()
            == 0
        )
        assert (
            post.select("o_orderkey", "o_totalprice")
            .exceptAll(
                pending.selectExpr("o_orderkey", "o_totalprice * 1.1 AS o_totalprice")
            )
            .count()
            == 0
        )
    finally:
        feed.unpersist()

    # and a time-travel export of the PRE-DML version round-trips too
    dest0 = tmp_path / "delta_v0"
    export_delta_snapshot(t, str(dest0), version=0)
    assert read_delta_snapshot(spark, str(dest0)).count() == o.count()


def test_export_materializes_deletion_vectors_per_file(spark, tmp_path):
    """A DV snapshot exports as plain Delta: files a sidecar references are
    rewritten without their tombstoned rows; files no sidecar touches
    zero-copy byte-identically. The full DV DML triad (delete + update +
    merge, all mode='dv') round-trips through the real _delta_log."""
    from pyspark.sql import functions as F

    from pyspark_cdc_engine.delta_export import (
        export_delta_snapshot,
        read_delta_snapshot,
    )
    from pyspark_cdc_engine.tables import DeltaliteTable, MergeClause

    t = DeltaliteTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.range(10).select("id", (F.col("id") * 1.0).alias("v")))
    t.append(spark.range(100, 110).select("id", (F.col("id") * 1.0).alias("v")))
    t.delete("id IN (1, 3)", mode="dv")
    t.update({"v": "v + 0.5"}, "id = 5", mode="dv")
    t.merge(
        spark.createDataFrame([(7, 0.0, "D"), (9, 99.0, "U")], ["id", "v", "op"]),
        "target.id = source.id",
        [
            MergeClause("delete", "source.op = 'D'"),
            MergeClause("update", None, {"v": "source.v"}),
        ],
        mode="dv",
    )
    info = export_delta_snapshot(t, str(tmp_path / "delta"))
    back = read_delta_snapshot(spark, str(tmp_path / "delta"))
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in t.read().collect()
    )
    assert info["n_files"] >= 2
    # the untouched second append (ids 100..109, never tombstoned) must have
    # zero-copied: some exported file is byte-identical to a source file
    src_bytes = {
        f.read_bytes()
        for d in t.live_data_dirs()
        for f in __import__("pathlib").Path(d).rglob("*.parquet")
    }
    exported = list((tmp_path / "delta").rglob("*.parquet"))
    assert any(f.read_bytes() in src_bytes for f in exported)
    # and at least one file was REWRITTEN (the tombstoned ones differ)
    assert not all(f.read_bytes() in src_bytes for f in exported)


# ----------------------------------------------------------- history export


def test_history_export_every_version_time_travels(spark, tmp_path):
    """export_delta_history replays the deltalite log as a real multi-commit
    _delta_log; a Delta reader's VERSION AS OF at every commit equals
    deltalite's own time travel — across append, cow DML (incl. merge),
    OPTIMIZE, and a rename under column mapping."""
    from pyspark_cdc_engine.delta_export import (
        export_delta_history,
        read_delta_snapshot,
    )
    from pyspark_cdc_engine.tables import MergeClause

    t = DeltaliteTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.range(10).selectExpr("id", "id * 10 AS v"))      # v0
    t.enable_cdf()                                                     # v1
    t.append(spark.range(10, 14).selectExpr("id", "id AS v"))          # v2
    t.delete("id >= 12")                                               # v3
    t.update({"v": "v + 1"}, "id < 2")                                 # v4
    t.merge(
        spark.createDataFrame([(5, 555), (100, 1000)], "id long, v long"),
        "target.id = source.id",
        [MergeClause("update", None, {"v": "source.v"}),
         MergeClause("insert", None, None)],
    )                                                                  # v5
    t.compact()                                                        # v6
    t.rename_column("v", "val")                                        # v7
    s = export_delta_history(t, str(tmp_path / "delta"))
    assert s["versions_exported"] == 8 and s["n_cdc_files"] >= 3
    for v in range(0, t.latest_version() + 1):
        a = sorted(tuple(r) for r in t.read(version=v).collect())
        b = sorted(
            tuple(r)
            for r in read_delta_snapshot(
                spark, str(tmp_path / "delta"), version=v
            ).collect()
        )
        assert a == b, v


def test_history_export_cdc_actions_follow_the_spec(spark, tmp_path):
    """CDF commits export as `cdc` actions whose parquet carries the spec's
    `_change_type` column, OPTIMIZE commits carry dataChange=false, and the
    metaData of a CDF-enabled table records delta.enableChangeDataFeed."""
    import json as _json

    import pyarrow.parquet as pq

    from pyspark_cdc_engine.delta_export import export_delta_history

    t = DeltaliteTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.range(8).selectExpr("id", "id * 10 AS v"))
    t.enable_cdf()
    t.delete("id >= 6")
    t.compact()
    export_delta_history(t, str(tmp_path / "delta"))
    log = sorted((tmp_path / "delta" / "_delta_log").glob("*.json"))
    acts = {
        int(p.stem): [_json.loads(ln) for ln in p.read_text().splitlines()]
        for p in log
    }
    cdc = [a["cdc"] for a in acts[2] if "cdc" in a]
    assert cdc, acts[2]
    f = tmp_path / "delta" / cdc[0]["path"]
    assert "_change_type" in pq.ParquetFile(f).schema_arrow.names
    # set_cdf re-emitted metaData with the table property
    meta = [a["metaData"] for a in acts[1] if "metaData" in a]
    assert meta and meta[0]["configuration"].get("delta.enableChangeDataFeed") == "true"
    # compact: adds/removes with dataChange=false
    adds = [a["add"] for a in acts[3] if "add" in a]
    rems = [a["remove"] for a in acts[3] if "remove" in a]
    assert adds and rems
    assert all(a["dataChange"] is False for a in adds + rems)


def test_history_export_restore_reuses_files(spark, tmp_path):
    """RESTORE re-adds previously removed dirs: the export must re-emit add
    actions for the SAME exported files instead of copying bytes twice."""
    from pyspark_cdc_engine.delta_export import (
        export_delta_history,
        read_delta_snapshot,
    )

    t = DeltaliteTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.range(6).selectExpr("id"))     # v0
    t.overwrite(spark.range(100, 103).selectExpr("id"))  # v1 replaces
    t.restore(0)                                     # v2 brings v0's dir back
    s = export_delta_history(t, str(tmp_path / "delta"))
    # v0's files counted once even though added at v0 AND v2
    parquet_on_disk = len(list((tmp_path / "delta").rglob("*.parquet")))
    assert s["n_files"] == parquet_on_disk
    got = sorted(
        r.id for r in read_delta_snapshot(
            spark, str(tmp_path / "delta")
        ).collect()
    )
    assert got == [0, 1, 2, 3, 4, 5]


def test_history_export_refuses_clone_histories_but_exports_dv(spark, tmp_path):
    from pyspark_cdc_engine.delta_export import (
        export_delta_history,
        read_delta_snapshot,
    )

    t = DeltaliteTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.range(10).selectExpr("id"))
    c = t.clone_to(str(tmp_path / "clone"))  # clone BEFORE any DV commit
    t.delete("id >= 8", mode="dv")
    # DV histories export since r7 (materialized as cow rewrites + cdc)
    export_delta_history(t, str(tmp_path / "d1"))
    got = {r["id"] for r in read_delta_snapshot(spark, str(tmp_path / "d1")).collect()}
    assert got == set(range(8))
    with pytest.raises(ValueError, match="clone"):
        export_delta_history(c, str(tmp_path / "d2"))


def test_read_delta_changes_round_trips_the_feed(spark, tmp_path):
    """Bidirectional CDF interop: export a CDF-enabled cow history, then
    consume table_changes() from the REAL log — rows equal deltalite's own
    read_changes (cdc actions verbatim; the bootstrap commit derives inserts
    from dataChange adds)."""
    from pyspark_cdc_engine.delta_export import (
        export_delta_history,
        read_delta_changes,
    )
    from pyspark_cdc_engine.tables import MergeClause

    t = DeltaliteTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.range(10).selectExpr("id", "id * 10 AS v"))      # v0
    t.enable_cdf()                                                     # v1
    t.delete("id >= 8")                                                # v2
    t.update({"v": "v + 1"}, "id < 2")                                 # v3
    t.merge(
        spark.createDataFrame([(5, 555), (100, 1000)], "id long, v long"),
        "target.id = source.id",
        [MergeClause("update", None, {"v": "source.v"}),
         MergeClause("insert", None, None)],
    )                                                                  # v4
    export_delta_history(t, str(tmp_path / "delta"))
    key = ["_commit_version", "_change_type", "id", "v"]
    a = sorted(
        tuple(r[k] for k in key) for r in t.read_changes(-1).collect()
    )
    got = read_delta_changes(spark, str(tmp_path / "delta"), -1)
    b = sorted(tuple(r[k] for k in key) for r in got.collect())
    assert a == b
    # timestamps agree at millisecond precision (the log stores ms)
    import datetime

    hist = {h["version"]: float(h["timestamp"]) for h in t.history()}
    for r in got.select("_commit_version", "_commit_timestamp").distinct().collect():
        ts = r["_commit_timestamp"].replace(
            tzinfo=datetime.timezone.utc
        ).timestamp()
        assert abs(ts - hist[r["_commit_version"]]) < 0.002


def test_read_delta_changes_derives_deletes_and_respects_window(spark, tmp_path):
    """Without cdc actions, dataChange add/remove derive insert/delete rows
    (overwrite = delete-all + insert-all), OPTIMIZE contributes nothing, and
    the (start, end] window selects commits exactly."""
    from pyspark_cdc_engine.delta_export import (
        export_delta_history,
        read_delta_changes,
    )

    t = DeltaliteTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.range(4).selectExpr("id"))          # v0
    t.append(spark.range(4, 6).selectExpr("id"))          # v1
    t.compact()                                           # v2 (no changes)
    t.overwrite(spark.range(100, 102).selectExpr("id"))   # v3
    export_delta_history(t, str(tmp_path / "delta"))
    got = read_delta_changes(spark, str(tmp_path / "delta"), 0, 3)
    rows = sorted((r["_commit_version"], r["_change_type"], r["id"])
                  for r in got.collect())
    assert rows == [
        (1, "insert", 4), (1, "insert", 5),
        (3, "delete", 0), (3, "delete", 1), (3, "delete", 2), (3, "delete", 3),
        (3, "delete", 4), (3, "delete", 5),
        (3, "insert", 100), (3, "insert", 101),
    ]


def test_apply_changes_replicates_from_a_real_delta_log(spark, tmp_path):
    """Composition closure: a REAL Delta table's change feed (cdc actions +
    derived inserts) folds through apply_changes into a deltalite replica
    equal to the source snapshot — replication FROM the real format."""
    from pyspark_cdc_engine.delta_export import (
        export_delta_history,
        read_delta_changes,
        read_delta_snapshot,
    )
    from pyspark_cdc_engine.streaming.replicate import apply_changes
    from pyspark_cdc_engine.tables import MergeClause

    t = DeltaliteTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.range(12).selectExpr("id", "id * 10 AS v"))
    t.enable_cdf()
    t.delete("id % 5 = 0")
    t.update({"v": "v + 3"}, "id < 4")
    t.merge(
        spark.createDataFrame([(7, 777), (200, 2000)], "id long, v long"),
        "target.id = source.id",
        [MergeClause("update", None, {"v": "source.v"}),
         MergeClause("insert", None, None)],
    )
    export_delta_history(t, str(tmp_path / "delta"))
    feed = read_delta_changes(spark, str(tmp_path / "delta"), -1)
    dest = DeltaliteTable(spark, str(tmp_path / "replica"))
    apply_changes(dest, feed, ["id"])
    a = sorted(
        tuple(r) for r in read_delta_snapshot(spark, str(tmp_path / "delta")).collect()
    )
    b = sorted(tuple(r) for r in dest.read().collect())
    assert a == b and a


def test_history_export_empty_cdc_commit_suppresses_derivation(spark, tmp_path):
    """A CDF cow-DML commit that matched NO rows must export a (zero-row)
    cdc action: without one, Delta CDF readers fall back to deriving
    insert+delete rows from the rewrite's dataChange add/remove actions —
    spurious changes for a no-op (r6 advice)."""
    from pyspark_cdc_engine.delta_export import (
        export_delta_history,
        read_delta_changes,
    )

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(10).selectExpr("id", "id * 2 AS v"))
    t.enable_cdf()
    t.delete("id > 100")  # matches nothing: cow rewrite, empty change set
    v_noop = t.latest_version()
    t.delete("id >= 8")  # a real change after it
    dest = tmp_path / "delta"
    export_delta_history(t, str(dest))
    actions = [
        json.loads(ln)
        for ln in (dest / "_delta_log" / f"{v_noop:020d}.json")
        .read_text()
        .splitlines()
    ]
    assert any(a.get("cdc") for a in actions)
    feed = read_delta_changes(spark, str(dest), starting_version=v_noop - 1)
    by_v = {}
    for r in feed.collect():
        by_v.setdefault(r["_commit_version"], []).append(r)
    # the no-op commit contributes NOTHING; the real delete contributes its rows
    assert v_noop not in by_v
    assert {r["id"] for r in by_v[v_noop + 1]} == {8, 9}


def _rowset(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_dv_history_export_time_travels_every_version(spark, tmp_path):
    """r7: a deletion-vector history exports as the equivalent cow rewrite —
    read_delta_snapshot equals deltalite read(version=v) at EVERY version."""
    from pyspark_cdc_engine.delta_export import (
        export_delta_history,
        read_delta_snapshot,
    )
    from pyspark_cdc_engine.tables import MergeClause

    t = DeltaliteTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.range(20).selectExpr("id", "id * 10 AS v"))       # v0
    t.delete("id >= 16", mode="dv")                                     # v1
    t.update({"v": "v + 1"}, "id < 3", mode="dv")                       # v2
    t.merge(
        spark.createDataFrame([(5, 555), (100, 1000)], "id long, v long"),
        "target.id = source.id",
        [MergeClause("delete", "source.v = 555", None),
         MergeClause("insert", None, None)],
        mode="dv",
    )                                                                   # v3
    t.restore(1)                                                        # v4
    export_delta_history(t, str(tmp_path / "delta"))
    for v in range(t.latest_version() + 1):
        got = _rowset(
            read_delta_snapshot(spark, str(tmp_path / "delta"), version=v),
            ["id", "v"],
        )
        want = _rowset(t.read(version=v), ["id", "v"])
        assert got == want, f"version {v}"


def test_dv_history_export_feed_matches_read_changes(spark, tmp_path):
    """r7: read_delta_changes on a DV-history export returns the same feed
    deltalite's read_changes gives (cdc actions carry the exact change
    rows; derivation from the materializing rewrite would report whole
    files)."""
    from pyspark_cdc_engine.delta_export import (
        export_delta_history,
        read_delta_changes,
    )
    from pyspark_cdc_engine.tables import MergeClause

    t = DeltaliteTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.range(12).selectExpr("id", "id * 10 AS v"))       # v0
    t.delete("id >= 10", mode="dv")                                     # v1
    t.update({"v": "v + 5"}, "id < 2", mode="dv")                       # v2
    t.merge(
        spark.createDataFrame([(4, 444), (200, 2000)], "id long, v long"),
        "target.id = source.id",
        [MergeClause("update", None, {"v": "source.v"}),
         MergeClause("insert", None, None)],
        mode="dv",
    )                                                                   # v3
    export_delta_history(t, str(tmp_path / "delta"))
    cols = ["id", "v", "_change_type", "_commit_version"]
    got = _rowset(
        read_delta_changes(spark, str(tmp_path / "delta"), starting_version=0),
        cols,
    )
    want = _rowset(t.read_changes(0), cols)
    assert got == want


def test_checkpoint_with_many_add_actions_reads_batched(spark, tmp_path):
    """r7: a checkpoint with thousands of add rows streams through batched
    pyarrow iteration (multiple batches at batch_size=4096) instead of a
    driver collect() — 6000 add actions (paths cycling the real files, so
    the replay dedups to the true live set) must reconstruct the snapshot
    exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark_cdc_engine.delta_export import read_delta_snapshot

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(100).toDF("id").repartition(8))
    dest = tmp_path / "delta"
    export_delta_snapshot(t, str(dest))
    actions = _read_actions(dest)
    meta = actions[2]["metaData"]
    adds = [a["add"] for a in actions if "add" in a]
    assert len(adds) >= 2

    n = 6000
    meta_col = [json.dumps({"id": meta["id"],
                            "schemaString": meta["schemaString"],
                            "partitionColumns": meta["partitionColumns"]})]
    add_col = [None]
    for i in range(n):
        a = adds[i % len(adds)]
        meta_col.append(None)
        add_col.append(json.dumps({"path": a["path"],
                                   "partitionValues": a["partitionValues"]}))
    # struct-typed checkpoint columns built from the JSON payloads
    tbl = pa.table({
        "metaData": pa.array(
            [json.loads(m) if m else None for m in meta_col],
            type=pa.struct([("id", pa.string()), ("schemaString", pa.string()),
                            ("partitionColumns", pa.list_(pa.string()))]),
        ),
        "add": pa.array(
            [json.loads(a) if a else None for a in add_col],
            type=pa.struct([("path", pa.string()),
                            ("partitionValues", pa.map_(pa.string(), pa.string()))]),
        ),
    })
    log = dest / "_delta_log"
    pq.write_table(tbl, log / f"{0:020d}.checkpoint.parquet")
    (log / f"{0:020d}.json").unlink()  # checkpoint-only log

    got = read_delta_snapshot(spark, str(dest))
    assert got.count() == 100
    assert {r.id for r in got.collect()} == set(range(100))


def test_snapshot_and_history_export_on_pruned_log(spark, tmp_path):
    """Log retention (cleanup_log) and the two export modes: the snapshot
    export materializes current state; the history export emits what a
    metadata-cleaned REAL Delta log looks like — a parquet checkpoint at the
    boundary + JSON commits after, version numbers authentic."""
    from pyspark_cdc_engine.delta_export import (
        export_delta_history,
        read_delta_snapshot,
    )
    from pyspark_cdc_engine.tables import DeltaliteTable

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(20).selectExpr("id", "id * 2 AS v"))
    for i in range(25):
        t.append(spark.range(100 + i, 101 + i).selectExpr("id", "id * 2 AS v"))
    t.cleanup_log(retain_last=3)
    oldest = t._oldest_retained()
    assert oldest > 0
    dest = tmp_path / "exported"
    export_delta_snapshot(t, str(dest))
    back = read_delta_snapshot(spark, str(dest))
    assert sorted(r.id for r in back.collect()) == sorted(
        r.id for r in t.read().collect()
    )
    hist = tmp_path / "hist"
    summary = export_delta_history(t, str(hist))
    assert summary["latest_version"] == t.latest_version()
    log = hist / "_delta_log"
    assert (log / f"{oldest:020d}.checkpoint.parquet").is_file()
    assert not (log / f"{oldest:020d}.json").exists()
    assert json.loads((log / "_last_checkpoint").read_text())["version"] == oldest
    # every RETAINED version time-travels byte-equal; below the boundary the
    # export refuses exactly like the source does
    for v in (oldest, oldest + 1, t.latest_version()):
        got = sorted(r.id for r in read_delta_snapshot(spark, str(hist), v).collect())
        want = sorted(r.id for r in t.read(version=v).collect())
        assert got == want, v
    with pytest.raises(ValueError, match="not present"):
        read_delta_snapshot(spark, str(hist), oldest - 1)


def test_pruned_history_export_round_trips_the_feed(spark, tmp_path):
    """table_changes over the exported pruned log equals deltalite's own
    read_changes for the retained window (DV DML included)."""
    from pyspark_cdc_engine.delta_export import (
        export_delta_history,
        read_delta_changes,
    )
    from pyspark_cdc_engine.tables import DeltaliteTable

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(30).selectExpr("id", "CAST(id AS DOUBLE) AS v"))
    for i in range(28):
        t.append(spark.range(100 + i, 101 + i).selectExpr("id", "CAST(id AS DOUBLE) AS v"))
    t.update({"v": "v + 0.5"}, "id = 3", mode="dv")
    t.delete("id = 5", mode="dv")
    t.cleanup_log(retain_last=6)
    oldest = t._oldest_retained()
    assert oldest > 0
    hist = tmp_path / "hist"
    export_delta_history(t, str(hist))
    want = {
        (r.id, float(r.v), r["_change_type"], r["_commit_version"])
        for r in t.read_changes(oldest, t.latest_version()).collect()
    }
    got = {
        (r.id, float(r.v), r["_change_type"], r["_commit_version"])
        for r in read_delta_changes(
            spark, str(hist), oldest, t.latest_version()
        ).collect()
    }
    assert got == want and want


def test_read_multipart_checkpoint(spark, tmp_path):
    """Classic V1 multi-part checkpoints ({v}.checkpoint.{i}.{n}.parquet)
    read like single-file ones: action rows are disjoint across parts. An
    incomplete set (a part deleted) falls back to the loud refusal."""
    import pytest as _pytest

    from pyspark_cdc_engine.delta_export import read_delta_snapshot

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(24).toDF("id"))
    dest = tmp_path / "delta"
    export_delta_snapshot(t, str(dest))
    actions = _read_actions(dest)
    meta = actions[2]["metaData"]
    adds = [a["add"] for a in actions if "add" in a]
    assert len(adds) >= 2
    ckpt_schema = (
        "metaData struct<id:string,schemaString:string,partitionColumns:array<string>>, "
        "add struct<path:string,partitionValues:map<string,string>>, "
        "remove struct<path:string>"
    )
    meta_row = {"metaData": {"id": meta["id"], "schemaString": meta["schemaString"],
                             "partitionColumns": meta["partitionColumns"]},
                "add": None, "remove": None}
    add_rows = [{"metaData": None,
                 "add": {"path": a["path"], "partitionValues": a["partitionValues"]},
                 "remove": None} for a in adds]
    half = len(add_rows) // 2
    log = dest / "_delta_log"
    for i, rows in enumerate(([meta_row] + add_rows[:half], add_rows[half:])):
        build = tmp_path / f"part{i}"
        spark.createDataFrame(rows, ckpt_schema).coalesce(1).write.parquet(str(build))
        src = next(p for p in build.iterdir() if p.suffix == ".parquet")
        src.rename(log / f"{0:020d}.checkpoint.{i + 1:010d}.{2:010d}.parquet")
    (log / f"{0:020d}.json").unlink()  # only the multi-part ckpt carries v0
    (log / "_last_checkpoint").write_text(
        json.dumps({"version": 0, "size": len(add_rows) + 1, "parts": 2})
    )
    got = read_delta_snapshot(spark, str(dest))
    assert {r.id for r in got.collect()} == set(range(24))
    # part goes missing -> the set is incomplete -> loud refusal, never partial
    (log / f"{0:020d}.checkpoint.{2:010d}.{2:010d}.parquet").unlink()
    with _pytest.raises(ValueError, match="multi-part"):
        read_delta_snapshot(spark, str(dest))


def test_read_v2_uuid_checkpoint_with_sidecars(spark, tmp_path):
    """V2 (UUID-named) checkpoints read: file actions either inline or
    externalized into _delta_log/_sidecars/ parquet files referenced by
    `sidecar` actions; the v2Checkpoint readerFeature is accepted; a missing
    sidecar refuses loudly instead of returning a partial snapshot."""
    import pytest as _pytest

    from pyspark_cdc_engine.delta_export import read_delta_snapshot

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(18).toDF("id"))
    dest = tmp_path / "delta"
    export_delta_snapshot(t, str(dest))
    actions = _read_actions(dest)
    meta = actions[2]["metaData"]
    adds = [a["add"] for a in actions if "add" in a]
    assert len(adds) >= 2
    log = dest / "_delta_log"

    # v2 checkpoint file: protocol (v3 + v2Checkpoint feature) + metaData
    # inline, file actions split across two sidecars
    ckpt_schema = (
        "protocol struct<minReaderVersion:int,minWriterVersion:int,"
        "readerFeatures:array<string>,writerFeatures:array<string>>, "
        "metaData struct<id:string,schemaString:string,partitionColumns:array<string>>, "
        "sidecar struct<path:string,sizeInBytes:bigint>"
    )
    sidecar_schema = (
        "add struct<path:string,partitionValues:map<string,string>>, "
        "remove struct<path:string>"
    )
    half = len(adds) // 2
    sidecars = [adds[:half], adds[half:]]
    (log / "_sidecars").mkdir()
    side_rows = []
    for i, group in enumerate(sidecars):
        rows = [{"add": {"path": a["path"], "partitionValues": a["partitionValues"]},
                 "remove": None} for a in group]
        build = tmp_path / f"sc{i}"
        spark.createDataFrame(rows, sidecar_schema).coalesce(1).write.parquet(str(build))
        src = next(p for p in build.iterdir() if p.suffix == ".parquet")
        name = f"{i:032x}.parquet"
        src.rename(log / "_sidecars" / name)
        side_rows.append({"protocol": None, "metaData": None,
                          "sidecar": {"path": name, "sizeInBytes": 1}})
    ckpt_rows = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["v2Checkpoint"],
                      "writerFeatures": ["v2Checkpoint"]},
         "metaData": None, "sidecar": None},
        {"protocol": None,
         "metaData": {"id": meta["id"], "schemaString": meta["schemaString"],
                      "partitionColumns": meta["partitionColumns"]},
         "sidecar": None},
    ] + side_rows
    build = tmp_path / "v2ck"
    spark.createDataFrame(ckpt_rows, ckpt_schema).coalesce(1).write.parquet(str(build))
    src = next(p for p in build.iterdir() if p.suffix == ".parquet")
    src.rename(log / f"{0:020d}.checkpoint.80a083e8-7026-4e79-81be-000000000000.parquet")
    (log / f"{0:020d}.json").unlink()  # only the v2 checkpoint carries v0
    (log / "_last_checkpoint").write_text(json.dumps({"version": 0}))

    got = read_delta_snapshot(spark, str(dest))
    assert {r.id for r in got.collect()} == set(range(18))

    # missing sidecar -> loud refusal
    (log / "_sidecars" / f"{1:032x}.parquet").unlink()
    with _pytest.raises(ValueError, match="sidecar"):
        read_delta_snapshot(spark, str(dest))


def test_read_delta_changes_refuses_pruned_start(spark, tmp_path):
    """A feed start below a metadata-cleaned log's boundary raises (the
    missing versions can never iterate) — mirroring DeltaliteTable.
    read_changes' retention refusal instead of silently returning the
    surviving suffix as if it were complete."""
    from pyspark_cdc_engine.delta_export import (
        export_delta_history,
        read_delta_changes,
    )
    from pyspark_cdc_engine.tables import DeltaliteTable

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(10).selectExpr("id", "CAST(id AS DOUBLE) AS v"))
    for i in range(24):
        t.append(spark.range(100 + i, 101 + i).selectExpr(
            "id", "CAST(id AS DOUBLE) AS v"))
    t.cleanup_log(retain_last=3)
    oldest = t._oldest_retained()
    assert oldest > 1
    hist = tmp_path / "hist"
    export_delta_history(t, str(hist))
    with pytest.raises(ValueError, match="unavailable"):
        read_delta_changes(spark, str(hist), 0)
    # the earliest COMPLETE feed (start = the boundary, whose own commit is
    # the checkpoint) still reads
    ok = read_delta_changes(spark, str(hist), oldest, t.latest_version())
    assert ok.count() == t.read_changes(oldest).count()


# ----------------------------------------------------- DV read on import (r8)


def _dv_delete(dest: Path, rel: str, positions, version: int,
               storage: str = "u", prefix: str = ""):
    """Hand-write the commit delta-spark produces for a DV DELETE on one
    file: protocol upgrade to readerFeatures=[deletionVectors], then
    remove(path, old DV) + add(path, new DV), both dataChange. Returns the
    descriptor."""
    from pyspark_cdc_engine import dvformat

    if storage == "u":
        desc = dvformat.write_dv_file(dest, positions, random_prefix=prefix)
    else:
        desc = dvformat.inline_descriptor(positions)
    log = dest / "_delta_log"
    prev_adds = [
        a["add"] for p in sorted(log.glob("*.json"))
        for a in map(json.loads, p.read_text().splitlines())
        if a.get("add") and a["add"]["path"] == rel
    ]
    old = prev_adds[-1]
    lines = [
        {"commitInfo": {"timestamp": 1700000000000 + version,
                        "operation": "DELETE"}},
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        {"remove": {"path": rel, "dataChange": True,
                    "deletionTimestamp": 1700000000000,
                    **({"deletionVector": old["deletionVector"]}
                       if old.get("deletionVector") else {})}},
        {"add": {**old, "dataChange": True, "deletionVector": desc}},
    ]
    (log / f"{version:020d}.json").write_text(
        "\n".join(json.dumps(ln) for ln in lines)
    )
    return desc


def test_dv_snapshot_read_drops_marked_rows(spark, tmp_path):
    """A real-Delta table whose adds carry deletion vectors (the delta-spark
    3.4+ default for DELETE) imports with the tombstoned rows absent — on-disk
    'u' DVs (with and without a random prefix) and inline 'i' DVs alike, at
    every version."""
    from pyspark_cdc_engine.delta_export import read_delta_snapshot

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(40).selectExpr("id", "id * 2 AS dbl"))
    dest = tmp_path / "delta"
    export_delta_snapshot(t, str(dest))                               # v0
    rels = sorted(
        a["add"]["path"] for a in _read_actions(dest) if a.get("add")
    )
    assert len(rels) >= 2
    # positions are file-relative: map each file's rows to global ids first
    import pyarrow.parquet as pq_

    def ids_at(rel, positions):
        col = pq_.read_table(str(dest / rel), columns=["id"])["id"].to_pylist()
        return {col[p] for p in positions}

    gone = ids_at(rels[0], [0, 2]) | ids_at(rels[1], [1])
    _dv_delete(dest, rels[0], [0, 2], version=1)                      # u, no prefix
    _dv_delete(dest, rels[1], [1], version=2, storage="i")            # inline
    got = {r.id for r in read_delta_snapshot(spark, str(dest)).collect()}
    assert got == set(range(40)) - gone
    # time travel: v1 has only the first file's DV
    got_v1 = {r.id for r in read_delta_snapshot(spark, str(dest), 1).collect()}
    assert got_v1 == set(range(40)) - ids_at(rels[0], [0, 2])
    # v0 still reads everything
    assert read_delta_snapshot(spark, str(dest), 0).count() == 40


def test_dv_grows_on_second_delete_and_prefix_storage(spark, tmp_path):
    """A second DELETE replaces the file's DV with a superset (delta
    semantics: DVs are per-add absolute, not deltas) — and a 'u' DV under a
    random prefix directory resolves."""
    from pyspark_cdc_engine.delta_export import read_delta_snapshot

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(20).repartition(1).selectExpr("id"))
    dest = tmp_path / "delta"
    export_delta_snapshot(t, str(dest))
    rel = next(a["add"]["path"] for a in _read_actions(dest) if a.get("add"))
    _dv_delete(dest, rel, [3], version=1, prefix="ab")
    _dv_delete(dest, rel, [3, 7, 11], version=2, prefix="cd")
    import pyarrow.parquet as pq_

    col = pq_.read_table(str(dest / rel), columns=["id"])["id"].to_pylist()
    got = {r.id for r in read_delta_snapshot(spark, str(dest)).collect()}
    assert got == set(col) - {col[3], col[7], col[11]}
    got1 = {r.id for r in read_delta_snapshot(spark, str(dest), 1).collect()}
    assert got1 == set(col) - {col[3]}


def test_dv_integrity_failures_raise(spark, tmp_path):
    """Corrupt DV bytes / missing sidecars refuse loudly — never resurrect
    or over-delete rows silently."""
    from pyspark_cdc_engine import dvformat
    from pyspark_cdc_engine.delta_export import read_delta_snapshot

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(10).repartition(1).selectExpr("id"))
    dest = tmp_path / "delta"
    export_delta_snapshot(t, str(dest))
    rel = next(a["add"]["path"] for a in _read_actions(dest) if a.get("add"))
    desc = _dv_delete(dest, rel, [1, 2], version=1)
    fp = dvformat.dv_file_path(desc, dest)
    blob = bytearray(fp.read_bytes())
    blob[-6] ^= 0xFF  # flip a payload byte: CRC must catch it
    fp.write_bytes(bytes(blob))
    with pytest.raises(ValueError, match="checksum"):
        read_delta_snapshot(spark, str(dest)).collect()
    fp.unlink()
    with pytest.raises(ValueError, match="missing"):
        read_delta_snapshot(spark, str(dest)).collect()


def test_dv_change_feed_emits_exact_row_level_changes(spark, tmp_path):
    """table_changes over DV commits: a DV DELETE (remove+add of the same
    path with a grown DV) emits ONLY the newly-marked rows as deletes —
    never the whole file as delete+insert — and a later whole-file remove
    emits only the rows that were still live."""
    from pyspark_cdc_engine.delta_export import read_delta_changes

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(30).repartition(1).selectExpr("id"))
    dest = tmp_path / "delta"
    export_delta_snapshot(t, str(dest))                               # v0
    rel = next(a["add"]["path"] for a in _read_actions(dest) if a.get("add"))
    import pyarrow.parquet as pq_

    col = pq_.read_table(str(dest / rel), columns=["id"])["id"].to_pylist()
    _dv_delete(dest, rel, [2, 5], version=1)                          # DELETE
    _dv_delete(dest, rel, [2, 5, 9], version=2)                       # DELETE
    feed = read_delta_changes(spark, str(dest), 0, 2)
    got = sorted(
        (r["_commit_version"], r["_change_type"], r.id) for r in feed.collect()
    )
    assert got == [
        (1, "delete", col[2]), (1, "delete", col[5]),
        (2, "delete", col[9]),
    ]
    # whole-file remove after the DVs: only the 27 surviving rows delete
    log = dest / "_delta_log"
    (log / f"{3:020d}.json").write_text(json.dumps(
        {"remove": {"path": rel, "dataChange": True,
                    "deletionVector": json.loads(
                        (log / f"{2:020d}.json").read_text().splitlines()[-1]
                    )["add"]["deletionVector"]}}) + "\n")
    feed3 = read_delta_changes(spark, str(dest), 2, 3)
    rows3 = [(r["_change_type"], r.id) for r in feed3.collect()]
    assert sorted(rows3) == sorted(
        ("delete", x) for x in set(col) - {col[2], col[5], col[9]}
    )


def test_dv_change_feed_fresh_add_with_dv_inserts_unmarked_rows(spark, tmp_path):
    """An add of a NEW file that already carries a DV (e.g. RESTORE across a
    DV state) inserts only its unmarked rows."""
    from pyspark_cdc_engine import dvformat
    from pyspark_cdc_engine.delta_export import read_delta_changes

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(12).repartition(1).selectExpr("id"))
    dest = tmp_path / "delta"
    export_delta_snapshot(t, str(dest))
    rel = next(a["add"]["path"] for a in _read_actions(dest) if a.get("add"))
    import pyarrow.parquet as pq_

    col = pq_.read_table(str(dest / rel), columns=["id"])["id"].to_pylist()
    # copy the file under a new name, add it WITH a DV in one commit
    new_rel = "part-copy.parquet"
    (dest / new_rel).write_bytes((dest / rel).read_bytes())
    desc = dvformat.write_dv_file(dest, [0, 4])
    (dest / "_delta_log" / f"{1:020d}.json").write_text("\n".join(
        json.dumps(ln) for ln in [
            {"commitInfo": {"timestamp": 1700000000001, "operation": "RESTORE"}},
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["deletionVectors"],
                          "writerFeatures": ["deletionVectors"]}},
            {"add": {"path": new_rel, "partitionValues": {}, "size": 1,
                     "modificationTime": 0, "dataChange": True,
                     "deletionVector": desc}},
        ]))
    feed = read_delta_changes(spark, str(dest), 0, 1)
    got = sorted((r["_change_type"], r.id) for r in feed.collect())
    assert got == sorted(("insert", x) for x in set(col) - {col[0], col[4]})


# ------------------------------------------------- id-mode column mapping (r8)


def test_id_mode_column_mapping_resolves_by_field_id(spark, tmp_path):
    """delta.columnMapping.mode=id: file columns resolve by PARQUET FIELD ID.
    The data file's column names deliberately differ from both the logical
    and the physical names (the UniForm/Iceberg-converted shape) — only id
    matching can read it correctly."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from pyspark_cdc_engine.delta_export import read_delta_snapshot

    dest = tmp_path / "delta_id"
    (dest / "_delta_log").mkdir(parents=True)
    tbl = pa.table({}).from_arrays(
        [pa.array([1, 2, 3], pa.int64()), pa.array(["a", "b", "c"])],
        schema=pa.schema([
            pa.field("weird_1", pa.int64(), metadata={b"PARQUET:field_id": b"1"}),
            pa.field("weird_2", pa.string(), metadata={b"PARQUET:field_id": b"2"}),
        ]),
    )
    pq_.write_table(tbl, str(dest / "part-0.parquet"))
    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-phys-1"}},
            {"name": "label", "type": "string", "nullable": True,
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "col-phys-2"}},
        ],
    }
    lines = [
        {"commitInfo": {"timestamp": 1700000000000, "operation": "WRITE"}},
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["columnMapping"],
                      "writerFeatures": ["columnMapping"]}},
        {"metaData": {"id": "0000", "format": {"provider": "parquet"},
                      "schemaString": json.dumps(schema),
                      "partitionColumns": [],
                      "configuration": {"delta.columnMapping.mode": "id",
                                        "delta.columnMapping.maxColumnId": "2"}}},
        {"add": {"path": "part-0.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ]
    (dest / "_delta_log" / f"{0:020d}.json").write_text(
        "\n".join(json.dumps(ln) for ln in lines)
    )
    got = read_delta_snapshot(spark, str(dest))
    assert [f.name for f in got.schema.fields] == ["id", "label"]
    assert sorted((r.id, r.label) for r in got.collect()) == [
        (1, "a"), (2, "b"), (3, "c")
    ]


def test_id_mode_with_delta_spark_style_files(spark, tmp_path):
    """The common delta-spark id-mode shape: files carry BOTH field ids and
    physicalName column names. Must read identically."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from pyspark_cdc_engine.delta_export import read_delta_snapshot

    dest = tmp_path / "delta_id2"
    (dest / "_delta_log").mkdir(parents=True)
    tbl = pa.Table.from_arrays(
        [pa.array([10.5, 20.5])],
        schema=pa.schema([
            pa.field("col-abc", pa.float64(),
                     metadata={b"PARQUET:field_id": b"7"}),
        ]),
    )
    pq_.write_table(tbl, str(dest / "f.parquet"))
    schema = {
        "type": "struct",
        "fields": [
            {"name": "price", "type": "double", "nullable": True,
             "metadata": {"delta.columnMapping.id": 7,
                          "delta.columnMapping.physicalName": "col-abc"}},
        ],
    }
    lines = [
        {"metaData": {"id": "0001", "format": {"provider": "parquet"},
                      "schemaString": json.dumps(schema),
                      "partitionColumns": [],
                      "configuration": {"delta.columnMapping.mode": "id"}}},
        {"add": {"path": "f.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ]
    (dest / "_delta_log" / f"{0:020d}.json").write_text(
        "\n".join(json.dumps(ln) for ln in lines)
    )
    got = read_delta_snapshot(spark, str(dest))
    assert sorted(r.price for r in got.collect()) == [10.5, 20.5]


def test_dv_on_partitioned_table_composes_with_partition_columns(spark, tmp_path):
    """DVs anti-join by (file, row_index) while partition columns are
    reconstructed from the log — the two mechanisms must compose."""
    from pyspark_cdc_engine.delta_export import read_delta_snapshot

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    df = spark.range(24).selectExpr("id", "CAST(id % 2 AS STRING) AS bucket")
    t.overwrite(df, partition_by=["bucket"])
    dest = tmp_path / "delta"
    export_delta_snapshot(t, str(dest))
    adds = [a["add"] for a in _read_actions(dest) if a.get("add")]
    victim = next(a for a in adds if a["partitionValues"]["bucket"] == "1")
    import pyarrow.parquet as pq_

    col = pq_.read_table(str(dest / victim["path"]), columns=["id"])["id"].to_pylist()
    _dv_delete(dest, victim["path"], [0, 2], version=1)
    got = read_delta_snapshot(spark, str(dest))
    assert [f.name for f in got.schema.fields] == ["id", "bucket"]
    rows = {(r.id, r.bucket) for r in got.collect()}
    assert rows == {
        (i, str(i % 2)) for i in range(24) if i not in (col[0], col[2])
    }


def test_id_mode_change_feed_resolves_by_field_id(spark, tmp_path):
    """read_delta_changes on an id-mode table whose file column names match
    neither logical nor physical names: field-id resolution must hold on the
    feed path too (name projection would silently yield NULL columns)."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from pyspark_cdc_engine.delta_export import read_delta_changes

    dest = tmp_path / "delta_id"
    (dest / "_delta_log").mkdir(parents=True)
    tbl = pa.Table.from_arrays(
        [pa.array([1, 2, 3], pa.int64())],
        schema=pa.schema(
            [pa.field("weird", pa.int64(), metadata={b"PARQUET:field_id": b"1"})]
        ),
    )
    pq_.write_table(tbl, str(dest / "f0.parquet"))
    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-p1"}},
        ],
    }
    lines = [
        {"metaData": {"id": "0002", "format": {"provider": "parquet"},
                      "schemaString": json.dumps(schema),
                      "partitionColumns": [],
                      "configuration": {"delta.columnMapping.mode": "id"}}},
        {"add": {"path": "f0.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ]
    (dest / "_delta_log" / f"{0:020d}.json").write_text(
        "\n".join(json.dumps(ln) for ln in lines)
    )
    feed = read_delta_changes(spark, str(dest), -1, 0)
    got = sorted((r["_change_type"], r.id) for r in feed.collect())
    assert got == [("insert", 1), ("insert", 2), ("insert", 3)]


def test_dv_import_spills_past_broadcast_cap(spark, tmp_path):
    """Above engine.dv-import-broadcast-max the DV positions spill to a
    parquet-backed join instead of a driver-built broadcast — same result."""
    from pyspark_cdc_engine import config as cfgmod
    from pyspark_cdc_engine.delta_export import read_delta_snapshot

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(30).repartition(1).selectExpr("id"))
    dest = tmp_path / "delta"
    export_delta_snapshot(t, str(dest))
    rel = next(a["add"]["path"] for a in _read_actions(dest) if a.get("add"))
    _dv_delete(dest, rel, [1, 4, 7], version=1)
    import pyarrow.parquet as pq_

    col = pq_.read_table(str(dest / rel), columns=["id"])["id"].to_pylist()
    want = set(col) - {col[1], col[4], col[7]}
    custom = cfgmod.load(overrides={"engine.dv-import-broadcast-max": 1})
    cfgmod.set_config(custom)
    try:
        got = {r.id for r in read_delta_snapshot(spark, str(dest)).collect()}
    finally:
        cfgmod.set_config(None)
    assert got == want


def test_dv_import_handles_uri_special_chars_in_table_path(spark, tmp_path):
    """Spark's _metadata.file_path is java.net.URI-quoted (space -> %20,
    '+' literal): the DV join keys must quote identically or tombstoned
    rows silently resurrect for any table under a path needing encoding."""
    from pyspark_cdc_engine.delta_export import (
        read_delta_changes,
        read_delta_snapshot,
    )

    base = tmp_path / "my tables+x"
    base.mkdir()
    t = DeltaliteTable(spark, str(base / "src"))
    t.overwrite(spark.range(10).repartition(1).selectExpr("id"))
    dest = base / "delta"
    export_delta_snapshot(t, str(dest))
    rel = next(a["add"]["path"] for a in _read_actions(dest) if a.get("add"))
    import pyarrow.parquet as pq_

    col = pq_.read_table(str(dest / rel), columns=["id"])["id"].to_pylist()
    _dv_delete(dest, rel, [1, 3], version=1)
    got = {r.id for r in read_delta_snapshot(spark, str(dest)).collect()}
    assert got == set(col) - {col[1], col[3]}
    feed = read_delta_changes(spark, str(dest), 0, 1)
    dels = {r.id for r in feed.filter("_change_type = 'delete'").collect()}
    assert dels == {col[1], col[3]}


# ----------------------------------------------------- native DV export (r8)


def test_native_dv_history_export_round_trips_every_version(spark, tmp_path):
    """dv='native': data files copy ONCE and DV commits emit remove+add of
    the same path with real roaring-bitmap descriptors — the two
    independently-built codepaths (dvformat writer in the export, DV-aware
    importer from this round) must agree with the source at every version."""
    import json as _json

    from pyspark_cdc_engine.delta_export import (
        export_delta_history,
        read_delta_changes,
        read_delta_snapshot,
    )
    from pyspark_cdc_engine.tables import DeltaliteTable

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(30).selectExpr("id", "CAST(id AS DOUBLE) AS v"))
    t.update({"v": "v + 0.5"}, "id IN (3, 7)", mode="dv")   # v1: DV + images
    t.delete("id % 9 = 1", mode="dv")                       # v2: DV delete
    t.delete("id = 20", mode="dv")                          # v3: stacks
    t.restore(2)                                            # v4: DV rewind
    hist = tmp_path / "hist"
    summary = export_delta_history(t, str(hist), dv="native")
    assert summary["n_dv_files"] >= 2
    log = hist / "_delta_log"
    actions = [
        _json.loads(ln)
        for p in sorted(log.glob("*.json"))
        for ln in p.read_text().splitlines()
    ]
    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert proto["minReaderVersion"] == 3
    assert "deletionVectors" in proto["readerFeatures"]
    dv_adds = [a["add"] for a in actions
               if a.get("add", {}).get("deletionVector")]
    assert dv_adds, "no descriptor-bearing adds emitted"
    assert all(d["deletionVector"]["storageType"] == "u" for d in dv_adds)
    # every data file copied exactly once: no -m materialized variants
    assert not list(hist.rglob("*-m*.parquet"))
    for v in range(t.latest_version() + 1):
        got = sorted(
            (r.id, r.v)
            for r in read_delta_snapshot(spark, str(hist), v).collect()
        )
        want = sorted((r.id, r.v) for r in t.read(version=v).collect())
        assert got == want, f"version {v}"
    # the exported cdc actions reproduce deltalite's own feed
    want_feed = {
        (r.id, float(r.v), r["_change_type"], r["_commit_version"])
        for r in t.read_changes(0).collect()
    }
    got_feed = {
        (r.id, float(r.v), r["_change_type"], r["_commit_version"])
        for r in read_delta_changes(spark, str(hist), 0).collect()
    }
    assert got_feed == want_feed and want_feed


def test_native_dv_export_of_pruned_history_round_trips(spark, tmp_path):
    """A retention-pruned DV-heavy history exports with dv='native' (r9 —
    the r8 refusal lifted): the BOUNDARY CHECKPOINT carries DV-struct add
    rows + the table-features protocol, every retained version round-trips
    through the independent importer, and no file re-materializes."""
    import json as _json

    from pyspark_cdc_engine.delta_export import (
        export_delta_history,
        read_delta_snapshot,
    )
    from pyspark_cdc_engine.tables import DeltaliteTable

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(40).selectExpr("id", "CAST(id AS DOUBLE) AS v"))
    t.delete("id % 7 = 3", mode="dv")            # DV BELOW the boundary:
    t.update({"v": "v + 9"}, "id < 5", mode="dv")  # carried into the ckpt
    for i in range(22):
        t.append(spark.range(100 + i, 101 + i).selectExpr(
            "id", "CAST(id AS DOUBLE) AS v"))
    t.delete("id = 101", mode="dv")              # DV above the boundary too
    t.cleanup_log(retain_last=4)
    oldest = t._oldest_retained()
    assert oldest > 0
    hist = tmp_path / "hist"
    summary = export_delta_history(t, str(hist), dv="native")
    assert summary["n_dv_files"] >= 1
    log = hist / "_delta_log"
    assert not list(hist.rglob("*-m*.parquet"))  # nothing re-materialized
    # the boundary checkpoint itself carries descriptor-bearing adds and
    # the reader-3 feature protocol
    import pyarrow.parquet as _pq

    ck = _pq.read_table(log / f"{oldest:020d}.checkpoint.parquet").to_pylist()
    proto = next(r["protocol"] for r in ck if r.get("protocol"))
    assert proto["minReaderVersion"] == 3
    assert "deletionVectors" in proto["readerFeatures"]
    assert any(
        (r.get("add") or {}).get("deletionVector", {}).get("storageType") == "u"
        for r in ck
    )
    for v in range(oldest, t.latest_version() + 1):
        got = sorted(
            (r.id, r.v)
            for r in read_delta_snapshot(spark, str(hist), v).collect()
        )
        want = sorted((r.id, r.v) for r in t.read(version=v).collect())
        assert got == want, f"version {v}"


def test_native_mode_without_dvs_matches_materialize(spark, tmp_path):
    """A DV-free history exports identically in both modes (protocol stays
    at the classic versions — no gratuitous feature requirements)."""
    import json as _json

    from pyspark_cdc_engine.delta_export import (
        export_delta_history,
        read_delta_snapshot,
    )
    from pyspark_cdc_engine.tables import DeltaliteTable

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(10).selectExpr("id"))
    t.append(spark.range(10, 15).selectExpr("id"))
    hist = tmp_path / "hist"
    export_delta_history(t, str(hist), dv="native")
    first = (hist / "_delta_log" / f"{0:020d}.json").read_text()
    proto = next(
        _json.loads(ln)["protocol"]
        for ln in first.splitlines() if '"protocol"' in ln
    )
    assert proto["minReaderVersion"] == 1 and "readerFeatures" not in proto
    assert read_delta_snapshot(spark, str(hist)).count() == 15


def test_change_feed_attaches_partition_values(spark, tmp_path):
    """Partition-column values live in the log (add/cdc partitionValues),
    not in file bytes — the feed must re-attach them per partition group
    (pre-r8 every partition key came back NULL and a consumer merging on it
    wrote wrong rows)."""
    from pyspark_cdc_engine.delta_export import read_delta_changes

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(
        spark.range(12).selectExpr("id", "CAST(id % 3 AS STRING) AS g"),
        partition_by=["g"],
    )
    dest = tmp_path / "delta"
    export_delta_snapshot(t, str(dest))
    feed = read_delta_changes(spark, str(dest), -1, 0)
    got = sorted((r.id, r.g, r["_change_type"]) for r in feed.collect())
    assert got == sorted((i, str(i % 3), "insert") for i in range(12))
    assert not any(g is None for _, g, _ in got)


def test_partitioned_history_feed_carries_partition_keys(spark, tmp_path):
    """A partitioned history's derived delete rows carry their partition-key
    values: the export writes partitionValues on remove actions (file bytes
    don't hold partition columns) and the feed re-attaches them."""
    from pyspark_cdc_engine.delta_export import (
        export_delta_history,
        read_delta_changes,
    )

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(
        spark.range(12).selectExpr("id", "CAST(id % 2 AS STRING) AS g"),
        partition_by=["g"],
    )
    t.delete("id >= 8")  # cow delete: remove+add per touched partition
    hist = tmp_path / "hist"
    export_delta_history(t, str(hist))
    feed = read_delta_changes(spark, str(hist), 0, 1)
    rows = [(r.id, r.g, r["_change_type"]) for r in feed.collect()]
    assert rows and not any(g is None for _, g, _ in rows)
    assert all(g == str(i % 2) for i, g, _ in rows)
    # the derived feed is whole-file (remove all -> delete, re-add survivors
    # -> insert; the Delta derivation contract for non-CDC rewrites) — its
    # NET effect must equal deltalite's exact predicate-replayed feed
    net: dict[int, str] = {}
    for i, _g, ct in sorted(
        rows, key=lambda x: 0 if x[2] == "delete" else 1
    ):
        net[i] = ct  # insert after delete = survives
    dead = {i for i, ct in net.items() if ct == "delete"}
    assert dead == {
        r.id for r in t.read_changes(0, 1).filter(
            "_change_type = 'delete'"
        ).collect()
    }


def test_native_dv_export_with_column_mapping(spark, tmp_path):
    """Native DV export composes with column mapping: protocol lists BOTH
    features, files resolve by physicalName, tombstones apply."""
    import json as _json

    from pyspark_cdc_engine.delta_export import (
        export_delta_history,
        read_delta_snapshot,
    )

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(15).selectExpr("id", "CAST(id AS DOUBLE) AS v"))
    t.rename_column("v", "price")
    t.delete("id % 4 = 2", mode="dv")
    hist = tmp_path / "hist"
    export_delta_history(t, str(hist), dv="native")
    first = (hist / "_delta_log" / f"{0:020d}.json").read_text()
    proto = next(
        _json.loads(ln)["protocol"]
        for ln in first.splitlines() if '"protocol"' in ln
    )
    assert set(proto["readerFeatures"]) == {"deletionVectors", "columnMapping"}
    for v in range(t.latest_version() + 1):
        got = sorted(
            tuple(r) for r in read_delta_snapshot(spark, str(hist), v).collect()
        )
        want = sorted(tuple(r) for r in t.read(version=v).collect())
        assert got == want, f"version {v}"


def test_partitioned_import_is_one_scan_with_pruning(spark, tmp_path):
    """Hive-laid partitioned tables import as ONE basePath scan (plan size
    independent of partition count — a 10k-partition table must not union
    10k scans), and a partition filter prunes at the source."""
    from pyspark_cdc_engine.delta_export import read_delta_snapshot

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(
        spark.range(64).selectExpr("id", "CAST(id % 16 AS STRING) AS g"),
        partition_by=["g"],
    )
    dest = tmp_path / "delta"
    export_delta_snapshot(t, str(dest))
    df = read_delta_snapshot(spark, str(dest))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1 and "Union" not in plan
    assert sorted((r.id, r.g) for r in df.collect()) == [
        (i, str(i % 16)) for i in range(64)
    ]
    pruned = df.filter("g = '3'")
    pplan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in pplan and "g#" in pplan.split(
        "PartitionFilters"
    )[1][:80]
    assert {r.id for r in pruned.collect()} == {i for i in range(64) if i % 16 == 3}


def test_non_hive_partition_layout_falls_back_to_log_values(spark, tmp_path):
    """Files named freely (partition values ONLY in add.partitionValues, no
    k=v dirs — the foreign-writer shape) keep the per-tuple literal path."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from pyspark_cdc_engine.delta_export import read_delta_snapshot

    dest = tmp_path / "delta"
    (dest / "_delta_log").mkdir(parents=True)
    for i, name in enumerate(["a.parquet", "b.parquet"]):
        pq_.write_table(
            pa.table({"id": pa.array([i * 10, i * 10 + 1], pa.int64())}),
            str(dest / name),
        )
    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "g", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
    lines = [
        {"metaData": {"id": "0003", "format": {"provider": "parquet"},
                      "schemaString": json.dumps(schema),
                      "partitionColumns": ["g"], "configuration": {}}},
        {"add": {"path": "a.parquet", "partitionValues": {"g": "x"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
        {"add": {"path": "b.parquet", "partitionValues": {"g": "y"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ]
    (dest / "_delta_log" / f"{0:020d}.json").write_text(
        "\n".join(json.dumps(ln) for ln in lines)
    )
    got = sorted((r.id, r.g) for r in read_delta_snapshot(spark, str(dest)).collect())
    assert got == [(0, "x"), (1, "x"), (10, "y"), (11, "y")]


def test_hive_dirs_disagreeing_with_log_fall_back_to_log_values(spark, tmp_path):
    """The Delta log's add.partitionValues map is AUTHORITATIVE; Hive-shaped
    dir names are just a layout convention. A spec-legal table whose dirs
    and log disagree must take the per-tuple scan so the values come from
    the log — the basePath fast path would silently read the dir values
    (r8 ADVICE)."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from pyspark_cdc_engine.delta_export import read_delta_snapshot

    dest = tmp_path / "delta"
    (dest / "_delta_log").mkdir(parents=True)
    # dirs SAY g=x / g=y; the log says g=u / g=v. Log wins.
    for i, d in enumerate(["g=x", "g=y"]):
        (dest / d).mkdir()
        pq_.write_table(
            pa.table({"id": pa.array([i * 10, i * 10 + 1], pa.int64())}),
            str(dest / d / "part-0.parquet"),
        )
    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "g", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
    lines = [
        {"metaData": {"id": "0004", "format": {"provider": "parquet"},
                      "schemaString": json.dumps(schema),
                      "partitionColumns": ["g"], "configuration": {}}},
        {"add": {"path": "g=x/part-0.parquet", "partitionValues": {"g": "u"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
        {"add": {"path": "g=y/part-0.parquet", "partitionValues": {"g": "v"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ]
    (dest / "_delta_log" / f"{0:020d}.json").write_text(
        "\n".join(json.dumps(ln) for ln in lines)
    )
    got = sorted((r.id, r.g) for r in read_delta_snapshot(spark, str(dest)).collect())
    assert got == [(0, "u"), (1, "u"), (10, "v"), (11, "v")]


def test_hive_dirs_agreeing_with_log_keep_the_base_path_scan(spark, tmp_path):
    """The agreement check must not cost the fast path when dirs and log DO
    agree — including escaped values (space, colon) and nulls."""
    from pyspark_cdc_engine.delta_export import read_delta_snapshot

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(
        spark.range(12).selectExpr(
            "id",
            "CASE WHEN id % 3 = 0 THEN NULL "
            "WHEN id % 3 = 1 THEN 'a b' ELSE 'x:y' END AS g",
        ),
        partition_by=["g"],
    )
    dest = tmp_path / "delta"
    export_delta_snapshot(t, str(dest))
    df = read_delta_snapshot(spark, str(dest))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1 and "Union" not in plan
    want = sorted(
        (i, None if i % 3 == 0 else ("a b" if i % 3 == 1 else "x:y"))
        for i in range(12)
    )
    assert sorted((r.id, r.g) for r in df.collect()) == want


def test_long_history_export_writes_periodic_checkpoints(spark, tmp_path):
    """Delta's checkpoint cadence: a 25-commit export carries checkpoints at
    v10 and v20 plus _last_checkpoint, so a real reader opens the latest
    version from the newest checkpoint + a short JSON suffix instead of
    replaying 25 JSON files — and time travel BELOW a checkpoint still
    answers (readers seed from the newest checkpoint at or below the
    target)."""
    from pyspark_cdc_engine.delta_export import (
        _log_actions_upto,
        export_delta_history,
        read_delta_snapshot,
    )
    from pyspark_cdc_engine.tables import DeltaliteTable

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(5).selectExpr("id", "id * 2 AS v"))
    for i in range(25):
        if i == 12:
            t.delete("id = 2")  # a cow DML mid-history
        else:
            t.append(spark.range(100 + i, 101 + i).selectExpr("id", "id * 2 AS v"))
    hist = tmp_path / "hist"
    export_delta_history(t, str(hist))
    log = hist / "_delta_log"
    assert (log / f"{10:020d}.checkpoint.parquet").is_file()
    assert (log / f"{20:020d}.checkpoint.parquet").is_file()
    assert json.loads((log / "_last_checkpoint").read_text())["version"] == 20
    # every JSON commit still present (checkpoints add, never retire)
    assert len(list(log.glob("*.json"))) == t.latest_version() + 1
    # the reader really does seed from the newest checkpoint + suffix only
    ckpt_paths, ckpt_v, jsons = _log_actions_upto(log, None)
    assert ckpt_v == 20 and ckpt_paths
    assert [int(p.stem) for p in jsons] == list(range(21, 26))
    # ... and below-checkpoint time travel seeds from the right one
    _, ckpt_v15, jsons15 = _log_actions_upto(log, 15)
    assert ckpt_v15 == 10
    assert [int(p.stem) for p in jsons15] == list(range(11, 16))
    for v in (0, 9, 10, 11, 15, 20, 25):
        got = sorted(
            (r.id, r.v) for r in read_delta_snapshot(spark, str(hist), v).collect()
        )
        want = sorted((r.id, r.v) for r in t.read(version=v).collect())
        assert got == want, f"version {v}"


def test_periodic_checkpoints_disabled_and_custom_interval(spark, tmp_path):
    from pyspark_cdc_engine.delta_export import export_delta_history
    from pyspark_cdc_engine.tables import DeltaliteTable

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(5).selectExpr("id"))
    for i in range(12):
        t.append(spark.range(100 + i, 101 + i).selectExpr("id"))
    off = tmp_path / "off"
    export_delta_history(t, str(off), checkpoint_interval=0)
    assert not list((off / "_delta_log").glob("*.checkpoint.parquet"))
    assert not (off / "_delta_log" / "_last_checkpoint").exists()
    every5 = tmp_path / "every5"
    export_delta_history(t, str(every5), checkpoint_interval=5)
    got = sorted(
        int(p.name.split(".")[0])
        for p in (every5 / "_delta_log").glob("*.checkpoint.parquet")
    )
    assert got == [5, 10]


def _write_feature_table(dest, schema_fields, feature, arrow_table,
                         parquet_src=None):
    """A minimal hand-written real-Delta table: one parquet file, protocol
    at reader 3 with the given feature, one metaData + add commit.
    ``parquet_src`` (a path) substitutes an externally-written data file —
    needed for types this pyarrow can't write (VARIANT)."""
    import pyarrow.parquet as pq_

    (dest / "_delta_log").mkdir(parents=True)
    if parquet_src is not None:
        import shutil as _sh

        _sh.copy2(parquet_src, dest / "part-0.parquet")
    else:
        pq_.write_table(arrow_table, str(dest / "part-0.parquet"))
    schema = {"type": "struct", "fields": schema_fields}
    lines = [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": [feature],
                      "writerFeatures": [feature]}},
        {"metaData": {"id": "0005", "format": {"provider": "parquet"},
                      "schemaString": json.dumps(schema),
                      "partitionColumns": [], "configuration": {}}},
        {"add": {"path": "part-0.parquet", "partitionValues": {},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ]
    (dest / "_delta_log" / f"{0:020d}.json").write_text(
        "\n".join(json.dumps(ln) for ln in lines)
    )


def test_import_timestamp_ntz_tables(spark, tmp_path):
    """delta-spark tables with TIMESTAMP_NTZ columns (readerFeature
    timestampNtz) import: schemaString's timestamp_ntz maps to
    TimestampNTZType, values wall-clock exact (r8 verdict ask #4)."""
    import datetime

    import pyarrow as pa

    from pyspark_cdc_engine.delta_export import read_delta_snapshot

    dest = tmp_path / "delta"
    _write_feature_table(
        dest,
        [{"name": "id", "type": "long", "nullable": True, "metadata": {}},
         {"name": "ts", "type": "timestamp_ntz", "nullable": True,
          "metadata": {}}],
        "timestampNtz",
        pa.table({
            "id": pa.array([1, 2], pa.int64()),
            # parquet timestamp with isAdjustedToUTC=false == NTZ
            "ts": pa.array([datetime.datetime(2024, 1, 2, 3, 4, 5),
                            datetime.datetime(2030, 6, 7, 8, 9, 10)],
                           pa.timestamp("us")),
        }),
    )
    df = read_delta_snapshot(spark, str(dest))
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    got = sorted((r.id, r.ts) for r in df.collect())
    assert got == [
        (1, datetime.datetime(2024, 1, 2, 3, 4, 5)),
        (2, datetime.datetime(2030, 6, 7, 8, 9, 10)),
    ]


def test_import_variant_tables(spark, tmp_path):
    """variantType (Delta 4.0 / Spark 4.0 readerFeature) import:
    schemaString's "variant" maps to Spark's VariantType and the scan reads
    the VARIANT-encoded value/metadata binaries natively. The fixture's data
    file is written by Spark itself (the reference implementation of the
    open variant encoding Delta adopted) because this pyarrow predates the
    VARIANT logical type; shredded values round-trip through to_json and
    variant_get."""
    import glob

    import pyspark.sql.functions as F

    from pyspark_cdc_engine.delta_export import read_delta_snapshot

    stage = str(tmp_path / "stage")
    spark.range(3).select(
        "id",
        F.parse_json(
            F.concat(F.lit('{"a":'), F.col("id").cast("string"),
                     F.lit(',"b":"x"}'))
        ).alias("v"),
    ).coalesce(1).write.mode("overwrite").parquet(stage)
    dest = tmp_path / "delta"
    _write_feature_table(
        dest,
        [{"name": "id", "type": "long", "nullable": True, "metadata": {}},
         {"name": "v", "type": "variant", "nullable": True, "metadata": {}}],
        "variantType",
        None,
        parquet_src=glob.glob(stage + "/part-*.parquet")[0],
    )
    df = read_delta_snapshot(spark, str(dest))
    assert dict(df.dtypes)["v"] == "variant"
    got = sorted(
        (r["id"], r["j"], r["a"])
        for r in df.select(
            "id",
            F.expr("to_json(v)").alias("j"),
            F.expr("CAST(variant_get(v, '$.a') AS BIGINT)").alias("a"),
        ).collect()
    )
    assert got == [
        (0, '{"a":0,"b":"x"}', 0),
        (1, '{"a":1,"b":"x"}', 1),
        (2, '{"a":2,"b":"x"}', 2),
    ]


def test_import_type_widened_tables(spark, tmp_path):
    """typeWidening (reader side): files hold the NARROWER pre-widening
    physical type; the explicit read schema upcasts int->long/double and
    float->double in the scan."""
    import pyarrow as pa

    from pyspark_cdc_engine.delta_export import read_delta_snapshot

    dest = tmp_path / "delta"
    _write_feature_table(
        dest,
        [{"name": "i", "type": "long", "nullable": True, "metadata": {}},
         {"name": "f", "type": "double", "nullable": True, "metadata": {}},
         {"name": "x", "type": "double", "nullable": True, "metadata": {}}],
        "typeWidening",
        pa.table({
            "i": pa.array([7, 8], pa.int32()),
            "f": pa.array([1.5, 2.5], pa.float32()),
            "x": pa.array([3, 4], pa.int32()),
        }),
    )
    df = read_delta_snapshot(spark, str(dest))
    assert dict(df.dtypes) == {"i": "bigint", "f": "double", "x": "double"}
    assert sorted((r.i, r.f, r.x) for r in df.collect()) == [
        (7, 1.5, 3.0), (8, 2.5, 4.0)
    ]


def test_unknown_reader_features_still_refused(spark, tmp_path):
    import pyarrow as pa

    from pyspark_cdc_engine.delta_export import read_delta_snapshot

    dest = tmp_path / "delta"
    _write_feature_table(
        dest,
        [{"name": "id", "type": "long", "nullable": True, "metadata": {}}],
        "collations",
        pa.table({"id": pa.array([1], pa.int64())}),
    )
    with pytest.raises(ValueError, match="collations"):
        read_delta_snapshot(spark, str(dest))


def test_hive_dir_multibyte_escape_compares_byte_wise(spark, tmp_path):
    """Spark's unescapePathName decodes %XX CHAR-wise, not UTF-8: a foreign
    writer's dir g=%C3%A9 scans as 'Ã©' even when the log says 'é'. The
    agreement check must compare what the SCAN would produce (byte-wise
    decode) so this table takes the per-tuple path and reads the log's
    'é', never the dir's mojibake."""
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from pyspark_cdc_engine.delta_export import read_delta_snapshot

    dest = tmp_path / "delta"
    (dest / "_delta_log").mkdir(parents=True)
    d = dest / "g=%C3%A9"  # literal percent-escapes in the dir name
    d.mkdir()
    pq_.write_table(
        pa.table({"id": pa.array([1, 2], pa.int64())}), str(d / "part-0.parquet")
    )
    schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "g", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
    lines = [
        {"metaData": {"id": "0006", "format": {"provider": "parquet"},
                      "schemaString": json.dumps(schema),
                      "partitionColumns": ["g"], "configuration": {}}},
        # add.path URI-encodes the literal '%' as %25
        {"add": {"path": "g=%25C3%25A9/part-0.parquet",
                 "partitionValues": {"g": "é"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ]
    (dest / "_delta_log" / f"{0:020d}.json").write_text(
        "\n".join(json.dumps(ln) for ln in lines)
    )
    got = sorted((r.id, r.g) for r in read_delta_snapshot(spark, str(dest)).collect())
    assert got == [(1, "é"), (2, "é")]


def test_periodic_checkpoint_carries_remove_tombstones(spark, tmp_path):
    """ADVICE r9: the Delta spec requires unexpired remove tombstones in
    checkpoints — a real client reconstructing tombstone state from the
    checkpoint (VACUUM) must see files removed just before it, or it could
    delete files still referenced by earlier exported versions."""
    from pyspark_cdc_engine.delta_export import (
        _iter_parquet_actions,
        export_delta_history,
        read_delta_snapshot,
    )
    from pyspark_cdc_engine.tables import DeltaliteTable

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(6).selectExpr("id", "id * 2 AS v"))  # v0
    for i in range(8):  # v1..v8
        t.append(spark.range(100 + i, 101 + i).selectExpr("id", "id * 2 AS v"))
    t.delete("id = 2")  # v9: the pre-delete variant becomes a tombstone
    t.append(spark.range(200, 201).selectExpr("id", "id * 2 AS v"))  # v10
    hist = tmp_path / "hist"
    export_delta_history(t, str(hist))

    ckpt = hist / "_delta_log" / f"{10:020d}.checkpoint.parquet"
    assert ckpt.is_file()
    adds, removes = set(), []
    for a in _iter_parquet_actions(ckpt):
        if a.get("add"):
            adds.add(a["add"]["path"])
        if a.get("remove"):
            removes.append(a["remove"])
    assert removes, "checkpoint carries no remove tombstones"
    for rm in removes:
        assert rm["path"] not in adds  # tombstones are disjoint from live
        assert rm["deletionTimestamp"] is not None
        # empty parquet MAP normalizes to [] in the batched reader
        assert rm.get("partitionValues") in ({}, [])
    # tombstone state matches what replaying the JSON commits yields
    live, gone = {}, set()
    for jv in range(0, 11):
        for ln in (hist / "_delta_log" / f"{jv:020d}.json").read_text().splitlines():
            a = json.loads(ln)
            if a.get("add"):
                live[a["add"]["path"]] = True
                gone.discard(a["add"]["path"])
            elif a.get("remove"):
                live.pop(a["remove"]["path"], None)
                gone.add(a["remove"]["path"])
    assert {rm["path"] for rm in removes} == gone
    assert adds == set(live)
    # snapshot reads (checkpoint-seeded and below) stay byte-identical
    for v in (0, 9, 10):
        got = sorted(
            (r.id, r.v) for r in read_delta_snapshot(spark, str(hist), v).collect()
        )
        want = sorted((r.id, r.v) for r in t.read(version=v).collect())
        assert got == want, f"version {v}"


def test_native_dv_checkpoint_remove_keeps_descriptor(spark, tmp_path):
    """Native-DV mode: a remove of a path whose prior add carried a
    deletionVector descriptor keeps that descriptor in the checkpoint's
    remove struct (delta-spark writes it; a DV-aware VACUUM frees the
    sidecar only once its tombstone expires)."""
    from pyspark_cdc_engine.delta_export import (
        _iter_parquet_actions,
        export_delta_history,
        read_delta_snapshot,
    )
    from pyspark_cdc_engine.tables import DeltaliteTable

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(8).selectExpr("id", "id * 2 AS v"))  # v0
    for i in range(6):  # v1..v6
        t.append(spark.range(100 + i, 101 + i).selectExpr("id", "id * 2 AS v"))
    t.delete("id = 1", mode="dv")  # v7: DV -> the add carries a descriptor
    # v8: the overwrite removes the DV-bearing file outright — its tombstone
    # must keep the descriptor (a DV delete alone re-adds the same path, so
    # reconciliation correctly clears that tombstone instead)
    t.overwrite(spark.range(50, 54).selectExpr("id", "id * 2 AS v"))
    t.append(spark.range(300, 301).selectExpr("id", "id * 2 AS v"))  # v9
    t.append(spark.range(301, 302).selectExpr("id", "id * 2 AS v"))  # v10
    hist = tmp_path / "hist"
    export_delta_history(t, str(hist), dv="native")

    ckpt = hist / "_delta_log" / f"{10:020d}.checkpoint.parquet"
    assert ckpt.is_file()
    removes = [
        a["remove"] for a in _iter_parquet_actions(ckpt) if a.get("remove")
    ]
    assert any(rm.get("deletionVector") for rm in removes), (
        "superseded DV generation lost its descriptor in the checkpoint"
    )
    got = sorted((r.id, r.v) for r in read_delta_snapshot(spark, str(hist)).collect())
    want = sorted((r.id, r.v) for r in t.read().collect())
    assert got == want
