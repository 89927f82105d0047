"""Delta-protocol snapshot export (delta_export.py): the emitted _delta_log
follows the public Delta transaction-log contract, add actions cover exactly
the live files, and partitioned tables carry partitionValues."""

from __future__ import annotations

import json
from pathlib import Path

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
