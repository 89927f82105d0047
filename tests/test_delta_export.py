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
