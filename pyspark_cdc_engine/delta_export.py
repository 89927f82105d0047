"""Delta Lake interop WITHOUT delta jars: export deltalite snapshots as real
Delta tables, and read real Delta tables into Spark DataFrames.

deltalite's own log (`tables.py`) is an analog, not the Delta format — the
documented boundary in README "deltalite vs. Delta Lake". This module closes
the interchange half of that gap: `export_delta_snapshot` materializes one
deltalite version as a genuine Delta table — parquet files plus a
`_delta_log/00000000000000000000.json` commit following the public Delta
transaction-log protocol (delta.io PROTOCOL.md): `commitInfo`, `protocol`
(minReaderVersion=1, minWriterVersion=2), `metaData` (Spark-JSON
schemaString, partitionColumns) and one `add` action per data file
(relative path, partitionValues, size, modificationTime, dataChange=true).

Any Delta reader — delta-rs / `deltalake`, Spark with delta jars, DuckDB's
delta extension, Trino — can then read the export directly. It is a SNAPSHOT
export (one commit, no history): deltalite history/CDF stay analog-only,
which the README documents.

No Delta library is needed to WRITE this format (it's JSON-lines over a
directory contract), which is exactly why the export can live here while the
env ships no delta jars.

The inverse, :func:`read_delta_snapshot`, parses a Delta table's
``_delta_log`` — JSON commits plus parquet checkpoints (``_last_checkpoint``)
— replays add/remove actions to the requested version, and returns the
snapshot as a DataFrame with partition columns reconstructed from
``partitionValues`` (Delta stores them in the log, not in the files). Export
and import round-trip through the REAL on-disk format, so each validates the
other without a delta dependency.
"""

from __future__ import annotations

import json
import shutil
import time
import uuid
from pathlib import Path

from pyspark_cdc_engine.tables import DeltaliteTable


def _partition_values(rel_path: str, partition_cols: list[str]) -> dict[str, str]:
    """Hive-style `key=value` components of a file's relative path, in the
    table's partition-column order (Delta `add.partitionValues`)."""
    vals: dict[str, str] = {}
    for comp in Path(rel_path).parts[:-1]:
        if "=" in comp:
            k, _, v = comp.partition("=")
            if k in partition_cols:
                vals[k] = v
    return {c: vals.get(c, "") for c in partition_cols} if partition_cols else {}


def export_delta_snapshot(
    table: DeltaliteTable, dest: str, version: int | None = None
) -> dict:
    """Copy the live parquet of ``version`` (default latest) under ``dest``
    and write a protocol-compliant single-commit ``_delta_log``. Returns a
    summary dict (n_files, total_bytes, version_exported).

    Partition layout is preserved: a deltalite table partitioned by ``k``
    exports with the same ``k=v/`` dirs, and each add action carries the
    matching ``partitionValues`` map — so partition pruning works in the
    consuming engine too."""
    v = table.latest_version() if version is None else version
    commit = table._read_commit(v)
    # the EXPORTED version's schema, not the latest — a time-travel export of
    # a schema-evolved table must advertise what its files actually hold
    if commit.get("schema"):
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(json.loads(commit["schema"]))
    else:
        # pre-evolution table: derive the schema by reading the snapshot
        schema = table.read(version=v).schema
    partition_cols = list(commit.get("partition_by") or [])

    dest_path = Path(dest)
    log_dir = dest_path / "_delta_log"
    log_dir.mkdir(parents=True, exist_ok=False)

    adds = []
    total = 0
    for d in table.live_data_dirs(version=v):
        src_dir = Path(d)
        rel_dir = src_dir.relative_to(table._root / "data") if str(src_dir).startswith(
            str(table._root / "data")
        ) else Path(src_dir.name)
        for f in sorted(src_dir.rglob("*.parquet")):
            rel = rel_dir / f.relative_to(src_dir)
            target = dest_path / rel
            target.parent.mkdir(parents=True, exist_ok=True)
            shutil.copy2(f, target)
            size = target.stat().st_size
            total += size
            adds.append(
                {
                    "add": {
                        "path": rel.as_posix(),
                        "partitionValues": _partition_values(
                            rel.as_posix(), partition_cols
                        ),
                        "size": size,
                        "modificationTime": int(target.stat().st_mtime * 1000),
                        "dataChange": True,
                    }
                }
            )

    now_ms = int(time.time() * 1000)
    actions = [
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "WRITE",
                "operationParameters": {"mode": "ErrorIfExists"},
                "engineInfo": "pyspark-cdc-engine deltalite export",
            }
        },
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": str(uuid.uuid4()),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(schema.jsonValue()),
                "partitionColumns": partition_cols,
                "configuration": {},
                "createdTime": now_ms,
            }
        },
        *adds,
    ]
    commit_file = log_dir / f"{0:020d}.json"
    commit_file.write_text("\n".join(json.dumps(a) for a in actions) + "\n")
    return {
        "version_exported": v,
        "n_files": len(adds),
        "total_bytes": total,
        "dest": str(dest_path),
    }


# --------------------------------------------------------------------- import


def _log_actions_upto(log_dir: Path, version: int | None):
    """Yield (action_dict) streams: checkpoint rows first (if one at or below
    the target version exists), then JSON commits after it, in order. Returns
    (checkpoint_path_or_None, checkpoint_version, [json_commit_paths])."""
    versions = sorted(
        int(p.stem) for p in log_dir.glob("*.json") if p.stem.isdigit()
    )
    ckpt_versions = sorted(
        int(p.name.split(".")[0]) for p in log_dir.glob("*.checkpoint.parquet")
    )
    if not versions and not ckpt_versions:
        raise FileNotFoundError(f"no Delta commits in {log_dir}")
    # a metadata-cleaned table may hold ONLY a checkpoint (json commits
    # retired by delta.logRetentionDuration) — still a complete snapshot
    latest = max(versions + ckpt_versions)
    target = latest if version is None else version
    if target not in versions and target not in ckpt_versions:
        raise ValueError(f"version {target} not present in {log_dir}")

    ckpt_path, ckpt_v = None, -1
    for v in ckpt_versions:
        if ckpt_v < v <= target:
            ckpt_v, ckpt_path = v, log_dir / f"{v:020d}.checkpoint.parquet"
    jsons = [
        log_dir / f"{v:020d}.json" for v in versions if ckpt_v < v <= target
    ]
    return ckpt_path, ckpt_v, jsons


def read_delta_snapshot(spark, path: str, version: int | None = None):
    """Read a REAL Delta table (written by any engine) as a DataFrame, no
    delta jars needed. Supports JSON commits and single-file parquet
    checkpoints; ``version`` = time travel (VERSION AS OF).

    Partition columns are reconstructed per add-file from the log's
    ``partitionValues`` (cast to the schema's types), grouped so each distinct
    partition tuple is one ``spark.read.parquet`` with literal columns — the
    same information a Delta-native reader uses."""
    import pyspark.sql.functions as F
    from pyspark.sql.types import StructType

    root = Path(path)
    log_dir = root / "_delta_log"
    ckpt_path, _ckpt_v, jsons = _log_actions_upto(log_dir, version)

    schema_json: str | None = None
    partition_cols: list[str] = []
    live: dict[str, dict] = {}  # path -> partitionValues

    if ckpt_path is not None:
        for row in spark.read.parquet(str(ckpt_path)).collect():
            d = row.asDict(recursive=True)
            if d.get("metaData") and d["metaData"].get("schemaString"):
                schema_json = d["metaData"]["schemaString"]
                partition_cols = list(d["metaData"]["partitionColumns"] or [])
            add = d.get("add")
            if add and add.get("path"):
                live[add["path"]] = dict(add.get("partitionValues") or {})
            rm = d.get("remove")
            if rm and rm.get("path"):
                live.pop(rm["path"], None)

    for jp in jsons:
        for ln in jp.read_text().splitlines():
            if not ln.strip():
                continue
            a = json.loads(ln)
            if "metaData" in a:
                schema_json = a["metaData"]["schemaString"]
                partition_cols = list(a["metaData"].get("partitionColumns") or [])
            elif "add" in a:
                live[a["add"]["path"]] = dict(a["add"].get("partitionValues") or {})
            elif "remove" in a:
                live.pop(a["remove"]["path"], None)

    if schema_json is None:
        raise ValueError(f"no metaData action found in {log_dir}")
    if not live:
        raise ValueError(f"empty Delta snapshot at {path}")

    full_schema = StructType.fromJson(json.loads(schema_json))
    data_fields = [f for f in full_schema.fields if f.name not in partition_cols]
    data_schema = StructType(data_fields)
    part_types = {f.name: f.dataType for f in full_schema.fields if f.name in partition_cols}

    # group files by partition tuple; one scan per tuple with literal columns
    groups: dict[tuple, list[str]] = {}
    for rel, pvals in live.items():
        key = tuple(pvals.get(c) for c in partition_cols)
        groups.setdefault(key, []).append(str(root / rel))

    out = None
    for key, files in sorted(groups.items(), key=lambda kv: tuple(map(str, kv[0]))):
        df = spark.read.schema(data_schema).parquet(*files)
        for c, v in zip(partition_cols, key):
            # Delta encodes null partition values as missing/empty
            lit = F.lit(None) if v is None or v == "" else F.lit(v)
            df = df.withColumn(c, lit.cast(part_types[c]))
        df = df.select(*[f.name for f in full_schema.fields])
        out = df if out is None else out.unionByName(df)
    return out
