"""Export a deltalite snapshot as a REAL Delta Lake table.

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
"""

from __future__ import annotations

import json
import os
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
    schema = table.schema()
    if schema is None:
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
