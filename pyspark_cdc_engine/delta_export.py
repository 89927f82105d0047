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
delta extension, Trino — can then read the export directly.
`export_delta_snapshot` is a SNAPSHOT export (one commit, no history);
`export_delta_history` additionally replays the WHOLE deltalite log as a
real multi-commit `_delta_log` (add/remove per version, metaData re-emits on
schema/property changes, `cdc` actions for CDF-materialized change files) —
a Delta reader can time travel to any exported version and consume
`table_changes()` from a CDF-enabled history; `read_delta_changes` is the
matching importer (cdc actions verbatim, insert/delete derivation from
dataChange file actions otherwise). Deletion-vector commits stay
snapshot-only (the real DV protocol is not emitted).

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
import os
import shutil
import time
import urllib.parse
import uuid
from pathlib import Path

from pyspark_cdc_engine import dvformat
from pyspark_cdc_engine.tables import DeltaliteTable


_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"

# java.net.URI path quoting (what Hadoop Path.toString — and therefore
# Spark's `_metadata.file_path` — applies): RFC 2396 unreserved marks plus
# the path-segment reserved set stay literal, everything else (spaces,
# '%', non-ASCII as UTF-8) percent-encodes.
_URI_PATH_SAFE = "/;:@&=+$,-_.!~*'()"


def _uri_path(p: str) -> str:
    """A filesystem path in the form Spark's ``_metadata.file_path`` carries
    after its scheme — REQUIRED for any equality join against that column
    (a raw path with a space would match nothing and a DV anti-join would
    silently resurrect deleted rows)."""
    return urllib.parse.quote(p, safe=_URI_PATH_SAFE)


def _partition_values(
    rel_path: str, partition_cols: list[str]
) -> dict[str, str | None]:
    """Hive-style `key=value` components of a file's relative path, in the
    table's partition-column order (Delta `add.partitionValues`). Dir-name
    values are URL-unescaped (Spark escapes special chars in partition dirs)
    and Hive's null sentinel becomes JSON null, per the Delta spec's
    representation of null partition values."""
    vals: dict[str, str | None] = {}
    for comp in Path(rel_path).parts[:-1]:
        if "=" in comp:
            k, _, v = comp.partition("=")
            if k in partition_cols:
                vals[k] = None if v == _HIVE_NULL else urllib.parse.unquote(v)
    return {c: vals.get(c) for c in partition_cols} if partition_cols else {}


def export_delta_snapshot(
    table: DeltaliteTable, dest: str, version: int | None = None
) -> dict:
    """Copy the live parquet of ``version`` (default latest) under ``dest``
    and write a protocol-compliant single-commit ``_delta_log``. Returns a
    summary dict (n_files, total_bytes, version_exported).

    Partition layout is preserved: a deltalite table partitioned by ``k``
    exports with the same ``k=v/`` dirs, and each add action carries the
    matching ``partitionValues`` map — so partition pruning works in the
    consuming engine too.

    Merge-on-read state exports clean: files referenced by active deletion
    vectors are materialized (tombstoned positions dropped) during the copy;
    unaffected files zero-copy. The destination is always plain Delta."""
    v = table.latest_version() if version is None else version
    commit = table._read_commit(v)
    # Active deletion vectors: the export MATERIALIZES them per affected
    # file — tombstoned rows are filtered out of exactly the files a sidecar
    # references (a driver-side pyarrow positional take, preserving the
    # file's physical schema byte-for-byte otherwise) while every untouched
    # file still zero-copies. The exported snapshot is plain Delta — no DV
    # reader feature needed on the consuming engine.
    dv_pos: dict[str, set[int]] = {}
    if commit.get("dv_files"):
        from pyspark_cdc_engine.cdf_source import _dv_positions

        dv_pos = _dv_positions(table._root, commit["dv_files"])
    # the EXPORTED version's schema, not the latest — a time-travel export of
    # a schema-evolved table must advertise what its files actually hold
    if commit.get("schema"):
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(json.loads(commit["schema"]))
    else:
        # pre-evolution table: derive the schema by reading the snapshot
        schema = table.read(version=v).schema
    partition_cols = list(commit.get("partition_by") or [])

    # A renamed/dropped-column table stores PHYSICAL names in its files; the
    # real Delta equivalent is columnMapping mode=name — emit the spec's
    # per-field metadata (delta.columnMapping.physicalName/.id) and the
    # required protocol bump (minReaderVersion 2, minWriterVersion 5) so any
    # mapping-aware Delta reader resolves files exactly as deltalite does.
    mapping = dict(commit.get("column_mapping") or {})
    configuration: dict[str, str] = {}
    min_reader, min_writer = 1, 2
    if mapping:
        from pyspark.sql.types import StructField, StructType

        schema = StructType(
            [
                StructField(
                    f.name,
                    f.dataType,
                    f.nullable,
                    {
                        "delta.columnMapping.id": i + 1,
                        "delta.columnMapping.physicalName": mapping.get(
                            f.name, f.name
                        ),
                    },
                )
                for i, f in enumerate(schema.fields)
            ]
        )
        configuration = {
            "delta.columnMapping.mode": "name",
            "delta.columnMapping.maxColumnId": str(len(schema.fields)),
        }
        min_reader, min_writer = 2, 5

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
            if str(f) in dv_pos:
                import pyarrow.parquet as pq

                tbl = pq.read_table(f)
                keep = [
                    i for i in range(tbl.num_rows) if i not in dv_pos[str(f)]
                ]
                if not keep:
                    continue  # fully tombstoned: the file exports as nothing
                pq.write_table(tbl.take(keep), target)
            else:
                shutil.copy2(f, target)
            size = target.stat().st_size
            total += size
            adds.append(
                {
                    "add": {
                        # spec: path is URL-encoded (RFC 2396) per component;
                        # chars legal in a URI path segment ($&+,;=:@ and the
                        # mark set) stay literal — matches java.net.URI, so
                        # hive-style `k=v` dirs keep their readable form
                        "path": "/".join(
                            urllib.parse.quote(c, safe="$&+,;=:@!*'()-_.~")
                            for c in rel.parts
                        ),
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
        {"protocol": {"minReaderVersion": min_reader, "minWriterVersion": min_writer}},
        {
            "metaData": {
                "id": str(uuid.uuid4()),
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps(schema.jsonValue()),
                "partitionColumns": partition_cols,
                "configuration": configuration,
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


def _check_last_checkpoint(
    log_dir: Path, target: int, versions: list[int], parseable_ckpts: set[int]
) -> None:
    """ADVICE guard: parseable checkpoint layouts are single-file, complete
    classic multi-part, and v2/UUID-named (sidecars followed)
    (``parseable_ckpts``). If ``_last_checkpoint`` says a checkpoint ≤ target
    exists that we cannot parse (an incomplete multi-part set, an unknown
    layout) and the JSON commits alone cannot replay the full history
    (0..target contiguous), fail loudly instead of returning a silently
    incomplete snapshot."""
    lc = log_dir / "_last_checkpoint"
    if not lc.is_file():
        return
    try:
        meta = json.loads(lc.read_text())
    except ValueError:
        return
    v = int(meta.get("version", -1))
    if v < 0 or v > target:
        return
    # The ROBUST signal (real writers often put nothing but version/size in
    # _last_checkpoint): a checkpoint at v exists per the pointer. Parseable
    # layouts are single-file {v}.checkpoint.parquet and COMPLETE classic
    # multi-part sets; v2/UUID-named + sidecar checkpoints (and part-missing
    # multi-part sets) are not — so if the pointer's version isn't parseable
    # AND the JSON commits can't replay 0..target on their own, any result
    # would be silently incomplete.
    if v in parseable_ckpts:
        return
    json_complete = bool(versions) and versions[0] == 0 and set(
        range(0, target + 1)
    ) <= set(versions)
    if not json_complete:
        raise ValueError(
            f"{log_dir}: _last_checkpoint points at version {v} but no "
            f"parseable checkpoint exists there (incomplete multi-part set "
            f"or an unknown layout), "
            f"and the JSON commits do not cover 0..{target} — refusing to "
            f"return a partial snapshot"
        )


def _v2_checkpoints(log_dir: Path) -> dict[int, list[Path]]:
    """V2 (UUID-named) checkpoints ``{v}.checkpoint.{uuid}.parquet``:
    version -> [file]. Each is complete by construction (file actions live
    inline or in ``sidecar``-action files the reader follows); several UUID
    variants for one version are equivalent per the protocol — any one
    serves."""
    out: dict[int, Path] = {}
    for p in log_dir.glob("*.checkpoint.*.parquet"):
        bits = p.name.split(".")
        if len(bits) == 4 and bits[0].isdigit() and not bits[2].isdigit():
            out.setdefault(int(bits[0]), p)
    return {v: [p] for v, p in out.items()}


def _iter_parquet_actions(
    fp: Path,
    cols: tuple = ("metaData", "protocol", "add", "remove", "sidecar"),
):
    """Batched-pyarrow action iteration over one checkpoint/sidecar parquet:
    yields {action_kind: action_dict} rows with parquet MAP values
    normalized to dicts. Never materializes the file driver-side at once."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(str(fp))
    action_cols = [c for c in cols if c in pf.schema_arrow.names]
    for batch in pf.iter_batches(columns=action_cols, batch_size=4096):
        for row in batch.to_pylist():
            a = {k: v for k, v in row.items() if v is not None}
            for act in a.values():
                if isinstance(act, dict):
                    for mk, mv in act.items():
                        if isinstance(mv, list) and mv and isinstance(mv[0], tuple):
                            act[mk] = dict(mv)
            yield a


def _multipart_checkpoints(log_dir: Path) -> dict[int, list[Path]]:
    """COMPLETE multi-part checkpoints (classic V1 naming
    ``{v}.checkpoint.{i}.{n}.parquet``): version -> ordered part paths.
    A set missing any of its n parts is ignored (an interrupted writer's
    leftovers must not half-apply)."""
    groups: dict[tuple[int, int], dict[int, Path]] = {}
    for p in log_dir.glob("*.checkpoint.*.*.parquet"):
        bits = p.name.split(".")
        if len(bits) != 5 or not (
            bits[0].isdigit() and bits[2].isdigit() and bits[3].isdigit()
        ):
            continue
        v, i, n = int(bits[0]), int(bits[2]), int(bits[3])
        groups.setdefault((v, n), {})[i] = p
    out: dict[int, list[Path]] = {}
    for (v, n), parts in groups.items():
        if len(parts) == n:
            out[v] = [parts[i] for i in sorted(parts)]
    return out


def _log_actions_upto(log_dir: Path, version: int | None):
    """Yield (action_dict) streams: checkpoint rows first (if one at or below
    the target version exists), then JSON commits after it, in order. Returns
    (checkpoint_paths_or_None, checkpoint_version, [json_commit_paths]);
    checkpoint_paths is a list — one element for a single-file checkpoint,
    the ordered parts for a classic multi-part one."""
    versions = sorted(
        int(p.stem) for p in log_dir.glob("*.json") if p.stem.isdigit()
    )
    multi = _multipart_checkpoints(log_dir)
    v2 = _v2_checkpoints(log_dir)
    single = {
        int(p.name.split(".")[0]): p
        for p in log_dir.glob("*.checkpoint.parquet")
    }
    ckpt_versions = sorted(set(single) | set(multi) | set(v2))
    if not versions and not ckpt_versions:
        if (log_dir / "_last_checkpoint").is_file():
            # a pointer exists but nothing parseable does (v2/sidecar
            # layout, or a multi-part set missing parts) — the loud guard's
            # message, not a bare "no commits"
            _check_last_checkpoint(log_dir, 1 << 62, versions, set())
        raise FileNotFoundError(f"no Delta commits in {log_dir}")
    # a metadata-cleaned table may hold ONLY a checkpoint (json commits
    # retired by delta.logRetentionDuration) — still a complete snapshot
    latest = max(versions + ckpt_versions)
    target = latest if version is None else version
    if target not in versions and target not in ckpt_versions:
        raise ValueError(f"version {target} not present in {log_dir}")
    _check_last_checkpoint(log_dir, target, versions, set(ckpt_versions))

    ckpt_paths, ckpt_v = None, -1
    for v in ckpt_versions:
        if ckpt_v < v <= target:
            # a version with several layouts prefers single > multi-part > v2
            ckpt_v = v
            ckpt_paths = (
                [single[v]] if v in single
                else multi[v] if v in multi
                else v2[v]
            )
    jsons = [
        log_dir / f"{v:020d}.json" for v in versions if ckpt_v < v <= target
    ]
    return ckpt_paths, ckpt_v, jsons


def read_delta_snapshot(spark, path: str, version: int | None = None):
    """Read a REAL Delta table (written by any engine) as a DataFrame, no
    delta jars needed. Supports JSON commits and parquet checkpoints in the
    single-file, classic multi-part, and v2/UUID-named (inline or sidecar
    file actions) layouts; ``version`` = time travel (VERSION AS OF).

    Protocol enforcement (PROTOCOL.md): the ``protocol`` action is parsed and
    tables demanding reader capabilities we do not implement fail LOUDLY —
    reader version 3 tables are accepted only when every listed readerFeature
    is supported here (``columnMapping``, ``deletionVectors``,
    ``v2Checkpoint``). Column mapping: mode=name resolves files via each
    field's ``delta.columnMapping.physicalName`` and projects back to
    logical names; mode=id resolves by PARQUET FIELD ID through Spark's
    native ``spark.sql.parquet.fieldId.read.enabled`` mechanism (the read
    schema carries ``parquet.field.id`` metadata), which also covers files
    whose column names match neither logical nor physical names (the
    Iceberg-converted/UniForm shape).

    DELETION VECTORS (delta-spark 3.4+ writes them by default for
    DELETE/UPDATE): each live add's descriptor is resolved through
    :mod:`pyspark_cdc_engine.dvformat` (inline Z85 or on-disk
    roaring-bitmap files, framing + CRC verified), and the marked positions
    are anti-joined against the scan's ``_metadata.row_index`` — the exact
    mechanism deltalite's own merge-on-read DVs use (tables.py:_read_dirs).
    Driver memory is bounded by the snapshot's total DELETED-row count (the
    same bound delta-spark's own DV broadcast carries), not table size.

    Partition columns are reconstructed per add-file from the log's
    ``partitionValues`` (cast to the schema's types), grouped so each distinct
    partition tuple is one ``spark.read.parquet`` with literal columns — the
    same information a Delta-native reader uses. add.path is URL-decoded per
    the spec (RFC 2396)."""
    import pyspark.sql.functions as F
    from pyspark.sql.types import StructField, StructType

    root = Path(path)
    log_dir = root / "_delta_log"
    ckpt_paths, _ckpt_v, jsons = _log_actions_upto(log_dir, version)

    schema_json: str | None = None
    partition_cols: list[str] = []
    configuration: dict = {}
    protocol: dict = {}
    live: dict[str, dict] = {}  # raw add.path -> add action (partitionValues+)

    def _apply(a: dict) -> None:
        nonlocal schema_json, partition_cols, configuration, protocol
        if a.get("metaData") and a["metaData"].get("schemaString"):
            schema_json = a["metaData"]["schemaString"]
            partition_cols = list(a["metaData"].get("partitionColumns") or [])
            configuration = dict(a["metaData"].get("configuration") or {})
        elif a.get("protocol"):
            protocol = dict(a["protocol"])
        elif a.get("add") and a["add"].get("path"):
            live[a["add"]["path"]] = a["add"]
        elif a.get("remove") and a["remove"].get("path"):
            live.pop(a["remove"]["path"], None)

    for ckpt_path in ckpt_paths or []:
        # batched pyarrow iteration over each checkpoint file (one for a
        # single-file or v2 checkpoint, every part of a classic multi-part
        # one — action rows are disjoint across files, so order is
        # immaterial), NOT spark.read...collect(): a checkpoint of a large
        # table holds millions of add rows, and collect() would materialize
        # every one as a driver Row object at once. Batches keep the
        # transient footprint bounded; the accumulated `live` dict is the
        # snapshot itself (unavoidable, and far smaller than Row objects).
        # V2 checkpoints may externalize file actions into sidecar parquet
        # files under _delta_log/_sidecars/ — `sidecar` actions are followed
        # with the same batched reader.
        for a in _iter_parquet_actions(ckpt_path):
            sc = a.get("sidecar")
            if sc and sc.get("path"):
                sp = log_dir / "_sidecars" / sc["path"]
                if not sp.is_file():
                    raise ValueError(
                        f"v2 checkpoint {ckpt_path.name} references missing "
                        f"sidecar {sc['path']} — refusing a partial snapshot"
                    )
                for sa in _iter_parquet_actions(sp, cols=("add", "remove")):
                    _apply(sa)
            else:
                _apply(a)
    for jp in jsons:
        for ln in jp.read_text().splitlines():
            if ln.strip():
                _apply(json.loads(ln))

    # ---- reader-capability gate (ADVICE: fail loudly, never read wrong)
    min_reader = int(protocol.get("minReaderVersion") or 1)
    reader_features = {
        f for f in (protocol.get("readerFeatures") or []) if f
    }
    # timestampNtz: schemaString's "timestamp_ntz" parses straight to
    # TimestampNTZType and Spark's parquet reader maps isAdjustedToUTC=false
    # timestamps to it natively under an explicit read schema.
    # typeWidening(-preview): the read side of widening is exactly "file
    # holds a NARROWER physical type than the logical schema" — Spark's
    # parquet reader upcasts int32->long/double, float->double,
    # date->timestamp_ntz, and decimal precision/scale growth under the
    # explicit read schema this importer always passes (verified in
    # tests); an unsupported exotic widening fails loudly in the scan,
    # never reads wrong.
    # variantType(-preview): schemaString's "variant" parses straight to
    # Spark 4's VariantType and the parquet scan reads the VARIANT
    # logical-typed group (value/metadata binaries) natively under the
    # explicit read schema this importer always passes — Spark itself is
    # the reference implementation of the open variant encoding Delta 4.0
    # adopted, so the round trip is engine-native (verified in tests with
    # Spark-written variant parquet + a hand-built Delta log; realjars
    # smoke covers delta-spark-written tables when jars exist).
    SUPPORTED_FEATURES = {
        "columnMapping",
        "v2Checkpoint",
        "deletionVectors",
        "timestampNtz",
        "typeWidening",
        "typeWidening-preview",
        "variantType",
        "variantType-preview",
    }
    if min_reader == 3:
        # v3 tables MUST enumerate readerFeatures; an absent/empty list means
        # we cannot know what the table demands — fail loudly either way
        if not reader_features:
            raise ValueError(
                f"Delta protocol at {path} declares minReaderVersion=3 with "
                f"no readerFeatures — refusing to guess"
            )
        unsupported = reader_features - SUPPORTED_FEATURES
        if unsupported:
            raise ValueError(
                f"unsupported Delta readerFeatures {sorted(unsupported)} at "
                f"{path} (minReaderVersion={min_reader}); refusing to read"
            )
    elif min_reader > 3:
        raise ValueError(
            f"unsupported Delta minReaderVersion={min_reader} at {path}"
        )
    cm_mode = configuration.get("delta.columnMapping.mode", "none")
    if cm_mode not in ("none", "", "name", "id"):
        raise ValueError(
            f"unsupported delta.columnMapping.mode={cm_mode!r} at {path} "
            f"(only 'name' and 'id' mapping are implemented)"
        )
    # deletion vectors: collect every live add's descriptor; positions
    # anti-join against _metadata.row_index below. A checkpoint's add rows
    # carry an all-None deletionVector struct when the file has none —
    # presence means a non-null storageType. Bitmaps resolve lazily
    # (per-file, driver-side) so the snapshot-wide tombstone count never
    # pins a Python list when it exceeds the broadcast cap.
    dv_descs: list[tuple[str, dict]] = []  # (URI-quoted abs file path, desc)
    for rel, add in live.items():
        desc = add.get("deletionVector")
        if desc and desc.get("storageType"):
            # abspath (not resolve: Spark doesn't follow symlinks either) in
            # URI-quoted form, matching the scheme-stripped
            # _metadata.file_path byte for byte
            fp = _uri_path(
                os.path.abspath(str(root / Path(urllib.parse.unquote(rel))))
            )
            dv_descs.append((fp, desc))

    if schema_json is None:
        raise ValueError(f"no metaData action found in {log_dir}")
    if not live:
        raise ValueError(f"empty Delta snapshot at {path}")

    full_schema = StructType.fromJson(json.loads(schema_json))
    mapped = cm_mode in ("name", "id")

    def phys_name(f: StructField) -> str:
        if mapped and f.metadata and "delta.columnMapping.physicalName" in f.metadata:
            return f.metadata["delta.columnMapping.physicalName"]
        return f.name

    phys_of = {f.name: phys_name(f) for f in full_schema.fields}
    data_fields = [f for f in full_schema.fields if f.name not in partition_cols]
    # id mapping resolves file columns by PARQUET FIELD ID, not name —
    # Spark's native mechanism: a read-schema field whose metadata carries
    # `parquet.field.id` matches by id when
    # spark.sql.parquet.fieldId.read.enabled is on. Enabling the conf is a
    # safe global (schemas without id metadata are untouched), and it's the
    # only correct path for id-mode files whose column names differ from the
    # physicalName (e.g. Iceberg-converted / UniForm tables).
    if cm_mode == "id":
        spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")

    def _scan_field(f: StructField) -> StructField:
        meta = None
        if cm_mode == "id" and f.metadata and "delta.columnMapping.id" in f.metadata:
            meta = {"parquet.field.id": int(f.metadata["delta.columnMapping.id"])}
        return StructField(phys_of[f.name], f.dataType, f.nullable, meta)

    data_schema = StructType([_scan_field(f) for f in data_fields])
    part_types = {
        f.name: f.dataType for f in full_schema.fields if f.name in partition_cols
    }

    # group files by partition tuple; one scan per tuple with literal columns.
    # partitionValues keys are PHYSICAL names under column mapping (spec).
    groups: dict[tuple, list[str]] = {}
    for rel, add in live.items():
        pvals = dict(add.get("partitionValues") or {})
        key = tuple(
            pvals.get(phys_of.get(c, c), pvals.get(c)) for c in partition_cols
        )
        groups.setdefault(key, []).append(
            str(root / Path(urllib.parse.unquote(rel)))
        )

    # A per-tuple scan is fine for tens of partitions but a 10k-partition
    # table would union 10k scans into one driver-melting plan. When every
    # file sits under Hive-style `<phys>=<val>/` dirs (delta-spark's own
    # layout, and this repo's exports), ONE basePath scan recovers the
    # partition columns natively — partition pruning, one scan node,
    # plan size independent of partition count. Non-Hive layouts (files
    # named freely, values only in the log) keep the per-tuple fallback.
    hive_layout = bool(partition_cols) and all(
        all(
            any(part.startswith(phys_of.get(c, c) + "=")
                for part in Path(urllib.parse.unquote(rel)).parts[:-1])
            for c in partition_cols
        )
        for rel in live
    )
    if hive_layout:
        # The log's partitionValues map is authoritative; dir names are a
        # layout convention. A spec-legal table whose dirs and log disagree
        # would make the basePath scan silently read wrong partition-column
        # values, so verify (cheap driver-side string compares, deduped per
        # distinct (col, dir-value, log-value) triple) that they agree for
        # every file — any mismatch, unparseable escape, or ambiguity falls
        # back to the per-tuple scan, which reads values from the log only.
        def _unescape_dir(raw: str):
            if raw == "__HIVE_DEFAULT_PARTITION__":
                return None
            # Spark's unescapePathName decodes each %XX as ONE char
            # (byte-wise), NOT as UTF-8 — latin-1 unquote matches it, so a
            # multi-byte escape like %C3%A9 compares exactly as the scan
            # will read it ('Ã©'), never as the UTF-8 decode ('é')
            return urllib.parse.unquote(raw, encoding="latin-1")

        seen_triples: set[tuple] = set()
        for rel, add in live.items():
            pvals = dict(add.get("partitionValues") or {})
            # one parse per file, not one per (file, column)
            parts = Path(urllib.parse.unquote(rel)).parts[:-1]
            dir_vals = {}
            for part in parts:
                k, _, v = part.partition("=")
                if _ and k not in dir_vals:
                    dir_vals[k] = _unescape_dir(v)
            for c in partition_cols:
                phys = phys_of.get(c, c)
                triple = (
                    phys,
                    dir_vals.get(phys),
                    pvals.get(phys, pvals.get(c)),
                )
                if triple in seen_triples:
                    continue
                seen_triples.add(triple)
                if triple[1] != triple[2]:
                    hive_layout = False
                    break
            if not hive_layout:
                break
    if hive_layout:
        from pyspark.sql.types import StructField as _SF
        from pyspark.sql.types import StructType as _ST

        hive_schema = _ST(
            [*data_schema.fields]
            + [
                _SF(phys_of[c], part_types[c], True)
                for c in partition_cols
            ]
        )
        df = (
            spark.read.schema(hive_schema)
            .option("basePath", str(root))
            .parquet(*sorted(str(root / Path(urllib.parse.unquote(r)))
                             for r in live))
        )
        proj = [
            F.col(phys_of[f.name]).alias(f.name) for f in full_schema.fields
        ]
        if dv_descs:
            df = df.select(
                *proj,
                F.regexp_replace(
                    F.col("_metadata.file_path"), "^[a-z][a-zA-Z0-9+.-]*:/+", "/"
                ).alias("__fp"),
                F.col("_metadata.row_index").alias("__ri"),
            )
        else:
            df = df.select(*proj)
        groups = {}
        out = df
    else:
        out = None
    for key, files in sorted(groups.items(), key=lambda kv: tuple(map(str, kv[0]))):
        df = spark.read.schema(data_schema).parquet(*files)
        proj = [F.col(phys_of[f.name]).alias(f.name) for f in data_fields]
        if dv_descs:
            # surface the scan's file/position identity, anti-join the DV
            # marks, then drop — rows a DV tombstones never surface. Files
            # without a DV never match, so one join covers every group.
            df = df.select(
                *proj,
                F.regexp_replace(
                    F.col("_metadata.file_path"), "^[a-z][a-zA-Z0-9+.-]*:/+", "/"
                ).alias("__fp"),
                F.col("_metadata.row_index").alias("__ri"),
            )
        else:
            # project physical file columns back to logical names
            df = df.select(*proj)
        for c, v in zip(partition_cols, key):
            # Delta encodes null partition values as JSON null / missing
            lit = F.lit(None) if v is None or v == "" else F.lit(v)
            df = df.withColumn(c, lit.cast(part_types[c]))
        df = df.select(
            *[f.name for f in full_schema.fields],
            *(["__fp", "__ri"] if dv_descs else []),
        )
        out = df if out is None else out.unionByName(df)
    if dv_descs and out is not None:
        # small DV sets (the common case, sized from the descriptors'
        # cardinality WITHOUT resolving any bitmap) broadcast; past the
        # threshold the positions stream per-file into a temp parquet and
        # the anti-join shuffles instead — a 100 TB snapshot with billions
        # of tombstones never pins more than ONE file's positions in the
        # driver at a time.
        try:
            from pyspark_cdc_engine.config import get_config

            cap = get_config().get_int("engine.dv-import-broadcast-max",
                                       2_000_000)
        except Exception:
            cap = 2_000_000
        total = sum(int(d.get("cardinality") or 0) for _, d in dv_descs)
        if total <= cap:
            dv_pairs = [
                (fp, p)
                for fp, d in dv_descs
                for p in dvformat.dv_positions(d, root)
            ]
            dv_df = F.broadcast(
                spark.createDataFrame(dv_pairs, "dv_fp string, dv_ri bigint")
            )
        else:
            import atexit
            import shutil as _sh
            import tempfile

            import pyarrow as pa
            import pyarrow.parquet as pq_

            tmp = tempfile.mkdtemp(prefix="dv_import_")
            atexit.register(_sh.rmtree, tmp, ignore_errors=True)
            pair_schema = pa.schema(
                [("dv_fp", pa.string()), ("dv_ri", pa.int64())]
            )
            with pq_.ParquetWriter(f"{tmp}/pairs.parquet", pair_schema) as w:
                for fp, d in dv_descs:
                    pos = dvformat.dv_positions(d, root)
                    w.write_batch(pa.record_batch(
                        [pa.array([fp] * len(pos), pa.string()),
                         pa.array(pos, pa.int64())],
                        schema=pair_schema,
                    ))
            dv_df = spark.read.parquet(tmp)
        out = out.join(
            dv_df,
            (out["__fp"] == dv_df["dv_fp"]) & (out["__ri"] == dv_df["dv_ri"]),
            "left_anti",
        ).drop("__fp", "__ri")
    return out


# ------------------------------------------------------------- history export


_DELTA_OP_NAMES = {
    "overwrite": "WRITE",
    "append": "WRITE",
    "delete": "DELETE",
    "update": "UPDATE",
    "merge": "MERGE",
    "compact": "OPTIMIZE",
    "zorder": "OPTIMIZE",
    "restore": "RESTORE",
    "set_cdf": "SET TBLPROPERTIES",
    "add_constraint": "ADD CONSTRAINT",
    "drop_constraint": "DROP CONSTRAINT",
    "add_column": "ADD COLUMNS",
    "rename_column": "RENAME COLUMN",
    "drop_column": "DROP COLUMNS",
    "analyze": "COMPUTE STATISTICS",
}


def _commit_schema_meta(commit, table, v):
    """(schema StructType with mapping metadata, configuration dict) for one
    deltalite commit — the metaData payload a Delta reader needs to resolve
    that commit's files."""
    from pyspark.sql.types import StructField, StructType

    if commit.get("schema"):
        schema = StructType.fromJson(json.loads(commit["schema"]))
    else:
        schema = table.read(version=v).schema
    mapping = dict(commit.get("column_mapping") or {})
    configuration: dict[str, str] = {}
    if mapping:
        schema = StructType(
            [
                StructField(
                    f.name,
                    f.dataType,
                    f.nullable,
                    {
                        "delta.columnMapping.id": i + 1,
                        "delta.columnMapping.physicalName": mapping.get(
                            f.name, f.name
                        ),
                    },
                )
                for i, f in enumerate(schema.fields)
            ]
        )
        configuration = {
            "delta.columnMapping.mode": "name",
            "delta.columnMapping.maxColumnId": str(len(schema.fields)),
        }
    if commit.get("cdf"):
        configuration["delta.enableChangeDataFeed"] = "true"
    return schema, configuration


def _write_delta_checkpoint(log_dir: Path, version: int, actions: list[dict]):
    """Write ``actions`` (protocol/metaData/add/remove dicts) as a
    single-file Delta checkpoint parquet at ``version`` and point
    ``_last_checkpoint`` at it — the shape a metadata-cleaned real Delta log
    has at its oldest retained version. One row per action, null struct
    cells for the other kinds; map-typed fields (partitionValues,
    configuration) are real parquet MAPs, matching what Spark's checkpoint
    writer emits and what :func:`read_delta_snapshot`'s batched reader
    normalizes. Remove rows are the spec-required unexpired tombstones; the
    column appears only when the caller passes any (boundary checkpoints of
    pruned histories start with a clean slate and stay minimal)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    mapt = pa.map_(pa.string(), pa.string())
    # the DV-struct column appears only when some add/remove actually
    # carries a descriptor (a native-DV export) — plain exports keep the
    # minimal layout any reader accepts
    has_dv = any(
        (a.get("add") or {}).get("deletionVector")
        or (a.get("remove") or {}).get("deletionVector")
        for a in actions
    )
    has_rm = any(a.get("remove") for a in actions)
    dv_t = pa.struct(
        [
            ("storageType", pa.string()),
            ("pathOrInlineDv", pa.string()),
            ("offset", pa.int32()),
            ("sizeInBytes", pa.int32()),
            ("cardinality", pa.int64()),
        ]
    )
    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", mapt),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
        ]
        + ([("deletionVector", dv_t)] if has_dv else [])
    )
    meta_t = pa.struct(
        [
            ("id", pa.string()),
            ("format", pa.struct([("provider", pa.string()), ("options", mapt)])),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", mapt),
            ("createdTime", pa.int64()),
        ]
    )
    # table-features era (reader 3 / writer 7, e.g. native DV) carries the
    # explicit feature lists through the checkpoint too
    has_feats = any(
        (a.get("protocol") or {}).get("readerFeatures") for a in actions
    )
    proto_t = pa.struct(
        [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]
        + (
            [
                ("readerFeatures", pa.list_(pa.string())),
                ("writerFeatures", pa.list_(pa.string())),
            ]
            if has_feats
            else []
        )
    )
    cols = {
        "protocol": pa.array([a.get("protocol") for a in actions], proto_t),
        "metaData": pa.array([a.get("metaData") for a in actions], meta_t),
        "add": pa.array([a.get("add") for a in actions], add_t),
    }
    if has_rm:
        rm_t = pa.struct(
            [
                ("path", pa.string()),
                ("deletionTimestamp", pa.int64()),
                ("dataChange", pa.bool_()),
                ("partitionValues", mapt),
            ]
            + ([("deletionVector", dv_t)] if has_dv else [])
        )
        cols["remove"] = pa.array([a.get("remove") for a in actions], rm_t)
    tbl = pa.table(cols)
    pq.write_table(tbl, log_dir / f"{version:020d}.checkpoint.parquet")
    (log_dir / "_last_checkpoint").write_text(
        json.dumps({"version": version, "size": len(actions)})
    )


def export_delta_history(
    table: DeltaliteTable, dest: str, upto: int | None = None,
    dv: str = "materialize", checkpoint_interval: int = 10,
) -> dict:
    """Replay the deltalite log into a REAL multi-commit ``_delta_log`` —
    the history export that :func:`export_delta_snapshot` (one commit, no
    history) deliberately is not. Commit N of the export corresponds 1:1 to
    deltalite version N: appends/overwrites/cow DML become add/remove
    actions (files zero-copied once, re-adds after RESTORE reuse them),
    OPTIMIZE-class reorganizations carry ``dataChange=false``, schema and
    table-property commits re-emit ``metaData`` (same table id throughout),
    and a CDF-enabled table's materialized change files export as Delta
    ``cdc`` actions — the change-data parquet is rewritten with the spec's
    ``_change_type`` column name, so a Delta-native
    ``table_changes()``/``readChangeFeed`` consumer sees exactly deltalite's
    feed. A Delta reader can then time travel to ANY exported version
    (verified by replaying every version through
    :func:`read_delta_snapshot` in tests).

    DELETION-VECTOR histories export in either of two modes (``dv=``):

    - ``"materialize"`` (default, r6): each DV commit exports as the
      equivalent COPY-ON-WRITE rewrite — every affected file re-materialized
      minus its cumulative tombstones (remove old variant + add new
      variant), cached per (file, tombstone-set) so RESTORE reuses bytes.
      Readable by ANY Delta reader (protocol stays at reader 1/2).
    - ``"native"`` (r8): the REAL DV protocol — each data file copies ONCE,
      and DV commits emit remove+add of the SAME path with a
      ``deletionVector`` descriptor pointing at an on-disk roaring-bitmap
      sidecar written via :mod:`pyspark_cdc_engine.dvformat` (UUID-named
      ``deletion_vector_*.bin``, framed + CRC exactly as delta-spark's
      DeletionVectorStore writes them). Protocol upgrades to reader 3 /
      writer 7 with ``deletionVectors`` in both feature lists. THE shape
      for DV-heavy histories at scale: materialize-mode cost is
      O(DV-commits x file bytes) — a hot file re-copies on every delete —
      native is O(file bytes + tiny sidecars). Requires a DV-capable
      consumer (delta-spark 2.3+/3.x, or this repo's own importer, which
      round-trip-verifies the emission). Retention-pruned histories export
      too (r9): the boundary checkpoint carries DV-struct add rows.

    PERIODIC CHECKPOINTS (r9): every ``checkpoint_interval`` commits
    (Delta's default cadence of 10; 0 disables) the export also writes a
    parquet checkpoint + ``_last_checkpoint``, so a real Delta reader opens
    a 400-commit export from the newest checkpoint plus a short JSON suffix
    instead of replaying every JSON file. Time travel below a checkpoint
    still works — readers seed from the newest checkpoint AT OR BELOW the
    target.

    Both modes additionally emit exact ``cdc`` actions carrying each DV
    commit's change rows (the positions a DV commit tombstones are
    enumerable, which is the whole point of merge-on-read) — so
    :func:`read_delta_snapshot` is byte-equal to ``read(version=v)`` at
    every version and :func:`read_delta_changes` returns the same feed
    ``read_changes`` gives.

    Unsupported (refused loudly, use the snapshot export): shallow clones
    (their live entries reference another table's files)."""
    if dv not in ("materialize", "native"):
        raise ValueError(f"dv must be materialize|native, got {dv!r}")
    versions = [v for v in table._versions() if upto is None or v <= upto]
    if not versions:
        raise ValueError(
            "history export: no retained commits at or below the requested "
            "version (log retention pruned them — export from a retained "
            "version, or use export_delta_snapshot)"
        )
    base = versions[0]
    pruned = base != 0
    # A retention-pruned deltalite log exports as what a metadata-cleaned
    # REAL Delta log looks like: a parquet CHECKPOINT at the boundary
    # (protocol + metaData + every live add, DV tombstones materialized)
    # plus ordinary JSON commits after it. Version numbers stay authentic;
    # time travel below the boundary is unavailable in the export exactly
    # as it is in the source.
    commits = {v: table._read_commit(v) for v in versions}
    for v, c in commits.items():
        if c["operation"] == "shallow_clone" or any(
            not r.startswith("data/") for r in c["live"]
        ):
            raise ValueError(
                f"version {v} references files outside this table "
                f"(shallow clone) — history export is per-table; use "
                f"export_delta_snapshot"
            )

    any_mapping = any(c.get("column_mapping") for c in commits.values())
    any_cdc = any(c.get("cdc_dirs") for c in commits.values())
    any_dv = any(
        c.get("dv_files") or c.get("dv_delete") or c.get("dv_update")
        or c.get("dv_merge")
        for c in commits.values()
    )
    native_dv = dv == "native" and any_dv
    min_reader = 2 if any_mapping else 1
    min_writer = 5 if any_mapping else (4 if (any_cdc or any_dv) else 2)
    protocol_features: dict = {}
    if native_dv:
        # table features era: reader 3 / writer 7 with explicit lists
        min_reader, min_writer = 3, 7
        reader_feats = ["deletionVectors"] + (
            ["columnMapping"] if any_mapping else []
        )
        writer_feats = list(reader_feats) + (
            ["changeDataFeed"] if any_cdc else []
        )
        protocol_features = {
            "readerFeatures": reader_feats,
            "writerFeatures": writer_feats,
        }

    dest_path = Path(dest)
    log_dir = dest_path / "_delta_log"
    log_dir.mkdir(parents=True, exist_ok=False)
    table_id = str(uuid.uuid4())

    def delta_rel(dl_rel: str, f: Path, src_dir: Path) -> Path:
        rel_dir = Path(dl_rel).relative_to("data")
        return rel_dir / f.relative_to(src_dir)

    def quote_path(rel: Path) -> str:
        return "/".join(
            urllib.parse.quote(c, safe="$&+,;=:@!*'()-_.~") for c in rel.parts
        )

    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark_cdc_engine.cdf_source import _strip_scheme

    # Per-FILE export variants: a source file's export at any version is its
    # bytes minus the cumulative tombstones the version's dv_files hold for
    # it (materialize mode), or its verbatim bytes plus a deletionVector
    # DESCRIPTOR (native mode). (src file, tombstone-set) ->
    # (delta path | None, size, descriptor | None); path None = fully
    # tombstoned in materialize mode, exports as nothing. File identities
    # survive remove/re-add cycles (RESTORE, across DV states too) without
    # recopying bytes — native mode copies each file exactly once.
    variants: dict[
        tuple[str, frozenset], tuple[str | None, int, dict | None]
    ] = {}
    # src file -> (tombs, delta path | None, size, desc) currently exported
    exported: dict[str, tuple[frozenset, str | None, int, dict | None]] = {}
    # export path -> its latest remove action: the unexpired tombstones the
    # Delta spec requires checkpoints to carry (a real client reconstructing
    # tombstone state from a checkpoint — e.g. for VACUUM — must see files
    # removed just before it, or it could delete files still referenced by
    # earlier exported versions). A re-add of the same path clears its entry
    # (last action per path wins under Delta's log reconciliation).
    tombstones: dict[str, dict] = {}
    n_dv_files = 0
    sidecar_memo: dict[str, dict[str, list[int]]] = {}  # dv rel -> file -> pos
    ct = {"n_files": 0, "total": 0}
    last_meta: tuple | None = None
    n_cdc = 0

    def _sidecar_positions(rels) -> dict[str, set[int]]:
        """Tombstoned (src file -> positions) across sidecars, memoized per
        sidecar rel (each is read once for the whole export)."""
        out: dict[str, set[int]] = {}
        for rel in rels:
            if rel not in sidecar_memo:
                by_file: dict[str, list[int]] = {}
                for f in sorted((table._root / rel).rglob("*.parquet")):
                    t2 = pq.read_table(f, columns=["file_path", "row_index"])
                    for fp, ri in zip(
                        t2.column("file_path").to_pylist(),
                        t2.column("row_index").to_pylist(),
                    ):
                        by_file.setdefault(_strip_scheme(fp), []).append(int(ri))
                sidecar_memo[rel] = by_file
            for fp, idx in sidecar_memo[rel].items():
                out.setdefault(fp, set()).update(idx)
        return out

    def _variant(src_file: str, dl_rel: str, tombs: frozenset):
        key = (src_file, tombs)
        if key in variants:
            return variants[key]
        nonlocal n_dv_files
        src_dir = table._root / dl_rel
        rel = delta_rel(dl_rel, Path(src_file), Path(src_dir))
        desc: dict | None = None
        if native_dv:
            # the file copies ONCE (tombs-independent); tombstones become a
            # real DV sidecar + descriptor, cached per (file, tombs) so
            # RESTORE back to a DV state reuses the sidecar
            plain = variants.get((src_file, frozenset()))
            if plain is None:
                target = dest_path / rel
                target.parent.mkdir(parents=True, exist_ok=True)
                shutil.copy2(src_file, target)
                plain = (quote_path(rel), target.stat().st_size, None)
                variants[(src_file, frozenset())] = plain
                ct["n_files"] += 1
                ct["total"] += plain[1]
            if tombs:
                desc = dvformat.write_dv_file(dest_path, sorted(tombs))
                n_dv_files += 1
                entry = (plain[0], plain[1], desc)
                variants[key] = entry
                return entry
            return plain
        if tombs:
            # materialized-minus-tombstones variant, named by the tombstone
            # set so RESTORE back to this DV state reuses the bytes
            sig = hashlib.sha1(
                ",".join(map(str, sorted(tombs))).encode()
            ).hexdigest()[:8]
            rel = rel.with_name(f"{rel.stem}-m{sig}.parquet")
            tbl = pq.read_table(src_file)
            keep = [i for i in range(tbl.num_rows) if i not in tombs]
            if not keep:
                variants[key] = (None, 0, None)
                return variants[key]
            target = dest_path / rel
            target.parent.mkdir(parents=True, exist_ok=True)
            pq.write_table(tbl.take(keep), target)
        else:
            target = dest_path / rel
            target.parent.mkdir(parents=True, exist_ok=True)
            shutil.copy2(src_file, target)
        entry = (quote_path(rel), target.stat().st_size, None)
        variants[key] = entry
        ct["n_files"] += 1
        ct["total"] += entry[1]
        return entry

    def _hydrate_partitions(tbl, src_file: str, partition_cols: list[str]):
        """Change rows must carry partition-column values (stored in dir
        names, not file bytes) like materialized cow change files do."""
        if not partition_cols:
            return tbl
        vals = {
            comp.split("=", 1)[0]: comp.split("=", 1)[1]
            for comp in Path(src_file).parts
            if "=" in comp and not comp.startswith("__zr=")
        }
        for c in partition_cols:
            if c not in tbl.column_names and c in vals:
                tbl = tbl.append_column(
                    c, pa.array([vals[c]] * tbl.num_rows, type=pa.string())
                )
        return tbl

    prev_dv_rels: set[str] = set()
    prev_live_set: set[str] = set()

    for v in versions:
        commit = commits[v]
        op = commit["operation"]
        ts_ms = int(float(commit["timestamp"]) * 1000)
        partition_cols = list(commit.get("partition_by") or [])
        actions: list[dict] = [
            {
                "commitInfo": {
                    "timestamp": ts_ms,
                    "operation": _DELTA_OP_NAMES.get(op, op.upper()),
                    "operationParameters": {},
                    "engineInfo": "pyspark-cdc-engine deltalite history export",
                }
            }
        ]
        if v == base:
            actions.append(
                {
                    "protocol": {
                        "minReaderVersion": min_reader,
                        "minWriterVersion": min_writer,
                        **protocol_features,
                    }
                }
            )
        schema, configuration = _commit_schema_meta(commit, table, v)
        meta_key = (json.dumps(schema.jsonValue()), tuple(partition_cols),
                    tuple(sorted(configuration.items())))
        if last_meta != meta_key:
            last_meta_action = {
                "metaData": {
                    "id": table_id,
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": meta_key[0],
                    "partitionColumns": partition_cols,
                    "configuration": configuration,
                    "createdTime": ts_ms,
                }
            }
            actions.append(last_meta_action)
            last_meta = meta_key
        live = list(commit["live"])
        data_change = op not in ("compact", "zorder")
        dv_rels = list(commit.get("dv_files") or [])
        dv_pos = _sidecar_positions(dv_rels) if dv_rels else {}
        # desired export at this version: every live file minus its
        # cumulative tombstones
        desired: dict[str, tuple[str, frozenset]] = {}
        for dl_rel in live:
            for f in sorted((table._root / dl_rel).rglob("*.parquet")):
                sf = str(f)
                desired[sf] = (dl_rel, frozenset(dv_pos.get(sf, ())))
        for sf, (tombs, pth, _sz, old_desc) in sorted(exported.items()):
            nd = desired.get(sf)
            if (nd is None or nd[1] != tombs) and pth is not None:
                rm = {
                    "path": pth,
                    "deletionTimestamp": ts_ms,
                    "dataChange": data_change,
                    # partitionValues on removes (delta-spark writes
                    # them): without these, a feed deriving deletes
                    # from a partitioned remove has no way to attach
                    # the partition-key values (not in file bytes)
                    "partitionValues": _partition_values(
                        urllib.parse.unquote(pth), partition_cols
                    ),
                    **({"deletionVector": old_desc} if old_desc else {}),
                }
                actions.append({"remove": rm})
                tombstones[pth] = rm
        new_exported: dict[
            str, tuple[frozenset, str | None, int, dict | None]
        ] = {}
        for sf, (dl_rel, tombs) in sorted(desired.items()):
            cur = exported.get(sf)
            if cur is not None and cur[0] == tombs:
                new_exported[sf] = cur
                continue
            pth, sz, desc = _variant(sf, dl_rel, tombs)
            new_exported[sf] = (tombs, pth, sz, desc)
            if pth is not None:
                tombstones.pop(pth, None)
                actions.append(
                    {
                        "add": {
                            "path": pth,
                            "partitionValues": _partition_values(
                                urllib.parse.unquote(pth), partition_cols
                            ),
                            "size": sz,
                            "modificationTime": ts_ms,
                            "dataChange": data_change,
                            **({"deletionVector": desc} if desc else {}),
                        }
                    }
                )
        exported = new_exported
        # the pruned-log boundary exports as a CHECKPOINT: a full snapshot,
        # no change actions (checkpoints carry none, and the feed below the
        # boundary is unavailable by the retention contract)
        boundary = pruned and v == base
        empty_cdc = None  # (rel, zero-row table) fallback, see below
        wrote_cdc = False
        for cdc_rel in [] if boundary else (commit.get("cdc_dirs") or []):
            import pyarrow.parquet as pq

            src = table._root / cdc_rel
            for i, f in enumerate(sorted(Path(src).rglob("*.parquet"))):
                tbl = pq.read_table(f)
                if "__change_type" in tbl.column_names:
                    # the Delta CDF spec's column name
                    tbl = tbl.rename_columns(
                        [
                            "_change_type" if c == "__change_type" else c
                            for c in tbl.column_names
                        ]
                    )
                rel = Path(cdc_rel) / f"part-{i:05d}.parquet"
                if not tbl.num_rows:
                    empty_cdc = (rel, tbl)
                    continue
                target = dest_path / rel
                target.parent.mkdir(parents=True, exist_ok=True)
                pq.write_table(tbl, target)
                n_cdc += 1
                wrote_cdc = True
                actions.append(
                    {
                        "cdc": {
                            "path": quote_path(rel),
                            "partitionValues": {},
                            "size": target.stat().st_size,
                            "dataChange": False,
                        }
                    }
                )
        if empty_cdc is not None and not wrote_cdc:
            # A CDF DML commit that matched NO rows still needs a cdc action:
            # without one, Delta CDF readers (and read_delta_changes) fall
            # back to deriving changes from the commit's dataChange
            # add/remove file actions — spurious insert+delete rows for an
            # unchanged rewrite. An empty cdc file says "this commit's
            # change set is exactly nothing".
            import pyarrow.parquet as pq

            rel, tbl = empty_cdc
            target = dest_path / rel
            target.parent.mkdir(parents=True, exist_ok=True)
            pq.write_table(tbl, target)
            n_cdc += 1
            actions.append(
                {
                    "cdc": {
                        "path": quote_path(rel),
                        "partitionValues": {},
                        "size": target.stat().st_size,
                        "dataChange": False,
                    }
                }
            )
        # DV commits: the commit's exact change rows are enumerable from its
        # new sidecars (tombstoned positions) and appended image dirs —
        # export them as cdc actions so read_delta_changes returns the same
        # feed deltalite's read_changes gives (derivation from the
        # materializing add/remove rewrite would report whole files).
        change_tables: list = []

        def _rows_at(pos_by_file: dict[str, list[int] | set[int]], tag: str):
            for sf, idx in sorted(pos_by_file.items()):
                tbl = pq.read_table(sf).take(sorted(idx))
                if tbl.num_rows:
                    tbl = _hydrate_partitions(tbl, sf, partition_cols)
                    change_tables.append(
                        tbl.append_column(
                            "_change_type",
                            pa.array([tag] * tbl.num_rows, type=pa.string()),
                        )
                    )

        def _rows_of_dirs(rels: list[str], tag: str):
            for rel in rels:
                for f in sorted((table._root / rel).rglob("*.parquet")):
                    tbl = pq.read_table(str(f))
                    if tbl.num_rows:
                        tbl = _hydrate_partitions(tbl, str(f), partition_cols)
                        change_tables.append(
                            tbl.append_column(
                                "_change_type",
                                pa.array([tag] * tbl.num_rows, type=pa.string()),
                            )
                        )

        new_dv = [] if boundary else [r for r in dv_rels if r not in prev_dv_rels]
        if boundary:
            pass  # no per-commit change reconstruction at the boundary
        elif op == "delete" and commit.get("dv_delete") and new_dv:
            _rows_at(_sidecar_positions(new_dv), "delete")
        elif op == "update" and commit.get("dv_update"):
            if new_dv:
                _rows_at(_sidecar_positions(new_dv), "update_preimage")
            _rows_of_dirs(
                [d for d in live if d not in prev_live_set], "update_postimage"
            )
        elif op == "merge" and commit.get("dv_merge"):
            for key, tag in (
                ("dv_merge_delete_dvs", "delete"),
                ("dv_merge_update_dvs", "update_preimage"),
            ):
                rels = commit.get(key) or []
                if rels:
                    _rows_at(_sidecar_positions(rels), tag)
            for key, tag in (
                ("dv_merge_insert_dirs", "insert"),
                ("dv_merge_update_dirs", "update_postimage"),
            ):
                _rows_of_dirs(commit.get(key) or [], tag)
        for i, tbl in enumerate(change_tables):
            rel = Path("_change_data") / f"dv-{v:010d}" / f"part-{i:05d}.parquet"
            target = dest_path / rel
            target.parent.mkdir(parents=True, exist_ok=True)
            # drop the source file's embedded Spark schema metadata: it
            # predates the appended _change_type column, and Spark trusts
            # footer metadata over the physical schema — the column would
            # be silently invisible to every Spark reader
            pq.write_table(tbl.replace_schema_metadata(None), target)
            n_cdc += 1
            actions.append(
                {
                    "cdc": {
                        "path": quote_path(rel),
                        "partitionValues": {},
                        "size": target.stat().st_size,
                        "dataChange": False,
                    }
                }
            )

        if boundary:
            _write_delta_checkpoint(
                log_dir, v, [a for a in actions if "commitInfo" not in a]
            )
        else:
            (log_dir / f"{v:020d}.json").write_text(
                "\n".join(json.dumps(a) for a in actions) + "\n"
            )
            # Delta's checkpoint cadence (default every 10 commits): a
            # long-history export must not force real readers to replay
            # every JSON file on open — write a full-state checkpoint
            # (protocol + current metaData + every exported live add, DV
            # descriptors included) and repoint _last_checkpoint. Readers
            # time-traveling below it seed from the newest checkpoint AT
            # OR BELOW their target, so older versions stay reachable.
            if checkpoint_interval and v > base and v % checkpoint_interval == 0:
                snap = [
                    {
                        "protocol": {
                            "minReaderVersion": min_reader,
                            "minWriterVersion": min_writer,
                            **protocol_features,
                        }
                    },
                    last_meta_action,
                ]
                for _sf, (_tombs, pth, sz, desc) in sorted(exported.items()):
                    if pth is None:
                        continue
                    snap.append(
                        {
                            "add": {
                                "path": pth,
                                "partitionValues": _partition_values(
                                    urllib.parse.unquote(pth), partition_cols
                                ),
                                "size": sz,
                                "modificationTime": ts_ms,
                                "dataChange": False,
                                **({"deletionVector": desc} if desc else {}),
                            }
                        }
                    )
                # unexpired remove tombstones (Delta spec: checkpoints must
                # carry them so clients reconstructing tombstone state —
                # VACUUM in particular — see files removed just before the
                # checkpoint). Every deletionTimestamp here is this export
                # run's commit timestamp, well inside any retention window.
                for rm in tombstones.values():
                    snap.append({"remove": dict(rm)})
                _write_delta_checkpoint(log_dir, v, snap)
        prev_dv_rels = set(dv_rels)
        prev_live_set = set(live)

    return {
        "versions_exported": len(versions),
        "latest_version": versions[-1],
        "n_files": ct["n_files"],
        "n_cdc_files": n_cdc,
        "n_dv_files": n_dv_files,
        "total_bytes": ct["total"],
        "dest": str(dest_path),
    }


def read_delta_changes(
    spark, path: str, starting_version: int, ending_version: int | None = None
):
    """``table_changes(t, from, to)`` against a REAL Delta log, no delta
    jars — the import-side complement of :func:`export_delta_history`'s cdc
    actions. Per the Delta CDF contract, a commit's change rows are:

    - its ``cdc`` actions' files VERBATIM when any exist (they carry the
      spec's ``_change_type`` column), else
    - derived from the data-changing file actions: ``add`` with
      ``dataChange=true`` → ``insert`` rows, ``remove`` with
      ``dataChange=true`` → ``delete`` rows (the file's content at its last
      add — valid while the removed file still exists, i.e. pre-VACUUM);
      ``dataChange=false`` reorganizations contribute nothing.

    DELETION-VECTOR commits (delta-spark's default DELETE/UPDATE since 3.4)
    derive exactly: a same-commit remove+add of ONE path is a DV
    transition, whose logical deletes are the positions in (new DV − old
    DV) — semi-joined against the file's ``_metadata.row_index`` — and
    whose restores (RESTORE across DV states) are (old − new) as inserts;
    a fresh add carrying a DV inserts only its unmarked rows; a remove
    whose file carried a DV deletes only the rows that were still live.

    Rows are tagged ``_change_type`` / ``_commit_version`` /
    ``_commit_timestamp`` exactly like :meth:`DeltaliteTable.read_changes`.
    Column mapping (mode=name) resolves physical file columns to logical
    names via the LATEST metaData at or before ``ending_version``."""
    import pyspark.sql.functions as F
    from pyspark.sql.types import StructType

    root = Path(path)
    log_dir = root / "_delta_log"
    versions = sorted(
        int(p.stem) for p in log_dir.glob("*.json") if p.stem.isdigit()
    )
    if not versions:
        raise FileNotFoundError(f"no Delta commits in {log_dir}")
    end = versions[-1] if ending_version is None else ending_version
    if versions[0] > 0 and starting_version < versions[0] - 1:
        # metadata-cleaned log (delta.logRetentionDuration / the pruned
        # histories export_delta_history writes): JSON commits below the
        # boundary are gone, so versions in (starting_version, versions[0])
        # can never iterate below — silently returning the surviving suffix
        # would hand the consumer an incomplete feed. Mirror the loud
        # refusal DeltaliteTable.read_changes makes for the same situation.
        raise ValueError(
            f"change feed from version {starting_version} is unavailable: "
            f"log retention pruned JSON commits < {versions[0]} "
            f"(earliest complete feed starts at {versions[0] - 1}); "
            f"restart the consumer from a fresh snapshot"
        )

    # latest metaData at or before `end` drives logical-name resolution. On
    # a metadata-cleaned log (only a boundary checkpoint below the first
    # JSON commit) the metaData may live solely in the checkpoint — seed
    # from the newest checkpoint ≤ end, then let later JSON re-emits win.
    schema_json = None
    configuration: dict = {}
    single_ckpts = {
        int(p.name.split(".")[0]): [p]
        for p in log_dir.glob("*.checkpoint.parquet")
    }
    ckpt_files = {
        **_v2_checkpoints(log_dir),
        **_multipart_checkpoints(log_dir),
        **single_ckpts,
    }
    seed_ckpt = max((c for c in ckpt_files if c <= end), default=None)
    if seed_ckpt is not None:
        import pyarrow.parquet as pq_

        for part in ckpt_files[seed_ckpt]:
            pf = pq_.ParquetFile(str(part))
            if "metaData" not in pf.schema_arrow.names:
                continue
            for batch in pf.iter_batches(columns=["metaData"]):
                for m in batch.column("metaData").to_pylist():
                    if m and m.get("schemaString"):
                        schema_json = m["schemaString"]
                        cfg = m.get("configuration") or {}
                        if isinstance(cfg, list):  # pyarrow MAP -> tuples
                            cfg = dict(cfg)
                        configuration = dict(cfg)
    for v in versions:
        if v > end:
            break
        for ln in (log_dir / f"{v:020d}.json").read_text().splitlines():
            a = json.loads(ln)
            if a.get("metaData") and a["metaData"].get("schemaString"):
                schema_json = a["metaData"]["schemaString"]
                configuration = dict(a["metaData"].get("configuration") or {})
    if schema_json is None:
        raise ValueError(f"no metaData action found in {log_dir}")
    schema = StructType.fromJson(json.loads(schema_json))
    cm_mode = configuration.get("delta.columnMapping.mode", "none")
    mapped = cm_mode in ("name", "id")

    def phys(f) -> str:
        if mapped and f.metadata and "delta.columnMapping.physicalName" in f.metadata:
            return f.metadata["delta.columnMapping.physicalName"]
        return f.name

    # id-mode tables resolve file columns by PARQUET FIELD ID (same
    # mechanism as read_delta_snapshot): scans request an id-annotated
    # schema instead of trusting file column names — required for files
    # whose names match neither logical nor physical names (UniForm shape).
    if cm_mode == "id":
        from pyspark.sql.types import StringType, StructField

        spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")

        def _fmeta(f):
            if f.metadata and "delta.columnMapping.id" in f.metadata:
                return {"parquet.field.id": int(f.metadata["delta.columnMapping.id"])}
            return None

        scan_schema = StructType(
            [StructField(phys(f), f.dataType, True, _fmeta(f)) for f in schema.fields]
        )
        # cdc files carry the spec's _change_type column (no field id:
        # fields without id metadata fall back to name matching)
        cdc_schema = StructType(
            [*scan_schema.fields, StructField("_change_type", StringType(), True)]
        )
    else:
        scan_schema = cdc_schema = None

    def _read(paths: list[str], cdc: bool = False):
        r = spark.read
        if scan_schema is not None:
            r = r.schema(cdc_schema if cdc else scan_schema)
        return r.parquet(*paths)

    def project(df, extra_cols):
        cols = []
        for f in schema.fields:
            p = phys(f)
            if p in df.columns:
                cols.append(F.col(p).cast(f.dataType).alias(f.name))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        return df.select(*cols, *extra_cols)

    # Partition-column values live in the LOG (add/remove/cdc
    # partitionValues, physical names under column mapping), not in file
    # bytes — a feed that reads files alone NULLs every partition key, and
    # a consumer merging on it writes wrong rows. Scans group by partition
    # tuple and re-attach the literals under the PHYSICAL name so project()
    # resolves them like any file column.
    pv_by_path: dict[str, dict] = {}

    def _with_pv(df, pv_key: tuple):
        pvals = dict(pv_key)
        for f in schema.fields:
            p = phys(f)
            if p in pvals and p not in df.columns:
                val = pvals[p]
                lit = F.lit(None) if val is None or val == "" else F.lit(val)
                df = df.withColumn(p, lit.cast(f.dataType))
        return df

    def _pv_groups(paths):
        groups: dict[tuple, list[str]] = {}
        for p in paths:
            key = tuple(sorted((pv_by_path.get(p) or {}).items()))
            groups.setdefault(key, []).append(p)
        return sorted(groups.items())

    def _abs(rel: str) -> str:
        return os.path.abspath(str(root / Path(urllib.parse.unquote(rel))))

    def _dv_set(action: dict | None) -> set[int]:
        desc = (action or {}).get("deletionVector")
        if desc and desc.get("storageType"):
            return set(dvformat.dv_positions(desc, root))
        return set()

    def _pos_scan(paths: list[str]):
        # normalized (path, row_index) identity alongside the data columns —
        # the scheme prefix stripped so the join key matches os.path.abspath
        return _read(sorted(paths)).select(
            "*",
            F.regexp_replace(
                F.col("_metadata.file_path"), "^[a-z][a-zA-Z0-9+.-]*:/+", "/"
            ).alias("__fp"),
            F.col("_metadata.row_index").alias("__ri"),
        )

    def _pos_filter(paths: list[str], pairs: list[tuple[str, int]], keep: bool):
        raw = _pos_scan(paths)
        # pairs carry RAW filesystem paths (also used for reads/existence
        # checks); the join key must be the URI-quoted form _metadata
        # carries (space -> %20 etc.)
        pdf = F.broadcast(
            spark.createDataFrame(
                [(_uri_path(p), r) for p, r in pairs],
                "dv_fp string, dv_ri bigint",
            )
        )
        return raw.join(
            pdf,
            (raw["__fp"] == pdf["dv_fp"]) & (raw["__ri"] == pdf["dv_ri"]),
            "left_semi" if keep else "left_anti",
        )

    frames = []
    for v in versions:
        if v <= starting_version or v > end:
            continue
        cdc_paths: list[str] = []
        adds: dict[str, dict] = {}
        removes: dict[str, dict] = {}
        ts_ms = None
        for ln in (log_dir / f"{v:020d}.json").read_text().splitlines():
            a = json.loads(ln)
            if a.get("commitInfo"):
                ts_ms = a["commitInfo"].get("timestamp")
            elif a.get("cdc"):
                p = _abs(a["cdc"]["path"])
                cdc_paths.append(p)
                pv_by_path[p] = a["cdc"].get("partitionValues") or {}
            elif a.get("add") and a["add"].get("dataChange"):
                adds[a["add"]["path"]] = a["add"]
                pv_by_path[_abs(a["add"]["path"])] = (
                    a["add"].get("partitionValues") or {}
                )
            elif a.get("remove") and a["remove"].get("dataChange"):
                removes[a["remove"]["path"]] = a["remove"]
                # removes carry partitionValues optionally (delta-spark
                # writes them); an add for the same path wins
                pv_by_path.setdefault(
                    _abs(a["remove"]["path"]),
                    a["remove"].get("partitionValues") or {},
                )
        ts = F.timestamp_seconds(F.lit((ts_ms or 0) / 1000.0))

        def _emit(df, tag: str, pv_key: tuple = (), _v=v, _ts=ts) -> None:
            # project() selects only schema fields + extras, so the __fp/__ri
            # join columns fall away here
            frames.append(
                project(_with_pv(df, pv_key), [])
                .withColumn("_change_type", F.lit(tag))
                .withColumn("_commit_version", F.lit(_v))
                .withColumn("_commit_timestamp", _ts)
            )

        if cdc_paths:
            for pv_key, grp in _pv_groups(cdc_paths):
                raw = _with_pv(_read(sorted(grp), cdc=True), pv_key)
                frames.append(
                    project(raw, [F.col("_change_type")])
                    .withColumn("_commit_version", F.lit(v))
                    .withColumn("_commit_timestamp", ts)
                )
            continue
        # classify file actions: DV transitions (same path removed+re-added)
        # are row-level; everything else is whole-file modulo its DV
        pos_del: list[tuple[str, int]] = []
        pos_ins: list[tuple[str, int]] = []
        ins_plain: list[str] = []
        ins_dv: list[tuple[str, set[int]]] = []
        del_plain: list[str] = []
        del_dv: list[tuple[str, set[int]]] = []
        for rel, add in adds.items():
            ap = _abs(rel)
            if rel in removes:
                old, new = _dv_set(removes[rel]), _dv_set(add)
                pos_del.extend((ap, r) for r in sorted(new - old))
                pos_ins.extend((ap, r) for r in sorted(old - new))
            else:
                dv = _dv_set(add)
                (ins_dv.append((ap, dv)) if dv else ins_plain.append(ap))
        for rel, rem in removes.items():
            if rel not in adds:
                ap = _abs(rel)
                dv = _dv_set(rem)
                (del_dv.append((ap, dv)) if dv else del_plain.append(ap))
        needed = (
            ins_plain + del_plain
            + [p for p, _ in ins_dv] + [p for p, _ in del_dv]
            + sorted({p for p, _ in pos_del} | {p for p, _ in pos_ins})
        )
        missing = [p for p in needed if not Path(p).exists()]
        if missing:
            raise ValueError(
                f"commit {v}: file(s) already vacuumed — the derived change "
                f"rows cannot be reconstructed ({missing[0]})"
            )
        for paths, tag in ((ins_plain, "insert"), (del_plain, "delete")):
            for pv_key, grp in _pv_groups(paths):
                _emit(_read(sorted(grp)), tag, pv_key)
        for group, tag in ((ins_dv, "insert"), (del_dv, "delete")):
            if group:
                pairs = [(p, r) for p, dv in group for r in sorted(dv)]
                for pv_key, grp in _pv_groups([p for p, _ in group]):
                    _emit(_pos_filter(grp, pairs, keep=False), tag, pv_key)
        for pairs, tag in ((pos_del, "delete"), (pos_ins, "insert")):
            if pairs:
                for pv_key, grp in _pv_groups(sorted({p for p, _ in pairs})):
                    _emit(_pos_filter(grp, pairs, keep=True), tag, pv_key)
    if not frames:
        raise ValueError(f"no changes in ({starting_version}, {end}]")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
