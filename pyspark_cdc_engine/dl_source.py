"""``deltalite`` Spark data source + the persistent SQL name binding.

The reference's consumers are plain SQL sessions: the streaming app writes
catalog tables (``writeStream...toTable("order_stream")``,
TransactionalCdcProcessingApp.scala:75-79) and ad-hoc users run ``spark-sql -f
db/query_table.sql`` against the NAMES. deltalite tables were path-bound
(Python ``DeltaliteTable.read`` / per-session temp views) — this module
closes that gap in two layers:

1. A batch snapshot RELATION (this data source)::

       spark.read.format("deltalite").load("/tables/orders")   # fresh per call
       CREATE TEMPORARY VIEW orders_cdc USING deltalite
           OPTIONS (path '/tables/orders');                    -- SQL binding
       ... OPTIONS (path '...', versionAsOf '3')               -- time travel

2. A PERSISTED BINDINGS REGISTRY (:func:`bind_table` /
   :func:`restore_bindings`): name->path entries land in
   ``<spark.sql.warehouse.dir>/_deltalite_bindings.json``; every session
   built by :func:`pyspark_cdc_engine.session.get_spark` replays them as
   the SQL binding above at startup — so a FRESH session resolves
   ``SELECT * FROM order_stream`` by name with zero per-session Python
   setup, and ``spark.catalog.tableExists`` answers the reference's
   bootstrap probe (ScdType1MergeApp.scala:74).

Why not ``CREATE TABLE t USING deltalite`` in a Hive metastore? A genuine
gap in Spark 4.1's Python data source API: catalog table resolution calls
``PythonDataSourceV2.getTable(schema, partitioning, properties)`` and
DISCARDS the properties map (the stored OPTIONS — verified against the
shipped bytecode), then plans the scan from the (empty) per-query read
options, so the table's ``path`` never reaches the Python source. CREATE
TABLE therefore succeeds (schema inference sees the OPTIONS) but every
SELECT fails. The bindings registry reproduces the reference's
consumption model — names that survive across sessions — on the surface
the API actually supports; if a later Spark forwards the properties, the
same data source serves real catalog tables unchanged.

Freshness: the ``spark.read...load()`` form resolves the log per CALL;
the ``CREATE TEMPORARY VIEW ... USING`` form is resolved ONCE at view
creation (Spark caches the relation's read plan), so a binding sees the
table as of its creation — re-run :func:`restore_bindings` (or re-bind)
to pick up newer commits, exactly like re-running ``register_cdc_views``.

Read semantics match ``DeltaliteTable.read(version=...)``: log-schema
driven (absent columns null-padded), column-mapping physical->logical,
Hive-style partition dirs rehydrated, deletion-vector tombstones applied
(surviving positions only), crash-staged dirs repaired. Scale shape:
planning is a driver-side log read + file listing (the same metadata
scale as any table format); data moves as Arrow RecordBatches per file —
one slice per parquet file, tombstoned files take only surviving
positions.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

from pyspark_cdc_engine.cdf_source import (
    _arrow_type,
    _coerce,
    _dir_files,
    _dv_positions,
    _norm_path_opt,
    _partition_values,
    _read_commit,
    _versions,
)

FORMAT_NAME = "deltalite"


class _SnapSlice(InputPartition):
    """One snapshot read unit: a set of parquet files projected to physical
    field names; ``take`` (file -> sorted positions) present only for
    DV-tombstoned files — the SURVIVING positions."""

    def __init__(
        self,
        files: list[str],
        take: dict[str, list[int]] | None,
        fields: list[tuple[str, str, str]],  # (logical, physical, simpleString)
    ) -> None:
        self.files = files
        self.take = take
        self.fields = fields


def _snap_tables(sl: _SnapSlice):
    import pyarrow.parquet as pq

    for f in sl.files:
        pf = pq.ParquetFile(f)
        names = set(pf.schema_arrow.names)
        want = [p for (_l, p, _t) in sl.fields if p in names]
        tbl = pq.read_table(f, columns=want)
        if sl.take is not None:
            idx = sl.take.get(f)
            if not idx:
                # fully-tombstoned file — and pa.Table.take([]) would choke
                # on the inferred null-typed index array anyway
                continue
            tbl = tbl.take(idx)
        if tbl.num_rows:
            yield f, tbl, names


def _read_snap_arrow(sl: _SnapSlice):
    import pyarrow as pa

    for f, tbl, names in _snap_tables(sl):
        n = tbl.num_rows
        parts = _partition_values(f)
        arrays, fields = [], []
        for logical, name, t in sl.fields:
            at = _arrow_type(t)
            if name in names:
                col = tbl.column(name)
                arrays.append(col.cast(at) if col.type != at else col)
            elif name in parts:
                arrays.append(
                    pa.repeat(pa.scalar(_coerce(parts[name], t), type=at), n)
                )
            else:
                arrays.append(pa.nulls(n, type=at))
            fields.append(pa.field(logical, at))
        out = pa.table(arrays, schema=pa.schema(fields))
        for b in out.to_batches():
            yield b


def _read_snap_rows(sl: _SnapSlice) -> Iterator[tuple]:
    """Tuple fallback for types outside the Arrow scalar map (arrays,
    structs, timestamps) — same null-pad / partition-rehydrate contract."""
    for f, tbl, names in _snap_tables(sl):
        parts = _partition_values(f)
        cols = {}
        for _l, name, t in sl.fields:
            if name in names:
                cols[name] = tbl.column(name).to_pylist()
            elif name in parts:
                cols[name] = [_coerce(parts[name], t)] * tbl.num_rows
            else:
                cols[name] = [None] * tbl.num_rows
        for i in range(tbl.num_rows):
            yield tuple(cols[name][i] for _l, name, _t in sl.fields)


def _ensure_published_paths(root: Path, rels: list[str]) -> None:
    """Driver-side crash repair, mirroring DeltaliteTable._ensure_published:
    a committed dir still sitting in ``_staging/`` finishes its move.
    Idempotent, table-relative only."""
    for rel in rels:
        if not rel.startswith("data/"):
            continue
        dst = root / rel
        src = root / "_staging" / rel.removeprefix("data/")
        if not dst.exists() and src.exists():
            dst.parent.mkdir(parents=True, exist_ok=True)
            src.rename(dst)


class DeltaliteSnapshotReader(DataSourceReader):
    def __init__(self, options, fields) -> None:
        self._path = _norm_path_opt(options.get("path"))
        vs = _versions(self._path)
        va = options.get("versionAsOf")
        self._version = int(va) if va is not None else (vs[-1] if vs else -1)
        self._fields = fields

    def partitions(self) -> Sequence[InputPartition]:
        import pyarrow.parquet as pq

        root = Path(self._path)
        commit = _read_commit(self._path, self._version)
        _ensure_published_paths(root, list(commit.get("live") or []))
        dv = _dv_positions(root, commit.get("dv_files") or [])
        slices: list[_SnapSlice] = []
        for rel in commit.get("live") or []:
            for f in _dir_files(root, rel):
                dropped = dv.get(f)
                if dropped:
                    n = pq.read_metadata(f).num_rows
                    keep = sorted(set(range(n)) - dropped)
                    slices.append(_SnapSlice([f], {f: keep}, self._fields))
                else:
                    slices.append(_SnapSlice([f], None, self._fields))
        # Spark maps an empty partition list to one read(None) call —
        # represent an empty snapshot as a zero-file slice instead
        return slices or [_SnapSlice([], None, self._fields)]

    def read(self, partition: _SnapSlice):
        if all(
            _arrow_type(t) is not None for (_l, _p, t) in partition.fields
        ):
            return _read_snap_arrow(partition)
        return _read_snap_rows(partition)


class DeltaliteDataSource(DataSource):
    """Batch snapshot relation over a deltalite table path (module
    docstring has the SQL surface and semantics)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def _resolved(self):
        path = _norm_path_opt(self.options.get("path"))
        if not path:
            raise ValueError("deltalite requires option 'path'")
        vs = _versions(path)
        if not vs:
            raise ValueError(f"not a deltalite table (no _log): {path}")
        va = self.options.get("versionAsOf")
        v = int(va) if va is not None else vs[-1]
        commit = _read_commit(path, v)
        if not commit.get("schema"):
            raise ValueError(
                "deltalite requires a schema-carrying table (any table "
                "written by this library's append/overwrite)"
            )
        schema = StructType.fromJson(json.loads(commit["schema"]))
        mapping = commit.get("column_mapping") or {}
        fields = [
            (f.name, mapping.get(f.name, f.name), f.dataType.simpleString())
            for f in schema.fields
        ]
        return schema, fields

    def schema(self) -> StructType:
        schema, _ = self._resolved()
        return schema

    def reader(self, schema) -> DeltaliteSnapshotReader:
        _, fields = self._resolved()
        return DeltaliteSnapshotReader(self.options, fields)


def register_snapshot_source(spark) -> None:
    spark.dataSource.register(DeltaliteDataSource)


# ---------------------------------------------------------------------------
# Persisted name bindings (module docstring: why not CREATE TABLE USING)
# ---------------------------------------------------------------------------

_BINDINGS_FILE = "_deltalite_bindings.json"


def _bindings_path(spark) -> Path:
    wh = _norm_path_opt(spark.conf.get("spark.sql.warehouse.dir"))
    return Path(wh) / _BINDINGS_FILE


def _load_bindings(spark) -> dict:
    p = _bindings_path(spark)
    try:
        return json.loads(p.read_text())
    except (OSError, ValueError):
        return {}


def _update_bindings(spark, mutate) -> None:
    """Apply ``mutate(bindings_dict)`` under an O_EXCL lock file so two
    sessions updating the registry concurrently can't lose each other's
    entries — the atomic tmp-rename alone only prevents torn reads, not
    lost updates from a racing load-mutate-replace."""
    import os
    import time

    p = _bindings_path(spark)
    p.parent.mkdir(parents=True, exist_ok=True)
    lock = p.with_suffix(".json.lock")
    deadline = time.monotonic() + 30.0
    while True:
        try:
            fd = os.open(str(lock), os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            break
        except FileExistsError:
            # a crashed holder must not wedge every future session
            # (wall clock, NOT monotonic: st_mtime is epoch time)
            try:
                if time.time() - lock.stat().st_mtime > 60.0:
                    lock.unlink(missing_ok=True)
                    continue
            except OSError:
                continue
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"could not acquire bindings lock {lock} in 30s"
                )
            time.sleep(0.05)
    try:
        bindings = _load_bindings(spark)
        mutate(bindings)
        tmp = p.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(bindings, indent=1, sort_keys=True))
        tmp.replace(p)  # atomic: a concurrent reader never sees a torn file
    finally:
        lock.unlink(missing_ok=True)


def _create_binding_view(spark, name: str, entry: dict) -> None:
    if entry.get("kind") == "view":
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY VIEW {name} AS {entry['sql']}"
        )
        return
    # the path is spliced into DDL as a single-quoted literal: double any
    # embedded quote (SQL string-escape) so a quoted path can't break the
    # statement or inject SQL — the registry file is executable SQL at
    # every session start
    path_lit = str(entry["path"]).replace("'", "''")
    opts = [f"path '{path_lit}'"]
    if entry.get("versionAsOf") is not None:
        opts.append(f"versionAsOf '{int(entry['versionAsOf'])}'")
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW {name} "
        f"USING {FORMAT_NAME} OPTIONS ({', '.join(opts)})"
    )


def bind_table(
    spark, name: str, path: str, version_as_of: int | None = None
) -> None:
    """Bind ``name`` -> deltalite table at ``path``: creates the SQL
    binding NOW and records it in the warehouse-dir registry so every
    later :func:`~pyspark_cdc_engine.session.get_spark` session (same
    warehouse) replays it at startup — the persistent-catalog consumption
    model on the surface Spark's Python DS API supports. ``name`` must be
    identifier-shaped (it is spliced into DDL)."""
    import re

    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
        raise ValueError(f"binding name must be a bare identifier: {name!r}")
    if not _versions(path):
        raise ValueError(f"not a deltalite table (no _log): {path}")
    entry = {"path": str(path)}
    if version_as_of is not None:
        entry["versionAsOf"] = int(version_as_of)
    _create_binding_view(spark, name, entry)
    _update_bindings(spark, lambda b: b.__setitem__(name, entry))


def bind_view(spark, name: str, body_sql: str) -> None:
    """Bind ``name`` as a persistent SQL VIEW (``CREATE OR REPLACE
    TEMPORARY VIEW name AS <body_sql>`` now + registry replay in every
    later session). Views restore AFTER table bindings (registry replay
    is kind-ordered), so a view over a bound table name just works."""
    import re

    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
        raise ValueError(f"binding name must be a bare identifier: {name!r}")
    entry = {"kind": "view", "sql": body_sql}
    _create_binding_view(spark, name, entry)
    _update_bindings(spark, lambda b: b.__setitem__(name, entry))


def unbind_table(spark, name: str) -> None:
    """Remove a binding from the registry and drop its view (if any)."""
    _update_bindings(spark, lambda b: b.pop(name, None))
    spark.sql(f"DROP VIEW IF EXISTS {name}")


def restore_bindings(spark) -> list[str]:
    """Replay every registry entry as a fresh SQL binding (called by
    ``get_spark`` at session start; call again any time to refresh every
    binding to its table's current latest version). Entries whose table
    vanished are skipped — a dropped path must not break every future
    session. Returns the restored names."""
    restored = []
    items = sorted(
        _load_bindings(spark).items(),
        # tables first, then views — a view's body references table names
        key=lambda kv: (kv[1].get("kind") == "view", kv[0]),
    )
    for name, entry in items:
        if entry.get("kind") != "view" and not _versions(
            entry.get("path", "")
        ):
            continue
        try:
            _create_binding_view(spark, name, entry)
            restored.append(name)
        except Exception as e:
            # one broken binding must not break session startup, but a
            # silently-vanished name gives a confusing missing-name error
            # downstream — say which binding was skipped and why
            import warnings

            warnings.warn(
                f"deltalite: skipping binding {name!r} during registry "
                f"replay: {type(e).__name__}: {e}",
                stacklevel=2,
            )
            continue
    return restored
