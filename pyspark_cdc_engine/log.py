"""deltalite's transaction log: delta-encoded commits + parquet checkpoints.

Pure Python (json + pyarrow, no Spark) so both the table layer
(:mod:`pyspark_cdc_engine.tables`) and the driver-side streaming CDF planner
(:mod:`pyspark_cdc_engine.cdf_source`) share one protocol implementation.

Why delta-encoded: the pre-r7 format wrote a FULL snapshot (the complete live
dir list + carried DV/column-mapping state) into every commit, making commit
metadata O(table files) — tens of MB of JSON per micro-batch commit on an
append-heavy 100 TB table (~800k live dirs), written and parsed on the driver,
with total log volume quadratic in commit count. This module stores what the
reference's Delta Lake stores (delta.io PROTOCOL.md; the reference relies on
it scaling in db/table_maintenance.sql:49-61):

- each commit JSON records only its OWN actions: ``add`` (new data dirs, with
  their write-time footer stats), ``remove`` (dirs leaving the live set), any
  CHANGED carried metadata (schema, constraints, column mapping, deletion
  vectors, ...), and the commit's per-commit fields (operation, txn,
  predicates, cdc_dirs). Commit size is independent of table size.
- every ``checkpoint_interval`` commits, a parquet CHECKPOINT materializes the
  full reconstructed state (one row per live dir + one metadata row) and
  ``_last_checkpoint`` points at it — so reading the latest snapshot costs one
  parquet read plus at most ``interval`` tiny JSON docs, never a full replay.

State reconstruction is cached per (log dir, version); commit files are
immutable once linked so the cache is validated only by a cheap stat
signature (guards a test deleting and recreating a table at the same path).

Legacy snapshot-style commits (a ``live`` key in the doc) still replay
correctly: they act as a full state reset, so pre-r7 logs and hand-written
protocol-test docs keep working unchanged.

Log retention (:func:`cleanup`, ``DeltaliteTable.cleanup_log``): commit docs
and checkpoints strictly before a boundary checkpoint can be pruned (Delta's
``delta.logRetentionDuration`` metadata cleanup). Retained versions
reconstruct exactly (replay seeds from the boundary checkpoint); time travel
and change feeds below the boundary raise loudly. Idempotent-writer txn
markers survive pruning through the carried cumulative ``txn_high`` map —
the SetTransaction-in-checkpoint analog.

Layout::

    <root>/_log/00000000000000000007.json                # delta-encoded commit
    <root>/_log/00000000000000000020.checkpoint.parquet  # full state at v20
    <root>/_log/_last_checkpoint                         # {"version": 20}
"""

from __future__ import annotations

import json
import os
import uuid
from collections import OrderedDict
from pathlib import Path


class ConcurrentWriteError(RuntimeError):
    """Another writer committed the same version first (optimistic concurrency)."""


#: Metadata that rides the log forward until a commit changes it (the analog
#: of Delta's metaData/protocol actions). Everything else in a commit doc is
#: per-commit (operation, txn, DML predicates, cdc_dirs, ...) and never
#: carries to later versions.
CARRIED_KEYS = (
    "schema",
    "partition_by",
    "constraints",
    "column_mapping",
    "retired_physical",
    "dv_files",
    "cdf",
    "generated",
    "identity",
    # cumulative per-app txn high-water marks (Delta's SetTransaction-in-
    # checkpoint analog): maintained by apply_doc from each commit's `txn`
    # marker, never written by commit docs directly — carrying it means
    # idempotent-writer dedup survives log retention (cleanup) pruning the
    # commits that recorded the markers.
    "txn_high",
)

#: Doc keys with protocol meaning — a caller's ``extra`` may not collide.
_RESERVED = {"version", "timestamp", "operation", "live", "add", "remove",
             "txn_high"}

_CKPT_SUFFIX = ".checkpoint.parquet"


def commit_path(log_dir: Path, version: int) -> Path:
    return log_dir / f"{version:020d}.json"


def checkpoint_path(log_dir: Path, version: int) -> Path:
    return log_dir / f"{version:020d}{_CKPT_SUFFIX}"


def versions(log_dir: Path) -> list[int]:
    if not log_dir.exists():
        return []
    return sorted(int(p.stem) for p in log_dir.glob("*.json"))


def checkpoint_versions(log_dir: Path) -> list[int]:
    if not log_dir.exists():
        return []
    return sorted(
        int(p.name.split(".")[0]) for p in log_dir.glob(f"*{_CKPT_SUFFIX}")
    )


def raw_doc(log_dir: Path, version: int) -> dict:
    """The on-disk commit doc — per-commit fields + this commit's own actions
    only. Use :func:`state_at` for the reconstructed snapshot."""
    return json.loads(commit_path(log_dir, version).read_text())


# ------------------------------------------------------------------ replay


def carry_of(state: dict) -> dict:
    """The portion of a snapshot that rides forward to the next version."""
    out = {}
    for k in ("live", "dir_stats", *CARRIED_KEYS):
        if k in state:
            out[k] = state[k]
    return out


def apply_doc(carry: dict, doc: dict) -> dict:
    """Apply one commit doc to carried state, returning the full snapshot at
    that version (carried state + the doc's per-commit fields). Never mutates
    ``carry``. Idempotent for the same doc (set-based add/remove), which lets
    a checkpoint's own doc overlay its checkpointed state."""
    if "live" in doc:
        # legacy snapshot-style doc: complete state reset (pre-r7 writers
        # embedded everything; absent keys mean absent state) — except the
        # cumulative txn high-water map, which survives resets
        state = dict(doc)
        if "txn_high" in carry:
            state["txn_high"] = carry["txn_high"]
        return _merge_txn_high(state, carry, doc)
    state = dict(carry)
    add = doc.get("add") or []
    remove = set(doc.get("remove") or [])
    state["live"] = sorted((set(carry.get("live") or []) - remove) | set(add))
    stats = {
        r: s
        for r, s in (carry.get("dir_stats") or {}).items()
        if r not in remove
    }
    stats.update(doc.get("dir_stats") or {})
    if stats:
        state["dir_stats"] = stats
    else:
        state.pop("dir_stats", None)
    for k, val in doc.items():
        if k not in ("add", "remove", "dir_stats"):
            state[k] = val  # carried changes + per-commit fields + version/ts/op
    return _merge_txn_high(state, carry, doc)


def _merge_txn_high(state: dict, carry: dict, doc: dict) -> dict:
    """Fold ``doc``'s per-commit ``txn`` marker into the carried cumulative
    ``txn_high`` map (app -> max version seen)."""
    txn = doc.get("txn") or {}
    app, ver = txn.get("app"), txn.get("version")
    if app is None or ver is None:
        return state
    th = dict(carry.get("txn_high") or {})
    th[app] = ver if app not in th else max(th[app], ver)
    state["txn_high"] = th
    return state


def replay_states(log_dir: Path, end: int | None = None):
    """Linear replay: yields ``(version, state, raw_doc)`` for every RETAINED
    commit up to ``end`` — the one-pass shape for vacuum / history / export,
    where per-version reconstruction would be quadratic.

    On a retention-pruned log (oldest retained version > 0, see
    :func:`cleanup`) the carry seeds from the boundary checkpoint, so the
    first yielded state is the full snapshot — NOT the first doc's adds
    alone. Without this, a pruned log would make vacuum see long-lived dirs
    as unreferenced and delete live data.

    A MID-replay version gap (only ever produced by racing a :func:`cleanup`
    mid-deletion: docs are a ``{0..j}`` genesis prefix plus the retained
    suffix) re-seeds the same way from the checkpoint at the gap's far side —
    applying a delta doc across missing versions would silently corrupt the
    live set.

    A NON-atomic directory listing racing that same deletion can transiently
    show a non-prefix hole (e.g. v6 scanned before its unlink, v5's entry
    read after its own) or list a doc/checkpoint that is gone by read time.
    These resolve once the deletion sweep has passed, so a missing mid-gap
    checkpoint or a vanished listed file re-lists (from just past the last
    yielded version — earlier yields already reached the consumer) and
    retries, a BOUNDED number of times per position so real corruption
    still raises; successful progress resets the budget (a long replay may
    legitimately race several cleanups)."""
    vs = versions(log_dir)
    carry: dict = {}
    prev_v: int | None = None
    relists = 0
    i = 0

    def _relist() -> list[int]:
        return [x for x in versions(log_dir) if prev_v is None or x > prev_v]

    while i < len(vs):
        v = vs[i]
        if end is not None and v > end:
            break
        gap = (prev_v is None and v > 0) or (
            prev_v is not None and v != prev_v + 1
        )
        if gap and v not in checkpoint_versions(log_dir):
            # seed (or re-seed across a gap) needs the checkpoint cleanup()
            # guarantees at the boundary it prunes up to — absence here is
            # either a torn listing (retry) or real corruption (raise)
            if relists < 3:
                relists += 1
                vs, i = _relist(), 0
                continue
            raise FileNotFoundError(
                f"pruned log resumes at v{v} but no checkpoint exists "
                f"there — {log_dir} is corrupt"
            )
        try:
            doc = raw_doc(log_dir, v)
            if gap:
                carry = load_checkpoint_carry(log_dir, v)
                # v's own doc re-applies idempotently below, recovering its
                # per-commit fields (same contract as state_at)
        except FileNotFoundError:
            # listed but deleted before we read it (doc or checkpoint):
            # same torn race
            if relists < 3:
                relists += 1
                vs, i = _relist(), 0
                continue
            raise
        state = apply_doc(carry, doc)
        carry = carry_of(state)
        prev_v = v
        relists = 0  # progress: fresh budget for the next stall point
        i += 1
        yield v, state, doc


def cleanup(log_dir: Path, keep_from: int, dry_run: bool = False) -> list[str]:
    """Log retention (Delta's metadata-cleanup analog): delete commit docs
    and checkpoints STRICTLY BEFORE ``keep_from``, which must itself be a
    checkpoint version — the boundary checkpoint stays, so every retained
    version still reconstructs (checkpoint + at most ``interval`` docs) and
    :func:`replay_states` seeds from it. Time travel / change feeds below
    ``keep_from`` become unavailable (callers raise loudly — the Delta
    ``logRetentionDuration`` contract).

    Returns the deleted (or, ``dry_run``, deletable) file names. Deletion
    order is docs NEWEST-first, then checkpoints oldest-first: mid-deletion
    the remaining docs are always a genesis prefix ``{0..j}`` plus the
    retained ``{keep_from..}`` suffix, so a racing reader either replays the
    prefix from genesis or re-seeds at ``keep_from``'s still-present boundary
    checkpoint (:func:`replay_states` handles the version gap) — it never
    sees an oldest doc that is neither genesis nor checkpoint-backed, which
    oldest-first deletion would briefly expose."""
    cvs = checkpoint_versions(log_dir)
    if keep_from not in cvs:
        raise ValueError(
            f"keep_from={keep_from} is not a checkpoint version "
            f"(checkpoints: {cvs}) — the boundary must stay reconstructible"
        )
    doomed_docs = [v for v in versions(log_dir) if v < keep_from]
    doomed_ckpts = [c for c in cvs if c < keep_from]
    names = [commit_path(log_dir, v).name for v in doomed_docs] + [
        checkpoint_path(log_dir, c).name for c in doomed_ckpts
    ]
    if dry_run:
        return names
    for v in reversed(doomed_docs):
        commit_path(log_dir, v).unlink(missing_ok=True)
    for c in doomed_ckpts:
        checkpoint_path(log_dir, c).unlink(missing_ok=True)
    # drop cached states for pruned versions: a stale hit would let
    # state_at() keep answering for history that is gone
    for key in [k for k in _STATE_CACHE if k[0] == str(log_dir) and k[1] < keep_from]:
        _STATE_CACHE.pop(key, None)
    return names


# ------------------------------------------------------------- checkpoints


def write_checkpoint(log_dir: Path, version: int, state: dict) -> None:
    """Materialize the full state at ``version`` as a parquet checkpoint
    (one 'add' row per live dir + one 'meta' row of carried metadata) and
    repoint ``_last_checkpoint``. Both writes are tmp+rename atomic; the
    checkpoint is derived data — a crash between commit and checkpoint just
    means the next one lands ``interval`` commits later."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    live = list(state.get("live") or [])
    stats = state.get("dir_stats") or {}
    meta = {k: state[k] for k in CARRIED_KEYS if k in state}
    kinds = ["meta"] + ["add"] * len(live)
    rels = [None] + live
    stat_col = [None] + [
        json.dumps(stats[r]) if r in stats else None for r in live
    ]
    meta_col = [json.dumps(meta)] + [None] * len(live)
    tbl = pa.table(
        {
            "kind": pa.array(kinds, type=pa.string()),
            "rel": pa.array(rels, type=pa.string()),
            "stats": pa.array(stat_col, type=pa.string()),
            "meta": pa.array(meta_col, type=pa.string()),
        }
    )
    tmp = log_dir / f"{uuid.uuid4().hex}.ckpt.tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, checkpoint_path(log_dir, version))
    lc_tmp = log_dir / f"{uuid.uuid4().hex}.lc.tmp"
    lc_tmp.write_text(json.dumps({"version": version}))
    os.replace(lc_tmp, log_dir / "_last_checkpoint")


def load_checkpoint_carry(log_dir: Path, version: int) -> dict:
    """Carried state recorded by the checkpoint at ``version`` (batched
    pyarrow read — never materializes per-row Python beyond the live list)."""
    import pyarrow.parquet as pq

    carry: dict = {}
    live: list[str] = []
    stats: dict[str, list] = {}
    pf = pq.ParquetFile(checkpoint_path(log_dir, version))
    for batch in pf.iter_batches(columns=["kind", "rel", "stats", "meta"]):
        kinds = batch.column("kind").to_pylist()
        rels = batch.column("rel").to_pylist()
        st = batch.column("stats").to_pylist()
        mt = batch.column("meta").to_pylist()
        for i, kind in enumerate(kinds):
            if kind == "add":
                live.append(rels[i])
                if st[i]:
                    stats[rels[i]] = json.loads(st[i])
            elif kind == "meta" and mt[i]:
                carry.update(json.loads(mt[i]))
    carry["live"] = sorted(live)
    if stats:
        carry["dir_stats"] = stats
    return carry


# ------------------------------------------------------------ reconstruction

# (log_dir, version) -> (stat signature of the commit file, state). Commit
# files are immutable once linked, so the signature only guards a table
# deleted and recreated at the same path within one process.
_STATE_CACHE: OrderedDict[tuple[str, int], tuple[tuple, dict]] = OrderedDict()
_STATE_CACHE_CAP = 64


def _sig(log_dir: Path, version: int) -> tuple:
    st = commit_path(log_dir, version).stat()
    return (st.st_ino, st.st_mtime_ns, st.st_size)


def _cache_get(log_dir: Path, version: int) -> dict | None:
    key = (str(log_dir), version)
    hit = _STATE_CACHE.get(key)
    if hit is None:
        return None
    try:
        if hit[0] != _sig(log_dir, version):
            del _STATE_CACHE[key]
            return None
    except FileNotFoundError:
        del _STATE_CACHE[key]
        return None
    _STATE_CACHE.move_to_end(key)
    return hit[1]


def _cache_put(log_dir: Path, version: int, state: dict) -> None:
    key = (str(log_dir), version)
    try:
        _STATE_CACHE[key] = (_sig(log_dir, version), state)
    except FileNotFoundError:  # racing a table teardown: don't cache
        return
    _STATE_CACHE.move_to_end(key)
    while len(_STATE_CACHE) > _STATE_CACHE_CAP:
        _STATE_CACHE.popitem(last=False)


def _copy_state(state: dict) -> dict:
    out = dict(state)
    if "live" in out:
        out["live"] = list(out["live"])
    if "dir_stats" in out:
        out["dir_stats"] = dict(out["dir_stats"])
    return out


def state_at(log_dir: Path, version: int) -> dict:
    """Full reconstructed snapshot at ``version``: nearest checkpoint at or
    below it, plus at most ``interval`` commit docs of replay — with an LRU
    cache that makes sequential access (streaming planners, history walks)
    incremental. The returned dict is a copy; treat nested values as
    read-only."""
    cached = _cache_get(log_dir, version)
    if cached is not None:
        return _copy_state(cached)
    prev = _cache_get(log_dir, version - 1) if version > 0 else None
    if prev is not None:
        state = apply_doc(carry_of(prev), raw_doc(log_dir, version))
        _cache_put(log_dir, version, state)
        return _copy_state(state)
    if not commit_path(log_dir, version).exists():
        raise FileNotFoundError(
            f"no commit at version {version} in {log_dir}"
        )
    cv = max(
        (c for c in checkpoint_versions(log_dir) if c <= version), default=-1
    )
    if cv >= 0:
        carry = load_checkpoint_carry(log_dir, cv)
        # cv's own doc re-applies idempotently, recovering its per-commit
        # fields in case version == cv
        start = cv
    else:
        carry = {}
        start = 0
    state: dict | None = None
    for v in [u for u in versions(log_dir) if start <= u <= version]:
        state = apply_doc(carry, raw_doc(log_dir, v))
        carry = carry_of(state)
    if state is None:  # unreachable while raw_doc(version) exists; explicit
        raise FileNotFoundError(f"no commit at version {version}")
    _cache_put(log_dir, version, state)
    return _copy_state(state)


# ----------------------------------------------------------------- writing


def encode_commit(
    base_state: dict,
    operation: str,
    live_dirs: list[str],
    extra: dict | None,
    version: int,
    timestamp: float,
) -> tuple[dict, dict]:
    """Delta-encode one commit against the base snapshot: returns
    ``(doc, new_state)``. ``doc`` holds only this commit's add/remove, stats
    for the ADDED dirs, carried-metadata keys that actually changed, and the
    caller's per-commit fields — size independent of table size."""
    carry = carry_of(base_state)
    extra = dict(extra or {})
    if "txn_high" in extra:
        # derived by apply_doc from each commit's `txn` marker — writers may
        # not set it directly (it would desync the cumulative map)
        raise ValueError("extra key 'txn_high' collides with the log protocol")
    base_live = set(carry.get("live") or [])
    new_live = set(live_dirs)
    add = sorted(new_live - base_live)
    remove = sorted(base_live - new_live)
    doc: dict = {
        "version": version,
        "timestamp": timestamp,
        "operation": operation,
        "add": add,
        "remove": remove,
    }
    new_stats = extra.pop("dir_stats", None) or {}
    add_set = set(add)
    add_stats = {r: s for r, s in new_stats.items() if r in add_set}
    if add_stats:
        doc["dir_stats"] = add_stats
    for k in CARRIED_KEYS:
        if k in extra:
            val = extra.pop(k)
            if val != carry.get(k):
                doc[k] = val
    for k, val in extra.items():
        if k in _RESERVED or k == "dir_stats":
            raise ValueError(f"extra key {k!r} collides with the log protocol")
        doc[k] = val
    return doc, apply_doc(carry, doc)


def link_commit(log_dir: Path, version: int, doc: dict) -> None:
    """Atomically publish a commit doc as version ``version``; raises
    :class:`ConcurrentWriteError` if that version already exists — link(2)
    fails with EEXIST, the same exclusive-create protocol Delta relies on."""
    log_dir.mkdir(parents=True, exist_ok=True)
    tmp = log_dir / f"{uuid.uuid4().hex}.tmp"
    tmp.write_text(json.dumps(doc, default=str))
    target = commit_path(log_dir, version)
    try:
        os.link(tmp, target)
    except FileExistsError:
        raise ConcurrentWriteError(
            f"version {version} was committed by another writer: {target}"
        ) from None
    finally:
        tmp.unlink(missing_ok=True)


def after_commit(
    log_dir: Path, version: int, state: dict, checkpoint_interval: int
) -> None:
    """Post-link bookkeeping: prime the snapshot cache with the state the
    writer already has in hand, and cut a checkpoint on interval boundaries."""
    _cache_put(log_dir, version, state)
    if checkpoint_interval > 0 and version > 0 and (
        version % checkpoint_interval == 0
    ):
        write_checkpoint(log_dir, version, state)


def contiguous_suffix_start(vs: list[int]) -> int:
    """Start of the version list's CONTIGUOUS suffix — what every retention
    guard must key on. A reader racing :func:`cleanup` mid-doc-deletion
    (docs removed newest-first) can observe a genesis prefix plus the
    retained suffix; versions below the gap are doomed history and must
    count as pruned, never as replayable. One shared implementation for the
    table layer and the streaming CDF planner (they guard the same race)."""
    start = vs[-1]
    for v in reversed(vs):
        if v != start and v != start - 1:
            break
        start = v
    return start
