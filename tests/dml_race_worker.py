"""Worker for the multi-OS-process DML race (tests/test_dml_race.py).

Runs a SEEDED program of DELETE/UPDATE/MERGE/APPEND against one shared
deltalite table from its own OS process with its own SparkSession — the
actual multi-writer deployment shape on a cluster, where the in-process
interleave hook of tests/test_maintenance.py cannot reach. Each op retries
on ConcurrentWriteError (an abandoned WriteSerializable re-resolution is a
clean abort; real clients re-run from the fresh snapshot). The program it
COMMITTED is written to a JSON result file so the parent can replay it
serially and compare end states.

Usage: python dml_race_worker.py <table_path> <wid> <seed> <result_json>
"""

from __future__ import annotations

import json
import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SHARED_LO, SHARED_HI = 9000, 9099
OWN_SPAN = 100


def build_program(wid: int, seed: int) -> list[dict]:
    """A seeded mix over the writer's OWN id range [wid*1000, wid*1000+99]
    (disjoint files — all writers' ops must land concurrently) plus ops on
    the SHARED dir [9000, 9099] targeting writer-distinct rows (same file —
    concurrent attempts conflict, abort cleanly, and land on retry).
    Every op is row-disjoint across writers, so any interleaving converges
    to the same state as per-writer serial replay."""
    rng = random.Random(seed)
    lo = wid * 1000
    ops: list[dict] = []
    own_ids = rng.sample(range(lo, lo + OWN_SPAN), 8)
    ops.append({"op": "delete", "mode": rng.choice(["cow", "dv"]),
                "where": f"id = {own_ids[0]}", "bounds": [lo, lo + OWN_SPAN - 1]})
    ops.append({"op": "update", "mode": rng.choice(["cow", "dv"]),
                "set": {"v": f"v + {wid + 1}"},
                "where": f"id >= {lo + 10} AND id < {lo + 30}",
                "bounds": [lo, lo + OWN_SPAN - 1]})
    ops.append({"op": "merge", "mode": "cow",
                "rows": [[own_ids[1], 5000.0 + wid],       # existing -> update
                         [own_ids[2], 6000.0 + wid],
                         [lo + OWN_SPAN + 1, 7000.0 + wid]]})  # new -> insert
    # shared-dir ops: same FILE as the other writers, distinct ROWS
    shared = SHARED_LO + wid * 10
    ops.append({"op": "delete", "mode": "cow", "where": f"id = {shared}",
                "bounds": [SHARED_LO, SHARED_HI]})
    ops.append({"op": "update", "mode": "cow",
                "set": {"v": "v * 2"}, "where": f"id = {shared + 1}",
                "bounds": [SHARED_LO, SHARED_HI]})
    ops.append({"op": "append",
                "rows": [[lo + OWN_SPAN + 10 + i, float(wid)] for i in range(3)]})
    ops.append({"op": "delete", "mode": rng.choice(["cow", "dv"]),
                "where": f"id = {own_ids[3]}", "bounds": [lo, lo + OWN_SPAN - 1]})
    rng.shuffle(ops)
    return ops


def _rows_df(spark, rows, partitioned: bool):
    """(id, v) rows, plus the derived grp partition column when the table
    is partitioned (grp = id // 1000 — each writer's range is one
    partition, the shared 9000s range another)."""
    if partitioned:
        return spark.createDataFrame(
            [(int(r[0]), float(r[1]), int(r[0]) // 1000) for r in rows],
            ["id", "v", "grp"],
        )
    return spark.createDataFrame(
        [(int(r[0]), float(r[1])) for r in rows], ["id", "v"]
    )


def apply_op(
    spark, table, o: dict, wid: int, i: int, retries: int = 40,
    partitioned: bool = False,
) -> int:
    """One op with caller-level retry: an abandoned OCC re-resolution
    (shared-file conflict) re-runs against the fresh snapshot. Returns the
    number of clean aborts absorbed. (txn_app, txn_version) tag every
    commit so the parent can prove exactly-once per program step."""
    from pyspark_cdc_engine.log import ConcurrentWriteError
    from pyspark_cdc_engine.tables import MergeClause

    txn = {"txn_app": f"dmlrace-w{wid}", "txn_version": i}
    aborts = 0
    for _ in range(retries):
        try:
            if o["op"] == "delete":
                table.delete(o["where"], mode=o["mode"],
                             prune_bounds={"id": tuple(o["bounds"])}, **txn)
            elif o["op"] == "update":
                table.update(o["set"], o["where"], mode=o["mode"],
                             prune_bounds={"id": tuple(o["bounds"])}, **txn)
            elif o["op"] == "merge":
                src = _rows_df(spark, o["rows"], partitioned)
                table.merge(
                    src, "target.id = source.id",
                    [MergeClause("update", None, {"v": "source.v"}),
                     MergeClause("insert", None, None)],
                    prune_on="id", broadcast_source=True, **txn,
                )
            elif o["op"] == "append":
                table.append(_rows_df(spark, o["rows"], partitioned), **txn)
            else:  # pragma: no cover
                raise AssertionError(o)
            return aborts
        except ConcurrentWriteError:
            aborts += 1
            time.sleep(random.uniform(0.02, 0.15))
    raise AssertionError(f"op never landed after {retries} aborts: {o}")


def run_maintenance(spark, path: str, rounds: int, result: str) -> None:
    """The AutoCompactor/AutoLogCleaner deployment shape: a maintenance
    loop racing live DML writers. compact() rewrites live dirs, so it
    CONFLICTS with any concurrent DML — a clean abort here is correct; it
    retries like the real maintenance job's next tick. Logically a no-op:
    the parent's serial oracle never needs to see these commits."""
    from pyspark_cdc_engine.log import ConcurrentWriteError
    from pyspark_cdc_engine.tables import DeltaliteTable

    table = DeltaliteTable(spark, path)
    committed, aborts = 0, 0
    for _ in range(rounds):
        try:
            before = table.latest_version()
            v = table.compact(target_partitions=2)
            # compact() can return WITHOUT committing (the partitioned
            # nothing-fragmented path returns the base) — and that base may
            # be a rival's commit OR this loop's own previous compact, so
            # neither the version bump nor the op name alone discriminates.
            # Both together do: a NEW version whose doc says 'compact' can
            # only be a commit this (sole) compactor just authored.
            if v > before and table._read_commit(v).get("operation") == "compact":
                committed += 1
        except ConcurrentWriteError:
            aborts += 1
        table.cleanup_log(retain_last=200)  # far above the race's depth:
        # retention must never prune commits the racing readers still replay
        time.sleep(random.uniform(0.05, 0.2))
    Path(result).write_text(
        json.dumps({"wid": "maintenance", "program": [],
                    "compactions": committed, "aborts": aborts})
    )


def main() -> None:
    path, wid, seed, result = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    partitioned = len(sys.argv) > 5 and sys.argv[5] == "part"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"dml-race-w{wid}")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "2")
        .getOrCreate()
    )
    if wid < 0:  # maintenance role
        run_maintenance(spark, path, rounds=-wid, result=result)
        spark.stop()
        return
    from pyspark_cdc_engine.tables import DeltaliteTable

    table = DeltaliteTable(spark, path)
    program = build_program(wid, seed)
    total_aborts = 0
    for i, o in enumerate(program):
        total_aborts += apply_op(spark, table, o, wid, i, partitioned=partitioned)
    Path(result).write_text(
        json.dumps({"wid": wid, "program": program, "aborts": total_aborts})
    )
    spark.stop()


if __name__ == "__main__":
    main()
