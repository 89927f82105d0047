"""Multi-OS-process DML race (r8 verdict ask #1): N independent writers —
separate processes, separate SparkSessions, no monkeypatch scheduling — run
seeded DELETE/UPDATE/MERGE/APPEND programs against ONE deltalite table.

Claims under genuine concurrency (the deployment shape on a cluster):
- disjoint-file DML all lands (Delta WriteSerializable re-resolution),
- same-file conflicts abort CLEANLY and land on caller retry,
- zero commits lost or doubled (txn markers prove exactly-once per step),
- the end state converges to the serial-oracle replay of the same programs.

Runs in BOTH layouts: unpartitioned (every writer shares one physical
file population) and partitioned by grp = id // 1000 (each writer owns a
partition, the shared range is a contended partition — the layout where
compact() takes the partition-scoped path and disjoint-partition DML
should land with near-zero contention).

The in-process `_interleave` tests (tests/test_maintenance.py) pin the
deterministic conflict matrix; this lane proves the same contract survives
real OS-level interleaving end to end."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import pytest

from pyspark.sql import functions as F

from pyspark_cdc_engine import log as txlog
from pyspark_cdc_engine.tables import DeltaliteTable

from tests import dml_race_worker as worker

WRITERS = 3
SEED = 20260815


def _setup(spark, path: str, partitioned: bool) -> DeltaliteTable:
    """One SHARED data population (id 9000..9099 — every writer hits it)
    plus one per writer's own id range. Unpartitioned: shared rows are one
    file every writer rewrites. Partitioned (grp = id // 1000): each
    writer's range is its own partition dir, the shared range a contended
    one."""
    t = DeltaliteTable(spark, path)

    def rows(lo, hi):
        df = spark.range(lo, hi).selectExpr("id", "CAST(id AS DOUBLE) AS v")
        if partitioned:
            df = df.withColumn("grp", (F.col("id") / 1000).cast("bigint"))
        return df

    t.overwrite(
        rows(worker.SHARED_LO, worker.SHARED_HI + 1),
        partition_by=["grp"] if partitioned else None,
    )
    for w in range(WRITERS):
        t.append(rows(w * 1000, w * 1000 + worker.OWN_SPAN))
    return t


def _race(spark, tmp_path, partitioned: bool) -> None:
    path = str(tmp_path / "t")
    t = _setup(spark, path, partitioned)
    setup_versions = t.latest_version() + 1

    # WRITERS DML processes plus ONE maintenance process (wid < 0 =
    # compaction rounds): OPTIMIZE racing live DML is the AutoCompactor
    # deployment shape — compactions abort cleanly on conflict and are
    # logically no-ops, so the serial oracle below never sees them
    roles = [(w, SEED + w) for w in range(WRITERS)] + [(-4, 0)]
    results = [tmp_path / f"w{i}.json" for i in range(len(roles))]
    flag = ["part"] if partitioned else []
    procs = [
        subprocess.Popen(
            [sys.executable, str(Path(worker.__file__)), path, str(w),
             str(seed), str(results[i]), *flag],
            stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
        )
        for i, (w, seed) in enumerate(roles)
    ]
    errs = [p.communicate(timeout=600)[1] for p in procs]
    for w, p in enumerate(procs):
        assert p.returncode == 0, errs[w].decode()[-2000:]

    reports = [json.loads(r.read_text()) for r in results]
    programs = [p for p in reports if p["wid"] != "maintenance"]
    maint = next(p for p in reports if p["wid"] == "maintenance")

    # --- zero lost/doubled: versions contiguous, txn markers exactly-once
    vs = txlog.versions(t._log_dir)
    n_ops = sum(len(p["program"]) for p in programs)
    assert vs == list(range(setup_versions + n_ops + maint["compactions"]))
    seen: dict[tuple, int] = {}
    n_compact = 0
    for v in vs[setup_versions:]:
        doc = txlog.raw_doc(t._log_dir, v)
        txn = doc.get("txn")
        if not txn:
            # only the maintenance racer commits without a marker
            assert doc.get("operation") == "compact", f"v{v}: {doc.get('operation')}"
            n_compact += 1
            continue
        key = (txn["app"], txn["version"])
        seen[key] = seen.get(key, 0) + 1
    assert n_compact == maint["compactions"]
    assert all(c == 1 for c in seen.values()), {
        k: c for k, c in seen.items() if c != 1
    }  # no step committed twice
    for w, p in enumerate(programs):
        mine = {k[1] for k in seen if k[0] == f"dmlrace-w{w}"}
        assert mine == set(range(len(p["program"])))  # no step lost

    # --- convergence: serial replay of the same programs, writer by writer
    # (valid because every op is row-disjoint across writers — see worker)
    oracle = _setup(spark, str(tmp_path / "oracle"), partitioned)
    for p in programs:
        for i, o in enumerate(p["program"]):
            worker.apply_op(spark, oracle, o, p["wid"], i,
                            partitioned=partitioned)
    got = sorted((r.id, r.v) for r in t.read().collect())
    want = sorted((r.id, r.v) for r in oracle.read().collect())
    assert got == want

    # --- the racing writers really did contend for the shared file
    # (clean aborts absorbed by caller retry; 0 is legal on a quiet box,
    # but the shared-dir ops make it vanishingly unlikely — don't assert)
    print("partitioned:", partitioned,
          "aborts per writer:", [p["aborts"] for p in programs],
          "compactions:", maint["compactions"], "compact aborts:",
          maint["aborts"])

    # --- and the table is still healthy: time travel + vacuum + read_changes
    assert t.read(version=setup_versions - 1).count() == (
        worker.SHARED_HI - worker.SHARED_LO + 1 + WRITERS * worker.OWN_SPAN
    )
    t.vacuum(retain_hours=0.0)
    assert t.read().count() == len(want)


@pytest.mark.heavy
def test_os_process_dml_race_converges_to_serial_oracle(spark, tmp_path):
    _race(spark, tmp_path, partitioned=False)


@pytest.mark.heavy
def test_os_process_dml_race_partitioned(spark, tmp_path):
    _race(spark, tmp_path, partitioned=True)
