"""Identity columns (GENERATED ALWAYS AS IDENTITY): declared at overwrite,
assigned at write from a commit-recorded allocation watermark — unique and
monotonically increasing across commits, gaps allowed (Delta's exact
guarantee). Explicit values, UPDATEs of the column, and MERGE inserts are
refused, mirroring Delta's restrictions."""

from __future__ import annotations

import pytest

from pyspark_cdc_engine.tables import DeltaliteTable, MergeClause


def _mk(spark, path, n=6):
    t = DeltaliteTable(spark, str(path))
    t.overwrite(
        spark.range(n).selectExpr("id AS payload"),
        identity={"sk": {"start": 100, "step": 1}},
    )
    return t


def test_assignment_is_unique_and_monotonic_across_appends(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    first = [r.sk for r in t.read().collect()]
    assert len(set(first)) == len(first) and min(first) >= 100
    hi1 = t.identity_columns()["sk"]["high"]
    assert hi1 == max(first)
    t.append(spark.range(6, 9).selectExpr("id AS payload"))
    rows = [(r.payload, r.sk) for r in t.read().collect()]
    sks = [sk for _, sk in rows]
    assert len(set(sks)) == len(sks)          # unique across both writes
    second = [sk for p, sk in rows if p >= 6]
    assert min(second) > hi1                  # strictly after the watermark
    assert t.identity_columns()["sk"]["high"] == max(sks)


def test_watermark_survives_overwrite(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    hi1 = t.identity_columns()["sk"]["high"]
    t.overwrite(spark.range(3).selectExpr("id AS payload"))  # spec carried
    sks = [r.sk for r in t.read().collect()]
    assert min(sks) > hi1                     # counters never reset
    assert t.identity_columns()["sk"]["start"] == 100


def test_explicit_values_update_and_merge_insert_refused(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        t.append(spark.range(2).selectExpr("id AS payload", "id AS sk"))
    with pytest.raises(ValueError, match="identity column"):
        t.update({"sk": "sk + 1"}, "payload = 0")
    with pytest.raises(ValueError, match="insert clauses"):
        t.merge(
            spark.range(1).selectExpr("id AS payload"),
            "target.payload = source.payload",
            [MergeClause("insert", None, None)],
        )
    # update of a NON-identity column stays allowed
    t.update({"payload": "payload + 100"}, "payload = 0")
    assert t.read().filter("payload = 100").count() == 1


def test_concurrent_append_retry_aborts_instead_of_reusing_values(spark, tmp_path):
    """retries=0 (no reservation): a lost race surfaces as a plain
    ConcurrentWriteError and nothing lands — the caller re-runs to allocate
    from the new watermark."""
    from pyspark_cdc_engine.tables import ConcurrentWriteError

    t = _mk(spark, tmp_path / "t")
    rival = DeltaliteTable(spark, t.path)
    real = t._write_commit
    fired = {"n": 0}

    def race(*a, **kw):
        if fired["n"] == 0:
            fired["n"] += 1
            rival.append(spark.range(50, 53).selectExpr("id AS payload"))
        return real(*a, **kw)

    t._write_commit = race
    try:
        with pytest.raises(ConcurrentWriteError):
            t.append(spark.range(60, 62).selectExpr("id AS payload"))
    finally:
        t._write_commit = real
    # rival landed; uniqueness intact; re-running allocates past it
    t.append(spark.range(60, 62).selectExpr("id AS payload"))
    sks = [r.sk for r in t.read().collect()]
    assert len(set(sks)) == len(sks)


def test_concurrent_appends_with_retries_both_succeed_disjoint_ids(spark, tmp_path):
    """r7 (reserved-range allocation, Delta's identity semantics): with
    retries > 0 a writer RESERVES its id range in a metadata commit before
    staging, then allocates densely inside it — so a rival append landing
    mid-flight no longer aborts the write, and both writers' ids are
    disjoint (gaps allowed)."""
    t = _mk(spark, tmp_path / "t")
    rival = DeltaliteTable(spark, t.path)
    real = t._write_commit
    fired = {"n": 0}

    def race(*a, **kw):
        # fire the rival between our reservation and our data commit: the
        # first _write_commit call is the reservation — let it link, then
        # have the rival append (itself reserved-range) land in between
        out = real(*a, **kw)
        if fired["n"] == 0:
            fired["n"] += 1
            rival.append(
                spark.range(50, 53).selectExpr("id AS payload"), retries=2
            )
        return out

    t._write_commit = race
    try:
        t.append(spark.range(60, 62).selectExpr("id AS payload"), retries=3)
    finally:
        t._write_commit = real
    rows = [(r.payload, r.sk) for r in t.read().collect()]
    sks = [sk for _p, sk in rows]
    assert len(set(sks)) == len(sks), rows  # no collisions
    assert {p for p, _s in rows} == set(range(6)) | {50, 51, 52, 60, 61}
    # watermark covers every assigned id (no future collision either)
    assert t.identity_columns()["sk"]["high"] >= max(sks)
    # dense allocation: our 2-row batch consumed exactly its reserved range
    ours = sorted(sk for p, sk in rows if p in (60, 61))
    assert ours[1] == ours[0] + 1


def test_reserved_range_allocation_is_dense_within_batch(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    hi0 = t.identity_columns()["sk"]["high"]
    t.append(spark.range(10, 30).selectExpr("id AS payload"), retries=1)
    rows = sorted(r.sk for r in t.read().filter("payload >= 10").collect())
    # exactly the reserved range [hi0+1, hi0+20], no sparse jumps
    assert rows == list(range(hi0 + 1, hi0 + 21))
    assert t.identity_columns()["sk"]["high"] == hi0 + 20


def test_identity_partition_column_refused(spark, tmp_path):
    """Partition values live in dir names, not parquet columns — the
    watermark could never advance, so declaring one is refused loudly."""
    t = DeltaliteTable(spark, str(tmp_path / "p"))
    with pytest.raises(ValueError, match="partition column"):
        t.overwrite(
            spark.range(4).selectExpr("id AS payload"),
            identity={"sk": {"start": 1, "step": 1}},
            partition_by=["sk"],
        )


def test_merge_update_clause_cannot_assign_identity(spark, tmp_path):
    """merge() refuses UPDATE-clause assignments targeting a GENERATED
    ALWAYS AS IDENTITY column, mirroring the update() guard (r6 advice:
    previously only insert clauses were rejected)."""
    from pyspark_cdc_engine.tables import DeltaliteTable, MergeClause

    t = DeltaliteTable(spark, str(tmp_path / "t"))
    t.overwrite(
        spark.range(5).selectExpr("id AS k", "id * 2 AS v"),
        identity={"rid": {"start": 1, "step": 1}},
    )
    src = spark.range(2).selectExpr("id AS k", "id * 10 AS v")
    with pytest.raises(ValueError, match="MERGE-update identity"):
        t.merge(
            src,
            "target.k = source.k",
            [MergeClause("update", None, {"v": "source.v", "rid": "0"})],
        )
    # assignments NOT touching the identity column still merge fine
    t.merge(
        src,
        "target.k = source.k",
        [MergeClause("update", None, {"v": "source.v"})],
    )
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got[0] == 0 and got[1] == 10 and got[4] == 8


def test_failed_reservation_unpersists_the_staged_batch(spark, tmp_path, monkeypatch):
    """A reservation that exhausts its OCC retries must not leak the
    persisted batch (r7 left it cached on every failed concurrent append)."""
    from pyspark_cdc_engine.log import ConcurrentWriteError

    t = _mk(spark, tmp_path / "t")
    monkeypatch.setattr(
        t,
        "_write_commit",
        lambda *a, **k: (_ for _ in ()).throw(
            ConcurrentWriteError("simulated rival")
        ),
    )
    df = spark.range(5).selectExpr("id AS payload")
    with pytest.raises(ConcurrentWriteError, match="losing the commit race"):
        t._reserve_identity_range(df, retries=0)
    assert not df.storageLevel.useMemory and not df.storageLevel.useDisk
