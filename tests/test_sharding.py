"""Round-trip tests for the training-shard writer (write_training_shards).

The writer's contract (curation.py): deterministic md5 shard assignment,
within-shard pseudo-shuffle order recoverable from name-sorted part files,
and a position-weighted manifest checksum a consumer can re-derive.
"""

import glob
import hashlib
import os

import pyarrow.parquet as pq
import pytest

from pyspark_cdc_engine.operators.curation import (
    _FP_P,
    _SHARDS,
    ShardVerificationError,
    assert_training_shards_ok,
    shard_manifest,
    verify_training_shards,
    write_training_shards,
)
from tests.conftest import SF_DIR


def _md5_slices(doc_id: int) -> tuple[int, int]:
    h = hashlib.md5(str(doc_id).encode()).hexdigest()
    return int(h[0:12], 16), int(h[12:24], 16)


def _fp_term(pos: int, h1: int, okey: int) -> int:
    dochash = ((h1 % _FP_P) * 65537 + okey) % _FP_P
    return ((pos % _FP_P) * dochash) % _FP_P


def _read_shard_in_file_order(shard_dir: str):
    """Concat a shard's part files in lexicographic name order (the writer's
    documented consumption order)."""
    rows = []
    for f in sorted(glob.glob(os.path.join(shard_dir, "part-*.parquet"))):
        t = pq.read_table(f)
        rows.extend(t.to_pylist())
    return rows


@pytest.fixture(scope="module")
def written(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("shards") / "corpus")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    manifest = write_training_shards(docs, out, n_shards=_SHARDS)
    return out, docs, {r["shard"]: r.asDict() for r in manifest.collect()}


def test_assignment_and_coverage(written):
    out, docs, manifest = written
    n_in = docs.count()
    assert sum(m["n_docs"] for m in manifest.values()) == n_in
    seen = 0
    for shard, m in manifest.items():
        rows = _read_shard_in_file_order(os.path.join(out, f"shard={shard}"))
        assert len(rows) == m["n_docs"]
        seen += len(rows)
        for r in rows[:50]:
            h1, okey = _md5_slices(r["doc_id"])
            assert h1 % _SHARDS == shard
            assert r["_shard"] == shard
            assert r["_order_key"] == okey
    assert seen == n_in


def test_file_order_is_sample_order_and_fp_matches(written):
    out, _, manifest = written
    for shard, m in manifest.items():
        rows = _read_shard_in_file_order(os.path.join(out, f"shard={shard}"))
        keys = [(r["_order_key"], r["doc_id"]) for r in rows]
        assert keys == sorted(keys), f"shard {shard} not in pseudo-shuffle order"
        fp = 0
        for pos, r in enumerate(rows, start=1):
            h1, okey = _md5_slices(r["doc_id"])
            fp = (fp + _fp_term(pos, h1, okey)) % _FP_P
        assert fp == m["order_fp"], f"shard {shard} checksum mismatch"


def test_manifest_agrees_with_shard_manifest_query(spark, written):
    _, _, manifest = written
    report = {
        r["shard"]: r.asDict()
        for r in shard_manifest(spark, SF_DIR).collect()
    }
    assert set(report) == set(manifest)
    for shard, m in manifest.items():
        assert report[shard]["n_docs"] == m["n_docs"]
        assert report[shard]["order_fp"] == m["order_fp"]


def test_multiple_part_files_keep_global_order(spark, tmp_path):
    """Force >1 part file per shard: order must survive file splits."""
    out = str(tmp_path / "split")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    manifest = write_training_shards(docs, out, n_shards=2)
    for shard in (0, 1):
        files = sorted(glob.glob(os.path.join(out, f"shard={shard}", "part-*.parquet")))
        rows = _read_shard_in_file_order(os.path.join(out, f"shard={shard}"))
        keys = [(r["_order_key"], r["doc_id"]) for r in rows]
        assert keys == sorted(keys), f"{len(files)} files, order broken"
        m = {r["shard"]: r for r in manifest.collect()}[shard]
        assert len(rows) == m["n_docs"]


def test_epoch_seed_reshuffles_order_not_membership(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    m1 = write_training_shards(docs, str(tmp_path / "e1"), n_shards=4, epoch="ep1")
    m2 = write_training_shards(docs, str(tmp_path / "e2"), n_shards=4, epoch="ep2")

    def members(base):
        out = {}
        for shard in range(4):
            rows = _read_shard_in_file_order(os.path.join(base, f"shard={shard}"))
            out[shard] = [r["doc_id"] for r in rows]
        return out

    a, b = members(str(tmp_path / "e1")), members(str(tmp_path / "e2"))
    # identical shard MEMBERSHIP (epoch never moves a doc across shards) ...
    assert {s: sorted(v) for s, v in a.items()} == {s: sorted(v) for s, v in b.items()}
    # ... but a different within-shard order in at least most shards
    assert sum(a[s] != b[s] for s in a) >= 3
    # and the manifests agree on counts but not on order checksums
    c1 = {r["shard"]: r for r in m1.collect()}
    c2 = {r["shard"]: r for r in m2.collect()}
    assert all(c1[s]["n_docs"] == c2[s]["n_docs"] for s in c1)
    assert any(c1[s]["order_fp"] != c2[s]["order_fp"] for s in c1)


def test_reserved_columns_are_rejected(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    import pyspark.sql.functions as F

    with pytest.raises(ValueError, match="reserved shard-writer columns"):
        write_training_shards(
            docs.withColumn("shard", F.lit(1)), str(tmp_path / "x")
        )
    with pytest.raises(ValueError, match="reserved shard-writer columns"):
        write_training_shards(
            docs.withColumn("_order_key", F.lit(1)), str(tmp_path / "y")
        )


def test_epoch_seed_is_validated(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    with pytest.raises(ValueError, match="epoch seed"):
        write_training_shards(docs, str(tmp_path / "z"), epoch="bad'seed")
    with pytest.raises(ValueError, match="epoch seed"):
        write_training_shards(docs, str(tmp_path / "z"), epoch="back\\slash")


def test_verifier_passes_on_fresh_export(spark, written):
    out, _, manifest = written
    report = {r["shard"]: r.asDict() for r in verify_training_shards(spark, out).collect()}
    assert set(report) == set(manifest)
    for shard, r in report.items():
        assert r["ok"], f"fresh export failed verification at shard {shard}"
        assert r["n_docs_actual"] == manifest[shard]["n_docs"]
        assert r["order_fp_actual"] == manifest[shard]["order_fp"]
    assert_training_shards_ok(spark, out)  # must not raise


def test_verifier_passes_on_epoch_seeded_export(spark, tmp_path):
    """h1 in the checksum term is epoch-invariant, so one verifier covers
    every epoch's export without knowing the seed."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "ep")
    write_training_shards(docs, out, n_shards=4, epoch="ep7")
    assert all(r["ok"] for r in verify_training_shards(spark, out).collect())


def _corrupt_one_file(shard_dir: str, mutate):
    """Rewrite the first part file of a shard through pyarrow after applying
    ``mutate(rows) -> rows`` to its row dicts."""
    import pyarrow as pa

    f = sorted(glob.glob(os.path.join(shard_dir, "part-*.parquet")))[0]
    t = pq.read_table(f)
    rows = mutate(t.to_pylist())
    pq.write_table(pa.Table.from_pylist(rows, schema=t.schema), f)
    # drop Hadoop's CRC sidecar: the point is simulating a tampered file
    # the CHECKSUM layer does not catch, so the manifest layer must
    crc = os.path.join(os.path.dirname(f), f".{os.path.basename(f)}.crc")
    if os.path.exists(crc):
        os.remove(crc)


def test_verifier_catches_reordered_shard(spark, tmp_path):
    """Swapping two rows' _order_key values keeps membership and counts but
    re-pairs positions with the wrong doc hashes — the checksum must move."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "re")
    write_training_shards(docs, out, n_shards=2)

    def swap_keys(rows):
        assert len(rows) >= 2
        rows[0]["_order_key"], rows[1]["_order_key"] = (
            rows[1]["_order_key"],
            rows[0]["_order_key"],
        )
        return rows

    _corrupt_one_file(os.path.join(out, "shard=0"), swap_keys)
    report = {r["shard"]: r.asDict() for r in verify_training_shards(spark, out).collect()}
    assert not report[0]["ok"]
    assert report[0]["n_docs_expected"] == report[0]["n_docs_actual"]
    assert report[0]["order_fp_expected"] != report[0]["order_fp_actual"]
    assert report[1]["ok"], "untouched shard must still verify"
    with pytest.raises(ShardVerificationError, match="shard 0"):
        assert_training_shards_ok(spark, out)


def test_verifier_catches_dropped_row(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "drop")
    write_training_shards(docs, out, n_shards=2)
    _corrupt_one_file(os.path.join(out, "shard=1"), lambda rows: rows[1:])
    report = {r["shard"]: r.asDict() for r in verify_training_shards(spark, out).collect()}
    assert not report[1]["ok"]
    assert report[1]["n_docs_actual"] == report[1]["n_docs_expected"] - 1
    assert report[0]["ok"]


def test_verifier_catches_tampered_id(spark, tmp_path):
    """Changing a doc_id without touching _order_key moves h1 only — the
    membership count stays, the checksum must not."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "id")
    write_training_shards(docs, out, n_shards=2)

    def forge_id(rows):
        rows[0]["doc_id"] = rows[0]["doc_id"] + 10_000_000
        return rows

    _corrupt_one_file(os.path.join(out, "shard=0"), forge_id)
    report = {r["shard"]: r.asDict() for r in verify_training_shards(spark, out).collect()}
    assert not report[0]["ok"]
    assert report[0]["n_docs_expected"] == report[0]["n_docs_actual"]


def test_verifier_catches_moved_part_file(spark, tmp_path):
    """A part file physically moved between shard dirs carries a _shard
    column perfectly consistent with its own rows — trusting _shard would
    reproduce the original manifest and verify OK (r10 advisor finding).
    The verifier groups by the DIRECTORY key and re-derives membership from
    the id, so BOTH shards must fail: the source lost rows, the receiver
    gained rows that hash elsewhere (n_misplaced > 0)."""
    import shutil

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "mv")
    write_training_shards(docs, out, n_shards=2)
    src = sorted(glob.glob(os.path.join(out, "shard=0", "part-*.parquet")))[0]
    shutil.move(
        src, os.path.join(out, "shard=1", "smuggled-" + os.path.basename(src))
    )
    crc = os.path.join(os.path.dirname(src), f".{os.path.basename(src)}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    report = {
        r["shard"]: r.asDict()
        for r in verify_training_shards(spark, out, n_shards=2).collect()
    }
    assert not report[0]["ok"], "source shard lost rows"
    assert not report[1]["ok"], "receiving shard gained foreign rows"
    assert report[1]["n_misplaced"] > 0, (
        "moved rows must flag as misplaced — membership re-derived from the"
        " id, not the persisted _shard column"
    )
    with pytest.raises(ShardVerificationError, match="misplaced"):
        assert_training_shards_ok(spark, out, n_shards=2)


def test_verifier_infers_n_shards_from_manifest(spark, tmp_path):
    """Default n_shards (manifest row count) matches the writer's whenever
    every shard is non-empty — a fresh export verifies without the caller
    restating the shard count."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "infer")
    write_training_shards(docs, out, n_shards=4)
    report = verify_training_shards(spark, out).collect()
    assert len(report) == 4 and all(r["ok"] for r in report)


def test_verifier_reports_missing_shard_dir(spark, tmp_path):
    import shutil

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "gone")
    write_training_shards(docs, out, n_shards=2)
    shutil.rmtree(os.path.join(out, "shard=1"))
    report = {r["shard"]: r.asDict() for r in verify_training_shards(spark, out).collect()}
    assert not report[1]["ok"]
    assert report[1]["n_docs_actual"] is None


def test_max_records_per_file_splits_keep_order(spark, tmp_path):
    out = str(tmp_path / "cap")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    manifest = write_training_shards(
        docs, out, n_shards=2, max_records_per_file=5
    )
    m = {r["shard"]: r.asDict() for r in manifest.collect()}
    for shard in (0, 1):
        files = sorted(glob.glob(os.path.join(out, f"shard={shard}", "part-*.parquet")))
        assert len(files) > m[shard]["n_docs"] // 10, "cap did not split files"
        for f in files:
            assert pq.read_metadata(f).num_rows <= 5
        rows = _read_shard_in_file_order(os.path.join(out, f"shard={shard}"))
        keys = [(r["_order_key"], r["doc_id"]) for r in rows]
        assert keys == sorted(keys), "file splits broke name-sorted order"
        fp = 0
        for pos, r in enumerate(rows, start=1):
            h1, okey = _md5_slices(r["doc_id"])
            fp = (fp + _fp_term(pos, h1, okey)) % _FP_P
        assert fp == m[shard]["order_fp"]


def test_verifier_uses_persisted_n_shards_with_empty_shards(spark, tmp_path):
    """A tiny corpus exported with a large n_shards leaves some shards
    empty; the manifest only carries non-empty shards, so inferring the
    modulus from the row count would flag legitimate rows as misplaced.
    The writer persists n_shards in the manifest and the verifier reads
    it back (r11 ADVICE)."""
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(6)
    )
    out = str(tmp_path / "sparse")
    manifest = write_training_shards(docs, out, n_shards=64)
    assert "n_shards" in manifest.columns
    n_live = manifest.count()
    assert n_live < 64, "expected some empty shards in this scenario"
    report = verify_training_shards(spark, out).collect()
    assert len(report) == n_live
    assert all(r["ok"] for r in report), [r.asDict() for r in report]
    assert all(r["n_misplaced"] == 0 for r in report)
