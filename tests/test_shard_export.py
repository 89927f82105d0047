"""Incremental training-shard export (ShardExporter) against a live
deltalite corpus table: O(delta) generations for append windows, full
re-export with superseded generations on history rewrites, and the
union-of-live-generations == snapshot invariant throughout.
"""

import glob
import os

import pytest

from pyspark_cdc_engine.operators.curation import ShardExporter
from pyspark_cdc_engine.tables import DeltaliteTable
from tests.conftest import SF_DIR


@pytest.fixture()
def corpus(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    t = DeltaliteTable(spark, str(tmp_path / "corpus"))
    t.overwrite(docs.filter("doc_id < 30"))
    return t, docs


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_base_then_incremental_generations(spark, corpus, tmp_path):
    t, docs = corpus
    ex = ShardExporter(spark, t, str(tmp_path / "shards"), n_shards=4)

    v0 = ex.refresh()
    assert v0 == t.latest_version()
    assert _ids(ex.live_docs()) == _ids(t.read())
    gens0 = ex._state()["generations"]
    assert gens0 == [v0]

    # append-only window -> ONE new generation holding exactly the delta
    t.append(docs.filter("doc_id >= 30 AND doc_id < 40"))
    t.append(docs.filter("doc_id >= 40 AND doc_id < 45"))
    v1 = ex.refresh()
    assert v1 == t.latest_version() and v1 > v0
    st = ex._state()
    assert st["generations"] == [v0, v1] and st["superseded"] == []
    delta = spark.read.parquet(ex._gen_dir(v1))
    assert _ids(delta) == list(range(30, 45))
    assert _ids(ex.live_docs()) == _ids(t.read())

    # no new commits -> watermark unchanged, no new generation
    assert ex.refresh() == v1
    assert ex._state()["generations"] == [v0, v1]


def test_rewrite_forces_full_reexport(spark, corpus, tmp_path):
    t, docs = corpus
    ex = ShardExporter(spark, t, str(tmp_path / "shards"), n_shards=4)
    v0 = ex.refresh()
    t.append(docs.filter("doc_id >= 30 AND doc_id < 40"))
    v1 = ex.refresh()

    t.delete("doc_id % 7 = 0")
    v2 = ex.refresh()
    st = ex._state()
    assert st["generations"] == [v2]
    assert sorted(st["superseded"]) == [v0, v1]
    assert _ids(ex.live_docs()) == _ids(t.read())
    assert all(i % 7 != 0 for i in _ids(ex.live_docs()))


def test_generation_layout_is_write_training_shards(spark, corpus, tmp_path):
    t, _ = corpus
    ex = ShardExporter(spark, t, str(tmp_path / "shards"), n_shards=4)
    v0 = ex.refresh()
    gen = ex._gen_dir(v0)
    shard_dirs = sorted(glob.glob(os.path.join(gen, "shard=*")))
    assert shard_dirs, "no shard dirs written"
    manifest = spark.read.parquet(gen + "/_manifest")
    assert set(manifest.columns) == {"shard", "n_docs", "order_fp", "n_shards"}
    assert manifest.agg({"n_docs": "sum"}).collect()[0][0] == t.read().count()


def test_crash_replay_converges(spark, corpus, tmp_path):
    """A retry after the data write but before the state advance must
    converge: re-running refresh() overwrites gen=<v> deterministically."""
    t, docs = corpus
    ex = ShardExporter(spark, t, str(tmp_path / "shards"), n_shards=4)
    ex.refresh()
    t.append(docs.filter("doc_id >= 30 AND doc_id < 40"))

    # simulate the crash window: data written, state not yet advanced
    state_before = ex._state()
    v1 = ex.refresh()
    ex._write_state(state_before)  # roll the state file back

    assert ex.refresh() == v1  # replay
    st = ex._state()
    assert st["generations"] == sorted(set(st["generations"]))
    assert _ids(ex.live_docs()) == _ids(t.read())


def test_shard_exporter_as_streaming_maintain_hook(spark, tmp_path):
    """ShardExporter satisfies the duck-typed post-commit maintain contract
    (watermark-idempotent refresh()): plugged into documents_ingest_stream,
    every micro-batch commit lands as one O(delta) shard generation and the
    union of live generations tracks the table snapshot."""
    import json as _json

    from pyspark_cdc_engine.streaming.pipeline import documents_ingest_stream

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
        .limit(60)
    )
    t = DeltaliteTable(spark, str(tmp_path / "docs"))
    t.overwrite(docs.filter("doc_id % 3 = 0"))
    ex = ShardExporter(spark, t, str(tmp_path / "shards"), n_shards=4)
    ex.refresh()

    src_dir = tmp_path / "incoming"
    src_dir.mkdir()
    rest = docs.filter("doc_id % 3 != 0").collect()
    half = len(rest) // 2
    for i, part in enumerate((rest[:half], rest[half:])):
        with open(src_dir / f"batch{i}.json", "w") as fh:
            for r in part:
                fh.write(_json.dumps({"doc_id": r.doc_id, "text": r.text}) + "\n")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src_dir))
    )
    q = documents_ingest_stream(
        spark, stream, t, str(tmp_path / "ck"), maintain=[ex]
    )
    q.awaitTermination(180)

    assert t.read().count() == 60
    st = ex._state()
    assert len(st["generations"]) == 3  # base + one gen per micro-batch
    assert st["superseded"] == []
    assert _ids(ex.live_docs()) == _ids(t.read())


def test_drop_column_in_window_forces_full_reexport(spark, corpus, tmp_path):
    """drop_column makes the upto-side column set BLIND to the dropped name;
    the gate must still rebuild (earlier generations shipped the column —
    folding would union-break live_docs)."""
    t, docs = corpus
    ex = ShardExporter(spark, t, str(tmp_path / "shards"), n_shards=4)
    v0 = ex.refresh()
    t.drop_column("lang")
    t.append(
        docs.filter("doc_id >= 30 AND doc_id < 35").drop("lang")
    )
    v2 = ex.refresh()
    st = ex._state()
    assert st["generations"] == [v2]
    assert v0 in st["superseded"]
    live = ex.live_docs()
    assert "lang" not in live.columns
    assert _ids(live) == _ids(t.read())


def test_orphaned_generation_is_adopted_as_superseded(spark, corpus, tmp_path):
    """Crash after the gen write but before the state advance, then NEW
    commits before the retry: the unrecorded gen dir must land in
    superseded, not float unreferenced."""
    t, docs = corpus
    ex = ShardExporter(spark, t, str(tmp_path / "shards"), n_shards=4)
    v0 = ex.refresh()

    t.append(docs.filter("doc_id >= 30 AND doc_id < 35"))
    state_before = ex._state()
    v1 = ex.refresh()           # writes gen=v1 ...
    ex._write_state(state_before)  # ... crash: state never advanced

    t.append(docs.filter("doc_id >= 35 AND doc_id < 40"))  # new commit
    v2 = ex.refresh()
    st = ex._state()
    assert v2 > v1
    assert v1 in st["superseded"]          # the orphan is now governed
    assert st["generations"] == [v0, v2]
    assert _ids(ex.live_docs()) == _ids(t.read())


def test_live_docs_before_any_refresh_raises(spark, corpus, tmp_path):
    t, _ = corpus
    ex = ShardExporter(spark, t, str(tmp_path / "shards"))
    with pytest.raises(ValueError, match="nothing exported yet"):
        ex.live_docs()


def test_dv_delete_also_forces_full_reexport(spark, corpus, tmp_path):
    """A deletion-vector delete preserves FILES but not rows — it must
    classify as a rewrite (append-only shards can't subtract)."""
    t, _ = corpus
    ex = ShardExporter(spark, t, str(tmp_path / "shards"), n_shards=4)
    v0 = ex.refresh()
    t.delete("doc_id % 5 = 0", mode="dv")
    v1 = ex.refresh()
    st = ex._state()
    assert st["generations"] == [v1] and v0 in st["superseded"]
    ids = _ids(ex.live_docs())
    assert ids == _ids(t.read()) and all(i % 5 != 0 for i in ids)


def test_gc_superseded_removes_only_stale_generations(spark, corpus, tmp_path):
    t, docs = corpus
    ex = ShardExporter(spark, t, str(tmp_path / "shards"), n_shards=4)
    v0 = ex.refresh()
    t.append(docs.filter("doc_id >= 30 AND doc_id < 35"))
    v1 = ex.refresh()
    t.delete("doc_id % 7 = 0")   # forces full re-export: v0, v1 superseded
    v2 = ex.refresh()

    removed = ex.gc_superseded()
    assert sorted(removed) == [v0, v1]
    assert not os.path.exists(ex._gen_dir(v0))
    assert not os.path.exists(ex._gen_dir(v1))
    assert os.path.exists(ex._gen_dir(v2))
    st = ex._state()
    assert st["superseded"] == [] and st["generations"] == [v2]
    assert _ids(ex.live_docs()) == _ids(t.read())


def test_exporter_forwards_file_cap_to_generations(spark, corpus, tmp_path):
    t, _ = corpus
    ex = ShardExporter(
        spark, t, str(tmp_path / "shards"), n_shards=2, max_records_per_file=4
    )
    v0 = ex.refresh()
    for shard in (0, 1):
        for f in glob.glob(os.path.join(ex._gen_dir(v0), f"shard={shard}", "part-*.parquet")):
            import pyarrow.parquet as pq
            assert pq.read_metadata(f).num_rows <= 4


def test_pruned_watermark_falls_back_to_full_reexport(spark, corpus, tmp_path):
    """ADVICE r9 (medium): cleanup_log pruning the watermark version makes
    the fold-safety schema introspection itself raise (state_at has no
    commit at `since`) — refresh() must reach the documented full-re-export
    fallback instead of crashing before it."""
    t, docs = corpus
    ex = ShardExporter(spark, t, str(tmp_path / "shards"), n_shards=4)
    v0 = ex.refresh()
    for i in range(24):  # v1..v24; deltalite checkpoints every 20 commits
        t.append(docs.filter(f"doc_id = {30 + i}"))
    assert t.cleanup_log(retain_last=4)
    assert t._oldest_retained() > v0  # the watermark version is gone

    v = ex.refresh()  # must not raise
    st = ex._state()
    assert v == t.latest_version()
    assert st["generations"] == [v]
    assert v0 in st["superseded"]
    assert _ids(ex.live_docs()) == _ids(t.read())


def test_delete_all_rows_exports_empty_corpus(spark, corpus, tmp_path):
    """ADVICE r9 (medium, second half): an EMPTY snapshot at the window end
    raises ValueError('empty table at version N') from read() — the
    exporter converges on an empty corpus (all generations superseded,
    watermark advanced) and recovers when rows come back."""
    t, docs = corpus
    ex = ShardExporter(spark, t, str(tmp_path / "shards"), n_shards=4)
    v0 = ex.refresh()

    t.delete("doc_id >= 0")  # rewrite window ending on an empty snapshot
    v1 = ex.refresh()  # must not raise
    st = ex._state()
    assert v1 == t.latest_version()
    assert st["generations"] == []
    assert v0 in st["superseded"]
    with pytest.raises(ValueError):
        ex.live_docs()

    # corpus comes back: the next window's `since` side is the empty
    # snapshot (read(version=since) raises) -> full re-export, fresh base
    t.append(docs.filter("doc_id < 10"))
    v2 = ex.refresh()
    assert v2 == t.latest_version()
    assert ex._state()["generations"] == [v2]
    assert _ids(ex.live_docs()) == _ids(t.read())


def test_verify_after_export_lifecycle(spark, corpus, tmp_path):
    """verify=True re-checks every generation through the consumer verifier
    at both export call sites (full re-export AND incremental fold) and
    raises ShardVerificationError on a tampered generation."""
    from pyspark_cdc_engine.operators.curation import (
        ShardVerificationError,
        verify_training_shards,
    )

    t, docs = corpus
    ex = ShardExporter(
        spark, t, str(tmp_path / "shards"), n_shards=4, verify=True
    )
    v0 = ex.refresh()  # full export path, verified
    t.append(docs.filter("doc_id >= 30 AND doc_id < 40"))
    v1 = ex.refresh()  # incremental fold path, verified
    t.delete("doc_id % 5 = 0")
    v2 = ex.refresh()  # rewrite -> full re-export path, verified
    assert ex._state()["generations"] == [v2]

    # tamper with the live generation's manifest: verifier must refuse
    import pyarrow as pa
    import pyarrow.parquet as pq

    mdir = ex._gen_dir(v2) + "/_manifest"
    f = sorted(glob.glob(os.path.join(mdir, "part-*.parquet")))[0]
    tbl = pq.read_table(f)
    rows = tbl.to_pylist()
    rows[0]["order_fp"] = (rows[0]["order_fp"] + 1) % 2_147_483_647
    pq.write_table(pa.Table.from_pylist(rows, schema=tbl.schema), f)
    crc = os.path.join(os.path.dirname(f), f".{os.path.basename(f)}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    report = verify_training_shards(spark, ex._gen_dir(v2))
    assert report.filter("NOT ok").count() == 1
    with pytest.raises(ShardVerificationError):
        from pyspark_cdc_engine.operators.curation import (
            assert_training_shards_ok,
        )

        assert_training_shards_ok(spark, ex._gen_dir(v2))
