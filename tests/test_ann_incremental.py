"""IncrementalIvfIndex: O(delta) assignment folding against frozen
centroids, full rebuild (with re-seeded centroids) on history rewrites,
and search-over-maintained-index correctness."""

import pytest
from pyspark.sql import functions as F

from pyspark_cdc_engine.operators.ann_incremental import (
    IncrementalIvfIndex,
    assign_to_centroids,
)
from pyspark_cdc_engine.tables import DeltaliteTable
from tests.conftest import SF_DIR


@pytest.fixture()
def corpus(spark, tmp_path):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    t = DeltaliteTable(spark, str(tmp_path / "embs"))
    t.overwrite(e.filter((F.col("vec_id") % 4 != 0) | (F.col("vec_id") < 16)))
    return t, e


def _assignments(idx):
    return sorted(
        (r["vec_id"], r["centroid_id"]) for r in idx.assign.read().collect()
    )


def test_incremental_fold_equals_rebuild(spark, corpus, tmp_path):
    t, e = corpus
    idx = IncrementalIvfIndex(spark, t, str(tmp_path / "ivf"))
    v0 = idx.refresh()
    assert v0 == t.latest_version()
    n_base = t.read().count()
    assert idx.assign.read().count() == n_base
    assert idx.cents.read().count() == 16

    t.append(e.filter((F.col("vec_id") % 4 == 0) & (F.col("vec_id") >= 16)))
    v1 = idx.refresh()
    assert v1 > v0
    # the fold appended exactly the delta's assignments ...
    assert idx.assign.read().count() == t.read().count()
    # ... and the result is row-identical to a from-scratch index over the
    # same table with the same (frozen) centroid seed
    fresh = IncrementalIvfIndex(spark, t, str(tmp_path / "ivf_fresh"))
    fresh.refresh()
    assert _assignments(idx) == _assignments(fresh)
    # idempotent: nothing new -> watermark unchanged, no extra rows
    assert idx.refresh() == v1
    assert idx.assign.read().count() == t.read().count()


def test_delete_folds_without_rebuild_or_retrain(spark, corpus, tmp_path):
    """A DELETE's tombstoned vec_ids are enumerable row-exactly from the
    change feed, so the refresh FOLDS them (one merge removing their
    assignment rows) — never a rebuild, never a centroid re-train (r10
    verdict ask #3)."""
    t, e = corpus
    idx = IncrementalIvfIndex(spark, t, str(tmp_path / "ivf"))
    idx.refresh()
    cents_before = sorted(
        (r["centroid_id"], tuple(float(x) for x in r["cemb"]))
        for r in idx.cents.read().collect()
    )

    def boom(upto):
        raise AssertionError("delete must fold, not rebuild")

    idx._rebuild = boom
    t.delete("vec_id % 10 = 3")  # predicate cow delete: feed-exact
    v = idx.refresh()
    assert v == t.latest_version()
    live = {r["vec_id"] for r in t.read().select("vec_id").collect()}
    indexed = {r["vec_id"] for r in idx.assign.read().collect()}
    assert indexed == live, "fold must drop deleted vectors"
    cents_after = sorted(
        (r["centroid_id"], tuple(float(x) for x in r["cemb"]))
        for r in idx.cents.read().collect()
    )
    assert cents_after == cents_before, "centroids stay FROZEN on a fold"
    # and the folded table is row-identical to a from-scratch assignment of
    # the post-delete snapshot against the SAME frozen centroids (a fresh
    # index would re-seed from the smaller snapshot — different contract)
    want = sorted(
        (r["vec_id"], r["centroid_id"])
        for r in assign_to_centroids(t.read(), idx.centroids()).collect()
    )
    assert _assignments(idx) == want


def test_dv_update_folds_as_reassignment(spark, corpus, tmp_path):
    """A DV UPDATE's pre/post images fold as re-assignments: the updated
    vectors' rows move to their new nearest centroid without touching the
    rest of the table."""
    t, e = corpus
    idx = IncrementalIvfIndex(spark, t, str(tmp_path / "ivf"))
    idx.refresh()
    idx._rebuild = lambda upto: (_ for _ in ()).throw(
        AssertionError("update must fold")
    )
    t.update(
        {"embedding": "transform(embedding, x -> CAST(-x AS FLOAT))"},
        "vec_id % 7 = 2",
        mode="dv",
    )
    idx.refresh()
    # row-identical to a from-scratch assignment of the post-update
    # snapshot against the SAME frozen (pre-update-seeded) centroids
    want = sorted(
        (r["vec_id"], r["centroid_id"])
        for r in assign_to_centroids(t.read(), idx.centroids()).collect()
    )
    assert _assignments(idx) == want


def test_restore_forces_rebuild(spark, corpus, tmp_path):
    """RESTORE rewinds history the feed cannot express — the refresh must
    fall back to one full rebuild (with re-trained centroids)."""
    t, e = corpus
    v0 = t.latest_version()
    t.append(e.filter((F.col("vec_id") % 4 == 0) & (F.col("vec_id") >= 16)))
    idx = IncrementalIvfIndex(spark, t, str(tmp_path / "ivf"))
    idx.refresh()
    t.restore(v0)
    idx.refresh()
    live = {r["vec_id"] for r in t.read().select("vec_id").collect()}
    indexed = {r["vec_id"] for r in idx.assign.read().collect()}
    assert indexed == live, "rebuild must reflect the restored snapshot"
    last_fold = [
        c for c in idx.assign.history() if c["operation"] != "refresh"
    ][0]
    assert last_fold["operation"] == "overwrite"


def test_search_matches_multiprobe_kernel(spark, corpus, tmp_path):
    """On a fully-indexed corpus, search == the registered from-scratch
    multiprobe kernel (same panel, k, nprobe, tie-breaks)."""
    from pyspark_cdc_engine.operators.dedup_scale import ann_ivf_multiprobe

    t, e = corpus
    t.append(e.filter((F.col("vec_id") % 4 == 0) & (F.col("vec_id") >= 16)))
    idx = IncrementalIvfIndex(spark, t, str(tmp_path / "ivf"))
    idx.refresh()
    queries = (
        t.read()
        .filter(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qemb"))
    )
    got = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in idx.search(queries).collect()
    )
    want = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in ann_ivf_multiprobe(spark, SF_DIR).collect()
    )
    assert got == want


def test_assign_to_centroids_tie_breaks_low_id(spark):
    """Equal similarity must pick the LOWEST centroid_id (the oracle's
    window tie-break)."""
    vecs = spark.createDataFrame(
        [(100, [1.0, 0.0])], ["vec_id", "embedding"]
    )
    cents = spark.createDataFrame(
        [(2, [2.0, 0.0]), (1, [3.0, 0.0])], ["centroid_id", "cemb"]
    )
    got = assign_to_centroids(vecs, cents).collect()
    assert [(r["vec_id"], r["centroid_id"]) for r in got] == [(100, 1)]


def test_ivf_index_as_streaming_maintain_hook(spark, tmp_path):
    """IncrementalIvfIndex satisfies the duck-typed post-commit maintain
    contract (watermark-idempotent refresh()): plugged into the generic
    ingest stream, every micro-batch's vectors fold into the inverted
    lists O(delta), and the maintained index stays row-identical to a
    from-scratch rebuild."""
    import json as _json

    from pyspark_cdc_engine.streaming.pipeline import documents_ingest_stream

    e = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .limit(60)
    )
    t = DeltaliteTable(spark, str(tmp_path / "embs"))
    t.overwrite(e.filter("vec_id < 30"))
    idx = IncrementalIvfIndex(spark, t, str(tmp_path / "ivf"))
    idx.refresh()

    src_dir = tmp_path / "incoming"
    src_dir.mkdir()
    rest = e.filter("vec_id >= 30").collect()
    half = len(rest) // 2
    for i, part in enumerate((rest[:half], rest[half:])):
        with open(src_dir / f"batch{i}.json", "w") as fh:
            for r in part:
                fh.write(
                    _json.dumps(
                        {"vec_id": r.vec_id,
                         "embedding": [float(x) for x in r.embedding]}
                    ) + "\n"
                )

    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", "1")
        .json(str(src_dir))
    )
    q = documents_ingest_stream(
        spark, stream, t, str(tmp_path / "ck"), maintain=[idx]
    )
    q.awaitTermination(180)

    assert t.read().count() == 60
    assert idx.assign.read().count() == 60
    fresh = IncrementalIvfIndex(spark, t, str(tmp_path / "ivf_fresh"))
    fresh.refresh()
    assert _assignments(idx) == _assignments(fresh)


# ---------------------------------------------------------------- PQ codes
@pytest.fixture()
def pq_corpus(spark, tmp_path):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    t = DeltaliteTable(spark, str(tmp_path / "pq_embs"))
    t.overwrite(e.filter((F.col("vec_id") % 4 != 0) | (F.col("vec_id") < 8)))
    return t, e


def _codes(idx):
    return sorted(
        (r["vec_id"], r["m"], r["code"]) for r in idx.codes.read().collect()
    )


def test_pq_incremental_fold_equals_rebuild(spark, pq_corpus, tmp_path):
    """An appended delta folds as encode-only against the FROZEN trained
    codebooks — row-identical to a from-scratch index over the same table
    trained on the same base? No: a fresh index trains on the grown
    corpus, so the comparison is against encode_pq with the INCREMENTAL
    index's own codebook (the correctness anchor: a code depends only on
    the vector and the codebook)."""
    from pyspark_cdc_engine.operators.ann_incremental import (
        IncrementalPqCodes,
        encode_pq,
    )

    t, e = pq_corpus
    idx = IncrementalPqCodes(spark, t, str(tmp_path / "pq"), n_iters=1)
    v0 = idx.refresh()
    assert idx.codes.read().count() == t.read().count() * 4
    cb_before = sorted(map(tuple, idx.cb.read().collect()))

    t.append(e.filter((F.col("vec_id") % 4 == 0) & (F.col("vec_id") >= 8)))
    v1 = idx.refresh()
    assert v1 > v0
    # codebook FROZEN across the fold
    assert sorted(map(tuple, idx.cb.read().collect())) == cb_before
    # maintained codes == from-scratch encode against the same codebook
    scratch = encode_pq(t.read().select("vec_id", "embedding"), idx.cb.read())
    want = sorted(
        (r["vec_id"], r["m"], r["code"]) for r in scratch.collect()
    )
    assert _codes(idx) == want
    assert idx.refresh() == v1  # idempotent


def test_pq_delete_and_update_fold(spark, pq_corpus, tmp_path):
    from pyspark_cdc_engine.operators.ann_incremental import (
        IncrementalPqCodes,
        encode_pq,
    )

    t, e = pq_corpus
    idx = IncrementalPqCodes(spark, t, str(tmp_path / "pq"), n_iters=0)
    idx.refresh()
    cb_before = sorted(map(tuple, idx.cb.read().collect()))
    t.delete("vec_id % 5 = 2 AND vec_id >= 8", mode="dv")
    t.update({"embedding": "reverse(embedding)"}, "vec_id = 9", mode="dv")
    idx.refresh()
    assert sorted(map(tuple, idx.cb.read().collect())) == cb_before
    scratch = encode_pq(t.read().select("vec_id", "embedding"), idx.cb.read())
    assert _codes(idx) == sorted(
        (r["vec_id"], r["m"], r["code"]) for r in scratch.collect()
    )


def test_pq_overwrite_forces_retrain_rebuild(spark, pq_corpus, tmp_path):
    from pyspark_cdc_engine.operators.ann_incremental import (
        IncrementalPqCodes,
    )

    t, e = pq_corpus
    idx = IncrementalPqCodes(spark, t, str(tmp_path / "pq"), n_iters=1)
    idx.refresh()
    cb_before = sorted(map(tuple, idx.cb.read().collect()))
    # an overwrite changes the corpus shape -> rebuild with RE-TRAINED books
    t.overwrite(e.filter(F.col("vec_id") < 100))
    idx.refresh()
    assert idx.codes.read().count() == t.read().count() * 4
    assert sorted(map(tuple, idx.cb.read().collect())) != cb_before


def test_pq_search_matches_adc_over_codes(spark, pq_corpus, tmp_path):
    """ADC search over the maintained index == the certified pq_search
    derivation: per-query distance table against the SAME codebook,
    per-neighbor sum over its codes, (adist, neighbor) tie-break."""
    from pyspark_cdc_engine.operators.ann_incremental import (
        IncrementalPqCodes,
    )
    from pyspark_cdc_engine.operators.dedup_scale import _pq_d2_vs

    t, e = pq_corpus
    idx = IncrementalPqCodes(spark, t, str(tmp_path / "pq"), n_iters=1)
    idx.refresh()
    queries = t.read().filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qemb")
    )
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in idx.search(queries, k=3).collect()
    }
    # independent derivation through the library kernels
    qex = queries.select(
        F.col("query_id").alias("vec_id"),
        F.posexplode("qemb").alias("pos", "val"),
    ).withColumn("val", F.col("val").cast("double"))
    dtab = _pq_d2_vs(qex, idx.cb.read()).select(
        F.col("vec_id").alias("qid"), F.col("m").alias("qm"),
        F.col("k").alias("qk"), F.col("dist2").alias("qd2"),
    )
    rows = (
        idx.codes.read()
        .join(dtab, (F.col("m") == F.col("qm")) & (F.col("code") == F.col("qk")))
        .filter(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", "vec_id")
        .agg(F.sum("qd2").cast("double").alias("adist"))
        .collect()
    )
    import collections

    per_q = collections.defaultdict(list)
    for r in rows:
        per_q[r["qid"]].append((r["adist"], r["vec_id"]))
    for qid, pairs in per_q.items():
        for rank, (_, nid) in enumerate(sorted(pairs)[:3], start=1):
            assert got[(qid, rank)] == nid, (qid, rank)
