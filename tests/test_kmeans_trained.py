"""Trained IVF coarse quantizer (train_kmeans): seed convention,
composition with kmeans_update_step, Lloyd's monotone distortion, and
trained centroids inside IncrementalIvfIndex."""

import pytest
from pyspark.sql import functions as F

from pyspark_cdc_engine.operators.ann_incremental import (
    IncrementalIvfIndex,
    assign_to_centroids,
)
from pyspark_cdc_engine.operators.dedup_scale import (
    _IVF_C,
    _KM_ITERS,
    _train_kmeans_history,
    kmeans_distortion_report,
    kmeans_update_step,
    train_kmeans,
)
from pyspark_cdc_engine.tables import DeltaliteTable
from tests.conftest import SF_DIR


@pytest.fixture()
def vecs(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _cent_map(cents_df):
    return {
        r["centroid_id"]: [float(x) for x in r["cemb"]]
        for r in cents_df.collect()
    }


def test_zero_iters_is_the_first_c_seed(spark, vecs):
    """n_iters=0 IS the training-free convention every first-C kernel
    uses: centroid_id i holds the i-th lowest vec_id's embedding."""
    got = _cent_map(train_kmeans(vecs, n_iters=0))
    first = {
        i: [float(x) for x in r["embedding"]]
        for i, r in enumerate(
            vecs.orderBy("vec_id").limit(_IVF_C).collect()
        )
    }
    assert got == first


def test_one_iter_composes_kmeans_update_step(spark, vecs):
    """cent1 must be EXACTLY the registered kmeans_update_step output
    (same assignment kernel, same decimal-exact means) — the trainer is
    the certified step iterated, not a reimplementation."""
    cent1 = _cent_map(_train_kmeans_history(vecs, _IVF_C, 1)[1])
    step = kmeans_update_step(spark, SF_DIR).collect()
    want = {}
    for r in step:
        want.setdefault(r["centroid_id"], {})[r["pos"]] = r["new_val"]
    for cid, dims in want.items():
        expect = [dims[p] for p in sorted(dims)]
        assert cent1[cid] == expect, f"centroid {cid} diverges from step"
    # clusters the step never saw (empty) keep their seed embedding
    seed = _cent_map(train_kmeans(vecs, n_iters=0))
    for cid in set(seed) - set(want):
        assert cent1[cid] == seed[cid]


def test_distortion_is_monotone_nondecreasing(spark):
    """Lloyd's monotonicity on the spherical objective: mean cosine to the
    assigned centroid never drops across iterations (tiny epsilon for the
    fixed-point argmax resolution)."""
    rows = sorted(
        kmeans_distortion_report(spark, SF_DIR).collect(),
        key=lambda r: r["iter"],
    )
    assert [r["iter"] for r in rows] == list(range(_KM_ITERS + 1))
    assert len({r["n_vectors"] for r in rows}) == 1
    for a, b in zip(rows, rows[1:]):
        assert b["mean_sim"] >= a["mean_sim"] - 1e-9, (
            f"distortion regressed at iter {b['iter']}: "
            f"{a['mean_sim']} -> {b['mean_sim']}"
        )
    assert rows[-1]["mean_sim"] > rows[0]["mean_sim"], (
        "training must actually improve the seed on this corpus"
    )


def test_trained_pq_reduces_reconstruction_error(spark):
    """Lloyd's monotonicity per subspace: the trained codebooks' total
    quantization error must be <= the first-K seed's (iteration 0), and
    strictly better on this corpus. Codes stay the pq_encode contract."""
    from pyspark_cdc_engine.operators.dedup_scale import (
        pq_encode,
        pq_trained_encode,
    )

    e0 = {
        r["vec_id"]: r["recon_err"]
        for r in pq_encode(spark, SF_DIR).collect()
    }
    et = {
        r["vec_id"]: r["recon_err"]
        for r in pq_trained_encode(spark, SF_DIR).collect()
    }
    assert set(e0) == set(et)
    assert sum(et.values()) < sum(e0.values()), (
        "training must reduce total quantization error"
    )


def test_sampled_pq_training_retains_quality(spark):
    """The sampled trainer (the 100 TB path) must still beat the
    training-free seed on FULL-corpus reconstruction error, and its
    training subset must be exactly seeds + every stride-th vector (the
    codebook differs from full-corpus training only through that
    restriction)."""
    from pyspark_cdc_engine.operators.dedup_scale import (
        _PQ_STRIDE,
        pq_encode,
        pq_trained_encode_sampled,
    )

    e0 = sum(r["recon_err"] for r in pq_encode(spark, SF_DIR).collect())
    es = sum(
        r["recon_err"]
        for r in pq_trained_encode_sampled(spark, SF_DIR).collect()
    )
    assert es < e0, (
        f"sampled training must still reduce total quantization error "
        f"(stride={_PQ_STRIDE}): seed {e0} vs sampled-trained {es}"
    )


def test_trained_incremental_index_matches_direct_training(spark, vecs, tmp_path):
    """train_iters>0 trains at build, then folds stay O(delta) against the
    FROZEN trained centroids: the incrementally-built assignment table is
    row-identical to a from-scratch assignment of the full corpus against
    the same trained set."""
    t = DeltaliteTable(spark, str(tmp_path / "embs"))
    base = vecs.filter((F.col("vec_id") % 4 != 0) | (F.col("vec_id") < 16))
    t.overwrite(base)
    idx = IncrementalIvfIndex(
        spark, t, str(tmp_path / "ivf"), train_iters=2
    )
    idx.refresh()
    # the persisted centroids are exactly train_kmeans over the base snapshot
    want_cents = _cent_map(train_kmeans(base, _IVF_C, 2))
    assert _cent_map(idx.centroids()) == want_cents

    t.append(vecs.filter((F.col("vec_id") % 4 == 0) & (F.col("vec_id") >= 16)))
    idx.refresh()
    got = sorted(
        (r["vec_id"], r["centroid_id"]) for r in idx.assign.read().collect()
    )
    want = sorted(
        (r["vec_id"], r["centroid_id"])
        for r in assign_to_centroids(t.read(), idx.centroids()).collect()
    )
    assert got == want
    # centroids did NOT retrain on the fold (frozen contract)
    assert _cent_map(idx.centroids()) == want_cents

    # search returns k ranked rows per query, never the query itself
    queries = (
        t.read()
        .filter(F.col("vec_id") < 4)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qemb"),
        )
    )
    res = idx.search(queries, k=5).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r)
        assert r["neighbor_id"] != r["query_id"]
    for q, rows in by_q.items():
        assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))


def test_sampled_training_trains_on_the_stride_subset(spark, vecs):
    """sample_stride=S trains on exactly {vec_id < C or vec_id % S == 0}:
    sampled train_kmeans equals full train_kmeans over that pre-filtered
    frame, and differs from full-corpus training (it saw fewer vectors)."""
    stride = 3
    subset = vecs.filter(
        (F.col("vec_id") < _IVF_C) | (F.col("vec_id") % stride == 0)
    )
    sampled = _cent_map(train_kmeans(vecs, sample_stride=stride))
    explicit = _cent_map(train_kmeans(subset))
    assert sampled == explicit
    full = _cent_map(train_kmeans(vecs))
    assert sampled != full, "stride sample should differ from full training"


def test_sampled_seed_is_stride_invariant(spark, vecs):
    """The seed (n_iters=0) is identical under any stride — the first C
    vec_ids are always in the sample."""
    a = _cent_map(train_kmeans(vecs, n_iters=0, sample_stride=7))
    b = _cent_map(train_kmeans(vecs, n_iters=0))
    assert a == b


def test_sampled_training_still_improves_full_corpus_distortion(spark):
    """The FAISS claim the sampled path rests on: centroids trained on the
    stride subset still lower full-corpus distortion vs the seed. Uses the
    registry query so the exact certified numbers are what's asserted."""
    from pyspark_cdc_engine.operators.dedup_scale import (
        kmeans_sampled_quality,
    )

    row = kmeans_sampled_quality(spark, SF_DIR).collect()[0]
    assert row["n_train"] < row["n_vectors"]
    assert row["mean_sim_sampled"] > row["mean_sim_seed"]


@pytest.mark.heavy
def test_heldout_panel_is_disjoint_from_seeds(spark):
    """ann_trained_recall_heldout's panel must never overlap the first-C
    seed centroids (the r11 eval-honesty finding)."""
    from pyspark_cdc_engine.operators.dedup_scale import (
        _HELD_HI,
        _HELD_LO,
        _IVF_QUERIES,
        ann_trained_recall_heldout,
    )

    assert _HELD_LO >= _IVF_C
    assert _HELD_HI - _HELD_LO == _IVF_QUERIES
    rows = ann_trained_recall_heldout(spark, SF_DIR).collect()
    ids = sorted(r["query_id"] for r in rows)
    assert ids == list(range(_HELD_LO, _HELD_HI))
    assert all(0.0 <= r["recall_trained"] <= 1.0 for r in rows)


def test_incremental_index_sampled_training_matches_direct(spark, vecs, tmp_path):
    """IncrementalIvfIndex(train_sample_stride=S) persists exactly the
    centroids direct sampled training produces."""
    tbl = DeltaliteTable(spark, str(tmp_path / "emb"))
    tbl.overwrite(vecs)
    idx = IncrementalIvfIndex(
        spark, tbl, str(tmp_path / "idx"),
        train_iters=_KM_ITERS, train_sample_stride=3,
    )
    idx.refresh()
    direct = _cent_map(
        train_kmeans(vecs, _IVF_C, _KM_ITERS, sample_stride=3)
    )
    assert _cent_map(idx.centroids()) == direct
