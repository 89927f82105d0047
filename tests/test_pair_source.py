"""engine.pair-source (exact|lsh|auto): graph/curation consumers of near-dup
edges must DEGRADE to the banded-LSH candidate join above the exact-all-pairs
guard instead of raising — with parity against the exact pairs on the overlap
(the LSH path verifies exact Jaccard/containment on banded candidates, so
every emitted pair must carry the exact score)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR
from pyspark_cdc_engine.operators.curation import (
    _CONTAIN_TAU,
    containment_near_dup,
    dedup_keep_best,
)
from pyspark_cdc_engine.operators.graph_sketch import pagerank3_near_dup
from pyspark_cdc_engine.operators.text import (
    dedup_clusters,
    jaccard_near_dup_pairs,
    near_dup_edges,
)

GUARD = "100"  # the test corpus has 500 docs -> exceeds this guard


def _undirected(df):
    return {tuple(sorted((r.doc_a, r.doc_b))) for r in df.collect()}


def test_auto_switches_to_lsh_above_guard_with_exact_parity(spark, monkeypatch):
    # exact edge set at the default guard (500 docs fit under 20k)
    exact = jaccard_near_dup_pairs(spark, SF_DIR).collect()
    exact_hi = {
        tuple(sorted((r.doc_a, r.doc_b))): r.jaccard
        for r in exact
        if r.jaccard >= 0.8  # the LSH verification threshold
    }
    monkeypatch.setenv("JACCARD_EXACT_MAX_DOCS", GUARD)
    lsh_edges = _undirected(near_dup_edges(spark, SF_DIR))
    assert lsh_edges, "LSH path found no edges on the test corpus"
    # verified-LSH pairs are a SUBSET of the exact >=0.8 pairs (banding can
    # miss candidates; verification can never invent one)
    assert lsh_edges <= set(exact_hi)
    # banding at J>=0.8 has ~92% per-pair candidate probability; near-dup
    # pairs in the fixture are far above threshold, so demand high recall
    assert len(lsh_edges) >= 0.8 * len(exact_hi)


def test_guarded_queries_degrade_instead_of_raising(spark, monkeypatch):
    monkeypatch.setenv("JACCARD_EXACT_MAX_DOCS", GUARD)
    for q in (pagerank3_near_dup, dedup_clusters, dedup_keep_best):
        df = q(spark, SF_DIR)
        assert df.count() > 0, q.__name__
    # pagerank covers every document even with LSH edges
    assert pagerank3_near_dup(spark, SF_DIR).count() == 500


def test_containment_degrades_with_exact_scores_on_overlap(spark, monkeypatch):
    exact = {
        tuple(sorted((r.doc_a, r.doc_b))): r.containment
        for r in containment_near_dup(spark, SF_DIR).collect()
    }
    monkeypatch.setenv("JACCARD_EXACT_MAX_DOCS", GUARD)
    got = containment_near_dup(spark, SF_DIR).collect()
    assert got, "LSH containment path found no pairs"
    for r in got:
        key = tuple(sorted((r.doc_a, r.doc_b)))
        assert key in exact  # never invents a pair the exact path lacks
        assert r.containment == pytest.approx(exact[key], abs=1e-12)
        assert r.containment >= _CONTAIN_TAU


def test_exact_mode_keeps_the_loud_refusal(spark, monkeypatch):
    monkeypatch.setenv("JACCARD_EXACT_MAX_DOCS", GUARD)
    monkeypatch.setenv("CDC_PAIR_SOURCE", "exact")
    with pytest.raises(ValueError, match="exact small-N baseline"):
        pagerank3_near_dup(spark, SF_DIR)
    with pytest.raises(ValueError, match="exact small-N baseline"):
        containment_near_dup(spark, SF_DIR)


def test_lsh_mode_forces_lsh_below_guard(spark, monkeypatch):
    monkeypatch.setenv("CDC_PAIR_SOURCE", "lsh")
    lsh_edges = _undirected(near_dup_edges(spark, SF_DIR))
    exact_hi = {
        tuple(sorted((r.doc_a, r.doc_b)))
        for r in jaccard_near_dup_pairs(spark, SF_DIR).collect()
        if r.jaccard >= 0.8
    }
    assert lsh_edges <= exact_hi


def test_invalid_mode_rejected(spark, monkeypatch):
    monkeypatch.setenv("CDC_PAIR_SOURCE", "bogus")
    with pytest.raises(ValueError, match="pair-source"):
        near_dup_edges(spark, SF_DIR)
