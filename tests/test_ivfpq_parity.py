"""ivfpq_recall_at_k composition parity (r12 ADVICE #1).

The recall eval inlines both ADC scoring paths for plan-sharing (one d2
derivation feeds the code argmin and the query distance table — r12's
verified win). The risk the ADVICE flags: if the REGISTERED kernels
(`pq_search`, `ann_ivfpq_search`) later change their tie-break or
`_IVF_NPROBE` handling, the eval would silently measure something other
than what those kernels return. This test pins the contract: the eval's
hit counts must equal recall recomputed from the registered kernels'
actual top-k sets against the shared exact ground truth."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_ivfpq_recall_composes_registered_search_kernels(spark):
    from pyspark_cdc_engine.operators.dedup_scale import (
        _PQ_TOPK,
        _pq_exact_topk,
        ann_ivfpq_search,
        ivfpq_recall_at_k,
        pq_search,
    )

    exact = {
        (r.query_id, r.neighbor_id)
        for r in _pq_exact_topk(spark, SF_DIR).collect()
    }
    pq_hits = {
        (r.query_id, r.neighbor_id)
        for r in pq_search(spark, SF_DIR).collect()
    } & exact
    ivfpq_hits = {
        (r.query_id, r.neighbor_id)
        for r in ann_ivfpq_search(spark, SF_DIR).collect()
    } & exact

    got = {r.query_id: r for r in ivfpq_recall_at_k(spark, SF_DIR).collect()}
    queries = {q for q, _ in exact}
    assert set(got) == queries
    for q in queries:
        want_pq = sum(1 for qq, _ in pq_hits if qq == q)
        want_iv = sum(1 for qq, _ in ivfpq_hits if qq == q)
        assert got[q].hits_pq == want_pq, q
        assert got[q].hits_ivfpq == want_iv, q
        assert got[q].recall_pq == want_pq / _PQ_TOPK
        assert got[q].recall_ivfpq == want_iv / _PQ_TOPK
