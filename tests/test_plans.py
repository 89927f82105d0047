"""Physical-plan quality gates (SURVEY §4): the properties that make these
operators survive a 100× scale-up are asserted on the executed plan, so a
regression that un-broadcasts a dim join, loses map-side partial aggregation,
or turns top-k into a global sort fails CI — not a production cluster.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest

from pyspark_cdc_engine.operators import REGISTRY
from tests.conftest import SF_DIR

_NODES = re.compile(
    r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|CartesianProduct|"
    r"BroadcastNestedLoopJoin|TakeOrderedAndProject|Exchange|HashAggregate|"
    r"Sort\b|BatchEvalPython|ArrowEvalPython)"
)


def plan_of(spark, name: str) -> str:
    return (
        REGISTRY[name]
        .spark(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def node_counts(plan: str) -> Counter:
    return Counter(_NODES.findall(plan))


def test_star_join_broadcasts_all_dims(spark):
    """region_revenue: lineitem is the fact side; orders/customer/nation/region
    must all broadcast — a sort-merge join on any of them would shuffle the
    fact table once per dim at scale."""
    c = node_counts(plan_of(spark, "region_revenue"))
    assert c["BroadcastHashJoin"] == 4
    assert c["SortMergeJoin"] == 0 and c["ShuffledHashJoin"] == 0
    # partial + final aggregation, nothing more: ≤2 exchanges (agg + AQE reads)
    assert c["Exchange"] <= 2


def test_topk_plans_take_ordered_not_global_sort(spark):
    """ORDER BY ... LIMIT n must plan TakeOrderedAndProject (per-partition
    heap + driver merge), never a full Sort + Limit."""
    plan = plan_of(spark, "topk_orders")
    c = node_counts(plan)
    assert c["TakeOrderedAndProject"] == 1
    assert c["Sort"] == 0


def test_exact_dedup_partial_aggregates(spark):
    """Hash dedup must partial-aggregate map-side: 2 HashAggregates around
    exactly 1 exchange, so only (hash, partial counts) shuffle — never text."""
    c = node_counts(plan_of(spark, "exact_dedup"))
    assert c["HashAggregate"] == 2
    assert c["Exchange"] == 1


def test_filters_push_to_parquet_scans(spark):
    """Join-key null filters must reach the parquet scan (PushedFilters), not
    sit above it as a post-scan Filter."""
    plan = plan_of(spark, "region_revenue")
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    nonempty = [p for p in pushed if p.strip()]
    assert len(nonempty) >= 4  # every joined table scan carries pushed filters


def test_scan_prunes_columns(spark):
    """text_stats projects 2 of documents' 5 columns; ReadSchema must show only
    those — reading all columns for a 2-column projection is wrong."""
    plan = plan_of(spark, "text_stats")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, plan
    cols = {c.split(":")[0] for c in schemas[0].split(",")}
    assert cols == {"doc_id", "text"}


def test_jvm_only_hot_paths_have_no_python(spark):
    """Everything except the mapInPandas media kernel must stay JVM-side —
    a Python eval node in a hot path is a 10-100× slowdown."""
    for name in (
        "region_revenue",
        "pricing_summary",
        "exact_dedup",
        "minhash_lsh_near_dup",
        "simhash_fingerprint",
        "cosine_topk_bruteforce",
        "multimodal_meta",
    ):
        plan = plan_of(spark, name)
        assert "EvalPython" not in plan, name


def test_broadcast_query_set_in_ann(spark):
    """cosine_topk: the small query set must broadcast against the corpus —
    the corpus is never shuffled for the crossJoin."""
    c = node_counts(plan_of(spark, "cosine_topk_bruteforce"))
    assert c["BroadcastNestedLoopJoin"] >= 1 or c["BroadcastHashJoin"] >= 1
    assert c["SortMergeJoin"] == 0


def test_ivf_assignment_broadcasts_centroids(spark):
    """ann_ivf_bucketed: centroids broadcast; the only exchanges are the
    per-vector window (assignment) and per-query ranking."""
    plan = plan_of(spark, "ann_ivf_bucketed")
    assert "Broadcast" in plan
    assert node_counts(plan)["CartesianProduct"] == 0


def test_multiprobe_recall_dominates_single_probe(spark):
    """nprobe>1 (IVF) / flip-1-bit probing (LSH): the probed candidate set
    is a SUPERSET of the single-probe one, so recall_multi >= recall_single
    must hold on every query row — and multi-probing actually buys hits on
    this corpus (strict aggregate lift across the two families)."""
    ivf = REGISTRY["ann_multiprobe_recall_at_k"].spark(spark, SF_DIR).collect()
    lsh = REGISTRY["lsh_multiprobe_recall_at_k"].spark(spark, SF_DIR).collect()
    for rows in (ivf, lsh):
        assert rows
        assert all(r.hits_multi >= r.hits_single for r in rows), [
            (r.query_id, r.hits_single, r.hits_multi) for r in rows
        ]
    lift = sum(r.hits_multi - r.hits_single for r in ivf) + sum(
        r.hits_multi - r.hits_single for r in lsh
    )
    assert lift > 0


def test_ivfpq_eval_consistency(spark):
    """ivfpq_recall_at_k: one row per panel query, hit counts within
    [0, k] on both columns. (No one-sided bound exists between the two:
    bucketing loses out-of-bucket true neighbors but also EXCLUDES
    quantization distractors, so recall_ivfpq can land either side of
    recall_pq — this corpus exhibits both directions.) MRR found_rank/rr
    are consistent; nDCG stays in [0, 1]."""
    from pyspark_cdc_engine.operators.dedup_scale import _PQ_Q, _PQ_TOPK

    rows = REGISTRY["ivfpq_recall_at_k"].spark(spark, SF_DIR).collect()
    assert len(rows) == _PQ_Q
    assert all(0 <= r.hits_pq <= _PQ_TOPK for r in rows)
    assert all(0 <= r.hits_ivfpq <= _PQ_TOPK for r in rows)
    mrr = REGISTRY["ann_mrr_at_k"].spark(spark, SF_DIR).collect()
    assert mrr
    for r in mrr:
        if r.found_rank == 0:
            assert r.rr == 0.0
        else:
            assert abs(r.rr - 1.0 / r.found_rank) < 1e-15
    ndcg = REGISTRY["ann_ndcg_at_k"].spark(spark, SF_DIR).collect()
    assert ndcg
    assert all(0.0 <= r.ndcg <= 1.0 for r in ndcg)
    assert all((r.n_rel == 0) == (r.dcg_e12 == 0) or r.dcg_e12 > 0 for r in ndcg)


def test_multiprobe_plans_broadcast_probe_tables(spark):
    """The Q x P probe tables are always the broadcast side — multi-probe
    must not change the single-probe 100 TB shape (no corpus shuffle join)."""
    c = node_counts(plan_of(spark, "ann_ivf_multiprobe"))
    assert c["SortMergeJoin"] == 0
    assert c["CartesianProduct"] == 0
    # LSH keeps its constant 512-row hyperplane crossJoin (whitelisted);
    # the corpus-side joins must still never sort-merge
    assert node_counts(plan_of(spark, "ann_lsh_multiprobe"))["SortMergeJoin"] == 0


def test_approx_distinct_error_bound(spark):
    """The HLL sketch must land within 3x its configured rsd (2%) of the exact
    count on every group. The bound check is computed IN-ROW (within_bound),
    which is also what makes the query oracle-hashable; here we assert every
    group holds it and that the plan really aggregates a sketch."""
    df = REGISTRY["approx_distinct_sketch"].spark(spark, SF_DIR)
    rows = df.collect()
    assert rows and all(r.within_bound for r in rows), [
        (r.priority, r.within_bound) for r in rows
    ]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "approx_count_distinct" in plan


def test_connected_components_chain_collapse(spark):
    """Transitive collapse: A~B and B~C land in ONE cluster even though A~C
    was never an edge; disjoint pairs and singletons keep their own labels.
    The 1-2-3 chain needs >1 propagation round, exercising the fixpoint loop."""
    from pyspark_cdc_engine.operators.text import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    pairs = spark.createDataFrame(
        [(2, 3), (1, 2), (4, 5), (7, 3)], "doc_a long, doc_b long"
    )
    got = {r.doc_id: (r.cluster_id, r.is_canonical)
           for r in connected_components(nodes, pairs).collect()}
    assert got == {
        1: (1, True), 2: (1, False), 3: (1, False), 7: (1, False),
        4: (4, True), 5: (4, False),
        6: (6, True),
    }


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """The 100 TB join-pruning path: with a selective dim filter, Spark's
    InjectRuntimeFilter plants a bloom_filter_agg from the dim side as a
    might_contain predicate on the fact side, dropping non-joining fact rows
    before the shuffle. Size thresholds keep it dormant at test scale, so
    lower them here to prove the machinery engages — and that results are
    unchanged with it on."""
    sf = SF_DIR
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{sf}/lineitem.parquet")
        o = spark.read.parquet(f"{sf}/orders.parquet").filter(
            "o_orderpriority = '1-URGENT'"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan and "might_contain" in plan
        with_bloom = {(r.o_orderpriority, r["count"]) for r in j.collect()}
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        without = {
            (r.o_orderpriority, r["count"])
            for r in li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
            .collect()
        }
        assert with_bloom == without and with_bloom
    finally:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_ts_window_similarity_single_shuffle_topk(spark):
    """One shuffle (the user_id window) + TakeOrderedAndProject for the global
    top-k — never a full sort; distance math stays unrolled codegen (no
    Python, no HOF lambdas)."""
    plan = plan_of(spark, "ts_window_similarity_topk")
    c = node_counts(plan)
    assert c["TakeOrderedAndProject"] == 1
    assert c["Exchange"] <= 1
    assert c["BatchEvalPython"] == 0 and c["ArrowEvalPython"] == 0


def test_connected_components_long_chain_log_rounds(spark):
    """Round-complexity contract: pointer doubling resolves a diameter-127
    chain in O(log2 diameter) rounds, not O(diameter) — the property that
    keeps the driver-side fixpoint loop viable on adversarial graphs at
    scale. Also re-checks correctness: the whole chain is ONE cluster."""
    import math

    from pyspark_cdc_engine.operators.text import connected_components

    n = 128  # chain 0-1-2-...-127, diameter 127
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    stats: dict = {}
    got = connected_components(nodes, pairs, max_rounds=15, stats=stats).collect()
    assert all(r.cluster_id == 0 for r in got) and len(got) == n
    assert sum(r.is_canonical for r in got) == 1
    assert stats["rounds"] <= math.ceil(math.log2(n - 1)) + 3  # = 10


def test_minhash_rejoin_band_join_carries_no_arrays(spark):
    """Above the size gate, the LSH band self-join must move only
    (doc_id, band_id, band_hash) — bounded row width through hot band
    buckets; shingle arrays may touch candidate-keyed joins only. Both
    physical plans must produce identical pairs."""
    from pyspark_cdc_engine.operators.dedup_scale import (
        _band_candidate_pairs,
        _minhash_lsh,
        lsh_band_table,
        minhash_shingle_sets,
        minhash_signatures_from_sets,
    )
    from pyspark_cdc_engine.operators.registry import load_table

    docs = load_table(spark, SF_DIR, "documents")
    single = _minhash_lsh(docs, rejoin=False)
    rejoin = _minhash_lsh(docs, rejoin=True)

    def band_lines(df):
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        return [ln for ln in plan.splitlines() if "band_hash" in ln]

    # the probe is meaningful: the single-pass plan DOES carry shs with bands
    assert any("shs" in ln for ln in band_lines(single))
    # the scale plan never lets an array ride a band-keyed row. Since r12
    # the candidate pairs are materialized (the band self-join executes once
    # for all consumers), so the invariant is asserted on the frame that
    # actually CONTAINS the band join — the same construction
    # _candidate_widths_from_bands materializes.
    cand = _band_candidate_pairs(
        lsh_band_table(minhash_signatures_from_sets(minhash_shingle_sets(docs)))
    )
    assert band_lines(cand) and not any("shs" in ln for ln in band_lines(cand))

    key = lambda r: (r.doc_a, r.doc_b, round(r.jaccard, 12))
    assert sorted(map(key, single.collect())) == sorted(map(key, rejoin.collect()))


def test_ivf_hot_bucket_triangle_split(spark):
    """Skew guard: a deliberately hot centroid (every vector in ONE bucket)
    must not collapse the candidate stage into a single B²-sized task. With
    cap=50 a 240-row bucket splits into k=5 chunks -> 15 triangle tasks, each
    bounded by ~2 chunks of input; the union of task outputs must equal the
    naive all-pairs result exactly."""
    import numpy as np

    from pyspark_cdc_engine.operators.dedup_scale import (
        _bucket_candidate_pairs,
        _triangle_tasks,
    )

    n, dim, tau, cap = 240, 8, 0.97, 50
    rng = [[((i * 7 + d * 3) % 13 - 6) / 13.0 + (1.0 if d == i % 2 else 0.0)
            for d in range(dim)] for i in range(n)]
    m = np.asarray(rng)
    n2 = (m * m).sum(axis=1)
    assigned = spark.createDataFrame(
        [(int(i), [float(x) for x in rng[i]], float(n2[i]), 0) for i in range(n)],
        "vec_id long, embedding array<float>, norm2 double, centroid_id int",
    )

    # naive truth (float32 storage -> recompute from what Spark holds)
    stored = np.asarray(assigned.orderBy("vec_id").select("embedding")
                        .rdd.map(lambda r: r[0]).collect(), dtype=np.float64)
    sn2 = (stored * stored).sum(axis=1)
    cs = (stored @ stored.T) / np.sqrt(np.outer(sn2, sn2))
    ia, ib = np.nonzero(np.triu(cs >= tau - 1e-6, k=1))
    naive = {(int(a), int(b)) for a, b in zip(ia, ib)}
    assert naive  # fixture really produces pairs

    got = {(r.vec_a, r.vec_b)
           for r in _bucket_candidate_pairs(assigned, tau, cap=cap).collect()}
    assert got == naive

    # boundedness: 15 distinct tasks, none anywhere near the full bucket
    tasks = _triangle_tasks(assigned, cap)
    per_task = tasks.groupBy("centroid_id", "_i", "_j").count().collect()
    assert len(per_task) == 15  # k=5 -> k(k+1)/2
    assert max(r["count"] for r in per_task) <= 3 * cap  # ~2 chunks + hash variance
    # and an unskewed bucket (<= cap) stays a single task with no replication
    small = assigned.filter("vec_id < 40")
    small_tasks = _triangle_tasks(small, cap)
    assert small_tasks.count() == 40
    assert small_tasks.select("_i", "_j").distinct().collect() == [
        small_tasks.select("_i", "_j").distinct().first()
    ]


def test_jaccard_exact_baseline_is_size_guarded(spark, monkeypatch):
    """The all-pairs shingle self-join must refuse to run above its documented
    corpus-size guard and route the caller to the LSH path — the scale
    contract for the one intentionally-quadratic baseline in the registry."""
    import pytest

    monkeypatch.setenv("JACCARD_EXACT_MAX_DOCS", "10")
    with pytest.raises(ValueError, match="minhash_lsh_near_dup"):
        REGISTRY["jaccard_near_dup_pairs"].spark(spark, SF_DIR)
    monkeypatch.delenv("JACCARD_EXACT_MAX_DOCS")
    assert REGISTRY["jaccard_near_dup_pairs"].spark(spark, SF_DIR).count() >= 0


def test_range_join_broadcasts_band_table(spark):
    """value_band_range_join: the interval table must broadcast (BNLJ against
    a 5-row build side), never a cartesian or a shuffled theta join."""
    c = node_counts(plan_of(spark, "value_band_range_join"))
    assert c["BroadcastNestedLoopJoin"] == 1
    assert c["CartesianProduct"] == 0 and c["SortMergeJoin"] == 0


def test_asof_join_is_single_window_pass(spark):
    """asof_view_before_purchase: the union+window idiom — no join at all in
    the plan (the naive formulation would be an inequality join)."""
    plan = plan_of(spark, "asof_view_before_purchase")
    c = node_counts(plan)
    assert "Join" not in plan or (
        c["SortMergeJoin"] + c["BroadcastHashJoin"]
        + c["ShuffledHashJoin"] + c["BroadcastNestedLoopJoin"] == 0
    )
    assert "Window" in plan


def test_star_join_part_supplier_broadcasts(spark):
    """brand_supplier_revenue: all three dims broadcast; top-25 is
    TakeOrderedAndProject."""
    c = node_counts(plan_of(spark, "brand_supplier_revenue"))
    assert c["BroadcastHashJoin"] == 3 and c["SortMergeJoin"] == 0
    assert c["TakeOrderedAndProject"] == 1


def test_pivot_is_single_scan(spark):
    """pivot with explicit values: Spark plans two aggregate levels
    (group-by + pivot_first) over ONE scan — the explicit value list avoids
    the extra distinct-values job a valueless pivot() runs eagerly."""
    plan = plan_of(spark, "pivot_status_by_priority")
    c = node_counts(plan)
    assert plan.count("Scan parquet") == 1
    assert c["Exchange"] <= 2
    assert c["HashAggregate"] == 4  # partial+final x two levels


def test_pq_plans_broadcast_and_stay_jvm(spark):
    """PQ encode/search: the sub-centroid table (K x dim rows) and the ADC
    distance table (Q x M x K rows) must broadcast — a sort-merge join on
    either would shuffle the exploded corpus twice; and both plans must be
    pure codegen (no Python eval in the scoring path)."""
    for name in ("pq_encode", "pq_search"):
        c = node_counts(plan_of(spark, name))
        assert c["BroadcastHashJoin"] >= 1, name
        assert c["SortMergeJoin"] == 0 and c["ShuffledHashJoin"] == 0, name
        assert c["BatchEvalPython"] == 0 and c["ArrowEvalPython"] == 0, name


def test_bucketed_join_needs_no_exchange(spark, tmp_path):
    """Tables bucketed on the join key by the same bucket count join with
    ZERO Exchange nodes — the write-time shuffle is reused by every later
    join. This is the co-location contract write_bucketed exists for."""
    from pyspark_cdc_engine.bucketing import read_table, write_bucketed

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    write_bucketed(orders, "t_orders_b", ["o_custkey"], 8,
                   sort_cols=["o_custkey"], path=str(tmp_path / "ob"))
    write_bucketed(customer, "t_customer_b", ["c_custkey"], 8,
                   sort_cols=["c_custkey"], path=str(tmp_path / "cb"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a, b = read_table(spark, "t_orders_b"), read_table(spark, "t_customer_b")
        joined = a.join(b, a.o_custkey == b.c_custkey).groupBy("c_mktsegment").count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        c = node_counts(plan)
        assert c["SortMergeJoin"] == 1
        # the ONLY exchange is the groupBy's — the join itself reads
        # co-located buckets; an unbucketed join would show 3
        assert c["Exchange"] == 1, plan
        # same result as the plain shuffled join
        expect = orders.join(customer, orders.o_custkey == customer.c_custkey).count()
        assert joined.agg({"count": "sum"}).first()[0] == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_customer_b")


def test_salted_join_matches_plain_and_spreads_keys(spark):
    """salted_join == plain join on a 90%-one-key skewed fixture, and the
    physical join condition carries the salt column (the key spread that
    de-hotspots the shuffle)."""
    from pyspark_cdc_engine.functions.skew import salted_join

    big = spark.range(20_000).selectExpr(
        "CASE WHEN id % 10 < 9 THEN 0 ELSE id % 7 END AS k", "id AS payload"
    )
    small = spark.range(7).selectExpr("id AS k", "id * 100 AS dim")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = salted_join(big, small, on=["k"], n_salt=8)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "__salt" in plan.split("Join")[1][:200]  # salt is a join key
        got = j.groupBy("k").agg({"dim": "sum", "payload": "count"}).collect()
        plain = (
            big.join(small, "k")
            .groupBy("k")
            .agg({"dim": "sum", "payload": "count"})
            .collect()
        )
        assert sorted(map(tuple, got)) == sorted(map(tuple, plain))
        with pytest.raises(ValueError, match="inner/left"):
            salted_join(big, small, on=["k"], how="right")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


# Queries allowed to deviate from the sweep's defaults, with the reason.
_SWEEP_CROSS_OK = {
    "cosine_topk_bruteforce",   # broadcast 8-query set: BNLJ by construction
    "ann_recall_at_k",          # composes the gated brute-force kernel
    "pq_recall_at_k",           # broadcast 4-query exact-L2 truth side
    "lsh_recall_at_k",          # composes the gated BF + hyperplane kernels
    "ann_lsh_hyperplane",       # broadcast 512-row hyperplane table
    "ann_lsh_multiprobe",       # same hyperplane table + Qx(H+1) probe list
    "lsh_multiprobe_recall_at_k",   # composes the gated BF + LSH kernels
    "ann_multiprobe_recall_at_k",   # composes the gated brute-force kernel
    "ann_trained_recall_at_k",      # composes the gated brute-force kernel
    "ann_mrr_at_k",             # composes the gated brute-force kernel
    "ann_ndcg_at_k",            # composes the gated brute-force kernel
    "ivfpq_recall_at_k",        # broadcast 4-query exact-L2 truth side
    "sq8_recall_at_k",          # broadcast 4-query exact-dot truth side
    "above_avg_orders",         # broadcast 1-row global aggregate
    "spender_activity_reconciliation",  # broadcast 1-row thresholds (same class)
    "bigram_pmi_top",           # broadcast 1-row bigram total
    "training_pipeline_e2e",    # composes the gated dedup stages
    "value_band_range_join",    # broadcast band table + range predicate (own gate)
    "heavy_hitters_mg",         # broadcast 1-row token total (bound computation)
    "domain_similarity_score",  # broadcast 1-row target-corpus total
    "bm25_odds_search",         # broadcast 1-row corpus stats (N, avgdl)
    "temperature_sampling_weights",  # broadcast 1-row (t_all, sq_all) totals
    "copurchase_triangles",     # broadcast 1-row scalar aggregates assembled into one row
    "gap_fill_interpolate",     # broadcast 1-row (lo, hi) bounds against the 5-row type dim
    "bpe_apply_token_count",    # broadcast 1-row merge-table pivot onto the vocab
    "tokenizer_fertility_report",  # same broadcast merge pivot (shared helper)
    "sequence_pack_bpe",           # same broadcast merge pivot (shared helper)
    "kmeans_sampled_quality",   # deliberate crossJoins of four 1-row aggregates
    "hard_negative_mining",     # broadcast 8-anchor panel (brute-force kernel shape)
    "source_overlap_kmv",       # source-pair frame: |sources|^2-bounded sketch join
    "token_budget_fill",        # broadcast 1-row grand-total token count
    "nb_token_vote_classifier",  # broadcast 1-row class-prior token totals
}
_SWEEP_PYTHON_OK = {
    "embedding_cosine_near_dup",  # numpy gram scoring via applyInPandas (by design)
    "media_features",             # mapInPandas decode kernel (by design)
    "training_pipeline_e2e",      # composes the cosine stage
    "media_decode_real",          # mapInPandas real-codec kernel (by design)
    "heavy_hitters_mg",           # mapInPandas Misra-Gries summaries (by design)
}


def test_registry_sweep_no_cartesian_no_python(spark):
    """EVERY registry query's physical plan is free of unintended cartesian
    products and Python eval nodes. New queries are covered automatically;
    a deliberate deviation must be whitelisted above with its reason."""
    for name, q in REGISTRY.items():
        try:
            plan = q.spark(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        except ValueError:
            continue  # size-guarded exact baselines refuse big corpora, not here
        if name not in _SWEEP_CROSS_OK:
            assert "CartesianProduct" not in plan, name
            assert "BroadcastNestedLoopJoin" not in plan, name
        if name not in _SWEEP_PYTHON_OK:
            assert "EvalPython" not in plan, name


# ------------------------------------------------------- round-5 curation ops


def test_curation_ops_stay_jvm_side(spark):
    """The new curation/quantize queries are pure column arithmetic: no
    Python evaluation node may appear in any of their plans."""
    for name in (
        "word_commonness_score",
        "containment_near_dup",
        "retention_cohorts",
        "chunk_dedup_c4",
        "sequence_pack_greedy",
        "source_mix_report",
        "embedding_int8_quantize",
    ):
        plan = plan_of(spark, name)
        assert "Python" not in plan, f"{name} fell off codegen:\n{plan[:800]}"


def test_sequence_pack_window_is_bucket_parallel(spark):
    """Packing must parallelize across hash streams: the window partitions by
    `bucket`, never a SinglePartition global sort."""
    plan = plan_of(spark, "sequence_pack_greedy")
    assert "SinglePartition" not in plan
    assert re.search(r"hashpartitioning\(bucket", plan), plan[:800]


def test_token_budget_fill_window_is_bucket_parallel(spark):
    """The distributed take-while must never sort a whole source in one
    partition: the corpus-sized doc-level running sum partitions by
    (source, h); every window in the plan is keyed at least by source (the
    bucket-offset window is <= {buckets} rows per source). The only
    SinglePartition exchange allowed is the 1-row grand-total aggregate."""
    plan = plan_of(spark, "token_budget_fill")
    # the doc window rides a (source, h) exchange
    assert re.search(r"hashpartitioning\(source[^)]*, h", plan), plan[:800]
    # every window spec is partitioned (no empty partition-by = global sort)
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan[:800]
    for s in specs:
        assert s.lstrip().startswith("source"), f"unpartitioned window: {s}"


def test_quantize_dim_stats_join_is_broadcast(spark):
    """The 64-row per-dimension stats side must broadcast back to the
    components — a shuffle join here would reshuffle the whole corpus."""
    plan = plan_of(spark, "embedding_int8_quantize")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_shingle_queries_survive_short_and_empty_documents(spark, tmp_path):
    """Review r5: sequence(1, 0) in Spark is the DESCENDING [1, 0] — docs
    shorter than the shingle width (or empty) must yield zero shingles/chunks,
    not a slice(..., 0, w) crash or phantom '' chunks."""
    from pyspark.sql import functions as F

    from pyspark_cdc_engine.operators.dedup_scale import (
        _SHINGLE_W,
        _shingle_expr_spark,
        minhash_shingle_sets,
    )

    docs = spark.createDataFrame(
        [(1, "short doc"), (2, ""), (3, "w1 w2 w3 w4 w5 w6 w7 w8 w9")],
        ["doc_id", "text"],
    )
    sets = minhash_shingle_sets(docs).collect()
    assert {r.doc_id for r in sets} == {3}
    out = docs.select(
        "doc_id", F.explode(F.expr(_shingle_expr_spark(_SHINGLE_W))).alias("sh")
    ).collect()
    assert all(r.doc_id == 3 for r in out) and len(out) == 2


def test_pmi_unigram_broadcast_is_size_gated(spark, monkeypatch):
    """bigram_pmi_top: below the gate both unigram joins carry an explicit
    broadcast hint; above it (a web-scale vocab would kill the driver) they
    must fall back to the shuffle planner — AQE may still broadcast at
    runtime from actual size stats, so assert on the OPTIMIZED logical plan's
    hints, not the physical join choice."""
    def hint_count():
        df = REGISTRY["bigram_pmi_top"].spark(spark, SF_DIR)
        logical = df._jdf.queryExecution().optimizedPlan().toString()
        return logical.count("broadcast")
    assert hint_count() >= 2  # default gate (1M docs) is far above 500
    monkeypatch.setenv("CDC_PMI_BROADCAST_MAX_DOCS", "100")
    assert hint_count() == 1  # only the 1-row scalar total keeps its hint


# --------------------------------------------------- round-6 session additions


def test_bloom_probe_join_is_broadcast(spark):
    """bloom_decontaminate: the bench-bits build side is bounded by the
    filter's constant size (<= 2^20 int rows), so the probe join must be a
    BroadcastHashJoin — a sort-merge here would shuffle the training-corpus
    positions, defeating the whole design."""
    c = node_counts(plan_of(spark, "bloom_decontaminate"))
    assert c["BroadcastHashJoin"] >= 1
    assert c["SortMergeJoin"] == 0


def test_gap_fill_windows_partition_by_series(spark):
    """gap_fill_interpolate: both direction passes window over event_type —
    never a SinglePartition global sort (each series interpolates
    independently; that is what scales the operator across series)."""
    plan = plan_of(spark, "gap_fill_interpolate")
    wins = re.findall(r"Window \[.*?\], \[([^\]]*)\]", plan)
    assert wins, plan[:800]  # window nodes present
    # every Window's partition spec names the series key (the 1-row bounds
    # aggregate legitimately uses SinglePartition — windows must not)
    for spec in wins:
        assert "event_type" in spec, spec


def test_triangle_wedge_join_sees_sampled_edges(spark):
    """copurchase_triangles: the DOULION md5-coin filter must land BEFORE the
    wedge self-join (candidate generation runs on the sampled graph, p^2 of
    the work). The edge list is materialized once, so the filter shows up in
    the materialization scan, not replayed per consumer."""
    from pyspark_cdc_engine.operators.graph_sketch import _TRI_KEEP

    df = REGISTRY["copurchase_triangles"].spark(spark, SF_DIR)
    row = df.collect()[0]
    # the sample is ~KEEP/16 of the full distinct edge set: loose sanity band
    # (binomial concentration makes 0.15..0.35 astronomically safe at 100k+)
    from pyspark_cdc_engine.operators.registry import load_table

    full_pairs = (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_partkey").distinct()
        .groupBy("l_orderkey").count().selectExpr("sum(count * (count - 1) / 2)")
        .collect()[0][0]
    )
    # sampled edges must be a strict subset of the possible pairs, and well
    # under half of them (p = 1/4; full_pairs over-counts distinct edges, so
    # the bound is loose but a missing filter would blow straight past it)
    assert 0 < row.edges_sampled < 0.5 * full_pairs
    assert row.triangles_est == row.triangles_sampled * (16 // _TRI_KEEP) ** 3
