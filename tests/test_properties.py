"""Property-based invariants (SURVEY §5 item 4, hypothesis): the guarantees the
reference documents must hold for arbitrary transaction interleavings —
no partial transactions emitted (PIPELINE_DIAGRAMS.md:318-323), SCD1 orderId
uniqueness + no version regression (PIPELINE_DIAGRAMS.md:325-331), and
order-permutation invariance of the final state.

Each hypothesis example runs real Spark jobs, so example counts are kept small;
the generators still cover metadata-missing, under-count, multi-order and
duplicate-version interleavings.
"""

from __future__ import annotations

import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark_cdc_engine.streaming.pipeline import assemble_transactions_batch
from pyspark_cdc_engine.parse import (
    parse_data_change_events,
    parse_transaction_metadata,
    unify_event_streams,
)
from pyspark_cdc_engine.tables import MergeClause, merge_dataframes
from tests.cdc_fixtures import TxBuilder

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# One generated transaction: which orders it touches, how many items each,
# and whether its metadata is delivered.
tx_strategy = st.fixed_dictionaries(
    {
        "orders": st.lists(st.integers(1, 4), min_size=1, max_size=2, unique=True),
        "items_per_order": st.integers(0, 3),
        "has_metadata": st.booleans(),
    }
)


def _build(spark, scenario, seed):
    """Materialize a scenario as shuffled JSON event frames -> unified DF."""
    import json as _json

    txs, metas = [], []
    for i, t in enumerate(scenario):
        b = TxBuilder(f"x.{i}", f"{9000 + i}")
        for oid in t["orders"]:
            b.order(oid)
            for k in range(t["items_per_order"]):
                b.item(oid, k + 1)
        txs.append(b)
        if t["has_metadata"]:
            metas.append(b)
    cdc_lines = [_json.dumps(e) for b in txs for e in b.events]
    rng = random.Random(seed)
    rng.shuffle(cdc_lines)
    meta_lines = [_json.dumps(b.metadata()) for b in metas]
    cdc = parse_data_change_events(
        spark.createDataFrame([(x,) for x in cdc_lines] or [(None,)], "value string")
    )
    meta = parse_transaction_metadata(
        spark.createDataFrame([(x,) for x in meta_lines] or [(None,)], "value string")
    )
    return unify_event_streams(cdc, meta)


def _normalize(rows):
    return sorted(
        (
            r.xid,
            r.csn,
            r.orderId,
            tuple(sorted(o.orderRef for o in r.orders)),
            tuple(sorted(li.lineItemId for li in r.lineItems)),
        )
        for r in rows
    )


@given(scenario=st.lists(tx_strategy, min_size=1, max_size=3), seed=st.integers(0, 99))
@settings(**_SETTINGS)
def test_assembly_emits_exactly_complete_transactions(spark, scenario, seed):
    """Completed = metadata delivered; emitted rows are exactly (tx, order)
    pairs of metadata-bearing transactions, regardless of event order."""
    out = assemble_transactions_batch(_build(spark, scenario, seed)).collect()
    expected = {
        (f"x.{i}", str(9000 + i), float(oid))
        for i, t in enumerate(scenario)
        if t["has_metadata"]
        for oid in t["orders"]
    }
    got = {(r.xid, r.csn, r.orderId) for r in out}
    assert got == expected


@given(scenario=st.lists(tx_strategy, min_size=1, max_size=2), seed=st.integers(0, 99))
@settings(**_SETTINGS)
def test_assembly_is_permutation_invariant(spark, scenario, seed):
    """Two different event orders -> identical assembled content (arrays
    compared as sets: buffer order is the only thing allowed to differ)."""
    a = assemble_transactions_batch(_build(spark, scenario, seed)).collect()
    b = assemble_transactions_batch(_build(spark, scenario, seed + 1000)).collect()
    assert _normalize(a) == _normalize(b)


# ---------------------------------------------------------------------------
# SCD1 merge invariants
# ---------------------------------------------------------------------------

batch_strategy = st.lists(  # each element: (order_id, version)
    st.tuples(st.integers(1, 3), st.integers(1, 4)),
    min_size=1,
    max_size=5,
)


def _clauses():
    return [
        MergeClause(
            "update",
            "source.version IS NOT NULL AND source.version > COALESCE(target.version, 0)",
            {"version": "source.version", "payload": "source.payload"},
        ),
        MergeClause("update", None, {"last_touch": "source.version"}),
        MergeClause("insert", "source.version IS NOT NULL"),
    ]


def _apply(spark, state, batch):
    """Consolidate a batch (best row per order) then merge into state."""
    import pandas as pd

    best: dict[int, int] = {}
    for oid, v in batch:
        best[oid] = max(best.get(oid, 0), v)
    src = spark.createDataFrame(
        pd.DataFrame(
            {
                "orderId": list(best),
                "version": [float(v) for v in best.values()],
                "payload": [f"p{oid}v{v}" for oid, v in best.items()],
                "last_touch": [float(v) for v in best.values()],
            }
        )
    )
    return merge_dataframes(
        state, src, "target.orderId = source.orderId", _clauses(),
        ["orderId", "version", "payload", "last_touch"],
    )


@given(batches=st.lists(batch_strategy, min_size=1, max_size=3))
@settings(**_SETTINGS)
def test_scd1_uniqueness_and_no_version_regression(spark, batches):
    """After any batch sequence: orderId unique, version == max version ever
    merged for that order (never regresses), and splitting the same events
    into different batch boundaries yields the same final (orderId, version,
    payload) state."""
    import pandas as pd

    empty = spark.createDataFrame(
        [], "orderId long, version double, payload string, last_touch double"
    )
    state = empty
    for b in batches:
        state = _apply(spark, state, b)
    rows = state.collect()

    ids = [r.orderId for r in rows]
    assert len(ids) == len(set(ids))  # SCD1 uniqueness

    expected_max = {}
    for b in batches:
        for oid, v in b:
            expected_max[oid] = max(expected_max.get(oid, 0), v)
    assert {r.orderId: r.version for r in rows} == {
        k: float(v) for k, v in expected_max.items()
    }  # no version regression, nothing lost

    # batch-boundary invariance: all events in one batch -> same final state
    flat = [ev for b in batches for ev in b]
    alt = _apply(spark, empty, flat).collect()
    assert sorted((r.orderId, r.version, r.payload) for r in alt) == sorted(
        (r.orderId, r.version, r.payload) for r in rows
    )
