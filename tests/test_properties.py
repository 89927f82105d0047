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


# ---------------------------------------------------------------------------
# End-to-end model-based check: random tx sequences -> assembly -> SCD1 merge
# must equal a pure-Python model of §2.9 (independent parent/child versioning)
# ---------------------------------------------------------------------------

op_strategy = st.sampled_from(["create", "update_order", "update_item"])


@given(
    ops=st.lists(op_strategy, min_size=2, max_size=8),
    batch_splits=st.integers(1, 3),
)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
def test_e2e_scd1_matches_python_model(spark, tmp_path_factory, ops, batch_splits):
    from pyspark_cdc_engine.scd1 import merge_scd1
    from pyspark_cdc_engine.streaming.pipeline import assemble_transactions_batch
    from pyspark_cdc_engine.tables import DeltaliteTable
    from tests.cdc_fixtures import _item_after, _order_after

    # --- generate a deterministic transaction sequence + python model
    model: dict[int, dict] = {}
    txs = []
    next_order = 1
    for i, op in enumerate(ops):
        b = TxBuilder(f"e.{i}", f"{7000 + i}")
        if op == "create" or not model:
            oid = next_order
            next_order += 1
            b.order(oid, version=1)
            b.detail(oid, version=1)
            b.item(oid, 1, version=1, qty=1.0)
            model[oid] = {"version": 1.0, "status": "PENDING",
                          "items": {oid * 100 + 1: 1.0}}
        elif op == "update_order":
            oid = sorted(model)[i % len(model)]
            v = model[oid]["version"] + 1
            b.order(oid, op="U", version=int(v), status="CONFIRMED",
                    before=_order_after(oid, int(v - 1)))
            model[oid]["version"] = v
            model[oid]["status"] = "CONFIRMED"
        else:  # child-only line-item update
            oid = sorted(model)[i % len(model)]
            item_no = 1
            li_id = oid * 100 + item_no
            v = model[oid]["items"].get(li_id, 0.0) + 1
            b.item(oid, item_no, op="U", version=int(v), qty=float(v))
            model[oid]["items"][li_id] = v
        txs.append(b)

    # --- run through assembly + merge in `batch_splits` micro-batches
    import json as _json

    tmp = tmp_path_factory.mktemp("e2e")
    scd1 = DeltaliteTable(spark, str(tmp / "orders_current"))
    # contiguous batches preserve the version sequence across micro-batches
    size = (len(txs) + batch_splits - 1) // batch_splits
    chunks = [txs[i: i + size] for i in range(0, len(txs), size)]
    for chunk in chunks:
        cdc_lines = [_json.dumps(e) for b in chunk for e in b.events]
        meta_lines = [_json.dumps(b.metadata()) for b in chunk]
        cdc = parse_data_change_events(
            spark.createDataFrame([(x,) for x in cdc_lines] or [(None,)], "value string")
        )
        meta = parse_transaction_metadata(
            spark.createDataFrame([(x,) for x in meta_lines] or [(None,)], "value string")
        )
        batch = assemble_transactions_batch(unify_event_streams(cdc, meta))
        merge_scd1(spark, batch, scd1)

    # --- compare with the model
    rows = {r.orderId: r for r in scd1.read().collect()}
    assert set(rows) == {float(k) for k in model}
    for oid, m in model.items():
        r = rows[float(oid)]
        assert r.version == m["version"], (oid, "order version")
        assert r.orderStatus == m["status"], (oid, "status")
        got_items = {li.lineItemId: li.version for li in (r.lineItems or [])}
        assert got_items == {float(k): v for k, v in m["items"].items()}, (oid, "items")


# --------------------------------------------------- column-mapping model check

# A random program of schema-evolution ops, checked against a pure-Python
# model: after any sequence of rename/drop/add/append, read() must equal the
# model exactly (names, order, values), and every rename/drop must be log-only.
_cm_op = st.one_of(
    st.tuples(st.just("rename"), st.integers(0, 5), st.integers(0, 99)),
    st.tuples(st.just("drop"), st.integers(0, 5)),
    st.tuples(st.just("add"), st.integers(0, 99)),
    st.tuples(st.just("append"), st.integers(1, 3)),
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(ops=st.lists(_cm_op, min_size=1, max_size=6))
def test_column_mapping_random_program_matches_model(spark, tmp_path_factory, ops):
    from pyspark_cdc_engine.tables import DeltaliteTable

    tmp = tmp_path_factory.mktemp("cmprop")
    t = DeltaliteTable(spark, str(tmp / "t"))
    # model: list of (logical_name,) column order + dict of rows {id: {col: val}}
    cols = ["id", "c0", "c1"]
    rows = {i: {"id": i, "c0": i * 10, "c1": i * 100} for i in range(3)}
    t.overwrite(
        spark.createDataFrame(
            [tuple(rows[i][c] for c in cols) for i in sorted(rows)],
            "id long, c0 long, c1 long",
        )
    )
    next_id = 100
    fresh = 0
    for op in ops:
        kind = op[0]
        if kind == "rename":
            if len(cols) <= 1:
                continue
            old = cols[1:][op[1] % (len(cols) - 1)]
            new = f"r{op[2]}"
            if new in cols:
                continue
            t.rename_column(old, new)
            cols[cols.index(old)] = new
            for r in rows.values():
                r[new] = r.pop(old)
        elif kind == "drop":
            if len(cols) <= 2:
                continue  # keep id + one data column
            victim = cols[1:][op[1] % (len(cols) - 1)]
            t.drop_column(victim)
            cols.remove(victim)
            for r in rows.values():
                r.pop(victim)
        elif kind == "add":
            name = f"a{op[1]}"
            if name in cols:
                continue
            t.add_column(name, "long")
            cols.append(name)
            for r in rows.values():
                r[name] = None
        else:  # append
            new_rows = {}
            for _ in range(op[1]):
                new_rows[next_id] = {
                    c: (next_id if c == "id" else next_id * 7) for c in cols
                }
                next_id += 1
            t.append(
                spark.createDataFrame(
                    [tuple(nr[c] for c in cols) for nr in new_rows.values()],
                    ", ".join(f"{c} long" for c in cols),
                )
            )
            rows.update(new_rows)
        fresh += 1

    got = t.read()
    assert got.columns == cols
    got_rows = {r["id"]: r.asDict() for r in got.collect()}
    assert got_rows == rows


# ------------------------------------------------------- DML model check (r5)

_dml_op = st.one_of(
    st.tuples(st.just("append"), st.integers(1, 3)),
    st.tuples(st.just("delete"), st.integers(0, 120), st.integers(1, 40)),
    st.tuples(st.just("update"), st.integers(0, 120), st.integers(1, 40),
              st.integers(1, 9)),
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
@given(ops=st.lists(_dml_op, min_size=1, max_size=5))
def test_dml_random_program_matches_model(spark, tmp_path_factory, ops):
    """delete/update/append in any order must leave the table exactly equal
    to a plain-Python dict model — including prune_bounds pruning, which must
    never change results (only IO)."""
    from pyspark_cdc_engine.tables import DeltaliteTable

    tmp = tmp_path_factory.mktemp("dml")
    t = DeltaliteTable(spark, str(tmp / "t"))
    rows = {i: i * 10 for i in range(20)}  # id -> v
    t.overwrite(
        spark.createDataFrame([(k, v) for k, v in rows.items()], "id long, v long")
    )
    next_id = 100
    for op in ops:
        if op[0] == "append":
            new = {next_id + j: (next_id + j) * 10 for j in range(op[1])}
            next_id += op[1]
            t.append(spark.createDataFrame(list(new.items()), "id long, v long"))
            rows.update(new)
        elif op[0] == "delete":
            lo, width = op[1], op[2]
            t.delete(f"id BETWEEN {lo} AND {lo + width}",
                     prune_bounds={"id": (lo, lo + width)})
            rows = {k: v for k, v in rows.items() if not (lo <= k <= lo + width)}
        else:
            lo, width, bump = op[1], op[2], op[3]
            t.update({"v": f"v + {bump}"}, f"id BETWEEN {lo} AND {lo + width}",
                     prune_bounds={"id": (lo, lo + width)})
            rows = {k: (v + bump if lo <= k <= lo + width else v)
                    for k, v in rows.items()}
    got = {r.id: r.v for r in t.read().collect()}
    assert got == rows
