"""State-v2 (transformWithStateInPandas) protocol tests, runnable WITHOUT
protobuf.

The v2 operator's Python worker speaks a protobuf-based state-server protocol
that cannot execute in this container, but everything the processor DECIDES —
buffering, metadata handling, event-count completion (>=), out-of-order
arrival, exactly-once clear, multi-order fan-out, TTL wiring — lives in
``TransactionAssemblyProcessor`` and is driven here through a faithful fake of
the ``StatefulProcessorHandle`` (ListState/ValueState scoped per grouping key,
exactly the runtime's state model). One full-runtime smoke test at the bottom
runs the real operator whenever ``google.protobuf`` is available.

Reference parity target: TransactionalCdcProcessingApp.scala:138-223 +
TransactionState.scala:20-68.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark_cdc_engine.streaming.tx_state_v2 import (
    _OUT_COLS,
    TransactionAssemblyProcessor,
)

# ------------------------------------------------------------- fake state v2


class _CurrentKey:
    """Mutable holder the harness advances as it iterates grouping keys —
    mirrors how the runtime scopes one handle's state objects to the key being
    processed."""

    def __init__(self):
        self.key = None


class FakeListState:
    def __init__(self, holder: _CurrentKey, ttl_ms):
        self._holder, self._per_key, self.ttl_ms = holder, {}, ttl_ms

    def _rows(self) -> list:
        return self._per_key.setdefault(self._holder.key, [])

    def appendList(self, rows) -> None:
        self._rows().extend(tuple(r) for r in rows)

    def get(self):
        return iter(list(self._rows()))

    def clear(self) -> None:
        self._per_key.pop(self._holder.key, None)


class FakeValueState:
    def __init__(self, holder: _CurrentKey, ttl_ms):
        self._holder, self._per_key, self.ttl_ms = holder, {}, ttl_ms

    def exists(self) -> bool:
        return self._holder.key in self._per_key

    def get(self):
        return self._per_key[self._holder.key]

    def update(self, value) -> None:
        self._per_key[self._holder.key] = tuple(value)

    def clear(self) -> None:
        self._per_key.pop(self._holder.key, None)


class FakeHandle:
    def __init__(self, holder: _CurrentKey):
        self._holder = holder
        self.states: dict[str, object] = {}

    def getListState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, FakeListState(self._holder, ttlDurationMs))

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, FakeValueState(self._holder, ttlDurationMs))


class V2Harness:
    """Drives TransactionAssemblyProcessor the way the runtime does: init once,
    then per micro-batch group rows by tx_key and call handleInputRows per key
    with the handle's state scoped to that key."""

    def __init__(self, ttl_minutes=None):
        self.holder = _CurrentKey()
        self.handle = FakeHandle(self.holder)
        self.proc = TransactionAssemblyProcessor(ttl_minutes=ttl_minutes)
        self.proc.init(self.handle)

    def batch(self, events: list[dict]) -> pd.DataFrame:
        """events: unified-schema dicts; returns emitted records."""
        out = []
        pdf = pd.DataFrame(events)
        for key, group in pdf.groupby("tx_key", sort=True):
            self.holder.key = key
            for emitted in self.proc.handleInputRows(
                (key,), iter([group]), timerValues=None
            ):
                if len(emitted):
                    out.append(emitted)
        return (
            pd.concat(out, ignore_index=True)
            if out
            else pd.DataFrame(columns=_OUT_COLS)
        )


def _ev(tx, table, op="I", pos="1", before=None, after=None):
    return {
        "tx_key": tx, "event_type": "DATA", "table": f"APPUSER.{table}",
        "op_type": op, "pos": pos, "before": before, "after": after,
        "data_collections": None,
    }


def _meta(tx, counts: dict[str, int]):
    return {
        "tx_key": tx, "event_type": "METADATA", "table": None, "op_type": None,
        "pos": None, "before": None, "after": None,
        "data_collections": [
            {"data_collection": t, "event_count": n} for t, n in counts.items()
        ],
    }


def _order_after(oid, version="1", status="PENDING"):
    return {"ORDER_ID": str(oid), "ORDER_REF": f"ORD-{oid}", "VERSION": version,
            "ORDER_STATUS": status, "TOTAL_AMOUNT": "10.5", "CURRENCY": "USD"}


def _item_after(oid, iid):
    return {"LINE_ITEM_ID": str(iid), "ORDER_ID": str(oid), "VERSION": "1",
            "PRODUCT_ID": f"PROD-{iid}", "ITEM_QTY": "2.0"}


# ---------------------------------------------------------------- scenarios


def test_insert_only_transaction_completes():
    h = V2Harness()
    out = h.batch([
        _ev("x1:c1", "ORDERS", after=_order_after(7)),
        _ev("x1:c1", "ORDER_LINE_ITEMS", pos="2", after=_item_after(7, 71)),
        _meta("x1:c1", {"ORDERS": 1, "ORDER_LINE_ITEMS": 1}),
    ])
    assert len(out) == 1
    r = out.iloc[0]
    assert r.xid == "x1" and r.csn == "c1" and r.orderId == 7.0
    assert len(r.orders) == 1 and r.orders[0]["orderRef"] == "ORD-7"
    assert len(r.lineItems) == 1 and r.lineItems[0]["itemQty"] == 2.0


def test_metadata_first_out_of_order_across_batches():
    """T4: metadata in batch 0, events arrive two batches later — ListState
    buffers persist across handleInputRows calls."""
    h = V2Harness()
    assert len(h.batch([_meta("x2:c2", {"ORDERS": 1, "ORDER_LINE_ITEMS": 1})])) == 0
    assert len(h.batch([_ev("x2:c2", "ORDERS", after=_order_after(8))])) == 0
    out = h.batch([_ev("x2:c2", "ORDER_LINE_ITEMS", pos="2",
                       after=_item_after(8, 81))])
    assert len(out) == 1 and out.iloc[0].orderId == 8.0


def test_completion_is_gte_not_eq():
    """T3: one more event than metadata promised still completes (>=)."""
    h = V2Harness()
    out = h.batch([
        _ev("x3:c3", "ORDERS", after=_order_after(9)),
        _ev("x3:c3", "ORDERS", pos="2", after=_order_after(90)),
        _meta("x3:c3", {"ORDERS": 1}),
    ])
    assert sorted(r["orderId"] for _, r in out.iterrows()) == [9.0, 90.0]


def test_never_completing_parks_forever():
    h = V2Harness()
    # no metadata: parks however many batches pass
    for _ in range(3):
        assert len(h.batch([_ev("x4:c4", "ORDER_LINE_ITEMS",
                                after=_item_after(10, 101))])) == 0
    # metadata expecting MORE events than buffered: still parked
    assert len(h.batch([_meta("x4:c4", {"ORDER_LINE_ITEMS": 3, "ORDERS": 1})])) == 0


def test_state_cleared_after_emit_duplicate_restarts_fresh():
    """T2 exactly-once: after emission the buffers are gone; a replayed
    metadata starts an empty, never-completing buffer."""
    h = V2Harness()
    done = h.batch([
        _ev("x5:c5", "ORDERS", after=_order_after(11)),
        _meta("x5:c5", {"ORDERS": 1}),
    ])
    assert len(done) == 1
    # same key again: metadata alone must not re-emit from stale buffers
    assert len(h.batch([_meta("x5:c5", {"ORDERS": 1})])) == 0


def test_multi_order_transaction_fans_out():
    h = V2Harness()
    out = h.batch([
        _ev("x6:c6", "ORDERS", after=_order_after(1)),
        _ev("x6:c6", "ORDERS", pos="2", after=_order_after(2)),
        _ev("x6:c6", "ORDER_LINE_ITEMS", pos="3", after=_item_after(2, 21)),
        _meta("x6:c6", {"ORDERS": 2, "ORDER_LINE_ITEMS": 1}),
    ])
    rows = {r["orderId"]: r for _, r in out.iterrows()}
    assert set(rows) == {1.0, 2.0}
    assert len(rows[2.0]["lineItems"]) == 1 and len(rows[1.0]["lineItems"]) == 0


def test_keys_are_isolated():
    h = V2Harness()
    out = h.batch([
        _ev("a:1", "ORDERS", after=_order_after(1)),
        _meta("a:1", {"ORDERS": 1}),
        _ev("b:2", "ORDERS", after=_order_after(2)),  # no metadata: parks
    ])
    assert len(out) == 1 and out.iloc[0].xid == "a"
    assert len(h.batch([_meta("b:2", {"ORDERS": 1})])) == 1


def test_ttl_wired_into_every_state(monkeypatch):
    """ttl_minutes must reach each ListState/ValueState as ttlDurationMs —
    state v2's native TTL replaces v1's hand-armed timeout."""
    h = V2Harness(ttl_minutes=5)
    assert {s.ttl_ms for s in h.handle.states.values()} == {300_000}
    h0 = V2Harness()
    assert {s.ttl_ms for s in h0.handle.states.values()} == {None}


def test_v2_full_runtime_smoke(spark, tmp_path):
    """End-to-end transformWithStateInPandas run against the REAL JVM state
    server. Where google.protobuf is absent, the minipb wire-format shim
    (streaming/minipb.py) supplies the StateMessage codec — installed at
    processor unpickle time in each worker — so this executes everywhere:
    no skip, genuine ListState/ValueState traffic either way."""
    from pyspark_cdc_engine.streaming.pipeline import cdc_to_scd2_stream
    from pyspark_cdc_engine.tables import DeltaliteTable
    from tests.cdc_fixtures import insert_tx, write_fixture_files

    base = tmp_path / "v2rt"
    txs = [insert_tx(7, "1.1.1", "5001"), insert_tx(8, "1.1.2", "5002")]
    write_fixture_files(base / "cdc", base / "meta", txs)
    table = DeltaliteTable(spark, str(base / "order_stream"))
    q = cdc_to_scd2_stream(spark, str(base / "cdc"), str(base / "meta"),
                           table, str(base / "ckpt"), impl="v2")
    q.awaitTermination(120)
    rows = table.read().collect()
    assert sorted(r.orderId for r in rows) == [7.0, 8.0]
    assert all(len(r.lineItems) >= 1 for r in rows)

    # cross-micro-batch state (T4 on the real runtime): events drain first and
    # must park in the JVM state store; the metadata arriving in a later run
    # (fresh query, same checkpoint) completes the transaction from state
    b9 = insert_tx(9, "1.1.3", "5003")
    write_fixture_files(base / "cdc", base / "scratch_meta", [b9],
                        metadata_for=[], file_prefix="batch1")
    q2 = cdc_to_scd2_stream(spark, str(base / "cdc"), str(base / "meta"),
                            table, str(base / "ckpt"), impl="v2")
    q2.awaitTermination(120)
    assert sorted(r.orderId for r in table.read().collect()) == [7.0, 8.0]  # parked
    write_fixture_files(base / "scratch_cdc", base / "meta", [],
                        metadata_for=[b9], file_prefix="batch2")
    q3 = cdc_to_scd2_stream(spark, str(base / "cdc"), str(base / "meta"),
                            table, str(base / "ckpt"), impl="v2")
    q3.awaitTermination(120)
    assert sorted(r.orderId for r in table.read().collect()) == [7.0, 8.0, 9.0]
