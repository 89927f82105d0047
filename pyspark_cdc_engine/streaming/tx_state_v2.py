"""Transaction assembly on Spark 4's arbitrary-state v2
(``transformWithStateInPandas`` + ``StatefulProcessor``) — the
SURVEY-preferred realization of J1/T1-T4 (the ``applyInPandasWithState``
version in :mod:`.tx_state` is retained as the stable fallback and the
semantics oracle; both share the completion protocol and the joiner).

Why v2 is the 100 TB choice: each buffer is a RocksDB-backed ``ListState`` —
appending an event is O(1) (one list-append per event) instead of
deserialize-whole-buffer → append → reserialize per micro-batch, so a
long-running transaction that accumulates events across hundreds of batches
costs amortized O(events), not O(events x batches). TTL is a first-class
state property (``ttlDurationMs``) instead of hand-rolled timeout handling.

Environment note: the v2 operator's Python worker speaks a protobuf-based
state-server protocol. In containers without ``google.protobuf`` the
wire-compatible shim (:mod:`pyspark_cdc_engine.streaming.minipb`) is installed
at processor-unpickle time in every worker, so the REAL runtime executes
everywhere — the e2e golden runs unconditionally. The pipeline still defaults
to v1 (the longer-proven path); v2 is one ``impl="v2"`` away.

Semantics preserved exactly (same protocol as tx_state.py):
- buffers accumulate across micro-batches, metadata may arrive any time (T4);
- complete ⟺ metadata present AND each per-table buffer count >= expected (T3);
- on completion: denormalize via the joiner, emit, clear state (T2).
"""

from __future__ import annotations

import json
import sys
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

import pyspark_cdc_engine.joiner
import pyspark_cdc_engine.schemas
import pyspark_cdc_engine.streaming.tx_state
import pyspark_cdc_engine.streaming._state_message_spec
import pyspark_cdc_engine.streaming.minipb
from pyspark_cdc_engine.joiner import join_transaction
from pyspark_cdc_engine.streaming import minipb
from pyspark_cdc_engine.schemas import ORDER_STREAM_SCHEMA
from pyspark_cdc_engine.streaming.tx_state import (
    _as_dict,
    _expected_counts,
    _table_suffix,
)

for _cp_name in ("pyspark.cloudpickle", "cloudpickle"):
    try:  # pragma: no cover
        import importlib

        _cp = importlib.import_module(_cp_name)
        _cp.register_pickle_by_value(pyspark_cdc_engine.joiner)
        _cp.register_pickle_by_value(pyspark_cdc_engine.schemas)
        _cp.register_pickle_by_value(pyspark_cdc_engine.streaming.tx_state)
        _cp.register_pickle_by_value(pyspark_cdc_engine.streaming._state_message_spec)
        _cp.register_pickle_by_value(pyspark_cdc_engine.streaming.minipb)
        _cp.register_pickle_by_value(sys.modules[__name__])
    except (ImportError, AttributeError):
        pass

_OUT_COLS = [f.name for f in ORDER_STREAM_SCHEMA.fields]
# Buffered event: before/after images travel as JSON strings inside the state
# row (MAP-in-state is avoidable complexity; the images are small).
_EVENT_STATE_SCHEMA = "op_type string, pos string, before string, after string"
_META_STATE_SCHEMA = "expected string"

_TABLES = ("ORDERS", "ORDER_DETAILS", "ORDER_LINE_ITEMS")


class TransactionAssemblyProcessor(StatefulProcessor):
    """ListState-per-buffer transaction assembler (processTransaction parity)."""

    def __init__(self, ttl_minutes: float | None = None, handle_deletes: bool = False):
        self._ttl_ms = int(ttl_minutes * 60_000) if ttl_minutes else None
        self._handle_deletes = handle_deletes

    def __setstate__(self, state: dict) -> None:
        # Runs at unpickle time in EVERY worker process (driver pre-init
        # worker and each executor task) — i.e. strictly before the runtime's
        # first state-server call (set_handle_state precedes even init() in
        # _handle_pre_init). The earliest reliable point to route pyspark's
        # protobuf-generated StateMessage module to the wire-compatible shim
        # where google.protobuf is absent (see minipb module doc); a no-op
        # wherever real protobuf ships.
        minipb.install()
        self.__dict__.update(state)

    def init(self, handle: StatefulProcessorHandle) -> None:
        minipb.install()  # also covers driver-side construction without pickling
        self._buffers = {
            t: handle.getListState(f"buf_{t.lower()}", _EVENT_STATE_SCHEMA, self._ttl_ms)
            for t in _TABLES
        }
        self._meta = handle.getValueState("meta", _META_STATE_SCHEMA, self._ttl_ms)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        tx_key = key[0]
        parts = tx_key.split(":")
        xid, csn = (parts[0], parts[1]) if len(parts) == 2 else (tx_key, "")

        expected = None
        if self._meta.exists():
            expected = json.loads(self._meta.get()[0])

        appended: dict[str, list[tuple]] = {t: [] for t in _TABLES}
        for pdf in rows:
            for row in pdf.itertuples(index=False):
                if row.event_type == "METADATA":
                    expected = _expected_counts(row.data_collections)
                    self._meta.update((json.dumps(expected),))
                else:
                    table = _table_suffix(row.table)
                    if table in appended:
                        appended[table].append(
                            (
                                row.op_type,
                                row.pos,
                                json.dumps(_as_dict(row.before)),
                                json.dumps(_as_dict(row.after)),
                            )
                        )
        for t, evs in appended.items():
            if evs:
                self._buffers[t].appendList(evs)  # O(1) amortized per event

        if expected is None:
            yield pd.DataFrame(columns=_OUT_COLS)
            return

        buffers: dict[str, list[dict]] = {}
        for t in _TABLES:
            buffers[t] = [
                {
                    "op_type": r[0],
                    "pos": r[1],
                    "before": json.loads(r[2]),
                    "after": json.loads(r[3]),
                }
                for r in self._buffers[t].get()
            ]
        complete = all(len(buffers[t]) >= expected.get(t, 0) for t in _TABLES)
        if not complete:
            yield pd.DataFrame(columns=_OUT_COLS)
            return

        ts = datetime.now(timezone.utc).isoformat()
        records = join_transaction(
            xid, csn, buffers["ORDERS"], buffers["ORDER_DETAILS"],
            buffers["ORDER_LINE_ITEMS"], ts, handle_deletes=self._handle_deletes,
        )
        for st in self._buffers.values():
            st.clear()
        self._meta.clear()  # T2: emitted exactly once; replay re-buffers fresh
        yield pd.DataFrame(records, columns=_OUT_COLS)

    def close(self) -> None:
        pass


def assemble_transactions_stream_v2(
    unified: DataFrame,
    ttl_minutes: float | None = None,
    handle_deletes: bool = False,
) -> DataFrame:
    """State-v2 face of tx_state.assemble_transactions_stream — same input
    contract (unified tagged event stream keyed by tx_key), same output."""
    return unified.groupBy("tx_key").transformWithStateInPandas(
        statefulProcessor=TransactionAssemblyProcessor(
            ttl_minutes=ttl_minutes, handle_deletes=handle_deletes
        ),
        outputStructType=ORDER_STREAM_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
