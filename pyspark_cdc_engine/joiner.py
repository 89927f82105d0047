"""Per-transaction denormalization: buffered CDC events -> OrderStream records.

Reference parity: OrderJoiner.joinTransaction (OrderJoiner.scala:29-88) —
group the transaction's order/detail/lineItem events by ORDER_ID into one
nested record per order, attaching before images; and the Jackson
string-coercion layer (OrderJoiner.scala:92-98) reproduced as explicit
float coercion. Events with null ``after`` (deletes) are skipped by default,
matching the reference's IGNOREDELETES posture (SURVEY §2.8 note);
``handle_deletes=True`` opts into order-level tombstones instead.

Runs inside the keyed state function on executors — plain dict work on a
handful of events per transaction, never driver-side.
"""

from __future__ import annotations

from typing import Any

from pyspark_cdc_engine.schemas import (
    DETAIL_FIELDS,
    LINE_ITEM_FIELDS,
    ORDER_FIELDS,
)


def _coerce(raw: dict[str, str] | None, fields: list[tuple[str, str, str]]) -> dict[str, Any] | None:
    """UPPERCASE string map -> typed camelCase dict (Jackson-leniency parity:
    numeric strings coerce to float, blank/invalid -> None, unknown keys ignored)."""
    if raw is None:
        return None
    out: dict[str, Any] = {}
    for gg_name, out_name, typ in fields:
        v = raw.get(gg_name)
        if v is None:
            out[out_name] = None
        elif typ == "double":
            try:
                out[out_name] = float(v)
            except (TypeError, ValueError):
                out[out_name] = None
        else:
            out[out_name] = str(v)
    return out


def _entity(event: dict[str, Any], fields: list[tuple[str, str, str]]) -> dict[str, Any] | None:
    """One CDC event -> typed entity with nested before image; None for deletes."""
    after = _coerce(event.get("after"), fields)
    if after is None:
        return None
    after["before"] = _coerce(event.get("before"), fields)
    return after


def join_transaction(
    xid: str,
    csn: str,
    order_events: list[dict[str, Any]],
    detail_events: list[dict[str, Any]],
    item_events: list[dict[str, Any]],
    processing_ts: str,
    handle_deletes: bool = False,
) -> list[dict[str, Any]]:
    """Assemble one OrderStream record per distinct orderId touched by the
    transaction (hash-join with build side = orders, OrderJoiner.scala:29-88).
    A transaction touching N orders emits N records; child-only transactions
    emit records with empty ``orders`` arrays.

    ``handle_deletes`` (opt-in, SURVEY §2.8 — default off for parity with
    gg-configs/replicat/rep3.prm:6 IGNOREDELETES): an ORDERS op_type='D'
    event tombstones the order — the record carries the delete's before image
    as the last-known state and ``deleted=True``, which the SCD1 merge's
    whenMatchedDelete clause turns into a row removal. Child-table deletes
    remain ignored in both modes (order-granularity tombstones only)."""
    per_order: dict[float | None, dict[str, Any]] = {}

    def stream_for(order_id: float | None) -> dict[str, Any]:
        if order_id not in per_order:
            per_order[order_id] = {
                "xid": xid,
                "csn": csn,
                "dwhProcessedTs": processing_ts,
                "orderId": order_id,
                "orders": [],
                "orderDetails": [],
                "lineItems": [],
                "deleted": False,
            }
        return per_order[order_id]

    for ev in order_events:
        if handle_deletes and ev.get("op_type") == "D":
            # GG delete events carry the row in `before` (after is null)
            last_known = _coerce(ev.get("before"), ORDER_FIELDS)
            if last_known is not None:
                last_known["before"] = None
                rec = stream_for(last_known["orderId"])
                rec["orders"].append(last_known)
                rec["deleted"] = True
            continue
        ent = _entity(ev, ORDER_FIELDS)
        if ent is not None:
            rec = stream_for(ent["orderId"])
            rec["orders"].append(ent)
            # last order-level op wins: a D followed by a re-insert/update of
            # the same orderId within the transaction must NOT tombstone the
            # order (events iterate in buffer order)
            rec["deleted"] = False
    for ev in detail_events:
        ent = _entity(ev, DETAIL_FIELDS)
        if ent is not None:
            stream_for(ent["orderId"])["orderDetails"].append(ent)
    for ev in item_events:
        ent = _entity(ev, LINE_ITEM_FIELDS)
        if ent is not None:
            stream_for(ent["orderId"])["lineItems"].append(ent)

    return list(per_order.values())
