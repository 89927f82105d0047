"""Golden tests for the SCD1 version-aware merge (SURVEY §2.9; the
SCD_TYPE1_README.md:109-153 worked scenario + FIXTURES.md A3 variants)."""

from __future__ import annotations

import pytest

from pyspark_cdc_engine.scd1 import merge_scd1, scd2_to_scd1_stream, transform_source_batch
from pyspark_cdc_engine.schemas import ORDER_STREAM_SCHEMA
from pyspark_cdc_engine.tables import DeltaliteTable


def _complete(spec: dict, schema) -> dict:
    """Recursively fill missing struct fields with None so hand-written specs
    stay readable."""
    from pyspark.sql.types import ArrayType, StructType

    out = {}
    for f in schema.fields:
        v = spec.get(f.name)
        if isinstance(f.dataType, StructType) and isinstance(v, dict):
            v = _complete(v, f.dataType)
        elif isinstance(f.dataType, ArrayType) and isinstance(v, list) and isinstance(
            f.dataType.elementType, StructType
        ):
            v = [_complete(e, f.dataType.elementType) if isinstance(e, dict) else e for e in v]
        out[f.name] = v
    return out


def _stream_rows(spark, specs: list[dict]):
    return spark.createDataFrame(
        [_complete(s, ORDER_STREAM_SCHEMA) for s in specs], ORDER_STREAM_SCHEMA
    )


def _order(oid: float, version: float, amount: float = 25250.0, **kw) -> dict:
    return {"orderId": oid, "orderRef": f"ORD-{int(oid)}", "version": version,
            "totalAmount": amount, "currency": "USD", **kw}


def _item(oid: float, iid: float, version: float, qty: float) -> dict:
    return {"lineItemId": iid, "orderId": oid, "version": version,
            "productId": f"PROD-{int(iid)}", "itemQty": qty}


@pytest.fixture()
def scd1_table(spark, tmp_path):
    return DeltaliteTable(spark, str(tmp_path / "orders_current"))


def test_golden_readme_scenario(spark, scd1_table):
    """SCD_TYPE1_README.md:109-153: same order version (clause 2), one line
    item updated to v2, the other preserved at v1."""
    initial = _stream_rows(spark, [{
        "xid": "x0", "csn": "c0", "dwhProcessedTs": "t0", "orderId": 248.0,
        "orders": [_order(248.0, 2.0)],
        "orderDetails": [{"orderId": 248.0, "version": 1.0, "shippingMethod": "EXPRESS",
                          "trackingNumber": "TRK-00000248"}],
        "lineItems": [_item(248.0, 1.0, 1.0, 600.0), _item(248.0, 2.0, 1.0, 400.0)],
    }])
    merge_scd1(spark, initial, scd1_table)

    update = _stream_rows(spark, [{
        "xid": "x1", "csn": "c1", "dwhProcessedTs": "t1", "orderId": 248.0,
        "orders": [_order(248.0, 2.0)],
        "orderDetails": [{"orderId": 248.0, "version": 1.0, "shippingMethod": "EXPRESS",
                          "trackingNumber": "TRK-00000248"}],
        "lineItems": [_item(248.0, 1.0, 2.0, 700.0)],
    }])
    merge_scd1(spark, update, scd1_table)

    rows = scd1_table.read().collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.orderId == 248.0 and r.version == 2.0 and r.totalAmount == 25250.0
    assert r.xid == "x1" and r.dwhProcessedTs == "t1"  # tx context refreshed
    assert r.orderDetails.version == 1.0 and r.orderDetails.shippingMethod == "EXPRESS"
    items = {li.lineItemId: li for li in r.lineItems}
    assert set(items) == {1.0, 2.0}
    assert items[1.0].version == 2.0 and items[1.0].itemQty == 700.0
    assert items[2.0].version == 1.0 and items[2.0].itemQty == 400.0


def test_cross_row_consolidation(spark, scd1_table):
    """Scenario 8: creation + child-only update for one orderId in the SAME
    batch — naive top-1 dedup would drop the child update
    (MEDIUM_ARTICLE.md:466-474)."""
    batch = _stream_rows(spark, [
        {"xid": "x0", "csn": "c0", "dwhProcessedTs": "t0", "orderId": 9.0,
         "orders": [_order(9.0, 1.0)],
         "orderDetails": [{"orderId": 9.0, "version": 1.0, "carrier": "UPS"}],
         "lineItems": [_item(9.0, 91.0, 1.0, 5.0)]},
        {"xid": "x0", "csn": "c1", "dwhProcessedTs": "t1", "orderId": 9.0,
         "orders": [], "orderDetails": [],
         "lineItems": [_item(9.0, 92.0, 1.0, 7.0), _item(9.0, 91.0, 2.0, 6.0)]},
    ])
    t = transform_source_batch(batch).collect()
    assert len(t) == 1
    row = t[0]
    assert row.version == 1.0 and row.orderRef == "ORD-9"  # from the creation row
    items = {li.lineItemId: li for li in row.lineItems}
    assert items[91.0].version == 2.0 and items[91.0].itemQty == 6.0  # consolidated
    assert items[92.0].version == 1.0
    merge_scd1(spark, batch, scd1_table)
    assert scd1_table.read().count() == 1


def test_duplicate_replay_is_noop(spark, scd1_table):
    """Scenario 7: replaying the same versions changes nothing (ties lose)."""
    batch = _stream_rows(spark, [{
        "xid": "x0", "csn": "c0", "dwhProcessedTs": "t0", "orderId": 1.0,
        "orders": [_order(1.0, 3.0, amount=99.0)],
        "orderDetails": [{"orderId": 1.0, "version": 2.0, "carrier": "DHL"}],
        "lineItems": [_item(1.0, 11.0, 4.0, 2.0)],
    }])
    merge_scd1(spark, batch, scd1_table)
    before = scd1_table.read().collect()[0]
    merge_scd1(spark, batch, scd1_table)
    after = scd1_table.read().collect()[0]
    assert after.version == before.version == 3.0
    assert after.totalAmount == 99.0
    assert after.orderDetails.version == 2.0 and after.orderDetails.carrier == "DHL"
    assert [li.version for li in after.lineItems] == [4.0]
    assert scd1_table.read().count() == 1


def test_bootstrap_replay_detected_by_txn_tag(spark, scd1_table):
    """Batch-0 replay (crash after bootstrap overwrite commit, before
    checkpoint write): the overwrite records the txn tag, so the replayed
    batch is SKIPPED by the merge path's replay check — no second commit,
    not merely coincidentally-idempotent clauses."""
    batch = _stream_rows(spark, [{
        "xid": "x0", "csn": "c0", "dwhProcessedTs": "t0", "orderId": 1.0,
        "orders": [_order(1.0, 1.0, amount=10.0)],
        "orderDetails": None, "lineItems": None,
    }])
    merge_scd1(spark, batch, scd1_table, txn_app="boot", txn_version=0)
    v_after_boot = scd1_table.latest_version()
    assert scd1_table.history()[0]["txn"] == {"app": "boot", "version": 0}
    merge_scd1(spark, batch, scd1_table, txn_app="boot", txn_version=0)  # replay
    assert scd1_table.latest_version() == v_after_boot  # no new commit at all
    assert scd1_table.read().count() == 1


def test_child_only_unknown_order_not_inserted(spark, scd1_table):
    """Insert guard: child-only tx for an order the target doesn't know stays
    out (whenNotMatched condition, ScdType1MergeApp.scala:130-131)."""
    known = _stream_rows(spark, [{
        "xid": "x0", "csn": "c0", "dwhProcessedTs": "t0", "orderId": 1.0,
        "orders": [_order(1.0, 1.0)], "orderDetails": [], "lineItems": [],
    }])
    merge_scd1(spark, known, scd1_table)
    child_only = _stream_rows(spark, [{
        "xid": "x1", "csn": "c1", "dwhProcessedTs": "t1", "orderId": 404.0,
        "orders": [], "orderDetails": [],
        "lineItems": [_item(404.0, 1.0, 1.0, 1.0)],
    }])
    merge_scd1(spark, child_only, scd1_table)
    assert [r.orderId for r in scd1_table.read().collect()] == [1.0]


def test_version_regression_keeps_target_fields(spark, scd1_table):
    """Late/old order version: order fields keep target values; only tx context
    moves (clause 2)."""
    merge_scd1(spark, _stream_rows(spark, [{
        "xid": "x0", "csn": "c0", "dwhProcessedTs": "t0", "orderId": 5.0,
        "orders": [_order(5.0, 4.0, amount=500.0)], "orderDetails": [], "lineItems": [],
    }]), scd1_table)
    merge_scd1(spark, _stream_rows(spark, [{
        "xid": "x9", "csn": "c9", "dwhProcessedTs": "t9", "orderId": 5.0,
        "orders": [_order(5.0, 2.0, amount=111.0)], "orderDetails": [], "lineItems": [],
    }]), scd1_table)
    r = scd1_table.read().collect()[0]
    assert r.version == 4.0 and r.totalAmount == 500.0  # target kept
    assert r.xid == "x9" and r.dwhProcessedTs == "t9"  # context refreshed


def test_full_chain_cdc_to_scd1(spark, tmp_path):
    """End-to-end §3.1 + §3.2: CDC files -> SCD2 stream -> SCD1 stream; SCD1
    rows are unique per orderId (the reference's primary validation probe,
    db/query_scd1_table.sql:14-19)."""
    from pyspark_cdc_engine.streaming.pipeline import cdc_to_scd2_stream
    from tests.cdc_fixtures import insert_tx, write_fixture_files

    base = tmp_path / "chain"
    txs = [insert_tx(i, f"x.{i}", f"9{i:03d}") for i in range(1, 5)]
    write_fixture_files(base / "cdc", base / "meta", txs)
    scd2 = DeltaliteTable(spark, str(base / "order_stream"))
    q = cdc_to_scd2_stream(spark, str(base / "cdc"), str(base / "meta"), scd2, str(base / "ck2"))
    q.awaitTermination(120)

    scd1 = DeltaliteTable(spark, str(base / "orders_current"))
    q2 = scd2_to_scd1_stream(spark, scd2, scd1, str(base / "ck1"))
    q2.awaitTermination(120)

    rows = scd1.read().collect()
    assert len(rows) == 4
    assert len({r.orderId for r in rows}) == 4  # uniqueness probe
    by_id = {r.orderId: r for r in rows}
    assert by_id[1.0].orderRef == "ORD-000001" and by_id[1.0].version == 1.0
    assert by_id[1.0].orderDetails is not None
    assert len(by_id[3.0].lineItems) == 2 + 3 % 4


def test_partitioned_orders_current_matches_flat(spark, tmp_path):
    """orders_current partitioned by currency at bootstrap: merges inherit the
    spec, content is identical to the unpartitioned table, and the data dirs
    really are currency-partitioned."""
    batches = [
        _stream_rows(spark, [{
            "xid": "x0", "csn": "c0", "dwhProcessedTs": "t0", "orderId": 1.0,
            "orders": [_order(1.0, 1.0)],
            "lineItems": [_item(1.0, 1.0, 1.0, 5.0)],
        }, {
            "xid": "x0", "csn": "c0", "dwhProcessedTs": "t0", "orderId": 2.0,
            "orders": [dict(_order(2.0, 1.0), currency="EUR")],
            "lineItems": [_item(2.0, 2.0, 1.0, 7.0)],
        }]),
        _stream_rows(spark, [{
            "xid": "x1", "csn": "c1", "dwhProcessedTs": "t1", "orderId": 1.0,
            "orders": [_order(1.0, 2.0, amount=99.0)],
            "lineItems": [],
        }]),
    ]
    flat = DeltaliteTable(spark, str(tmp_path / "flat"))
    parted = DeltaliteTable(spark, str(tmp_path / "parted"))
    for i, b in enumerate(batches):
        merge_scd1(spark, b, flat, txn_app="f", txn_version=i)
        merge_scd1(spark, b, parted, txn_app="p", txn_version=i,
                   partition_by=["currency"])
    assert parted._read_commit(parted.latest_version())["partition_by"] == ["currency"]
    live = parted._read_commit(parted.latest_version())["live"]
    assert any("currency=USD" in d and (parted._root / d).exists() for d in live)
    f = {(r.orderId, r.version, r.totalAmount, r.currency)
         for r in flat.read().collect()}
    p = {(r.orderId, r.version, r.totalAmount, r.currency)
         for r in parted.read().collect()}
    assert f == p and len(p) == 2
    assert {r.totalAmount for r in parted.read().filter("orderId = 1.0").collect()} == {99.0}
