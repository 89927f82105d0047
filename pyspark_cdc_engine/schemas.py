"""StructType constants for the CDC pipeline.

Replaces the reference's JVM bean + Jackson layer (model/order/*.scala,
model/generic/*.scala) with native Spark types. GG payloads use UPPERCASE
column names (e.g. ORDER_ID) that map to camelCase output fields; the mapping
tables here drive both the Python joiner coercion and the SQL that builds
typed structs from the raw MAP<STRING,STRING> images.

Reference parity: db/create_table.deltalake.sql:9-90 (order_stream),
db/create_scd1_table.deltalake.sql:9-91 (orders_current),
TransactionalCdcProcessingApp.scala:98-100,119-120 (parse schemas),
model/order/Order.scala:17-31 et al. (field mappings).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------- parse schemas
# TransactionalCdcProcessingApp.scala:98-100 — DDL-string schema for GG "op" docs.
CDC_EVENT_SCHEMA = StructType(
    [
        StructField("table", StringType()),
        StructField("op_type", StringType()),
        StructField("op_ts", StringType()),
        StructField("current_ts", StringType()),
        StructField("pos", StringType()),
        StructField("csn", StringType()),
        StructField("xid", StringType()),
        StructField("before", MapType(StringType(), StringType())),
        StructField("after", MapType(StringType(), StringType())),
    ]
)

# TransactionalCdcProcessingApp.scala:119-120 — tx-metadata control docs.
DATA_COLLECTION_SCHEMA = StructType(
    [
        StructField("data_collection", StringType()),
        StructField("event_count", IntegerType()),
    ]
)
TX_METADATA_SCHEMA = StructType(
    [
        StructField("xid", StringType()),
        StructField("csn", StringType()),
        StructField("tx_ts", StringType()),
        StructField("event_count", IntegerType()),
        StructField("data_collections", ArrayType(DATA_COLLECTION_SCHEMA)),
    ]
)

# Unified event frame after union (TransactionalCdcProcessingApp.scala:59-62):
# CDC rows carry null expected_count/data_collections; metadata rows carry null
# table/op/pos/before/after.
UNIFIED_EVENT_SCHEMA = StructType(
    [
        StructField("table", StringType()),
        StructField("op_type", StringType()),
        StructField("op_ts", StringType()),
        StructField("current_ts", StringType()),
        StructField("pos", StringType()),
        StructField("csn", StringType()),
        StructField("xid", StringType()),
        StructField("before", MapType(StringType(), StringType())),
        StructField("after", MapType(StringType(), StringType())),
        StructField("event_type", StringType()),
        StructField("expected_count", IntegerType()),
        StructField("data_collections", ArrayType(DATA_COLLECTION_SCHEMA)),
    ]
)

# ------------------------------------------------------- entity field mappings
# GG column name -> (output field name, spark type). "double" fields get the
# Jackson-style lenient string->number coercion (OrderJoiner.scala:92-98).
ORDER_FIELDS: list[tuple[str, str, str]] = [
    ("ORDER_ID", "orderId", "double"),
    ("ORDER_REF", "orderRef", "string"),
    ("VERSION", "version", "double"),
    ("ORDER_DATE", "orderDate", "string"),
    ("ORDER_TS", "orderTs", "string"),
    ("ORDER_STATUS", "orderStatus", "string"),
    ("ORDER_TYPE", "orderType", "string"),
    ("TOTAL_AMOUNT", "totalAmount", "double"),
    ("CURRENCY", "currency", "string"),
    ("CUSTOMER_ID", "customerId", "string"),
    ("SHIPPING_ADDRESS_ID", "shippingAddressId", "string"),
    ("CREATED_TS", "createdTs", "string"),
]
DETAIL_FIELDS: list[tuple[str, str, str]] = [
    ("ORDER_ID", "orderId", "double"),
    ("VERSION", "version", "double"),
    ("SHIPPING_METHOD", "shippingMethod", "string"),
    ("TRACKING_NUMBER", "trackingNumber", "string"),
    ("SHIPPED_TS", "shippedTs", "string"),
    ("ESTIMATED_DELIVERY_DATE", "estimatedDeliveryDate", "string"),
    ("CARRIER", "carrier", "string"),
    ("DELIVERY_STATUS", "deliveryStatus", "string"),
]
LINE_ITEM_FIELDS: list[tuple[str, str, str]] = [
    ("LINE_ITEM_ID", "lineItemId", "double"),
    ("ORDER_ID", "orderId", "double"),
    ("VERSION", "version", "double"),
    ("PRODUCT_ID", "productId", "string"),
    ("ITEM_QTY", "itemQty", "double"),
    ("ITEM_PRICE", "itemPrice", "double"),
    ("ITEM_AMOUNT", "itemAmount", "double"),
    ("ITEM_CURRENCY", "itemCurrency", "string"),
]

_TYPES = {"double": DoubleType(), "string": StringType()}


def _entity_struct(fields: list[tuple[str, str, str]], with_before: bool) -> StructType:
    base = [StructField(out, _TYPES[t]) for _, out, t in fields]
    if with_before:
        base.append(StructField("before", StructType(
            [StructField(out, _TYPES[t]) for _, out, t in fields]
        )))
    return StructType(base)


ORDER_STRUCT = _entity_struct(ORDER_FIELDS, with_before=True)
DETAIL_STRUCT = _entity_struct(DETAIL_FIELDS, with_before=True)
LINE_ITEM_STRUCT = _entity_struct(LINE_ITEM_FIELDS, with_before=True)

# ------------------------------------------------------------- output tables
# SCD Type 2 append table (db/create_table.deltalake.sql:9-90).
ORDER_STREAM_SCHEMA = StructType(
    [
        StructField("xid", StringType()),
        StructField("csn", StringType()),
        StructField("dwhProcessedTs", StringType()),
        StructField("orderId", DoubleType()),
        StructField("orders", ArrayType(ORDER_STRUCT)),
        StructField("orderDetails", ArrayType(DETAIL_STRUCT)),
        StructField("lineItems", ArrayType(LINE_ITEM_STRUCT)),
        # Opt-in delete mode only (SURVEY §2.8 note): true when the
        # transaction's ORDERS event was an op_type='D' tombstone. Always
        # false under reference parity (IGNOREDELETES).
        StructField("deleted", BooleanType()),
    ]
)

# SCD Type 1 current-state table (db/create_scd1_table.deltalake.sql:9-91):
# flat order columns + orderBefore struct + single detail struct + items array.
ORDERS_CURRENT_SCHEMA = StructType(
    [
        StructField("xid", StringType()),
        StructField("csn", StringType()),
        StructField("dwhProcessedTs", StringType()),
        *[StructField(out, _TYPES[t]) for _, out, t in ORDER_FIELDS],
        StructField("orderBefore", _entity_struct(ORDER_FIELDS, with_before=False)),
        StructField("orderDetails", DETAIL_STRUCT),
        StructField("lineItems", ArrayType(LINE_ITEM_STRUCT)),
    ]
)

# Keyed-state encoding for the transaction buffer (replaces
# Encoders.bean(classOf[TransactionState]), TransactionState.scala:20-68):
# NATIVE typed buffers — ARRAY<STRUCT> of raw CDC events plus flattened
# expected counts. No serialization layer of our own: every field type here is
# conversion-free, so the buffered dicts ride the state transport as-is
# (no per-event JSON encode/decode per micro-batch, which the round-1 JSON
# string encoding paid in the engine's only Python hot path).
TX_EVENT_STRUCT = StructType(
    [
        StructField("op_type", StringType()),
        StructField("pos", StringType()),
        StructField("before", MapType(StringType(), StringType())),
        StructField("after", MapType(StringType(), StringType())),
    ]
)

TX_STATE_SCHEMA = StructType(
    [
        StructField("xid", StringType()),
        StructField("csn", StringType()),
        StructField("order_events", ArrayType(TX_EVENT_STRUCT)),
        StructField("detail_events", ArrayType(TX_EVENT_STRUCT)),
        StructField("item_events", ArrayType(TX_EVENT_STRUCT)),
        StructField("expected_orders", IntegerType()),
        StructField("expected_details", IntegerType()),
        StructField("expected_items", IntegerType()),
        StructField("has_meta", BooleanType()),
    ]
)
