-- Analytical query corpus over the SCD2 order_stream views
-- (port of db/query_table.sql shapes -- runs via maintenance.run_sql_scripts
-- after maintenance.register_cdc_views). Reference: db/query_table.sql:11-133.

-- Global count
SELECT COUNT(*) AS total_records FROM order_stream;

-- Orders by status with amounts (db/query_table.sql:32-40)
SELECT o.orderStatus,
       COUNT(*) AS cnt,
       SUM(o.totalAmount) AS total_amount,
       AVG(o.totalAmount) AS avg_amount
FROM order_stream
LATERAL VIEW explode(orders) t AS o
GROUP BY o.orderStatus
ORDER BY cnt DESC;

-- Top orders by amount (db/query_table.sql:28-29)
SELECT orderId, orderRef, totalAmount
FROM order_stream_current
ORDER BY totalAmount DESC
LIMIT 10;

-- Per-transaction event profile (db/query_table.sql:84-92)
SELECT xid, csn,
       COUNT(*) AS orders_touched,
       SUM(size(lineItems)) AS line_items_touched
FROM order_stream
GROUP BY xid, csn
ORDER BY orders_touched DESC
LIMIT 20;

-- Change audit: before/after deltas (db/query_table.sql:120-133)
SELECT orderId, orderVersion, previous_version,
       totalAmount - previous_total_amount AS amount_delta,
       change_type
FROM order_stream_changes
LIMIT 50;

-- Line-item quantity fold per record (db/query_table.sql:112-117)
SELECT orderId,
       size(lineItems) AS item_cnt,
       aggregate(lineItems, CAST(0.0 AS DOUBLE), (acc, li) -> acc + li.itemQty) AS total_qty
FROM order_stream
ORDER BY total_qty DESC
LIMIT 10;
