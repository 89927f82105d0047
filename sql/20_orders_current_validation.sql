-- Validation + analytics over the SCD1 orders_current views
-- (port of db/query_scd1_table.sql shapes). Reference: db/query_scd1_table.sql:14-143.

-- Uniqueness probe: must return no rows (db/query_scd1_table.sql:14-19)
SELECT orderId, COUNT(*) AS cnt
FROM orders_current
GROUP BY orderId
HAVING COUNT(*) > 1;

-- Status distribution (db/query_scd1_table.sql:39-47)
SELECT orderStatus, COUNT(*) AS cnt, SUM(totalAmount) AS total
FROM orders_current
GROUP BY orderStatus;

-- SCD1 vs SCD2 count comparison (db/query_scd1_table.sql:71-79)
SELECT 'orders_current' AS source, COUNT(*) AS cnt FROM orders_current
UNION ALL
SELECT 'order_stream_distinct' AS source, COUNT(DISTINCT orderId) AS cnt FROM order_stream;

-- Version-mismatch probe: detail/item versions must never regress below
-- what the arrays claim (db/query_scd1_table.sql:134-143)
SELECT orderId, version,
       orderDetails.version AS detail_version,
       aggregate(lineItems, CAST(NULL AS DOUBLE),
                 (acc, li) -> CASE WHEN acc IS NULL THEN li.version
                                   ELSE GREATEST(acc, li.version) END) AS max_item_version
FROM orders_current
LIMIT 50;
