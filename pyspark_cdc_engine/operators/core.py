"""Core relational operator queries (SURVEY §2.2-2.8) on the TPC-H-ish testdata.

Each query re-expresses one or more inventory rows from the reference's query
surface (db/query_table.sql, db/query_scd1_table.sql, ScdType1MergeApp.scala)
as idiomatic DataFrame plans over the driver's tables, with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_cdc_engine.operators.registry import (
    davg,
    davg_sql,
    dsum,
    dsum_sql,
    literal_frame,
    load_table,
    register,
)


# --------------------------------------------------------------------- A2/A3
@register(
    "agg_orders_by_status",
    survey="A2",
    oracle=f"""
    SELECT o_orderstatus,
           COUNT(*) AS cnt,
           {dsum_sql('o_totalprice', 2)} AS sum_total,
           {davg_sql('o_totalprice', 2)} AS avg_total
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_orders_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregate with count/sum/avg grouped by status (db/query_table.sql:32-40)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dsum("o_totalprice", 2).alias("sum_total"),
            davg("o_totalprice", 2).alias("avg_total"),
        )
    )


@register(
    "pricing_summary",
    survey="A2,O1,F18",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity', 2)} AS sum_qty,
           {dsum_sql('l_extendedprice', 2)} AS sum_base_price,
           {dsum_sql('l_extendedprice * (1 - l_discount)', 6)} AS sum_disc_price,
           {davg_sql('l_quantity', 2)} AS avg_qty,
           {davg_sql('l_extendedprice', 2)} AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped multi-aggregate scan; filter pushed to parquet."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", 2).alias("sum_qty"),
            dsum("l_extendedprice", 2).alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("sum_disc_price"),
            davg("l_quantity", 2).alias("avg_qty"),
            davg("l_extendedprice", 2).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "global_count",
    survey="A3",
    oracle="SELECT COUNT(*) AS cnt FROM lineitem",
)
def global_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global aggregate (db/query_table.sql:11)."""
    return load_table(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "having_multi_item_orders",
    survey="A4",
    oracle="""
    SELECT l_orderkey, COUNT(*) AS cnt
    FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) > 4
    """,
)
def having_multi_item_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation HAVING filter (uniqueness probe, db/query_scd1_table.sql:14-19)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 4)
    )


# ----------------------------------------------------------------------- W1/W2
@register(
    "top1_order_per_customer",
    survey="W1,P6,O3,P7",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC NULLS LAST, o_orderdate DESC NULLS LAST, o_orderkey
             ) AS _rn
      FROM orders
    ) WHERE _rn = 1
    """,
)
def top1_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1-per-group via row_number with desc_nulls_last multi-key ordering —
    the ScdType1MergeApp.scala:181-185 idiom (best order row before MERGE)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc_nulls_last(),
        F.col("o_orderdate").desc_nulls_last(),
        F.col("o_orderkey"),
    )
    return (
        load_table(spark, sf_dir, "orders")
        .withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


@register(
    "best_line_per_order",
    survey="W2,P5,O3",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity FROM (
      SELECT l_orderkey, l_linenumber, l_quantity,
             ROW_NUMBER() OVER (
               PARTITION BY l_orderkey
               ORDER BY l_quantity DESC NULLS LAST, l_linenumber, l_partkey, l_suppkey
             ) AS _rn
      FROM lineitem
    ) WHERE _rn = 1
    """,
)
def best_line_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number ordered by a nested struct field (ScdType1MergeApp.scala:190-193):
    the ordering key is accessed through a struct column, exercising nested-field
    resolution in the window spec."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "line", F.struct("l_linenumber", "l_quantity")
    )
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("line.l_quantity").desc_nulls_last(), F.col("line.l_linenumber"),
        F.col("l_partkey"), F.col("l_suppkey"),
    )
    return (
        li.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .select("l_orderkey", F.col("line.l_linenumber").alias("l_linenumber"),
                F.col("line.l_quantity").alias("l_quantity"))
    )


# ------------------------------------------------------------------------- O1
@register(
    "topk_orders",
    survey="O1,O2",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Catalyst plans TakeOrderedAndProject — no full sort at scale."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


# --------------------------------------------------------------------- U1/U2
@register(
    "union_padded_counts",
    survey="U1,U2,P3",
    oracle="""
    SELECT src, flag, COUNT(*) AS cnt FROM (
      SELECT 'orders' AS src, o_orderkey AS key, CAST(NULL AS VARCHAR) AS flag FROM orders
      UNION ALL
      SELECT 'lineitem' AS src, l_orderkey AS key, l_returnflag AS flag FROM lineitem
    ) GROUP BY src, flag
    """,
)
def union_padded_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-aligned union with typed-null padding + literal tag columns — the
    TransactionalCdcProcessingApp.scala:59-62 pattern (3-way topic union)."""
    o = load_table(spark, sf_dir, "orders").select(
        F.lit("orders").alias("src"),
        F.col("o_orderkey").alias("key"),
        F.lit(None).cast("string").alias("flag"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.lit("lineitem").alias("src"),
        F.col("l_orderkey").alias("key"),
        F.col("l_returnflag").alias("flag"),
    )
    return o.unionByName(li).groupBy("src", "flag").agg(F.count(F.lit(1)).alias("cnt"))


# ------------------------------------------------------------------------- J3
@register(
    "left_join_order_items",
    survey="J3,F12,A1",
    oracle=f"""
    SELECT o.o_orderkey, o.o_totalprice,
           COALESCE(li.item_cnt, 0) AS item_cnt,
           COALESCE(li.sum_qty, 0.0) AS sum_qty
    FROM orders o
    LEFT JOIN (
      SELECT l_orderkey, COUNT(*) AS item_cnt, {dsum_sql('l_quantity', 2)} AS sum_qty
      FROM lineitem GROUP BY l_orderkey
    ) li ON o.o_orderkey = li.l_orderkey
    """,
)
def left_join_order_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi left outer join reassembling parent + aggregated children
    (ScdType1MergeApp.scala:203-205); COALESCE null-defaulting (F12)."""
    o = load_table(spark, sf_dir, "orders")
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("item_cnt"), dsum("l_quantity", 2).alias("sum_qty"))
    )
    return o.join(li, o.o_orderkey == li.l_orderkey, "left").select(
        "o_orderkey",
        "o_totalprice",
        F.coalesce("item_cnt", F.lit(0)).alias("item_cnt"),
        F.coalesce("sum_qty", F.lit(0.0)).alias("sum_qty"),
    )


# ------------------------------------------------------------------- J5/F6/F7
@register(
    "explode_roundtrip",
    survey="J5,F6,F7,A1",
    oracle="SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
)
def explode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list(struct) per key, flatten across groups, then LATERAL-VIEW-style
    explode back to rows (db/query_table.sql:36-40 + ScdType1MergeApp.scala:195-200).
    Round-trips the original table, proving the nest/unnest pair is lossless."""
    li = load_table(spark, sf_dir, "lineitem")
    nested = (
        li.groupBy("l_orderkey", "l_returnflag")
        .agg(F.collect_list(F.struct("l_linenumber", "l_quantity")).alias("items"))
        .groupBy("l_orderkey")
        .agg(F.flatten(F.collect_list("items")).alias("items"))
    )
    return nested.select("l_orderkey", F.explode("items").alias("it")).select(
        "l_orderkey",
        F.col("it.l_linenumber").alias("l_linenumber"),
        F.col("it.l_quantity").alias("l_quantity"),
    )


# -------------------------------------------------------------------- F1 HOFs
@register(
    "array_dedup_hof",
    survey="F1,F5",
    oracle="""
    SELECT l_orderkey, l_partkey, l_linenumber FROM (
      SELECT l_orderkey, l_partkey, l_linenumber,
             MAX(l_linenumber) OVER (PARTITION BY l_orderkey, l_partkey) AS _mx
      FROM lineitem
    ) WHERE l_linenumber = _mx
    """,
)
def array_dedup_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's array-dedup-by-key-keeping-max-version expression
    (dedupExpr, ScdType1MergeApp.scala:212-213): filter(arr, e -> NOT exists(arr,
    o -> o.key = e.key AND o.version > e.version)), applied per order with
    partkey as the entity key and linenumber as the version."""
    li = load_table(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.collect_list(F.struct("l_partkey", "l_linenumber")).alias("arr")
    )
    deduped = nested.withColumn(
        "arr",
        F.expr(
            "filter(arr, e -> NOT exists(arr, o -> o.l_partkey = e.l_partkey"
            " AND o.l_linenumber > e.l_linenumber))"
        ),
    )
    return deduped.select("l_orderkey", F.explode("arr").alias("e")).select(
        "l_orderkey",
        F.col("e.l_partkey").alias("l_partkey"),
        F.col("e.l_linenumber").alias("l_linenumber"),
    )


@register(
    "array_fold_aggregate",
    survey="A5,F8,F13",
    oracle=f"""
    SELECT l_orderkey,
           {dsum_sql('l_quantity', 2)} AS total_qty,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_qty
    FROM lineitem GROUP BY l_orderkey
    """,
)
def array_fold_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array fold — aggregate(lineItems, 0, (acc, li) -> acc + li.qty) and the
    GREATEST-based max fold (db/query_table.sql:114; db/query_scd1_table.sql:138).
    Decimal accumulator keeps the fold order-independent."""
    li = load_table(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.collect_list(F.col("l_quantity").cast("decimal(28,2)")).alias("qtys")
    )
    return nested.select(
        "l_orderkey",
        F.expr(
            "CAST(aggregate(qtys, CAST(0 AS DECIMAL(28,2)),"
            " (acc, q) -> CAST(acc + q AS DECIMAL(28,2))) AS DOUBLE)"
        ).alias("total_qty"),
        F.expr(
            "CAST(aggregate(qtys, CAST(NULL AS DECIMAL(28,2)),"
            " (acc, q) -> CASE WHEN acc IS NULL THEN q ELSE greatest(acc, q) END) AS DOUBLE)"
        ).alias("max_qty"),
    )


@register(
    "first_element_sorted",
    survey="F3,F4",
    oracle="""
    SELECT l_orderkey, l_partkey AS first_partkey FROM (
      SELECT l_orderkey, l_partkey,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey) AS _rn
      FROM lineitem
    ) WHERE _rn = 1
    """,
)
def first_element_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_element_at(sorted_array, 1) — the ANSI-safe array head the reference
    uses to flatten possibly-empty arrays (ScdType1MergeApp.scala:153-154)."""
    li = load_table(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list(F.struct("l_linenumber", "l_partkey"))).alias("arr")
    )
    return nested.select(
        "l_orderkey",
        F.try_element_at("arr", F.lit(1)).getField("l_partkey").alias("first_partkey"),
    )


# ----------------------------------------------------------- F11/F12/F13/F18
@register(
    "case_bucket_summary",
    survey="F11,F13,F18,A2",
    oracle=f"""
    SELECT CASE WHEN o_totalprice >= 300000 THEN 'large'
                WHEN o_totalprice >= 100000 THEN 'medium'
                ELSE 'small' END AS bucket,
           COUNT(*) AS cnt,
           {dsum_sql('GREATEST(o_totalprice, 50000.0)', 2)} AS sum_floored
    FROM orders GROUP BY 1
    """,
)
def case_bucket_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN change-type derivation pattern (db/create_table.deltalake.sql:123-126)
    + GREATEST, aggregated for compact comparison."""
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") >= 300000, "large")
        .when(F.col("o_totalprice") >= 100000, "medium")
        .otherwise("small")
    )
    return (
        o.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dsum(F.greatest("o_totalprice", F.lit(50000.0)), 2).alias("sum_floored"),
        )
    )


# ------------------------------------------------------------------ F9 / F14 / F16
@register(
    "json_extract_events",
    survey="F9,P1,F10",
    oracle="""
    SELECT event_type,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events GROUP BY event_type
    """,
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with a declared schema + typed projection — the CDC parse pattern
    (TransactionalCdcProcessingApp.scala:94-113) applied to the events.props payload."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn("p", F.from_json("props", "struct<k: bigint>"))
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("p.k")).cast("bigint").alias("sum_k"),
    )


@register(
    "concat_key_groups",
    survey="F14,F16,F17",
    oracle="""
    SELECT CAST(user_id AS VARCHAR) || ':' || event_type AS tx_key,
           COUNT(*) AS cnt,
           regexp_extract(MIN(event_type), '([^_]+)$', 1) AS type_suffix
    FROM events GROUP BY 1
    """,
)
def concat_key_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-key building via concat_ws(':', xid, csn)
    (TransactionalCdcProcessingApp.scala:71) + suffix extraction mirroring the
    APPUSER.ORDERS -> ORDERS table-name strip (DataChangeEvent.scala:43-45)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("tx_key", F.concat_ws(":", F.col("user_id").cast("string"), "event_type"))
        .groupBy("tx_key")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.regexp_extract(F.min("event_type"), r"([^_]+)$", 1).alias("type_suffix"),
        )
    )


# --------------------------------------------------------------- flagship join
@register(
    "region_revenue",
    survey="J3,A2,P4,O1",
    oracle=f"""
    SELECT r.r_name AS region, o.o_orderstatus AS status,
           COUNT(DISTINCT o.o_orderkey) AS order_cnt,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 6)} AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice IS NOT NULL
    GROUP BY r.r_name, o.o_orderstatus
    """,
)
def region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship star-join: fact-fact join on orderkey + broadcast dimension chain
    (customer→nation→region), null-guard filter (P4). Dimensions are explicitly
    broadcast — at 100 TB the fact-side shuffle on orderkey is the only exchange."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice").isNotNull())
    c = F.broadcast(load_table(spark, sf_dir, "customer"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("o_orderstatus").alias("status"))
        .agg(
            F.count_distinct(F.col("o_orderkey")).alias("order_cnt"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue"),
        )
    )


# ---------------------------------------------------------- streaming analog
@register(
    "tumbling_window_events",
    survey="T-batch,F10",
    oracle=f"""
    SELECT CAST(date_trunc('hour', ts) AS VARCHAR) AS window_start,
           event_type,
           COUNT(*) AS cnt,
           {dsum_sql('value', 6)} AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def tumbling_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (batch equivalent of the streaming windowed agg;
    the same groupBy(window(ts), type) plan runs under readStream unchanged)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).cast("string").alias("window_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("value", 6).alias("sum_value"))
    )


@register(
    "session_window_events",
    survey="T-batch,W1,A2",
    oracle=f"""
    WITH o AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 4 HOUR
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS brk,
             event_id
      FROM events
    ),
    s AS (
      SELECT user_id, ts, value,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT user_id,
           epoch_us(MIN(ts)) AS session_start_us,
           COUNT(*) AS n_events,
           {dsum_sql('value', 6)} AS sum_value
    FROM s GROUP BY user_id, sid
    """,
)
def session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-window aggregation per user (4h inactivity gap) — the
    streaming sessionization shape (F.session_window works identically under
    readStream + watermark). The DuckDB oracle is the classic gaps-and-islands
    reformulation: LAG-threshold breaks + running-sum session ids; session
    starts cross the engines as exact epoch microseconds."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "4 hours"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", 6).alias("sum_value"))
        .select(
            "user_id",
            F.unix_micros("session_window.start").alias("session_start_us"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "sliding_window_events",
    survey="T-batch,A2,F10",
    oracle=f"""
    SELECT CAST(date_trunc('hour', ts) - h * INTERVAL 1 HOUR AS VARCHAR) AS window_start,
           COUNT(*) AS cnt,
           {dsum_sql('value', 6)} AS sum_value
    FROM events, (VALUES (0), (1)) AS t(h)
    GROUP BY 1
    """,
)
def sliding_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window aggregation (2h window, 1h slide): each event contributes
    to two overlapping windows. Spark plans this as a Generate(window list) +
    single hash aggregate — the same shape the streaming engine runs; the
    oracle expands the two window offsets explicitly."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour"))
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("value", 6).alias("sum_value"))
        .select(
            F.col("window.start").cast("string").alias("window_start"),
            "cnt",
            "sum_value",
        )
    )


@register(
    "rollup_revenue",
    survey="A2,F11",
    oracle=f"""
    SELECT COALESCE(r_name, '<all>') AS region,
           COALESCE(o_orderstatus, '<all>') AS status,
           GROUPING(r_name) + GROUPING(o_orderstatus) AS lvl,
           COUNT(*) AS cnt,
           {dsum_sql('o_totalprice', 6)} AS revenue
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    JOIN nation ON n_nationkey = c_nationkey
    JOIN region ON r_regionkey = n_regionkey
    GROUP BY ROLLUP (r_name, o_orderstatus)
    """,
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP subtotals (region, status) -> region -> grand total. Catalyst
    plans one Expand + single hash aggregate; GROUPING() disambiguates rollup
    nulls from data nulls on both engines."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    j = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
    )
    return (
        j.rollup("r_name", "o_orderstatus")
        .agg(
            (F.grouping("r_name") + F.grouping("o_orderstatus")).alias("lvl"),
            F.count(F.lit(1)).alias("cnt"),
            dsum("o_totalprice", 6).alias("revenue"),
        )
        .select(
            F.coalesce("r_name", F.lit("<all>")).alias("region"),
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            "lvl",
            "cnt",
            "revenue",
        )
    )


@register(
    "distinct_agg_customers",
    survey="A2",
    oracle="""
    SELECT o_orderpriority AS priority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def distinct_agg_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group — Catalyst plans the two-phase distinct-agg
    expansion (partial distinct by (group, key), then final count) without any
    manual staging."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "anti_join_idle_customers",
    survey="J3,A3",
    oracle="""
    SELECT c_mktsegment AS segment, COUNT(*) AS idle_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
)
def anti_join_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (customers with no orders) — the NOT EXISTS shape the
    reference never uses; plans as a broadcast/shuffled anti join, never a
    filtered outer join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    idle = c.join(o, c.c_custkey == o.o_custkey, "left_anti")
    return idle.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("idle_customers")
    )


_SALT_N = 8


@register(
    "salted_status_revenue",
    survey="A2,F14",
    oracle=f"""
    SELECT o_orderstatus AS status,
           COUNT(*) AS cnt,
           {dsum_sql('o_totalprice', 6)} AS revenue
    FROM orders GROUP BY o_orderstatus
    """,
)
def salted_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigation pattern, demonstrated end-to-end: o_orderstatus has ~3
    heavily skewed values, so the aggregation is salted into 8
    sub-keys (stage 1: groupBy(status, salt) — spreads each hot key over
    8 reducers) and then re-aggregated (stage 2: groupBy(status) over
    8 rows/key). Decimal partials re-sum exactly, so the result is
    identical to the direct aggregation the oracle runs."""
    o = load_table(spark, sf_dir, "orders")
    salted = o.withColumn("_salt", (F.col("o_orderkey") % _SALT_N).cast("int"))
    partial = salted.groupBy("o_orderstatus", "_salt").agg(
        F.count(F.lit(1)).alias("pc"),
        F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias("ps"),
    )
    return partial.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.sum("pc").alias("cnt"),
        F.sum("ps").cast("double").alias("revenue"),
    )


@register(
    "percentile_order_value",
    survey="A2",
    oracle="""
    SELECT o_orderpriority AS priority,
           quantile_cont(o_totalprice, 0.5) AS median_value,
           quantile_cont(o_totalprice, 0.9) AS p90_value,
           COUNT(*) AS cnt
    FROM orders GROUP BY o_orderpriority
    """,
)
def percentile_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per group — Spark's `percentile` and DuckDB's
    `quantile_cont` share linear-interpolation semantics, so values match
    bit-for-bit. (At 100 TB swap to approx_percentile and drop the oracle —
    the exact sort-based form is the correctness anchor.)"""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("median_value"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90_value"),
        F.count(F.lit(1)).alias("cnt"),
    )


@register(
    "approx_quantile_sketch",
    survey="A2,M5-text",
    oracle="""
    SELECT o_orderpriority AS priority,
           quantile_cont(o_totalprice, 0.5) AS exact_median,
           COUNT(*) AS cnt,
           TRUE AS within_bound
    FROM orders GROUP BY o_orderpriority
    """,
)
def approx_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile SKETCH per group (approx_percentile, mergeable constant-size
    state) — what replaces the exact sort-based percentile at 100 TB.

    Same certification trick as approx_distinct_sketch: the sketch value is
    engine-specific, so the row emits the sketch's CONTRACT instead —
    approx_percentile(x, 0.5, acc=100) guarantees a result whose rank is
    within 1% of the true median rank, so the value must land between the
    exact 0.48 and 0.52 quantiles; ``within_bound`` asserts that in-row and
    the oracle emits constant TRUE. The exact median rides along as the
    hashable yardstick."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.expr("approx_percentile(o_totalprice, 0.5, 100)").alias("_approx"),
            F.expr("percentile(o_totalprice, 0.5)").alias("exact_median"),
            F.expr("percentile(o_totalprice, 0.48)").alias("_lo"),
            F.expr("percentile(o_totalprice, 0.52)").alias("_hi"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select(
            "priority",
            "exact_median",
            "cnt",
            ((F.col("_approx") >= F.col("_lo")) & (F.col("_approx") <= F.col("_hi")))
            .alias("within_bound"),
        )
    )


@register(
    "map_props_events",
    survey="F9,F10,A2",
    oracle=f"""
    SELECT event_type,
           CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS cnt,
           {dsum_sql('value', 6)} AS sum_value
    FROM events
    WHERE json_extract(props, '$.k') IS NOT NULL
    GROUP BY 1, 2
    """,
)
def map_props_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read over the props JSON column parsed as MAP<STRING,BIGINT> —
    the same dynamic-payload pattern as the CDC before/after images (SURVEY
    §1.2): parse map-typed, extract by key, cast, aggregate. Parse + extraction
    are map-side; only the small (type, bucket) aggregate shuffles."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.withColumn("props_map", F.from_json("props", "map<string,bigint>"))
    return (
        m.filter(F.col("props_map")["k"].isNotNull())
        .groupBy(
            "event_type",
            (F.col("props_map")["k"] % 10).alias("k_bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("value", 6).alias("sum_value"))
    )


@register(
    "brand_supplier_revenue",
    survey="J3,A2,O1",
    oracle=f"""
    SELECT p.p_brand AS brand, n.n_name AS supplier_nation,
           COUNT(*) AS line_cnt,
           {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 6)} AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY p.p_brand, n.n_name
    ORDER BY revenue DESC, brand, supplier_nation
    LIMIT 25
    """,
)
def brand_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dims star join over the remaining dimension tables (part,
    supplier, nation): lineitem is the only large side, every dim broadcasts,
    revenue accumulates as exact decimal, global top-25 plans
    TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        j.groupBy(F.col("p_brand").alias("brand"), F.col("n_name").alias("supplier_nation"))
        .agg(F.count(F.lit(1)).alias("line_cnt"), dsum(rev, 6).alias("revenue"))
        .orderBy(F.desc("revenue"), "brand", "supplier_nation")
        .limit(25)
    )


@register(
    "user_event_gaps",
    survey="W1,A2,F18",
    oracle=f"""
    WITH g AS (
      SELECT user_id, ts, value,
             epoch_us(ts) - epoch_us(LAG(ts) OVER
               (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us,
             SUM(CAST(value AS DECIMAL(28,6))) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_value
      FROM events
    )
    SELECT user_id,
           COUNT(gap_us) AS n_gaps,
           CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
           CAST(MAX(running_value) AS DOUBLE) AS final_running_value
    FROM g GROUP BY user_id
    """,
)
def user_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG + explicit frame spec (ROWS UNBOUNDED PRECEDING running sum) — the
    window-function surface the reference never uses (SURVEY §2.5 notes their
    absence). One shuffle on user_id serves both window computations; the
    running sum accumulates DECIMAL so the final value is order-exact."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g = ev.select(
        "user_id",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
        F.sum(F.col("value").cast("decimal(28,6)")).over(wf).alias("running_value"),
    )
    return g.groupBy("user_id").agg(
        F.count("gap_us").alias("n_gaps"),
        F.min("gap_us").cast("bigint").alias("min_gap_us"),
        F.max("gap_us").cast("bigint").alias("max_gap_us"),
        F.max("running_value").cast("double").alias("final_running_value"),
    )


@register(
    "funnel_conversion",
    survey="W1,A2,F11",
    oracle="""
    WITH stages AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT
      COUNT(*) AS n_users,
      CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS viewed,
      CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view THEN 1 ELSE 0 END)
           AS BIGINT) AS clicked_after_view,
      CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                     AND t_purchase > t_click THEN 1 ELSE 0 END)
           AS BIGINT) AS purchased_in_order
    FROM stages
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase): first-occurrence timestamps
    per stage via conditional MIN (one shuffle, map-side partials), then
    ordered-progression counts — the sequence-analytics shape with no
    explode/self-join."""
    ev = load_table(spark, sf_dir, "events")
    stage = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    return stage.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("t_view").isNotNull(), 1).otherwise(0))
        .cast("bigint").alias("viewed"),
        F.sum(
            F.when(F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view")), 1)
            .otherwise(0)
        ).cast("bigint").alias("clicked_after_view"),
        F.sum(
            F.when(
                F.col("t_view").isNotNull()
                & (F.col("t_click") > F.col("t_view"))
                & (F.col("t_purchase") > F.col("t_click")),
                1,
            ).otherwise(0)
        ).cast("bigint").alias("purchased_in_order"),
    )


@register(
    "set_ops_probe",
    survey="U1,U2,A3",
    oracle="""
    SELECT 'both_f_and_o' AS relation, COUNT(*) AS cnt FROM (
      SELECT l_orderkey FROM lineitem WHERE l_linestatus = 'F'
      INTERSECT
      SELECT l_orderkey FROM lineitem WHERE l_linestatus = 'O'
    )
    UNION ALL
    SELECT 'f_only', COUNT(*) FROM (
      SELECT l_orderkey FROM lineitem WHERE l_linestatus = 'F'
      EXCEPT
      SELECT l_orderkey FROM lineitem WHERE l_linestatus = 'O'
    )
    """,
)
def set_ops_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT (set ops the reference lacks, SURVEY §2.7): orders
    with both open and finished lines vs finished-only. Catalyst plans both as
    aggregated semi/anti joins — no distinct-then-join staging needed."""
    li = load_table(spark, sf_dir, "lineitem")
    f = li.filter("l_linestatus = 'F'").select("l_orderkey")
    o = li.filter("l_linestatus = 'O'").select("l_orderkey")
    both = f.intersect(o).agg(F.count(F.lit(1)).alias("cnt")).select(
        F.lit("both_f_and_o").alias("relation"), "cnt"
    )
    f_only = f.subtract(o).agg(F.count(F.lit(1)).alias("cnt")).select(
        F.lit("f_only").alias("relation"), "cnt"
    )
    return both.unionByName(f_only)


@register(
    "null_safe_join_probe",
    survey="P4,F12,J3",
    oracle="""
    WITH a AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderkey % 5 END AS k
      FROM orders
    ),
    b AS (SELECT DISTINCT k FROM a)
    SELECT COALESCE(CAST(a.k AS VARCHAR), '<null>') AS key_group,
           COUNT(*) AS cnt
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    GROUP BY 1
    """,
)
def null_safe_join_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): null keys match
    each other instead of dropping out — the semantics regular equi-joins
    silently lose. Also exercises COALESCE display of the null group."""
    o = load_table(spark, sf_dir, "orders")
    a = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 7 == 0, None)
        .otherwise(F.col("o_orderkey") % 5)
        .alias("k"),
    )
    b = a.select(F.col("k").alias("bk")).distinct()
    return (
        a.join(b, F.col("k").eqNullSafe(F.col("bk")))
        .groupBy(F.coalesce(F.col("k").cast("string"), F.lit("<null>")).alias("key_group"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "asof_view_before_purchase",
    survey="W1,F11,F18",
    oracle="""
    SELECT p.event_id AS purchase_event_id, p.user_id,
           epoch_us(p.ts) AS purchase_ts_us,
           CAST(epoch_us((
             SELECT MAX(v.ts) FROM events v
             WHERE v.user_id = p.user_id AND v.event_type = 'view'
               AND (v.ts < p.ts OR (v.ts = p.ts AND v.event_id < p.event_id))
           )) AS BIGINT) AS asof_view_ts_us
    FROM events p WHERE p.event_type = 'purchase'
    """,
)
def asof_view_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join (each purchase paired with the same user's most recent prior
    view), implemented the scalable way: ONE shuffle on user_id and a
    last(ignorenulls) window over time order — never the naive inequality
    join whose intermediate is |purchases| x |views| per user. This is the
    union+window as-of idiom that holds at 100 TB; the oracle states the same
    semantics as a correlated subquery."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tagged = ev.select(
        "event_id", "user_id", "ts", "event_type",
        F.when(F.col("event_type") == "view", F.unix_micros("ts")).alias("view_ts_us"),
    )
    return (
        tagged.withColumn("asof_view_ts_us", F.last("view_ts_us", ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_event_id"),
            "user_id",
            F.unix_micros("ts").alias("purchase_ts_us"),
            F.col("asof_view_ts_us").cast("bigint").alias("asof_view_ts_us"),
        )
    )


@register(
    "approx_distinct_sketch",
    survey="A2,M5-text",
    oracle="""
    SELECT o_orderpriority AS priority,
           COUNT(DISTINCT o_custkey) AS exact_customers,
           COUNT(*) AS n_orders,
           TRUE AS within_bound
    FROM orders GROUP BY o_orderpriority
    """,
)
def approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct counting (rsd 2%) — the sketch that
    replaces exact COUNT(DISTINCT) at 100 TB: constant-size state per group,
    map-side mergeable, one narrow shuffle of sketches instead of a wide
    distinct expansion.

    The raw HLL estimate is engine-specific (DuckDB cannot reproduce Spark's
    sketch), so the row emits the sketch's CONTRACT instead: ``within_bound``
    asserts |approx - exact| <= 3*rsd*exact in-row, and the oracle emits
    constant TRUE — a sketch drifting out of tolerance flips the value and
    fails the driver's hash compare. The exact count rides along purely as the
    oracle-checkable yardstick (it is the wide aggregation the sketch replaces
    at scale)."""
    o = load_table(spark, sf_dir, "orders")
    # two-level agg instead of countDistinct-next-to-other-aggs: the latter
    # plans an Expand (doubles scan output); this shape keeps map-side partial
    # aggregation on both levels and reuses the (priority, custkey) exchange
    per_key = o.groupBy(
        F.col("o_orderpriority").alias("priority"), "o_custkey"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return (
        per_key.groupBy("priority")
        .agg(
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("_approx"),
            F.count(F.lit(1)).alias("exact_customers"),
            F.sum("cnt").alias("n_orders"),
        )
        .select(
            "priority",
            "exact_customers",
            "n_orders",
            (
                F.abs(F.col("_approx") - F.col("exact_customers"))
                <= F.greatest(F.lit(3), 0.06 * F.col("exact_customers"))
            ).alias("within_bound"),
        )
    )


_VALUE_BANDS = [(0.0, 2.0), (2.0, 5.0), (5.0, 10.0), (10.0, 15.0), (15.0, 1e9)]


@register(
    "value_band_range_join",
    survey="J3,A2,F18",
    oracle=f"""
    SELECT b.band_id, b.lo,
           COUNT(*) AS cnt,
           {dsum_sql('e.value', 6)} AS sum_value
    FROM events e
    JOIN (VALUES {', '.join(f'({i}, {lo}, {hi})' for i, (lo, hi) in enumerate(_VALUE_BANDS))})
         AS b(band_id, lo, hi)
      ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band_id, b.lo
    """,
)
def value_band_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval-containment) join — the join family the reference lacks
    (SURVEY §2.3 note): events against half-open value bands. The band table is
    tiny and broadcast, so the theta-join is a broadcast nested-loop over a
    handful of intervals per row — the plan shape that stays linear at 100 TB
    (never a cartesian against a large build side)."""
    ev = load_table(spark, sf_dir, "events")
    bands = literal_frame(
        spark,
        [(i, lo, hi) for i, (lo, hi) in enumerate(_VALUE_BANDS)],
        "band_id int, lo double, hi double",
    )
    return (
        ev.join(
            F.broadcast(bands),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .groupBy("band_id", "lo")
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("value", 6).alias("sum_value"))
    )


@register(
    "pivot_status_by_priority",
    survey="A2,F11",
    oracle=f"""
    SELECT o_orderpriority AS priority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_cnt,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o_cnt,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p_cnt,
           {dsum_sql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END", 2)} AS f_total
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT on order status with an explicit value list — with values named
    up front Catalyst plans a single pass of conditional aggregates (exactly
    the oracle's CASE formulation): no second scan, no distinct-values job."""
    o = load_table(spark, sf_dir, "orders")
    pivoted = (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dsum("o_totalprice", 2).alias("total"),
        )
    )
    return pivoted.select(
        "priority",
        F.col("F_cnt").cast("bigint").alias("f_cnt"),
        F.col("O_cnt").cast("bigint").alias("o_cnt"),
        F.col("P_cnt").cast("bigint").alias("p_cnt"),
        F.coalesce("F_total", F.lit(0.0)).alias("f_total"),
    )


@register(
    "cube_status_priority",
    survey="A2,F11",
    oracle=f"""
    SELECT COALESCE(o_orderstatus, '<all>') AS status,
           COALESCE(o_orderpriority, '<all>') AS priority,
           GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid,
           COUNT(*) AS cnt,
           {dsum_sql('o_totalprice', 2)} AS revenue
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all four grouping sets in one Expand +
    one hash aggregate — a single scan emits 4 rows per input row into the
    same partial-agg pipeline, so the cube costs one shuffle, not four
    queries. GROUPING() bits disambiguate cube nulls from data nulls
    identically on both engines."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            (F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority")).alias("gid"),
            F.count(F.lit(1)).alias("cnt"),
            dsum("o_totalprice", 2).alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "gid",
            "cnt",
            "revenue",
        )
    )


@register(
    "customer_spend_deciles",
    survey="W1,A2,beyond-ref",
    oracle=f"""
    WITH spend AS (
      SELECT c_mktsegment AS segment, o_custkey AS custkey,
             {dsum_sql('o_totalprice', 2)} AS spend
      FROM orders JOIN customer ON c_custkey = o_custkey
      GROUP BY 1, 2
    )
    SELECT segment, custkey, spend,
           NTILE(10) OVER w AS decile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume
    FROM spend
    WINDOW w AS (PARTITION BY segment ORDER BY spend, custkey)
    """,
)
def customer_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution analytics per market segment: per-customer spend ranked
    into deciles with percent_rank/cume_dist. The (spend, custkey) ordering is
    a TOTAL order, so rank arithmetic — hence the emitted doubles — is
    engine-identical. One agg shuffle + one window shuffle, both keyed on
    bounded-cardinality columns; at 100 TB the window partitions by segment
    (constant count), which is the documented skew ceiling — partition by a
    finer key (e.g. segment x nation) if a single segment outgrows an
    executor."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    spend = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_custkey").alias("custkey"),
        )
        .agg(dsum("o_totalprice", 2).alias("spend"))
    )
    w = Window.partitionBy("segment").orderBy("spend", "custkey")
    return spend.select(
        "segment",
        "custkey",
        "spend",
        F.ntile(10).over(w).alias("decile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "above_avg_orders",
    survey="A2,A3,J3,beyond-ref",
    oracle=f"""
    WITH g AS (SELECT {davg_sql('o_totalprice', 2)} AS global_avg FROM orders),
    per AS (
      SELECT o_orderstatus, o_totalprice,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2)))
                    OVER (PARTITION BY o_custkey) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY o_custkey) AS cust_avg
      FROM orders
    )
    SELECT o_orderstatus AS status,
           COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN o_totalprice > global_avg THEN 1 ELSE 0 END) AS BIGINT)
             AS above_global,
           CAST(SUM(CASE WHEN o_totalprice > cust_avg THEN 1 ELSE 0 END) AS BIGINT)
             AS above_own_avg
    FROM per CROSS JOIN g
    GROUP BY o_orderstatus
    """,
)
def above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar + correlated subquery shapes, expressed the Spark-planner way:
    the scalar subquery (global average) is a 1-row broadcast cross join; the
    correlated subquery (each customer's own average) is a hash AGGREGATE on
    the correlation key joined back to the fact — partial aggregation shrinks
    the shuffle to one row per customer and there is NO per-partition sort,
    unlike the window formulation (a window over o_custkey shuffles every
    order row AND sorts each partition; the agg+join ships the same order
    rows but sorts nothing, and AQE turns the join into a broadcast when the
    per-customer side is small). Averages are exact-decimal sums divided as
    doubles, so the comparisons are engine-identical either way."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderstatus", "o_totalprice"
    )
    g = o.agg(davg("o_totalprice", 2).alias("global_avg"))
    per_cust = o.groupBy("o_custkey").agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(28,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("cust_avg")
    )
    per = o.join(per_cust, "o_custkey")
    return (
        per.crossJoin(F.broadcast(g))
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.when(F.col("o_totalprice") > F.col("global_avg"), 1).otherwise(0)
            ).cast("bigint").alias("above_global"),
            F.sum(
                F.when(F.col("o_totalprice") > F.col("cust_avg"), 1).otherwise(0)
            ).cast("bigint").alias("above_own_avg"),
        )
    )


@register(
    "event_transitions",
    survey="W1,A2,beyond-ref",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS curr_type,
           COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS n_users
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition matrix (the Markov/funnel-mining
    primitive): LAG over each user's totally-ordered event sequence, then one
    hash agg over (prev, curr). The (ts, event_id) ordering is total, so the
    matrix is deterministic; one shuffle for the window, one for the agg —
    both keyed on high-cardinality columns, skew-free at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    return seq.groupBy("prev_type", F.col("event_type").alias("curr_type")).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "semi_join_active_customers",
    survey="J3,A2,beyond-ref",
    oracle="""
    SELECT c_mktsegment AS segment, COUNT(*) AS active_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS) — the complement of the anti-join probe: the
    semi join shuffles only the distinct key set of the probe side and emits
    each customer at most once, which is why EXISTS beats `JOIN ... DISTINCT`
    at scale (no fan-out, no dedup pass)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).alias("active_customers"))
    )


@register(
    "modal_order_priority",
    survey="A2,W1,beyond-ref",
    oracle="""
    SELECT o_orderstatus, o_orderpriority AS modal_priority, cnt FROM (
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
      FROM orders GROUP BY o_orderstatus, o_orderpriority
    ) WHERE rn = 1
    """,
)
def modal_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE per group: two-level aggregation (count per value,
    then argmax with a (count desc, value) TOTAL-order tiebreak via min_by
    over a negated-count struct). Spark's built-in `mode()` is
    tie-nondeterministic — this shape is the portable, engine-exact form,
    and it's one extra hash agg over already-tiny (group, value) pairs."""
    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return counts.groupBy("o_orderstatus").agg(
        F.expr(
            "min_by(o_orderpriority, named_struct('nc', -cnt, 'm', o_orderpriority))"
        ).alias("modal_priority"),
        F.max("cnt").alias("cnt"),
    )


@register(
    "monthly_revenue",
    survey="A2,F16,F18,beyond-ref",
    oracle=f"""
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mon,
           COUNT(*) AS n_orders,
           {dsum_sql('o_totalprice', 2)} AS revenue
    FROM orders GROUP BY 1, 2
    """,
)
def monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar rollup: EXTRACT(YEAR/MONTH) hash agg — the date-dimension
    breakdown every reporting layer runs. Grouping on derived expressions
    stays codegen; at 100 TB the month keys are low-cardinality so partial
    aggregation collapses each partition to <=~100 rows before the shuffle."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mon"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", 2).alias("revenue"),
        )
    )
