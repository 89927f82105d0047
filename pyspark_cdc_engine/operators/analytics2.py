"""Round-2 analytics extensions: join/window/frame shapes the round-1 registry
did not yet exercise — full outer reconciliation, window frames (moving
average), rank-k per group, date-spine gap fill, blocked fuzzy matching,
exact-sum Pearson correlation, percent_rank/cume_dist bands, first/last value,
and explicit GROUPING SETS.

Oracle-parity rules (registry.py docstring) apply: every threshold that feeds a
comparison is computed from exact decimal sums and integer counts so the
double value is bit-identical in Spark and DuckDB; timestamps cross the
boundary as strings.

Scale notes are per-query; the common theme is that every join here is either
an equi-join on a shuffle key or a broadcast of a provably small side (a
1-row scalar, a month spine, a distinct-name vocabulary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark_cdc_engine.operators.registry import (
    davg_sql,
    dsum,
    dsum_sql,
    load_table,
    register,
)


# ------------------------------------------------------------------ full outer
@register(
    "spender_activity_reconciliation",
    survey="J3,A2,beyond-ref",
    oracle=f"""
    WITH spend AS (
      SELECT o_custkey AS entity_id, COUNT(*) AS order_cnt,
             {dsum_sql('o_totalprice', 2)} AS spend
      FROM orders GROUP BY o_custkey
    ),
    s_thr AS (SELECT {dsum_sql('o_totalprice', 2)} / COUNT(DISTINCT o_custkey) AS thr
              FROM orders),
    act AS (
      SELECT user_id AS entity_id, COUNT(*) AS event_cnt FROM events GROUP BY user_id
    ),
    a_thr AS (SELECT COUNT(*) / CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS thr
              FROM events),
    spenders AS (SELECT spend.* FROM spend CROSS JOIN s_thr WHERE spend > thr),
    actives AS (SELECT act.* FROM act CROSS JOIN a_thr WHERE event_cnt > thr)
    SELECT COALESCE(s.entity_id, a.entity_id) AS entity_id,
           s.order_cnt, s.spend, a.event_cnt,
           CASE WHEN s.entity_id IS NULL THEN 'events_only'
                WHEN a.entity_id IS NULL THEN 'orders_only'
                ELSE 'both' END AS presence
    FROM spenders s FULL OUTER JOIN actives a ON s.entity_id = a.entity_id
    """,
)
def spender_activity_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER reconciliation of two independently-derived entity sets:
    above-average spenders (orders) vs above-average-active users (events),
    with a presence marker for each side. The thresholds are
    exact-decimal-total / distinct-count, so the filter boundary is
    engine-identical. Scale: both inputs aggregate down to one row per entity
    before the join, so the full outer join shuffles only the aggregated
    (small) relations on the entity key — never the raw fact tables."""
    o = load_table(spark, sf_dir, "orders")
    e = load_table(spark, sf_dir, "events")
    spend = o.groupBy(F.col("o_custkey").alias("entity_id")).agg(
        F.count(F.lit(1)).alias("order_cnt"), dsum("o_totalprice", 2).alias("spend")
    )
    s_thr = o.agg(
        (dsum("o_totalprice", 2) / F.countDistinct("o_custkey")).alias("thr")
    )
    act = e.groupBy(F.col("user_id").alias("entity_id")).agg(
        F.count(F.lit(1)).alias("event_cnt")
    )
    a_thr = e.agg(
        (F.count(F.lit(1)) / F.countDistinct("user_id").cast("double")).alias("thr")
    )
    spenders = spend.crossJoin(F.broadcast(s_thr)).filter("spend > thr").drop("thr")
    actives = act.crossJoin(F.broadcast(a_thr)).filter("event_cnt > thr").drop("thr")
    j = spenders.join(actives, "entity_id", "full_outer")
    # after USING-style join, per-side presence is detectable via the side cols
    return j.select(
        "entity_id",
        "order_cnt",
        "spend",
        "event_cnt",
        F.when(F.col("order_cnt").isNull(), F.lit("events_only"))
        .when(F.col("event_cnt").isNull(), F.lit("orders_only"))
        .otherwise(F.lit("both"))
        .alias("presence"),
    )


# ------------------------------------------------------------- window frames
@register(
    "moving_avg_revenue_3m",
    survey="A2,W1,beyond-ref",
    oracle=f"""
    WITH m AS (
      SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
             {dsum_sql('o_totalprice', 2)} AS revenue
      FROM orders GROUP BY 1
    )
    SELECT month, revenue,
           CAST(SUM(CAST(revenue AS DECIMAL(28,2)))
                  OVER (ORDER BY month ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                AS DOUBLE)
             / COUNT(*) OVER (ORDER BY month ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             AS mov_avg_3m
    FROM m
    """,
)
def moving_avg_revenue_3m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 3-month moving average over monthly revenue using an explicit
    ROWS frame — the window-frame shape (frame != default) the rest of the
    registry lacks. The frame sum is decimal-exact then divided as double, so
    the moving average is engine-identical. Scale: the windowed relation is
    one row per month (tiny); the heavy work is the partial-agg monthly
    rollup, one shuffle on month."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month"
        )
    ).agg(dsum("o_totalprice", 2).alias("revenue"))
    w = Window.orderBy("month").rowsBetween(-2, 0)
    return m.select(
        "month",
        "revenue",
        (
            F.sum(F.col("revenue").cast("decimal(28,2)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("mov_avg_3m"),
    )


@register(
    "top3_orders_per_customer",
    survey="W1,O3",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC NULLS LAST, o_orderkey
             ) AS rnk
      FROM orders
    ) WHERE rnk <= 3
    """,
)
def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k (k=3) per group — generalizes the reference's top-1 idiom
    (ScdType1MergeApp.scala:181-185) to rank-k retention. Total order via the
    o_orderkey tiebreak. Scale: single shuffle on the partition key; Spark
    pushes a per-partition rank limit (WindowGroupLimit) so only k rows per
    group survive the sort buffer."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc_nulls_last(), F.col("o_orderkey")
    )
    return (
        load_table(spark, sf_dir, "orders")
        .withColumn("rnk", F.row_number().over(w))
        .filter("rnk <= 3")
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


@register(
    "percentile_band_customers",
    survey="W1,beyond-ref",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal, pct_rank, cume FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             percent_rank() OVER (
               PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS pct_rank,
             cume_dist() OVER (
               PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS cume
      FROM customer
    ) WHERE pct_rank >= 0.9
    """,
)
def percentile_band_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist band selection: the top decile of customers by
    account balance within each market segment. The c_custkey tiebreak makes
    the rank a total order, and both functions are integer-ratio doubles —
    engine-identical. Scale: one shuffle on the segment key."""
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        load_table(spark, sf_dir, "customer")
        .select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
        .filter("pct_rank >= 0.9")
    )


@register(
    "first_last_event_per_user",
    survey="W1,W2,beyond-ref",
    oracle="""
    SELECT user_id, first_type, last_type, n_events FROM (
      SELECT user_id,
             first_value(event_type) OVER w AS first_type,
             last_value(event_type) OVER w AS last_type,
             COUNT(*) OVER (PARTITION BY user_id) AS n_events,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ) WHERE rn = 1
    """,
)
def first_last_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value over an explicit UNBOUNDED-to-UNBOUNDED frame
    (the default frame stops at CURRENT ROW, so last_value needs the explicit
    frame — a classic trap this query pins down). Total order via (ts,
    event_id). Scale: one shuffle on user_id serves all three windows."""
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w_order.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.first("event_type").over(w_full).alias("first_type"),
            F.last("event_type").over(w_full).alias("last_type"),
            F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n_events"),
            F.row_number().over(w_order).alias("rn"),
        )
        .filter("rn = 1")
        .drop("rn")
    )


# ------------------------------------------------------------ date-spine fill
@register(
    "dense_monthly_revenue",
    survey="F6,J3,beyond-ref",
    oracle=f"""
    WITH bounds AS (
      SELECT date_trunc('month', MIN(o_orderdate)) AS lo,
             date_trunc('month', MAX(o_orderdate)) AS hi
      FROM orders
    ),
    spine AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS VARCHAR)
               AS month
      FROM bounds
    ),
    m AS (
      -- date_trunc to month in DuckDB yields DATE ('1995-01-01'); go through
      -- TIMESTAMP so the rendering matches the generate_series spine and
      -- Spark's date_trunc (both '1995-01-01 00:00:00')
      SELECT CAST(CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS VARCHAR) AS month,
             {dsum_sql('o_totalprice', 2)} AS revenue, COUNT(*) AS n_orders
      FROM orders GROUP BY 1
    )
    SELECT spine.month, COALESCE(m.revenue, 0.0) AS revenue,
           COALESCE(m.n_orders, 0) AS n_orders
    FROM spine LEFT JOIN m ON spine.month = m.month
    """,
)
def dense_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-free monthly revenue: a data-driven month spine (sequence + explode
    between min and max order month) LEFT JOINed to the monthly rollup, zeros
    filled. The distributed way to densify a time series — no driver-side
    loop materializing dates. Scale: the spine is O(months) rows and is
    broadcast; the rollup is the only shuffle."""
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("month", F.max("o_orderdate")).alias("hi"),
    )
    # Generators cannot nest inside other expressions (UNSUPPORTED_GENERATOR.
    # NESTED_IN_EXPRESSIONS): explode in its own select, cast in the next one.
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 MONTH"))).alias("m")
    ).select(F.col("m").cast("string").alias("month"))
    m = o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("string").alias("month")
    ).agg(dsum("o_totalprice", 2).alias("revenue"), F.count(F.lit(1)).alias("n_orders"))
    return (
        F.broadcast(spine)
        .join(m, "month", "left")
        .select(
            "month",
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        )
    )


# ---------------------------------------------------------- blocked fuzzy join
@register(
    "fuzzy_part_name_pairs",
    survey="J2,F18,beyond-ref",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part),
    toks AS (
      SELECT p_name, split_part(p_name, ' ', 1) AS adj,
             split_part(p_name, ' ', 2) AS noun
      FROM names
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.adj, b.adj) AS dist
    FROM toks a JOIN toks b
      ON a.noun = b.noun AND a.p_name < b.p_name
    WHERE levenshtein(a.adj, b.adj) <= 2
    """,
)
def fuzzy_part_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy (edit-distance) matching: candidate pairs of part names
    whose noun token matches exactly (the blocking key) and whose adjective
    is within levenshtein distance 2. Runs on the DISTINCT name vocabulary,
    not the row stream — at 100 TB the vocabulary of a join key is orders of
    magnitude smaller than the table, so dedupe-first keeps the quadratic
    within-block comparison bounded by vocabulary size, never row count.
    Equi-join on the block key; levenshtein is JVM-side (no UDF)."""
    names = load_table(spark, sf_dir, "part").select("p_name").distinct()
    toks = names.select(
        "p_name",
        F.split("p_name", " ").getItem(0).alias("adj"),
        F.split("p_name", " ").getItem(1).alias("noun"),
    )
    a = toks.alias("a")
    b = toks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.noun") == F.col("b.noun"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.levenshtein(F.col("a.adj"), F.col("b.adj")).alias("dist"),
        )
        .filter("dist <= 2")
    )


# ------------------------------------------------------- exact-sum correlation
@register(
    "corr_qty_price_by_flag",
    survey="A2,F18,beyond-ref",
    oracle=f"""
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             {dsum_sql('l_quantity', 2)} AS sx,
             {dsum_sql('l_extendedprice', 2)} AS sy,
             {dsum_sql('l_quantity * l_extendedprice', 4)} AS sxy,
             {dsum_sql('l_quantity * l_quantity', 4)} AS sxx,
             {dsum_sql('l_extendedprice * l_extendedprice', 4)} AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS corr_qty_price
    FROM s
    """,
)
def corr_qty_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of quantity vs extended price per return flag,
    computed from exact decimal co-moment sums so both engines evaluate the
    identical closed-form double expression (built-in corr() accumulates in
    engine-specific order and drifts in the last ulps). Scale: pure partial
    aggregation — one shuffle, six co-moments per group, O(1) state."""
    li = load_table(spark, sf_dir, "lineitem")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_quantity", 2).alias("sx"),
        dsum("l_extendedprice", 2).alias("sy"),
        dsum(F.col("l_quantity") * F.col("l_extendedprice"), 4).alias("sxy"),
        dsum(F.col("l_quantity") * F.col("l_quantity"), 4).alias("sxx"),
        dsum(F.col("l_extendedprice") * F.col("l_extendedprice"), 4).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return s.select(
        "l_returnflag",
        "n",
        (
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
        ).alias("corr_qty_price"),
    )


# ------------------------------------------------------------- grouping sets
@register(
    "grouping_sets_revenue",
    survey="A2,beyond-ref",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus) AS g_status,
           GROUPING(o_orderpriority) AS g_priority,
           COUNT(*) AS n_orders,
           {dsum_sql('o_totalprice', 2)} AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (not the cube/rollup shorthands already in the
    registry): per-status totals, per-priority totals, and the grand total in
    one pass, with GROUPING() markers disambiguating real NULLs from
    subtotal rows. Spark expands grouping sets into a single Expand + one
    hash aggregate — one shuffle for all three groupings."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_gs_orders")
    return spark.sql(f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
               COUNT(*) AS n_orders,
               {dsum_sql('o_totalprice', 2)} AS revenue
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)


_TSW = 8  # window length (events per similarity window)
# centered probe: a rising ramp, i - mean(1..8) = i - 4.5 for i in 1..8
_TS_PROBE = [i - 4.5 for i in range(1, _TSW + 1)]


def _ts_dist_sql(arr: str, fn: str = "element_at") -> tuple[str, str]:
    """Sum of squared deviations between the CENTERED window and the centered
    ramp probe, fully unrolled so both engines evaluate the identical
    left-associated double expression tree (bit-exact, no fold-order risk).
    ``fn``: the 1-based element accessor — ``element_at`` (Spark; bracket
    indexing is 0-based there) / ``list_extract`` (DuckDB)."""
    at = lambda i: f"{fn}({arr}, {i})"
    mean = "(" + " + ".join(at(i) for i in range(1, _TSW + 1)) + f") / {_TSW}.0"
    terms = [
        f"(({at(i)} - __m) - ({_TS_PROBE[i - 1]!r})) * (({at(i)} - __m) - ({_TS_PROBE[i - 1]!r}))"
        for i in range(1, _TSW + 1)
    ]
    return mean, " + ".join(terms)


@register(
    "ts_window_similarity_topk",
    survey="W1,O1,beyond-ref",
    oracle=f"""
    WITH w AS (
      SELECT user_id, event_id,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN CURRENT ROW AND {_TSW - 1} FOLLOWING) AS arr
      FROM events
    ),
    full_w AS (SELECT * FROM w WHERE len(arr) = {_TSW}),
    d AS (
      SELECT user_id, event_id AS start_event_id,
             {_ts_dist_sql('arr', 'list_extract')[1].replace(
                 '__m', f"(({_ts_dist_sql('arr', 'list_extract')[0]}))")} AS dist
      FROM full_w
    )
    SELECT user_id, start_event_id, dist
    FROM d ORDER BY dist, user_id, start_event_id LIMIT 20
    """,
)
def ts_window_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series similarity search (streaming-data window matching, EDBT'19
    theme): per user, every run of 8 consecutive event values becomes a
    window; each window is centered (mean-removed) and scored by exact squared
    Euclidean distance to a centered rising-ramp probe; global top-20 closest
    windows win.

    Spark-first shape: ONE shuffle on user_id feeds a frame-spec collect_list
    (ROWS BETWEEN CURRENT AND {_TSW - 1} FOLLOWING); the distance is a fully
    unrolled codegen double expression (no HOF lambda — those are interpreted
    and fold-order-ambiguous); global top-k plans as TakeOrderedAndProject,
    never a full sort. At 100 TB: shuffle bytes = the events themselves once,
    window arrays never leave the exchange-local stage, and the driver
    receives exactly k rows."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, _TSW - 1)
    )
    mean_sql, dist_sql = _ts_dist_sql("arr")
    full = (
        ev.select(
            "user_id",
            F.col("event_id").alias("start_event_id"),
            F.collect_list("value").over(w).alias("arr"),
        )
        .filter(F.size("arr") == _TSW)
    )
    d = full.select(
        "user_id",
        "start_event_id",
        F.expr(dist_sql.replace("__m", f"(({mean_sql}))")).alias("dist"),
    )
    return d.orderBy("dist", "user_id", "start_event_id").limit(20)


# ------------------------------------------------------ gap-fill interpolation
@register(
    "gap_fill_interpolate",
    survey="W1,F6,J3,beyond-ref",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
      FROM events
    ),
    spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds),
    tys AS (SELECT DISTINCT event_type FROM events),
    grid AS (SELECT event_type, h FROM tys CROSS JOIN spine),
    obs AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      FROM events GROUP BY 1, 2
    ),
    j AS (
      SELECT g.event_type, g.h, obs.v,
             CAST(epoch(g.h) AS BIGINT) // 3600 AS i
      FROM grid g LEFT JOIN obs ON obs.event_type = g.event_type AND obs.h = g.h
    ),
    w AS (
      SELECT event_type, h, v, i,
        last_value(v IGNORE NULLS) OVER pw AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN i END IGNORE NULLS) OVER pw AS pi,
        first_value(v IGNORE NULLS) OVER nw AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN i END IGNORE NULLS) OVER nw AS ni
      FROM j
      WINDOW pw AS (PARTITION BY event_type ORDER BY i
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             nw AS (PARTITION BY event_type ORDER BY i
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type,
           CAST(CAST(h AS TIMESTAMP) AS VARCHAR) AS hour,
           CAST(CASE WHEN v IS NOT NULL THEN v
                     WHEN pv IS NULL THEN nv
                     WHEN nv IS NULL THEN pv
                     ELSE pv + CAST(floor((nv - pv) * (i - pi) * 1.0 / (ni - pi))
                                    AS BIGINT)
                END AS BIGINT) AS filled_cents,
           CAST(CASE WHEN v IS NULL THEN 1 ELSE 0 END AS INT) AS was_gap
    FROM w
    """,
)
def gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling with LINEAR INTERPOLATION (TimescaleDB
    ``interpolate()`` / Pandas ``interpolate(method='time')`` analog): the
    hourly per-event-type value series is densified onto a data-driven hour
    spine; empty hours take the straight line between the nearest observed
    neighbors, edges fall back to nearest-observation carry (LOCF/NOCB).

    Distributed shape: the spine is O(types x hours) rows built from a 1-row
    bounds aggregate (broadcast) — no driver loop; the only data shuffle is
    the hourly pre-aggregation, after which each series interpolates inside
    ONE window pass per direction, partitioned by event_type (embarrassingly
    parallel across series; at 100 TB you repartition by series key and each
    window sorts hours-per-series rows, thousands, not data rows).

    Exactness: values aggregate as integer cents (DECIMAL-cast per row), and
    the interpolated point is floor((nv-pv)*step/gap) in integers — bit-equal
    between engines, no float accumulation anywhere."""
    e = load_table(spark, sf_dir, "events")
    types = e.select("event_type").distinct()
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    grid = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    obs = e.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.sum((F.col("value").cast("decimal(18,2)") * 100).cast("long")).alias("v")
    )
    j = grid.join(obs, ["event_type", "h"], "left").withColumn(
        "i", F.expr("unix_seconds(h) div 3600")
    )
    pw = (
        Window.partitionBy("event_type")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    nw = (
        Window.partitionBy("event_type")
        .orderBy("i")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    pv = F.last("v", ignorenulls=True).over(pw)
    pi = F.last(F.when(F.col("v").isNotNull(), F.col("i")), ignorenulls=True).over(pw)
    nv = F.first("v", ignorenulls=True).over(nw)
    ni = F.first(F.when(F.col("v").isNotNull(), F.col("i")), ignorenulls=True).over(nw)
    interp = pv + F.floor(
        (nv - pv) * (F.col("i") - pi) * F.lit(1.0) / (ni - pi)
    )
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(pv.isNull(), nv)
        .when(nv.isNull(), pv)
        .otherwise(interp)
    ).cast("bigint")
    return j.select(
        "event_type",
        F.col("h").cast("string").alias("hour"),
        filled.alias("filled_cents"),
        F.col("v").isNull().cast("int").alias("was_gap"),
    )
