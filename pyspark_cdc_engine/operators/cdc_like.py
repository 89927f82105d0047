"""Batch-expressible analogs of the CDC pipeline's core operators (SURVEY §2.3,
§2.9, §2.10), so the DuckDB oracle can verify their semantics on the driver's
testdata. The real streaming implementations live in
:mod:`pyspark_cdc_engine.streaming` / :mod:`pyspark_cdc_engine.scd1` and are
golden-tested in ``tests/``; these queries prove the same dataflow shapes
(union → key → buffer → assemble; ordered-clause merge) batch-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_cdc_engine.functions.arrays import merge_array_expr
from pyspark_cdc_engine.operators.registry import dsum_sql, load_table, register
from pyspark_cdc_engine.tables import MergeClause, merge_dataframes


def _best_per_key(df: DataFrame, status: str) -> DataFrame:
    """Top-1 lineitem per orderkey for one linestatus: version := l_linenumber."""
    # full tiebreak chain: sf0.1 contains duplicate (orderkey, linenumber,
    # partkey) rows with different quantities — the ordering must be total or
    # Spark and DuckDB legally pick different rows
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_linenumber").desc(), F.col("l_partkey"),
        F.col("l_quantity"), F.col("l_suppkey"), F.col("l_extendedprice"),
    )
    return (
        df.filter(F.col("l_linestatus") == status)
        .withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .select(
            F.col("l_orderkey").alias("okey"),
            F.col("l_linenumber").cast("double").alias("version"),
            F.col("l_quantity").alias("qty"),
        )
    )


_BEST_SQL = """
  SELECT l_orderkey AS okey,
         CAST(l_linenumber AS DOUBLE) AS version,
         l_quantity AS qty
  FROM (
    SELECT l_orderkey, l_linenumber, l_quantity,
           ROW_NUMBER() OVER (
             PARTITION BY l_orderkey
             ORDER BY l_linenumber DESC, l_partkey, l_quantity, l_suppkey, l_extendedprice
           ) AS _rn
    FROM lineitem WHERE l_linestatus = '{status}'
  ) WHERE _rn = 1
"""


@register(
    "version_merge_batch",
    survey="J4,F11,F12,§2.9",
    oracle=f"""
    WITH tgt AS ({_BEST_SQL.format(status='F')}),
         src AS ({_BEST_SQL.format(status='O')})
    SELECT
      COALESCE(t.okey, s.okey) AS okey,
      CASE WHEN t.okey IS NOT NULL AND s.okey IS NOT NULL
                AND s.version > COALESCE(t.version, 0) THEN s.version
           WHEN t.okey IS NOT NULL THEN t.version
           ELSE s.version END AS version,
      CASE WHEN t.okey IS NOT NULL AND s.okey IS NOT NULL
                AND s.version > COALESCE(t.version, 0) THEN s.qty
           WHEN t.okey IS NOT NULL THEN t.qty
           ELSE s.qty END AS qty,
      CASE WHEN t.okey IS NOT NULL AND s.okey IS NOT NULL
                AND s.version > COALESCE(t.version, 0) THEN 'U'
           WHEN t.okey IS NOT NULL AND s.okey IS NOT NULL THEN 'M'
           WHEN t.okey IS NOT NULL THEN 'T'
           ELSE 'I' END AS origin
    FROM tgt t FULL OUTER JOIN src s ON t.okey = s.okey
    WHERE t.okey IS NOT NULL OR s.version IS NOT NULL
    """,
)
def version_merge_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The version-aware ordered-clause MERGE (ScdType1MergeApp.scala:95-132)
    run through the engine's merge_dataframes: clause 1 updates when the source
    is strictly newer, clause 2 touches only bookkeeping, the insert clause is
    guarded on source.version IS NOT NULL. Verified cell-for-cell against a
    FULL OUTER JOIN + CASE oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    target = _best_per_key(li, "F").withColumn("origin", F.lit("T"))
    source = _best_per_key(li, "O")
    clauses = [
        MergeClause(
            "update",
            "source.version IS NOT NULL AND source.version > COALESCE(target.version, 0)",
            {"version": "source.version", "qty": "source.qty", "origin": "'U'"},
        ),
        MergeClause("update", None, {"origin": "'M'"}),
        MergeClause(
            "insert",
            "source.version IS NOT NULL",
            {"okey": "source.okey", "version": "source.version",
             "qty": "source.qty", "origin": "'I'"},
        ),
    ]
    return merge_dataframes(
        target, source, "target.okey = source.okey", clauses,
        ["okey", "version", "qty", "origin"],
    )


@register(
    "tx_assembly_batch",
    survey="J1,J2,T3,F5",
    oracle=f"""
    SELECT key AS okey,
           CAST(SUM(CASE WHEN kind = 'ORDERS' THEN 1 ELSE 0 END) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN kind = 'LINE_ITEMS' THEN 1 ELSE 0 END) AS BIGINT) AS n_items,
           {dsum_sql("CASE WHEN kind = 'LINE_ITEMS' THEN amount ELSE 0 END", 6)} AS items_total
    FROM (
      SELECT 'ORDERS' AS kind, o_orderkey AS key, o_totalprice AS amount FROM orders
      UNION ALL
      SELECT 'LINE_ITEMS' AS kind, l_orderkey AS key,
             l_extendedprice * (1 - l_discount) AS amount
      FROM lineitem
    )
    GROUP BY key
    HAVING SUM(CASE WHEN kind = 'ORDERS' THEN 1 ELSE 0 END) >= 1
       AND SUM(CASE WHEN kind = 'LINE_ITEMS' THEN 1 ELSE 0 END) >= 1
    """,
)
def tx_assembly_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch shape of the stateful transaction-assembly join (J1,
    TransactionalCdcProcessingApp.scala:59-72): union tagged event streams,
    key, buffer into per-key arrays, emit only 'complete' groups (here:
    parent present AND ≥1 child — the event-count completion analog, T3).
    One shuffle on the group key, exactly like the streaming plan."""
    o = load_table(spark, sf_dir, "orders").select(
        F.lit("ORDERS").alias("kind"),
        F.col("o_orderkey").alias("key"),
        F.col("o_totalprice").alias("amount"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.lit("LINE_ITEMS").alias("kind"),
        F.col("l_orderkey").alias("key"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("amount"),
    )
    unioned = o.unionByName(li)
    assembled = unioned.groupBy(F.col("key").alias("okey")).agg(
        F.collect_list(F.when(F.col("kind") == "ORDERS", F.struct("amount"))).alias("orders"),
        F.collect_list(
            F.when(F.col("kind") == "LINE_ITEMS",
                   F.struct(F.col("amount").cast("decimal(28,6)").alias("amount")))
        ).alias("items"),
    )
    complete = assembled.filter((F.size("orders") >= 1) & (F.size("items") >= 1))
    return complete.select(
        "okey",
        F.size("orders").cast("bigint").alias("n_orders"),
        F.size("items").cast("bigint").alias("n_items"),
        F.expr(
            "CAST(aggregate(items, CAST(0 AS DECIMAL(28,6)),"
            " (acc, it) -> CAST(acc + it.amount AS DECIMAL(28,6))) AS DOUBLE)"
        ).alias("items_total"),
    )


def _item_array_sql(status: str) -> str:
    """DuckDB: per okey, the deduped (item_id -> version, qty) set for one
    linestatus; item_id := l_linenumber, version := l_suppkey."""
    return f"""
      SELECT l_orderkey AS okey, l_linenumber AS item_id,
             CAST(l_suppkey AS DOUBLE) AS version, l_quantity AS qty
      FROM (
        SELECT l_orderkey, l_linenumber, l_suppkey, l_quantity,
               ROW_NUMBER() OVER (
                 PARTITION BY l_orderkey, l_linenumber
                 ORDER BY l_suppkey DESC, l_partkey, l_quantity, l_extendedprice
               ) AS _rn
        FROM lineitem WHERE l_linestatus = '{status}'
      ) WHERE _rn = 1
    """


@register(
    "array_merge_versions",
    survey="F2,F5,F8,F13,§2.9",
    oracle=f"""
    WITH tgt AS ({_item_array_sql('F')}),
         src AS ({_item_array_sql('O')}),
    merged AS (
      -- relational statement of mergeArrayExpr: per (okey, item_id), source
      -- replaces target only when strictly newer; unmatched from both kept
      SELECT COALESCE(t.okey, s.okey) AS okey,
             CASE WHEN s.item_id IS NOT NULL
                       AND (t.item_id IS NULL OR s.version > t.version)
                  THEN s.version ELSE t.version END AS version,
             CASE WHEN s.item_id IS NOT NULL
                       AND (t.item_id IS NULL OR s.version > t.version)
                  THEN s.qty ELSE t.qty END AS qty
      FROM tgt t FULL OUTER JOIN src s
        ON t.okey = s.okey AND t.item_id = s.item_id
    )
    SELECT okey,
           CAST(COUNT(*) AS INT) AS merged_size,
           MAX(version) AS max_version,
           {dsum_sql('qty', 6)} AS qty_total
    FROM merged GROUP BY okey
    """,
)
def array_merge_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production mergeArrayExpr (functions/arrays.py — F2, the concat +
    dual filter/exists version-aware 1:N merge of ScdType1MergeApp.scala:236-244)
    applied to real arrays built from testdata, then folded back to scalars
    (size / GREATEST fold / decimal qty fold) so DuckDB can verify it via the
    equivalent relational FULL OUTER JOIN formulation."""
    li = load_table(spark, sf_dir, "lineitem")

    def item_arrays(status: str, out: str) -> DataFrame:
        w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
            F.col("l_suppkey").desc(), F.col("l_partkey"),
            F.col("l_quantity"), F.col("l_extendedprice"),
        )
        return (
            li.filter(F.col("l_linestatus") == status)
            .withColumn("_rn", F.row_number().over(w))
            .filter("_rn = 1")
            .groupBy(F.col("l_orderkey").alias("okey"))
            .agg(
                F.collect_list(
                    F.struct(
                        F.col("l_linenumber").alias("item_id"),
                        F.col("l_suppkey").cast("double").alias("version"),
                        F.col("l_quantity").alias("qty"),
                    )
                ).alias(out)
            )
        )

    t = item_arrays("F", "items")
    s = item_arrays("O", "items")
    both = (
        t.select(F.struct("okey", "items").alias("target"))
        .join(
            s.select(F.struct("okey", "items").alias("source")),
            F.expr("target.okey = source.okey"),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("target.okey"), F.col("source.okey")).alias("okey"),
            F.expr(merge_array_expr("items", "item_id")).alias("merged"),
        )
    )
    return both.select(
        "okey",
        F.size("merged").alias("merged_size"),
        F.expr(
            "aggregate(merged, CAST(-1 AS DOUBLE), (acc, e) -> GREATEST(acc, e.version))"
        ).alias("max_version"),
        F.expr(
            "CAST(aggregate(merged, CAST(0 AS DECIMAL(28,6)),"
            " (acc, e) -> CAST(acc + CAST(e.qty AS DECIMAL(28,6)) AS DECIMAL(28,6))) AS DOUBLE)"
        ).alias("qty_total"),
    )


@register(
    "dml_orders_scenario",
    survey="§2.12,J4,F18,beyond-ref",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus,
           CASE WHEN o_orderstatus = 'P'
                THEN o_totalprice * 1.1 ELSE o_totalprice END AS o_totalprice
    FROM orders
    WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 1000)
    """,
)
def dml_orders_scenario(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deltalite DML triad under driver certification (the same pattern
    version_merge_batch uses for MERGE): materialize orders as a deltalite
    table, run a stats-pruned DELETE (drop cheap finished orders) then an
    UPDATE (reprice pending orders), and return the final state — which must
    equal the oracle's one-shot SQL over the raw table. Both mutations use
    the real copy-on-write path (commit log, staged publish, constraint
    validation); the reprice multiply is one IEEE expression over identical
    inputs, so values certify bit-exact."""
    from pyspark_cdc_engine.operators.dedup_incremental import _fresh_scratch_dir
    from pyspark_cdc_engine.tables import DeltaliteTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    tmp = _fresh_scratch_dir(f"dml:{sf_dir}")
    t = DeltaliteTable(spark, f"{tmp}/orders_dml")
    t.overwrite(o)
    t.delete("o_orderstatus = 'F' AND o_totalprice < 1000")
    t.update({"o_totalprice": "o_totalprice * 1.1"}, "o_orderstatus = 'P'")
    return t.read()


@register(
    "dml_dv_scenario",
    survey="§2.12,J4,F18,beyond-ref",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 1000)
      AND NOT (o_orderstatus = 'P' AND o_totalprice > 250000)
    """,
)
def dml_dv_scenario(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The merge-on-read DELETE under driver certification (companion to
    dml_orders_scenario's copy-on-write triad): two stacked deletion-vector
    deletes — no data file rewritten, every reader anti-joining the
    positional tombstones — must equal the oracle's one-shot filtered
    SELECT. Exercises DV stacking (the second delete must not re-tombstone
    the first's rows) and the read path's metadata-column anti-join."""
    from pyspark_cdc_engine.operators.dedup_incremental import _fresh_scratch_dir
    from pyspark_cdc_engine.tables import DeltaliteTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    tmp = _fresh_scratch_dir(f"dml_dv:{sf_dir}")
    t = DeltaliteTable(spark, f"{tmp}/orders_dv")
    t.overwrite(o)
    t.delete("o_orderstatus = 'F' AND o_totalprice < 1000", mode="dv")
    t.delete("o_orderstatus = 'P' AND o_totalprice > 250000", mode="dv")
    return t.read()


@register(
    "mv_incremental_scenario",
    survey="§2.12,A2,beyond-ref",
    oracle="""
    WITH post AS (
      SELECT l_returnflag,
             CASE WHEN l_linenumber = 1 THEN l_quantity + 1
                  ELSE l_quantity END AS q
      FROM lineitem WHERE NOT (l_quantity < 5)
    )
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(CAST(q AS DECIMAL(28,6))) AS DOUBLE) AS sum_l_quantity
    FROM post GROUP BY l_returnflag
    """,
)
def mv_incremental_scenario(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-MV maintenance under driver certification: a COUNT/SUM
    summary over lineitem bootstraps, then the base runs a DV DELETE and a
    DV UPDATE; the refresh folds the change feed as SIGNED deltas (one
    O(delta) merge — the zero-count/group-drop IVM path, never a rebuild),
    and the folded summary must equal the oracle's one-shot aggregate over
    the post-DML closed form. l_quantity is integral-valued, so every
    fold step is exact double arithmetic — fold == rebuild bitwise."""
    from pyspark_cdc_engine.incremental import IncrementalAggregate
    from pyspark_cdc_engine.operators.dedup_incremental import _fresh_scratch_dir
    from pyspark_cdc_engine.tables import DeltaliteTable

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    tmp = _fresh_scratch_dir(f"mv_inc:{sf_dir}")
    t = DeltaliteTable(spark, f"{tmp}/lineitem_base")
    t.overwrite(li)
    mv = IncrementalAggregate(
        spark, t, f"{tmp}/li_summary", keys=["l_returnflag"],
        sum_cols=["l_quantity"],
    )
    mv.refresh()                                                 # bootstrap
    t.delete("l_quantity < 5", mode="dv")
    t.update({"l_quantity": "l_quantity + 1"}, "l_linenumber = 1", mode="dv")
    mv.refresh()                                                 # signed fold
    ops = [h["operation"] for h in mv.summary.history()]
    if ops.count("overwrite") != 1:  # explicit raise — survives `python -O`
        raise ValueError(
            f"mv_incremental_scenario expected exactly one bootstrap "
            f"overwrite (signed DV fold must not rebuild), got history {ops}"
        )
    return mv.read()


@register(
    "cdc_apply_changes_scenario",
    survey="§2.5,§2.12,J4,beyond-ref",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CASE WHEN o_orderstatus = 'P' THEN o_totalprice * 1.05
                ELSE o_totalprice END AS o_totalprice
    FROM orders
    WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 1000)
    UNION ALL
    SELECT o_orderkey + 20000000, 'N' AS o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey % 1500 = 0
    """,
)
def cdc_apply_changes_scenario(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-1 replication under driver certification (the SCD2 companion is
    scd2_replication_scenario): a source table runs a DV UPDATE, a DV
    DELETE, and an append; the full change feed folds through
    ``apply_changes`` — per-key NET effect, one file-skipping MERGE — into a
    replica whose final state must equal the oracle's closed form (which is
    by definition the source snapshot: replication is certified as exactly
    the identity it claims)."""
    from pyspark_cdc_engine.operators.dedup_incremental import _fresh_scratch_dir
    from pyspark_cdc_engine.streaming.replicate import apply_changes
    from pyspark_cdc_engine.tables import DeltaliteTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    tmp = _fresh_scratch_dir(f"t1_rep:{sf_dir}")
    t = DeltaliteTable(spark, f"{tmp}/orders_src")
    t.overwrite(o)                                                     # v0
    t.update({"o_totalprice": "o_totalprice * 1.05"},
             "o_orderstatus = 'P'", mode="dv")                         # v1
    t.delete("o_orderstatus = 'F' AND o_totalprice < 1000", mode="dv")  # v2
    t.append(
        o.filter("o_orderkey % 1500 = 0").select(
            (F.col("o_orderkey") + 20000000).alias("o_orderkey"),
            F.lit("N").alias("o_orderstatus"),
            "o_totalprice",
        )
    )                                                                  # v3
    dest = DeltaliteTable(spark, f"{tmp}/orders_replica")
    apply_changes(dest, t.read_changes(-1), ["o_orderkey"])
    return dest.read()


@register(
    "scd2_replication_scenario",
    survey="§2.5,§2.12,J4,beyond-ref",
    oracle="""
    WITH t AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders)
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           CAST(0 AS BIGINT) AS __start_version,
           CAST(CASE WHEN o_orderstatus = 'P' THEN 1
                     WHEN o_orderstatus = 'F' AND o_totalprice < 1000 THEN 2
                END AS BIGINT) AS __end_version,
           (o_orderstatus <> 'P'
            AND NOT (o_orderstatus = 'F' AND o_totalprice < 1000))
             AS __is_current
    FROM t
    UNION ALL
    SELECT o_orderkey, o_orderstatus, o_totalprice * 1.05,
           CAST(1 AS BIGINT), CAST(NULL AS BIGINT), TRUE
    FROM t WHERE o_orderstatus = 'P'
    """,
)
def scd2_replication_scenario(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CDC replication machinery under driver certification: a source
    table runs a DV UPDATE (reprice pending orders, v1) then a DV DELETE
    (drop cheap finished orders, v2); the full change feed — insert rows
    from the bootstrap, reconstructed update pre/post images, reconstructed
    delete rows — folds through ``apply_changes_scd2`` into a Type-2
    history table whose rows (state × version interval × currency flag)
    must equal the oracle's closed-form statement of that program. Covers
    read_changes' DV reconstruction AND the SCD2 clause cascade in one
    certified query; ``WHERE __is_current`` is by construction the type-1
    replica."""
    from pyspark_cdc_engine.operators.dedup_incremental import _fresh_scratch_dir
    from pyspark_cdc_engine.streaming.replicate import apply_changes_scd2
    from pyspark_cdc_engine.tables import DeltaliteTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    tmp = _fresh_scratch_dir(f"scd2_rep:{sf_dir}")
    t = DeltaliteTable(spark, f"{tmp}/orders_src")
    t.overwrite(o)                                                     # v0
    t.update({"o_totalprice": "o_totalprice * 1.05"},
             "o_orderstatus = 'P'", mode="dv")                         # v1
    t.delete("o_orderstatus = 'F' AND o_totalprice < 1000", mode="dv")  # v2
    dest = DeltaliteTable(spark, f"{tmp}/orders_scd2")
    apply_changes_scd2(dest, t.read_changes(-1), ["o_orderkey"])
    return dest.read()


@register(
    "dml_dv_merge_scenario",
    survey="§2.12,J4,§2.9,beyond-ref",
    oracle="""
    WITH t AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
    src AS (
      SELECT o_orderkey, o_totalprice,
             CASE WHEN o_totalprice < 50000 THEN 'D' ELSE 'U' END AS op
      FROM orders WHERE o_orderstatus = 'P'
      UNION ALL
      SELECT o_orderkey + 10000000, o_totalprice, 'U'
      FROM orders WHERE o_orderstatus = 'O' AND o_orderkey % 1000 = 0
    )
    SELECT t.o_orderkey,
           CASE WHEN s.op = 'U' THEN 'R' ELSE t.o_orderstatus END
             AS o_orderstatus,
           CASE WHEN s.op = 'U' THEN t.o_totalprice * 0.9
                ELSE t.o_totalprice END AS o_totalprice
    FROM t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey
    WHERE s.op IS NULL OR s.op <> 'D'
    UNION ALL
    SELECT s.o_orderkey, 'N' AS o_orderstatus, s.o_totalprice
    FROM src s LEFT JOIN t ON t.o_orderkey = s.o_orderkey
    WHERE t.o_orderkey IS NULL AND s.op = 'U'
    """,
)
def dml_dv_merge_scenario(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read MERGE under driver certification — the third leg of the
    DV DML triad (with dml_dv_scenario's deletes and the DV update golden
    suite): one merge commit whose delete clause drops cheap pending orders,
    update clause reprices the rest (images appended, matched positions
    tombstoned — no pre-existing file rewritten), and insert clause adds
    synthetic follow-up orders. The final table state must equal the
    oracle's one-shot relational statement of the same clause cascade."""
    from pyspark_cdc_engine.operators.dedup_incremental import _fresh_scratch_dir
    from pyspark_cdc_engine.tables import DeltaliteTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    tmp = _fresh_scratch_dir(f"dml_dv_merge:{sf_dir}")
    t = DeltaliteTable(spark, f"{tmp}/orders_dvm")
    t.overwrite(o)
    src = (
        o.filter("o_orderstatus = 'P'")
        .select(
            "o_orderkey",
            "o_totalprice",
            F.when(F.col("o_totalprice") < 50000, F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
        )
        .unionByName(
            o.filter("o_orderstatus = 'O' AND o_orderkey % 1000 = 0").select(
                (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
                "o_totalprice",
                F.lit("U").alias("op"),
            )
        )
    )
    t.merge(
        src,
        "target.o_orderkey = source.o_orderkey",
        [
            MergeClause("delete", condition="source.op = 'D'"),
            MergeClause(
                "update",
                condition=None,
                assignments={
                    "o_totalprice": "target.o_totalprice * 0.9",
                    "o_orderstatus": "'R'",
                },
            ),
            MergeClause(
                "insert",
                condition="source.op = 'U'",
                assignments={
                    "o_orderkey": "source.o_orderkey",
                    "o_orderstatus": "'N'",
                    "o_totalprice": "source.o_totalprice",
                },
            ),
        ],
        mode="dv",
    )
    return t.read()


@register(
    "cdf_cow_replication_scenario",
    survey="§2.5,§2.12,J4,beyond-ref",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderstatus = 'P' THEN o_totalprice * 1.05
                  ELSE o_totalprice END AS p
      FROM orders
      WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 1000)
    )
    SELECT o_orderkey, o_orderstatus,
           CASE WHEN o_orderkey % 998 = 2 THEN p + 100 ELSE p END
             AS o_totalprice
    FROM base WHERE o_orderkey % 997 <> 1
    UNION ALL
    SELECT o_orderkey + 30000000, 'N' AS o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey % 1500 = 0
    """,
)
def cdf_cow_replication_scenario(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDF materialization under driver certification: the source table
    enables CDF (``enable_cdf``, the delta.enableChangeDataFeed analog) and
    then runs an all-COPY-ON-WRITE DML program — cow UPDATE (reprice pending
    orders), cow DELETE (drop cheap finished orders), and a three-clause cow
    MERGE (delete keys ≡1 mod 997, reprice keys ≡2 mod 998 from the
    TARGET's value — residues chosen so no key satisfies both (CRT: the
    joint solution exceeds the key range), keeping the merge single-match,
    insert fresh 'N' orders) — every change row coming from the commits'
    materialized ``_change_data`` files, NOT predicate replay (cow merge has
    no replay path at all: without CDF its images dissolve into the
    rewrite). The feed folds through ``apply_changes`` into a replica whose
    final state must equal the oracle's closed form of the program — the
    replication identity, now certified for the copy-on-write half of the
    DML surface (``cdc_apply_changes_scenario`` certifies the
    merge-on-read half)."""
    from pyspark_cdc_engine.operators.dedup_incremental import _fresh_scratch_dir
    from pyspark_cdc_engine.streaming.replicate import apply_changes
    from pyspark_cdc_engine.tables import DeltaliteTable, MergeClause

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    tmp = _fresh_scratch_dir(f"cdf_cow:{sf_dir}")
    t = DeltaliteTable(spark, f"{tmp}/orders_src")
    t.overwrite(o)                                                      # v0
    t.enable_cdf()                                                      # v1
    t.update({"o_totalprice": "o_totalprice * 1.05"},
             "o_orderstatus = 'P'")                                     # v2 cow
    t.delete("o_orderstatus = 'F' AND o_totalprice < 1000")             # v3 cow
    src = (
        o.filter("o_orderkey % 997 = 1")
        .select("o_orderkey", F.lit("D").alias("act"),
                F.lit(None).cast("double").alias("price"))
        .unionByName(
            o.filter("o_orderkey % 998 = 2").select(
                "o_orderkey", F.lit("U").alias("act"),
                F.lit(None).cast("double").alias("price"),
            )
        )
        .unionByName(
            o.filter("o_orderkey % 1500 = 0").select(
                (F.col("o_orderkey") + 30000000).alias("o_orderkey"),
                F.lit("I").alias("act"),
                F.col("o_totalprice").alias("price"),
            )
        )
    )
    t.merge(                                                            # v4 cow
        src,
        "target.o_orderkey = source.o_orderkey",
        [
            MergeClause("delete", "source.act = 'D'"),
            MergeClause("update", "source.act = 'U'",
                        {"o_totalprice": "target.o_totalprice + 100"}),
            MergeClause("insert", "source.act = 'I'",
                        {"o_orderkey": "source.o_orderkey",
                         "o_orderstatus": "'N'",
                         "o_totalprice": "source.price"}),
        ],
    )
    dest = DeltaliteTable(spark, f"{tmp}/orders_replica")
    apply_changes(dest, t.read_changes(-1), ["o_orderkey"])
    return dest.read()


@register(
    "generated_partition_scenario",
    survey="§2.12,A2,beyond-ref",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue
    FROM orders GROUP BY 1
    """,
)
def generated_partition_scenario(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENERATED ALWAYS AS columns under driver certification: orders load
    into a deltalite table that DERIVES ``o_year = year(o_orderdate)`` as a
    generated PARTITION column (the canonical date-derived-partition
    pattern) — the first half of the corpus at bootstrap, the second half
    via an append that OMITS the column (computed from the recorded
    expression; a provided-but-wrong value would fail the auto-registered
    gen_ CHECK). The per-year rollup over the partitioned table must equal
    the oracle's direct aggregate — certifying that generation, the spec's
    ride through the log, and partitioned write/read round-trip without
    altering a single row. The year predicate pushdown onto the derived
    partition dirs is the scale payoff (test_plans gates partition
    pruning)."""
    from pyspark_cdc_engine.operators.dedup_incremental import _fresh_scratch_dir
    from pyspark_cdc_engine.tables import DeltaliteTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    tmp = _fresh_scratch_dir(f"genpart:{sf_dir}")
    t = DeltaliteTable(spark, f"{tmp}/orders_by_year")
    t.overwrite(
        o.filter("o_orderkey % 2 = 0"),
        generated={"o_year": "CAST(year(o_orderdate) AS INT)"},
        partition_by=["o_year"],
    )
    t.append(o.filter("o_orderkey % 2 = 1"))  # o_year computed, not provided
    return (
        t.read()
        .groupBy("o_year")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(28,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@register(
    "identity_reserved_scenario",
    survey="§2.12,beyond-ref",
    oracle="""
    WITH b AS (
        SELECT CAST(c_custkey % 2 AS INT) AS batch, COUNT(*) AS n
        FROM customer GROUP BY 1
    ), w AS (
        SELECT batch, n,
               COALESCE(SUM(n) OVER (ORDER BY batch
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
        FROM b
    )
    SELECT batch,
           CAST(n AS BIGINT) AS n_rows,
           CAST(997 + 3 * (prior + 1) AS BIGINT) AS min_sk,
           CAST(997 + 3 * (prior + n) AS BIGINT) AS max_sk,
           CAST(997 * n + 3 * (prior * n + (n * (n + 1)) // 2) AS BIGINT) AS sum_sk
    FROM w
    """,
)
def identity_reserved_scenario(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENERATED ALWAYS AS IDENTITY under reserved-range allocation (r7),
    driver-certified: an empty bootstrap declares ``sk`` (start 1000,
    step 3), then two appends with ``retries>0`` take the CONCURRENT path —
    each reserves its id range in a metadata commit and assigns DENSELY
    inside it. Which row gets which id is partition-order dependent, but
    dense reservation makes every batch's id RANGE exact arithmetic:
    batch k (n rows, ``prior`` rows before it) occupies precisely
    ``[997 + 3*(prior+1), 997 + 3*(prior+n)]`` with a closed-form sum — the
    oracle certifies count/min/max/sum per batch, i.e. that allocation is
    gap-free within a batch, disjoint across batches, and anchored at the
    declared start/step. The sparse fast path could not be certified this
    way (its values depend on physical partitioning) — that determinism is
    exactly what the reservation buys at 100 TB write concurrency."""
    from pyspark_cdc_engine.operators.dedup_incremental import _fresh_scratch_dir
    from pyspark_cdc_engine.tables import DeltaliteTable

    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    tmp = _fresh_scratch_dir(f"identres:{sf_dir}")
    t = DeltaliteTable(spark, f"{tmp}/customers_sk")
    t.overwrite(c.limit(0), identity={"sk": {"start": 1000, "step": 3}})
    t.append(c.filter("c_custkey % 2 = 0"), retries=1)  # reserved, dense
    t.append(c.filter("c_custkey % 2 = 1"), retries=1)  # reserved, dense
    return (
        t.read()
        .groupBy((F.col("c_custkey") % 2).cast("int").alias("batch"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("sk").alias("min_sk"),
            F.max("sk").alias("max_sk"),
            F.sum("sk").alias("sum_sk"),
        )
    )


@register(
    "restore_replication_scenario",
    survey="§2.12,J4,beyond-ref",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    UNION ALL
    SELECT o_orderkey + 40000000 AS o_orderkey,
           'Z' AS o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey % 1200 = 0
    """,
)
def restore_replication_scenario(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE in the change feed under driver certification (r8): the
    source runs cow UPDATE + cow DELETE, then RESTORE(0) — a logical rewind
    whose diff the feed derives Delta-CDF-style from the restore's
    add/remove (re-added dirs insert, removed dirs' visible rows delete) —
    then appends fresh rows. A replica folding the WHOLE feed must equal
    the rewound-plus-appended closed form: the update and delete cancel out
    of existence, the appends survive. Pre-r8 the restore contributed
    nothing to the feed and the replica kept the rolled-back states
    forever (the silent-divergence bug this scenario pins)."""
    from pyspark_cdc_engine.operators.dedup_incremental import _fresh_scratch_dir
    from pyspark_cdc_engine.streaming.replicate import apply_changes
    from pyspark_cdc_engine.tables import DeltaliteTable

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    tmp = _fresh_scratch_dir(f"restore_repl:{sf_dir}")
    t = DeltaliteTable(spark, f"{tmp}/orders_src")
    t.overwrite(o)                                                     # v0
    t.update({"o_totalprice": "o_totalprice * 1.05"},
             "o_orderstatus = 'P'")                                    # v1 cow
    t.delete("o_orderstatus = 'F' AND o_totalprice < 1500")            # v2 cow
    t.restore(0)                                                       # v3
    t.append(                                                          # v4
        o.filter("o_orderkey % 1200 = 0").select(
            (F.col("o_orderkey") + 40000000).alias("o_orderkey"),
            F.lit("Z").alias("o_orderstatus"),
            F.col("o_totalprice"),
        )
    )
    dest = DeltaliteTable(spark, f"{tmp}/orders_replica")
    apply_changes(dest, t.read_changes(-1), ["o_orderkey"])
    return dest.read()
