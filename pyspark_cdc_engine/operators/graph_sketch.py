"""Mergeable-sketch and iterative-graph operators (round 5 beyond-reference).

Two algorithm families a corpus-scale engine needs beyond the existing
HLL/approx-percentile sketches and connected components:

- **Misra-Gries frequent items** (``heavy_hitters_mg``): a k-counter mergeable
  summary computed per Arrow batch and combined by pointwise sum — the
  classic distributed heavy-hitters sketch (constant memory per task,
  one tiny shuffle). Certified with the same trick as
  ``approx_distinct_sketch``: sketch internals are engine-specific, so the row
  emits the sketch's CONTRACT — every item with true frequency > n/(k+1) must
  be found, and its summed lower-bound estimate must be within n/(k+1) of the
  exact count — asserted in-row against exactly computed frequencies, with
  the oracle emitting constant TRUE.
- **Unrolled PageRank** (``pagerank3_near_dup``): three power iterations of
  damped PageRank over the near-duplicate pair graph — the canonical
  iterative-algorithm shape (join contributions on src, aggregate on dst,
  rebind) expressed purely declaratively, with every per-node contribution
  sum accumulated in DECIMAL so Spark's and DuckDB's reduction orders cannot
  produce different floats. Fixed iteration count makes the whole computation
  SQL-expressible, so the oracle replays it exactly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyspark_cdc_engine.checkpointing import materialize
from pyspark_cdc_engine.operators.dedup_scale import _SHINGLE_W, _shingle_expr_spark
from pyspark_cdc_engine.operators.registry import fan_out, load_table, register
from pyspark_cdc_engine.operators.text import _JACCARD_PAIRS_SQL, near_dup_edges

_MG_K = 64  # Misra-Gries counter budget; error bound = n / (K + 1)


def _mg_batch_summaries(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """One Misra-Gries pass per Arrow batch: at most ``_MG_K`` counters live
    at any point; surviving (word, count) rows are LOWER bounds with
    per-batch error ≤ batch_n/(K+1), and summing summaries keeps the total
    error ≤ n/(K+1) (mergeable-summaries property)."""
    for pdf in batches:
        counters: dict[str, int] = {}
        for word in pdf["word"]:
            if word in counters:
                counters[word] += 1
            elif len(counters) < _MG_K:
                counters[word] = 1
            else:  # decrement-all step: evict zeros
                dead = []
                for k in counters:
                    counters[k] -= 1
                    if counters[k] == 0:
                        dead.append(k)
                for k in dead:
                    del counters[k]
        yield pd.DataFrame(
            {"word": list(counters), "est": list(counters.values())}
        )


@register(
    "heavy_hitters_mg",
    survey="A2,M5-text,UDF,beyond-ref",
    oracle=f"""
    WITH tok AS (
      SELECT word FROM (
        SELECT UNNEST(string_split(text, ' ')) AS word FROM documents
      ) WHERE word <> ''
    ),
    n AS (SELECT COUNT(*) AS c FROM tok),
    freq AS (SELECT word, COUNT(*) AS exact_cnt FROM tok GROUP BY word)
    SELECT word, exact_cnt, TRUE AS sketch_found, TRUE AS within_bound
    FROM freq, n WHERE exact_cnt > c / {_MG_K + 1}.0
    """,
)
def heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed frequent-items via Misra-Gries (K=64): per-batch
    sketches stream through ``mapInPandas`` (constant memory, the raw token
    stream never shuffles — only ≤K counter rows per batch do), summaries
    merge by a plain word-keyed sum. The output rows are the EXACT heavy
    hitters (frequency > n/(K+1)) with two in-row contract assertions:
    ``sketch_found`` (the merged sketch surfaced the item) and
    ``within_bound`` (exact − estimate ≤ n/(K+1)). At 100 TB the exact-freq
    yardstick drops and the sketch stands alone — same state size."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    tokens = d.select(
        F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    summaries = tokens.mapInPandas(
        _mg_batch_summaries,
        schema=T.StructType(
            [
                T.StructField("word", T.StringType()),
                T.StructField("est", T.LongType()),
            ]
        ),
    )
    merged = summaries.groupBy("word").agg(F.sum("est").alias("est"))
    exact = tokens.groupBy("word").agg(F.count(F.lit(1)).alias("exact_cnt"))
    n_total = tokens.agg(F.count(F.lit(1)).alias("n"))
    bound = F.col("n") / (_MG_K + 1)
    return (
        exact.crossJoin(F.broadcast(n_total))
        .filter(F.col("exact_cnt") > bound)
        .join(merged, "word", "left")
        .select(
            "word",
            "exact_cnt",
            F.col("est").isNotNull().alias("sketch_found"),
            (
                (F.col("exact_cnt") - F.coalesce("est", F.lit(0))) <= bound
            ).alias("within_bound"),
        )
    )


_PR_DAMP = 0.85
_PR_DEC = "DECIMAL(28,16)"


def _pr_sum(expr: str) -> str:
    """Order-independent double sum of per-edge contributions (both engines)."""
    return f"CAST(SUM(CAST({expr} AS {_PR_DEC})) AS DOUBLE)"


@register(
    "pagerank3_near_dup",
    survey="J3,A2,beyond-ref",
    oracle=f"""
    WITH pairs AS ({_JACCARD_PAIRS_SQL}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
    r1 AS (
      SELECT n.doc_id,
             0.15 + {_PR_DAMP} * COALESCE(i.s, 0.0) AS r
      FROM documents n LEFT JOIN (
        SELECT e.dst AS doc_id, {_pr_sum('1.0 / deg.d')} AS s
        FROM edges e JOIN deg ON deg.src = e.src GROUP BY e.dst
      ) i ON i.doc_id = n.doc_id
    ),
    r2 AS (
      SELECT n.doc_id,
             0.15 + {_PR_DAMP} * COALESCE(i.s, 0.0) AS r
      FROM documents n LEFT JOIN (
        SELECT e.dst AS doc_id, {_pr_sum('r1.r / deg.d')} AS s
        FROM edges e JOIN deg ON deg.src = e.src
        JOIN r1 ON r1.doc_id = e.src GROUP BY e.dst
      ) i ON i.doc_id = n.doc_id
    )
    SELECT n.doc_id,
           0.15 + {_PR_DAMP} * COALESCE(i.s, 0.0) AS pagerank
    FROM documents n LEFT JOIN (
      SELECT e.dst AS doc_id, {_pr_sum('r2.r / deg.d')} AS s
      FROM edges e JOIN deg ON deg.src = e.src
      JOIN r2 ON r2.doc_id = e.src GROUP BY e.dst
    ) i ON i.doc_id = n.doc_id
    """,
)
def pagerank3_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three damped power iterations of PageRank over the near-duplicate pair
    graph (uniform start r=1): per iteration, each node's rank splits evenly
    across its edges (r/deg computed per edge, IEEE-identical in both
    engines), incoming contributions aggregate under DECIMAL accumulation
    (order-independent), and isolated documents settle at the teleport mass
    0.15. Each iteration is one src-keyed join plus one dst-keyed aggregate —
    the exact dataflow GraphX/Pregel runs, expressed as plain DataFrame ops
    so Catalyst pipelines it; the fixed iteration count keeps the whole thing
    SQL-expressible for the oracle. The edge list comes from
    :func:`pyspark_cdc_engine.operators.text.near_dup_edges`
    (engine.pair-source: exact baseline below the guard — oracle-matching —
    banded LSH above it, so a 100k-doc corpus degrades to the scale plan
    instead of raising); it is materialized once — iterations must not re-run
    candidate generation. At 100 TB also materialize the rank vector every
    few iterations."""
    pairs = near_dup_edges(spark, sf_dir)
    nodes = load_table(spark, sf_dir, "documents").select("doc_id")
    edges = pairs.union(pairs.select("doc_b", "doc_a")).toDF("src", "dst")
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    # every iteration re-reads the edge list: materialize it ONCE or the
    # shingle-join candidate generation re-executes per iteration (3x the
    # dominant cost; same reason connected_components cuts its edge lineage)
    edges_d = materialize(edges.join(deg, "src"))

    r = nodes.select("doc_id", F.lit(1.0).alias("r"))
    for _ in range(3):
        contrib = (
            edges_d.join(r, edges_d.src == r.doc_id)
            .select(F.col("dst"), F.expr(f"CAST(r / d AS {_PR_DEC})").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").cast("double").alias("s"))
        )
        r = nodes.join(contrib, nodes.doc_id == contrib.dst, "left").select(
            "doc_id",
            (F.lit(0.15) + _PR_DAMP * F.coalesce("s", F.lit(0.0))).alias("r"),
        )
    return r.select("doc_id", F.col("r").alias("pagerank"))


_WIN_W = 4  # winnowing window (consecutive shingle hashes per window)


@register(
    "winnowing_fingerprints",
    survey="M5-dedup,W1,A2,beyond-ref",
    oracle=f"""
    WITH shingled AS (
      SELECT doc_id, i - 1 AS pos,
             substr(md5(array_to_string(list_slice(w, i, i + {_SHINGLE_W} - 1), ' ')), 1, 15) AS h
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           UNNEST(range(1, len(w) - {_SHINGLE_W} + 2)) AS t(i)
    ),
    -- composite key: h then (999999 - pos): its window MIN is the minimal
    -- hash with the RIGHTMOST position on ties, in one pass, no join
    wins AS (
      SELECT doc_id,
             MIN(h || lpad(CAST(999999 - pos AS VARCHAR), 6, '0'))
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING) AS mc,
             COUNT(*) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING)
               AS wn
      FROM shingled
    ),
    fps AS (
      SELECT DISTINCT doc_id,
             substr(mc, 1, 15) AS h,
             999999 - CAST(substr(mc, 16, 6) AS INT) AS fp_pos
      FROM wins WHERE wn = {_WIN_W}
    )
    SELECT doc_id,
           COUNT(*) AS n_fingerprints,
           md5(string_agg(lpad(CAST(fp_pos AS VARCHAR), 6, '0') || ':' || h,
                          ',' ORDER BY lpad(CAST(fp_pos AS VARCHAR), 6, '0') || ':' || h))
             AS fp_md5
    FROM fps GROUP BY doc_id
    """,
)
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINNOWING (the MOSS fingerprint-selection algorithm): over each
    document's sequence of shingle hashes, every window of 4 consecutive
    hashes contributes its minimum (rightmost position on ties), and the
    distinct selected (position, hash) pairs are the document's
    fingerprints — guaranteed to include at least one from every 4-shingle
    span, so any sufficiently long shared substring between two documents
    shares a fingerprint. The per-document fingerprint set is surfaced as a
    scalar count + canonical md5 digest (driver-hashable); matching digests
    = identical fingerprint sets.

    Plan shape: one Generate (positions ride along), then ONE frame-spec
    window pass per doc — the rightmost-min tie-break is encoded into the
    window key itself (hash || reversed-position), so no positional
    self-join ever materializes the per-doc cross product — then distinct +
    per-doc aggregation. Everything is keyed on doc_id: embarrassingly
    parallel at 100 TB."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    from pyspark.sql import Window

    shingled = d.select(
        "doc_id",
        F.posexplode(F.expr(_shingle_expr_spark(_SHINGLE_W))).alias("pos", "sh"),
    ).select(
        "doc_id",
        "pos",
        F.expr(
            "concat(substr(md5(CAST(sh AS BINARY)), 1, 15), "
            "lpad(CAST(999999 - pos AS STRING), 6, '0'))"
        ).alias("hc"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, _WIN_W - 1)
    )
    wins = shingled.select(
        "doc_id",
        F.min("hc").over(w).alias("mc"),
        F.count(F.lit(1)).over(w).alias("wn"),
    ).filter(F.col("wn") == _WIN_W)
    fps = wins.select(
        "doc_id",
        F.expr("substr(mc, 1, 15)").alias("h"),
        F.expr("999999 - CAST(substr(mc, 16, 6) AS INT)").alias("fp_pos"),
    ).distinct()
    return fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fingerprints"),
        # zero-padded positions keep the canonical ordering a pure string
        # sort — identical in both engines
        F.md5(
            F.array_join(
                F.sort_array(
                    F.collect_list(
                        F.concat_ws(
                            ":",
                            F.lpad(F.col("fp_pos").cast("string"), 6, "0"),
                            F.col("h"),
                        )
                    )
                ),
                ",",
            ).cast("binary")
        ).alias("fp_md5"),
    )


# ---------------------------------------------------------------------------
# Triangle counting (degree-oriented, the MapReduce-classic formulation)
# ---------------------------------------------------------------------------

_TRI_BASKET_CAP = 32  # drop orders with more distinct parts (hot-basket guard)
# DOULION edge-sampling rate p = _TRI_KEEP/16, selected by the first hex digit
# of the edge's md5 — deterministic, so the oracle reproduces the sample.
_TRI_KEEP = 4
_TRI_SCALE = (16 // _TRI_KEEP) ** 3  # estimate multiplier 1/p^3

_TRI_DIGITS = ", ".join(f"'{d:x}'" for d in range(_TRI_KEEP))

_TRIANGLE_ORACLE = f"""
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    ok AS (
      SELECT l_orderkey FROM li GROUP BY l_orderkey
      HAVING COUNT(*) <= {_TRI_BASKET_CAP}
    ),
    li2 AS (SELECT li.l_orderkey, li.l_partkey FROM li JOIN ok USING (l_orderkey)),
    e0 AS (
      SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM li2 a JOIN li2 b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    e AS (
      SELECT u, v FROM e0
      WHERE substr(md5(CAST(u AS VARCHAR) || '_' || CAST(v AS VARCHAR)), 1, 1)
              IN ({_TRI_DIGITS})
    ),
    deg AS (
      SELECT x, COUNT(*) AS d
      FROM (SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e)
      GROUP BY x
    ),
    tri AS (
      SELECT COUNT(*) AS t
      FROM e e1
      JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
      JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
    )
    SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS nodes,
           CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS edges_sampled,
           CAST((SELECT SUM(d * (d - 1) / 2) FROM deg) AS BIGINT) AS wedges_sampled,
           CAST((SELECT t FROM tri) AS BIGINT) AS triangles_sampled,
           CAST((SELECT t * {_TRI_SCALE} FROM tri) AS BIGINT) AS triangles_est
"""


@register(
    "copurchase_triangles",
    survey="J2,A2,A3,beyond-ref",
    oracle=_TRIANGLE_ORACLE,
)
def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the part co-purchase graph (parts are adjacent iff
    some order contains both) — the graph-cohesion statistic behind the
    global clustering coefficient (3*triangles/wedges).

    100 TB shape, two published techniques composed:

    - **DOULION edge sparsification** (Tsourakakis et al., KDD'09): each
      distinct edge survives with p = 1/4, selected by the first hex digit of
      its md5 — a coin the DuckDB oracle can flip identically, so the sample
      (and therefore every output number) is bit-reproducible. Wedge work
      falls by p^2 and the unbiased estimate is t/p^3, reported alongside the
      exact sampled count. The co-purchase graph is dense by construction
      (every k-item basket is a clique), so counting on the full graph is a
      quadratic-wedge plan no orientation can save at scale.
    - **Degree orientation** (Suri & Vassilvitskii, WWW'11): each sampled
      edge points from its lower-(degree, id) endpoint to the higher, so
      every triangle is counted exactly once at its minimum-degree vertex and
      the wedge self-join fans out on out-degree, which orientation caps at
      O(sqrt(m)) even for power-law hubs. Candidate wedges then hash-join the
      edge set on the closing pair.

    Edge generation is guarded: orders with > {cap} distinct parts are
    dropped before the within-order pair join, bounding per-row fanout the
    same way the dedup family guards hot shingles. All outputs are integers —
    exact parity with the relational oracle.""".format(cap=_TRI_BASKET_CAP)
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    sizes = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_items"))
    li2 = li.join(
        sizes.filter(F.col("n_items") <= _TRI_BASKET_CAP).select("l_orderkey"),
        "l_orderkey",
    )
    a = li2.alias("a")
    b = li2.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
        .filter(
            F.expr(
                "substr(md5(CAST(concat(CAST(u AS STRING), '_', CAST(v AS STRING))"
                f" AS BINARY)), 1, 1) IN ({_TRI_DIGITS})"
            )
        )
    )
    # edges feeds degree calc, orientation, and the closing-edge probe —
    # materialize once so the order-pair join doesn't rerun per consumer
    edges = materialize(edges)
    # deg feeds four consumers, but each re-derivation is one agg over the
    # already-materialized edges — measured: eagerly materializing deg (and
    # oriented) regressed 4.3 -> 9-13 s warmed by serializing the job chain
    # and blocking the broadcast the wedge join wants (r12; left as-is)
    deg = (
        edges.select(F.col("u").alias("x"))
        .unionAll(edges.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    with_deg = (
        edges.join(deg.withColumnRenamed("x", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("x", "v").withColumnRenamed("d", "dv"), "v")
    )
    # orient: src = endpoint ranked lower by (degree, id); total order => DAG
    src_is_u = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = with_deg.select(
        F.when(src_is_u, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(src_is_u, F.col("v")).otherwise(F.col("u")).alias("t"),
    )
    o1 = oriented.alias("o1")
    o2 = oriented.alias("o2")
    cand = o1.join(
        o2,
        (F.col("o1.s") == F.col("o2.s")) & (F.col("o1.t") < F.col("o2.t")),
    ).select(
        # o1.t < o2.t is an id comparison, so the candidate closing pair is
        # already normalized the way `edges` is (u < v)
        F.col("o1.t").alias("cu"),
        F.col("o2.t").alias("cv"),
    )
    closed = cand.join(
        edges, (F.col("cu") == F.col("u")) & (F.col("cv") == F.col("v"))
    )
    tri = closed.agg(F.count(F.lit(1)).cast("bigint").alias("triangles_sampled"))
    nodes = deg.agg(F.count(F.lit(1)).cast("bigint").alias("nodes"))
    n_edges = edges.agg(F.count(F.lit(1)).cast("bigint").alias("edges_sampled"))
    wedges = deg.agg(
        F.sum(F.expr("d * (d - 1) div 2")).cast("bigint").alias("wedges_sampled")
    )
    return (
        F.broadcast(nodes)
        .crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(wedges))
        .crossJoin(tri)
        .select(
            "nodes",
            "edges_sampled",
            "wedges_sampled",
            "triangles_sampled",
            (F.col("triangles_sampled") * _TRI_SCALE)
            .cast("bigint")
            .alias("triangles_est"),
        )
    )
