"""Embedding / similarity-search operators over the ``embeddings`` table
(SURVEY §7 M5: ANN over an array<float> column).

Numeric portability: dot products and norms are accumulated in DECIMAL (exact,
order-independent) and only converted to DOUBLE for the final sqrt/division,
so Spark's HOF fold and DuckDB's unnest+SUM produce bit-identical scores and
therefore identical top-k ranks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_cdc_engine.operators.registry import fan_out, load_table, register

# Precision 18 keeps Spark's decimal in its compact unscaled-long encoding
# (no BigDecimal allocation per fold step) — measurably faster for the
# per-pair dot-product folds. Values here are bounded: |x| < 0.58 per
# component, so dots/norms stay < 22 against a 6-integer-digit ceiling.
_DEC = "DECIMAL(18,12)"
_N_QUERIES = 8
_TOP_K = 5


def _norm2_dec(col: str) -> str:
    """SQL (Spark) expr: exact decimal sum of squares of a float array."""
    return (
        f"aggregate({col}, CAST(0 AS {_DEC}), (acc, x) -> "
        f"CAST(acc + CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS {_DEC}) AS {_DEC}))"
    )


@register(
    "cosine_topk_bruteforce",
    survey="M5-ann,W1,O1",
    oracle=f"""
    WITH norms AS (
      SELECT vec_id,
             CAST((SELECT SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS {_DEC}))
                   FROM UNNEST(embedding) AS t(x)) AS DOUBLE) AS norm2
      FROM embeddings
    ),
    dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(SUM(CAST(CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)
                           AS {_DEC})) AS DOUBLE) AS dot
      FROM embeddings q
      JOIN embeddings c ON c.vec_id <> q.vec_id,
      UNNEST(range(1, len(q.embedding) + 1)) AS t(i)
      WHERE q.vec_id < {_N_QUERIES}
      GROUP BY q.vec_id, c.vec_id
    ),
    scored AS (
      SELECT d.query_id, d.neighbor_id,
             d.dot / SQRT(nq.norm2 * nc.norm2) AS cos_sim
      FROM dots d
      JOIN norms nq ON nq.vec_id = d.query_id
      JOIN norms nc ON nc.vec_id = d.neighbor_id
    )
    SELECT query_id, neighbor_id, rank, cos_sim FROM (
      SELECT query_id, neighbor_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= {_TOP_K}
    """,
)
def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the (small) query set against the
    full corpus, dot products via zip_with + exact decimal fold (no UDF, no
    shuffle until the per-query top-k). At 100 TB: queries broadcast, corpus
    scanned once, TakeOrdered per query — the right baseline before IVF/LSH.
    ``fan_out`` spreads the ×(dim·Q) per-row fold work across cores when the
    scan is a single split (r13, guide §2.5)."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings")).withColumn(
        "norm2", F.expr(f"CAST({_norm2_dec('embedding')} AS DOUBLE)")
    )
    q = (
        emb.filter(F.col("vec_id") < _N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("norm2").alias("q_norm2"),
        )
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.col("norm2").alias("c_norm2"),
    )
    pairs = c.crossJoin(F.broadcast(q)).filter(F.col("neighbor_id") != F.col("query_id"))
    dot_expr = (
        f"CAST(aggregate(zip_with(q_emb, c_emb, (x, y) -> "
        f"CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS {_DEC})), "
        f"CAST(0 AS {_DEC}), (acc, p) -> CAST(acc + p AS {_DEC})) AS DOUBLE)"
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        (F.expr(dot_expr) / F.sqrt(F.col("q_norm2") * F.col("c_norm2"))).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


@register(
    "vector_stats",
    survey="M5-ann,A2",
    oracle=f"""
    SELECT label, COUNT(*) AS cnt,
           CAST(SUM(CAST(SQRT(CAST((SELECT SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS {_DEC}))
                                    FROM UNNEST(embedding) AS t(x)) AS DOUBLE)) AS {_DEC}))
                AS DOUBLE) / COUNT(*) AS avg_norm,
           MIN(len(embedding)) AS dim
    FROM embeddings GROUP BY label
    """,
)
def vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label corpus statistics over the embedding column (count, mean L2
    norm, dimensionality) — the sanity profile before any ANN build."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "norm", F.sqrt(F.expr(f"CAST({_norm2_dec('embedding')} AS DOUBLE)"))
    )
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("cnt"),
        (F.sum(F.col("norm").cast(_DEC)).cast("double") / F.count(F.lit(1))).alias("avg_norm"),
        F.min(F.size("embedding")).alias("dim"),
    )


@register(
    "embedding_int8_quantize",
    survey="M5-ann,A2,J3,beyond-ref",
    oracle=f"""
    WITH comps AS (
      SELECT vec_id, i AS d, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i)
    ),
    dims AS (SELECT d, MIN(x) AS lo, MAX(x) AS hi FROM comps GROUP BY d),
    coded AS (
      SELECT c.vec_id, c.x, dims.lo, dims.hi,
             CASE WHEN dims.hi = dims.lo THEN 0
                  ELSE LEAST(255, GREATEST(0,
                       CAST(FLOOR((c.x - dims.lo) * 255 / (dims.hi - dims.lo)) AS INT)))
             END AS code
      FROM comps c JOIN dims ON dims.d = c.d
    ),
    err AS (
      SELECT vec_id,
             ABS(x - (lo + (code + 0.5) * (hi - lo) / 255)) AS e
      FROM coded
    )
    SELECT vec_id, CAST(COUNT(*) AS INT) AS n_dims,
           CAST(SUM(CAST(e AS {_DEC})) AS DOUBLE) / COUNT(*) AS mean_abs_err,
           MAX(e) AS max_abs_err
    FROM err GROUP BY vec_id
    """,
)
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar (per-dimension min/max) int8 quantization of the embedding
    column with exact reconstruction-error accounting — the storage-side
    step of a vector index (4x smaller than float32; PQ in dedup_scale is the
    multi-dim codebook sibling). Per-vector output: dimension count, mean and
    max absolute reconstruction error of the (code + 0.5)-centroid
    dequantization.

    Plan: posexplode to (vec_id, dim, x); per-dimension min/max is a 64-row
    aggregate BROADCAST back to the components (no second shuffle of the
    corpus); code/error are pure column IEEE arithmetic identical in both
    engines; final hash agg on vec_id with the error sum accumulated in
    DECIMAL so reduction order can't move the mean. At 100 TB the only
    corpus-sized shuffle is the final per-vector agg — and a real deployment
    would fuse it away by keeping components in vector order."""
    emb = load_table(spark, sf_dir, "embeddings")
    comps = emb.select(
        "vec_id", F.posexplode("embedding").alias("d", "xf")
    ).select("vec_id", "d", F.col("xf").cast("double").alias("x"))
    dims = comps.groupBy("d").agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    coded = comps.join(F.broadcast(dims), "d")
    code = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(
            F.lit(255),
            F.greatest(
                F.lit(0),
                F.floor(
                    (F.col("x") - F.col("lo")) * 255 / (F.col("hi") - F.col("lo"))
                ).cast("int"),
            ),
        )
    )
    recon = F.col("lo") + (code + 0.5) * (F.col("hi") - F.col("lo")) / 255
    err = coded.select("vec_id", F.abs(F.col("x") - recon).alias("e"))
    return err.groupBy("vec_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_dims"),
        (F.sum(F.col("e").cast(_DEC)).cast("double") / F.count(F.lit(1))).alias(
            "mean_abs_err"
        ),
        F.max("e").alias("max_abs_err"),
    )


@register(
    "ann_dim_truncation_recall",
    survey="M5-ann,W1,A2,beyond-ref",
    oracle=f"""
    WITH halved AS (
      SELECT vec_id, embedding,
             embedding[1:CAST(len(embedding) // 2 AS INT)] AS emb_h
      FROM embeddings
    ),
    norms AS (
      SELECT vec_id,
             CAST((SELECT SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS {_DEC}))
                   FROM UNNEST(embedding) AS t(x)) AS DOUBLE) AS norm2,
             CAST((SELECT SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS {_DEC}))
                   FROM UNNEST(emb_h) AS t(x)) AS DOUBLE) AS norm2_h
      FROM halved
    ),
    dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(SUM(CAST(CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)
                           AS {_DEC})) AS DOUBLE) AS dot,
             CAST(SUM(CASE WHEN i <= len(q.embedding) // 2 THEN
                   CAST(CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)
                        AS {_DEC}) ELSE CAST(0 AS {_DEC}) END) AS DOUBLE) AS dot_h
      FROM embeddings q
      JOIN embeddings c ON c.vec_id <> q.vec_id,
      UNNEST(range(1, len(q.embedding) + 1)) AS t(i)
      WHERE q.vec_id < {_N_QUERIES}
      GROUP BY q.vec_id, c.vec_id
    ),
    full_topk AS (
      SELECT query_id, neighbor_id FROM (
        SELECT d.query_id, d.neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY d.query_id
                                  ORDER BY d.dot / SQRT(nq.norm2 * nc.norm2) DESC,
                                           d.neighbor_id) AS rank
        FROM dots d
        JOIN norms nq ON nq.vec_id = d.query_id
        JOIN norms nc ON nc.vec_id = d.neighbor_id
      ) WHERE rank <= {_TOP_K}
    ),
    half_topk AS (
      SELECT query_id, neighbor_id FROM (
        SELECT d.query_id, d.neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY d.query_id
                                  ORDER BY d.dot_h / SQRT(nq.norm2_h * nc.norm2_h) DESC,
                                           d.neighbor_id) AS rank
        FROM dots d
        JOIN norms nq ON nq.vec_id = d.query_id
        JOIN norms nc ON nc.vec_id = d.neighbor_id
      ) WHERE rank <= {_TOP_K}
    )
    SELECT f.query_id,
           CAST(COUNT(h.neighbor_id) AS BIGINT) AS hits_half,
           CAST(COUNT(h.neighbor_id) AS DOUBLE) / {_TOP_K} AS recall_half
    FROM full_topk f
    LEFT JOIN half_topk h
      ON h.query_id = f.query_id AND h.neighbor_id = f.neighbor_id
    GROUP BY f.query_id
    """,
)
def ann_dim_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style dimension-truncation eval: recall@{_TOP_K} of
    brute-force cosine over the FIRST HALF of each embedding against the
    full-dimension ground truth, per query-panel vector. The question a
    100 TB pipeline asks before storing/indexing truncated vectors (MRL,
    Kusupati et al. 2022: prefix dims of a matryoshka-trained embedding
    retain most retrieval quality — this measures whether THESE embeddings
    have that property; for the synthetic test vectors the answer is a
    baseline, the operator is the deliverable). One corpus scan computes
    BOTH dot products (the half-dim dot is a prefix subtotal of the same
    exploded terms — no second pass, no second shuffle); exact-decimal
    sums keep both rankings bit-identical to the oracle.

    100 TB shape: identical to :func:`cosine_topk_bruteforce` — Q exploded
    query rows broadcast, corpus scanned once, two hash aggs over the same
    (neighbor, query) cells, per-query top-k windows over Q×N rows."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"), cut=True)
    ex = emb.select("vec_id", F.posexplode("embedding").alias("pos", "val"))
    half = F.expr("CAST(size(embedding) / 2 AS INT)")
    dims = emb.select("vec_id", half.alias("half_dim"))

    sq = F.expr(f"CAST(CAST(val AS DOUBLE) * CAST(val AS DOUBLE) AS {_DEC})")
    norms = (
        ex.join(dims, "vec_id")
        .groupBy("vec_id")
        .agg(
            F.sum(sq).cast("double").alias("norm2"),
            F.sum(F.when(F.col("pos") < F.col("half_dim"), sq)
                  .otherwise(F.expr(f"CAST(0 AS {_DEC})")))
            .cast("double").alias("norm2_h"),
        )
    )
    panel = F.col("vec_id") < _N_QUERIES
    qex = ex.filter(panel).join(dims, "vec_id").select(
        F.col("vec_id").alias("query_id"), "pos",
        F.col("val").alias("qval"), "half_dim",
    )
    term = F.expr(f"CAST(CAST(val AS DOUBLE) * CAST(qval AS DOUBLE) AS {_DEC})")
    dots = (
        ex.join(F.broadcast(qex), "pos")
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("vec_id", "query_id")
        .agg(
            F.sum(term).cast("double").alias("dot"),
            F.sum(F.when(F.col("pos") < F.col("half_dim"), term)
                  .otherwise(F.expr(f"CAST(0 AS {_DEC})")))
            .cast("double").alias("dot_h"),
        )
    )
    qn = norms.filter(panel).select(
        F.col("vec_id").alias("query_id"),
        F.col("norm2").alias("qn2"),
        F.col("norm2_h").alias("qn2_h"),
    )
    scored = dots.join(norms, "vec_id").join(F.broadcast(qn), "query_id")
    w_full = Window.partitionBy("query_id").orderBy(
        (F.col("dot") / F.sqrt(F.col("qn2") * F.col("norm2"))).desc(),
        F.col("vec_id"),
    )
    w_half = Window.partitionBy("query_id").orderBy(
        (F.col("dot_h") / F.sqrt(F.col("qn2_h") * F.col("norm2_h"))).desc(),
        F.col("vec_id"),
    )
    ranked = scored.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.row_number().over(w_full).alias("rank_full"),
        F.row_number().over(w_half).alias("rank_half"),
    )
    full_topk = ranked.filter(F.col("rank_full") <= _TOP_K).select(
        "query_id", "neighbor_id"
    )
    half_topk = (
        ranked.filter(F.col("rank_half") <= _TOP_K)
        .select("query_id", "neighbor_id")
        .withColumn("hit", F.lit(1))
    )
    hits = F.sum(F.coalesce(F.col("hit"), F.lit(0)))
    return (
        full_topk.join(half_topk, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            hits.cast("bigint").alias("hits_half"),
            (hits.cast("double") / _TOP_K).alias("recall_half"),
        )
    )

@register(
    "hard_negative_mining",
    survey="M5-ann,W1,J3,A2,beyond-ref",
    oracle=f"""
    WITH norms AS (
      SELECT vec_id, label,
             CAST((SELECT SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS {_DEC}))
                   FROM UNNEST(embedding) AS t(x)) AS DOUBLE) AS norm2
      FROM embeddings
    ),
    dots AS (
      SELECT q.vec_id AS query_id, q.label AS q_label,
             c.vec_id AS neighbor_id, c.label AS c_label,
             CAST(SUM(CAST(CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)
                           AS {_DEC})) AS DOUBLE) AS dot
      FROM embeddings q
      JOIN embeddings c ON c.vec_id <> q.vec_id,
      UNNEST(range(1, len(q.embedding) + 1)) AS t(i)
      WHERE q.vec_id < {_N_QUERIES}
      GROUP BY q.vec_id, q.label, c.vec_id, c.label
    ),
    scored AS (
      SELECT d.query_id, d.q_label, d.neighbor_id, d.c_label,
             d.dot / SQRT(nq.norm2 * nc.norm2) AS cos_sim
      FROM dots d
      JOIN norms nq ON nq.vec_id = d.query_id
      JOIN norms nc ON nc.vec_id = d.neighbor_id
    ),
    pos AS (
      SELECT query_id, MAX(cos_sim) AS best_pos_sim
      FROM scored WHERE c_label = q_label GROUP BY query_id
    ),
    neg AS (
      SELECT query_id, neighbor_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored WHERE c_label <> q_label
    )
    SELECT n.query_id, n.neighbor_id, n.rank, n.cos_sim, p.best_pos_sim,
           n.cos_sim - p.best_pos_sim AS margin
    FROM neg n LEFT JOIN pos p ON p.query_id = n.query_id
    WHERE n.rank <= {_TOP_K}
    """,
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for embedding/contrastive training data: for each
    anchor in the query panel, the top-{_TOP_K} most-similar vectors with a
    DIFFERENT ``label`` (the textbook hardest-negative set), alongside the
    anchor's best same-label similarity and the triplet margin
    ``cos(hard_negative) - cos(best_positive)`` (a positive margin means the
    negative outranks every positive — the pairs a metric-learning run needs
    most). Distinct from :func:`cosine_topk_bruteforce`: that query ranks
    neighbors label-blind; this one is the supervised mining step that feeds
    triplet/InfoNCE training.

    Plan: one corpus scan; the {_N_QUERIES}-anchor panel (with labels)
    broadcasts against it exactly like the brute-force baseline; the pair
    frame splits into different-label (per-anchor top-k window over Q x N
    rows) and same-label (per-anchor MAX — order-independent, so
    cross-engine-safe on doubles) sides; a final broadcast-sized join glues
    the margin on. Dot products and norms accumulate in DECIMAL, the
    cosine and margin are single IEEE ops on bit-identical inputs, so ranks
    and margins match the oracle exactly. 100 TB shape: same as the
    brute-force kernel — anchors broadcast, corpus scanned once, no
    corpus-sized shuffle except the per-anchor top-k. ``fan_out`` spreads
    the ×(dim·Q) per-row fold across cores on single-split scans (r13)."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings")).withColumn(
        "norm2", F.expr(f"CAST({_norm2_dec('embedding')} AS DOUBLE)")
    )
    q = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("q_emb"),
        F.col("norm2").alias("q_norm2"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("c_label"),
        F.col("embedding").alias("c_emb"),
        F.col("norm2").alias("c_norm2"),
    )
    dot_expr = (
        f"CAST(aggregate(zip_with(q_emb, c_emb, (x, y) -> "
        f"CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS {_DEC})), "
        f"CAST(0 AS {_DEC}), (acc, p) -> CAST(acc + p AS {_DEC})) AS DOUBLE)"
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "q_label",
            "neighbor_id",
            "c_label",
            (F.expr(dot_expr) / F.sqrt(F.col("q_norm2") * F.col("c_norm2"))).alias(
                "cos_sim"
            ),
        )
    )
    # One pass over the scored pairs: best_pos_sim is a whole-partition
    # window MAX over the same query_id partitioning the rank window uses, so
    # both share a single exchange and the Q x N cross join (with its
    # per-pair decimal dot fold) is evaluated ONCE — the pos/neg split as two
    # separate consumers re-ran the whole cross-join subtree per side (r12,
    # guide §2.4). MAX over the identical same-label double set (NULL when a
    # query has no same-label neighbor, matching the former left join) and an
    # unchanged rank window keep every output value bit-identical.
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    w_pos = Window.partitionBy("query_id")
    neg = (
        scored.withColumn(
            "best_pos_sim",
            F.max(
                F.when(F.col("c_label") == F.col("q_label"), F.col("cos_sim"))
            ).over(w_pos),
        )
        .filter(F.col("c_label") != F.col("q_label"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
    )
    return neg.select(
        "query_id",
        "neighbor_id",
        "rank",
        "cos_sim",
        "best_pos_sim",
        (F.col("cos_sim") - F.col("best_pos_sim")).alias("margin"),
    )
