"""Corpus-curation operators (round 5 beyond-reference additions): the
selection/weighting steps a training-data pipeline runs after the dedup and
quality primitives in :mod:`.text` — each with an exact DuckDB oracle.

Scale notes are per-operator; the common thread is that every plan is one or
two hash-keyed shuffles (word, shingle hash, doc id, user id) with map-side
partial aggregation, no quadratic stage that isn't size-guarded, and no
Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_cdc_engine.config import get_config
from pyspark_cdc_engine.operators.registry import load_table, register, table_row_count
from pyspark_cdc_engine.operators.text import (
    _JACCARD_PAIRS_SQL,
    _SHINGLE_W,
    connected_components,
    jaccard_near_dup_pairs,
)


@register(
    "word_commonness_score",
    survey="M5-text,A2,J3,beyond-ref",
    oracle="""
    WITH tokens AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents
    ),
    freq AS (SELECT word, COUNT(*) AS cnt FROM tokens GROUP BY word)
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(f.cnt) AS DOUBLE) / COUNT(*) AS commonness
    FROM tokens t JOIN freq f ON f.word = t.word
    GROUP BY t.doc_id
    """,
)
def word_commonness_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-language-model quality signal without the float-log parity trap:
    each document scores the average CORPUS FREQUENCY of its word tokens
    (occurrence-weighted). Rare-garbage documents score low, natural text
    scores near the corpus mean — the same ordering a unigram-LM perplexity
    filter produces, but every intermediate is exact integer arithmetic, so
    Spark and DuckDB agree bit-for-bit (one IEEE division at the end).

    Plan: explode to (doc_id, word) tokens; aggregate word frequencies (one
    shuffle on `word`, partial map-side combine makes it one row per distinct
    word); join tokens back to frequencies on `word` (AQE broadcasts the
    vocab side when it's small — vocab grows ~log of corpus size, so even at
    100 TB the frequency table is millions of rows, not billions); final hash
    agg on doc_id."""
    d = load_table(spark, sf_dir, "documents")
    tokens = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    freq = tokens.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        tokens.join(freq, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (F.sum("cnt").cast("double") / F.count(F.lit(1))).alias("commonness"),
        )
    )


_CONTAIN_TAU = 0.6


@register(
    "containment_near_dup",
    survey="M5-dedup,A2,beyond-ref",
    oracle=f"""
    WITH shingled AS (
      SELECT doc_id, sh FROM (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
      ), UNNEST(range(1, len(w) - {_SHINGLE_W} + 2)) AS t(i),
      LATERAL (SELECT array_to_string(list_slice(w, i, i + {_SHINGLE_W} - 1), ' ') AS sh)
    ),
    sets AS (SELECT DISTINCT doc_id, substr(md5(sh), 1, 15) AS sh FROM shingled),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sets GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
      FROM sets a JOIN sets b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(i AS DOUBLE) / LEAST(sa.n, sb.n) AS containment
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(i AS DOUBLE) / LEAST(sa.n, sb.n) >= {_CONTAIN_TAU}
    """,
)
def containment_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric CONTAINMENT dedup: |A∩B| / min(|A|,|B|) over word-shingle
    sets — the signal Jaccard structurally misses. A short document fully
    quoted inside a long one has tiny Jaccard (union is dominated by the long
    doc) but containment 1.0; subset-duplication is the dominant real-world
    near-dup mode in scraped corpora (boilerplate + quoted articles). Same
    shingle-hash candidate join as the Jaccard baseline (identical guard:
    exact small-N; swap the join key to LSH bands at scale), different
    denominator."""
    d = load_table(spark, sf_dir, "documents")
    limit = get_config().get_int("engine.jaccard-exact-max-docs")
    n_docs = table_row_count(spark, sf_dir, "documents")
    if n_docs > limit:
        raise ValueError(
            f"containment_near_dup is the exact small-N baseline "
            f"({n_docs} docs > guard {limit}); use the LSH band join for "
            f"candidates at this scale"
        )
    w = _SHINGLE_W
    sets = (
        d.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, greatest(size(split(text, ' ')) - {w} + 1, 0)),"
                    f" i -> concat_ws(' ', slice(split(text, ' '), i, {w})))"
                )
            ).alias("sh"),
        )
        .select("doc_id", F.expr("substr(md5(CAST(sh AS BINARY)), 1, 15)").alias("sh"))
        .distinct()
    )
    from pyspark_cdc_engine.operators.dedup_scale import _maybe_materialize

    sets = _maybe_materialize(sets, n_docs)
    sizes = sets.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a, b = sets.alias("a"), sets.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    out = (
        inter.join(sizes.toDF("doc_a", "na"), "doc_a")
        .join(sizes.toDF("doc_b", "nb"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("i").cast("double") / F.least("na", "nb")).alias("containment"),
        )
    )
    return out.filter(F.col("containment") >= _CONTAIN_TAU)


@register(
    "dedup_keep_best",
    survey="M5-dedup,W1,beyond-ref",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_JACCARD_PAIRS_SQL}),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION ALL
      SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    reach (id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id
    ),
    clusters AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id),
    ranked AS (
      SELECT c.cluster_id, c.doc_id, d.n_chars,
             ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                ORDER BY d.n_chars DESC, c.doc_id ASC) AS rn
      FROM clusters c JOIN documents d ON d.doc_id = c.doc_id
    )
    SELECT cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           MAX(CASE WHEN rn = 1 THEN doc_id END) AS keeper_doc_id,
           MAX(CASE WHEN rn = 1 THEN n_chars END) AS keeper_n_chars
    FROM ranked
    GROUP BY cluster_id
    """,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation end-game: collapse each near-duplicate cluster to ONE
    survivor chosen by quality, not by accident of id order — keep the
    longest member (``n_chars`` DESC, doc_id ASC tiebreak; a total order, so
    both engines pick the same keeper). Output is one row per cluster with
    the keeper and member count — exactly the table a filtering pass
    anti-joins against. Pipeline: exact-Jaccard edges (swap in LSH pairs at
    scale) → pointer-doubling connected components → one window over
    cluster_id."""
    from pyspark.sql import Window

    pairs = jaccard_near_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    clusters = connected_components(docs.select("doc_id"), pairs).select(
        "doc_id", "cluster_id"
    )
    ranked = clusters.join(docs, "doc_id").withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("cluster_id").orderBy(
                F.col("n_chars").desc(), F.col("doc_id").asc()
            )
        ),
    )
    return ranked.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("keeper_doc_id"),
        F.max(F.when(F.col("rn") == 1, F.col("n_chars"))).alias("keeper_n_chars"),
    )


@register(
    "retention_cohorts",
    survey="W1,A2,F18,beyond-ref",
    oracle="""
    WITH activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    firsts AS (SELECT user_id, MIN(d) AS first_d FROM activity GROUP BY user_id)
    SELECT (firsts.first_d - DATE '1970-01-05') // 7 AS cohort_week,
           (a.d - firsts.first_d) // 7 AS week_offset,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM activity a JOIN firsts ON firsts.user_id = a.user_id
    GROUP BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention matrix (the product-analytics staple): users
    grouped by first-seen week, counted in each subsequent week they were
    active. Week indexes are integer day arithmetic anchored on a fixed
    Monday epoch (1970-01-05) — no engine-specific week truncation, exact
    parity. Plan: distinct (user, day) → per-user min (both hash aggs on
    user_id, one shuffle reused by AQE) → join back → count-distinct per
    (cohort, offset) cell. User-id keyed throughout: skew-free at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    activity = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    firsts = activity.groupBy("user_id").agg(F.min("d").alias("first_d"))
    return (
        activity.join(firsts, "user_id")
        .select(
            F.expr("datediff(first_d, DATE '1970-01-05') div 7").alias("cohort_week"),
            F.expr("datediff(d, first_d) div 7").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )
