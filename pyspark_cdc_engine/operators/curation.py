"""Corpus-curation operators (round 5 beyond-reference additions): the
selection/weighting steps a training-data pipeline runs after the dedup and
quality primitives in :mod:`.text` — each with an exact DuckDB oracle.

Scale notes are per-operator; the common thread is that every plan is one or
two hash-keyed shuffles (word, shingle hash, doc id, user id) with map-side
partial aggregation, no quadratic stage that isn't size-guarded, and no
Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_cdc_engine.config import get_config
from pyspark_cdc_engine.operators.registry import (
    fan_out,
    load_table,
    register,
    table_row_count,
)
from pyspark_cdc_engine.operators.dedup_scale import _shingle_expr_spark
from pyspark_cdc_engine.operators.text import (
    _BPE_APPLY_CTES,
    _JACCARD_PAIRS_SQL,
    _SHINGLE_W,
    _bpe_word_tokens,
    connected_components,
    near_dup_edges,
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
    d = fan_out(load_table(spark, sf_dir, "documents"))
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


@register(
    "bigram_predictability_score",
    survey="M5-text,A2,J3,beyond-ref",
    oracle="""
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    bg AS (
      SELECT doc_id, list_extract(w, i) AS w1, list_extract(w, i + 1) AS w2
      FROM words, UNNEST(range(1, len(w))) AS t(i)
    ),
    c12 AS (SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, COUNT(*) AS c FROM bg GROUP BY w1)
    SELECT bg.doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(c12.c) AS BIGINT) AS sum_follow,
           CAST(SUM(c1.c) AS BIGINT) AS sum_hist,
           CAST(SUM(c12.c) AS DOUBLE) / CAST(SUM(c1.c) AS DOUBLE)
             AS predictability
    FROM bg JOIN c12 ON bg.w1 = c12.w1 AND bg.w2 = c12.w2
            JOIN c1 ON bg.w1 = c1.w1
    GROUP BY bg.doc_id
    """,
)
def bigram_predictability_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional (order-sensitive) LM quality signal: per document, the
    occurrence-weighted fraction of next-word transitions that the corpus
    bigram model predicts — Σ c(w_i, w_{i+1}) / Σ c(w_i, ·) over the doc's
    bigram occurrences. This is the signal a bigram-perplexity filter
    (CCNet/Gopher-style) ranks by, in the ratio-of-sums form: scrambled or
    machine-garbled text scores low even when its WORDS are common (the case
    :func:`word_commonness_score` structurally misses), natural prose scores
    near the corpus mean. Every intermediate is exact integer arithmetic with
    ONE IEEE division at the end, so Spark and DuckDB agree bit-for-bit —
    a log-space perplexity would accumulate doubles and flake the oracle.

    Plan: bigrams are generated ROW-LOCALLY (transform over the split array —
    no window shuffle, no self-join); corpus bigram counts and history counts
    are each one hash shuffle with map-side partial aggregation; the two
    joins back are vocab-sized build sides (bigram vocab grows sub-linearly
    with corpus size) that AQE broadcasts when small; the final per-doc hash
    agg is the only doc-keyed shuffle. No UDFs, no quadratic stage — the
    same shape at 100 TB, with the bigram-count frame shuffled at worst.

    size(w) >= 2 guard: Spark's sequence(1, size-1) would DESCEND for a
    1-token doc ([1, 0]) instead of being empty; DuckDB's range(1, 0) is
    empty, so the filter also keeps the two engines' row sets identical."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    words = d.select("doc_id", F.split("text", " ").alias("w")).filter(
        F.size("w") >= 2
    )
    bg = words.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 1), i -> "
                "struct(element_at(w, i) AS w1, element_at(w, i + 1) AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    return (
        bg.join(c12, ["w1", "w2"])
        .join(c1, ["w1"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("c12").cast("bigint").alias("sum_follow"),
            F.sum("c1").cast("bigint").alias("sum_hist"),
            (F.sum("c12").cast("double") / F.sum("c1").cast("double")).alias(
                "predictability"
            ),
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
    shingle-hash candidate join as the Jaccard baseline below the guard,
    different denominator; governed by ``engine.pair-source``
    (exact|lsh|auto): above the guard (or with mode=lsh) candidates come
    from the banded-LSH join and only the verification denominator changes —
    recall narrows to pairs whose JACCARD also bands (the short-doc-in-long
    subset case can miss candidacy), the standard trade at scale. mode=exact
    keeps the loud refusal as an explicit opt-in."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    limit = get_config().get_int("engine.jaccard-exact-max-docs")
    n_docs = table_row_count(spark, sf_dir, "documents")
    mode = get_config().get_str("engine.pair-source")
    if mode == "lsh" or (mode == "auto" and n_docs > limit):
        from pyspark_cdc_engine.operators.dedup_scale import lsh_verified_pairs

        return lsh_verified_pairs(
            d, n_docs, metric="containment", tau=_CONTAIN_TAU
        )
    if n_docs > limit:
        raise ValueError(
            f"containment_near_dup is the exact small-N baseline "
            f"({n_docs} docs > guard {limit}); set engine.pair-source=auto "
            f"(or lsh) to degrade to the LSH band join at this scale"
        )
    w = _SHINGLE_W
    sets = (
        d.select(
            "doc_id",
            F.explode(F.expr(_shingle_expr_spark(w))).alias("sh"),
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
    anti-joins against. Pipeline: near-dup edges via ``engine.pair-source``
    (exact-Jaccard below the guard — oracle-matching — banded LSH above it,
    degrading instead of raising) → pointer-doubling connected components →
    one window over cluster_id."""
    from pyspark.sql import Window

    pairs = near_dup_edges(spark, sf_dir)
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


_ESD_L = 8  # exact-substring window length (tokens); Lee et al. use 50 BPE
# tokens on web corpora — 8 words fits this corpus's ~50-word documents
# while exercising the identical plan shape.

# Shared CTE block: maximal duplicated spans per doc — one definition for
# the marker query (exact_substring_dedup) and the cleaner
# (exact_substring_clean), so the two certify against the same span set.
_ESD_SPANS_CTES = f"""
    w AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id, i - 1 AS pos,
             md5(array_to_string(list_slice(t, i, i + {_ESD_L} - 1), ' ')) AS h
      FROM w, UNNEST(range(1, len(t) - {_ESD_L} + 2)) AS x(i)
    ),
    freq AS (SELECT h FROM sh GROUP BY h
             HAVING MIN(doc_id) <> MAX(doc_id) OR COUNT(*) > 1),
    dup AS (SELECT s.doc_id, s.pos FROM sh s JOIN freq f USING (h)),
    isl AS (
      SELECT doc_id, pos,
             SUM(CASE WHEN prev IS NULL OR pos - prev > {_ESD_L}
                 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM (SELECT doc_id, pos,
                   LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
            FROM dup)
    ),
    spans AS (
      SELECT doc_id, MIN(pos) AS s, MAX(pos) + {_ESD_L} - 1 AS e
      FROM isl GROUP BY doc_id, island
    )
"""


def _esd_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, s, e): maximal duplicated token spans per document — the
    Spark side of ``_ESD_SPANS_CTES`` (hash every overlapping L-token
    window, keep corpus-wide >=2-occurrence hashes, merge surviving
    positions into islands). Spans within a doc are DISJOINT and
    non-adjacent by construction (a gap > L starts a new island), so a
    token position falls in at most one span."""
    from pyspark.sql import Window

    from pyspark_cdc_engine.operators.dedup_scale import _maybe_materialize

    d = fan_out(load_table(spark, sf_dir, "documents"))
    shingled = d.select(
        "doc_id",
        F.posexplode(F.expr(_shingle_expr_spark(_ESD_L))).alias("pos", "sh"),
    ).select(
        "doc_id", "pos", F.md5(F.col("sh").cast("binary")).alias("h")
    )
    # shingled feeds BOTH the corpus-wide frequency agg and the position
    # join back — above the materialize-docs gate, cut it once or every
    # consumer re-runs the window split + md5 over the full text (r12,
    # guide §2.4; same gate every shared LSH frame uses — below it the
    # overlapping recompute on idle cores beats serializing two jobs).
    shingled = _maybe_materialize(
        shingled, table_row_count(spark, sf_dir, "documents")
    )
    # "hash occurs >= 2 times in the corpus" as one single-pass agg:
    # min/max doc_id differing catches cross-document copies, count > 1
    # catches within-document repeats — exact for both halves of the Lee
    # et al. removal set, and avoids countDistinct's expand stage
    freq = (
        shingled.groupBy("h")
        .agg(
            F.min("doc_id").alias("lo"),
            F.max("doc_id").alias("hi"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .filter((F.col("lo") != F.col("hi")) | (F.col("cnt") > 1))
        .select("h")
    )
    dup = shingled.join(freq, "h").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = dup.select(
        "doc_id",
        "pos",
        F.sum(
            F.when(
                F.lag("pos").over(w).isNull()
                | (F.col("pos") - F.lag("pos").over(w) > _ESD_L),
                1,
            ).otherwise(0)
        )
        .over(w)
        .alias("island"),
    )
    return isl.groupBy("doc_id", "island").agg(
        F.min("pos").alias("s"), (F.max("pos") + _ESD_L - 1).alias("e")
    ).select("doc_id", "s", "e")


@register(
    "exact_substring_dedup",
    survey="M5-dedup,W1,A2,J5,beyond-ref",
    oracle=f"""
    WITH {_ESD_SPANS_CTES}
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
           CAST(SUM(e - s + 1) AS BIGINT) AS dup_tokens,
           md5(string_agg(
                 lpad(CAST(s AS VARCHAR), 6, '0') || ':'
                   || lpad(CAST(e AS VARCHAR), 6, '0'),
                 ',' ORDER BY lpad(CAST(s AS VARCHAR), 6, '0') || ':'
                   || lpad(CAST(e AS VARCHAR), 6, '0'))) AS spans_md5
    FROM spans GROUP BY doc_id
    """,
)
def exact_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-SUBSTRING dedup (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better"): mark every maximal token span that
    appears verbatim MORE THAN ONCE in the corpus — across documents OR
    repeated inside a single document (Lee et al.'s removal set covers
    both) — arbitrary-position long common substrings that fixed-window
    chunking (``chunk_dedup_c4``) and whole-doc near-dup both miss.
    Published pipelines delete the marked spans and keep the rest of the
    document.

    Distributed shape (never the paper's single-node suffix array): every
    overlapping L-token (_ESD_L=8) window hashes (the Rabin-Karp rolling-hash
    role — equal windows collide by construction), window hashes BUCKET by
    value into a corpus-wide distinct-doc count, and only windows whose
    hash occurs in >= 2 documents survive back to their (doc, position)
    slots, where one per-doc window pass merges overlapping windows into
    maximal spans (gaps > L start a new span — classic island
    detection). Output per affected doc: span count, tokens covered by the
    span union, and a canonical md5 of the span list (zero-padded pure
    string sort, identical in both engines).

    100 TB: only (16-byte hash, doc_id, pos) triples shuffle — text never
    leaves the scan stage; the frequency agg partial-aggregates map-side;
    the hash join back is bucketed by hash value (no all-pairs anywhere);
    span merging partitions by doc_id — embarrassingly parallel."""
    spans = _esd_spans(spark, sf_dir)
    key = F.expr(
        "concat(lpad(CAST(s AS STRING), 6, '0'), ':', "
        "lpad(CAST(e AS STRING), 6, '0'))"
    )
    return spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum(F.col("e") - F.col("s") + 1).cast("bigint").alias("dup_tokens"),
        F.md5(
            F.array_join(F.sort_array(F.collect_list(key)), ",").cast("binary")
        ).alias("spans_md5"),
    )


def _esd_flagged_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos, tok, keep): every token of every document flagged by
    whether it survives span removal. Spans within a doc are disjoint, so
    the range LEFT JOIN matches each token at most once (no duplication).
    The join is doc_id-equi with a range residual — tokens never leave
    their doc's hash partition at 100 TB."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    spans = _esd_spans(spark, sf_dir).select(
        F.col("doc_id").alias("s_doc"), "s", "e"
    )
    return toks.join(
        spans,
        (F.col("doc_id") == F.col("s_doc"))
        & (F.col("pos") >= F.col("s"))
        & (F.col("pos") <= F.col("e")),
        "left",
    ).select("doc_id", "pos", "tok", F.col("s").isNull().alias("keep"))


@register(
    "exact_substring_clean",
    survey="M5-dedup,W1,A2,J3,beyond-ref",
    oracle=f"""
    WITH {_ESD_SPANS_CTES},
    toks AS (
      SELECT doc_id, i - 1 AS pos, t[CAST(i AS INT)] AS tok
      FROM w, UNNEST(range(1, len(t) + 1)) AS x(i)
    ),
    flagged AS (
      SELECT tk.doc_id, tk.pos, tk.tok, sp.s IS NULL AS keep
      FROM toks tk LEFT JOIN spans sp
        ON sp.doc_id = tk.doc_id AND tk.pos BETWEEN sp.s AND sp.e
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT) AS dup_tokens,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS clean_tokens,
           md5(COALESCE(string_agg(CASE WHEN keep THEN tok END,
                                   ' ' ORDER BY pos), '')) AS clean_md5
    FROM flagged GROUP BY doc_id
    """,
)
def exact_substring_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REMOVAL half of Lee et al. 2022's ExactSubstr pipeline:
    ``exact_substring_dedup`` MARKS the maximal duplicated spans; this
    operator deletes them and keeps the rest of each document — per-doc
    surviving-token accounting (n_tokens / dup_tokens / clean_tokens,
    EVERY doc reported, clean docs survive whole) plus a canonical md5 of
    the cleaned text (space-joined surviving tokens in position order;
    empty-survivor docs hash the empty string in both engines), so the
    oracle certifies the exact bytes a downstream tokenizer would see,
    not just the counts. Composes the shared span derivation verbatim —
    marker and cleaner certify against the same span set by construction.

    100 TB: spans join back to tokens doc_id-equi (range residual inside
    the doc's partition) — the TEXT stays executor-side end to end; the
    cleaned-corpus emitter (:func:`exact_substring_clean_text`) is the
    same plan with the hash stage swapped for the string rebuild."""
    flagged = _esd_flagged_tokens(spark, sf_dir)
    kept = F.when(F.col("keep"), F.struct("pos", "tok"))
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("keep"), 0).otherwise(1))
        .cast("bigint")
        .alias("dup_tokens"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0))
        .cast("bigint")
        .alias("clean_tokens"),
        F.md5(
            F.array_join(
                F.expr(
                    "transform(array_sort(collect_list(CASE WHEN keep THEN "
                    "struct(pos, tok) END)), x -> x.tok)"
                ),
                " ",
            ).cast("binary")
        ).alias("clean_md5"),
    )


def exact_substring_clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, clean_text): the actual cleaned corpus — every document
    with its duplicated spans deleted (possibly empty). The pipeline API
    the registry entry certifies; write this to the curated table and the
    downstream tokenizer sees exactly the bytes ``clean_md5`` hashed."""
    flagged = _esd_flagged_tokens(spark, sf_dir)
    return flagged.groupBy("doc_id").agg(
        F.array_join(
            F.expr(
                "transform(array_sort(collect_list(CASE WHEN keep THEN "
                "struct(pos, tok) END)), x -> x.tok)"
            ),
            " ",
        ).alias("clean_text")
    )


_C4_CHUNK = 64  # chars per non-overlapping dedup chunk


@register(
    "chunk_dedup_c4",
    survey="M5-dedup,J5,A2,beyond-ref",
    oracle=f"""
    WITH chunks AS (
      SELECT doc_id,
             substr(text, 1 + i * {_C4_CHUNK}, {_C4_CHUNK}) AS chunk
      FROM documents,
           UNNEST(range(0, CAST(CEIL(LENGTH(text) / {_C4_CHUNK}.0) AS BIGINT))) AS t(i)
    ),
    freq AS (
      SELECT md5(chunk) AS h, COUNT(*) AS cnt FROM chunks GROUP BY md5(chunk)
    )
    SELECT c.doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN f.cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
           CAST(SUM(CASE WHEN f.cnt = 1 THEN LENGTH(c.chunk) ELSE 0 END) AS BIGINT)
             AS clean_chars
    FROM chunks c JOIN freq f ON f.h = md5(c.chunk)
    GROUP BY c.doc_id
    """,
)
def chunk_dedup_c4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style sub-document dedup accounting: split every document into
    non-overlapping 64-char chunks, count each chunk's corpus-wide
    occurrences by content hash, and report per document how many chunks are
    shared with any other occurrence (boilerplate / duplicated passages) and
    how many characters survive a keep-only-unique-chunks clean. Exact-copy
    documents mark ALL their chunks shared; partially copied boilerplate
    marks just the copied span — the sub-document granularity whole-doc
    dedup can't see. Plan: map-side chunk explode (no shuffle of text — only
    16-byte hashes shuffle into the frequency agg), hash join back on the
    chunk hash, one final agg on doc_id. All counts integer-exact."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    # empty-text guard: Spark's sequence(0, -1) yields [0, -1] (descending),
    # which would emit two phantom '' chunks; DuckDB's range(0, 0) is empty —
    # make the Spark side explicitly empty too
    chunks = d.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN LENGTH(text) > 0 THEN "
                f"transform(sequence(0, CAST(CEIL(LENGTH(text) / {_C4_CHUNK}.0) AS INT) - 1),"
                f" i -> substring(text, 1 + i * {_C4_CHUNK}, {_C4_CHUNK})) "
                f"ELSE CAST(array() AS array<string>) END"
            )
        ).alias("chunk"),
    ).select(
        "doc_id",
        F.length("chunk").alias("clen"),
        F.md5(F.col("chunk").cast("binary")).alias("h"),
    )
    freq = chunks.groupBy("h").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        chunks.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_shared"),
            F.sum(F.when(F.col("cnt") == 1, F.col("clen")).otherwise(0))
            .cast("bigint")
            .alias("clean_chars"),
        )
    )


_PACK_BUDGET = 2048  # tokens per packed training sequence
_PACK_BUCKETS = 32   # parallel packing streams

# shared packing tail (SQL): consumes a `toks(doc_id, bucket, n_tokens)` CTE —
# one window cumsum per bucket, sequence id = starting offset div budget,
# hash agg per (bucket, seq). Both packing queries append this verbatim so
# the budget/seq_id semantics can never diverge between them.
_PACK_TAIL_SQL = f"""
    packed AS (
      SELECT bucket, doc_id, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS running
      FROM toks
    )
    SELECT bucket,
           CAST((running - n_tokens) // {_PACK_BUDGET} AS BIGINT) AS seq_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_tokens) AS DOUBLE) / {_PACK_BUDGET} AS fill_ratio
    FROM packed
    GROUP BY bucket, (running - n_tokens) // {_PACK_BUDGET}
"""


def _pack_tail(per_doc_tokens: DataFrame) -> DataFrame:
    """Shared packing tail (Spark): ``(doc_id, n_tokens)`` → packed-sequence
    report — the exact DataFrame counterpart of ``_PACK_TAIL_SQL``."""
    from pyspark.sql import Window

    toks = per_doc_tokens.select(
        "doc_id",
        (F.col("doc_id") % _PACK_BUCKETS).cast("int").alias("bucket"),
        "n_tokens",
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.withColumn("running", F.sum("n_tokens").over(w))
    return (
        packed.select(
            "bucket",
            F.expr(f"(running - n_tokens) div {_PACK_BUDGET}").alias("seq_id"),
            "n_tokens",
        )
        .groupBy("bucket", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            (F.sum("n_tokens").cast("double") / _PACK_BUDGET).alias("fill_ratio"),
        )
    )


@register(
    "sequence_pack_greedy",
    survey="W1,A2,F18,beyond-ref",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             CAST(doc_id % {_PACK_BUCKETS} AS INT) AS bucket,
             CAST((LENGTH(text) - LENGTH(REPLACE(text, ' ', ''))) + 1 AS BIGINT)
               AS n_tokens
      FROM documents
    ),
    {_PACK_TAIL_SQL}
    """,
)
def sequence_pack_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence PACKING: assign documents to fixed-token-budget
    (2048-token) training sequences by greedy in-order concatenation —
    the pretraining dataloader step that turns a shuffled corpus into dense
    fixed-length samples. A single global packing order would serialize on
    one partition, so documents are first split into 32
    deterministic hash streams and packed within each (the standard
    distributed-packing compromise: bounded parallelism loss, no global
    sort). One window cumsum per bucket (running token offset), sequence id
    = starting offset div budget, then a hash agg per (bucket, seq). All
    token arithmetic integer-exact."""
    d = load_table(spark, sf_dir, "documents")
    return _pack_tail(
        d.select(
            "doc_id",
            (
                F.length("text")
                - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
                + 1
            ).cast("bigint").alias("n_tokens"),
        )
    )


@register(
    "sequence_pack_bpe",
    survey="W1,A2,beyond-ref",
    oracle=f"""
    WITH RECURSIVE {_BPE_APPLY_CTES}
    , per_doc AS (
      SELECT dw.doc_id, CAST(SUM(t.bpe) AS BIGINT) AS n_tokens
      FROM dw JOIN tok t USING (word) GROUP BY dw.doc_id
    ),
    toks AS (
      SELECT doc_id, CAST(doc_id % {_PACK_BUCKETS} AS INT) AS bucket, n_tokens
      FROM per_doc
    ),
    {_PACK_TAIL_SQL}
    """,
)
def sequence_pack_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`sequence_pack_greedy` driven by TRUE tokenizer counts: packing
    by whitespace words misjudges every budget by each source's fertility
    (a 1.3-fertility source overfills 2048-token sequences by 30%), so the
    real dataloader packs on the APPLIED-BPE counts
    (``bpe_apply_token_count``). Same distributed shape — the BPE apply
    runs once over the vocabulary, per-doc counts join back, then the
    32-stream bucket cumsum assigns sequence ids; the only corpus-sized
    stages are the word explode and two hash aggs."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    dw = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    per_doc = (
        dw.join(_bpe_word_tokens(d, dw), "word")
        .groupBy("doc_id")
        .agg(F.sum("bpe").cast("bigint").alias("n_tokens"))
    )
    return _pack_tail(per_doc)


@register(
    "source_mix_report",
    survey="A2,F18,beyond-ref",
    oracle="""
    WITH per_doc AS (
      SELECT source, doc_id, md5(text) AS h,
             CAST((LENGTH(text) - LENGTH(REPLACE(text, ' ', ''))) + 1 AS BIGINT)
               AS n_tokens
      FROM documents
    ),
    keepers AS (
      SELECT h, MIN(doc_id) AS keeper FROM per_doc GROUP BY h
    )
    SELECT p.source,
           COUNT(*) AS n_docs,
           CAST(SUM(p.n_tokens) AS BIGINT) AS raw_tokens,
           CAST(SUM(CASE WHEN p.doc_id = k.keeper THEN p.n_tokens ELSE 0 END)
                AS BIGINT) AS dedup_tokens,
           CAST(SUM(CASE WHEN p.doc_id = k.keeper THEN 0 ELSE 1 END)
                AS BIGINT) AS dup_docs
    FROM per_doc p JOIN keepers k ON k.h = p.h
    GROUP BY p.source
    """,
)
def source_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture accounting per source — the table a pretraining run's
    sampling weights are derived from: raw vs exact-deduplicated token counts
    and the duplicate-document count per source (keeper = min doc_id per
    content hash, the same convention as ``exact_dedup``). A source whose
    raw/dedup ratio is far from 1 is overweighted by naive size-proportional
    sampling — this report is what corrects it. Plan: map-side md5 + token
    arithmetic; one agg on the 16-byte hash (keepers), hash join back, one
    agg on source. Integer-exact throughout."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    per_doc = d.select(
        "source",
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("h"),
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            + 1
        ).cast("bigint").alias("n_tokens"),
    )
    keepers = per_doc.groupBy("h").agg(F.min("doc_id").alias("keeper"))
    return (
        per_doc.join(keepers, "h")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("raw_tokens"),
            F.sum(F.when(F.col("doc_id") == F.col("keeper"), F.col("n_tokens")).otherwise(0))
            .cast("bigint")
            .alias("dedup_tokens"),
            F.sum(F.when(F.col("doc_id") == F.col("keeper"), 0).otherwise(1))
            .cast("bigint")
            .alias("dup_docs"),
        )
    )


_DSIR_BUCKETS = 16
# engine-portable word bucket: first 4 md5 hex digits -> int -> mod buckets
_DSIR_B_SPARK = (
    f"CAST(conv(substr(md5(CAST(word AS BINARY)), 1, 4), 16, 10) AS INT) % {_DSIR_BUCKETS}"
)
_DSIR_B_DUCK = (
    "(instr('0123456789abcdef', substr(md5(word), 1, 1)) - 1) * 4096"
    " + (instr('0123456789abcdef', substr(md5(word), 2, 1)) - 1) * 256"
    " + (instr('0123456789abcdef', substr(md5(word), 3, 1)) - 1) * 16"
    " + (instr('0123456789abcdef', substr(md5(word), 4, 1)) - 1)"
)


@register(
    "domain_similarity_score",
    survey="M5-text,A2,J3,beyond-ref",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, ({_DSIR_B_DUCK}) % {_DSIR_BUCKETS} AS b
      FROM (
        SELECT doc_id, lang, UNNEST(string_split(text, ' ')) AS word
        FROM documents
      ) WHERE word <> ''
    ),
    target AS (
      SELECT b, COUNT(*) AS tc FROM tok WHERE lang = 'en' GROUP BY b
    ),
    tn AS (SELECT CAST(SUM(tc) AS BIGINT) AS n FROM target),
    doc_b AS (
      SELECT doc_id, b, COUNT(*) AS c FROM tok GROUP BY doc_id, b
    ),
    doc_n AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM doc_b GROUP BY doc_id),
    terms AS (
      SELECT d.doc_id,
             ABS(CAST(d.c AS DOUBLE) / dn.n - CAST(COALESCE(t.tc, 0) AS DOUBLE) / tn.n)
               AS term
      FROM doc_b d
      JOIN doc_n dn ON dn.doc_id = d.doc_id
      LEFT JOIN target t ON t.b = d.b
      CROSS JOIN tn
    )
    SELECT doc_id,
           CAST(SUM(CAST(term AS DECIMAL(18,12))) AS DOUBLE) AS l1_distance
    FROM terms GROUP BY doc_id
    """,
)
def domain_similarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style domain scoring: each document's hashed-word-bucket
    distribution is compared (L1) against a target-domain profile — here the
    ``lang='en'`` sub-corpus — the importance-sampling signal used to select
    pretraining data resembling a target domain. Buckets come from md5 hex
    digits (identical in both engines); each |p_doc - p_target| term is one
    deterministic IEEE expression and the per-doc sum accumulates in DECIMAL,
    so cross-engine parity is exact. Docs wholly inside the target still get
    nonzero distance unless their profile matches the pooled target — the
    correct semantics.

    Plan: token explode -> 16-bucket hash counts per doc (one shuffle on
    doc_id with map-side combine), the 16-row target profile broadcast back,
    final 16-rows-per-doc aggregate. Under-represented buckets (count 0 in a
    doc) contribute p_target each; adding them would need a dense 16-way
    expansion — omitted on BOTH sides identically, keeping the score a
    same-support L1 (rank-equivalent for filtering)."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    tok = d.select(
        "doc_id",
        "lang",
        F.explode(F.split("text", " ")).alias("word"),
    ).filter(F.col("word") != "").select(
        "doc_id", "lang", F.expr(_DSIR_B_SPARK).alias("b")
    )
    target = tok.filter(F.col("lang") == "en").groupBy("b").agg(
        F.count(F.lit(1)).alias("tc")
    )
    tn = target.agg(F.sum("tc").cast("bigint").alias("n_t"))
    doc_b = tok.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("c"))
    doc_n = doc_b.groupBy("doc_id").agg(F.sum("c").cast("bigint").alias("n_d"))
    terms = (
        doc_b.join(doc_n, "doc_id")
        .join(F.broadcast(target), "b", "left")
        .crossJoin(F.broadcast(tn))
        .select(
            "doc_id",
            F.abs(
                F.col("c").cast("double") / F.col("n_d")
                - F.coalesce("tc", F.lit(0)).cast("double") / F.col("n_t")
            ).alias("term"),
        )
    )
    return terms.groupBy("doc_id").agg(
        F.sum(F.col("term").cast("decimal(18,12)")).cast("double").alias("l1_distance")
    )


@register(
    "daily_anomaly_scores",
    survey="A2,W1,F18,beyond-ref",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS cnt
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    stats AS (
      SELECT event_type,
             COUNT(*) AS n_days,
             CAST(SUM(CAST(cnt AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS mean_cnt,
             CAST(SUM(CAST(CAST(cnt AS DOUBLE) * CAST(cnt AS DOUBLE)
                           AS DECIMAL(28,6))) AS DOUBLE) AS sum_sq
      FROM daily GROUP BY event_type
    ),
    scored AS (
      SELECT d.event_type, d.d, d.cnt, s.n_days, s.mean_cnt,
             (s.sum_sq / s.n_days) - (s.mean_cnt * s.mean_cnt) AS var_pop
      FROM daily d JOIN stats s ON s.event_type = d.event_type
    )
    SELECT event_type, CAST(d AS VARCHAR) AS day, cnt,
           CASE WHEN var_pop > 0
                THEN (cnt - mean_cnt) / SQRT(var_pop) ELSE 0.0 END AS z_score,
           ABS(cnt - mean_cnt) > 3 * SQRT(CASE WHEN var_pop > 0 THEN var_pop ELSE 0 END)
             AS is_anomaly
    FROM scored
    """,
)
def daily_anomaly_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality anomaly detection over the event stream: per event type,
    each day's volume is z-scored against that type's own daily distribution
    (population variance via the sum-of-squares identity, both moments
    accumulated in DECIMAL so the variance is bit-identical across engines —
    the naive two-pass stddev would hit reduction-order drift). The 3-sigma
    flag is the standard ingest-monitoring gate: a crawler outage or a
    duplicate storm shows up as an anomalous day per affected type. One
    hash agg to days, one tiny per-type agg broadcast back — no window, no
    self-join; at 100 TB the daily rollup is the only corpus-sized pass."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        (
            F.sum(F.col("cnt").cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_cnt"),
        F.sum(
            (F.col("cnt").cast("double") * F.col("cnt").cast("double")).cast(
                "decimal(28,6)"
            )
        ).cast("double").alias("sum_sq"),
    )
    daily = daily.withColumn("day", F.col("day").cast("string"))
    scored = daily.join(F.broadcast(stats), "event_type").withColumn(
        "var_pop",
        (F.col("sum_sq") / F.col("n_days")) - (F.col("mean_cnt") * F.col("mean_cnt")),
    )
    sd = F.sqrt(F.when(F.col("var_pop") > 0, F.col("var_pop")).otherwise(0.0))
    return scored.select(
        "event_type",
        "day",
        "cnt",
        F.when(
            F.col("var_pop") > 0,
            (F.col("cnt") - F.col("mean_cnt")) / F.sqrt("var_pop"),
        ).otherwise(F.lit(0.0)).alias("z_score"),
        (F.abs(F.col("cnt") - F.col("mean_cnt")) > 3 * sd).alias("is_anomaly"),
    )


_BM25_TERMS = ("join", "hash", "window", "stream")
_BM25_K1, _BM25_B = 1.2, 0.75
_BM25_TOP = 20


@register(
    "bm25_odds_search",
    survey="A2,W1,O1,beyond-ref",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, word FROM (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents
      ) WHERE word <> ''
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dlen FROM tok GROUP BY doc_id),
    corpus AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CAST(dlen AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ),
    tf AS (
      SELECT doc_id, word, COUNT(*) AS tf FROM tok
      WHERE word IN {str(tuple(_BM25_TERMS))}
      GROUP BY doc_id, word
    ),
    df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
    terms AS (
      SELECT tf.doc_id,
             ((c.n_docs - df.df + 0.5) / (df.df + 0.5))
             * (CAST(tf.tf AS DOUBLE) * ({_BM25_K1} + 1))
             / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl.dlen / c.avgdl))
               AS term_score
      FROM tf
      JOIN df ON df.word = tf.word
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN corpus c
    ),
    scored AS (
      SELECT doc_id,
             CAST(SUM(CAST(term_score AS DECIMAL(18,12))) AS DOUBLE) AS score
      FROM terms GROUP BY doc_id
    )
    SELECT rank, doc_id, score FROM (
      SELECT doc_id, score,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank
      FROM scored
    ) WHERE rank <= {_BM25_TOP}
    """,
)
def bm25_odds_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranked retrieval over the corpus for a fixed term set — BM25 term
    saturation and length normalization with the ODDS form of IDF
    ((N-df+0.5)/(df+0.5), i.e. BM25's idf without the log): rank-equivalent
    per term, and — unlike log() — bit-identical across engines (Java's
    Math.log and C libm are each only ~1ulp-accurate and may disagree, which
    would flake the hash certification; every operation here is IEEE exact
    division/multiply from identical inputs, with the per-doc term sum
    DECIMAL-accumulated and the top-k ordered by a total order).

    Plan: token explode -> doc lengths (one doc-keyed agg); tf only for the
    query terms (the WHERE prunes before the shuffle — at 100 TB this is the
    inverted-index probe, a tiny fraction of the corpus); 4-row df and 1-row
    corpus stats broadcast; TakeOrdered top-{_BM25_TOP}."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    from pyspark.sql import Window

    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dlen"))
    corpus = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (
            F.sum(F.col("dlen").cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avgdl"),
    )
    tf = (
        tok.filter(F.col("word").isin(*_BM25_TERMS))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    terms = (
        tf.join(F.broadcast(df_t), "word")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            (
                ((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
                * (F.col("tf").cast("double") * (_BM25_K1 + 1))
                / (
                    F.col("tf")
                    + _BM25_K1
                    * (1 - _BM25_B + _BM25_B * F.col("dlen") / F.col("avgdl"))
                )
            ).alias("term_score"),
        )
    )
    scored = terms.groupBy("doc_id").agg(
        F.sum(F.col("term_score").cast("decimal(18,12)")).cast("double").alias("score")
    )
    # top-k FIRST via orderBy+limit (plans TakeOrderedAndProject — no global
    # single-partition sort of every scored doc); the rank window then runs
    # over just the k survivors
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id")).limit(_BM25_TOP)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "score"
    )


_PROFILE_COLS = ("o_orderstatus", "o_orderpriority", "o_custkey", "o_orderdate")


@register(
    "column_profile_report",
    survey="A2,U2,beyond-ref",
    oracle=" UNION ALL ".join(
        f"""SELECT '{c}' AS column_name,
               COUNT(*) AS n_rows,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
               COUNT(DISTINCT {c}) AS n_distinct
        FROM orders"""
        for c in _PROFILE_COLS
    ),
)
def column_profile_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level data profiling (the warehouse PROFILE/describe-extended
    staple): row, null, and exact distinct counts per audited column, one
    output row per column. All counts integer-exact. Plan: ONE pass over the
    table computing every column's aggregates together (count_distinct per
    column in a single hash-aggregate stage — not one scan per column; the
    oracle's UNION ALL formulation is the semantic spec, not the plan),
    then a literal-keyed unpivot of the single aggregate row."""
    o = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            (F.count(F.lit(1)) - F.count(c)).cast("bigint").alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
        ]
    row = o.agg(*aggs)
    stack = ", ".join(
        f"'{c}', `{c}__rows`, `{c}__nulls`, `{c}__distinct`" for c in _PROFILE_COLS
    )
    return row.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack}) AS "
            f"(column_name, n_rows, n_nulls, n_distinct)"
        )
    )


@register(
    "temperature_sampling_weights",
    survey="A2,F18,beyond-ref",
    oracle="""
    WITH per_doc AS (
      SELECT source, doc_id, md5(text) AS h,
             CAST((LENGTH(text) - LENGTH(REPLACE(text, ' ', ''))) + 1 AS BIGINT)
               AS n_tokens
      FROM documents
    ),
    keepers AS (SELECT h, MIN(doc_id) AS keeper FROM per_doc GROUP BY h),
    per_src AS (
      SELECT p.source,
             CAST(SUM(CASE WHEN p.doc_id = k.keeper THEN p.n_tokens ELSE 0 END)
                  AS BIGINT) AS dedup_tokens
      FROM per_doc p JOIN keepers k ON k.h = p.h
      GROUP BY p.source
    ),
    tot AS (
      SELECT CAST(SUM(dedup_tokens) AS BIGINT) AS t_all,
             CAST(SUM(CAST(SQRT(CAST(dedup_tokens AS DOUBLE))
                           AS DECIMAL(28,12))) AS DOUBLE) AS sq_all
      FROM per_src
    )
    SELECT s.source, s.dedup_tokens,
           CAST(s.dedup_tokens AS DOUBLE) / t_all AS nat_share,
           SQRT(CAST(s.dedup_tokens AS DOUBLE)) / sq_all AS weight,
           (SQRT(CAST(s.dedup_tokens AS DOUBLE)) / sq_all)
             / (CAST(s.dedup_tokens AS DOUBLE) / t_all) AS boost
    FROM per_src s CROSS JOIN tot
    """,
)
def temperature_sampling_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source sampling weights (the multilingual-corpus
    standard, alpha = 1/2): w_i = sqrt(t_i) / sum_j sqrt(t_j) over exact
    per-source DEDUPLICATED token counts, next to each source's natural
    share and the resulting up/down-sampling boost — the exact table a
    pretraining data loader consumes. alpha = 1/2 keeps cross-engine parity
    trivial (SQRT is one IEEE op; any alpha via POW(t, a) works the same).

    Plan: the source_mix dedup accounting (hash agg + join-back), then a
    1-row global aggregate broadcast back via the whitelisted scalar
    crossJoin; sqrt-sum accumulates in DECIMAL so the reduction order can't
    move the denominator."""
    from pyspark_cdc_engine.operators.registry import dsum

    d = load_table(spark, sf_dir, "documents")
    per_doc = d.select(
        "source",
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("h"),
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            + 1
        ).cast("bigint").alias("n_tokens"),
    )
    keepers = per_doc.groupBy("h").agg(F.min("doc_id").alias("keeper"))
    per_src = (
        per_doc.join(keepers, "h")
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("doc_id") == F.col("keeper"), F.col("n_tokens")).otherwise(0))
            .cast("bigint")
            .alias("dedup_tokens")
        )
    )
    tot = per_src.agg(
        F.sum("dedup_tokens").cast("bigint").alias("t_all"),
        dsum(F.sqrt(F.col("dedup_tokens").cast("double")), scale=12).alias("sq_all"),
    )
    sq = F.sqrt(F.col("dedup_tokens").cast("double"))
    nat = F.col("dedup_tokens").cast("double") / F.col("t_all")
    w = sq / F.col("sq_all")
    return per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "dedup_tokens",
        nat.alias("nat_share"),
        w.alias("weight"),
        (w / nat).alias("boost"),
    )


@register(
    "leakage_free_split",
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
    bucketed AS (
      SELECT doc_id, cluster_id,
             instr('0123456789abcdef',
                   substr(md5(CAST(cluster_id AS VARCHAR)), 1, 1)) - 1 AS b
      FROM clusters
    )
    SELECT doc_id, cluster_id,
           CASE WHEN b < 12 THEN 'train'
                WHEN b < 14 THEN 'val'
                ELSE 'test' END AS split
    FROM bucketed
    """,
)
def leakage_free_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test split WITHOUT eval contamination: the unit of
    assignment is the near-duplicate CLUSTER, not the document — a plain
    per-doc hash split (``train_val_test_split``) happily puts one near-dup
    in train and its twin in val, inflating eval scores with memorized
    content. Pipeline: near-dup edges (``engine.pair-source``: exact
    Jaccard below the guard, banded LSH above) → pointer-doubling connected
    components → md5-of-cluster-id bucketing (75/12.5/12.5, deterministic
    across engines/runs — the same cross-engine md5 contract as
    ``document_chunking``). Singleton docs are their own cluster, so the
    split stays ~per-doc uniform while every dup group lands wholly inside
    one split."""
    pairs = near_dup_edges(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    clusters = connected_components(docs, pairs).select("doc_id", "cluster_id")
    bucket = (
        F.instr(
            F.lit("0123456789abcdef"),
            F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 1),
        )
        - 1
    )
    return clusters.select(
        "doc_id",
        "cluster_id",
        F.when(bucket < 12, "train")
        .when(bucket < 14, "val")
        .otherwise("test")
        .alias("split"),
    )


_SHARDS = 16  # test-scale shard count; production uses thousands (see docstring)
_FP_P = 2_147_483_647  # Mersenne prime 2^31 - 1: checksum modulus


def _shard_keys(id_col: str, epoch: str = "") -> tuple[str, str]:
    """Spark SQL exprs for the (shard-hash, order-key) 48-bit md5 slices of
    any id column. 48 bits (12 hex digits) rather than a short slice so that
    (a) shard counts in the thousands stay hash-balanced — ``2^48 mod N`` is
    a negligible skew for any realistic N, where a 16-bit slice would load
    shards 0..(65536 mod N) ~17% heavier at N=10000 — and (b) the order key
    is collision-free enough that the within-shard pseudo-shuffle never
    degrades into long id-order runs on corpus-scale shards.

    ``epoch`` (a seed string) salts the ORDER key only: each training epoch
    gets a fresh within-shard shuffle while shard MEMBERSHIP stays
    content-independent and epoch-invariant — re-exports touch the same
    shard a doc has always lived in."""
    base = f"md5(CAST(CAST({id_col} AS STRING) AS BINARY))"
    if epoch:
        import re as _re

        # the seed lands inside a Spark SQL string literal where backslash
        # escapes are live — whitelist label-shaped seeds instead of playing
        # escaping games (a consumer re-deriving order keys must be able to
        # splice the same literal)
        if not _re.fullmatch(r"[A-Za-z0-9._:-]+", epoch):
            raise ValueError(
                f"epoch seed must match [A-Za-z0-9._:-]+, got {epoch!r}"
            )
        obase = (
            f"md5(CAST(CONCAT('{epoch}', ':', CAST({id_col} AS STRING)) AS BINARY))"
        )
    else:
        obase = base
    return (
        f"CAST(conv(substr({base}, 1, 12), 16, 10) AS BIGINT)",
        f"CAST(conv(substr({obase}, 13, 12), 16, 10) AS BIGINT)",
    )


_H1_SPARK, _OK_SPARK = _shard_keys("doc_id")
_H1_DUCK = "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT)"
_OK_DUCK = "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 13, 12)) AS BIGINT)"
# position-weighted checksum term: (pos mod P) * dochash mod P, with
# dochash = ((h1 mod P) * 65537 + okey) mod P mixing both 48-bit slices.
# Every intermediate stays < 2^62, so plain BIGINT math is exact in both
# engines; the sum crosses engines as decimal/hugeint before the final mod.
_FP_TERM_DUCK = (
    f"((pos % {_FP_P}) * (((h1 % {_FP_P}) * 65537 + okey) % {_FP_P})) % {_FP_P}"
)


def _fp_term(pos: Column, h1: Column, okey: Column) -> Column:
    dochash = ((h1 % _FP_P) * F.lit(65537) + okey) % _FP_P
    return ((pos % _FP_P) * dochash) % _FP_P


def _with_fp_term(
    df: DataFrame, shard_col: str, order_col: str, id_col: str, h1: Column
) -> DataFrame:
    """ONE definition of the per-row checksum term: within-shard position =
    row_number over (order key, id), term = _fp_term(pos, h1, okey). Both
    the report query and the writer derive their manifests from this —
    editing the window or the term in one place keeps them in lockstep."""
    from pyspark.sql import Window

    w = Window.partitionBy(shard_col).orderBy(order_col, id_col)
    pos = F.row_number().over(w).cast("bigint")
    return df.withColumn("_term", _fp_term(pos, h1, F.col(order_col)))


def _fp_agg() -> Column:
    """The matching aggregate: exact decimal sum of terms, mod P."""
    return (
        F.pmod(F.sum(F.col("_term").cast("decimal(38,0)")), F.lit(_FP_P))
        .cast("bigint")
        .alias("order_fp")
    )


@register(
    "shard_manifest",
    survey="A2,W1,F14,beyond-ref",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, source,
             CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS BIGINT)
               AS n_tokens,
             CAST(LENGTH(text) AS BIGINT) AS n_chars,
             {_H1_DUCK} AS h1,
             {_OK_DUCK} AS okey
      FROM documents
    ),
    positioned AS (
      SELECT *,
             CAST(h1 % {_SHARDS} AS INT) AS shard,
             ROW_NUMBER() OVER (PARTITION BY h1 % {_SHARDS}
                                ORDER BY okey, doc_id) AS pos
      FROM keyed
    )
    SELECT shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(SUM(CAST({_FP_TERM_DUCK} AS HUGEINT)) % {_FP_P} AS BIGINT)
             AS order_fp
    FROM positioned
    GROUP BY shard
    """,
)
def shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard manifest: the export step that turns a
    curated corpus into N fixed shards a dataloader can stream. Every doc is
    assigned to shard ``md5(doc_id)[0:12] % N`` (content-independent, so
    re-exports are stable and shards stay hash-balanced even at thousands of
    shards — see :func:`_shard_keys`), ordered WITHIN its shard by a second
    48-bit md5 slice (the deterministic pseudo-shuffle training wants —
    never source/crawl order), and the manifest reports per shard: doc
    count, true whitespace-token and char totals, distinct sources, and a
    position-weighted checksum ``sum(pos * dochash) mod 2^31-1`` a consumer
    re-derives to verify both membership AND order of a delivered shard — a
    plain content hash can't catch a reshuffled shard.

    Scale shape: one hash-partition shuffle into shards, one sort per shard.
    At 100 TB the shard count is chosen in the thousands (e.g. ~10 GB per
    shard — the WebDataset/TFRecord convention), so "sort one shard" is a
    single-task-sized sequential unit by construction and every shard sorts
    in parallel; N=16 here only because the test corpus is small. The
    checksum is exact integer math (products < 2^62, summed as
    decimal(38,0) before the final mod), so Spark and DuckDB agree
    bit-for-bit regardless of reduction order."""
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        "source",
        (
            F.length("text")
            - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            + 1
        ).cast("bigint").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
        F.expr(_H1_SPARK).alias("h1"),
        F.expr(_OK_SPARK).alias("okey"),
    ).withColumn("shard", (F.col("h1") % _SHARDS).cast("int"))
    positioned = _with_fp_term(keyed, "shard", "okey", "doc_id", F.col("h1"))
    return positioned.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        _fp_agg(),
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int = _SHARDS,
    id_col: str = "doc_id",
    epoch: str = "",
    max_records_per_file: int = 0,
) -> DataFrame:
    """Materialize a curated corpus as ``n_shards`` deterministic training
    shards under ``path`` plus a verifiable manifest — the export half of
    :func:`shard_manifest` (which only *reports* the plan).

    Layout: ``path/shard=K/part-*.parquet`` with two extra columns,
    ``_shard`` (redundant copy of the dir key, survives non-partition-aware
    readers) and ``_order_key`` (the within-shard pseudo-shuffle key), plus
    ``path/_manifest/`` holding one row per shard: ``(shard, n_docs,
    order_fp)`` with the same position-weighted checksum definition as
    :func:`shard_manifest` (the per-shard token/char/source totals of that
    report need a ``text`` column a generic ``df`` may not have, so the
    writer's manifest carries only the universally-derivable columns).

    Global order contract: rows are range-sorted by (shard, order key, id)
    before the partitioned write, so within every ``shard=K`` dir the
    lexicographic part-file order IS the shard's sample order (range
    partitions ascend with the sort key and part numbers ascend with
    partition id). ``max_records_per_file`` (0 = unbounded) caps file sizes
    for file-at-a-time dataloader workers; splits roll within a task's
    already-sorted stream, so order survives. Caveats on name-sorted
    streaming: Spark zero-pads part numbers to 5 digits (invalid at
    >=100 000 output tasks) and split-file counters to 3 digits (invalid
    past 999 splits in one task — size the cap so a range partition rolls
    fewer than 1000 files); the authoritative consumer protocol is
    re-sorting on the persisted ``(_order_key, id)``, which has no such
    bounds. Scale shape: one range
    shuffle + write (each output task writes one contiguous slice of one
    shard — no single-task-per-shard bottleneck), then the manifest is
    derived by re-reading the three narrow key columns OF THE WRITTEN FILES
    (column-pruned parquet scan — never a second pass over the corpus text,
    and the checksum attests what is actually on disk).

    ``epoch`` seeds the within-shard order (see :func:`_shard_keys`): write
    one export per training epoch and each gets a fresh deterministic
    shuffle with identical shard membership.

    Returns the written manifest, re-read from ``path/_manifest``.
    """
    reserved = {"shard", "_shard", "_order_key"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"input df already has reserved shard-writer columns {sorted(reserved)}"
            " — rename them before exporting (silently clobbering them would"
            " lose data and break the union==snapshot contract)"
        )
    h_expr, o_expr = _shard_keys(id_col, epoch)
    keyed = (
        df.withColumn("_order_key", F.expr(o_expr))
        .withColumn("shard", (F.expr(h_expr) % n_shards).cast("int"))
        .withColumn("_shard", F.col("shard"))
    )
    writer = (
        keyed.repartitionByRange(
            max(df.sparkSession.sparkContext.defaultParallelism, n_shards),
            "shard",
            "_order_key",
            id_col,
        )
        .sortWithinPartitions("shard", "_order_key", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
    )
    if max_records_per_file:
        # bound file sizes for the consumer (dataloader workers stream one
        # file at a time); splits preserve order — maxRecordsPerFile rolls
        # files within a task's already-sorted row stream
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)

    spark = df.sparkSession
    written = spark.read.parquet(path).select("_shard", "_order_key", id_col)
    manifest = (
        _with_fp_term(written, "_shard", "_order_key", id_col, F.expr(h_expr))
        .groupBy(F.col("_shard").alias("shard"))
        .agg(F.count(F.lit(1)).alias("n_docs"), _fp_agg())
        # persist the export's modulus: the manifest rows only cover
        # NON-EMPTY shards, so a verifier inferring n_shards from the row
        # count would use the wrong modulus whenever any shard got zero
        # docs (tiny corpus, large n_shards) and report false tampering
        .withColumn("n_shards", F.lit(int(n_shards)))
    )
    manifest_path = path.rstrip("/") + "/_manifest"
    manifest.write.mode("overwrite").parquet(manifest_path)
    return spark.read.parquet(manifest_path)


class ShardVerificationError(ValueError):
    """A delivered shard export failed manifest verification."""


def verify_training_shards(
    spark: SparkSession,
    path: str,
    id_col: str = "doc_id",
    n_shards: int | None = None,
) -> DataFrame:
    """The consumer half of the manifest contract: re-derive every shard's
    position-weighted order checksum from the files actually on disk and
    compare it to ``path/_manifest``. :func:`write_training_shards` promises
    a consumer can verify both MEMBERSHIP and ORDER of a delivered shard —
    this is the helper that does it, sharing the exact ``_with_fp_term`` /
    ``_fp_agg`` definitions the writer used (one definition, zero drift).

    Protocol: rows re-sort on the persisted ``(_order_key, id)`` — the
    authoritative consumption order — and the per-row term re-derives ``h1``
    from the id itself (epoch-invariant by :func:`_shard_keys`, so one
    verifier covers every epoch's export). A dropped/duplicated/foreign row
    moves ``n_docs`` and the checksum; a tampered id moves ``h1``; a
    tampered ``_order_key`` re-pairs positions with the wrong doc hashes —
    all land in ``ok = false``.

    MEMBERSHIP is re-derived, not trusted: rows group by the ``shard=K``
    DIRECTORY key (what a directory-walking dataloader actually reads), and
    every row re-checks ``h1 % n_shards == shard`` and ``_shard == shard``
    from the id itself. A part file moved between shard dirs therefore
    lands in the receiving dir's count/checksum (mismatch) AND its rows
    flag as misplaced — a forged ``_shard`` column consistent with its rows
    cannot launder a move past the verifier. ``n_shards`` defaults to the
    modulus the writer persisted in the manifest (``n_shards`` column);
    for pre-column exports it falls back to the manifest row count (exact
    whenever every shard got >=1 doc). Pass it explicitly only to
    override a legacy export where some shard got zero docs.

    Returns one row per shard: ``(shard, n_docs_expected, n_docs_actual,
    order_fp_expected, order_fp_actual, n_misplaced, ok)``, full-outer
    joined so a shard missing from either side (deleted dir, forged
    manifest row) still reports. Scale shape: a pruned parquet scan of the
    export (partition key + 3 narrow columns, never payload) plus one hash
    aggregate; the manifest side is n_shards rows."""
    h_expr, _ = _shard_keys(id_col)
    raw_manifest = spark.read.parquet(path.rstrip("/") + "/_manifest")
    manifest = raw_manifest.select(
        "shard",
        F.col("n_docs").alias("n_docs_expected"),
        F.col("order_fp").alias("order_fp_expected"),
    )
    if n_shards is None:
        if "n_shards" in raw_manifest.columns:
            # the writer persists its modulus (manifest rows only cover
            # non-empty shards, so row count under-reports when a shard
            # got zero docs); one-row bounded collect
            vals = [
                r[0]
                for r in raw_manifest.select("n_shards").distinct().collect()
            ]
            if len(vals) != 1:
                raise ShardVerificationError(
                    f"manifest carries conflicting n_shards values: {vals}"
                )
            n_shards = int(vals[0])
        else:
            # pre-n_shards-column export: exact whenever every shard got
            # >=1 doc (the balanced 48-bit hash guarantees this at any
            # realistic corpus/shard ratio)
            n_shards = manifest.count()  # bounded: one row per shard
    written = spark.read.parquet(path).select(
        F.col("shard").cast("int").alias("shard"),
        "_shard",
        "_order_key",
        id_col,
    )
    misplaced = (
        F.pmod(F.expr(h_expr), F.lit(n_shards)) != F.col("shard").cast("bigint")
    ) | (F.col("_shard") != F.col("shard"))
    actual = (
        _with_fp_term(written, "shard", "_order_key", id_col, F.expr(h_expr))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs_actual"),
            _fp_agg(),
            F.sum(misplaced.cast("bigint")).alias("n_misplaced"),
        )
        .withColumnRenamed("order_fp", "order_fp_actual")
    )
    return (
        manifest.join(actual, "shard", "full_outer")
        .select(
            "shard",
            "n_docs_expected",
            "n_docs_actual",
            "order_fp_expected",
            "order_fp_actual",
            "n_misplaced",
            (
                F.col("n_docs_expected").eqNullSafe(F.col("n_docs_actual"))
                & F.col("order_fp_expected").eqNullSafe(
                    F.col("order_fp_actual")
                )
                & (F.coalesce(F.col("n_misplaced"), F.lit(0)) == 0)
            ).alias("ok"),
        )
    )


def assert_training_shards_ok(
    spark: SparkSession,
    path: str,
    id_col: str = "doc_id",
    n_shards: int | None = None,
) -> None:
    """Raise :class:`ShardVerificationError` naming every failing shard if
    ``path`` does not verify against its manifest (bounded collect: one row
    per shard)."""
    bad = (
        verify_training_shards(spark, path, id_col=id_col, n_shards=n_shards)
        .filter(~F.col("ok"))
        .collect()
    )
    if bad:
        detail = ", ".join(
            f"shard {r['shard']}: docs {r['n_docs_expected']}!={r['n_docs_actual']}"
            f" or fp {r['order_fp_expected']}!={r['order_fp_actual']}"
            f" or {r['n_misplaced']} misplaced rows"
            for r in bad
        )
        raise ShardVerificationError(
            f"shard export at {path} failed verification — {detail}"
        )


class ShardExporter:
    """Incremental training-shard export of a deltalite corpus table.

    Each :meth:`refresh` drains the base table's change feed since the last
    exported watermark into a NEW GENERATION directory
    ``path/gen=<version>/`` written by :func:`write_training_shards` — same
    shard assignment, within-shard order, and manifest checksum contracts.
    A consumer streams generations in ascending version order; within one
    generation the write_training_shards order contract applies. Because
    shard assignment is a content-independent hash of the id, a doc's shard
    never changes across generations — per-shard consumers read
    ``gen=*/shard=K`` and stay correct.

    Training shards are append-only artifacts, so only row-preserving
    windows (appends / physical-only commits, the same
    ``incremental_fold_safe`` gate the incremental LSH index uses) fold as
    O(delta) generations. Any history rewrite (DELETE/UPDATE/MERGE/
    overwrite/restore), schema change touching exported columns, or a
    retention-pruned feed window triggers a FULL re-export: one fresh base
    generation at the current version, with every earlier generation listed
    in the state file's ``superseded`` (consumers must restart from the new
    base — the old files are left for in-flight readers and can be removed
    once drained).

    Crash idempotence: the data write lands before the state file advances,
    and re-writing ``gen=<v>`` is a deterministic overwrite — a retry after
    a crash between the two steps converges to the same bytes. The
    watermark-idempotent ``refresh()`` also satisfies the streaming sinks'
    duck-typed ``maintain=`` post-commit hook (streaming/pipeline.py
    ``_refresh_all``), so a live ingest stream can export each micro-batch
    as a shard generation in the same foreachBatch.

    Cites the reference's change-feed-driven downstream pattern
    (db/query_scd1_table.sql:157-158) re-targeted at dataset export.
    """

    _STATE = "_export_state.json"

    def __init__(
        self,
        spark: SparkSession,
        base,
        path: str,
        n_shards: int = _SHARDS,
        id_col: str = "doc_id",
        max_records_per_file: int = 0,
        verify: bool = False,
    ) -> None:
        self.spark = spark
        self.base = base
        self.path = path.rstrip("/")
        self.n_shards = n_shards
        self.id_col = id_col
        self.max_records_per_file = max_records_per_file
        # opt-in verify-after-export: every generation write is immediately
        # re-read through verify_training_shards and refresh() raises
        # ShardVerificationError before advancing any consumer-visible state
        # beyond what the (already crash-idempotent) retry would redo
        self.verify = verify

    # -- state ---------------------------------------------------------
    def _state(self) -> dict:
        import json
        from pathlib import Path

        p = Path(self.path) / self._STATE
        if not p.exists():
            return {"last_version": -1, "generations": [], "superseded": []}
        return json.loads(p.read_text())

    def _write_state(self, state: dict) -> None:
        import json
        import os
        from pathlib import Path

        Path(self.path).mkdir(parents=True, exist_ok=True)
        tmp = Path(self.path) / (self._STATE + ".tmp")
        tmp.write_text(json.dumps(state))
        os.replace(tmp, Path(self.path) / self._STATE)

    def _gen_dir(self, version: int) -> str:
        return f"{self.path}/gen={version}"

    def _adopt_orphans(self, state: dict, upto: int) -> None:
        """A crash between a generation's data write and the state advance,
        followed by NEW base commits before the retry, leaves a gen dir the
        state never recorded (the exact-same-upto replay overwrites it; a
        different upto would orphan it). Sweep such dirs into ``superseded``
        so the documented drain-then-remove GC protocol covers them and a
        ``gen=*/shard=K`` glob consumer knows not to read them."""
        from pathlib import Path

        known = set(state["generations"]) | set(state["superseded"])
        orphans = []
        for p in Path(self.path).glob("gen=*"):
            try:
                v = int(p.name.split("=", 1)[1])
            except ValueError:
                continue
            if v not in known and v != upto:
                orphans.append(v)
        if orphans:
            state["superseded"] = sorted(set(state["superseded"]) | set(orphans))
            self._write_state(state)

    # -- export --------------------------------------------------------
    def _export_full(self, upto: int, state: dict) -> DataFrame | None:
        try:
            snap = self.base.read(version=upto)
            empty = snap.isEmpty()
        except ValueError:
            # "empty table at version N" (a CoW rewrite left no live dirs)
            empty = True
        if empty:
            # nothing to export (also reached when a DV delete tombstoned
            # every row): supersede every earlier generation so consumers
            # converge on the empty corpus, and advance the watermark —
            # write_training_shards on zero rows would emit a dataless
            # parquet dir a consumer's reader cannot even open
            state["superseded"] = sorted(
                set(state["superseded"]) | set(state["generations"])
            )
            state["generations"] = []
            state["last_version"] = upto
            self._write_state(state)
            return None
        manifest = write_training_shards(
            snap,
            self._gen_dir(upto),
            n_shards=self.n_shards,
            id_col=self.id_col,
            max_records_per_file=self.max_records_per_file,
        )
        if self.verify:
            assert_training_shards_ok(
                self.spark, self._gen_dir(upto), id_col=self.id_col
            )
        state["superseded"] = sorted(
            set(state["superseded"]) | {g for g in state["generations"] if g != upto}
        )
        state["generations"] = [upto]
        state["last_version"] = upto
        self._write_state(state)
        return manifest

    def refresh(self) -> int:
        """Export every base commit newer than the watermark; returns the
        new watermark. No new commits → no new generation."""
        from pyspark_cdc_engine.incremental import incremental_fold_safe
        from pyspark_cdc_engine.streaming.replicate import _META_COLS
        from pyspark_cdc_engine.tables import (
            NoChangesInWindow,
            RetentionPrunedWindow,
        )

        upto = self.base.latest_version()
        state = self._state()
        since = state["last_version"]
        if since >= upto:
            return since
        self._adopt_orphans(state, upto)

        # the export ships EVERY column, so any schema commit touching any
        # column visible at EITHER end of the window breaks additive folding:
        # the upto-side set alone misses drop_column (the dropped name is no
        # longer in it, yet earlier generations shipped it — folding would
        # write schema-divergent generations). Schema introspection only —
        # .columns triggers no job.
        # These reads themselves can refuse: cleanup_log pruning the
        # watermark version makes state_at raise FileNotFoundError ("no
        # commit at version"), and an empty snapshot at either window end
        # raises ValueError ("empty table at version N"). Both mean additive
        # folding is impossible — exactly the full re-export cases, so the
        # decision must not crash before reaching that fallback.
        try:
            referenced = set(self.base.read(version=upto).columns)
            if since >= 0:
                referenced |= set(self.base.read(version=since).columns)
            fold_safe = since >= 0 and incremental_fold_safe(
                self.base.history(), since, upto, referenced
            )
        except (FileNotFoundError, ValueError):
            fold_safe = False
        if not fold_safe:
            self._export_full(upto, state)
            return upto
        try:
            changed = self.base.read_changes(since, upto)
        except NoChangesInWindow:
            state["last_version"] = upto
            self._write_state(state)
            return upto
        except RetentionPrunedWindow:
            self._export_full(upto, state)
            return upto
        write_training_shards(
            changed.drop(*_META_COLS),
            self._gen_dir(upto),
            n_shards=self.n_shards,
            id_col=self.id_col,
            max_records_per_file=self.max_records_per_file,
        )
        if self.verify:
            assert_training_shards_ok(
                self.spark, self._gen_dir(upto), id_col=self.id_col
            )
        state["generations"] = sorted(set(state["generations"]) | {upto})
        state["last_version"] = upto
        self._write_state(state)
        return upto

    def gc_superseded(self) -> list[int]:
        """Delete superseded generation dirs (the drain-then-remove half of
        the protocol: call once every consumer has restarted onto the
        current base generation). Returns the versions removed. Live
        generations are never touched.

        Concurrency: the state write touches ONLY the superseded list, and
        it is re-read AFTER the deletes — a refresh() committing in between
        keeps its generations/last_version advance. The one remaining
        window (a full re-export superseding new versions between the
        re-read and the write) is self-healing: the dirs survive on disk
        and the next refresh()'s ``_adopt_orphans`` re-adopts them."""
        import shutil
        from pathlib import Path

        removed = []
        for g in self._state()["superseded"]:
            p = Path(self._gen_dir(g))
            if p.exists():
                shutil.rmtree(p)
            removed.append(g)
        fresh = self._state()
        done = set(removed)
        fresh["superseded"] = [g for g in fresh["superseded"] if g not in done]
        self._write_state(fresh)
        return removed

    def live_docs(self) -> DataFrame:
        """Union of all live (non-superseded) generations — must equal the
        base table's snapshot at the watermark (tested contract)."""
        state = self._state()
        if not state["generations"]:
            raise ValueError(
                f"nothing exported yet under {self.path} — call refresh() first"
            )
        dfs = [
            self.spark.read.parquet(self._gen_dir(g)).drop("_shard", "_order_key", "shard")
            for g in state["generations"]
        ]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out


@register(
    "shard_export_scenario",
    survey="§2.12,A2,W1,beyond-ref",
    oracle=f"""
    WITH src AS (
      SELECT doc_id, 0 AS gen FROM documents
      WHERE doc_id % 2 = 0 AND doc_id % 7 <> 0
      UNION ALL
      SELECT doc_id, 1 AS gen FROM documents WHERE doc_id % 2 = 1
    ),
    keyed AS (
      SELECT gen, doc_id, {_H1_DUCK} AS h1, {_OK_DUCK} AS okey FROM src
    ),
    positioned AS (
      SELECT *,
             CAST(h1 % {_SHARDS} AS INT) AS shard,
             ROW_NUMBER() OVER (PARTITION BY gen, h1 % {_SHARDS}
                                ORDER BY okey, doc_id) AS pos
      FROM keyed
    )
    SELECT gen, shard,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST({_FP_TERM_DUCK} AS HUGEINT)) % {_FP_P} AS BIGINT)
             AS order_fp
    FROM positioned
    GROUP BY gen, shard
    """,
)
def shard_export_scenario(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental shard exporter's WHOLE lifecycle under driver
    certification (the dml_orders_scenario pattern applied to export):
    materialize the even-id documents as a deltalite table and export the
    base generation; DELETE the id%7==0 rows (a history rewrite — the
    exporter must FULLY re-export and supersede the base); APPEND the
    odd-id documents (an append-only window — the exporter must fold it as
    one O(delta) generation). The returned frame is the on-disk manifests
    of the two LIVE generations (gen 0 = re-exported evens minus deleted,
    gen 1 = appended odds), which must match the oracle's from-scratch
    per-generation shard/checksum derivation over raw ``documents`` —
    certifying shard assignment, within-shard order, the position-weighted
    checksum, the rewrite-vs-fold decision, and the superseded bookkeeping
    in one driver-checked number set."""
    from pyspark_cdc_engine.operators.dedup_incremental import _fresh_scratch_dir
    from pyspark_cdc_engine.tables import DeltaliteTable

    d = load_table(spark, sf_dir, "documents")
    tmp = _fresh_scratch_dir(f"shardexp:{sf_dir}")
    t = DeltaliteTable(spark, f"{tmp}/docs")
    t.overwrite(d.filter("doc_id % 2 = 0"))
    ex = ShardExporter(spark, t, f"{tmp}/shards")
    ex.refresh()
    t.delete("doc_id % 7 = 0")
    ex.refresh()  # full re-export: base generation superseded
    t.append(d.filter("doc_id % 2 = 1"))
    ex.refresh()  # append-only window: one incremental generation
    gens = sorted(ex._state()["generations"])
    if len(gens) != 2:  # explicit raise — survives `python -O`
        raise ValueError(
            f"shard_export_scenario expected 2 live generations, got {gens}"
        )
    parts = [
        spark.read.parquet(ex._gen_dir(g) + "/_manifest").withColumn(
            "gen", F.lit(i)
        )
        for i, g in enumerate(gens)
    ]
    return parts[0].unionByName(parts[1]).select(
        "gen", "shard", "n_docs", "order_fp"
    )


@register(
    "shard_verify_roundtrip",
    survey="A2,W1,F14,beyond-ref",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, {_H1_DUCK} AS h1, {_OK_DUCK} AS okey FROM documents
    ),
    positioned AS (
      SELECT *,
             CAST(h1 % {_SHARDS} AS INT) AS shard,
             ROW_NUMBER() OVER (PARTITION BY h1 % {_SHARDS}
                                ORDER BY okey, doc_id) AS pos
      FROM keyed
    )
    SELECT shard,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST({_FP_TERM_DUCK} AS HUGEINT)) % {_FP_P} AS BIGINT)
             AS order_fp,
           TRUE AS ok
    FROM positioned
    GROUP BY shard
    """,
)
def shard_verify_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-then-verify round trip of the shard manifest contract under
    driver certification: export ``documents`` with
    :func:`write_training_shards` into scratch, run the CONSUMER-side
    :func:`verify_training_shards` against the files on disk, and return the
    verifier's re-derived per-shard (count, checksum, ok). The oracle
    re-derives the same numbers from raw ``documents`` from scratch — so a
    hash match certifies writer and verifier agree with an independent
    third derivation, and ``ok`` is pinned TRUE for every shard."""
    from pyspark_cdc_engine.operators.dedup_incremental import (
        _fresh_scratch_dir,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    tmp = _fresh_scratch_dir(f"shardverify:{sf_dir}")
    write_training_shards(d, f"{tmp}/shards")
    report = verify_training_shards(spark, f"{tmp}/shards")
    return report.select(
        "shard",
        F.col("n_docs_actual").alias("n_docs"),
        F.col("order_fp_actual").alias("order_fp"),
        "ok",
    )


# ------------------------------------------------------------- r12 additions

_TBF_BUCKETS = 64  # hash sub-streams per source for the bucket-parallel fill
_TBF_FRAC = 0.5    # fraction of corpus tokens the fill targets
_TBF_H_SPARK = (
    "CAST(conv(substr(md5(CAST(CAST(doc_id AS STRING) AS BINARY)), 1, 2), 16, 10)"
    f" AS INT) % {_TBF_BUCKETS}"
)
_TBF_H_DUCK = (
    "((instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16"
    " + (instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1))"
    f" % {_TBF_BUCKETS}"
)


@register(
    "token_budget_fill",
    survey="M5-text,A2,W1,F5,beyond-ref",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, source,
             CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT)
               AS n_tokens,
             md5(CAST(doc_id AS VARCHAR)) AS hkey,
             {_TBF_H_DUCK} AS h
      FROM documents
    ),
    src AS (SELECT source, SUM(n_tokens) AS t_src FROM docs GROUP BY source),
    tot AS (
      SELECT SUM(t_src) AS t_all,
             CAST(SUM(CAST(SQRT(CAST(t_src AS DOUBLE)) AS DECIMAL(38,12)))
                  AS DOUBLE) AS s_all
      FROM src
    ),
    budgets AS (
      SELECT source,
             CAST(FLOOR({_TBF_FRAC} * CAST(t_all AS DOUBLE)
                        * SQRT(CAST(t_src AS DOUBLE)) / s_all) AS BIGINT)
               AS source_budget
      FROM src, tot
    ),
    bkt AS (SELECT source, h, SUM(n_tokens) AS bt FROM docs GROUP BY source, h),
    bkt_cum AS (
      SELECT source, h,
             SUM(bt) OVER (PARTITION BY source ORDER BY h
                           ROWS UNBOUNDED PRECEDING) - bt AS cum_before
      FROM bkt
    ),
    positioned AS (
      SELECT d.doc_id, d.source, d.n_tokens,
             bc.cum_before
               + SUM(d.n_tokens) OVER (PARTITION BY d.source, d.h
                                       ORDER BY d.hkey, d.doc_id
                                       ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM docs d JOIN bkt_cum bc ON bc.source = d.source AND bc.h = d.h
    )
    SELECT p.doc_id, p.source, p.n_tokens,
           CAST(p.cum_tokens AS BIGINT) AS cum_tokens, b.source_budget
    FROM positioned p JOIN budgets b ON b.source = p.source
    WHERE p.cum_tokens <= b.source_budget
    """,
)
def token_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill a global token budget with a temperature-weighted source mixture —
    the step that turns "we want a {_TBF_FRAC:.0%}-of-corpus, sqrt-balanced
    mix" into an actual document selection. Per-source budgets are
    ``floor(frac * T * sqrt(t_src) / sum_u sqrt(t_u))`` (alpha=0.5 temperature
    reweighting, the multilingual-mixture convention); documents are then
    consumed in deterministic content-hash order until each source's budget
    is exhausted (take-while on the running token count — reproducible
    "random" order across engines, runs and partitionings).

    The take-while is the scale problem: a naive per-source cumulative-sum
    window is ONE sort partition per source, and at 100 TB a source is
    billions of documents. This implements the distributed take-while:
    documents hash into {_TBF_BUCKETS} sub-streams per source; per-bucket
    token subtotals (corpus-sized hash agg) feed a bucket-level cumulative
    offset (a <= {_TBF_BUCKETS}-rows-per-source window); each document then
    needs only an INTRA-BUCKET running sum (windows partitioned by
    (source, bucket) — {_TBF_BUCKETS}x the parallelism of the naive plan) and
    its global position is ``bucket_offset + intra_cum``. Every arithmetic
    step is integer except the budget derivation, whose float ops are
    written as the identical IEEE expression tree in both engines (sqrt of
    an integer is never a decimal midpoint, and the sqrt-sum accumulates in
    DECIMAL), so the floor and the selected set are bit-reproducible."""
    from pyspark.sql import Window

    d = fan_out(load_table(spark, sf_dir, "documents"))
    docs = d.select(
        "doc_id",
        "source",
        F.expr(
            "CAST(size(filter(split(text, ' '), w -> w <> '')) AS BIGINT)"
        ).alias("n_tokens"),
        F.expr("md5(CAST(CAST(doc_id AS STRING) AS BINARY))").alias("hkey"),
        F.expr(_TBF_H_SPARK).alias("h"),
    )
    src = docs.groupBy("source").agg(F.sum("n_tokens").alias("t_src"))
    tot = src.agg(
        F.sum("t_src").alias("t_all"),
        F.sum(F.sqrt(F.col("t_src").cast("double")).cast("decimal(38,12)"))
        .cast("double")
        .alias("s_all"),
    )
    budgets = src.crossJoin(F.broadcast(tot)).select(
        "source",
        F.floor(
            F.lit(_TBF_FRAC)
            * F.col("t_all").cast("double")
            * F.sqrt(F.col("t_src").cast("double"))
            / F.col("s_all")
        ).alias("source_budget"),
    )
    bkt = docs.groupBy("source", "h").agg(F.sum("n_tokens").alias("bt"))
    w_bkt = (
        Window.partitionBy("source")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bkt_cum = bkt.select(
        "source", "h", (F.sum("bt").over(w_bkt) - F.col("bt")).alias("cum_before")
    )
    w_doc = (
        Window.partitionBy("source", "h")
        .orderBy("hkey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    positioned = docs.join(F.broadcast(bkt_cum), ["source", "h"]).select(
        "doc_id",
        "source",
        "n_tokens",
        (F.col("cum_before") + F.sum("n_tokens").over(w_doc)).alias("cum_tokens"),
    )
    return positioned.join(F.broadcast(budgets), "source").filter(
        F.col("cum_tokens") <= F.col("source_budget")
    ).select("doc_id", "source", "n_tokens", "cum_tokens", "source_budget")


@register(
    "nb_token_vote_classifier",
    survey="M5-text,A2,J3,F11,beyond-ref",
    oracle="""
    WITH tokens AS (
      SELECT doc_id, lang, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en,
             UNNEST(list_filter(string_split(text, ' '), w -> w <> '')) AS word
      FROM documents
    ),
    wc AS (
      SELECT word,
             SUM(CASE WHEN is_en = 1 THEN 1 ELSE 0 END) AS c_pos,
             SUM(CASE WHEN is_en = 1 THEN 0 ELSE 1 END) AS c_neg
      FROM tokens GROUP BY word
    ),
    tot AS (SELECT SUM(c_pos) AS n_pos, SUM(c_neg) AS n_neg FROM wc),
    votes AS (
      SELECT t.doc_id, t.lang,
             CASE WHEN CAST(w.c_pos AS DECIMAL(19,0)) * CAST(tot.n_neg AS DECIMAL(19,0))
                     > CAST(w.c_neg AS DECIMAL(19,0)) * CAST(tot.n_pos AS DECIMAL(19,0))
                  THEN 1 ELSE 0 END AS v_pos,
             CASE WHEN CAST(w.c_neg AS DECIMAL(19,0)) * CAST(tot.n_pos AS DECIMAL(19,0))
                     > CAST(w.c_pos AS DECIMAL(19,0)) * CAST(tot.n_neg AS DECIMAL(19,0))
                  THEN 1 ELSE 0 END AS v_neg
      FROM tokens t JOIN wc w ON w.word = t.word, tot
    )
    SELECT doc_id, lang,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(v_pos) AS BIGINT) AS pos_votes,
           CAST(SUM(v_neg) AS BIGINT) AS neg_votes,
           CAST(CASE WHEN SUM(v_pos) > SUM(v_neg) THEN 1 ELSE 0 END AS INT) AS pred_en
    FROM votes GROUP BY doc_id, lang
    """,
)
def nb_token_vote_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised Naive-Bayes-style document classifier trained and applied
    in one distributed pass — the exact-arithmetic analogue of the
    fasttext-style quality/language classifiers pretraining pipelines gate
    on. Class = ``lang == 'en'``; per-token likelihood comparison
    ``p(w|pos) > p(w|neg)`` is evaluated as the integer cross-multiplication
    ``c_pos(w) * N_neg > c_neg(w) * N_pos`` (no division, no log — the NB
    decision boundary per token, exact in both engines; DECIMAL(19,0)
    operands keep the product exact at any corpus size), each token votes
    for the class its likelihood favors, and the document prediction is the
    integer vote majority. Scored by resubstitution here (train corpus ==
    scoring corpus, stated honestly); the production shape fits ``wc`` on a
    labeled slice and broadcasts it, which is exactly the join below.

    Plan: token explode; vocabulary counts via one hash shuffle on ``word``
    (map-side partial combine -> one row per distinct word); the 1-row class
    totals broadcast; tokens re-join the vocabulary on ``word`` (AQE
    broadcasts the vocab side — it grows ~log of corpus size); final per-doc
    hash agg. Integer end-to-end — the hash certification has zero float
    surface."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    tokens = d.select(
        "doc_id",
        "lang",
        F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0)).alias("is_en"),
        F.explode(F.split("text", " ")).alias("word"),
    ).filter(F.col("word") != "")
    wc = tokens.groupBy("word").agg(
        F.sum("is_en").alias("c_pos"),
        F.sum(F.lit(1) - F.col("is_en")).alias("c_neg"),
    )
    tot = wc.agg(F.sum("c_pos").alias("n_pos"), F.sum("c_neg").alias("n_neg"))
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    votes = (
        tokens.join(wc, "word")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "lang",
            F.when(dec("c_pos") * dec("n_neg") > dec("c_neg") * dec("n_pos"), 1)
            .otherwise(0)
            .alias("v_pos"),
            F.when(dec("c_neg") * dec("n_pos") > dec("c_pos") * dec("n_neg"), 1)
            .otherwise(0)
            .alias("v_neg"),
        )
    )
    return votes.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("v_pos").cast("bigint").alias("pos_votes"),
        F.sum("v_neg").cast("bigint").alias("neg_votes"),
        F.when(F.sum("v_pos") > F.sum("v_neg"), 1).otherwise(0).cast("int").alias("pred_en"),
    )


@register(
    "ngram_novelty_score",
    survey="M5-text,A2,J3,W1,beyond-ref",
    oracle="""
    WITH shingled AS (
      SELECT doc_id, sh FROM (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
      ), UNNEST(range(1, len(w) - 8 + 2)) AS t(i),
      LATERAL (SELECT array_to_string(list_slice(w, i, i + 8 - 1), ' ') AS sh)
    ),
    hsets AS (
      SELECT DISTINCT doc_id, substr(md5(sh), 1, 15) AS shh FROM shingled
    ),
    first AS (SELECT shh, MIN(doc_id) AS first_doc FROM hsets GROUP BY shh)
    SELECT h.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN f.first_doc = h.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST(SUM(CASE WHEN f.first_doc = h.doc_id THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS novelty
    FROM hsets h JOIN first f ON f.shh = h.shh
    GROUP BY h.doc_id
    """,
)
def ngram_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty under ingestion order: the fraction of a
    document's DISTINCT 8-word shingles whose globally FIRST appearance
    (minimum doc_id over all documents containing the shingle) is this
    document. A streaming-dedup / curriculum signal: late documents that
    mostly repeat earlier material score near 0 and are the ones a
    dedup-at-ingest policy would drop; high scorers carry genuinely new
    text. Asymmetric by construction — unlike the symmetric Jaccard dedup
    family, this answers "what did THIS doc add when it arrived", the
    marginal-contribution framing (Lee et al. 2022 measure dedup value the
    same way).

    Plan: shingles are generated row-locally and hashed to 15-hex ids (the
    shared MinHash shingle kernel — 15-byte keys through every shuffle);
    the first-appearance table is ONE hash aggregate on shingle hash
    (map-side combine; output is vocabulary-sized, linear in corpus but a
    fraction of the token count); the membership join back is shingle-keyed,
    and the per-doc aggregate is the only doc-keyed shuffle. Integer
    end-to-end with one final IEEE division. Ties (two docs sharing a
    brand-new shingle) credit the LOWER doc_id — the deterministic
    ingestion-order convention, identical in both engines."""
    from pyspark_cdc_engine.operators.dedup_scale import minhash_shingle_sets

    d = fan_out(load_table(spark, sf_dir, "documents"))
    hsets = minhash_shingle_sets(d)
    first = hsets.groupBy("shh").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    )
    return (
        hsets.join(first, "shh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            novel.cast("bigint").alias("n_novel"),
            (novel.cast("double") / F.count(F.lit(1))).alias("novelty"),
        )
    )
