"""Text-analysis and deduplication operators over the ``documents`` table —
the beyond-reference, training-data-pipeline surface (SURVEY §7 M5).

All scoring arithmetic is built from engine-portable primitives (length /
replace / md5 / integer math) so every operator here has an exact DuckDB
oracle. The scale-path variants that need hash families (MinHash/SimHash) live
in :mod:`pyspark_cdc_engine.operators.dedup_scale` with rows-only checks.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_cdc_engine.checkpointing import materialize, materialize_lazy
from pyspark_cdc_engine.config import get_config
from pyspark_cdc_engine.operators.dedup_scale import _shingle_expr_spark
from pyspark_cdc_engine.operators.registry import (
    fan_out,
    load_table,
    register,
    table_row_count,
)


def _occurrences(col: str, needle: str) -> F.Column:
    """Occurrence count via length arithmetic — identical semantics in DuckDB."""
    return (
        (F.length(F.col(col)) - F.length(F.replace(F.col(col), F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("bigint")


def _occurrences_sql(col: str, needle: str) -> str:
    return (
        f"CAST((LENGTH({col}) - LENGTH(REPLACE({col}, '{needle}', ''))) / {len(needle)} AS BIGINT)"
    )


@register(
    "text_stats",
    survey="M5-text",
    oracle=f"""
    SELECT doc_id,
           LENGTH(text) AS char_len,
           {_occurrences_sql('text', ' ')} + 1 AS word_cnt,
           {_occurrences_sql('text', 'the ')} AS stopword_hits,
           CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
             / ({_occurrences_sql('text', ' ')} + 1) AS avg_word_len
    FROM documents
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring primitives: length, whitespace token count, stopword hits,
    average word length. Pure column arithmetic — stays in whole-stage codegen."""
    d = load_table(spark, sf_dir, "documents")
    word_cnt = (_occurrences("text", " ") + 1).alias("word_cnt")
    return d.select(
        "doc_id",
        F.length("text").alias("char_len"),
        word_cnt,
        _occurrences("text", "the ").alias("stopword_hits"),
        (
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / (_occurrences("text", " ") + 1)
        ).alias("avg_word_len"),
    )


@register(
    "quality_score",
    survey="M5-text",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN LENGTH(text) >= 200
                     AND {_occurrences_sql('text', ' ')} + 1 >= 40
                     AND {_occurrences_sql('text', 'the ')} >= 1
                THEN 'keep' ELSE 'drop' END AS verdict,
           CAST({_occurrences_sql('text', 'the ')} AS DOUBLE)
             / ({_occurrences_sql('text', ' ')} + 1) AS stopword_ratio
    FROM documents
    """,
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep/drop quality gate combining length, token count and stopword ratio —
    the standard pretraining-corpus filter shape."""
    d = load_table(spark, sf_dir, "documents")
    words = _occurrences("text", " ") + 1
    stop = _occurrences("text", "the ")
    return d.select(
        "doc_id",
        F.when(
            (F.length("text") >= 200) & (words >= 40) & (stop >= 1), "keep"
        ).otherwise("drop").alias("verdict"),
        (stop.cast("double") / words).alias("stopword_ratio"),
    )


@register(
    "token_count",
    survey="M5-text",
    oracle=f"""
    SELECT doc_id,
           {_occurrences_sql('text', ' ')} + 1 AS ws_tokens,
           CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT) AS approx_bpe_tokens
    FROM documents
    """,
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + the chars/4 BPE heuristic."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        (_occurrences("text", " ") + 1).alias("ws_tokens"),
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("approx_bpe_tokens"),
    )


@register(
    "exact_dedup",
    survey="M5-dedup,A2",
    oracle="""
    SELECT md5(text) AS fingerprint,
           COUNT(*) AS copies,
           MIN(doc_id) AS keeper_doc_id
    FROM documents GROUP BY md5(text)
    """,
)
def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact deduplication by content hash: groupBy(md5(text)), keep min doc_id.
    At 100 TB this is the one-shuffle hash-partition dedup; the fingerprint is
    computed map-side so only (hash, id) pairs shuffle, never the text."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.col("text").cast("binary")).alias("fingerprint"))
        .agg(F.count(F.lit(1)).alias("copies"), F.min("doc_id").alias("keeper_doc_id"))
    )


@register(
    "doc_fingerprint",
    survey="M5-text",
    oracle="""
    SELECT doc_id,
           md5(substr(text, 1, 64)) AS head_fp,
           md5(substr(text, GREATEST(LENGTH(text) - 63, 1), 64)) AS tail_fp
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: content-defined head/tail hashes (the cheap
    first-pass near-dup signal before shingle methods)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5(F.substring("text", 1, 64).cast("binary")).alias("head_fp"),
        F.md5(
            F.expr("substring(text, GREATEST(LENGTH(text) - 63, 1), 64)").cast("binary")
        ).alias("tail_fp"),
    )


@register(
    "lang_id_heuristic",
    survey="M5-text,F11",
    oracle=f"""
    SELECT doc_id, lang,
           CASE WHEN {_occurrences_sql('text', ' the ')} + {_occurrences_sql('text', ' a ')} >= 2
                THEN 'en-like' ELSE 'other' END AS detected
    FROM documents
    """,
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram-marker language ID heuristic (counts of high-frequency English
    function words); at scale this generalizes to a per-language marker matrix."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    score = _occurrences("text", " the ") + _occurrences("text", " a ")
    return d.select(
        "doc_id",
        "lang",
        F.when(score >= 2, "en-like").otherwise("other").alias("detected"),
    )


_SHINGLE_W = 8  # words per shingle; distinctive enough that shared shingles ≈ near-dup

# Guard for the exact all-pairs baseline below lives in config:
# engine.jaccard-exact-max-docs (env alias JACCARD_EXACT_MAX_DOCS), default 20k.


# Shared by the jaccard_near_dup_pairs oracle and the dedup_clusters oracle
# (which consumes the same edge set).
_JACCARD_PAIRS_SQL = f"""
    WITH shingled AS (
      SELECT doc_id, sh FROM (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
      ), UNNEST(range(1, len(w) - {_SHINGLE_W} + 2)) AS t(i),
      LATERAL (SELECT array_to_string(list_slice(w, i, i + {_SHINGLE_W} - 1), ' ') AS sh)
    ),
    -- shingles dedup/join on 15-hex hashes: ~4x fewer shuffle bytes, and
    -- collisions merge shingles identically in both engines (parity exact)
    sets AS (SELECT DISTINCT doc_id, substr(md5(sh), 1, 15) AS sh FROM shingled),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sets GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
      FROM sets a JOIN sets b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.2
"""


@register(
    "jaccard_near_dup_pairs",
    survey="M5-dedup,J5,A2",
    oracle=_JACCARD_PAIRS_SQL,
)
def jaccard_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram (word-shingle) Jaccard near-duplicate pairs. The exact algorithm:
    shingle → distinct (doc, shingle) → self-join on shingle → |∩|/|∪| ≥ τ.
    The shingle equi-join IS the candidate generation step MinHash-LSH
    approximates; at 100 TB you swap the join key from raw shingle to LSH band
    hash (see minhash_lsh_bands) and this plan is otherwise unchanged.

    SIZE-GUARDED: the raw-shingle self-join is the exact small-N baseline and
    is quadratic in the worst case (every hot shingle fans out all-pairs), so
    the registry entry refuses corpora above the
    ``engine.jaccard-exact-max-docs`` config knob (env
    ``JACCARD_EXACT_MAX_DOCS``, default 20k docs) and points at the LSH
    sibling instead of silently launching an all-pairs explosion on a
    cluster."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    limit = get_config().get_int("engine.jaccard-exact-max-docs")
    n_docs = table_row_count(spark, sf_dir, "documents")  # footer-only, no scan
    if n_docs > limit:
        raise ValueError(
            f"jaccard_near_dup_pairs is the exact small-N baseline: corpus has "
            f"{n_docs} docs > guard {limit}. Use minhash_lsh_near_dup (bucketed "
            f"LSH, constant shuffle bytes/doc) at this scale, or raise the "
            f"engine.jaccard-exact-max-docs config knob (env "
            f"JACCARD_EXACT_MAX_DOCS) explicitly."
        )
    w = _SHINGLE_W
    sets = (
        d.select(
            "doc_id",
            F.explode(F.expr(_shingle_expr_spark(w))).alias("sh"),
        )
        # dedup and self-join on 15-hex shingle hashes, not ~60-char strings
        .select("doc_id", F.expr("substr(md5(CAST(sh AS BINARY)), 1, 15)").alias("sh"))
        .distinct()
    )
    # sets feeds the size agg AND both sides of the candidate self-join: above
    # the shared gate, materialize once or the shingle explode+distinct runs 3×
    # (below it, recomputing overlaps on idle cores and beats the extra job)
    from pyspark_cdc_engine.operators.dedup_scale import _maybe_materialize

    sets = _maybe_materialize(sets, n_docs)
    sizes = sets.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sets.alias("a")
    b = sets.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (F.col("i").cast("double") / (F.col("sa.n") + F.col("sb.n") - F.col("i"))).alias(
                "jaccard"
            ),
        )
    )
    return jac.filter(F.col("jaccard") >= 0.2)


def near_dup_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b) near-duplicate edges for graph/curation consumers
    (pagerank, cluster collapse, keep-best), governed by
    ``engine.pair-source`` (env ``CDC_PAIR_SOURCE``):

    - ``exact``: the all-pairs shingle join — still guarded, raises above
      ``engine.jaccard-exact-max-docs`` (an explicit opt-in to exactness).
    - ``lsh``: banded MinHash-LSH candidates + exact-Jaccard verify — the
      100 TB shape (constant shuffle bytes per doc).
    - ``auto`` (default): exact below the guard, LSH above — consumers
      DEGRADE to the scale plan instead of failing. Below the guard the two
      sources agree wherever the LSH threshold (0.8) is met; above it only
      LSH can run at all.
    """
    mode = get_config().get_str("engine.pair-source")
    if mode not in ("exact", "lsh", "auto"):
        raise ValueError(
            f"engine.pair-source must be exact|lsh|auto, got {mode!r}"
        )
    if mode == "auto":
        limit = get_config().get_int("engine.jaccard-exact-max-docs")
        n_docs = table_row_count(spark, sf_dir, "documents")
        mode = "exact" if n_docs <= limit else "lsh"
    if mode == "exact":
        return jaccard_near_dup_pairs(spark, sf_dir).select("doc_a", "doc_b")
    from pyspark_cdc_engine.operators.dedup_scale import lsh_verified_pairs

    d = load_table(spark, sf_dir, "documents")
    n_docs = table_row_count(spark, sf_dir, "documents")
    return lsh_verified_pairs(d, n_docs).select("doc_a", "doc_b")


@register(
    "dedup_clusters",
    survey="M5-dedup,beyond-ref",
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
    )
    SELECT id AS doc_id, MIN(r) AS cluster_id, MIN(r) = id AS is_canonical
    FROM reach GROUP BY id
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTER COLLAPSE: connected components over the near-duplicate
    pair graph, labeling every document with its component's minimum doc_id
    and flagging one canonical representative per cluster — the standard final
    step of corpus dedup (pairs alone can't be dropped safely: A~B and B~C
    must collapse to ONE survivor even when A~C was never emitted).

    Algorithm: distributed min-label propagation with pointer doubling —
    each round every node adopts the smallest label among itself, its
    neighbors, and its label's label (two joins + one min-aggregate per
    round, all on the edge/id key), until a fixpoint. The doubling shortcut
    makes rounds O(log diameter) even on adversarial long-chain graphs;
    near-dup components are small and dense (quasi-cliques), so in practice
    this converges in 2-3 rounds. The edge list is materialized once so
    the shingle join isn't re-executed per round.

    Edges come from :func:`near_dup_edges` (engine.pair-source): the exact
    jaccard baseline below the guard — so the DuckDB oracle can rebuild the
    identical graph with a recursive CTE — and the banded-LSH candidate join
    above it, where this query now degrades instead of raising."""
    pairs = near_dup_edges(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return connected_components(docs, pairs)


def connected_components(
    nodes: DataFrame,
    pairs: DataFrame,
    max_rounds: int = 20,
    stats: dict | None = None,
) -> DataFrame:
    """Min-label propagation WITH POINTER DOUBLING over an undirected pair
    list (see dedup_clusters for the algorithm discussion). ``nodes``: one
    ``doc_id`` column (isolated docs become their own cluster); ``pairs``:
    (doc_a, doc_b). Returns (doc_id, cluster_id, is_canonical).

    Each round a node takes the min over {its label, its neighbors' labels,
    its label's label}. The last term is the pointer-doubling shortcut
    (Shiloach-Vishkin / the star-contraction family): the distance a label
    has travelled roughly doubles per round, so convergence is
    O(log diameter) rounds instead of O(diameter) — a 1M-node chain resolves
    in ~20 rounds, not 1M. Safety: a label only ever holds a node id from its
    own component (labels enter via edges or via another label in the same
    component) and is monotone non-increasing, so the fixpoint is exactly the
    per-component min.

    The loop runs ONLY over nodes that appear in an edge: an isolated node's
    label can never change (no neighbor, label(label)=self), so iterating it
    is pure waste — and in a near-dup corpus almost every document is
    isolated, which made per-round cost O(corpus) instead of O(dup subgraph)
    (the r7 heavy-scaling lane's worst exponent came from exactly this).
    Isolated nodes join the result once at the end as their own singleton
    cluster. Every round materializes via
    :func:`pyspark_cdc_engine.checkpointing.materialize` (reliable
    ``checkpoint()`` when ``engine.checkpoint-dir`` is configured — an
    executor loss mid-loop on a real cluster then recovers instead of killing
    the job — ``localCheckpoint()`` otherwise), truncating lineage; the
    convergence probe filters materialized rows (no extra job). ``stats``,
    when given, receives ``{"rounds": n}`` — the round-complexity contract is
    test-asserted on a long-chain graph."""
    # materialize the pair list BEFORE mirroring it: the union's two branches
    # are otherwise two independent executions of the whole pair-derivation
    # subtree (shingle self-join / LSH verify) inside the edges job (r12,
    # guide §2.4). The mirrored table then unions two cached projections.
    half = materialize(pairs.toDF("src", "dst"))
    edges = materialize(
        half.union(
            half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    )
    # both edge directions are present, so src alone covers every non-isolated
    # node; the loop's label table is the DUP SUBGRAPH, not the corpus
    labels = edges.select(F.col("src").alias("id")).distinct().select(
        "id", F.col("id").alias("label")
    )
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        prop = (
            edges.join(labels, edges.src == labels.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("label").alias("nlabel"))
        )
        # pointer doubling: l(l(u)) — look up the label of u's current label.
        # Round 1 skips it (labels are all self, the hop is the identity).
        if rounds == 1:
            hop = labels.select("id", F.col("label").alias("hlabel"))
        else:
            parents = labels.select(
                F.col("id").alias("pid"), F.col("label").alias("hlabel")
            )
            hop = labels.join(parents, labels.label == parents.pid, "left").select(
                "id", "hlabel"
            )
        # the moved flag rides the checkpointed frame, so the convergence
        # probe is a filter over materialized rows — no extra join per round
        new_labels = (
            labels.join(prop, "id", "left")
            .join(hop, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("label"),
                    F.coalesce("nlabel", "label"),
                    F.coalesce("hlabel", "label"),
                ).alias("label"),
                (
                    F.least(
                        F.coalesce("nlabel", "label"), F.coalesce("hlabel", "label")
                    )
                    < F.col("label")
                ).alias("moved"),
            )
        )
        new_labels = materialize(new_labels)
        changed = new_labels.filter("moved").limit(1).count()
        labels = new_labels.drop("moved")
        if changed == 0:
            break
    else:
        raise RuntimeError(f"connected_components did not converge in {max_rounds} rounds")
    if stats is not None:
        stats["rounds"] = rounds
    # isolated nodes (never touched by the loop) are their own clusters
    return (
        nodes.select(F.col("doc_id").alias("id"))
        .join(labels.withColumnRenamed("label", "clabel"), "id", "left")
        .select(
            F.col("id").alias("doc_id"),
            F.coalesce("clabel", "id").alias("cluster_id"),
            (F.coalesce("clabel", "id") == F.col("id")).alias("is_canonical"),
        )
    )


_HEXD = "0123456789abcdef"
# bucket = first two md5 hex digits of the doc id (0..255) % 100 — stable under
# any repartition/reorder, reproducible across engines and runs
_BUCKET_SPARK = (
    f"MOD((instr('{_HEXD}', substring(md5(CAST(CAST(doc_id AS STRING) AS BINARY)), 1, 1)) - 1) * 16"
    f" + instr('{_HEXD}', substring(md5(CAST(CAST(doc_id AS STRING) AS BINARY)), 2, 1)) - 1, 100)"
)
_BUCKET_DUCK = (
    f"((instr('{_HEXD}', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16"
    f" + instr('{_HEXD}', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) % 100"
)


@register(
    "train_val_test_split",
    survey="M5-text,F10,F11",
    oracle=f"""
    SELECT doc_id, lang,
           CASE WHEN {_BUCKET_DUCK} < 80 THEN 'train'
                WHEN {_BUCKET_DUCK} < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by content-id hash —
    the split is a pure function of doc_id (stable across runs, partitionings
    and engines), the property a training pipeline needs so no document ever
    migrates between splits as the corpus grows. Map-side only: no shuffle,
    no sampling state."""
    d = load_table(spark, sf_dir, "documents")
    bucket = F.expr(_BUCKET_SPARK)
    return d.select(
        "doc_id",
        "lang",
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test").alias("split"),
    )


_CHUNK = 200   # chars per chunk
_STRIDE = 150  # 50-char overlap — the sliding context-window prep for training


@register(
    "document_chunking",
    survey="M5-text,J5,F10",
    oracle=f"""
    SELECT doc_id, CAST(i AS INT) AS chunk_id,
           LENGTH(substr(text, 1 + i * {_STRIDE}, {_CHUNK})) AS chunk_len,
           md5(substr(text, 1 + i * {_STRIDE}, {_CHUNK})) AS chunk_md5
    FROM documents,
         UNNEST(range(0, CAST(CEIL(GREATEST(LENGTH(text) - {_CHUNK}, 0) / {_STRIDE}.0) AS BIGINT) + 1)) AS t(i)
    """,
)
def document_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size chunking ({_CHUNK}-char windows, {_STRIDE}-char
    stride) — the context-window preparation step of a training pipeline, as a
    pure Generate + column expressions (no UDF): chunk count per doc is
    computed map-side, chunks never shuffle."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, CAST(CEIL(GREATEST(LENGTH(text) - {_CHUNK}, 0) / {_STRIDE}.0) AS INT)),"
                f" i -> substring(text, 1 + i * {_STRIDE}, {_CHUNK}))"
            )
        ).alias("chunk_id", "chunk"),
    ).select(
        "doc_id",
        "chunk_id",
        F.length("chunk").alias("chunk_len"),
        F.md5(F.col("chunk").cast("binary")).alias("chunk_md5"),
    )


@register(
    "vocab_top_terms",
    survey="M5-text,A2,O1",
    oracle="""
    SELECT w AS term, COUNT(*) AS freq, COUNT(DISTINCT doc_id) AS doc_freq
    FROM (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents
    )
    WHERE w <> ''
    GROUP BY w
    ORDER BY freq DESC, term
    LIMIT 50
    """,
)
def vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary building: global term + document frequencies, top-50. The
    token explode stays map-side; only (term, partial counts) shuffle (partial
    aggregation), and the top-50 plans TakeOrderedAndProject."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("term")).filter(
        F.col("term") != ""
    )
    return (
        words.groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"), F.countDistinct("doc_id").alias("doc_freq"))
        .orderBy(F.desc("freq"), "term")
        .limit(50)
    )


@register(
    "tfidf_top_terms_per_doc",
    survey="M5-text,W1,A2",
    oracle="""
    WITH words AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents
      ) WHERE w <> ''
    ),
    tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM words GROUP BY doc_id, w),
    df AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY w)
    SELECT doc_id, term, tf, df, rnk FROM (
      SELECT tf.doc_id, tf.w AS term, tf.tf, df.df,
             ROW_NUMBER() OVER (
               PARTITION BY tf.doc_id
               ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC, tf.w
             ) AS rnk
      FROM tf JOIN df ON df.w = tf.w
    ) WHERE rnk <= 3
    """,
)
def tfidf_top_terms_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most distinctive terms per document, ranked by tf/df — the
    monotone-equivalent of tf-idf for a fixed corpus, chosen over tf*ln(N/df)
    because division is exact cross-engine while libm ln() may differ by an
    ulp. df joins broadcast (vocabulary is small relative to the corpus)."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("w")).filter(
        F.col("w") != ""
    )
    tf = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    # df derives from tf (one row per (doc, term) already) — saves re-exploding
    # the corpus for a COUNT(DISTINCT)
    df = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    w_rank = Window.partitionBy("doc_id").orderBy(
        (F.col("tf").cast("double") / F.col("df")).desc(), F.col("w")
    )
    return (
        tf.join(F.broadcast(df), "w")
        .withColumn("rnk", F.row_number().over(w_rank))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", F.col("w").alias("term"), "tf", "df", "rnk")
    )


@register(
    "stratified_sample_per_lang",
    survey="M5-text,W1,O3",
    oracle="""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    ) WHERE rn <= 5
    """,
)
def stratified_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: 5 documents per language, selected by
    content-id hash order — reservoir-sampling semantics (uniform over the
    stratum) but reproducible across runs, partitionings and engines; the
    eval-set carving step of a training pipeline."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.expr("md5(CAST(CAST(doc_id AS STRING) AS BINARY))"), F.col("doc_id")
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "lang")
    )


@register(
    "training_pipeline_e2e",
    survey="M5-text,M5-dedup,A2,F11",
    oracle=f"""
    WITH kept AS (
      SELECT doc_id, lang, text FROM documents
      WHERE LENGTH(text) >= 200
        AND {_occurrences_sql('text', ' ')} + 1 >= 40
        AND {_occurrences_sql('text', 'the ')} >= 1
    ),
    deduped AS (
      SELECT doc_id, lang, text FROM (
        SELECT doc_id, lang, text,
               ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS copy_rank
        FROM kept
      ) WHERE copy_rank = 1
    ),
    chunked AS (
      SELECT doc_id, lang,
             CAST(i AS INT) AS chunk_id,
             substr(text, 1 + i * {_STRIDE}, {_CHUNK}) AS chunk
      FROM deduped,
           UNNEST(range(0, CAST(CEIL(GREATEST(LENGTH(text) - {_CHUNK}, 0) / {_STRIDE}.0) AS BIGINT) + 1)) AS t(i)
    )
    SELECT lang,
           CASE WHEN {_BUCKET_DUCK} < 80 THEN 'train'
                WHEN {_BUCKET_DUCK} < 90 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_chunks,
           COUNT(DISTINCT doc_id) AS n_docs,
           CAST(SUM(LENGTH(chunk)) AS BIGINT) AS total_chars
    FROM chunked
    GROUP BY 1, 2
    """,
)
def training_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data pipeline in one plan: quality gate ->
    exact dedup (keep lowest doc_id per content hash) -> overlapping chunking
    -> deterministic split assignment -> per-(lang, split) corpus stats.
    Demonstrates that the individual operators compose into a single Catalyst
    plan: the gate's filter pushes to the scan, dedup is the only wide shuffle
    of full text, chunking is a Generate, split/statistics aggregate map-side
    partials."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    words = _occurrences("text", " ") + 1
    stop = _occurrences("text", "the ")
    kept = d.filter((F.length("text") >= 200) & (words >= 40) & (stop >= 1))
    w_dedup = Window.partitionBy(F.md5(F.col("text").cast("binary"))).orderBy("doc_id")
    deduped = (
        kept.withColumn("copy_rank", F.row_number().over(w_dedup))
        .filter("copy_rank = 1")
        .select("doc_id", "lang", "text")
    )
    chunked = deduped.select(
        "doc_id",
        "lang",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, CAST(CEIL(GREATEST(LENGTH(text) - {_CHUNK}, 0) / {_STRIDE}.0) AS INT)),"
                f" i -> substring(text, 1 + i * {_STRIDE}, {_CHUNK}))"
            )
        ).alias("chunk_id", "chunk"),
    )
    bucket = F.expr(_BUCKET_SPARK)
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        chunked.withColumn("split", split)
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum(F.length("chunk")).alias("total_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Test-set decontamination (benchmark n-gram overlap)
# ---------------------------------------------------------------------------

_DECON_MOD = 20    # benchmark set = doc_id % 20 == 0 (deterministic 5% holdout)
_DECON_T = 2       # flag a training doc sharing >= T distinct shingles
_DECON_MAX_DF = 10 # stop-shingle guard: ignore shingles in > MAX_DF benchmark docs


@register(
    "decontaminate_against_benchmark",
    survey="M5-dedup,beyond-ref",
    oracle=f"""
    WITH shingled AS (
      SELECT doc_id, md5(sh) AS h FROM (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
      ), UNNEST(range(1, len(w) - {_SHINGLE_W} + 2)) AS t(i),
      LATERAL (SELECT array_to_string(list_slice(w, i, i + {_SHINGLE_W} - 1), ' ') AS sh)
    ),
    sets AS (SELECT DISTINCT doc_id, h FROM shingled),
    bench AS (
      SELECT doc_id AS bench_id, h FROM sets WHERE doc_id % {_DECON_MOD} = 0
    ),
    live AS (
      SELECT h FROM bench GROUP BY h HAVING COUNT(*) <= {_DECON_MAX_DF}
    ),
    hits AS (
      SELECT s.doc_id, b.bench_id, COUNT(*) AS shared_ngrams
      FROM sets s
      JOIN (SELECT b.* FROM bench b JOIN live USING (h)) b USING (h)
      WHERE s.doc_id % {_DECON_MOD} <> 0
      GROUP BY 1, 2
    )
    SELECT doc_id, bench_id, shared_ngrams FROM (
      SELECT doc_id, bench_id, shared_ngrams,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY shared_ngrams DESC, bench_id) AS rn
      FROM hits WHERE shared_ngrams >= {_DECON_T}
    ) WHERE rn = 1
    """,
)
def decontaminate_against_benchmark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set decontamination: flag training documents that share >=T
    distinct word n-grams with any document in a held-out benchmark set
    (deterministic 5% of the corpus here), reporting the worst-offending
    benchmark doc per contaminated training doc.

    100 TB shape — an inverted-index equi-join, not an all-pairs scan: both
    sides shuffle only (md5(shingle), doc_id) rows; per-key fan-out is capped
    by the stop-shingle guard (shingles present in > MAX_DF benchmark docs are
    boilerplate and are dropped BEFORE the join, the same guard real
    decontamination pipelines use), so worst-case join work per shingle is
    bounded. The benchmark side is a ~5% broadcast-unfriendly set at scale, so
    the plan keys the shuffle on the hash — never on raw text."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    w = _SHINGLE_W
    sets = (
        d.select(
            "doc_id",
            F.explode(F.expr(_shingle_expr_spark(w))).alias("sh"),
        )
        .select("doc_id", F.md5(F.col("sh")).alias("h"))
        .distinct()
    )
    is_bench = F.col("doc_id") % _DECON_MOD == 0
    # Stop-shingle guard in one pass over the benchmark side: a windowed
    # count per shingle hash (one shuffle on h) instead of
    # collect_list+size — a boilerplate shingle present in millions of
    # benchmark docs would grow one unbounded array in a single agg buffer,
    # while WindowExec sorts and SPILLS oversized groups.
    per_h = Window.partitionBy("h")
    bench_index = (
        sets.filter(is_bench)
        .withColumn("df", F.count(F.lit(1)).over(per_h))
        .filter(F.col("df") <= _DECON_MAX_DF)
        .select("h", F.col("doc_id").alias("bench_id"))
    )
    hits = (
        sets.filter(~is_bench)
        .join(bench_index, "h")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
        .filter(F.col("shared_ngrams") >= _DECON_T)
    )
    top = Window.partitionBy("doc_id").orderBy(
        F.col("shared_ngrams").desc(), F.col("bench_id")
    )
    return (
        hits.withColumn("rn", F.row_number().over(top))
        .filter(F.col("rn") == 1)
        .select("doc_id", "bench_id", "shared_ngrams")
    )


# ---------------------------------------------------------------------------
# Collocations + within-doc repetition (training-corpus quality signals)
# ---------------------------------------------------------------------------

_PMI_MIN_CNT = 5   # ignore bigrams rarer than this (PMI is noise at low counts)
_PMI_TOPK = 50


@register(
    "bigram_pmi_top",
    survey="M5-text,beyond-ref",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    bigrams AS (
      SELECT w[i] AS w1, w[i + 1] AS w2
      FROM words, UNNEST(range(1, len(w))) AS t(i)
    ),
    bg AS (SELECT w1, w2, COUNT(*) AS c_ab FROM bigrams GROUP BY 1, 2),
    ug AS (
      SELECT u, COUNT(*) AS c FROM (
        SELECT w[i] AS u FROM words, UNNEST(range(1, len(w) + 1)) AS t(i)
      ) GROUP BY 1
    ),
    tot AS (SELECT COUNT(*) AS n FROM bigrams)
    SELECT w1, w2, c_ab, lift, rank FROM (
      SELECT w1, w2, c_ab,
             (CAST(c_ab AS DOUBLE) * CAST(n AS DOUBLE))
               / (CAST(a.c AS DOUBLE) * CAST(b.c AS DOUBLE)) AS lift,
             ROW_NUMBER() OVER (ORDER BY (CAST(c_ab AS DOUBLE) * CAST(n AS DOUBLE))
               / (CAST(a.c AS DOUBLE) * CAST(b.c AS DOUBLE)) DESC, w1, w2) AS rank
      FROM bg JOIN ug a ON a.u = w1 JOIN ug b ON b.u = w2 CROSS JOIN tot
      WHERE c_ab >= {_PMI_MIN_CNT}
    ) WHERE rank <= {_PMI_TOPK}
    """,
)
def bigram_pmi_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top collocations by PMI lift P(ab)/(P(a)P(b)) — the classic phrase
    mining signal. Exactness across engines: counts are integers and the lift
    is a single fixed-shape double expression (IEEE ops are deterministic),
    ranked under a total order.

    100 TB shape: two hash aggs over exploded tokens (map-side partials carry
    (token, count) — never text bodies), unigram table joined twice. The
    unigram side is min-count filtered BEFORE the join — lossless, because a
    surviving bigram (c_ab >= {_PMI_MIN_CNT}) implies both of its unigrams
    occur >= c_ab times, so no qualifying join partner is dropped — which
    cuts the Zipf hapax tail (most of a web corpus's 100M+-term vocabulary)
    from the join side. The broadcast HINT is then size-gated on the
    footer-only document count (``engine.pmi-broadcast-max-docs``, env
    ``CDC_PMI_BROADCAST_MAX_DOCS``): above the gate the joins go through the
    shuffle planner, where AQE still broadcasts if the filtered vocab turns
    out small at runtime — a forced driver-side 100M-row broadcast is the
    failure mode this avoids. The global total is a scalar cross join
    (1 row). Bigram min-count pruning happens before the joins, shrinking
    the probe side first."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    words = d.select(F.split("text", " ").alias("w"))
    # Guard size(w) < 2: sequence(1, 0) is the DESCENDING array [1, 0] in
    # Spark, which would emit two spurious null bigrams per 1-word doc —
    # DuckDB's range(1, len(w)) emits none.
    bigrams = words.select(
        F.explode(
            F.expr(
                "IF(size(w) >= 2,"
                " transform(sequence(1, size(w) - 1),"
                "           i -> struct(w[i-1] AS w1, w[i] AS w2)),"
                " array())"
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    bg = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= _PMI_MIN_CNT)
    )
    ug = (
        words.select(F.explode("w").alias("u"))
        .groupBy("u")
        .agg(F.count(F.lit(1)).alias("c"))
        # lossless vocab prune: a unigram in any surviving bigram has c >= 5
        .filter(F.col("c") >= _PMI_MIN_CNT)
    )
    tot = bigrams.agg(F.count(F.lit(1)).alias("n"))
    a = ug.select(F.col("u").alias("w1"), F.col("c").alias("c_a"))
    b = ug.select(F.col("u").alias("w2"), F.col("c").alias("c_b"))
    n_docs = table_row_count(spark, sf_dir, "documents")  # footer-only
    if n_docs <= get_config().get_int("engine.pmi-broadcast-max-docs"):
        a, b = F.broadcast(a), F.broadcast(b)
    lift = (F.col("c_ab").cast("double") * F.col("n").cast("double")) / (
        F.col("c_a").cast("double") * F.col("c_b").cast("double")
    )
    scored = (
        bg.join(a, "w1")
        .join(b, "w2")
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", "c_ab", lift.alias("lift"))
    )
    w = Window.orderBy(F.col("lift").desc(), "w1", "w2")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _PMI_TOPK)
        .select("w1", "w2", "c_ab", "lift", "rank")
    )


_REP_W = 3          # n-gram width for the repetition signal
_REP_MAX = 0.5      # keep docs whose repeated-ngram fraction is <= this


@register(
    "repetition_filter",
    survey="M5-text,beyond-ref",
    oracle=f"""
    WITH grams AS (
      SELECT doc_id,
             array_to_string(list_slice(w, i, i + {_REP_W} - 1), ' ') AS g
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           UNNEST(range(1, len(w) - {_REP_W} + 2)) AS t(i)
    ),
    per_doc AS (
      SELECT doc_id, COUNT(*) AS total_ngrams,
             COUNT(DISTINCT g) AS distinct_ngrams
      FROM grams GROUP BY doc_id
    )
    SELECT doc_id, total_ngrams, distinct_ngrams,
           1.0 - CAST(distinct_ngrams AS DOUBLE) / CAST(total_ngrams AS DOUBLE)
             AS rep_ratio,
           (1.0 - CAST(distinct_ngrams AS DOUBLE) / CAST(total_ngrams AS DOUBLE))
             <= {_REP_MAX} AS keep
    FROM per_doc
    """,
)
def repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition signal: the fraction of
    {_REP_W}-grams that are repeats of an earlier {_REP_W}-gram in the same
    doc. Highly repetitive documents (boilerplate, generation loops) score
    high and are dropped by the `keep` flag.

    100 TB shape: the n-grams never leave their doc's partition logically —
    one hash agg keyed by doc_id with a distinct-count expansion; no joins,
    no self-comparison. The ratio is one fixed-shape double expression
    (deterministic IEEE), so the filter decision is engine-exact."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    grams = d.select(
        "doc_id",
        F.explode(F.expr(_shingle_expr_spark(_REP_W))).alias("g"),
    )
    per_doc = grams.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("total_ngrams"),
        F.countDistinct("g").alias("distinct_ngrams"),
    )
    rep = F.lit(1.0) - F.col("distinct_ngrams").cast("double") / F.col(
        "total_ngrams"
    ).cast("double")
    return per_doc.select(
        "doc_id",
        "total_ngrams",
        "distinct_ngrams",
        rep.alias("rep_ratio"),
        (rep <= _REP_MAX).alias("keep"),
    )


# PII patterns chosen to behave identically under Java regex (Spark) and RE2
# (DuckDB): plain character classes, bounded quantifiers, no lookaround.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\d{3}-\d{3}-\d{4}"
# every doc gets the same deterministic contaminated suffix so the operator's
# behavior is exercised on each row, not just on corpora that happen to
# contain PII (the oracle appends the identical suffix)
_PII_SUFFIX = " contact: jane.doe@example.org 555-123-4567"


@register(
    "pii_scrub",
    survey="M5-text,F10,beyond-ref",
    oracle=f"""
    WITH c AS (SELECT doc_id, text || '{_PII_SUFFIX}' AS t FROM documents),
    s AS (
      SELECT doc_id, t,
             regexp_replace(regexp_replace(t, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                            '{_PII_PHONE}', '<PHONE>', 'g') AS scrubbed
      FROM c
    )
    SELECT doc_id,
           length(t) - length(regexp_replace(t, '{_PII_EMAIL}', '', 'g'))
             > 0 AS had_email,
           length(t) - length(regexp_replace(t, '{_PII_PHONE}', '', 'g'))
             > 0 AS had_phone,
           md5(scrubbed) AS scrubbed_md5,
           length(scrubbed) AS scrubbed_len
    FROM s
    """,
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — the standard pre-training scrub pass: replace email
    addresses and phone numbers with typed placeholder tokens, reporting
    per-document detection flags and a content hash of the scrubbed text.
    Pure regexp_replace column expressions (JVM codegen, no UDF): at 100 TB
    this is a map-only pass with zero shuffle. Patterns are restricted to the
    regex subset Java and RE2 interpret identically; a deterministic
    contaminated suffix guarantees every row exercises both patterns in both
    engines."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    t = F.concat(F.col("text"), F.lit(_PII_SUFFIX))
    scrubbed = F.regexp_replace(
        F.regexp_replace(t, _PII_EMAIL, "<EMAIL>"), _PII_PHONE, "<PHONE>"
    )
    return d.select(
        "doc_id",
        (F.length(t) - F.length(F.regexp_replace(t, _PII_EMAIL, "")) > 0).alias(
            "had_email"
        ),
        (F.length(t) - F.length(F.regexp_replace(t, _PII_PHONE, "")) > 0).alias(
            "had_phone"
        ),
        # column API, not F.expr: Spark SQL string literals would eat the
        # pattern's backslashes ('\d' -> 'd')
        F.md5(scrubbed.cast("binary")).alias("scrubbed_md5"),
        F.length(scrubbed).alias("scrubbed_len"),
    )


_BPE_TOPK = 20


@register(
    "bpe_merge_step",
    survey="M5-text,beyond-ref",
    oracle=f"""
    WITH words AS (
      SELECT UNNEST(string_split(text, ' ')) AS w FROM documents
    ),
    wf AS (SELECT w, COUNT(*) AS cnt FROM words WHERE len(w) >= 2 GROUP BY w),
    pairs AS (
      SELECT substr(w, i, 2) AS pair, CAST(SUM(cnt) AS BIGINT) AS pair_count
      FROM wf, UNNEST(range(1, len(w))) AS t(i)
      GROUP BY 1
    )
    SELECT pair, pair_count, rank FROM (
      SELECT pair, pair_count,
             ROW_NUMBER() OVER (ORDER BY pair_count DESC, pair) AS rank
      FROM pairs
    ) WHERE rank <= {_BPE_TOPK}
    """,
)
def bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE-training merge-selection step — the core of tokenizer training
    (Sennrich et al. 2016): count every adjacent symbol pair weighted by word
    frequency and rank the merge candidates (the top pair is what BPE would
    merge next; iterating with a symbol-table rewrite IS BPE training, the
    same driver-loop shape as kmeans_update_step). Char-level symbols here;
    the counting plan is the general one.

    100 TB shape: the pair counting runs over the DISTINCT-word frequency
    table, not the corpus — vocabulary is ~log of corpus size, so the
    explode-and-aggregate touches millions of short rows instead of
    billions of documents; all integer arithmetic (exact cross-engine),
    two hash aggregations (word, then pair), one top-k window over the
    pair table (tiny)."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    wf = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    pairs = (
        wf.select(
            F.explode(
                F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
            ).alias("pair"),
            "cnt",
        )
        .groupBy("pair")
        .agg(F.sum("cnt").alias("pair_count"))
    )
    w_rank = Window.orderBy(F.col("pair_count").desc(), F.col("pair"))
    return (
        pairs.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= _BPE_TOPK)
        .select("pair", "pair_count", "rank")
    )


_BPE_US = "chr(31)"  # symbol sentinel (U+001F, never in corpus words): each
# symbol travels as <US>sym<US>, so one left-to-right REPLACE of
# <US>x<US><US>y<US> -> <US>xy<US> merges every adjacent (x, y) occurrence
# in a single pass without consuming a shared boundary — the exact
# greedy-leftmost semantics of a BPE merge pass, identical in Spark and
# DuckDB's replace().

# the recursive-CTE BPE apply shared by both oracles: (word, bpe) per
# distinct word of the corpus, merge ranks identical to bpe_merge_step's
_BPE_APPLY_CTES = f"""
    dw AS (
      SELECT doc_id, source, word FROM (
        SELECT doc_id, source, UNNEST(string_split(text, ' ')) AS word
        FROM documents
      ) WHERE word <> ''
    ),
    wf AS (
      SELECT w, COUNT(*) AS cnt FROM (
        SELECT UNNEST(string_split(text, ' ')) AS w FROM documents
      ) WHERE len(w) >= 2 GROUP BY w
    ),
    merges AS (
      SELECT substr(pair, 1, 1) AS x, substr(pair, 2, 1) AS y, rank FROM (
        SELECT pair, ROW_NUMBER() OVER (ORDER BY pair_count DESC, pair) AS rank
        FROM (SELECT substr(w, i, 2) AS pair, CAST(SUM(cnt) AS BIGINT) AS pair_count
              FROM wf, UNNEST(range(1, len(w))) AS t(i) GROUP BY 1)
      ) WHERE rank <= {_BPE_TOPK}
    ),
    enc0 AS (
      SELECT word,
             array_to_string(list_transform(range(1, length(word) + 1),
               i -> {_BPE_US} || substr(word, CAST(i AS INT), 1) || {_BPE_US}),
               '') AS enc
      FROM (SELECT DISTINCT word FROM dw)
    ),
    ap AS (
      SELECT word, enc, 0 AS r FROM enc0
      UNION ALL
      SELECT ap.word,
             replace(ap.enc,
                     {_BPE_US} || m.x || {_BPE_US} || {_BPE_US} || m.y || {_BPE_US},
                     {_BPE_US} || m.x || m.y || {_BPE_US}),
             ap.r + 1
      FROM ap JOIN merges m ON m.rank = ap.r + 1
    ),
    tok AS (
      SELECT word,
             CAST((LENGTH(enc) - LENGTH(REPLACE(enc, {_BPE_US}, ''))) / 2
                  AS BIGINT) AS bpe
      FROM ap WHERE r = (SELECT COALESCE(MAX(rank), 0) FROM merges)
    )
"""



@register(
    "bpe_apply_token_count",
    survey="M5-text,W1,A2,beyond-ref",
    oracle=f"""
    WITH RECURSIVE {_BPE_APPLY_CTES}
    SELECT dw.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(t.bpe) AS BIGINT) AS bpe_tokens
    FROM dw JOIN tok t USING (word)
    GROUP BY dw.doc_id
    """,
)
def bpe_apply_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY a trained BPE merge list and produce per-document TRUE token
    counts (r8 verdict ask #8 — ``bpe_merge_step`` selects one merge;
    pipelines need the counts an applied merge table yields, which
    whitespace proxies like ``token_count``/``sequence_pack_greedy``
    over- or under-estimate).

    The merge TABLE here is the top-K (_BPE_TOPK=20) first-iteration pair ranking
    (exactly ``bpe_merge_step``'s output — deterministic total order:
    count desc, pair asc); the APPLY machinery is exact for ANY merges
    table: each rank is one left-to-right sentinel-delimited REPLACE over
    the encoded word (see ``_BPE_US`` — a single pass merges all adjacent
    occurrences with greedy-leftmost semantics, and a merged token can
    never re-match its own pair), applied in rank order.

    The published distributed shape (Sennrich et al. 2016 at corpus
    scale): everything per-symbol runs over the DISTINCT-WORD table —
    vocabulary-sized, ~log of corpus size — and only (word -> token count)
    joins back to per-doc word occurrences. The merge constants reach the
    vocab rows via ONE broadcast single-row aggregate (no driver collect,
    no per-rank job); the final join + agg are ordinary hash stages keyed
    on word and doc_id. At 100 TB the corpus-facing work is exactly the
    word explode and one broadcast-join-count — the BPE loop itself never
    touches corpus-sized data."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    dw = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    tok = _bpe_word_tokens(d, dw)
    return dw.join(tok, "word").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("bpe").cast("bigint").alias("bpe_tokens"),
    )


def _bpe_word_tokens(d: DataFrame, dw: DataFrame) -> DataFrame:
    """(word -> bpe token count) over the distinct words of ``dw``, merges
    trained on ``d``'s corpus (see :func:`bpe_apply_token_count` for the
    algorithm and scale notes). Shared by the per-doc count query and the
    per-source fertility report."""
    US = "\x1f"
    wf = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    pairs = (
        wf.select(
            F.explode(
                F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
            ).alias("pair"),
            "cnt",
        )
        .groupBy("pair")
        .agg(F.sum("cnt").alias("pair_count"))
    )
    w_rank = Window.orderBy(F.col("pair_count").desc(), F.col("pair"))
    merges = pairs.withColumn("rank", F.row_number().over(w_rank)).filter(
        F.col("rank") <= _BPE_TOPK
    )
    # ONE row carrying every ranked pair as a column: the whole merge table
    # reaches each vocab row through a single broadcast nested-loop join of
    # a 1-row aggregate (the plan-gate-sanctioned crossJoin shape)
    mrow = merges.agg(
        *[
            F.max(F.when(F.col("rank") == i, F.col("pair"))).alias(f"p{i}")
            for i in range(1, _BPE_TOPK + 1)
        ]
    )
    vocab = dw.select("word").distinct().crossJoin(F.broadcast(mrow))
    enc = F.expr(
        "CASE WHEN length(word) = 0 THEN '' ELSE "
        "concat_ws('', transform(sequence(1, length(word)), "
        f"i -> concat({_BPE_US}, substring(word, i, 1), {_BPE_US}))) END"
    )
    for i in range(1, _BPE_TOPK + 1):
        # a missing rank (tiny corpora) degrades to a no-op replace of a
        # NUL byte no encoded word contains — never a NULL find-string
        enc = F.call_function(
            "replace",
            enc,
            F.when(F.col(f"p{i}").isNull(), F.lit("\x00")).otherwise(
                F.concat(
                    F.lit(US), F.substring(f"p{i}", 1, 1), F.lit(US),
                    F.lit(US), F.substring(f"p{i}", 2, 1), F.lit(US),
                )
            ),
            F.when(F.col(f"p{i}").isNull(), F.lit("")).otherwise(
                F.concat(F.lit(US), F.col(f"p{i}"), F.lit(US))
            ),
        )
    return vocab.select(
        "word",
        (
            (F.length(enc) - F.length(F.call_function("replace", enc, F.lit(US), F.lit(""))))
            / 2
        )
        .cast("bigint")
        .alias("bpe"),
    )




@register(
    "tokenizer_fertility_report",
    survey="M5-text,A2,beyond-ref",
    oracle=f"""
    WITH RECURSIVE {_BPE_APPLY_CTES}
    , chars AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(LENGTH(text)) AS BIGINT) AS n_chars
      FROM documents GROUP BY source
    ),
    toks AS (
      SELECT dw.source,
             CAST(COUNT(*) AS BIGINT) AS ws_tokens,
             CAST(SUM(t.bpe) AS BIGINT) AS bpe_tokens
      FROM dw JOIN tok t USING (word) GROUP BY dw.source
    )
    SELECT c.source, c.n_docs, c.n_chars, t.ws_tokens, t.bpe_tokens,
           CAST(t.bpe_tokens AS DOUBLE) / CAST(t.ws_tokens AS DOUBLE)
             AS fertility,
           CAST(c.n_chars AS DOUBLE) / CAST(t.bpe_tokens AS DOUBLE)
             AS chars_per_token
    FROM chars c JOIN toks t USING (source)
    """,
)
def tokenizer_fertility_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-SOURCE tokenizer diagnostics over the applied BPE counts (the
    report tokenizer teams read before fixing a vocab): fertility
    (BPE tokens per whitespace word — high = the vocab fragments this
    source's words) and chars-per-token (compression — low = wasteful
    tokenization), plus the raw doc/char/token tallies the sampling-weight
    queries (``source_mix_report``, ``temperature_sampling_weights``)
    consume. Exact integers until the two final divisions, so the oracle
    hash-certifies.

    Same scale shape as :func:`bpe_apply_token_count` (the apply runs once
    over the vocabulary); the report itself adds only source-keyed hash
    aggs — a ~tens-of-rows output at any corpus size."""
    # measured r13: fanning (plain or cut) REGRESSES this query (1.4 s ->
    # 1.9-9 s) — the BPE apply tail is vocabulary-sized and join-bound, not
    # scan-bound, so the extra exchange/cut only lengthens the job chain
    d = load_table(spark, sf_dir, "documents")
    dw = d.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    tok = _bpe_word_tokens(d, dw)
    chars = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).cast("bigint").alias("n_chars"),
    )
    toks = (
        dw.join(tok, "word")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("ws_tokens"),
            F.sum("bpe").cast("bigint").alias("bpe_tokens"),
        )
    )
    return chars.join(toks, "source").select(
        "source", "n_docs", "n_chars", "ws_tokens", "bpe_tokens",
        (F.col("bpe_tokens").cast("double") / F.col("ws_tokens").cast("double"))
        .alias("fertility"),
        (F.col("n_chars").cast("double") / F.col("bpe_tokens").cast("double"))
        .alias("chars_per_token"),
    )


def train_bpe_merges(
    words: DataFrame, k: int = _BPE_TOPK
) -> list[tuple[str, str]]:
    """TRUE iterative BPE training (Sennrich et al. 2016) — unlike
    ``bpe_merge_step``'s one-shot first-iteration ranking, each selected
    merge REWRITES the symbol table before the next pair count, so later
    ranks see the merged symbols ((t,h) then (th,e), not (h,e)). Returns
    the merge list in rank order, ready for the sentinel-REPLACE apply
    (:func:`_bpe_word_tokens` semantics) or any external tokenizer.

    ``words``: (w string, cnt long) — the distinct-word frequency table
    (vocabulary-sized; build it once from the corpus). The k-step driver
    loop runs each pair count + argmax + rewrite as Spark jobs over that
    vocabulary — at 100 TB the corpus is touched ONCE to build ``words``;
    training cost is k jobs over millions of vocab rows, never billions of
    documents. Per step only the single best (x, y, count) row reaches the
    driver. Ties break (count desc, x, y) — the same total order the
    one-shot ranking uses. ``localCheckpoint`` truncates the per-step
    lineage so step N's plan doesn't replay steps 1..N-1 — LAZILY (r12,
    guide §1.5/§2.4): an eager checkpoint paid a dedicated job per step
    (2k jobs total, plus one for the final rewrite nobody consumes); a
    lazy one materializes inside the NEXT step's pair-count job — the
    global sort behind ``first()`` computes every partition, so the
    checkpoint is always complete — cutting the loop to k+1 jobs with
    bit-identical merges.

    Greedy-leftmost rewrite as a fold: append each symbol, merging with
    the accumulator's tail when (tail, s) == (x, y) — a merged token can
    never re-match its own pair (xy != x), so one pass per step is exact.
    Rows whose word is fully merged (one symbol left) are dropped from the
    working table permanently: a row can never regain symbols, so it can
    never contribute a pair again — the checkpointed frame only shrinks
    (r12; the returned merge list is provably unchanged)."""
    enc = words.select(
        "cnt",
        F.expr(
            "CASE WHEN length(w) = 0 THEN CAST(array() AS array<string>) "
            "ELSE transform(sequence(1, length(w)), i -> substring(w, i, 1)) "
            "END"
        ).alias("syms"),
    ).filter(F.size("syms") >= 2).transform(materialize_lazy)
    merges: list[tuple[str, str]] = []
    for _ in range(k):
        best = (
            enc.select(
                "cnt",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), i -> "
                        "struct(element_at(syms, i) AS x, "
                        "element_at(syms, i + 1) AS y))"
                    )
                ).alias("p"),
            )
            .groupBy("p.x", "p.y")
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.col("c").desc(), "x", "y")
            .first()
        )
        if best is None:
            break
        merges.append((best.x, best.y))
        x, y = F.lit(best.x), F.lit(best.y)
        merged = F.concat(x, y)
        enc = (
            enc.select(
                "cnt",
                F.aggregate(
                    "syms",
                    F.expr("CAST(array() AS array<string>)"),
                    lambda acc, s: F.when(
                        (F.size(acc) > 0)
                        & (F.element_at(acc, -1) == x)
                        & (s == y),
                        F.concat(
                            F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
                        ),
                    ).otherwise(F.concat(acc, F.array(s))),
                ).alias("syms"),
            )
            .filter(F.size("syms") >= 2)
            .transform(materialize_lazy)
        )
    return merges


_BPE_TRAIN_K = 20  # trained-merge count for the certified trained-apply query


def _bpe_trained_oracle(k: int) -> str:
    """DuckDB oracle for :func:`bpe_trained_apply`: TRUE iterative BPE
    training re-derived IN SQL as a k-times-unrolled CTE chain (one
    pair-count + argmax + sentinel-REPLACE rewrite per step — no recursion,
    no spliced literals: both engines train from scratch under the same
    (count DESC, x, y) total order, so the oracle certifies the trainer's
    rank-for-rank output as well as the apply). The rewrite uses the same
    sentinel string form as the apply; greedy-leftmost non-overlapping
    ``replace`` is exactly the trainer's fold semantics (a merged token
    never re-matches its own pair)."""
    US = _BPE_US
    parts = [
        f"""
    wf AS MATERIALIZED (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT UNNEST(string_split(text, ' ')) AS w FROM documents
      ) WHERE len(w) >= 2 GROUP BY w
    ),
    tenc0 AS MATERIALIZED (
      SELECT w, cnt,
             array_to_string(list_transform(range(1, length(w) + 1),
               i -> {US} || substr(w, CAST(i AS INT), 1) || {US}), '') AS enc
      FROM wf
    )"""
    ]
    for n in range(k):
        parts.append(
            f""",
    pr{n} AS MATERIALIZED (
      SELECT syms[CAST(i AS INT)] AS x, syms[CAST(i AS INT) + 1] AS y,
             CAST(SUM(cnt) AS BIGINT) AS c
      FROM (SELECT cnt,
                   string_split(substr(enc, 2, length(enc) - 2),
                                {US} || {US}) AS syms
            FROM tenc{n}) t,
           UNNEST(range(1, len(syms))) AS u(i)
      GROUP BY 1, 2
    ),
    best{n} AS MATERIALIZED (SELECT x, y FROM pr{n} ORDER BY c DESC, x, y LIMIT 1),
    tenc{n + 1} AS MATERIALIZED (
      SELECT w, cnt,
             replace(enc,
               coalesce((SELECT {US} || x || {US} || {US} || y || {US}
                         FROM best{n}), chr(0)),
               coalesce((SELECT {US} || x || y || {US} FROM best{n}), ''))
               AS enc
      FROM tenc{n}
    )"""
        )
    parts.append(
        f""",
    dw AS (
      SELECT doc_id, word FROM (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents
      ) WHERE word <> ''
    ),
    app0 AS MATERIALIZED (
      SELECT word,
             array_to_string(list_transform(range(1, length(word) + 1),
               i -> {US} || substr(word, CAST(i AS INT), 1) || {US}), '') AS enc
      FROM (SELECT DISTINCT word FROM dw)
    )"""
    )
    for n in range(k):
        parts.append(
            f""",
    app{n + 1} AS MATERIALIZED (
      SELECT word,
             replace(enc,
               coalesce((SELECT {US} || x || {US} || {US} || y || {US}
                         FROM best{n}), chr(0)),
               coalesce((SELECT {US} || x || y || {US} FROM best{n}), ''))
               AS enc
      FROM app{n}
    )"""
        )
    parts.append(
        f""",
    tok AS MATERIALIZED (
      SELECT word,
             CAST((LENGTH(enc) - LENGTH(REPLACE(enc, {US}, ''))) / 2
                  AS BIGINT) AS bpe
      FROM app{k}
    )
    SELECT dw.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(t.bpe) AS BIGINT) AS bpe_tokens
    FROM dw JOIN tok t USING (word)
    GROUP BY dw.doc_id"""
    )
    return "WITH" + "".join(parts)


@register(
    "bpe_trained_apply",
    survey="M5-text,W1,A2,beyond-ref",
    oracle=_bpe_trained_oracle(_BPE_TRAIN_K),
)
def bpe_trained_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts under the TRUE-trained BPE merge list —
    the certified other half of ``bpe_apply_token_count`` (whose merge
    table is the first-iteration single-char pair ranking, documented
    honestly there): :func:`train_bpe_merges` trains k={_BPE_TRAIN_K}
    iterative merges on the vocabulary (later ranks see merged symbols, so
    the list contains MULTI-CHAR symbols — e.g. (m,er), (par,k) on this
    corpus), and the learned list is applied as the same rank-ordered
    sentinel-REPLACE chain over the distinct-word table. The DuckDB oracle
    does not receive the trained list — it RE-DERIVES the identical
    training as a k-times-unrolled SQL chain under the same
    (count DESC, x, y) tie-break, so a single hash match certifies trainer
    and apply together, rank for rank.

    100 TB shape unchanged from the untrained apply: training is k jobs
    over the VOCABULARY (one best-pair row per step to the driver —
    Sennrich et al.'s published loop), the apply runs once per distinct
    word, and only (word -> count) joins back to the corpus-sized
    explode."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    wf = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    merges = train_bpe_merges(wf, k=_BPE_TRAIN_K)
    US = "\x1f"
    dw = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    vocab = dw.select("word").distinct()
    enc = F.expr(
        "CASE WHEN length(word) = 0 THEN '' ELSE "
        "concat_ws('', transform(sequence(1, length(word)), "
        f"i -> concat({_BPE_US}, substring(word, i, 1), {_BPE_US}))) END"
    )
    for x, y in merges:
        # trained symbols are corpus text — they reach the plan as typed
        # literals (F.lit), never spliced into an expression string
        enc = F.call_function(
            "replace",
            enc,
            F.lit(US + x + US + US + y + US),
            F.lit(US + x + y + US),
        )
    tok = vocab.select(
        "word",
        (
            (
                F.length(enc)
                - F.length(F.call_function("replace", enc, F.lit(US), F.lit("")))
            )
            / 2
        )
        .cast("bigint")
        .alias("bpe"),
    )
    return dw.join(tok, "word").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("bpe").cast("bigint").alias("bpe_tokens"),
    )


# ---------------------------------------------------------------------------
# Bloom-filter decontamination (bounded-broadcast benchmark membership)
# ---------------------------------------------------------------------------

_BLOOM_M = 1 << 20  # filter bits (a 128 KiB bitset when packed)
_BLOOM_K = 4        # hash functions = disjoint 7-hex-digit md5 slices
_BLOOM_T = 2        # flag a doc with >= T bloom-positive shingles


def _hex_slice_int(col: str, start: int) -> str:
    """Engine-portable integer value of a 7-hex-digit substring of ``col``.

    ``instr``/``substr`` evaluate identically in Spark SQL and DuckDB, so the
    same expression text serves the query and its oracle (the digit-surgery
    trick the winnowing/simhash oracles already rely on). 7 hex digits keep
    every term < 16^7 = 2^28, inside 32-bit arithmetic in both engines."""
    terms = [
        f"(instr('0123456789abcdef', substr({col}, {start + i}, 1)) - 1) * {16 ** (6 - i)}"
        for i in range(7)
    ]
    return "(" + " + ".join(terms) + ")"


def _bloom_pos_expr(slot: int) -> str:
    return f"({_hex_slice_int('h', 1 + slot * 7)}) % {_BLOOM_M}"


_BLOOM_ORACLE = f"""
    WITH shingled AS (
      SELECT doc_id, sh FROM (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
      ), UNNEST(range(1, len(w) - {_SHINGLE_W} + 2)) AS t(i),
      LATERAL (SELECT array_to_string(list_slice(w, i, i + {_SHINGLE_W} - 1), ' ') AS sh)
    ),
    hashed AS (SELECT DISTINCT doc_id, md5(sh) AS h FROM shingled),
    pos AS (
      SELECT doc_id, h, slot,
             CASE slot
               WHEN 0 THEN {_bloom_pos_expr(0)}
               WHEN 1 THEN {_bloom_pos_expr(1)}
               WHEN 2 THEN {_bloom_pos_expr(2)}
               ELSE {_bloom_pos_expr(3)}
             END AS p
      FROM hashed, (VALUES (0), (1), (2), (3)) AS s(slot)
    ),
    bench AS (SELECT DISTINCT p FROM pos WHERE doc_id % {_DECON_MOD} = 0),
    probe AS (
      SELECT pos.doc_id, pos.h, COUNT(bench.p) AS k_hit
      FROM pos LEFT JOIN bench ON pos.p = bench.p
      WHERE pos.doc_id % {_DECON_MOD} <> 0
      GROUP BY pos.doc_id, pos.h
    )
    SELECT doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN k_hit = {_BLOOM_K} THEN 1 ELSE 0 END) AS BIGINT)
             AS bloom_hits,
           CAST(CASE WHEN SUM(CASE WHEN k_hit = {_BLOOM_K} THEN 1 ELSE 0 END)
                          >= {_BLOOM_T} THEN 1 ELSE 0 END AS INT) AS contaminated
    FROM probe GROUP BY doc_id
"""


@register(
    "bloom_decontaminate",
    survey="M5-dedup,J3,A2,beyond-ref",
    oracle=_BLOOM_ORACLE,
)
def bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination through a Bloom filter instead of an
    inverted-index join: each 8-word shingle hashes to ``k=4`` bit positions
    (disjoint 7-hex-digit slices of its md5, mod ``m=2^20``); a training
    shingle is bloom-positive iff ALL four positions were set by some
    benchmark shingle, and a doc with >= 2 positive shingles is flagged.

    Why this exists next to ``decontaminate_against_benchmark``: the
    inverted-index join shuffles (hash, doc_id) rows for BOTH corpora, which
    is exact but pays a full shuffle of the training side. The Bloom probe's
    build side is AT MOST ``m`` distinct int positions — bounded by the
    filter's constant size no matter how many benchmark docs exist — so it is
    broadcastable BY CONSTRUCTION at any corpus scale, and the probe is a
    map-side broadcast join followed by a partial-agg-friendly per-doc count:
    the 100 TB training corpus is never shuffled. The price is the documented
    false-positive rate ((1 - e^{-kn/m})^k); the hashing is deterministic md5
    slicing, so the DuckDB oracle reproduces membership bit-for-bit (false
    positives included).

    Ref parity anchor: the reference has no decontamination surface; this is
    the beyond-reference training-pipeline family (SURVEY §7 M5)."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    hashed = (
        d.select(
            "doc_id", F.explode(F.expr(_shingle_expr_spark(_SHINGLE_W))).alias("sh")
        )
        .select("doc_id", F.expr("md5(CAST(sh AS BINARY))").alias("h"))
        .distinct()
    )
    stack_args = ", ".join(f"{s}, {_bloom_pos_expr(s)}" for s in range(_BLOOM_K))
    pos = hashed.selectExpr(
        "doc_id", "h", f"stack({_BLOOM_K}, {stack_args}) AS (slot, p)"
    )
    bench_bits = (
        pos.filter(F.col("doc_id") % _DECON_MOD == 0)
        .select(F.col("p").alias("bp"))
        .distinct()
    )
    probe = (
        pos.filter(F.col("doc_id") % _DECON_MOD != 0)
        .join(F.broadcast(bench_bits), F.col("p") == F.col("bp"), "left")
        .groupBy("doc_id", "h")
        .agg(F.count("bp").alias("k_hit"))
    )
    positive = F.sum(F.when(F.col("k_hit") == _BLOOM_K, 1).otherwise(0))
    return (
        probe.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            positive.cast("bigint").alias("bloom_hits"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "bloom_hits",
            (F.col("bloom_hits") >= _BLOOM_T).cast("int").alias("contaminated"),
        )
    )
