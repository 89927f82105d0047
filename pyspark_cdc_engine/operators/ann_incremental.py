"""Incremental IVF ANN index maintenance — the vector-search sibling of
:class:`pyspark_cdc_engine.operators.dedup_incremental.IncrementalLshIndex`.

A similarity-search deployment over a growing embedding corpus must not
re-assign 100 TB of vectors because one day's embeddings arrived.
:class:`IncrementalIvfIndex` keeps a deltalite ASSIGNMENT TABLE
(``vec_id, centroid_id`` — two integers per vector, the inverted-file lists
of IVF) current from a deltalite embeddings table's change feed: the
centroid set is FROZEN at build time (trained once, persisted next to the
index — exactly how production IVF works: FAISS trains the coarse quantizer
once and add() never moves it), so each refresh folds ONLY what new commits
changed. Appends fold as assignment APPENDS; DV/predicate DELETEs fold as
assignment-row DELETIONS (the feed enumerates the tombstoned vec_ids
row-exactly — one broadcast MERGE, never a corpus rescan); UPDATEs and DV
MERGEs fold as re-assignments of the postimage rows (the
``signed_fold_safe`` surface). Only a commit the feed cannot express — cow
MERGE without CDF, RESTORE — or an OVERWRITE (one rebuild scan beats a
2x-table signed fold) forces one full rebuild WITH RE-TRAINED centroids,
the same contract as ``IncrementalLshIndex``, whose crash-idempotent
watermark pattern (``refresh_upto`` commits + txn tags) this class reuses.

Correctness anchor: a vector's assignment depends only on its own embedding
and the frozen centroids, so per-commit assignment composes — the
incrementally built assignment table is ROW-IDENTICAL to one recomputed
from scratch against the same centroids. The registered
``ann_ivf_incremental`` query exploits exactly that: it builds the index
over a base corpus (which contains the centroid seed vectors), appends a
late delta, refreshes, and answers the fixed query panel with an
``nprobe``-probe search over the maintained index — certified against the
SAME from-scratch multiprobe DuckDB oracle as ``ann_ivf_multiprobe``.

Index sizing at scale: one (int64, int32) row per vector — ~12 bytes,
hash-partitionable on ``centroid_id`` so each probe reads only its
inverted lists; candidate re-ranking joins embeddings back from the BASE
table by id (the index never duplicates vector payloads).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_cdc_engine.operators.dedup_scale import (
    _PQ_K,
    _PQ_T,
    _pq_train_ctes_duck,
    _ASSIGN_CTE_DUCK,
    _DEC,
    _DOT_DEC_SPARK,
    _IDOT_SCALE,
    _IVF_C,
    _IVF_K,
    _IVF_NPROBE,
    _IVF_QUERIES,
    _KM_ITERS,
    _NORMS_CTE_DUCK,
    _dot_duck,
    _idot_duck,
    _kmeans_ctes_duck,
    _norm2_dec,
)
from pyspark_cdc_engine.operators.registry import fan_out, load_table, register
from pyspark_cdc_engine.tables import (
    DeltaliteTable,
    MergeClause,
    NoChangesInWindow,
    RetentionPrunedWindow,
)


def assign_to_centroids(
    vectors: DataFrame,
    centroids: DataFrame,
    norms: DataFrame | None = None,
) -> DataFrame:
    """(vec_id, centroid_id): every vector of ``vectors`` (vec_id, embedding)
    tagged with its nearest centroid from ``centroids`` (centroid_id, cemb) —
    the generalized form of ``_ivf_assigned_df``'s kernel, against an
    EXPLICIT centroid frame instead of the first-C convention.

    Same fully-relational fixed-point argmax: posexplode components,
    broadcast-join the exploded centroids on position, integer-sum the
    floor-scaled term products, ``max_by`` with the (similarity desc,
    centroid_id asc) tie-break — whole-stage codegen end to end, and
    bit-identical to the oracle's window-over-cross-join formulation.

    Norms come from a codegen DECIMAL hash agg over the SAME exploded
    components (sum of the identical 12-dp x^2 terms — exactly equal to
    the ``aggregate()`` HOF fold, order-independent decimal either way).
    The HOF form is interpreted, and projection collapse pushes it BELOW
    the explode, re-evaluating the whole fold once per exploded row —
    measured 7.1 s vs 1.0 s per assignment on the sf0.1 corpus.

    ``norms`` — optional precomputed (vec_id, norm2 double) frame. Norms
    are input-invariant, so an iterative caller (Lloyd's loop: one
    assignment per round) passes a materialized norm table computed ONCE
    instead of paying a corpus-scan norm agg per round (r12, guide §2.4:
    the norm sub-aggregate was an iteration-invariant shuffle repeated
    every iteration). Must contain exactly the norm2 this function would
    derive — callers reuse the same exploded-sum expression."""
    sq = F.expr(f"CAST(CAST(val AS DOUBLE) * CAST(val AS DOUBLE) AS {_DEC})")
    csq = F.expr(
        f"CAST(CAST(cval AS DOUBLE) * CAST(cval AS DOUBLE) AS {_DEC})"
    )
    ex = vectors.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    )
    cex = centroids.select(
        "centroid_id", F.posexplode("cemb").alias("pos", "cval")
    )
    if norms is None:
        norms = ex.groupBy("vec_id").agg(
            F.sum(sq).cast("double").alias("norm2")
        )
    cns = cex.groupBy("centroid_id").agg(
        F.sum(csq).cast("double").alias("cn2")
    )
    term = F.expr(
        f"CAST(floor(CAST(val AS DOUBLE) * CAST(cval AS DOUBLE) * {_IDOT_SCALE}) AS BIGINT)"
    )
    dots = (
        ex.join(F.broadcast(cex), "pos")
        .groupBy("vec_id", "centroid_id")
        .agg(F.sum(term).cast("double").alias("dot"))
    )
    return (
        dots.join(F.broadcast(cns), "centroid_id")
        .join(norms, "vec_id")
        .withColumn("csim", F.col("dot") / F.sqrt(F.col("norm2") * F.col("cn2")))
        .groupBy("vec_id")
        .agg(
            F.expr(
                "max_by(centroid_id, named_struct('s', csim, 'c', -centroid_id))"
            ).alias("centroid_id")
        )
    )


class _ChangeFeedIndex:
    """Watermark + refresh skeleton shared by the change-feed-maintained
    vector indexes (:class:`IncrementalIvfIndex`'s assignment table,
    :class:`IncrementalPqCodes`' codes table). Subclasses provide
    ``_index`` (the maintained deltalite table), ``_txn_app``,
    ``_rebuild(upto)`` and ``_fold_changes(changed, upto, insert_only)``;
    this class
    owns the crash-idempotent watermark bookkeeping and the
    signed-fold-vs-rebuild decision, so every index answers "what changed
    since I last looked?" identically."""

    base: DeltaliteTable

    @property
    def _index(self) -> DeltaliteTable:
        raise NotImplementedError

    @property
    def _txn_app(self) -> str:
        raise NotImplementedError

    def last_refreshed_version(self) -> int:
        if not self._index.exists():
            return -1
        upto = -1
        for commit in self._index.history():
            if "refresh_upto" in commit:
                upto = int(commit["refresh_upto"])
                break
        folded = self._index.last_txn_version(self._txn_app)
        if folded is not None:
            upto = max(upto, folded)
        return upto

    def _record_watermark(self, upto: int) -> None:
        base_v, commit = self._index._snapshot()
        extra = {"refresh_upto": upto}
        if commit.get("schema"):
            extra["schema"] = commit["schema"]
        self._index._write_commit(
            "refresh", commit["live"], extra, base_v, commit
        )

    def refresh(self) -> int:
        """Index every base commit newer than the watermark. Every commit
        whose exact change rows the feed reconstructs folds O(delta)
        (``signed_fold_safe``): appends fold as index APPENDS; DV/predicate
        DELETEs fold as index-row DELETIONS (the deleted vec_ids are
        enumerated row-exactly by the change feed — no reason to rescan
        100 TB because one commit tombstoned a day of vectors); UPDATEs and
        DV MERGEs fold as re-derivations of the postimage rows. Only
        commits the feed cannot express — cow MERGE without CDF, RESTORE —
        or an OVERWRITE (where one rebuild scan beats a 2x-table signed
        fold) force a full rebuild (with re-training, where the index
        trains). Returns the new watermark."""
        from pyspark_cdc_engine.incremental import (
            signed_fold_safe,
            window_insert_only,
        )

        upto = self.base.latest_version()
        since = self.last_refreshed_version()
        if since >= upto:
            return since
        history = self.base.history()
        incremental_safe = since >= 0 and signed_fold_safe(
            history, since, upto, {"vec_id", "embedding"}
        )
        if not incremental_safe:
            self._rebuild(upto)
            return upto
        try:
            changed = self.base.read_changes(since, upto)
        except NoChangesInWindow:  # physical-only commits: nothing to fold
            self._record_watermark(upto)
            return upto
        except RetentionPrunedWindow:
            # pruned feed window: the safety gate walked only surviving
            # history, so rebuilding is the only sound move (same contract
            # as IncrementalLshIndex.refresh)
            self._rebuild(upto)
            return upto
        self._fold_changes(
            changed, upto, insert_only=window_insert_only(history, since, upto)
        )
        self._record_watermark(upto)
        return upto


class IncrementalIvfIndex(_ChangeFeedIndex):
    """Maintains the IVF assignment table of a deltalite embeddings table
    incrementally from its change feed (module docstring has the contract).

    ``n_centroids`` vectors are sampled deterministically at (re)build time
    — the first C ``vec_id``s of the snapshot, the same training-free seed
    as ``ann_ivf_bucketed`` — and persisted under ``<index>/centroids`` so
    every later fold assigns against the exact set the existing lists used.
    ``train_iters > 0`` runs that many Lloyd's iterations
    (:func:`~pyspark_cdc_engine.operators.dedup_scale.train_kmeans`) over
    the snapshot at (re)build time — the FAISS train-once contract with an
    actually TRAINED coarse quantizer; folds still never move it.
    ``train_sample_stride > 1`` trains on the deterministic
    every-stride-th subsample (the FAISS train-on-a-sample scale path —
    see ``train_kmeans``); assignment always covers the full snapshot.
    """

    def __init__(
        self,
        spark: SparkSession,
        base: DeltaliteTable,
        index_path: str,
        n_centroids: int = _IVF_C,
        train_iters: int = 0,
        train_sample_stride: int = 1,
    ) -> None:
        self.spark = spark
        self.base = base
        self.n_centroids = n_centroids
        self.train_iters = train_iters
        self.train_sample_stride = train_sample_stride
        self.assign = DeltaliteTable(spark, index_path.rstrip("/") + "/assign")
        self.cents = DeltaliteTable(spark, index_path.rstrip("/") + "/centroids")

    @property
    def _index(self) -> DeltaliteTable:
        return self.assign

    @property
    def _txn_app(self) -> str:
        return f"ivf:{self.assign.path}"

    def centroids(self) -> DataFrame:
        return self.cents.read()

    def _rebuild(self, upto: int) -> None:
        """Full rebuild: re-train centroids from the snapshot (first-C seed
        + ``train_iters`` Lloyd's rounds — 0 keeps the training-free seed),
        overwrite both tables. Centroids land FIRST — a crash between the
        two overwrites leaves assignments stale behind the watermark, and
        the retry re-runs both (overwrites are idempotent)."""
        from pyspark_cdc_engine.operators.dedup_scale import (
            _corpus_norms,
            train_kmeans,
        )

        snap = self.base.read(version=upto).select("vec_id", "embedding")
        # Trained rebuilds share ONE materialized norm table between the
        # Lloyd's rounds and the final full-corpus assignment — with
        # norms=None each side aggregated the same iteration-invariant
        # corpus norm independently (r12, guide §2.4). Untrained rebuilds
        # (train_iters=0) keep the inline norm agg: training never reads
        # norms there, so a shared table would only add an eager cut.
        norms = _corpus_norms(snap) if self.train_iters > 0 else None
        self.cents.overwrite(
            train_kmeans(
                snap,
                self.n_centroids,
                self.train_iters,
                sample_stride=self.train_sample_stride,
                norms=norms,
            )
        )
        self.assign.overwrite(
            assign_to_centroids(snap, self.cents.read(), norms=norms),
            txn_app=self._txn_app,
            txn_version=upto,
        )
        self._record_watermark(upto)

    def _fold_changes(
        self, changed: DataFrame, upto: int, insert_only: bool = False
    ) -> None:
        """One MERGE folding a change-feed window into the assignment
        table: per-vec_id net effect (the replication netting — last state
        wins, preimages dropped), surviving upserts assigned against the
        FROZEN centroids, net deletes removed. An append-only window
        degenerates to pure inserts — the same O(delta) append as before,
        now one code path for the whole signed surface."""
        from pyspark_cdc_engine.streaming.replicate import net_changes

        # Insert-only windows (the overwhelmingly common case: appends)
        # keep the plain APPEND path — one write, base assignment dirs
        # never touched. ``insert_only`` comes from the commit log
        # (window_insert_only), not from scanning the feed for its distinct
        # change kinds — that distinct was one full delta pass per refresh
        # answering a question the log metadata already answers (r12).
        if insert_only:
            self.assign.append(
                assign_to_centroids(
                    changed.select("vec_id", "embedding"), self.cents.read()
                ),
                txn_app=self._txn_app,
                txn_version=upto,
            )
            return
        net = net_changes(
            changed.select(
                "vec_id", "embedding",
                "_change_type", "_commit_version", "_commit_timestamp",
            ),
            ["vec_id"],
        ).persist()
        try:
            ctype = dict(self.cents.read().dtypes)["centroid_id"]
            ups = assign_to_centroids(
                net.filter(F.col("__op") == "U").select("vec_id", "embedding"),
                self.cents.read(),
            ).withColumn("__op", F.lit("U"))
            dels = (
                net.filter(F.col("__op") == "D")
                .select("vec_id")
                .withColumn("centroid_id", F.lit(None).cast(ctype))
                .withColumn("__op", F.lit("D"))
            )
            delta = ups.unionByName(dels)
            self.assign.merge(
                delta,
                "target.vec_id = source.vec_id",
                [
                    MergeClause("delete", condition="source.__op = 'D'"),
                    MergeClause(
                        "update",
                        condition=None,
                        assignments={"centroid_id": "source.centroid_id"},
                    ),
                    # an unmatched 'D' (vector inserted and deleted within
                    # the window) correctly applies as nothing
                    MergeClause(
                        "insert",
                        condition="source.__op = 'U'",
                        assignments={
                            "vec_id": "source.vec_id",
                            "centroid_id": "source.centroid_id",
                        },
                    ),
                ],
                prune_on="vec_id",
                txn_app=self._txn_app,
                txn_version=upto,
            )
        finally:
            net.unpersist()

    def search(
        self,
        queries: DataFrame,
        k: int = _IVF_K,
        nprobe: int = _IVF_NPROBE,
    ) -> DataFrame:
        """Top-``k`` cosine neighbors for each row of ``queries``
        (query_id, qemb) via ``nprobe``-probe IVF over the MAINTAINED index:
        rank-P nearest frozen centroids per query (the probe table is
        |queries| x P rows — always the broadcast side), inverted-list
        candidates from the assignment table, embeddings re-joined from the
        BASE table by id, exact-decimal cosine re-rank. A query that is
        itself an indexed vector never returns itself. Deterministic
        (cos desc, neighbor_id) tie-break — oracle-checkable like every ANN
        kernel here."""
        q = queries.select(
            "query_id",
            "qemb",
            F.expr(f"CAST({_norm2_dec('qemb')} AS DOUBLE)").alias("qn2"),
        )
        cex = self.cents.read().select(
            "centroid_id",
            F.expr(f"CAST({_norm2_dec('cemb')} AS DOUBLE)").alias("cn2"),
            F.posexplode("cemb").alias("pos", "cval"),
        )
        ex = q.select(
            "query_id", "qn2", F.posexplode("qemb").alias("pos", "val")
        )
        term = F.expr(
            f"CAST(floor(CAST(val AS DOUBLE) * CAST(cval AS DOUBLE) * {_IDOT_SCALE}) AS BIGINT)"
        )
        dots = (
            ex.join(F.broadcast(cex), "pos")
            .groupBy("query_id", "centroid_id")
            .agg(
                F.sum(term).cast("double").alias("dot"),
                F.first("qn2").alias("qn2"),
                F.first("cn2").alias("cn2"),
            )
        )
        wp = Window.partitionBy("query_id").orderBy(
            (F.col("dot") / F.sqrt(F.col("qn2") * F.col("cn2"))).desc(),
            F.col("centroid_id"),
        )
        probes = (
            dots.withColumn("prank", F.row_number().over(wp))
            .filter(F.col("prank") <= nprobe)
            .select("query_id", "centroid_id")
        )
        probe_q = q.join(probes, "query_id")
        cand_ids = self.assign.read().join(
            F.broadcast(probe_q), "centroid_id"
        )
        emb = self.base.read().withColumn(
            "norm2", F.expr(f"CAST({_norm2_dec('embedding')} AS DOUBLE)")
        )
        dot_qc = _DOT_DEC_SPARK.format(a="qemb", b="embedding")
        scored = (
            cand_ids.join(emb.select("vec_id", "embedding", "norm2"), "vec_id")
            .filter(F.col("vec_id") != F.col("query_id"))
            .withColumn(
                "cos_sim", F.expr(dot_qc) / F.sqrt(F.col("qn2") * F.col("norm2"))
            )
            .select("query_id", F.col("vec_id").alias("neighbor_id"), "cos_sim")
        )
        wr = Window.partitionBy("query_id").orderBy(
            F.col("cos_sim").desc(), F.col("neighbor_id")
        )
        return (
            scored.withColumn("rank", F.row_number().over(wr))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cos_sim")
        )


@register(
    "ann_ivf_incremental",
    survey="M5-ann,beyond-ref,S3,W1,O1",
    oracle=f"""
    WITH {_NORMS_CTE_DUCK},
    {_ASSIGN_CTE_DUCK.format(dot=_idot_duck('n.embedding', 'c.cemb'))},
    qp AS (SELECT vec_id AS query_id, embedding AS qemb, norm2 AS qn2, centroid_id
           FROM assign_scored
           WHERE vec_id < {_IVF_QUERIES} AND rn <= {_IVF_NPROBE}),
    scored AS (
      SELECT qp.query_id, c.vec_id AS neighbor_id,
             {_dot_duck('qp.qemb', 'c.embedding')} / SQRT(qp.qn2 * c.norm2) AS cos_sim
      FROM qp JOIN assigned c
        ON c.centroid_id = qp.centroid_id AND c.vec_id <> qp.query_id
    )
    SELECT query_id, neighbor_id, rank, cos_sim FROM (
      SELECT query_id, neighbor_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= {_IVF_K}
    """,
)
def ann_ivf_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiprobe ANN answered from an INCREMENTALLY MAINTAINED IVF index:
    the corpus lands as a deltalite table in two commits — a base (3/4,
    containing the first-C centroid seed) and a late-arriving delta
    (vec_id % 4 == 0 above the seed) — the index is built over the base,
    and a second refresh folds ONLY the delta's data dirs into the
    inverted lists against the FROZEN centroids. The query panel's answers
    over the maintained index must equal a from-scratch multiprobe
    derivation over the full corpus, which is exactly what the oracle does
    (same CTE chain as ``ann_ivf_multiprobe``) — certifying centroid
    freezing, O(delta) assignment folding, the watermark bookkeeping, and
    the probe/re-rank search path in one driver-checked number set. This
    is the CDC-side MV-refresh machinery driving the ANN-side index, the
    vector twin of ``minhash_lsh_incremental``."""
    from pyspark_cdc_engine.operators.dedup_incremental import (
        _fresh_scratch_dir,
    )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    tmp = _fresh_scratch_dir(f"ivf:{sf_dir}")
    base_tbl = DeltaliteTable(spark, f"{tmp}/embs")
    base_tbl.overwrite(
        e.filter((F.col("vec_id") % 4 != 0) | (F.col("vec_id") < _IVF_C))
    )
    idx = IncrementalIvfIndex(spark, base_tbl, f"{tmp}/ivf_index")
    idx.refresh()
    base_tbl.append(
        e.filter((F.col("vec_id") % 4 == 0) & (F.col("vec_id") >= _IVF_C))
    )
    idx.refresh()
    queries = (
        base_tbl.read()
        .filter(F.col("vec_id") < _IVF_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qemb")
        )
    )
    return idx.search(queries, k=_IVF_K, nprobe=_IVF_NPROBE)


_DEL_OFFSET = 10_000_000  # synthetic vec_ids for the delete-fold scenario


@register(
    "ann_ivf_incremental_delete",
    survey="M5-ann,beyond-ref,S3,J4,W1,O1",
    oracle=f"""
    WITH {_NORMS_CTE_DUCK},
    {_ASSIGN_CTE_DUCK.format(dot=_idot_duck('n.embedding', 'c.cemb'))},
    qp AS (SELECT vec_id AS query_id, embedding AS qemb, norm2 AS qn2, centroid_id
           FROM assign_scored
           WHERE vec_id < {_IVF_QUERIES} AND rn <= {_IVF_NPROBE}),
    scored AS (
      SELECT qp.query_id, c.vec_id AS neighbor_id,
             {_dot_duck('qp.qemb', 'c.embedding')} / SQRT(qp.qn2 * c.norm2) AS cos_sim
      FROM qp JOIN assigned c
        ON c.centroid_id = qp.centroid_id AND c.vec_id <> qp.query_id
    )
    SELECT query_id, neighbor_id, rank, cos_sim FROM (
      SELECT query_id, neighbor_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= {_IVF_K}
    """,
)
def ann_ivf_incremental_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O(delta) DELETE folding in the maintained IVF index: the corpus
    plus a batch of synthetic distractor vectors (shifted copies at
    vec_id >= {_DEL_OFFSET}) lands as one table, the index is built over
    all of it, then a DV DELETE tombstones the distractors and the next
    refresh FOLDS those deletions — the change feed enumerates the
    deleted vec_ids row-exactly, so the fold is one broadcast MERGE
    removing their assignment rows, never a corpus rescan or a centroid
    re-train (the distractors' ids sit above the first-C seed, so the
    frozen centroids are the corpus' own). The post-delete index answers
    the query panel; the oracle is the from-scratch multiprobe derivation
    over the PLAIN corpus — a hash match certifies the deletions really
    left the inverted lists and nothing else moved. Rebuild-fallback for
    feeds the netting cannot express stays covered by pytest."""
    from pyspark_cdc_engine.operators.dedup_incremental import (
        _fresh_scratch_dir,
    )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    extras = e.filter(F.col("vec_id") % 3 == 1).select(
        (F.col("vec_id") + _DEL_OFFSET).alias("vec_id"), "embedding"
    )
    tmp = _fresh_scratch_dir(f"ivfdel:{sf_dir}")
    base_tbl = DeltaliteTable(spark, f"{tmp}/embs")
    base_tbl.overwrite(e.unionByName(extras))
    idx = IncrementalIvfIndex(spark, base_tbl, f"{tmp}/ivf_index")
    idx.refresh()
    base_tbl.delete(f"vec_id >= {_DEL_OFFSET}", mode="dv")
    idx.refresh()
    queries = (
        base_tbl.read()
        .filter(F.col("vec_id") < _IVF_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qemb")
        )
    )
    return idx.search(queries, k=_IVF_K, nprobe=_IVF_NPROBE)


@register(
    "ann_ivf_trained_incremental",
    survey="M5-ann,beyond-ref,S3,W1,O1",
    oracle=f"""
    WITH {_NORMS_CTE_DUCK},
    norms_base AS (
      SELECT * FROM norms WHERE (vec_id % 4 <> 0) OR vec_id < {_IVF_C}
    ),
    {_kmeans_ctes_duck(_KM_ITERS, train_src="norms_base")},
    qp AS (SELECT vec_id AS query_id, embedding AS qemb, norm2 AS qn2, centroid_id
           FROM tassign_scored
           WHERE vec_id < {_IVF_QUERIES} AND rn <= {_IVF_NPROBE}),
    scored AS (
      SELECT qp.query_id, c.vec_id AS neighbor_id,
             {_dot_duck('qp.qemb', 'c.embedding')} / SQRT(qp.qn2 * c.norm2)
               AS cos_sim
      FROM qp JOIN tassigned c
        ON c.centroid_id = qp.centroid_id AND c.vec_id <> qp.query_id
    )
    SELECT query_id, neighbor_id, rank, cos_sim FROM (
      SELECT query_id, neighbor_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= {_IVF_K}
    """,
)
def ann_ivf_trained_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained quantizer under the FAISS train-once contract, end to
    end: the index builds over a base corpus (3/4, containing the first-C
    seed) with ``train_iters`` Lloyd's rounds, a late delta appends, and
    the refresh folds the delta's assignments against the FROZEN TRAINED
    centroids — never re-training on a fold. The oracle re-derives the
    exact split: the unrolled k-means CTE chain TRAINS on the base subset
    (``train_src="norms_base"``) while the final assignment covers the
    whole corpus, then answers the query panel with the trained multiprobe
    search. A hash match certifies trainer, centroid freezing, O(delta)
    folding, and the probe/re-rank path in one driver-checked number set —
    the composition of ``ann_ivf_trained`` and ``ann_ivf_incremental``."""
    from pyspark_cdc_engine.operators.dedup_incremental import (
        _fresh_scratch_dir,
    )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    tmp = _fresh_scratch_dir(f"ivftrained:{sf_dir}")
    base_tbl = DeltaliteTable(spark, f"{tmp}/embs")
    base_tbl.overwrite(
        e.filter((F.col("vec_id") % 4 != 0) | (F.col("vec_id") < _IVF_C))
    )
    idx = IncrementalIvfIndex(
        spark, base_tbl, f"{tmp}/ivf_index", train_iters=_KM_ITERS
    )
    idx.refresh()
    base_tbl.append(
        e.filter((F.col("vec_id") % 4 == 0) & (F.col("vec_id") >= _IVF_C))
    )
    idx.refresh()
    queries = (
        base_tbl.read()
        .filter(F.col("vec_id") < _IVF_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qemb")
        )
    )
    return idx.search(queries, k=_IVF_K, nprobe=_IVF_NPROBE)


# ---------------------------------------------------------------------------
# Incremental PQ codes — the product-quantization sibling of
# IncrementalIvfIndex: a (vec_id, m, code) table maintained O(delta) from
# the embeddings change feed against codebooks FROZEN at build time
# (FAISS's IndexIVFPQ add() contract: train once, encode forever).
# ---------------------------------------------------------------------------


def encode_pq(vectors: DataFrame, codebook: DataFrame) -> DataFrame:
    """(vec_id, m, code, dist2): nearest sub-centroid per (vector,
    subspace) against an explicit long-form codebook (m, k, pos, cval) —
    the encode kernel of ``pq_trained_encode`` factored over an arbitrary
    frame. ``dist2`` stays DECIMAL end-to-end so any downstream
    reconstruction-error sum is exact (the floor-scale lesson: never let a
    per-engine rounding choice into a stored number)."""
    from pyspark_cdc_engine.operators.dedup_scale import _pq_d2_vs

    # fan_out: ×(dim·K) encode work per vector — see assign_to_centroids
    ex = fan_out(vectors).select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).withColumn("val", F.col("val").cast("double"))
    return (
        _pq_d2_vs(ex, codebook)
        .groupBy("vec_id", "m")
        .agg(
            F.expr(
                "min_by(k, named_struct('d', CAST(dist2 AS DOUBLE), 'k', k))"
            ).alias("code"),
            F.min("dist2").alias("dist2"),
        )
    )


class IncrementalPqCodes(_ChangeFeedIndex):
    """PQ-codes table of a deltalite embeddings table, maintained O(delta)
    from its change feed. Codebooks are trained at (re)build time
    (:func:`~pyspark_cdc_engine.operators.dedup_scale.train_pq_codebooks_from`,
    ``n_iters`` per-subspace Lloyd's rounds over the snapshot — 0 keeps the
    first-K seed) and persisted under ``<index>/codebook``; every later
    fold ENCODES against that exact frozen codebook, so the incrementally
    built codes table is row-identical to a from-scratch encode (a
    vector's code depends only on its own embedding and the codebook).
    Appends fold as code APPENDS, DV/predicate DELETEs as code-row
    DELETIONS, UPDATEs as re-encodes of the postimage — the same
    ``signed_fold_safe`` surface as :class:`IncrementalIvfIndex`; anything
    the feed cannot express rebuilds WITH re-trained codebooks.

    Index sizing at scale: ``_PQ_M`` (int, tinyint) rows per vector — the
    compressed representation IS the index; ADC search never touches the
    embedding payloads except for the |queries| side."""

    def __init__(
        self,
        spark: SparkSession,
        base: DeltaliteTable,
        index_path: str,
        n_iters: int = 0,
        train_sample_stride: int = 1,
    ) -> None:
        self.spark = spark
        self.base = base
        self.n_iters = n_iters
        # FAISS-style bounded-sample training (the 100 TB path): Lloyd's
        # rounds at (re)build time read only vec_id % stride == 0 plus the
        # seeds; folds/encodes are unaffected (frozen-codebook contract).
        self.train_sample_stride = train_sample_stride
        self.codes = DeltaliteTable(spark, index_path.rstrip("/") + "/codes")
        self.cb = DeltaliteTable(spark, index_path.rstrip("/") + "/codebook")

    @property
    def _index(self) -> DeltaliteTable:
        return self.codes

    @property
    def _txn_app(self) -> str:
        return f"pqcodes:{self.codes.path}"

    def codebook(self) -> DataFrame:
        return self.cb.read()

    def _rebuild(self, upto: int) -> None:
        from pyspark_cdc_engine.operators.dedup_scale import (
            train_pq_codebooks_from,
        )

        snap = self.base.read(version=upto).select("vec_id", "embedding")
        self.cb.overwrite(
            train_pq_codebooks_from(
                snap, self.n_iters, sample_stride=self.train_sample_stride
            )
        )
        self.codes.overwrite(
            encode_pq(snap, self.cb.read()),
            txn_app=self._txn_app,
            txn_version=upto,
        )
        self._record_watermark(upto)

    def _fold_changes(
        self, changed: DataFrame, upto: int, insert_only: bool = False
    ) -> None:
        from pyspark_cdc_engine.streaming.replicate import net_changes

        # insert_only from the commit log — see IncrementalIvfIndex
        if insert_only:
            self.codes.append(
                encode_pq(
                    changed.select("vec_id", "embedding"), self.cb.read()
                ),
                txn_app=self._txn_app,
                txn_version=upto,
            )
            return
        net = net_changes(
            changed.select(
                "vec_id", "embedding",
                "_change_type", "_commit_version", "_commit_timestamp",
            ),
            ["vec_id"],
        ).persist()
        try:
            dtypes = dict(self.codes.read().dtypes)
            ups = encode_pq(
                net.filter(F.col("__op") == "U").select("vec_id", "embedding"),
                self.cb.read(),
            ).withColumn("__op", F.lit("U"))
            from pyspark_cdc_engine.operators.dedup_scale import _PQ_M

            # a delete tombstones every (vec_id, m) row of the vector
            dels = (
                net.filter(F.col("__op") == "D")
                .select("vec_id")
                .crossJoin(
                    self.spark.range(_PQ_M).select(
                        F.col("id").cast(dtypes["m"]).alias("m")
                    )
                )
                .withColumn("code", F.lit(None).cast(dtypes["code"]))
                .withColumn("dist2", F.lit(None).cast(dtypes["dist2"]))
                .withColumn("__op", F.lit("D"))
            )
            self.codes.merge(
                ups.unionByName(dels),
                "target.vec_id = source.vec_id AND target.m = source.m",
                [
                    MergeClause("delete", condition="source.__op = 'D'"),
                    MergeClause(
                        "update",
                        condition=None,
                        assignments={
                            "code": "source.code",
                            "dist2": "source.dist2",
                        },
                    ),
                    MergeClause(
                        "insert",
                        condition="source.__op = 'U'",
                        assignments={
                            "vec_id": "source.vec_id",
                            "m": "source.m",
                            "code": "source.code",
                            "dist2": "source.dist2",
                        },
                    ),
                ],
                prune_on="vec_id",
                txn_app=self._txn_app,
                txn_version=upto,
            )
        finally:
            net.unpersist()

    def search(self, queries: DataFrame, k: int | None = None) -> DataFrame:
        """ADC top-``k`` over the MAINTAINED codes: each query precomputes
        its subspace distance table against the frozen codebook
        (|queries| x M x K rows — always the broadcast side), every
        indexed vector's approximate distance is the sum of its codes'
        table entries (exact-decimal, cast once at the end), deterministic
        (adist, neighbor_id) tie-break. A query that is itself an indexed
        vector never returns itself."""
        from pyspark_cdc_engine.operators.dedup_scale import (
            _PQ_TOPK,
            _pq_d2_vs,
        )

        if k is None:
            k = _PQ_TOPK
        qex = queries.select(
            F.col("query_id").alias("vec_id"),
            F.posexplode("qemb").alias("pos", "val"),
        ).withColumn("val", F.col("val").cast("double"))
        dtab = _pq_d2_vs(qex, self.cb.read()).select(
            F.col("vec_id").alias("query_id"),
            F.col("m").alias("qm"),
            F.col("k").alias("qk"),
            F.col("dist2").alias("qd2"),
        )
        scored = (
            fan_out(self.codes.read())
            .join(
                F.broadcast(dtab),
                (F.col("m") == F.col("qm")) & (F.col("code") == F.col("qk")),
            )
            .filter(F.col("vec_id") != F.col("query_id"))
            .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
            .agg(F.sum("qd2").cast("double").alias("adist"))
        )
        w = Window.partitionBy("query_id").orderBy("adist", "neighbor_id")
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "adist")
        )


@register(
    "pq_incremental_encode",
    survey="M5-ann,beyond-ref,S3,A2",
    oracle=f"""
    WITH {_pq_train_ctes_duck(_PQ_T, train_where=f"vec_id % 4 <> 0 OR vec_id < {_PQ_K}")},
    best AS (
      SELECT vec_id, m, k AS code, dist2,
             ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                ORDER BY CAST(dist2 AS DOUBLE), k) AS rn
      FROM pd2t
    )
    SELECT vec_id,
           string_agg(CAST(code AS VARCHAR), '-' ORDER BY m) AS code_key,
           CAST(SUM(dist2) AS DOUBLE) AS recon_err
    FROM best WHERE rn = 1 GROUP BY vec_id
    """,
)
def pq_incremental_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PQ encode pipeline under the FAISS train-once contract, end to
    end: :class:`IncrementalPqCodes` builds over a base corpus (3/4 of the
    vectors, containing the first-K codebook seeds) with ``n_iters``
    per-subspace Lloyd's rounds, a late delta appends, and the refresh
    folds the delta's ENCODES against the frozen trained codebooks — never
    re-training on a fold. Returns the maintained codes table aggregated
    to the ``pq_trained_encode`` contract (per-vector code key +
    exact-decimal reconstruction error); the oracle re-derives the exact
    split — unrolled per-subspace training over the base-subset CTE, final
    encode over the whole corpus — so a hash match certifies trainer,
    codebook freezing, the O(delta) fold, and the encode kernel in one
    driver-checked number set. The vector-compression twin of
    ``ann_ivf_trained_incremental``."""
    from pyspark_cdc_engine.operators.dedup_incremental import (
        _fresh_scratch_dir,
    )
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    tmp = _fresh_scratch_dir(f"pqinc:{sf_dir}")
    base_tbl = DeltaliteTable(spark, f"{tmp}/embs")
    base_tbl.overwrite(
        e.filter((F.col("vec_id") % 4 != 0) | (F.col("vec_id") < _PQ_K))
    )
    idx = IncrementalPqCodes(spark, base_tbl, f"{tmp}/pq_index", n_iters=_PQ_T)
    idx.refresh()
    base_tbl.append(
        e.filter((F.col("vec_id") % 4 == 0) & (F.col("vec_id") >= _PQ_K))
    )
    idx.refresh()
    codes = idx.codes.read()
    return codes.groupBy("vec_id").agg(
        F.expr(
            "concat_ws('-', transform(array_sort(collect_list("
            "named_struct('m', m, 'code', code))), x -> CAST(x.code AS STRING)))"
        ).alias("code_key"),
        F.sum("dist2").cast("double").alias("recon_err"),
    )
