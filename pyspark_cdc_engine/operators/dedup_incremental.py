"""Incremental LSH signature maintenance — the link between the CDC half and
the 100 TB dedup half of the engine (VERDICT r4 #8).

A dedup pipeline over a growing corpus must not re-shingle and re-hash 100 TB
because one day's documents arrived. :class:`IncrementalLshIndex` keeps a
deltalite BAND TABLE (``doc_id, band_id, band_hash`` — the join key of MinHash
LSH candidate generation) current from a deltalite documents table's change
feed: each refresh folds ONLY what new commits changed — appends compute the
new rows' signatures and APPEND their band rows; DV/predicate DELETEs remove
the tombstoned docs' band rows (the feed enumerates them row-exactly);
UPDATEs re-band the postimage text — O(delta) compute and write, never a
corpus rescan (the ``signed_fold_safe`` surface). Only a commit the feed
cannot express (cow MERGE without CDF, RESTORE) or an OVERWRITE forces one
full rebuild, the same contract as
:class:`pyspark_cdc_engine.incremental.IncrementalAggregate`, whose
crash-idempotent two-commit watermark pattern this class reuses.

Correctness anchor: a document's MinHash signature depends only on its own
shingles, so per-commit signature computation composes — the incrementally
built band table is ROW-IDENTICAL to one recomputed from scratch. The
registered ``minhash_lsh_incremental`` query exploits exactly that: it builds
the index over a base corpus, appends a delta, refreshes, and derives near-dup
pairs from the index — certified against the SAME full-recompute DuckDB oracle
as ``minhash_lsh_near_dup``.

Band-table sizing at scale: ``_LSH_B`` rows of ~30 bytes per document — four
band rows per doc — so the index is a small constant factor of a doc-id
listing, hash-partitionable on ``band_hash`` for the candidate self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_cdc_engine.operators.dedup_scale import (
    _LSH_B,
    _MH_CTES_DUCK,
    lsh_band_table,
    minhash_shingle_sets,
    minhash_signatures,
    verified_pairs_from_bands,
)
from pyspark_cdc_engine.operators.registry import fan_out, load_table, register
from pyspark_cdc_engine.tables import (
    DeltaliteTable,
    MergeClause,
    NoChangesInWindow,
    RetentionPrunedWindow,
)


class IncrementalLshIndex:
    """Maintains the LSH band table of a deltalite documents table
    incrementally from its change feed (module docstring has the contract)."""

    def __init__(
        self, spark: SparkSession, base: DeltaliteTable, index_path: str
    ) -> None:
        self.spark = spark
        self.base = base
        self.index = DeltaliteTable(spark, index_path)

    @property
    def _txn_app(self) -> str:
        return f"lsh:{self.index.path}"

    def last_refreshed_version(self) -> int:
        """Highest base version whose documents are already indexed — max of
        the watermark commits and the fold commits' own txn tag (the same
        crash-window reasoning as IncrementalAggregate.last_refreshed_version)."""
        if not self.index.exists():
            return -1
        upto = -1
        for commit in self.index.history():
            if "refresh_upto" in commit:
                upto = int(commit["refresh_upto"])
                break
        folded = self.index.last_txn_version(self._txn_app)
        if folded is not None:
            upto = max(upto, folded)
        return upto

    def _record_watermark(self, upto: int) -> None:
        base_v, commit = self.index._snapshot()
        extra = {"refresh_upto": upto}
        if commit.get("schema"):
            extra["schema"] = commit["schema"]
        self.index._write_commit("refresh", commit["live"], extra, base_v, commit)

    def _bands_of(self, docs: DataFrame) -> DataFrame:
        return lsh_band_table(minhash_signatures(docs.select("doc_id", "text")))

    def refresh(self) -> int:
        """Index every base commit newer than the watermark. Every commit
        whose exact change rows the feed reconstructs folds O(delta)
        (``signed_fold_safe``): appends fold as band APPENDS; DV/predicate
        DELETEs fold as band-row DELETIONS (the feed enumerates the
        tombstoned doc_ids row-exactly); UPDATEs re-band the postimage
        text. Only commits the feed cannot express — cow MERGE without
        CDF, RESTORE — or an OVERWRITE force one full rebuild. Returns the
        new watermark."""
        upto = self.base.latest_version()
        since = self.last_refreshed_version()
        if since >= upto:
            return since
        from pyspark_cdc_engine.incremental import (
            signed_fold_safe,
            window_insert_only,
        )

        history = self.base.history()
        incremental_safe = since >= 0 and signed_fold_safe(
            history, since, upto, {"doc_id", "text"}
        )
        txn_app = self._txn_app
        if not incremental_safe:
            snap = self._bands_of(self.base.read(version=upto))
            self.index.overwrite(snap, txn_app=txn_app, txn_version=upto)
            self._record_watermark(upto)
            return upto
        try:
            changed = self.base.read_changes(since, upto)
        except NoChangesInWindow:  # physical-only commits: nothing to fold
            self._record_watermark(upto)
            return upto
        except RetentionPrunedWindow:
            # log retention pruned part of the window — invisible to the
            # safety gate, which walks the surviving history. Rebuilding is
            # the only sound move; advancing the watermark would silently
            # drop the pruned commits' bands. Any other ValueError is a
            # genuine bug and propagates.
            snap = self._bands_of(self.base.read(version=upto))
            self.index.overwrite(snap, txn_app=txn_app, txn_version=upto)
            self._record_watermark(upto)
            return upto
        self._fold_changes(
            changed, upto, insert_only=window_insert_only(history, since, upto)
        )
        self._record_watermark(upto)
        return upto

    def _fold_changes(
        self, changed: DataFrame, upto: int, insert_only: bool = False
    ) -> None:
        """One MERGE folding a change-feed window into the band table:
        per-doc net effect (replication netting — last state wins,
        preimages dropped), surviving upserts re-banded, net deletes —
        plus updated docs whose new text yields NO shingles (shorter than
        a shingle window: no signature, no band rows) — removed for every
        band_id. The band table's key is (doc_id, band_id) with exactly
        ``_LSH_B`` rows per banded doc, so delete rows synthesize the full
        band_id range per vanishing doc. An append-only window degenerates
        to pure inserts — one code path for the whole signed surface."""
        from pyspark_cdc_engine.streaming.replicate import net_changes

        # Insert-only windows (the common case: appends) keep the plain
        # APPEND path — one write, base band dirs never touched.
        # ``insert_only`` comes from the commit log (window_insert_only),
        # not from a distinct scan of the feed rows — the metadata already
        # answers it with zero delta passes (r12).
        if insert_only:
            self.index.append(
                self._bands_of(changed),
                txn_app=self._txn_app,
                txn_version=upto,
            )
            return
        net = net_changes(
            changed.select(
                "doc_id", "text",
                "_change_type", "_commit_version", "_commit_timestamp",
            ),
            ["doc_id"],
        ).persist()
        try:
            ups_docs = net.filter(F.col("__op") == "U").select(
                "doc_id", "text"
            )
            new_bands = self._bands_of(ups_docs).withColumn(
                "__op", F.lit("U")
            )
            del_docs = (
                net.filter(F.col("__op") == "D")
                .select("doc_id")
                .unionByName(
                    ups_docs.select("doc_id").join(
                        new_bands.select("doc_id").distinct(),
                        "doc_id",
                        "left_anti",
                    )
                )
            )
            dels = (
                del_docs.withColumn(
                    "band_id",
                    F.explode(
                        F.array(*[F.lit(b) for b in range(_LSH_B)])
                    ),
                )
                .withColumn("band_hash", F.lit(None).cast("string"))
                .withColumn("__op", F.lit("D"))
            )
            self.index.merge(
                new_bands.unionByName(dels),
                "target.doc_id = source.doc_id"
                " AND target.band_id = source.band_id",
                [
                    MergeClause("delete", condition="source.__op = 'D'"),
                    MergeClause(
                        "update",
                        condition=None,
                        assignments={"band_hash": "source.band_hash"},
                    ),
                    # an unmatched 'D' (doc inserted and deleted within the
                    # window, or a never-banded doc) applies as nothing
                    MergeClause(
                        "insert",
                        condition="source.__op = 'U'",
                        assignments={
                            "doc_id": "source.doc_id",
                            "band_id": "source.band_id",
                            "band_hash": "source.band_hash",
                        },
                    ),
                ],
                prune_on="doc_id",
                txn_app=self._txn_app,
                txn_version=upto,
            )
        finally:
            net.unpersist()

    def near_dup_pairs(self) -> DataFrame:
        """(doc_a, doc_b, jaccard) for the indexed corpus: candidates from the
        maintained band table (no re-shingling of old documents), exact verify
        against the base table for candidate ids only."""
        return verified_pairs_from_bands(self.index.read(), self.base.read())


# Scratch-dir hygiene: every invocation rebuilds its docs table + index from
# scratch, so the PREVIOUS invocation's directory (for the same sf_dir) is
# garbage the moment a new one starts — delete it then, and sweep everything
# at interpreter exit. Without this, each bench/certification run would leak
# a corpus copy under /tmp.
_SCRATCH: dict[str, str] = {}


def _fresh_scratch_dir(key: str) -> str:
    import atexit
    import shutil
    import tempfile

    old = _SCRATCH.pop(key, None)
    if old:
        shutil.rmtree(old, ignore_errors=True)
    if not _SCRATCH:
        atexit.register(
            lambda: [shutil.rmtree(d, ignore_errors=True) for d in _SCRATCH.values()]
        )
    tmp = tempfile.mkdtemp(prefix="lsh_inc_")
    _SCRATCH[key] = tmp
    return tmp


@register(
    "minhash_lsh_incremental",
    survey="M5-dedup,beyond-ref,S3",
    oracle=f"""
    WITH {_MH_CTES_DUCK}
    SELECT doc_a, doc_b, jaccard FROM mh_pairs
    """,
)
def minhash_lsh_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs derived from an INCREMENTALLY maintained LSH index: the
    corpus is split deterministically into a base (3/4) and a late-arriving
    delta (doc_id % 4 == 0), the band table is built over the base, the delta
    is appended and folded by a second refresh that reads ONLY the delta's
    data dirs — and the pairs the index yields must equal a from-scratch
    recompute, which is exactly what the oracle does (same CTE chain as
    minhash_lsh_near_dup). This is the CDC-side MV-refresh machinery
    (incremental.py's watermark pattern) driving the dedup-side index."""
    d = fan_out(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    tmp = _fresh_scratch_dir(sf_dir)
    base_tbl = DeltaliteTable(spark, f"{tmp}/docs")
    base_tbl.overwrite(d.filter(F.col("doc_id") % 4 != 0))
    idx = IncrementalLshIndex(spark, base_tbl, f"{tmp}/lsh_index")
    idx.refresh()
    base_tbl.append(d.filter(F.col("doc_id") % 4 == 0))
    idx.refresh()
    return idx.near_dup_pairs()
