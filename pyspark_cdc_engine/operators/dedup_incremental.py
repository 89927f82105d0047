"""Incremental LSH signature maintenance — the link between the CDC half and
the 100 TB dedup half of the engine (VERDICT r4 #8).

A dedup pipeline over a growing corpus must not re-shingle and re-hash 100 TB
because one day's documents arrived. :class:`IncrementalLshIndex` keeps a
deltalite BAND TABLE (``doc_id, band_id, band_hash`` — the join key of MinHash
LSH candidate generation) current from a deltalite documents table's change
feed: each refresh folds ONLY the rows new commits appended (``read_changes``
reads just the added data dirs), computes their signatures, and APPENDS their
band rows — O(delta) compute and write, never a corpus rescan. A non-append
commit (overwrite/merge/restore rewrites history additive deltas can't
express) forces one full rebuild, the same contract as
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
    _LSH_R,
    _MH_A,
    _MH_B,
    _MH_CTES_DUCK,
    _MH_K,
    _MH_P,
    _MH_TAU,
    _SHINGLE_W,
    _shingle_expr_spark,
)
from pyspark_cdc_engine.operators.registry import load_table, register
from pyspark_cdc_engine.tables import DeltaliteTable


def minhash_shingle_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, shh): distinct 15-hex shingle hashes per document — the
    same shingle pipeline as dedup_scale._minhash_lsh (one md5 per shingle,
    15-byte keys through every downstream shuffle)."""
    return (
        docs.select(
            "doc_id", F.explode(F.expr(_shingle_expr_spark(_SHINGLE_W))).alias("sh")
        )
        .select("doc_id", F.expr("substr(md5(CAST(sh AS BINARY)), 1, 15)").alias("shh"))
        .distinct()
    )


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, s0..s{K-1}): K universal-hash minima over each doc's shingle
    hashes. Pure map + one hash aggregate on doc_id."""
    hashed = minhash_shingle_sets(docs).withColumn(
        "h32", F.expr("CAST(conv(substr(shh, 1, 8), 16, 10) AS BIGINT)")
    )
    return hashed.groupBy("doc_id").agg(
        *[
            F.min(F.expr(f"({_MH_A[k]} * h32 + {_MH_B[k]}) % {_MH_P}")).alias(f"s{k}")
            for k in range(_MH_K)
        ]
    )


def lsh_band_table(sigs: DataFrame) -> DataFrame:
    """(doc_id, band_id, band_hash): the banded signature — ``_LSH_B`` rows
    per doc, each hashing ``_LSH_R`` signature slots. This IS the index."""
    band_structs = ", ".join(
        f"named_struct('band_id', {b}, 'band_hash', "
        f"CONCAT_WS('|', {', '.join(f's{b * _LSH_R + r}' for r in range(_LSH_R))}))"
        for b in range(_LSH_B)
    )
    return sigs.select(
        "doc_id", F.explode(F.expr(f"array({band_structs})")).alias("bd")
    ).select("doc_id", "bd.band_id", "bd.band_hash")


def verified_pairs_from_bands(bands: DataFrame, docs: DataFrame) -> DataFrame:
    """Near-dup pairs from a band table: id-only band self-join (bounded
    ~30 B/row through hot buckets — the 100 TB plan shape of
    minhash_lsh_near_dup's rejoin path), then exact-Jaccard verification by
    re-shingling ONLY candidate documents via two id-keyed joins."""
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    cand_ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    shs_tbl = (
        minhash_shingle_sets(docs.join(cand_ids, "doc_id", "left_semi"))
        .groupBy("doc_id")
        .agg(F.collect_set("shh").alias("shs"))
    )
    pairs = cand.join(
        shs_tbl.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("sa")),
        "doc_a",
    ).join(
        shs_tbl.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("sb")),
        "doc_b",
    )
    return (
        pairs.select(
            "doc_a",
            "doc_b",
            F.expr("size(array_intersect(sa, sb))").alias("i"),
            F.size("sa").alias("na"),
            F.size("sb").alias("nb"),
        )
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= _MH_TAU)
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
        """Index every base commit newer than the watermark. Appends fold as
        signature APPENDS (O(delta)); any history-rewriting commit forces one
        full rebuild. Returns the new watermark."""
        upto = self.base.latest_version()
        since = self.last_refreshed_version()
        if since >= upto:
            return since
        incremental_safe = since >= 0 and all(
            c["operation"] in ("append", "compact", "zorder", "analyze")
            for c in self.base.history()
            if since < c["version"] <= upto
        )
        txn_app = self._txn_app
        if not incremental_safe:
            snap = self._bands_of(self.base.read(version=upto))
            self.index.overwrite(snap, txn_app=txn_app, txn_version=upto)
            self._record_watermark(upto)
            return upto
        try:
            changed = self.base.read_changes(since, upto)
        except ValueError:  # physical-only commits: nothing logical to fold
            self._record_watermark(upto)
            return upto
        self.index.append(
            self._bands_of(changed), txn_app=txn_app, txn_version=upto
        )
        self._record_watermark(upto)
        return upto

    def near_dup_pairs(self) -> DataFrame:
        """(doc_a, doc_b, jaccard) for the indexed corpus: candidates from the
        maintained band table (no re-shingling of old documents), exact verify
        against the base table for candidate ids only."""
        return verified_pairs_from_bands(self.index.read(), self.base.read())


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
    import tempfile

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tmp = tempfile.mkdtemp(prefix="lsh_inc_")
    base_tbl = DeltaliteTable(spark, f"{tmp}/docs")
    base_tbl.overwrite(d.filter(F.col("doc_id") % 4 != 0))
    idx = IncrementalLshIndex(spark, base_tbl, f"{tmp}/lsh_index")
    idx.refresh()
    base_tbl.append(d.filter(F.col("doc_id") % 4 == 0))
    idx.refresh()
    return idx.near_dup_pairs()
