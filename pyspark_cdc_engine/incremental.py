"""Incremental aggregate maintenance from the change feed.

The materialized-view refresh pattern: a summary table (additive aggregates
keyed by group) is kept current by folding ONLY the rows each commit added —
never rescanning the base table. This is what makes a 100 TB fact table's
dashboards cheap: refresh cost is O(delta), not O(table).

Mechanics: ``DeltaliteTable.read_changes(since)`` yields the appended rows
with ``_commit_version``; they are pre-aggregated to one row per group
(delta counts/sums), then MERGEd into the summary with additive update
clauses. The summary's log records the last folded version
(``refresh_upto``), so refresh is idempotent and resumable — a re-run after a
crash folds from the recorded watermark, and an empty delta is a no-op.

Additivity is the contract: COUNT/SUM (and anything linear in them, e.g.
averages derived at read time) fold exactly. MIN/MAX/DISTINCT do not fold
under deletes/updates and are out of scope, same as every incremental-MV
engine's restriction (append-only CDF here, so MIN/MAX could fold — kept out
to match the general contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_cdc_engine.tables import (
    DeltaliteTable,
    MergeClause,
    NoChangesInWindow,
    RetentionPrunedWindow,
)

# Operations that change no rows: physical reorganizations and log-only
# commits. Schema commits are only safe for a given consumer when they don't
# touch a column it references (see incremental_fold_safe).
_ROW_PRESERVING_OPS = (
    "append", "compact", "zorder", "analyze",
    "rename_column", "drop_column", "add_column", "refresh",
    "set_cdf", "add_constraint", "drop_constraint",
)
_SCHEMA_OPS = ("rename_column", "drop_column", "add_column")


def _schema_commit_touches(commit: dict, referenced: set[str]) -> bool:
    op = commit["operation"]
    if op == "rename_column":
        rc = commit.get("renamed_column") or {}
        return rc.get("from") in referenced or rc.get("to") in referenced
    if op == "drop_column":
        return commit.get("dropped_column") in referenced
    if op == "add_column":
        # a re-added name shadows retired bytes for THIS consumer's column:
        # folding across it would mix old and new physical columns
        return commit.get("added_column") in referenced
    return False


def incremental_fold_safe(
    history: list[dict], since: int, upto: int, referenced: set[str]
) -> bool:
    """True iff every commit in (since, upto] preserves rows AND no schema
    commit renames/drops/re-adds a column the consumer references — the
    condition under which additive folding equals a full rebuild."""
    for c in history:
        if not (since < c["version"] <= upto):
            continue
        if c["operation"] not in _ROW_PRESERVING_OPS:
            return False
        if c["operation"] in _SCHEMA_OPS and _schema_commit_touches(c, referenced):
            return False
    return True


def signed_fold_safe(
    history: list[dict], since: int, upto: int, referenced: set[str]
) -> bool:
    """The weaker gate for consumers that fold SIGNED deltas (insert /
    update_postimage = +1, delete / update_preimage = -1, the classic IVM
    multiplicity): every commit whose exact change rows the feed
    reconstructs AND whose delta is smaller than the post-state is foldable
    — appends, physical reorganizations, predicate-recorded DELETE/UPDATE
    (cow and DV), DV MERGE, and — on a CDF-enabled table — ANY cow DML
    carrying materialized change files (``cdc_dirs``), including cow MERGE,
    whose change rows the feed otherwise cannot reconstruct (its images
    dissolve into the rewrite). OVERWRITE is deliberately excluded even
    though its feed rows are exact: the fold would read every removed AND
    added row (2×|table|) where a rebuild reads only the new table (1×) —
    rebuild strictly wins. Cow MERGE without CDF and RESTORE (history
    rewind) force a rebuild for expressibility, as do schema commits
    touching a referenced column. Truly append-only consumers (e.g. the
    training-shard exporter, whose generations are immutable artifacts)
    must keep using :func:`incremental_fold_safe`; keyed consumers that
    can delete/re-derive per key (the aggregate MV, both incremental
    indexes) fold this whole surface."""
    for c in history:
        if not (since < c["version"] <= upto):
            continue
        op = c["operation"]
        if op in _ROW_PRESERVING_OPS:
            if op in _SCHEMA_OPS and _schema_commit_touches(c, referenced):
                return False
            continue
        if c.get("cdc_dirs"):
            continue  # materialized change files: exact signed rows, O(delta)
        if op == "delete" and c.get("delete_where"):
            continue
        if op == "update" and c.get("update_where"):
            continue
        if op == "merge" and c.get("dv_merge"):
            continue
        return False
    return True


def window_insert_only(history: list[dict], since: int, upto: int) -> bool:
    """True iff every commit in (since, upto] is row-preserving — i.e. the
    change-feed window can only contain ``insert`` rows. The fold paths used
    to learn this by scanning the window's feed rows for their distinct
    ``_change_type`` set (one full pass over the delta per refresh); the
    commit log already says it in O(#commits) driver-side metadata (r12,
    guide §2.4 — appends produce inserts, physical/log-only ops produce no
    feed rows, and every signed op is outside ``_ROW_PRESERVING_OPS``)."""
    return all(
        c["operation"] in _ROW_PRESERVING_OPS
        for c in history
        if since < c["version"] <= upto
    )


class IncrementalAggregate:
    """Maintains ``SELECT keys, COUNT(*), SUM(cols)... GROUP BY keys`` over a
    deltalite base table, incrementally.

    ``sum_cols`` values are summed as DECIMAL(28,6) (order-independent — the
    same exactness contract as the query registry's ``dsum``), surfaced as
    DOUBLE."""

    def __init__(
        self,
        spark: SparkSession,
        base: DeltaliteTable,
        summary_path: str,
        keys: list[str],
        sum_cols: list[str],
    ) -> None:
        self.spark = spark
        self.base = base
        self.summary = DeltaliteTable(spark, summary_path)
        self.keys = keys
        self.sum_cols = sum_cols

    # ------------------------------------------------------------------ internals
    def _delta_agg(self, rows: DataFrame) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias("cnt")]
        for c in self.sum_cols:
            aggs.append(
                F.sum(F.col(c).cast("decimal(28,6)")).cast("double").alias(f"sum_{c}")
            )
        return rows.groupBy(*self.keys).agg(*aggs)

    def _delta_agg_signed(self, changes: DataFrame) -> DataFrame:
        """Signed per-group delta from a change-feed frame: +1 multiplicity
        for state-carrying rows, -1 for removed state — the IVM fold that
        makes DELETE/UPDATE/OVERWRITE commits O(delta) instead of a
        rebuild. Within one delta the ± terms accumulate in the same
        DECIMAL(28,6) as the + path, so a remove cancels exactly what its
        insert added; across folds the summary's DOUBLE addition carries
        the same rounding contract as the append-only path."""
        w = (
            F.when(
                F.col("_change_type").isin("insert", "update_postimage"),
                F.lit(1),
            )
            .otherwise(F.lit(-1))
        )
        rows = changes.withColumn("__w", w)
        aggs = [F.sum("__w").cast("long").alias("cnt")]
        for c in self.sum_cols:
            aggs.append(
                F.sum(F.col(c).cast("decimal(28,6)") * F.col("__w"))
                .cast("double")
                .alias(f"sum_{c}")
            )
        return rows.groupBy(*self.keys).agg(*aggs)

    @property
    def _txn_app(self) -> str:
        return f"mv:{self.summary.path}"

    def last_refreshed_version(self) -> int:
        """Highest base version whose rows are already folded in.

        Consults BOTH the watermark commits (``refresh_upto``) and the fold
        commits' own ``(txn_app, txn_version=upto)`` tag.  The fold and the
        watermark land in two commits; after a crash between them the fold
        commit is the only record of what was folded — and if the base gained
        new appends before the re-run, the txn guard alone would not trip
        (``upto' > upto``) and ``read_changes(stale_since, upto')`` would
        re-include the already-folded delta.  Taking the max of the two makes
        a resumed refresh start from the *folded* version, not the stale
        watermark, closing that double-count window."""
        if not self.summary.exists():
            return -1
        upto = -1
        for commit in self.summary.history():
            if "refresh_upto" in commit:
                upto = int(commit["refresh_upto"])
                break
        folded = self.summary.last_txn_version(self._txn_app)
        if folded is not None:
            upto = max(upto, folded)
        return upto

    # ------------------------------------------------------------------- refresh
    def _record_watermark(self, upto: int) -> None:
        base_v, commit = self.summary._snapshot()
        extra = {"refresh_upto": upto}
        if commit.get("schema"):
            extra["schema"] = commit["schema"]
        self.summary._write_commit("refresh", commit["live"], extra, base_v, commit)

    def refresh(self) -> int:
        """Fold all base commits newer than the recorded watermark into the
        summary. Returns the new watermark (base version folded up to).

        COUNT/SUM are abelian, so the fold is SIGNED (classic IVM):
        inserts/update-postimages add, deletes/update-preimages subtract —
        DELETE, UPDATE, OVERWRITE, and DV MERGE commits all fold in O(delta)
        from the change feed's exact reconstruction. Only commits whose
        change rows the feed cannot express (copy-on-write MERGE, RESTORE)
        — or schema commits touching a referenced column — force a full
        rebuild of the summary (still one aggregate scan)."""
        upto = self.base.latest_version()
        since = self.last_refreshed_version()
        if since >= upto:
            return since  # nothing new
        incremental_safe = since >= 0 and signed_fold_safe(
            self.base.history(), since, upto,
            set(self.keys) | set(self.sum_cols),
        )
        # Crash-idempotency: the fold lands in one commit, the watermark in a
        # second. Every fold commit carries (txn_app, txn_version=upto);
        # last_refreshed_version() reads that tag too, so a re-run after a
        # crash between the two commits resumes from the folded version even
        # when the base gained new appends in the meantime. The merge-side
        # txn guard stays as defense against exact-replay races.
        txn_app = self._txn_app
        if not incremental_safe:
            snap = self._delta_agg(self.base.read(version=upto))
            self.summary.overwrite(snap, txn_app=txn_app, txn_version=upto)
            self._record_watermark(upto)
            return upto
        try:
            changed = self.base.read_changes(since, upto)
        except NoChangesInWindow:  # physical-only commits: nothing to fold
            self._record_watermark(upto)
            return upto
        except RetentionPrunedWindow:
            # log retention pruned part of the window — invisible to
            # signed_fold_safe (pruned commits vanish from history()).
            # Advancing the watermark would drop the lost deltas; rebuild
            # from the snapshot instead (always correct, one aggregate
            # scan). Any OTHER ValueError is a genuine bug and propagates.
            snap = self._delta_agg(self.base.read(version=upto))
            self.summary.overwrite(snap, txn_app=txn_app, txn_version=upto)
            self._record_watermark(upto)
            return upto
        delta = self._delta_agg_signed(changed)
        assigns = {"cnt": "target.cnt + source.cnt"}
        for c in self.sum_cols:
            assigns[f"sum_{c}"] = f"target.sum_{c} + source.sum_{c}"
        cond = " AND ".join(f"target.{k} = source.{k}" for k in self.keys)
        self.summary.merge(
            delta,
            cond,
            [
                # a group whose last row was deleted leaves the summary —
                # exactly what a rebuild would produce
                MergeClause("delete", "target.cnt + source.cnt = 0"),
                MergeClause("update", None, assigns),
                # a delta that nets to zero for an unseen group (insert and
                # delete of its only rows inside one window) inserts nothing
                MergeClause("insert", "source.cnt <> 0", None),
            ],
            broadcast_source=True,
            txn_app=txn_app,
            txn_version=upto,
        )
        self._record_watermark(upto)
        return upto

    def read(self) -> DataFrame:
        return self.summary.read()
