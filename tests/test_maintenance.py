"""Maintenance surface tests: SQL script runner (S8), CDC views, time travel /
restore / vacuum / compact / zorder (§2.12), table health probe."""

from __future__ import annotations

from pathlib import Path

import pytest
from pyspark.sql import functions as F

from pyspark_cdc_engine.maintenance import (
    register_cdc_views,
    run_sql_scripts,
    split_sql_statements,
    table_health,
)
from pyspark_cdc_engine.scd1 import merge_scd1
from pyspark_cdc_engine.streaming.pipeline import cdc_to_scd2_batch
from pyspark_cdc_engine.tables import DeltaliteTable
from tests.cdc_fixtures import insert_tx, write_fixture_files

REPO_SQL = str(Path(__file__).resolve().parents[1] / "sql")


def test_split_sql_statements():
    text = """
    -- leading comment
    SELECT 1;

    -- another
    SELECT 2
    FROM t;
    ;
    """
    stmts = split_sql_statements(text)
    assert stmts == ["SELECT 1", "SELECT 2\n    FROM t"]


@pytest.fixture()
def populated_tables(spark, tmp_path):
    base = tmp_path / "mx"
    txs = [insert_tx(i, f"m.{i}", f"5{i:03d}") for i in range(1, 6)]
    write_fixture_files(base / "cdc", base / "meta", txs)
    batch = cdc_to_scd2_batch(spark, str(base / "cdc"), str(base / "meta"))
    scd2 = DeltaliteTable(spark, str(base / "order_stream"))
    scd2.overwrite(batch)
    scd1 = DeltaliteTable(spark, str(base / "orders_current"))
    merge_scd1(spark, scd2.read(), scd1)
    return scd2, scd1


def test_seed_runner_executes_corpus(spark, populated_tables):
    """SeedJob parity: the repo's sql/ corpus runs end-to-end over the views."""
    scd2, scd1 = populated_tables
    register_cdc_views(spark, order_stream=scd2, orders_current=scd1)
    executed = run_sql_scripts(spark, REPO_SQL)
    assert len(executed) >= 10
    # Views answer correctly after the run
    assert spark.sql("SELECT COUNT(*) AS c FROM order_stream_current").collect()[0].c == 5
    dup = spark.sql(
        "SELECT orderId FROM orders_current GROUP BY orderId HAVING COUNT(*) > 1"
    ).collect()
    assert dup == []
    changes = spark.sql("SELECT COUNT(*) AS c FROM order_stream_changes").collect()[0].c
    assert changes == 0  # insert-only fixtures carry no before images


def test_views_flatten_correctly(spark, populated_tables):
    scd2, scd1 = populated_tables
    register_cdc_views(spark, order_stream=scd2, orders_current=scd1)
    row = spark.sql(
        "SELECT orderRef, orderVersion, line_item_count FROM order_stream_current "
        "WHERE orderId = 3.0"
    ).collect()[0]
    assert row.orderRef == "ORD-000003" and row.orderVersion == 1.0
    assert row.line_item_count == 2 + 3 % 4
    v = spark.sql(
        "SELECT shippingMethod, line_item_count FROM orders_current_view WHERE orderId = 3.0"
    ).collect()[0]
    assert v.line_item_count == 2 + 3 % 4


def test_time_travel_restore_vacuum_compact(spark, tmp_path):
    t = DeltaliteTable(spark, str(tmp_path / "tt"))
    df = spark.range(10).toDF("id")
    t.overwrite(df)                       # v0
    t.append(spark.range(10, 15).toDF("id"))   # v1
    t.append(spark.range(15, 18).toDF("id"))   # v2
    assert t.read().count() == 18
    assert t.read(version=0).count() == 10
    assert t.read(version=1).count() == 15
    t.compact(target_partitions=1)        # v3
    assert t.read().count() == 18
    health = table_health(t)
    assert health["num_data_dirs"] == 1 and health["num_files"] >= 1
    t.restore(1)                          # v4 -> snapshot of v1
    assert t.read().count() == 15
    ops = [h["operation"] for h in t.history()]
    assert ops == ["restore", "compact", "append", "append", "overwrite"]
    # vacuum with zero retention keeps only dirs referenced by latest commit
    dead = t.vacuum(retain_hours=0, dry_run=True)
    assert len(dead) >= 1
    t.vacuum(retain_hours=0)
    assert t.read().count() == 15  # latest snapshot intact
    # interchange escape hatch: live_data_dirs is the exact set a foreign
    # parquet reader should consume, and reading them plain matches read()
    dirs = t.live_data_dirs()
    assert dirs and all(Path(d).is_dir() for d in dirs)
    assert spark.read.parquet(*dirs).count() == 15
    assert spark.read.parquet(*t.live_data_dirs(version=0)).count() == 10


def test_zorder_clusters_files(spark, tmp_path):
    t = DeltaliteTable(spark, str(tmp_path / "zo"))
    t.overwrite(spark.range(1000).toDF("id").selectExpr("id", "id % 7 AS k"))
    t.zorder_by("k", target_partitions=4)
    assert t.read().count() == 1000
    assert t.history()[0]["operation"] == "zorder"
    assert t.history()[0]["zorder_cols"] == ["k"]

def test_change_data_feed(spark, tmp_path):
    t = DeltaliteTable(spark, str(tmp_path / "cdf"))
    t.overwrite(spark.range(5).toDF("id"))            # v0
    t.append(spark.range(5, 8).toDF("id"))            # v1
    t.compact(target_partitions=1)                    # v2 (no logical change)
    t.append(spark.range(8, 10).toDF("id"))           # v3
    ch = t.read_changes(0)                            # changes after v0
    assert ch.filter("_change_type = 'insert'").count() == 5
    assert sorted(r.id for r in ch.collect()) == [5, 6, 7, 8, 9]
    versions = {r._commit_version for r in ch.collect()}
    assert versions == {1, 3}                         # compact contributed nothing
    ch13 = t.read_changes(1, 3)
    assert sorted(r.id for r in ch13.collect()) == [8, 9]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        t.read_changes(3)                             # empty range


def test_shallow_clone(spark, tmp_path):
    src = DeltaliteTable(spark, str(tmp_path / "src"))
    src.overwrite(spark.range(20).toDF("id"))
    src.append(spark.range(20, 25).toDF("id"))
    clone = src.clone_to(str(tmp_path / "clone"))
    assert clone.read().count() == 25
    assert clone.history()[0]["operation"] == "shallow_clone"
    # clone evolves independently of the source
    clone.append(spark.range(25, 30).toDF("id"))
    assert clone.read().count() == 30
    assert src.read().count() == 25
    import pytest as _pytest
    with _pytest.raises(ValueError):
        src.clone_to(str(tmp_path / "clone"))


def test_analyze_statistics(spark, tmp_path):
    t = DeltaliteTable(spark, str(tmp_path / "an"))
    t.overwrite(spark.range(100).toDF("id").selectExpr("id", "id % 10 AS k"))
    stats = t.analyze(columns=["id", "k"])
    assert stats["num_rows"] == 100
    assert stats["columns"]["id"]["min"] == 0
    assert stats["columns"]["id"]["max"] == 99
    assert abs(stats["columns"]["k"]["ndv"] - 10) <= 1
    # stats persisted in the log; table contents unchanged
    assert t.history()[0]["operation"] == "analyze"
    assert t.history()[0]["stats"]["num_rows"] == 100
    assert t.read().count() == 100


def test_schema_evolution_append(spark, tmp_path):
    t = DeltaliteTable(spark, str(tmp_path / "ev"))
    t.overwrite(spark.range(3).toDF("id"))
    # enforcement: new column rejected without merge_schema
    evolved = spark.range(3, 6).toDF("id").selectExpr("id", "id * 10 AS score")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="merge_schema"):
        t.append(evolved)
    # evolution: accepted with merge_schema; old rows read as null
    t.append(evolved, merge_schema=True)
    rows = {r.id: r.score for r in t.read().collect()}
    assert rows == {0: None, 1: None, 2: None, 3: 30, 4: 40, 5: 50}
    assert [f.name for f in t.schema().fields] == ["id", "score"]
    # type change rejected
    with _pytest.raises(ValueError, match="enforcement"):
        t.append(spark.sql("SELECT CAST(9 AS STRING) AS id"), merge_schema=True)
    # schema survives compact
    t.compact(target_partitions=1)
    assert {r.id: r.score for r in t.read().collect()} == rows


def test_add_column_is_log_only(spark, tmp_path):
    t = DeltaliteTable(spark, str(tmp_path / "ac"))
    t.overwrite(spark.range(4).toDF("id"))
    v_before = t.latest_version()
    t.add_column("note", "string")
    assert t.latest_version() == v_before + 1
    df = t.read()
    assert df.columns == ["id", "note"]
    assert df.filter("note IS NULL").count() == 4
    # appends may now fill it
    t.append(spark.sql("SELECT 99 AS id, 'x' AS note"))
    assert t.read().filter("note = 'x'").count() == 1
    import pytest as _pytest
    with _pytest.raises(ValueError, match="exists"):
        t.add_column("note", "string")


def test_merge_file_pruning(spark, tmp_path):
    """Dirs whose key range can't overlap the source survive a merge
    unrewritten, and the pruned merge result equals the unpruned one."""
    from pyspark_cdc_engine.tables import MergeClause

    def mk(path):
        t = DeltaliteTable(spark, str(tmp_path / path))
        t.overwrite(spark.range(0, 100).selectExpr("id AS k", "id * 1.0 AS v"))
        t.append(spark.range(1000, 1100).selectExpr("id AS k", "id * 1.0 AS v"))
        return t

    src = spark.range(1000, 1010).selectExpr("id AS k", "id * 2.0 AS v")
    clauses = [
        MergeClause("update", None, {"v": "source.v"}),
        MergeClause("insert", None),
    ]
    pruned, plain = mk("pruned"), mk("plain")
    pruned.merge(src, "target.k = source.k", clauses, prune_on="k")
    plain.merge(src, "target.k = source.k", clauses)
    assert pruned.history()[0].get("pruned_dirs_kept") == 1
    a = sorted((r.k, r.v) for r in pruned.read().collect())
    b = sorted((r.k, r.v) for r in plain.read().collect())
    assert a == b and len(a) == 200
    assert {r.v for r in pruned.read().filter("k >= 1000 AND k < 1010").collect()} \
        == {float(k * 2) for k in range(1000, 1010)}
    # source outside every dir range: all dirs kept, only inserts written
    ins = spark.range(5000, 5003).selectExpr("id AS k", "id * 1.0 AS v")
    pruned.merge(ins, "target.k = source.k", clauses, prune_on="k")
    assert pruned.history()[0].get("pruned_dirs_kept") == 2
    assert pruned.read().count() == 203


def test_concurrent_commit_detection(spark, tmp_path):
    """Two handles racing to the same version: the second writer gets
    ConcurrentWriteError and no commit is lost or overwritten."""
    from pyspark_cdc_engine.tables import ConcurrentWriteError

    import threading

    t = DeltaliteTable(spark, str(tmp_path / "cc"))
    t.overwrite(spark.range(5).toDF("id"))

    # freeze the version listing both writers see, then race the commits
    orig_versions = DeltaliteTable._versions
    seen = orig_versions(t)
    errors, wins = [], []

    def race(tag):
        frozen = DeltaliteTable(t.spark, t.path)
        frozen._versions = lambda: list(seen)  # both believe next version is 1
        try:
            frozen._write_commit("append", [f"data/{tag}"])
            wins.append(tag)
        except ConcurrentWriteError:
            errors.append(tag)

    th = [threading.Thread(target=race, args=(x,)) for x in ("w1", "w2")]
    [x.start() for x in th]
    [x.join() for x in th]
    assert len(wins) == 1 and len(errors) == 1  # exactly one writer won
    committed = t._read_commit(t.latest_version())
    assert committed["live"] == [f"data/{wins[0]}"]  # winner's commit intact


def test_interleaved_writer_raises_not_lost_update(spark, tmp_path):
    """TOCTOU regression: writer A snapshots the table, writer B commits while
    A is still writing its data files; A's commit must raise
    ConcurrentWriteError (link targets snapshot+1, now taken) instead of
    silently winning with a stale live list that drops B's rows."""
    from pyspark_cdc_engine.tables import ConcurrentWriteError

    t = DeltaliteTable(spark, str(tmp_path / "ti"))
    t.overwrite(spark.range(5).toDF("id"))
    a = DeltaliteTable(spark, t.path)
    b = DeltaliteTable(spark, t.path)

    orig = DeltaliteTable._write_data_dir

    def interleave(df, hint, partition_by=None, **kw):  # B commits inside A's write window
        rel = orig(a, df, hint, partition_by=partition_by, **kw)
        b.append(spark.range(100, 103).toDF("id"))
        return rel

    a._write_data_dir = interleave
    with pytest.raises(ConcurrentWriteError):
        a.append(spark.range(10, 13).toDF("id"))
    # B's commit survived intact; A's rows are nowhere in the table
    assert sorted(r.id for r in t.read().collect()) == [0, 1, 2, 3, 4, 100, 101, 102]
    # and A's staged dir was discarded — nothing leaked into data/
    live = set(t._read_commit(t.latest_version())["live"])
    on_disk = {f"data/{p.name}" for p in (t._root / "data").iterdir() if p.is_dir()}
    assert on_disk == live
    assert not any((t._root / "_staging").glob("*")) if (t._root / "_staging").exists() else True


def test_uncommitted_data_never_visible_to_stream_glob(spark, tmp_path):
    """A writer that dies after writing data but before committing leaves its
    files in _staging/, not data/ — so read_stream's data/* glob (and any
    batch read) never sees uncommitted rows."""
    t = DeltaliteTable(spark, str(tmp_path / "tg"))
    t.append(spark.range(3).toDF("id"))
    # simulated crash: data written, commit never linked
    t._write_data_dir(spark.range(900, 950).toDF("id"), 99)
    on_disk = {f"data/{p.name}" for p in (t._root / "data").iterdir() if p.is_dir()}
    assert on_disk == set(t._read_commit(t.latest_version())["live"])
    assert t.read().count() == 3
    # vacuum with zero retention sweeps the abandoned staging dir
    dead = t.vacuum(retain_hours=0.0, dry_run=True)
    assert any(d.startswith("_staging/") for d in dead)
    t.vacuum(retain_hours=0.0)
    assert not any(p.is_dir() for p in (t._root / "_staging").iterdir())


def test_crash_between_link_and_publish_repaired_on_read(spark, tmp_path):
    """Crash window: commit linked but staged dir not yet published. The next
    read() repairs by finishing the publish, so the committed version is
    never unreadable."""
    t = DeltaliteTable(spark, str(tmp_path / "tr"))
    t.append(spark.range(4).toDF("id"))
    orig_publish = DeltaliteTable._publish
    t._publish = lambda rel: None  # crash before publish
    t.append(spark.range(10, 12).toDF("id"))
    t._publish = orig_publish.__get__(t)
    fresh = DeltaliteTable(spark, t.path)
    assert sorted(r.id for r in fresh.read().collect()) == [0, 1, 2, 3, 10, 11]


def test_changes_view_surfaces_before_images(spark, tmp_path):
    """order_stream_changes (db/create_table.deltalake.sql:119-129 parity):
    UPDATE events surface change_type='UPDATED' with previous values."""
    from tests.cdc_fixtures import TxBuilder, _order_after

    base = tmp_path / "chv"
    tx = TxBuilder("u.u.u.u", "8801")
    tx.order(9, op="U", version=3, status="SHIPPED",
             before=_order_after(9, 2, "CONFIRMED"))
    write_fixture_files(base / "cdc", base / "meta", [tx])
    batch = cdc_to_scd2_batch(spark, str(base / "cdc"), str(base / "meta"))
    scd2 = DeltaliteTable(spark, str(base / "order_stream"))
    scd2.overwrite(batch)
    register_cdc_views(spark, order_stream=scd2)
    row = spark.sql(
        "SELECT change_type, orderVersion, previous_version, previous_status "
        "FROM order_stream_changes WHERE orderId = 9.0"
    ).collect()[0]
    assert row.change_type == "UPDATED"
    assert row.orderVersion == 3.0 and row.previous_version == 2.0
    assert row.previous_status == "CONFIRMED"


def test_timestamp_as_of(spark, tmp_path):
    import time as _time

    t = DeltaliteTable(spark, str(tmp_path / "tsaof"))
    t.overwrite(spark.range(3).toDF("id"))
    mid = _time.time()
    _time.sleep(0.05)
    t.append(spark.range(3, 6).toDF("id"))
    assert t.read_as_of_timestamp(mid).count() == 3
    assert t.read_as_of_timestamp(_time.time()).count() == 6
    import pytest as _pytest
    with _pytest.raises(ValueError):
        t.read_as_of_timestamp(mid - 1e6)


def test_idempotent_txn_append(spark, tmp_path):
    """The Delta txnAppId/txnVersion pattern: replaying a micro-batch (same
    app + version) is a no-op; new versions append normally."""
    t = DeltaliteTable(spark, str(tmp_path / "txn"))
    df0 = spark.range(5).toDF("id")
    t.overwrite(df0)
    t.append(spark.range(5, 8).toDF("id"), txn_app="job1", txn_version=0)
    assert t.read().count() == 8
    # replay of batch 0 -> skipped
    t.append(spark.range(5, 8).toDF("id"), txn_app="job1", txn_version=0)
    assert t.read().count() == 8
    assert t.last_txn_version("job1") == 0
    # next batch appends; a different app is independent
    t.append(spark.range(8, 9).toDF("id"), txn_app="job1", txn_version=1)
    t.append(spark.range(9, 10).toDF("id"), txn_app="job2", txn_version=0)
    assert t.read().count() == 10
    assert t.last_txn_version("job1") == 1 and t.last_txn_version("job2") == 0
    # untagged appends never dedupe
    t.append(spark.range(10, 11).toDF("id"))
    t.append(spark.range(10, 11).toDF("id"))
    assert t.read().count() == 12


def test_idempotent_txn_merge(spark, tmp_path):
    """Replayed merge batch (same txn app+version) is a no-op commit-wise."""
    from pyspark_cdc_engine.tables import MergeClause

    t = DeltaliteTable(spark, str(tmp_path / "txm"))
    t.overwrite(spark.range(3).selectExpr("id AS k", "id * 1.0 AS v"))
    src = spark.range(1, 2).selectExpr("id AS k", "99.0 AS v")
    clauses = [MergeClause("update", None, {"v": "source.v"}), MergeClause("insert", None)]
    t.merge(src, "target.k = source.k", clauses, txn_app="m", txn_version=0)
    v_after = t.latest_version()
    t.merge(src, "target.k = source.k", clauses, txn_app="m", txn_version=0)
    assert t.latest_version() == v_after  # replay: no new commit
    assert t.read().filter("k = 1").first().v == 99.0


def test_check_constraints(spark, tmp_path):
    """CHECK constraints (Oracle status-domain parity, db/oracle-ddl.sql:14-16):
    enforced on append and merge, survive unrelated commits, droppable."""
    from pyspark_cdc_engine.tables import MergeClause

    t = DeltaliteTable(spark, str(tmp_path / "ck"))
    t.overwrite(spark.createDataFrame(
        [(1, "PENDING"), (2, "SHIPPED")], "id long, status string"))
    t.add_constraint(
        "status_domain",
        "status IN ('PENDING','CONFIRMED','SHIPPED','DELIVERED','CANCELLED')",
    )
    import pytest as _pytest
    # existing-data validation on declaration
    with _pytest.raises(ValueError, match="violation"):
        t.add_constraint("id_positive_strict", "id > 1")
    # append enforcement
    with _pytest.raises(ValueError, match="violation"):
        t.append(spark.createDataFrame([(3, "BOGUS")], "id long, status string"))
    t.append(spark.createDataFrame([(3, "DELIVERED")], "id long, status string"))
    assert t.read().count() == 3
    # survives compact, enforced through merge
    t.compact(target_partitions=1)
    assert t.constraints() == {
        "status_domain":
        "status IN ('PENDING','CONFIRMED','SHIPPED','DELIVERED','CANCELLED')"
    }
    clauses = [MergeClause("update", None, {"status": "source.status"}),
               MergeClause("insert", None)]
    bad = spark.createDataFrame([(1, "NOPE")], "id long, status string")
    with _pytest.raises(ValueError, match="violation"):
        t.merge(bad, "target.id = source.id", clauses)
    # overwrite is validated too
    with _pytest.raises(ValueError, match="violation"):
        t.overwrite(spark.createDataFrame([(9, "NOPE")], "id long, status string"))
    # drop, then the formerly-invalid append succeeds
    t.drop_constraint("status_domain")
    t.append(spark.createDataFrame([(4, "BOGUS")], "id long, status string"))
    assert t.read().count() == 4


def test_partitioned_table_roundtrip_and_pruning(spark, tmp_path):
    """Hive-style partition spec: declared once, inherited by appends,
    recovered on read, and PRUNED — a filter on the partition column must
    reach the scan as a PartitionFilter, not a post-scan Filter."""
    t = DeltaliteTable(spark, str(tmp_path / "pt"))
    df = spark.range(100).selectExpr("id", "id % 4 AS bucket", "id * 2 AS v")
    t.append(df, partition_by=["bucket"])                       # v0 declares
    t.append(spark.range(100, 140).selectExpr("id", "id % 4 AS bucket", "id * 2 AS v"))
    assert t.read().count() == 140
    assert set(t.read().columns) == {"id", "bucket", "v"}
    # partition values survive the dir round-trip
    got = {r.bucket for r in t.read().select("bucket").distinct().collect()}
    assert got == {0, 1, 2, 3}
    filtered = t.read().filter("bucket = 2")
    assert filtered.count() == 35
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan.split("PartitionFilters")[1][:200]
    # conflicting spec on append is refused; overwrite may evolve it
    with pytest.raises(ValueError, match="partitioned by"):
        t.append(df, partition_by=["v"])
    t.overwrite(df, partition_by=[])
    assert not t._read_commit(t.latest_version())["partition_by"]
    assert t.read().count() == 100


def test_partitioned_maintenance_preserves_spec(spark, tmp_path):
    """compact / zorder / restore / clone keep the partition spec; merge
    rewrites stay partitioned; time travel reads old partitioned snapshots."""
    from pyspark_cdc_engine.tables import MergeClause

    t = DeltaliteTable(spark, str(tmp_path / "pm"))
    df = spark.range(60).selectExpr("id", "id % 3 AS part", "CAST(id AS DOUBLE) AS v")
    t.append(df, partition_by=["part"])                         # v0
    t.append(spark.range(60, 90).selectExpr("id", "id % 3 AS part", "CAST(id AS DOUBLE) AS v"))
    t.compact()                                                  # v2
    assert t._read_commit(t.latest_version())["partition_by"] == ["part"]
    # partitioned writes publish one live entry per partition dir
    live = t._read_commit(t.latest_version())["live"]
    assert any(d.endswith("part=0") and (t._root / d).exists() for d in live)
    src = spark.range(5).selectExpr("id", "id % 3 AS part", "CAST(-1 AS DOUBLE) AS v")
    t.merge(
        src,
        "target.id = source.id",
        [MergeClause("update", None, {"v": "source.v"})],
    )                                                            # v3
    assert t._read_commit(t.latest_version())["partition_by"] == ["part"]
    assert t.read().filter("v = -1").count() == 5
    assert t.read(version=0).count() == 60                       # time travel
    t.restore(0)                                                 # v4
    assert t._read_commit(t.latest_version())["partition_by"] == ["part"]
    assert t.read().count() == 60
    clone = t.clone_to(str(tmp_path / "pm_clone"))
    assert clone.read().filter("part = 1").count() == 20
    with pytest.raises(ValueError, match="partitioned"):
        t.read_stream()


def test_merge_prunes_on_partition_dir_names(spark, tmp_path):
    """prune_on the partition column: bounds come from key=value dir names
    (the column isn't in the parquet footers), so disjoint partitions are
    kept verbatim instead of rewritten."""
    from pyspark_cdc_engine.tables import MergeClause

    t = DeltaliteTable(spark, str(tmp_path / "pp"))
    for lo in (0, 100, 200):
        t.append(
            spark.range(lo, lo + 50).selectExpr("id", f"{lo} AS band", "id AS v"),
            partition_by=["band"] if lo == 0 else None,
        )
    src = spark.range(10).selectExpr("id", "0 AS band", "id + 1000 AS v")
    v = t.merge(
        src,
        "target.id = source.id",
        [MergeClause("update", None, {"v": "source.v"})],
        prune_on="band",
    )
    commit = t._read_commit(v)
    assert commit.get("pruned_dirs_kept") == 2  # band=100 and band=200 dirs kept
    assert t.read().filter("v >= 1000").count() == 10
    assert t.read().count() == 150


def test_partitioned_merge_equals_unpartitioned(spark, tmp_path):
    """Partitioning is purely physical: the same MERGE against a partitioned
    and an unpartitioned copy of the same table must produce identical rows
    (ordered-clause semantics unaffected by the layout)."""
    from pyspark_cdc_engine.tables import MergeClause

    base_df = spark.range(80).selectExpr(
        "id", "id % 5 AS part", "id AS version", "CAST(id AS DOUBLE) AS v"
    )
    src = spark.range(40, 120).selectExpr(
        "id", "id % 5 AS part", "id + 100 AS version", "CAST(-id AS DOUBLE) AS v"
    )
    clauses = [
        MergeClause("update", "source.version > target.version",
                    {"version": "source.version", "v": "source.v"}),
        MergeClause("insert", None, None),
    ]
    results = []
    for name, part in (("flat", None), ("parted", ["part"])):
        t = DeltaliteTable(spark, str(tmp_path / name))
        t.append(base_df, partition_by=part)
        t.merge(src, "target.id = source.id", clauses, prune_on="id")
        results.append(
            sorted((r.id, r.part, r.version, r.v) for r in t.read().collect())
        )
    assert results[0] == results[1]
    assert len(results[0]) == 120


def test_merge_prunes_from_log_stats_without_opening_footers(spark, tmp_path):
    """Write-time per-dir min/max stats land in the commit log; a later merge
    prunes disjoint dirs from the log ALONE. Proven by poisoning pyarrow's
    footer reader for the duration of the merge — any footer open would raise."""
    import pyarrow.parquet as pq

    from pyspark_cdc_engine.tables import MergeClause

    t = DeltaliteTable(spark, str(tmp_path / "ls"))
    for lo in (0, 1000, 2000):
        t.append(spark.range(lo, lo + 100).selectExpr("id", "id AS v"))
    commit = t._read_commit(t.latest_version())
    assert all(
        commit["dir_stats"][d]["id"] == [lo, lo + 99]
        for d, lo in zip(sorted(commit["live"]), (0, 1000, 2000))
    )

    src = spark.range(50).selectExpr("id", "id + 9000 AS v")
    orig = pq.ParquetFile

    def poisoned(*a, **k):
        # write-time stats harvesting of the merge's OWN staged output is
        # expected; opening any COMMITTED dir's footer is the bug
        if "_staging" in str(a[0]):
            return orig(*a, **k)
        raise AssertionError("merge pruning opened a parquet footer")

    pq.ParquetFile = poisoned
    try:
        v = t.merge(
            src,
            "target.id = source.id",
            [MergeClause("update", None, {"v": "source.v"})],
            prune_on="id",
        )
    finally:
        pq.ParquetFile = orig
    assert t._read_commit(v).get("pruned_dirs_kept") == 2
    assert t.read().filter("v >= 9000").count() == 50
    assert t.read().count() == 300


def test_merge_leaves_untouched_partition_dirs_unread(spark, tmp_path):
    """IO proof for partition-level merge pruning: corrupt the parquet files
    of partitions the source can't touch, then merge — success means those
    dirs were never read (a scan would crash), and the commit still references
    them verbatim (never rewritten)."""
    from pyspark_cdc_engine.tables import MergeClause

    t = DeltaliteTable(spark, str(tmp_path / "io"))
    # one write, three partition dirs; ids are disjoint ranges per partition
    df = spark.range(300).selectExpr("id", "CAST(id DIV 100 AS INT) AS band", "id AS v")
    t.append(df, partition_by=["band"])
    live0 = t._read_commit(t.latest_version())["live"]
    assert sorted(d.rsplit("/", 1)[1] for d in live0) == ["band=0", "band=1", "band=2"]

    # corrupt every parquet file in band=1 and band=2 — unreadable from now on
    for d in live0:
        if d.endswith(("band=1", "band=2")):
            for f in (t._root / d).rglob("*.parquet"):
                f.write_bytes(b"not a parquet file")

    src = spark.range(10).selectExpr("id", "CAST(0 AS INT) AS band", "id + 5000 AS v")
    v = t.merge(
        src,
        "target.id = source.id",
        [MergeClause("update", None, {"v": "source.v"})],
        prune_on="id",  # NOT the partition column: stats come from the log
    )
    commit = t._read_commit(v)
    assert commit.get("pruned_dirs_kept") == 2
    kept = [d for d in commit["live"] if d in live0]
    assert sorted(d.rsplit("/", 1)[1] for d in kept) == ["band=1", "band=2"]
    # the rewritten band=0 partition is readable and merged
    rewritten = [d for d in commit["live"] if d not in live0]
    got = t._read_dirs(
        [str(t._root / d) for d in rewritten], commit.get("schema"), ["band"]
    )
    assert got.filter("v >= 5000").count() == 10


def test_partition_scoped_compact(spark, tmp_path):
    """OPTIMIZE-WHERE analog: only partitions fragmented across >1 live dir
    (and matching the predicate) are rewritten; every other partition's live
    entry carries over verbatim — zero IO on healthy partitions."""
    t = DeltaliteTable(spark, str(tmp_path / "pc"))
    # band 0 and 1 get three appends each; band 2 only one (never fragmented)
    for i in range(3):
        hi = 3 if i == 0 else 2
        t.append(
            spark.range(100).selectExpr(
                "id", f"CAST(id % {hi} AS INT) AS band", "id AS v"
            ),
            partition_by=["band"] if i == 0 else None,
        )
    before = t._read_commit(t.latest_version())["live"]
    band2 = [d for d in before if d.endswith("band=2")]
    assert len(band2) == 1

    v = t.compact(target_partitions=1)
    commit = t._read_commit(v)
    assert commit["compacted_partitions"] == 2
    assert commit["kept_partitions"] == 1
    # band=2's entry is byte-identical (carried over, not rewritten)
    assert band2[0] in commit["live"]
    assert {d.rsplit("/", 1)[1] for d in commit["live"]} == {"band=0", "band=1", "band=2"}
    assert len([d for d in commit["live"] if d.endswith("band=0")]) == 1
    assert t.read().count() == 300
    # re-compacting a healthy table is a no-op commit-wise
    assert t.compact() == v

    # WHERE-scoped: fragment band 0 and 1 again, compact only band=1
    t.append(spark.range(100, 140).selectExpr("id", "CAST(id % 2 AS INT) AS band", "id AS v"))
    v2 = t.compact(where="band = 1")
    c2 = t._read_commit(v2)
    assert c2["compacted_partitions"] == 1
    assert len([d for d in c2["live"] if d.endswith("band=0")]) == 2  # untouched
    assert len([d for d in c2["live"] if d.endswith("band=1")]) == 1
    assert t.read().count() == 340
    # unpartitioned where= refused
    flat = DeltaliteTable(spark, str(tmp_path / "flat3"))
    flat.append(spark.range(5).toDF("id"))
    with pytest.raises(ValueError, match="partitioned"):
        flat.compact(where="id = 1")


def test_partition_scoped_zorder(spark, tmp_path):
    """ZORDER ... WHERE: only matching partitions re-clustered; others carry
    over verbatim."""
    t = DeltaliteTable(spark, str(tmp_path / "pz"))
    t.append(
        spark.range(400).selectExpr("id", "CAST(id % 2 AS INT) AS band", "id % 37 AS k"),
        partition_by=["band"],
    )
    t.append(spark.range(400, 600).selectExpr("id", "CAST(id % 2 AS INT) AS band", "id % 37 AS k"))
    live0 = t._read_commit(t.latest_version())["live"]
    band0_before = sorted(d for d in live0 if d.endswith("band=0"))

    v = t.zorder_by("k", target_partitions=2, where="band = 1")
    c = t._read_commit(v)
    assert c["zordered_partitions"] == 1
    assert sorted(d for d in c["live"] if d.endswith("band=0")) == band0_before
    # rewritten partition now holds one dir per zorder range bucket
    assert 1 <= len([d for d in c["live"] if "band=1/" in d]) <= 2
    assert t.read().count() == 600
    # no partition matches -> no-op
    assert t.zorder_by("k", where="band = 99") == v


def test_zorder_then_merge_prunes_key_ranges(spark, tmp_path):
    """The data-skipping loop: ZORDER BY the merge key publishes one dir per
    key range with logged stats; a narrow CDC merge then keeps every
    non-overlapping range dir verbatim — the Delta OPTIMIZE+merge pattern."""
    from pyspark_cdc_engine.tables import MergeClause

    t = DeltaliteTable(spark, str(tmp_path / "zm"))
    t.append(spark.range(10_000).selectExpr("id", "id AS v"))
    t.zorder_by("id", target_partitions=8)
    zc = t._read_commit(t.latest_version())
    assert len(zc["live"]) == 8  # one dir per range bucket
    assert all("__zr=" in d for d in zc["live"])
    assert all("id" in zc["dir_stats"][d] for d in zc["live"])
    # __zr is physical only: never surfaced by reads
    assert "__zr" not in t.read().columns
    assert t.read().count() == 10_000

    src = spark.range(100).selectExpr("id", "id + 50000 AS v")  # ids 0..99
    v = t.merge(
        src,
        "target.id = source.id",
        [MergeClause("update", None, {"v": "source.v"})],
        prune_on="id",
    )
    c = t._read_commit(v)
    assert c.get("pruned_dirs_kept") == 7  # only the 0..99 range dir rewritten
    assert t.read().filter("v >= 50000").count() == 100
    assert t.read().count() == 10_000


def test_zorder_partitioned_table_keeps_spec_and_prunes(spark, tmp_path):
    """ZORDER on a partitioned table nests ranges under the partition dirs;
    reads recover the partition column and never see __zr."""
    from pyspark_cdc_engine.tables import MergeClause

    t = DeltaliteTable(spark, str(tmp_path / "zp"))
    t.append(
        spark.range(2_000).selectExpr("id", "CAST(id % 2 AS INT) AS part", "id AS v"),
        partition_by=["part"],
    )
    t.zorder_by("id", target_partitions=4)
    c = t._read_commit(t.latest_version())
    assert all("part=" in d and "__zr=" in d for d in c["live"])
    assert sorted(t.read().columns) == ["id", "part", "v"]
    assert t.read().filter("part = 1").count() == 1_000
    v = t.merge(
        spark.range(50).selectExpr("id", "CAST(id % 2 AS INT) AS part", "id + 90000 AS v"),
        "target.id = source.id",
        [MergeClause("update", None, {"v": "source.v"})],
        prune_on="id",
    )
    assert t._read_commit(v).get("pruned_dirs_kept", 0) >= 1
    assert t.read().filter("v >= 90000").count() == 50
    assert t.read().count() == 2_000


def test_stats_force_include_zorder_key_beyond_first_cols(spark, tmp_path):
    """A zorder/prune key past the first-8-column stats window is still
    indexed (force-included), so range pruning works on wide tables."""
    from pyspark_cdc_engine.tables import MergeClause

    cols = [f"id + {i} AS c{i}" for i in range(9)]
    t = DeltaliteTable(spark, str(tmp_path / "wide"))
    t.append(spark.range(1_000).selectExpr("id", *cols, "id AS key"))  # key is col 11
    t.zorder_by("key", target_partitions=4)
    c = t._read_commit(t.latest_version())
    assert all("key" in c["dir_stats"][d] for d in c["live"])
    v = t.merge(
        spark.range(10).selectExpr("id", *cols, "id AS key"),
        "target.key = source.key",
        [MergeClause("update", None, {"c0": "source.c0"})],
        prune_on="key",
    )
    assert t._read_commit(v).get("pruned_dirs_kept") == 3


def test_scan_skips_dirs_from_log_stats(spark, tmp_path):
    """Data-skipping read: dirs outside key_bounds are never opened — proven
    by corrupting their parquet files; zorder makes the skipping selective."""
    t = DeltaliteTable(spark, str(tmp_path / "ds"))
    t.append(spark.range(8_000).selectExpr("id", "id AS v"))
    t.zorder_by("id", target_partitions=8)
    commit = t._read_commit(t.latest_version())
    # corrupt every range dir whose ids are all >= 2000
    corrupted = 0
    for d in commit["live"]:
        lo, hi = commit["dir_stats"][d]["id"]
        if lo >= 2000:
            for f in (t._root / d).rglob("*.parquet"):
                f.write_bytes(b"garbage")
            corrupted += 1
    assert corrupted >= 5
    out = t.scan(key_bounds={"id": (100, 1500)})
    assert out.count() == 1401  # succeeds: corrupted dirs never read
    assert out.selectExpr("min(id) lo", "max(id) hi").first()[:] == (100, 1500)
    # open-ended bound + residual where filter
    low = t.scan(key_bounds={"id": (None, 999)}, where="v % 2 = 0")
    assert low.count() == 500
    # fully disjoint bounds: empty frame, correct schema, no read
    assert t.scan(key_bounds={"id": (10**9, None)}).count() == 0


def test_scan_string_key_bounds(spark, tmp_path):
    """String min/max stats round-trip the log and prune correctly."""
    t = DeltaliteTable(spark, str(tmp_path / "dstr"))
    t.append(spark.range(0, 100).selectExpr("concat('a', lpad(id, 3, '0')) AS k", "id AS v"))
    t.append(spark.range(0, 100).selectExpr("concat('m', lpad(id, 3, '0')) AS k", "id AS v"))
    t.append(spark.range(0, 100).selectExpr("concat('z', lpad(id, 3, '0')) AS k", "id AS v"))
    # corrupt the a* and z* dirs: only the m* dir may be read
    commit = t._read_commit(t.latest_version())
    for d in commit["live"]:
        lo, hi = commit["dir_stats"][d]["k"]
        if not lo.startswith("m"):
            for f in (t._root / d).rglob("*.parquet"):
                f.write_bytes(b"garbage")
    out = t.scan(key_bounds={"k": ("m000", "m049")})
    assert out.count() == 50


def test_compact_coalesces_zordered_partition_with_appends(spark, tmp_path):
    """A logical partition fragmented across zorder __zr range buckets PLUS a
    later append must group together and coalesce (the __zr component is
    physical layout, not a partition value) — while a partition holding ONLY
    one zorder's range buckets is a deliberate clustering and is kept."""
    t = DeltaliteTable(spark, str(tmp_path / "zc"))
    t.append(
        spark.range(400).selectExpr("id", "CAST(id % 2 AS INT) AS band", "id % 37 AS k"),
        partition_by=["band"],
    )
    t.zorder_by("k", target_partitions=4)
    zlive = t._read_commit(t.latest_version())["live"]
    band1_buckets = sorted(d for d in zlive if "band=1/" in d)
    assert len(band1_buckets) >= 2  # fragmented physically, clustered logically

    # band=0 gains an append; band=1 stays zorder-only
    t.append(spark.range(400, 450).selectExpr("id", "CAST(0 AS INT) AS band", "id % 37 AS k"))
    v = t.compact(target_partitions=1)
    c = t._read_commit(v)
    assert c["operation"] == "compact"  # not the pre-fix silent no-op
    assert c["compacted_partitions"] == 1
    # band=0: zorder buckets + append coalesced into a single dir
    band0 = [d for d in c["live"] if "band=0" in d]
    assert len(band0) == 1 and "__zr=" not in band0[0]
    # band=1: untouched, still the original range buckets
    assert sorted(d for d in c["live"] if "band=1/" in d) == band1_buckets
    assert t.read().count() == 450
    assert t.read().filter("band = 0").count() == 250


def test_table_rooted_under_dir_with_equals_in_name(spark, tmp_path):
    """basePath for partitioned reads must be derived relative to the table's
    own data dirs — a table rooted under /…/run=5/tbl must not treat 'run=5'
    as a partition component (which would push basePath above the table root
    and surface spurious partition columns or break discovery)."""
    root = tmp_path / "run=5" / "tbl"
    t = DeltaliteTable(spark, str(root))
    t.append(
        spark.range(100).selectExpr("id", "CAST(id % 3 AS INT) AS band"),
        partition_by=["band"],
    )
    t.append(spark.range(100, 130).selectExpr("id", "CAST(id % 3 AS INT) AS band"))
    df = t.read()
    assert sorted(df.columns) == ["band", "id"]
    assert df.count() == 130
    assert df.filter("band = 1").count() == 43
    # maintenance paths that re-read per-partition dirs work too
    v = t.compact(target_partitions=1)
    assert t._read_commit(v)["operation"] == "compact"
    assert t.read().count() == 130


def test_append_conflict_retry_relinks_staged_data(spark, tmp_path):
    """Blind-append conflict resolution: when another writer wins the version
    race, append(retries=N) re-links the SAME staged files against the new
    base — all rows from both writers land, nothing is rewritten or lost."""
    t = DeltaliteTable(spark, str(tmp_path / "cc"))
    t.overwrite(spark.range(10).toDF("id"))  # v0

    rival = DeltaliteTable(spark, str(tmp_path / "cc"))
    real = t._write_commit
    fired = {"n": 0}

    def race(*a, **kw):
        if fired["n"] == 0:
            fired["n"] += 1
            rival.append(spark.range(100, 120).toDF("id"))  # steals v1
        return real(*a, **kw)

    t._write_commit = race
    try:
        v = t.append(spark.range(10, 30).toDF("id"), retries=1)
    finally:
        t._write_commit = real
    assert v == 2
    assert sorted(r.id for r in t.read().collect()) == sorted(
        list(range(30)) + list(range(100, 120))
    )
    ops = [h["operation"] for h in t.history()]
    assert ops == ["append", "append", "overwrite"]
    # nothing lingering in staging
    staging = tmp_path / "cc" / "_staging"
    assert not staging.exists() or not any(staging.rglob("*.parquet"))


def test_append_retry_refuses_interleaved_non_append(spark, tmp_path):
    """An interleaved overwrite/restore must still raise — blind re-linking
    would silently bury its effect."""
    from pyspark_cdc_engine.tables import ConcurrentWriteError

    t = DeltaliteTable(spark, str(tmp_path / "cc2"))
    t.overwrite(spark.range(5).toDF("id"))

    rival = DeltaliteTable(spark, str(tmp_path / "cc2"))
    real = t._write_commit
    fired = {"n": 0}

    def race(*a, **kw):
        if fired["n"] == 0:
            fired["n"] += 1
            rival.overwrite(spark.range(50, 60).toDF("id"))
        return real(*a, **kw)

    t._write_commit = race
    try:
        with pytest.raises(ConcurrentWriteError, match="non-append"):
            t.append(spark.range(5, 9).toDF("id"), retries=3)
    finally:
        t._write_commit = real
    # rival's overwrite intact, our append absent
    assert sorted(r.id for r in t.read().collect()) == list(range(50, 60))


def test_deltalite_history_udtf_via_spark_sql(spark, tmp_path):
    """DESCRIBE HISTORY from plain spark.sql: the deltalite_history UDTF
    returns the commit log newest-first with txn tags flattened."""
    from pyspark_cdc_engine.maintenance import register_sql_maintenance_functions

    t = DeltaliteTable(spark, str(tmp_path / "h"))
    t.overwrite(spark.range(5).toDF("id"))
    t.append(spark.range(5, 8).toDF("id"), txn_app="job_a", txn_version=3)
    t.compact(target_partitions=1)
    register_sql_maintenance_functions(spark)
    rows = spark.sql(
        f"SELECT * FROM deltalite_history('{tmp_path / 'h'}')"
    ).collect()
    assert [r.version for r in rows] == [2, 1, 0]
    assert [r.operation for r in rows] == ["compact", "append", "overwrite"]
    assert rows[1].txn_app == "job_a" and rows[1].txn_version == 3
    assert all(r.timestamp > 0 and r.num_live_dirs >= 1 for r in rows)
    # composes with ordinary SQL
    n = spark.sql(
        f"SELECT COUNT(*) AS c FROM deltalite_history('{tmp_path / 'h'}') "
        "WHERE operation = 'append'"
    ).collect()[0].c
    assert n == 1


def test_table_changes_sql_over_scd1_table(spark, populated_tables):
    """The reference's table_changes usage (db/query_scd1_table.sql:157-158)
    re-expressed over the SCD1 table through the deltalite_changes UDTF —
    an auditor counts the feed's change types in plain SQL and gets exactly
    what the Python API reports."""
    from pyspark_cdc_engine.maintenance import register_sql_maintenance_functions

    _, scd1 = populated_tables
    register_sql_maintenance_functions(spark)
    latest = scd1.latest_version()
    got = {
        (r.ct, r.n)
        for r in spark.sql(
            f"SELECT _change_type AS ct, COUNT(*) AS n "
            f"FROM deltalite_changes('{scd1.path}', 0, {latest}) "
            f"GROUP BY _change_type"
        ).collect()
    }
    want = {
        (r.ct, r.n)
        for r in scd1.read_changes(-1, latest)
        .groupBy(F.col("_change_type").alias("ct"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and got


def test_zorder_bit_interleaved_prunes_on_every_key(spark, tmp_path):
    """True Z-curve (r5): after zorder_by(a, b), a narrow scan on EITHER key
    must skip most data dirs — lexicographic range order would leave `b`
    scattered across every dir (zero pruning power on the second key)."""
    import itertools

    from pyspark_cdc_engine.tables import DeltaliteTable

    t = DeltaliteTable(spark, str(tmp_path / "z"))
    rows = [(a, b, a * 100 + b) for a, b in itertools.product(range(64), range(64))]
    t.overwrite(spark.createDataFrame(rows, "a int, b int, v int"))
    v = t.zorder_by("a", "b", target_partitions=16)
    commit = t._read_commit(v)
    assert commit.get("zorder_curve") == "bit-interleaved"
    n_dirs = len(commit["live"])
    assert n_dirs >= 8

    def dirs_read(**bounds):
        df = t.scan(key_bounds=bounds)
        return len({f.rsplit("/", 1)[0] for f in df.inputFiles()}), df

    # narrow band on the FIRST key: prunes
    na, da = dirs_read(a=(10, 13))
    assert na <= n_dirs // 2, f"a-pruning weak: {na}/{n_dirs}"
    assert da.count() == 4 * 64
    # narrow band on the SECOND key: must ALSO prune (the z-curve's point)
    nb, db = dirs_read(b=(10, 13))
    assert nb <= n_dirs // 2, f"b-pruning weak: {nb}/{n_dirs}"
    assert db.count() == 4 * 64
    # correctness: 2-D box
    box = t.scan(key_bounds={"a": (0, 15), "b": (0, 15)})
    assert box.count() == 16 * 16


def test_compact_target_mb_sizes_output_from_actual_bytes(spark, tmp_path):
    """compact(target_mb=...) is the ACTION behind the >=128MB health
    heuristic: output file count derives from the rewritten bytes, so a
    fragmented table converges toward the target average file size."""
    from pyspark_cdc_engine.maintenance import table_health
    from pyspark_cdc_engine.tables import DeltaliteTable

    t = DeltaliteTable(spark, str(tmp_path / "t"))
    # 20 tiny appends -> many small files
    t.overwrite(spark.range(0, 5000).toDF("id"))
    for i in range(1, 20):
        t.append(spark.range(i * 5000, (i + 1) * 5000).toDF("id"))
    before = table_health(t)
    total_mb_ceil = -(-before["size_bytes"] // (1024 * 1024))
    t.compact(target_mb=1)
    after = table_health(t)
    assert after["num_files"] <= total_mb_ceil  # ~one file per target MB
    assert after["num_files"] < before["num_files"]
    assert after["avg_file_bytes"] > before["avg_file_bytes"]
    assert t.read().count() == 20 * 5000
    import pytest

    with pytest.raises(ValueError, match="not both"):
        t.compact(target_partitions=2, target_mb=1)


def test_delete_prunes_untouched_dirs_and_keeps_null_predicate_rows(spark, tmp_path):
    """DELETE FROM analog (r5): stats-pruned copy-on-write — dirs whose key
    range can't match survive VERBATIM; rows where the predicate is NULL are
    kept (SQL delete semantics); replay with the same txn tag is a no-op."""
    from pyspark.sql import functions as F

    from pyspark_cdc_engine.tables import DeltaliteTable

    t = DeltaliteTable(spark, str(tmp_path / "t"))
    # three key-range-disjoint commits -> three dirs with logged stats
    t.overwrite(spark.range(0, 100).select("id", (F.col("id") * 2.0).alias("v")))
    t.append(spark.range(100, 200).select("id", (F.col("id") * 2.0).alias("v")))
    t.append(
        spark.createDataFrame([(200, None), (201, 402.0)], "id long, v double")
    )
    live_before = t._read_commit(t.latest_version())["live"]

    v = t.delete("v > 300", prune_bounds={"id": (150, None)},
                 txn_app="del", txn_version=1)
    commit = t._read_commit(v)
    assert commit["operation"] == "delete"
    # the two dirs wholly below id=150 carried over untouched
    assert set(live_before[:1]) < set(commit["live"])
    assert commit.get("pruned_dirs_kept", 0) >= 1
    got = t.read()
    # v>300 matches ids 151..199 and 201; the NULL-v row (200) must survive
    assert got.count() == 151 + 1
    assert got.filter("id = 200").count() == 1
    assert got.filter("v > 300").count() == 0
    # time travel shows the pre-delete table
    assert t.read(version=v - 1).count() == 202
    # replayed batch: no-op
    assert t.delete("v > 0", prune_bounds=None, txn_app="del", txn_version=1) == v
    assert t.read().count() == 152


def test_delete_everything_pruned_is_noop_and_restore_ts(spark, tmp_path):
    import time as _time

    from pyspark_cdc_engine.tables import DeltaliteTable

    t = DeltaliteTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.range(10).toDF("id"))
    v0 = t.latest_version()
    ts_after_v0 = _time.time()
    # bounds disjoint from all data: no commit at all
    assert t.delete("id > 5", prune_bounds={"id": (1000, None)}) == v0
    t.append(spark.range(10, 20).toDF("id"))
    assert t.read().count() == 20
    t.restore_to_timestamp(ts_after_v0)
    assert t.read().count() == 10


def test_update_analog_and_cdf_delete_rows(spark, tmp_path):
    """UPDATE SET WHERE with stats pruning + the change feed emitting the
    exact deleted rows for delete commits."""
    from pyspark.sql import functions as F

    from pyspark_cdc_engine.tables import DeltaliteTable

    t = DeltaliteTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.range(0, 50).select("id", (F.col("id") * 1.0).alias("v")))
    t.append(spark.range(50, 100).select("id", (F.col("id") * 1.0).alias("v")))
    v_seed = t.latest_version()
    live_before = t._read_commit(v_seed)["live"]

    v_up = t.update({"v": "v + 1000"}, "id >= 90", prune_bounds={"id": (90, None)})
    commit = t._read_commit(v_up)
    assert commit["operation"] == "update"
    assert commit.get("pruned_dirs_kept") == 1  # the 0..49 dir untouched
    assert live_before[0] in commit["live"]
    got = t.read()
    assert got.filter("id >= 90 AND v < 1000").count() == 0
    assert got.filter("id < 90 AND v >= 1000").count() == 0
    assert got.count() == 100
    # replay no-op
    t.update({"v": "0.0"}, "id >= 0", txn_app="u", txn_version=1)
    assert t.update({"v": "-1.0"}, "id >= 0", txn_app="u", txn_version=1) \
        == t.latest_version()

    v_del = t.delete("id BETWEEN 95 AND 97")
    feed = t.read_changes(v_del - 1, v_del)
    dels = feed.filter("_change_type = 'delete'")
    assert sorted(r.id for r in dels.collect()) == [95, 96, 97]
    assert t.read().count() == 97


def test_update_widening_set_expression_stays_readable(spark, tmp_path):
    """Review r5b: a SET expression that would widen the column type (v+0.5 on
    LONG) must cast back to the column's type — otherwise the logged schema
    can no longer read the rewritten files."""
    from pyspark_cdc_engine.tables import DeltaliteTable

    t = DeltaliteTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.range(10).selectExpr("id", "id AS v"))
    t.update({"v": "v + 0.5"}, "id = 1")
    got = t.read()  # would throw on a schema/file type mismatch
    assert dict(got.dtypes)["v"] == "bigint"
    assert got.filter("id = 1").first().v == 1  # 1 + 0.5 cast back to long
    assert got.count() == 10


def test_change_feed_delete_rows_survive_later_rename(spark, tmp_path):
    """Review r5b: the recorded delete predicate binds to the DELETE commit's
    own column names; a later rename must neither crash the feed nor bind the
    predicate to the wrong column — and the emitted rows surface under the
    END version's names."""
    from pyspark.sql import functions as F

    from pyspark_cdc_engine.tables import DeltaliteTable

    t = DeltaliteTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.range(10).select("id", (F.col("id") * 1.0).alias("amount")))
    v_del = t.delete("amount < 3.0")
    t.rename_column("amount", "amt")
    feed = t.read_changes(0)
    assert "amt" in feed.columns and "amount" not in feed.columns
    dels = feed.filter("_change_type = 'delete'")
    assert sorted(r.id for r in dels.collect()) == [0, 1, 2]
    assert sorted(r.amt for r in dels.collect()) == [0.0, 1.0, 2.0]
    # and an end bound beyond the latest commit clamps instead of crashing
    assert t.read_changes(0, t.latest_version() + 5).count() == feed.count()


def test_zorder_four_keys_no_bit_overflow(spark, tmp_path):
    """Review r5b: bit positions >= 31 (4+ keys x 8 bits) must shift in
    64-bit space — pruning on the LAST key still works and no z-value goes
    negative through an int overflow."""
    import itertools

    from pyspark_cdc_engine.tables import DeltaliteTable

    t = DeltaliteTable(spark, str(tmp_path / "z4"))
    rows = [
        (a, b, c, d)
        for a, b, c, d in itertools.product(range(8), range(8), range(8), range(8))
    ]
    t.overwrite(spark.createDataFrame(rows, "a int, b int, c int, d int"))
    v = t.zorder_by("a", "b", "c", "d", target_partitions=16)
    n_dirs = len(t._read_commit(v)["live"])
    for key in ("a", "d"):
        df = t.scan(key_bounds={key: (0, 1)})
        dirs = {f.rsplit("/", 1)[0] for f in df.inputFiles()}
        assert len(dirs) < n_dirs, f"no pruning on {key}"
        assert df.count() == 2 * 8 * 8 * 8


def test_compact_target_mb_zero_rejected(spark, tmp_path):
    import pytest

    from pyspark_cdc_engine.tables import DeltaliteTable

    t = DeltaliteTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.range(5).toDF("id"))
    with pytest.raises(ValueError, match="positive"):
        t.compact(target_mb=0)


def test_zvalue_many_keys_stays_in_63_bits(spark, tmp_path):
    """shiftleft wraps shift amounts mod 64: with 9+ cluster keys the z-curve
    must shrink per-key bits so no interleaved bit lands past position 62 —
    high-order bits folding onto low positions silently de-clusters the
    layout."""
    from pyspark.sql import functions as F

    t = DeltaliteTable(spark, str(tmp_path / "zbits"))
    n_keys = 10  # at 8 bits/key this would need 80 bit positions
    cols = [f"k{i}" for i in range(n_keys)]
    df = spark.range(256).select(
        "id", *[(F.col("id") * (i + 1) % 251).alias(c) for i, c in enumerate(cols)]
    )
    t.overwrite(df)
    z = t._zvalue_expr(df, cols)
    assert z is not None
    stats = df.select(z.alias("z")).agg(
        F.min("z").alias("lo"), F.max("z").alias("hi")
    ).first()
    assert stats.lo >= 0
    assert stats.hi < (1 << 63)
    # 63 // 10 = 6 bits per key -> max position 6*10-1 = 59
    assert stats.hi < (1 << 60)
    # the curve still discriminates: a full zorder pass stays correct
    t.zorder_by(*cols, target_partitions=4)
    assert t.read().count() == 256


# -------------------------------------------- disjoint-file concurrent DML (r8)


def _two_dir_table(spark, tmp_path):
    """Two data dirs with disjoint id ranges (stats logged at write time)."""
    from pyspark_cdc_engine.tables import DeltaliteTable

    t = DeltaliteTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.range(0, 10).selectExpr("id", "CAST(id AS DOUBLE) AS v"))
    t.append(spark.range(100, 110).selectExpr("id", "CAST(id AS DOUBLE) AS v"))
    return t


def _interleave(victim, action):
    """Run ``action`` inside ``victim``'s data-write window, so the victim's
    commit targets a stale snapshot (the classic OCC race)."""
    from pyspark_cdc_engine.tables import DeltaliteTable

    orig = DeltaliteTable._write_data_dir
    state = {"fired": False}

    def hook(df, hint, partition_by=None, **kw):
        rel = orig(victim, df, hint, partition_by=partition_by, **kw)
        if not state["fired"]:
            state["fired"] = True
            action()
        return rel

    victim._write_data_dir = hook
    return victim


def test_concurrent_disjoint_cow_deletes_both_succeed(spark, tmp_path):
    """Delta WriteSerializable: two stats-pruned DELETEs touching disjoint
    files both land — the loser re-resolves against the new snapshot and
    re-links its staged rewrite. Final state equals the serial result."""
    from pyspark_cdc_engine.tables import DeltaliteTable

    t = _two_dir_table(spark, tmp_path)
    a = DeltaliteTable(spark, t.path)
    b = DeltaliteTable(spark, t.path)
    _interleave(a, lambda: b.delete("id = 105", prune_bounds={"id": (100, 109)}))
    a.delete("id = 3", prune_bounds={"id": (0, 9)})
    assert sorted(r.id for r in t.read().collect()) == (
        [i for i in range(10) if i != 3]
        + [i for i in range(100, 110) if i != 105]
    )
    ops = [h["operation"] for h in t.history()]
    assert ops[:2] == ["delete", "delete"]  # no lost update, no merge-away


def test_concurrent_overlapping_cow_deletes_refuse(spark, tmp_path):
    """Same race on the SAME file: the loser must abort (its rewrite was
    computed against pre-rival bytes — re-linking would bury the rival)."""
    from pyspark_cdc_engine.log import ConcurrentWriteError
    from pyspark_cdc_engine.tables import DeltaliteTable

    t = _two_dir_table(spark, tmp_path)
    a = DeltaliteTable(spark, t.path)
    b = DeltaliteTable(spark, t.path)
    _interleave(a, lambda: b.delete("id = 5", prune_bounds={"id": (0, 9)}))
    with pytest.raises(ConcurrentWriteError, match="shared file"):
        a.delete("id = 3", prune_bounds={"id": (0, 9)})
    # rival's delete intact, victim's aborted cleanly
    assert sorted(r.id for r in t.read().collect()) == (
        [i for i in range(10) if i != 5] + list(range(100, 110))
    )


def test_concurrent_append_and_delete_both_succeed(spark, tmp_path):
    """A blind append interleaving a DELETE never conflicts (the
    WriteSerializable history: the delete simply doesn't see the new rows)."""
    from pyspark_cdc_engine.tables import DeltaliteTable

    t = _two_dir_table(spark, tmp_path)
    a = DeltaliteTable(spark, t.path)
    b = DeltaliteTable(spark, t.path)
    _interleave(a, lambda: b.append(
        spark.range(200, 203).selectExpr("id", "CAST(id AS DOUBLE) AS v")))
    a.delete("id < 2", prune_bounds={"id": (0, 9)})
    assert sorted(r.id for r in t.read().collect()) == (
        list(range(2, 10)) + list(range(100, 110)) + [200, 201, 202]
    )


def test_concurrent_disjoint_dv_deletes_both_succeed(spark, tmp_path):
    """Merge-on-read deletes on disjoint files compose: the loser rebases its
    sidecar onto the new snapshot's DV list."""
    from pyspark_cdc_engine.tables import DeltaliteTable

    t = _two_dir_table(spark, tmp_path)
    a = DeltaliteTable(spark, t.path)
    b = DeltaliteTable(spark, t.path)

    orig = DeltaliteTable._write_dv_sidecar
    state = {"fired": False}

    def hook(self_, tombstones, hint):
        rel = orig(a, tombstones, hint)
        if not state["fired"]:
            state["fired"] = True
            b.delete("id = 107", prune_bounds={"id": (100, 109)}, mode="dv")
        return rel

    a._write_dv_sidecar = hook.__get__(a)
    a.delete("id = 4", prune_bounds={"id": (0, 9)}, mode="dv")
    assert sorted(r.id for r in t.read().collect()) == (
        [i for i in range(10) if i != 4]
        + [i for i in range(100, 110) if i != 107]
    )
    # both commits carry their own sidecar and the union of DV lists
    assert len(t._read_commit(t.latest_version()).get("dv_files") or []) == 2


def test_concurrent_overlapping_dv_deletes_refuse(spark, tmp_path):
    """Two DV deletes tombstoning into the SAME file: the loser aborts (the
    change feed must attribute each row's delete to exactly one commit)."""
    from pyspark_cdc_engine.log import ConcurrentWriteError
    from pyspark_cdc_engine.tables import DeltaliteTable

    t = _two_dir_table(spark, tmp_path)
    a = DeltaliteTable(spark, t.path)
    b = DeltaliteTable(spark, t.path)

    orig = DeltaliteTable._write_dv_sidecar
    state = {"fired": False}

    def hook(self_, tombstones, hint):
        rel = orig(a, tombstones, hint)
        if not state["fired"]:
            state["fired"] = True
            b.delete("id = 6", prune_bounds={"id": (0, 9)}, mode="dv")
        return rel

    a._write_dv_sidecar = hook.__get__(a)
    with pytest.raises(ConcurrentWriteError, match="tombstoned into shared"):
        a.delete("id = 4", prune_bounds={"id": (0, 9)}, mode="dv")
    assert sorted(r.id for r in t.read().collect()) == (
        [i for i in range(10) if i != 6] + list(range(100, 110))
    )


def test_delete_retry_refuses_interleaved_overwrite(spark, tmp_path):
    """History-rewriting interleaves (overwrite/restore/DDL) still abort a
    DML retry regardless of file overlap."""
    from pyspark_cdc_engine.log import ConcurrentWriteError
    from pyspark_cdc_engine.tables import DeltaliteTable

    t = _two_dir_table(spark, tmp_path)
    a = DeltaliteTable(spark, t.path)
    b = DeltaliteTable(spark, t.path)
    _interleave(a, lambda: b.overwrite(
        spark.range(500, 505).selectExpr("id", "id * 1.0 AS v")))
    with pytest.raises(ConcurrentWriteError):
        a.delete("id = 3", prune_bounds={"id": (0, 9)})
    assert sorted(r.id for r in t.read().collect()) == list(range(500, 505))


def test_concurrent_disjoint_merges_both_succeed(spark, tmp_path):
    """Two file-skipping MERGEs (CDC appliers on disjoint key ranges) both
    land — the Delta WriteSerializable shape two regional replicators hit."""
    from pyspark_cdc_engine.tables import DeltaliteTable, MergeClause

    t = _two_dir_table(spark, tmp_path)
    a = DeltaliteTable(spark, t.path)
    b = DeltaliteTable(spark, t.path)
    up = [MergeClause("update", None, {"v": "source.v"}),
          MergeClause("insert", None, None)]
    _interleave(a, lambda: b.merge(
        spark.createDataFrame([(105, 5000.0)], ["id", "v"]),
        "target.id = source.id", up, prune_on="id"))
    a.merge(
        spark.createDataFrame([(3, 300.0)], ["id", "v"]),
        "target.id = source.id", up, prune_on="id",
    )
    got = {r.id: r.v for r in t.read().collect()}
    assert got[3] == 300.0 and got[105] == 5000.0 and len(got) == 20


def test_concurrent_overlapping_merges_refuse(spark, tmp_path):
    """Both merges rewrite the same dir: the loser aborts."""
    from pyspark_cdc_engine.log import ConcurrentWriteError
    from pyspark_cdc_engine.tables import DeltaliteTable, MergeClause

    t = _two_dir_table(spark, tmp_path)
    a = DeltaliteTable(spark, t.path)
    b = DeltaliteTable(spark, t.path)
    up = [MergeClause("update", None, {"v": "source.v"})]
    _interleave(a, lambda: b.merge(
        spark.createDataFrame([(5, 1.0)], ["id", "v"]),
        "target.id = source.id", up, prune_on="id"))
    with pytest.raises(ConcurrentWriteError, match="shared file"):
        a.merge(
            spark.createDataFrame([(3, 2.0)], ["id", "v"]),
            "target.id = source.id", up, prune_on="id",
        )
    got = {r.id: r.v for r in t.read().collect()}
    assert got[5] == 1.0 and got[3] == 3.0  # rival intact, victim aborted


def test_concurrent_disjoint_dml_random_program_matches_serial(spark, tmp_path):
    """Randomized OCC property (seeded): for random pairs of DML operations
    on DISJOINT key ranges, racing them (B commits inside A's write window)
    must yield exactly the state of applying them serially — regardless of
    operation kind (cow/DV delete, cow/DV update, file-skipping merge)."""
    import random

    from pyspark_cdc_engine.tables import DeltaliteTable, MergeClause

    rng = random.Random(8)

    def ops_for(lo, hi, tag):
        k = rng.randrange(lo, hi)
        pb = {"id": (lo, hi - 1)}
        return rng.choice([
            lambda t: t.delete(f"id = {k}", prune_bounds=pb),
            lambda t: t.delete(f"id = {k}", prune_bounds=pb, mode="dv"),
            lambda t: t.update({"v": f"v + {tag}.0"}, f"id = {k}", prune_bounds=pb),
            lambda t: t.update({"v": f"v + {tag}.0"}, f"id = {k}", prune_bounds=pb, mode="dv"),
            lambda t: t.merge(
                spark.createDataFrame([(k, float(tag * 1000))], ["id", "v"]),
                "target.id = source.id",
                [MergeClause("update", None, {"v": "source.v"})],
                prune_on="id",
            ),
        ])

    for trial in range(5):
        rng2 = random.Random(100 + trial)
        raced = _two_dir_table(spark, tmp_path / f"raced{trial}")
        serial = _two_dir_table(spark, tmp_path / f"serial{trial}")
        op_a = ops_for(0, 10, 1)
        op_b = ops_for(100, 110, 2)
        # serial: B then A (B wins the race below, so B is serialized first)
        op_b(serial)
        op_a(serial)
        a = DeltaliteTable(spark, raced.path)
        b = DeltaliteTable(spark, raced.path)
        fired = {"done": False}
        orig_dir = DeltaliteTable._write_data_dir
        orig_dv = DeltaliteTable._write_dv_sidecar

        def hook_dir(df, hint, partition_by=None, **kw):
            rel = orig_dir(a, df, hint, partition_by=partition_by, **kw)
            if not fired["done"]:
                fired["done"] = True
                op_b(b)
            return rel

        def hook_dv(tombstones, hint):
            rel = orig_dv(a, tombstones, hint)
            if not fired["done"]:
                fired["done"] = True
                op_b(b)
            return rel

        a._write_data_dir = hook_dir
        a._write_dv_sidecar = hook_dv
        op_a(a)
        assert fired["done"], "race never fired"
        got = sorted(tuple(r) for r in raced.read().collect())
        want = sorted(tuple(r) for r in serial.read().collect())
        assert got == want, f"trial {trial} diverged"


def test_concurrent_dv_delete_on_partitioned_table_conflicts(spark, tmp_path):
    """The DV-overlap probe must map sidecar file paths to PARTITION-LEAF
    dirs (the shape `live`/touched entries use) — r8's first cut truncated
    to data/<top> and could never fire on partitioned tables, silently
    resurrecting a rival's tombstones under the victim's rewrite."""
    from pyspark_cdc_engine.log import ConcurrentWriteError
    from pyspark_cdc_engine.tables import DeltaliteTable

    t = DeltaliteTable(spark, str(tmp_path / "t"))
    t.overwrite(
        spark.range(12).selectExpr(
            "id", "CAST(id AS DOUBLE) AS v", "CAST(id % 2 AS STRING) AS k"
        ),
        partition_by=["k"],
    )
    a = DeltaliteTable(spark, t.path)
    b = DeltaliteTable(spark, t.path)
    # rival B tombstones a row in the SAME partition A is rewriting
    _interleave(a, lambda: b.delete("id = 4", mode="dv"))
    with pytest.raises(ConcurrentWriteError, match="tombstoned into shared"):
        a.delete("id = 6")  # cow rewrite of every partition (no bounds)
    # B's delete survived; A aborted without burying it
    assert sorted(r.id for r in t.read().collect()) == [
        i for i in range(12) if i != 4
    ]
