"""The ``deltalite`` snapshot data source + persisted name bindings:
SQL binding (CREATE TEMPORARY VIEW ... USING deltalite), per-call
freshness of the read API, DV tombstones, column mapping, time travel,
cross-process binding persistence, and the sql/ corpus running against
bound names with zero per-session Python view registration."""

import subprocess
import sys
import textwrap
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from pyspark_cdc_engine.dl_source import (
    bind_table,
    restore_bindings,
    unbind_table,
)
from pyspark_cdc_engine.maintenance import (
    register_cdc_tables,
    run_sql_scripts,
)
from pyspark_cdc_engine.tables import DeltaliteTable
from tests.conftest import SF_DIR

REPO_SQL = str(Path(__file__).resolve().parents[1] / "sql")


@pytest.fixture()
def nation_tbl(spark, tmp_path):
    t = DeltaliteTable(spark, str(tmp_path / "nation"))
    t.overwrite(spark.read.parquet(f"{SF_DIR}/nation.parquet"))
    return t


def _view(spark, name, path, **opts):
    o = ", ".join(
        [f"path '{path}'"] + [f"{k} '{v}'" for k, v in opts.items()]
    )
    spark.sql(
        f"CREATE OR REPLACE TEMPORARY VIEW {name} "
        f"USING deltalite OPTIONS ({o})"
    )


def test_sql_binding_equals_python_read(spark, nation_tbl):
    _view(spark, "dl_nation", nation_tbl.path)
    got = spark.sql("SELECT * FROM dl_nation")
    want = nation_tbl.read()
    assert got.schema == want.schema
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert spark.catalog.tableExists("dl_nation")  # the bootstrap probe


def test_read_api_is_fresh_per_call(spark, nation_tbl):
    """spark.read.format('deltalite').load(path) resolves the log per
    CALL — an append between two loads is visible to the second."""
    n0 = spark.read.format("deltalite").load(nation_tbl.path).count()
    nation_tbl.append(nation_tbl.read().limit(3))
    n1 = spark.read.format("deltalite").load(nation_tbl.path).count()
    assert n1 == n0 + 3


def test_version_as_of_time_travel(spark, nation_tbl):
    v0 = nation_tbl.latest_version()
    n0 = nation_tbl.read().count()
    nation_tbl.append(nation_tbl.read().limit(2))
    _view(spark, "dl_nation_v", nation_tbl.path, versionAsOf=v0)
    assert spark.sql("SELECT COUNT(*) AS c FROM dl_nation_v").collect()[0].c == n0


def test_dv_tombstones_applied(spark, nation_tbl):
    nation_tbl.delete("n_nationkey % 2 = 0", mode="dv")
    _view(spark, "dl_nation_dv", nation_tbl.path)
    keys = [
        r.n_nationkey
        for r in spark.sql("SELECT n_nationkey FROM dl_nation_dv").collect()
    ]
    assert keys and all(k % 2 == 1 for k in keys)
    assert sorted(keys) == sorted(
        r.n_nationkey for r in nation_tbl.read().collect()
    )


def test_fully_tombstoned_file_reads_clean(spark, tmp_path):
    """A file whose every row is tombstoned must vanish silently (the
    empty-take pyarrow kernel trap)."""
    t = DeltaliteTable(spark, str(tmp_path / "ft"))
    t.overwrite(spark.range(4).selectExpr("id AS a").repartition(2))
    t.delete("a IS NOT NULL", mode="dv")  # tombstone everything
    got = spark.read.format("deltalite").load(t.path).collect()
    assert got == []


def test_column_mapping_reads_logical_names(spark, nation_tbl):
    nation_tbl.rename_column("n_name", "nation_name")
    _view(spark, "dl_nation_cm", nation_tbl.path)
    got = spark.sql(
        "SELECT n_nationkey, nation_name FROM dl_nation_cm ORDER BY n_nationkey"
    ).collect()
    want = (
        nation_tbl.read()
        .select("n_nationkey", "nation_name")
        .orderBy("n_nationkey")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_partition_dirs_rehydrate(spark, tmp_path):
    t = DeltaliteTable(spark, str(tmp_path / "part"))
    n = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    t.overwrite(n, partition_by=["n_regionkey"])
    _view(spark, "dl_part", t.path)
    got = spark.sql(
        "SELECT n_regionkey, COUNT(*) AS c FROM dl_part GROUP BY 1"
    ).collect()
    want = n.groupBy("n_regionkey").count().collect()
    assert {(r.n_regionkey, r.c) for r in got} == {
        (r.n_regionkey, r["count"]) for r in want
    }


def test_nested_struct_array_table_binds(spark, tmp_path):
    """The CDC tables carry arrays of structs — the tuple fallback path
    must round-trip them."""
    from tests.cdc_fixtures import insert_tx, write_fixture_files
    from pyspark_cdc_engine.streaming.pipeline import cdc_to_scd2_batch

    base = tmp_path / "mx"
    txs = [insert_tx(i, f"m.{i}", f"5{i:03d}") for i in range(1, 4)]
    write_fixture_files(base / "cdc", base / "meta", txs)
    batch = cdc_to_scd2_batch(spark, str(base / "cdc"), str(base / "meta"))
    t = DeltaliteTable(spark, str(base / "order_stream"))
    t.overwrite(batch)
    _view(spark, "dl_os", t.path)
    got = spark.sql(
        "SELECT orderId, try_element_at(orders, 1).orderStatus AS st,"
        " size(lineItems) AS li FROM dl_os ORDER BY orderId"
    ).collect()
    want = (
        t.read()
        .select(
            "orderId",
            F.expr("try_element_at(orders, 1).orderStatus").alias("st"),
            F.size("lineItems").alias("li"),
        )
        .orderBy("orderId")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_bind_table_registry_roundtrip(spark, nation_tbl, tmp_path):
    """bind_table records the binding; restore_bindings replays it (and
    refreshes a stale one to the table's current latest)."""
    bind_table(spark, "bound_nation", nation_tbl.path)
    try:
        n0 = spark.sql("SELECT COUNT(*) AS c FROM bound_nation").collect()[0].c
        nation_tbl.append(nation_tbl.read().limit(2))
        # the binding is a snapshot as of creation; replaying refreshes it
        restored = restore_bindings(spark)
        assert "bound_nation" in restored
        n1 = spark.sql("SELECT COUNT(*) AS c FROM bound_nation").collect()[0].c
        assert n1 == n0 + 2
    finally:
        unbind_table(spark, "bound_nation")
    assert not spark.catalog.tableExists("bound_nation")


def test_bind_table_rejects_non_identifier(spark, nation_tbl):
    with pytest.raises(ValueError, match="bare identifier"):
        bind_table(spark, "bad;name", nation_tbl.path)


def test_sql_corpus_runs_against_bound_names(spark, tmp_path):
    """The reference's consumption model: bind the CDC tables + consumer
    views by NAME via register_cdc_tables and run the whole sql/ corpus
    through spark.sql with zero temp-view or DataFrame registration."""
    from tests.cdc_fixtures import insert_tx, write_fixture_files
    from pyspark_cdc_engine.streaming.pipeline import cdc_to_scd2_batch
    from pyspark_cdc_engine.scd1 import merge_scd1

    base = tmp_path / "mx"
    txs = [insert_tx(i, f"m.{i}", f"5{i:03d}") for i in range(1, 6)]
    write_fixture_files(base / "cdc", base / "meta", txs)
    batch = cdc_to_scd2_batch(spark, str(base / "cdc"), str(base / "meta"))
    scd2 = DeltaliteTable(spark, str(base / "order_stream"))
    scd2.overwrite(batch)
    scd1 = DeltaliteTable(spark, str(base / "orders_current"))
    merge_scd1(spark, scd2.read(), scd1)

    register_cdc_tables(
        spark,
        order_stream_path=scd2.path,
        orders_current_path=scd1.path,
    )
    try:
        assert spark.catalog.tableExists("order_stream")
        executed = run_sql_scripts(spark, REPO_SQL)
        assert len(executed) >= 10
        assert (
            spark.sql("SELECT COUNT(*) AS c FROM order_stream_current")
            .collect()[0].c == 5
        )
        # a NEW SCD1 merge becomes visible after a binding refresh
        txs2 = [insert_tx(6, "m.6", "5006")]
        write_fixture_files(base / "cdc2", base / "meta2", txs2)
        b2 = cdc_to_scd2_batch(spark, str(base / "cdc2"), str(base / "meta2"))
        merge_scd1(spark, b2, scd1)
        restore_bindings(spark)
        assert (
            spark.sql("SELECT COUNT(*) AS c FROM orders_current_view")
            .collect()[0].c == 6
        )
    finally:
        for n in ("order_stream", "orders_current", "order_stream_current",
                  "order_stream_changes", "orders_current_view"):
            unbind_table(spark, n)


_WRITER = """
import sys
sys.path.insert(0, {repo!r})
from pyspark_cdc_engine.session import get_spark
from pyspark_cdc_engine.tables import DeltaliteTable
from pyspark_cdc_engine.dl_source import bind_table
spark = get_spark(app_name="binding-writer", master="local[2]",
                  extra_confs={{"spark.sql.warehouse.dir": {wh!r}}},
                  config=None)
t = DeltaliteTable(spark, {tbl!r})
t.overwrite(spark.range(7).selectExpr("id AS a", "id * 2 AS b"))
bind_table(spark, "persisted_dl", {tbl!r})
assert spark.catalog.tableExists("persisted_dl")
print("WRITER_OK", spark.sql("SELECT SUM(b) AS s FROM persisted_dl").collect()[0].s)
spark.stop()
"""

_READER = """
import sys
sys.path.insert(0, {repo!r})
from pyspark_cdc_engine.session import get_spark
spark = get_spark(app_name="binding-reader", master="local[2]",
                  extra_confs={{"spark.sql.warehouse.dir": {wh!r}}},
                  config=None)
assert spark.catalog.tableExists("persisted_dl"), "binding did not persist"
print("READER_OK", spark.sql("SELECT SUM(b) AS s FROM persisted_dl").collect()[0].s)
spark.stop()
"""


@pytest.mark.heavy
def test_binding_persists_across_sessions(tmp_path):
    """Two separate OS processes share a warehouse dir: the first binds
    the deltalite table to a name, the second — a completely fresh
    get_spark session, no view registration — resolves the name and reads
    the data. The reference's 'any session queries the name' contract on
    the surface Spark's Python DS API supports."""
    import os

    repo = str(Path(__file__).resolve().parents[1])
    env_script = dict(
        repo=repo,
        wh=str(tmp_path / "wh"),
        tbl=str(tmp_path / "dl_tbl"),
    )
    env = dict(os.environ)
    w = subprocess.run(
        [sys.executable, "-c", textwrap.dedent(_WRITER).format(**env_script)],
        capture_output=True, text=True, timeout=600, env=env, cwd=repo,
    )
    assert "WRITER_OK 42" in w.stdout, w.stdout + w.stderr
    r = subprocess.run(
        [sys.executable, "-c", textwrap.dedent(_READER).format(**env_script)],
        capture_output=True, text=True, timeout=600, env=env, cwd=repo,
    )
    assert "READER_OK 42" in r.stdout, r.stdout + r.stderr


def test_bind_table_path_with_quote_is_escaped(spark, tmp_path):
    """A path containing a single quote must not break the spliced
    CREATE TEMPORARY VIEW ... USING deltalite statement (or inject SQL) —
    the path literal is SQL-escaped (r11 ADVICE)."""
    qdir = tmp_path / "o'brien"
    t = DeltaliteTable(spark, str(qdir / "tbl"))
    t.overwrite(spark.range(5).withColumnRenamed("id", "a"))
    try:
        bind_table(spark, "quoted_path_tbl", t.path)
        assert spark.sql("SELECT COUNT(*) c FROM quoted_path_tbl").first().c == 5
        # and registry replay (the startup path) handles it too
        spark.sql("DROP VIEW IF EXISTS quoted_path_tbl")
        assert "quoted_path_tbl" in restore_bindings(spark)
        assert spark.sql("SELECT COUNT(*) c FROM quoted_path_tbl").first().c == 5
    finally:
        unbind_table(spark, "quoted_path_tbl")


def test_restore_bindings_warns_on_broken_binding(spark, tmp_path):
    """A binding whose view body no longer parses is skipped WITH a warning
    naming it — not silently vanished (r11 ADVICE)."""
    import warnings

    from pyspark_cdc_engine.dl_source import bind_view

    bind_view(spark, "ok_probe_view", "SELECT 1 AS one")
    # corrupt a second binding directly in the registry
    from pyspark_cdc_engine.dl_source import _bindings_path, _update_bindings

    _update_bindings(
        spark,
        lambda b: b.__setitem__(
            "broken_probe_view", {"kind": "view", "sql": "SELEC oops FROM"}
        ),
    )
    try:
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            restored = restore_bindings(spark)
        assert "ok_probe_view" in restored
        assert "broken_probe_view" not in restored
        msgs = [str(w.message) for w in caught]
        assert any("broken_probe_view" in m for m in msgs), msgs
    finally:
        unbind_table(spark, "ok_probe_view")
        unbind_table(spark, "broken_probe_view")


def test_concurrent_binding_updates_do_not_lose_entries(spark, tmp_path, nation_tbl):
    """The registry read-modify-write is serialized by a lock file: many
    concurrent binders all land in the file (last-writer-wins previously
    dropped entries; r11 ADVICE)."""
    import threading

    from pyspark_cdc_engine.dl_source import _load_bindings, _update_bindings

    names = [f"race_bind_{i}" for i in range(16)]
    errs = []

    def add(n):
        try:
            _update_bindings(
                spark, lambda b: b.__setitem__(n, {"path": nation_tbl.path})
            )
        except Exception as e:  # surface in main thread
            errs.append(e)

    threads = [threading.Thread(target=add, args=(n,)) for n in names]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    try:
        bound = _load_bindings(spark)
        missing = [n for n in names if n not in bound]
        assert not missing, f"lost concurrent bindings: {missing}"
    finally:
        for n in names:
            unbind_table(spark, n)
