"""Opt-in integration smokes against the REAL spark-sql-kafka and delta-spark
artifacts (VERDICT r4 #5). This environment ships neither jar, so every test
here auto-skips cleanly; in an environment that has them (e.g. a session
launched with ``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``
and/or ``pip install delta-spark`` + the Delta session extensions), run:

    python -m pytest -m realjars tests/test_real_jars.py -q

What each smoke pins:
- S1 against the real Kafka source provider: our ``read_kafka_stream`` (the
  production reader, not the fake) must RESOLVE through
  ``KafkaSourceProvider`` and produce the wire schema — the exact surface the
  reference consumes (TransactionalCdcProcessingApp.scala:85-92). No broker
  needed: the Kafka relation is constructed lazily and only connects at
  stream start.
- delta interop both ways: a deltalite snapshot exported by
  ``export_delta_snapshot`` must read back through REAL delta
  (``spark.read.format("delta")``), and a table written by real delta must
  read through our jar-free ``read_delta_snapshot`` — each side validates the
  other against the actual implementation instead of our own mirror
  (SparkSessionCreator.scala:28-29 is the reference's Delta wiring).
"""

from __future__ import annotations

import importlib.util

import pytest


def _kafka_provider_present(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def _delta_present(spark) -> bool:
    if importlib.util.find_spec("delta") is None:
        return False
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.delta.catalog.DeltaCatalog"
        )
        return True
    except Exception:
        return False


@pytest.mark.realjars
def test_real_kafka_source_resolves_with_reference_options(spark):
    if not _kafka_provider_present(spark):
        pytest.skip("spark-sql-kafka jar not on the classpath")
    from pyspark_cdc_engine.fake_kafka import KAFKA_WIRE_SCHEMA
    from pyspark_cdc_engine.sources import read_kafka_stream

    df = read_kafka_stream(
        spark, "localhost:9092", "smoke.topic", format_name="kafka"
    )
    # read_kafka_stream projects value to string; the underlying relation must
    # expose Kafka's full wire schema (identical to the fake's contract)
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", "localhost:9092")
        .option("subscribe", "smoke.topic")
        .load()
    )
    assert raw.schema == KAFKA_WIRE_SCHEMA
    assert df.schema.fieldNames() == ["value"]
    assert df.isStreaming


@pytest.mark.realjars
def test_delta_reads_our_export_and_we_read_deltas(spark, tmp_path):
    if not _delta_present(spark):
        pytest.skip("delta-spark not installed / Delta classes absent")
    from pyspark_cdc_engine.delta_export import (
        export_delta_snapshot,
        read_delta_snapshot,
    )
    from pyspark_cdc_engine.tables import DeltaliteTable

    # deltalite -> real delta
    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(50).selectExpr("id", "CAST(id * 1.5 AS DOUBLE) AS v"))
    dest = tmp_path / "exported"
    export_delta_snapshot(t, str(dest))
    got = spark.read.format("delta").load(str(dest))
    assert got.count() == 50
    assert {r.id for r in got.collect()} == set(range(50))

    # real delta -> our jar-free reader
    real = tmp_path / "real_delta"
    spark.range(20).selectExpr("id", "id % 3 AS k").write.format("delta").save(
        str(real)
    )
    back = read_delta_snapshot(spark, str(real))
    assert back.count() == 20
    assert {r.id for r in back.collect()} == set(range(20))


@pytest.mark.realjars
def test_real_delta_reads_our_pruned_history_export(spark, tmp_path):
    """A retention-pruned deltalite log exports as a metadata-cleaned real
    Delta log (boundary checkpoint parquet + JSON commits); real delta-spark
    must time travel within the retained window and read the latest
    snapshot."""
    if not _delta_present(spark):
        pytest.skip("delta-spark not installed / Delta classes absent")
    from pyspark_cdc_engine.delta_export import export_delta_history
    from pyspark_cdc_engine.tables import DeltaliteTable

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(10).selectExpr("id", "CAST(id AS DOUBLE) AS v"))
    for i in range(28):
        t.append(spark.range(100 + i, 101 + i).selectExpr(
            "id", "CAST(id AS DOUBLE) AS v"))
    t.cleanup_log(retain_last=5)
    oldest = t._oldest_retained()
    assert oldest > 0
    hist = tmp_path / "hist"
    export_delta_history(t, str(hist))
    latest = spark.read.format("delta").load(str(hist))
    assert latest.count() == t.read().count()
    tt = (spark.read.format("delta").option("versionAsOf", oldest)
          .load(str(hist)))
    assert tt.count() == t.read(version=oldest).count()


def test_realjars_suite_skips_cleanly_without_jars(spark):
    """Meta-test (always runs): in a jar-less env the probes report absent and
    the marked tests above skip instead of erroring — the opt-in contract."""
    # Probes must return a clean boolean, never raise
    assert _kafka_provider_present(spark) in (True, False)
    assert _delta_present(spark) in (True, False)


@pytest.mark.realjars
def test_we_read_real_delta_deletion_vectors(spark, tmp_path):
    """A real delta-spark DELETE/UPDATE (DVs on by default since 3.4, forced
    on here) must import through our jar-free reader with the deleted rows
    absent, and table_changes-equivalent feeds must be row-exact."""
    if not _delta_present(spark):
        pytest.skip("delta-spark not installed / Delta classes absent")
    from pyspark_cdc_engine.delta_export import (
        read_delta_changes,
        read_delta_snapshot,
    )

    real = tmp_path / "real_dv"
    (spark.range(40).selectExpr("id", "id % 4 AS k")
     .write.format("delta")
     .option("delta.enableDeletionVectors", "true").save(str(real)))
    spark.sql(
        f"ALTER TABLE delta.`{real}` "
        f"SET TBLPROPERTIES (delta.enableDeletionVectors = true)"
    )
    spark.sql(f"DELETE FROM delta.`{real}` WHERE id % 5 = 0")  # v2, DV
    # the write really used DVs (otherwise this smoke tests nothing)
    import json as _json

    log_lines = [
        _json.loads(ln)
        for p in sorted((real / "_delta_log").glob("*.json"))
        for ln in p.read_text().splitlines()
    ]
    assert any(
        a.get("add", {}).get("deletionVector") for a in log_lines
    ), "delta-spark did not write DVs — smoke inconclusive"
    back = read_delta_snapshot(spark, str(real))
    assert {r.id for r in back.collect()} == {
        i for i in range(40) if i % 5 != 0
    }
    feed = read_delta_changes(spark, str(real), 0)
    dels = {r.id for r in feed.filter("_change_type = 'delete'").collect()}
    assert dels == {i for i in range(40) if i % 5 == 0}


@pytest.mark.realjars
def test_real_delta_reads_our_native_dv_export(spark, tmp_path):
    """The inverse of the DV-import smoke: a history exported with
    dv='native' (real roaring-bitmap sidecars + descriptor-bearing adds,
    reader 3 / writer 7) must read through REAL delta-spark at the latest
    version and time travel across the DV states."""
    if not _delta_present(spark):
        pytest.skip("delta-spark not installed / Delta classes absent")
    from pyspark_cdc_engine.delta_export import export_delta_history
    from pyspark_cdc_engine.tables import DeltaliteTable

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(25).selectExpr("id", "CAST(id AS DOUBLE) AS v"))
    t.delete("id % 6 = 1", mode="dv")
    t.update({"v": "v * 2.0"}, "id = 4", mode="dv")
    hist = tmp_path / "hist"
    export_delta_history(t, str(hist), dv="native")
    got = spark.read.format("delta").load(str(hist))
    assert sorted((r.id, r.v) for r in got.collect()) == sorted(
        (r.id, r.v) for r in t.read().collect()
    )
    for v in range(t.latest_version() + 1):
        tt = (spark.read.format("delta").option("versionAsOf", v)
              .load(str(hist)))
        assert tt.count() == t.read(version=v).count(), v


@pytest.mark.realjars
def test_duckdb_delta_extension_reads_our_exports(spark, tmp_path):
    """Third independent validator (besides delta-spark and our own
    importer): DuckDB's delta extension reading our exports — snapshot,
    history latest, and the native-DV emission. Needs network (or a cached
    extension) to load; skips cleanly otherwise."""
    import duckdb

    con = duckdb.connect()
    try:
        con.execute("INSTALL delta; LOAD delta;")
    except Exception:
        pytest.skip("duckdb delta extension unavailable (no network/cache)")
    from pyspark_cdc_engine.delta_export import (
        export_delta_history,
        export_delta_snapshot,
    )
    from pyspark_cdc_engine.tables import DeltaliteTable

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(30).selectExpr("id", "CAST(id AS DOUBLE) AS v"))
    t.delete("id % 7 = 3", mode="dv")
    snap = tmp_path / "snap"
    export_delta_snapshot(t, str(snap))
    got = {
        r[0] for r in con.execute(
            f"SELECT id FROM delta_scan('{snap}')"
        ).fetchall()
    }
    want = {r.id for r in t.read().collect()}
    assert got == want
    hist = tmp_path / "hist"
    export_delta_history(t, str(hist), dv="native")
    got2 = {
        r[0] for r in con.execute(
            f"SELECT id FROM delta_scan('{hist}')"
        ).fetchall()
    }
    assert got2 == want


@pytest.mark.realjars
def test_we_read_real_delta_timestamp_ntz(spark, tmp_path):
    """A real delta-spark table with a TIMESTAMP_NTZ column (readerFeature
    timestampNtz) imports through the jar-free reader wall-clock exact."""
    if not _delta_present(spark):
        pytest.skip("delta-spark not installed / Delta classes absent")
    from pyspark_cdc_engine.delta_export import read_delta_snapshot

    real = tmp_path / "real_ntz"
    (spark.range(5)
     .selectExpr("id", "timestamp_ntz'2024-01-02 03:04:05' AS ts")
     .write.format("delta").save(str(real)))
    back = read_delta_snapshot(spark, str(real))
    assert dict(back.dtypes)["ts"] == "timestamp_ntz"
    want = sorted((r.id, r.ts) for r in
                  spark.read.format("delta").load(str(real)).collect())
    assert sorted((r.id, r.ts) for r in back.collect()) == want


@pytest.mark.realjars
def test_real_delta_opens_periodic_checkpoint_export(spark, tmp_path):
    """A long history export now carries periodic checkpoints; real delta
    must open its latest version (reading checkpoint + JSON suffix) and see
    the same rows at head and below the newest checkpoint."""
    if not _delta_present(spark):
        pytest.skip("delta-spark not installed / Delta classes absent")
    from pyspark_cdc_engine.delta_export import export_delta_history
    from pyspark_cdc_engine.tables import DeltaliteTable

    t = DeltaliteTable(spark, str(tmp_path / "src"))
    t.overwrite(spark.range(5).selectExpr("id"))
    for i in range(25):
        t.append(spark.range(100 + i, 101 + i).selectExpr("id"))
    hist = tmp_path / "hist"
    export_delta_history(t, str(hist))
    real = spark.read.format("delta").load(str(hist))
    assert sorted(r.id for r in real.collect()) == sorted(
        r.id for r in t.read().collect()
    )
    v15 = (spark.read.format("delta").option("versionAsOf", 15)
           .load(str(hist)))
    assert sorted(r.id for r in v15.collect()) == sorted(
        r.id for r in t.read(version=15).collect()
    )


@pytest.mark.realjars
def test_we_read_real_delta_variant(spark, tmp_path):
    """A real delta-spark table with a VARIANT column (readerFeature
    variantType) imports through the jar-free reader value-exact — the
    open variant encoding Delta 4.0 adopted is Spark's own."""
    if not _delta_present(spark):
        pytest.skip("delta-spark not installed / Delta classes absent")
    from pyspark_cdc_engine.delta_export import read_delta_snapshot

    real = tmp_path / "real_variant"
    (spark.range(4)
     .selectExpr("id", "parse_json(concat('{\"a\":', id, '}')) AS v")
     .write.format("delta").save(str(real)))
    back = read_delta_snapshot(spark, str(real))
    assert dict(back.dtypes)["v"] == "variant"
    want = sorted(
        (r.id, r.j) for r in spark.read.format("delta").load(str(real))
        .selectExpr("id", "to_json(v) AS j").collect()
    )
    got = sorted(
        (r.id, r.j) for r in back.selectExpr("id", "to_json(v) AS j").collect()
    )
    assert got == want
