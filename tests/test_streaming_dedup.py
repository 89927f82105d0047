"""Streaming ingest dedup (streaming/dedup.py): duplicates are suppressed
across micro-batches via the state store, watermark mode keeps state bounded,
and only the content hash (never text) enters state."""

from __future__ import annotations

import json

import pytest

from pyspark_cdc_engine.streaming.dedup import dedup_stream_exact


def _write_batch(d, name: str, rows: list[dict]) -> None:
    d.mkdir(parents=True, exist_ok=True)
    (d / f"{name}.json").write_text("\n".join(json.dumps(r) for r in rows) + "\n")


DOC_SCHEMA = "doc_id long, text string, ts timestamp"


def _drain(spark, src, ckpt, out, **kwargs):
    """File sink (checkpoint-recoverable, unlike memory) so a later drain
    resumes the SAME state store — the cross-batch property under test."""
    stream = spark.readStream.schema(DOC_SCHEMA).json(str(src))
    q = (
        dedup_stream_exact(stream, **kwargs)
        .writeStream.format("parquet")
        .option("path", str(out))
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(str(out))


def test_duplicates_suppressed_across_micro_batches(spark, tmp_path):
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    _write_batch(src, "b0", [
        {"doc_id": 1, "text": "alpha", "ts": "2026-01-01T00:00:00Z"},
        {"doc_id": 2, "text": "beta", "ts": "2026-01-01T00:00:01Z"},
        {"doc_id": 3, "text": "alpha", "ts": "2026-01-01T00:00:02Z"},  # dup in-batch
    ])
    out_dir = tmp_path / "out"
    out = _drain(spark, src, ckpt, out_dir)
    got = {r.doc_id for r in out.collect()}
    assert 2 in got and len(got) == 2  # one alpha, the beta

    # a later drain (same checkpoint = same state store) still remembers alpha
    _write_batch(src, "b1", [
        {"doc_id": 4, "text": "alpha", "ts": "2026-01-01T00:01:00Z"},  # dup cross-batch
        {"doc_id": 5, "text": "gamma", "ts": "2026-01-01T00:01:01Z"},
    ])
    out = _drain(spark, src, ckpt, out_dir)
    assert {r.doc_id for r in out.collect()} == got | {5}


def test_watermarked_mode_dedups_within_horizon(spark, tmp_path):
    src, ckpt = tmp_path / "src", tmp_path / "ckpt"
    _write_batch(src, "b0", [
        {"doc_id": 1, "text": "doc-x", "ts": "2026-01-01T00:00:00Z"},
        {"doc_id": 2, "text": "doc-x", "ts": "2026-01-01T00:00:30Z"},  # within 10m
        {"doc_id": 3, "text": "doc-y", "ts": "2026-01-01T00:00:40Z"},
    ])
    out = _drain(spark, src, ckpt, tmp_path / "out", event_time_col="ts")
    got = {r.doc_id for r in out.collect()}
    assert 3 in got and len(got) == 2  # one doc-x survivor + doc-y


def test_only_hash_enters_state_schema(spark, tmp_path):
    """The dedup key list is the 16-byte content hash alone — assert via the
    physical plan's dedup operator keys (no text column in state)."""
    src = tmp_path / "src"
    _write_batch(src, "b0", [{"doc_id": 1, "text": "z", "ts": "2026-01-01T00:00:00Z"}])
    stream = spark.readStream.schema(DOC_SCHEMA).json(str(src))
    plan = dedup_stream_exact(stream)._jdf.queryExecution().analyzed().toString()
    dd = [ln for ln in plan.splitlines() if "Deduplicate" in ln]
    assert dd and all("content_md5" in ln and "text" not in ln for ln in dd)
