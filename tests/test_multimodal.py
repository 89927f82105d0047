"""Multimodal plumbing: binary payload columns, typed metadata, and the
mapInPandas fake-decode kernel match a pure-Python reference exactly."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark_cdc_engine.operators.multimodal import (
    _HIST_BINS,
    _HIST_BYTES,
    decode_media,
    media_features,
    multimodal_meta,
    with_media_columns,
)
from tests.conftest import SF_DIR


def _py_reference(text: str) -> dict:
    payload = text.encode("utf-8")
    head = payload[:_HIST_BYTES]
    counts = [0] * _HIST_BINS
    for b in head:
        counts[b * _HIST_BINS // 256] += 1
    return {
        "n_frames": max(1, len(payload) // 32),
        "byte_hist": [c / (len(head) or 1) for c in counts],
        "byte_len": len(payload),
        "modality": ("image", "audio", "video")[0],
    }


def test_decode_media_real_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_media(b"\xff\xd8\xff", "image", fake=False)


def test_decode_media_deterministic():
    a = decode_media(b"hello world " * 20, "audio")
    b = decode_media(b"hello world " * 20, "audio")
    assert a == b
    assert len(a["byte_hist"]) == _HIST_BINS
    assert sum(a["byte_hist"]) == pytest.approx(1.0)


def test_media_columns_schema(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    m = with_media_columns(docs)
    assert dict(m.dtypes)["payload"] == "binary"
    row = m.filter("doc_id = 1").first()
    assert row.modality == "audio"  # doc_id % 3 == 1
    assert row.media_meta.byte_len == len(row.payload)


def test_media_features_match_python_reference(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").limit(50).collect()}
    feats = (
        media_features(spark, SF_DIR)
        .filter(f"doc_id IN ({','.join(str(i) for i in texts)})")
        .collect()
    )
    assert len(feats) == len(texts)
    for r in feats:
        ref = _py_reference(texts[r.doc_id])
        assert r.n_frames == ref["n_frames"], r.doc_id
        hist = [r.hist_b0, r.hist_b1, r.hist_b2, r.hist_b3]
        assert hist == pytest.approx(ref["byte_hist"]), r.doc_id


def test_multimodal_meta_no_python_in_plan(spark):
    plan = multimodal_meta(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # metadata path must stay JVM-side


# ---------------------------------------------------------------- real codecs
def test_bmp_roundtrip_geometry_and_mean():
    from pyspark_cdc_engine.operators.multimodal import decode_bmp, synthesize_bmp

    content = bytes(range(200))  # 200 bytes -> height = 200 // 48 = 4
    bmp = synthesize_bmp(content)
    feat = decode_bmp(bmp)
    assert (feat["width"], feat["height"]) == (16, 4)
    n_pix = 16 * 3 * 4
    assert feat["mean_value"] == sum(content[:n_pix]) / n_pix


def test_bmp_short_content_pads_one_row():
    from pyspark_cdc_engine.operators.multimodal import decode_bmp, synthesize_bmp

    content = b"abc"  # < one 48-byte row: zero-padded
    feat = decode_bmp(synthesize_bmp(content))
    assert (feat["width"], feat["height"]) == (16, 1)
    assert feat["mean_value"] == sum(content) / 48


def test_bmp_rejects_bad_magic_and_variant():
    import pytest

    from pyspark_cdc_engine.operators.multimodal import decode_bmp, synthesize_bmp

    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"\x89PNG" + b"\x00" * 60)
    bad = bytearray(synthesize_bmp(b"x" * 60))
    bad[28] = 8  # declare 8 bpp
    with pytest.raises(ValueError, match="unsupported"):
        decode_bmp(bytes(bad))


def test_wav_roundtrip_and_chunk_walk():
    import struct

    from pyspark_cdc_engine.operators.multimodal import decode_wav, synthesize_wav

    content = bytes((i * 7) % 256 for i in range(300))
    wav = synthesize_wav(content)
    feat = decode_wav(wav)
    assert feat["sample_rate"] == 8000
    assert feat["n_samples"] == 256
    assert feat["mean_value"] == sum(content[:256]) / 256
    # a spec-conformant decoder skips unknown chunks (word-aligned walk)
    body = wav[12:]
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size padded
    patched = (
        b"RIFF" + struct.pack("<I", 4 + len(extra) + len(body)) + b"WAVE" + extra + body
    )
    assert decode_wav(patched) == feat


def test_wav_rejects_malformed():
    import pytest

    from pyspark_cdc_engine.operators.multimodal import decode_wav

    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS" + b"\x00" * 40)
    with pytest.raises(ValueError, match="missing"):
        decode_wav(b"RIFF\x04\x00\x00\x00WAVE")


def test_avi_roundtrip_frames_fps_and_mean():
    from pyspark_cdc_engine.operators.multimodal import decode_avi, synthesize_avi

    content = bytes((i * 13) % 256 for i in range(500))  # 500 // 192 = 2 frames
    avi = synthesize_avi(content)
    feat = decode_avi(avi)
    assert (feat["width"], feat["height"]) == (8, 8)
    assert feat["n_frames"] == 2 and feat["fps"] == 25.0
    n = 192 * 2
    assert feat["mean_value"] == sum(content[:n]) / n


def test_avi_clamps_frames_and_pads_short_content():
    from pyspark_cdc_engine.operators.multimodal import decode_avi, synthesize_avi

    # short content: one zero-padded frame
    feat = decode_avi(synthesize_avi(b"xyz"))
    assert feat["n_frames"] == 1
    assert feat["mean_value"] == (ord("x") + ord("y") + ord("z")) / 192
    # long content: clamped to 4 frames
    feat = decode_avi(synthesize_avi(bytes(250) * 10))
    assert feat["n_frames"] == 4


def test_avi_rejects_malformed_and_skips_unknown_chunks():
    import struct

    import pytest

    from pyspark_cdc_engine.operators.multimodal import decode_avi, synthesize_avi

    with pytest.raises(ValueError, match="magic"):
        decode_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="missing"):
        decode_avi(b"RIFF\x04\x00\x00\x00AVI ")
    # unknown JUNK chunk between lists must be skipped by a conformant walk
    avi = synthesize_avi(bytes(range(200)))
    body = avi[12:]
    junk = b"JUNK" + struct.pack("<I", 3) + b"pad" + b"\x00"
    patched = b"RIFF" + struct.pack("<I", 4 + len(junk) + len(body)) + b"AVI " + junk + body
    assert decode_avi(patched) == decode_avi(avi)
