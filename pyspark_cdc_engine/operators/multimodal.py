"""Multimodal (image/audio/video) column plumbing (SURVEY §7 M5).

Media travel as opaque ``binary`` payload columns with typed metadata — the
schema a 100 TB training-data lake uses (payload bytes + modality tag +
per-modality struct). Library-backed codec work (JPEG decode, audio resample,
video frame-sampling) needs packages this container doesn't ship, so
:func:`decode_media`'s ``fake=False`` path raises ``NotImplementedError`` and
the deterministic fake exercises the Spark-side contract. Three codecs ARE
real, though: pure-Python spec-compliant 24-bpp BMP, PCM WAV, and
uncompressed RIFF-AVI video (:func:`decode_bmp` / :func:`decode_wav` /
:func:`decode_avi`, exercised end-to-end and oracle-certified by
``media_decode_real``). Only compressed formats (JPEG/MP3/H.264) stay behind
the library stub.

The payload here is derived from ``documents.text`` (UTF-8 bytes), because the
driver's testdata has no binary column; the plumbing is payload-agnostic.

Scale design:
- metadata extraction is pure column arithmetic (whole-stage codegen, no UDF);
- feature extraction is ``mapInPandas`` — one Arrow batch in, one out, no
  shuffle at all (embarrassingly parallel over input partitions);
- the feature schema is fixed-width (``array<double>`` histogram), so the
  downstream ANN/dedup operators in :mod:`.dedup_scale` apply unchanged.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyspark_cdc_engine.operators.registry import fan_out, load_table, register

_HIST_BINS = 4
_HIST_BYTES = 128  # histogram over the first N payload bytes

MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("byte_hist", T.ArrayType(T.DoubleType())),
    ]
)


def decode_media(payload: bytes, modality: str, fake: bool = True) -> dict:
    """Decode one media payload into frames/samples.

    Real codecs (PIL/ffmpeg/librosa) are not available in this environment —
    ``fake=False`` raises ``NotImplementedError`` by design. The fake decoder
    is deterministic in the payload bytes: ``n_frames`` is a size-derived
    count and ``byte_hist`` a normalized histogram of the first
    {_HIST_BYTES} bytes — enough structure to test batching, schema, and the
    downstream feature pipeline.
    """
    if not fake:
        raise NotImplementedError(
            "real media decoding requires codec libraries not shipped here; "
            "plug a decoder into this function and keep the return contract"
        )
    head = payload[:_HIST_BYTES]
    counts = [0] * _HIST_BINS
    for byte in head:
        counts[byte * _HIST_BINS // 256] += 1
    total = len(head) or 1
    return {
        "n_frames": max(1, len(payload) // 32),
        "byte_hist": [c / total for c in counts],
    }


def with_media_columns(docs: DataFrame) -> DataFrame:
    """Attach the multimodal column contract to a documents frame: binary
    ``payload`` + ``modality`` tag + typed ``media_meta`` struct. Pure column
    expressions — stays in codegen, no Python."""
    return docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.struct(
            F.length(F.col("text").cast("binary")).alias("byte_len"),
            F.md5(F.col("text").cast("binary")).alias("content_md5"),
            F.ascii(F.substring("text", 1, 1)).alias("magic_byte"),
        ).alias("media_meta"),
    )


@register(
    "multimodal_meta",
    survey="M5-multimodal,P5",
    oracle="""
    SELECT doc_id,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                                        WHEN 1 THEN 'audio'
                                        ELSE 'video' END AS modality,
           octet_length(CAST(text AS BLOB)) AS byte_len,
           md5(text) AS content_md5,
           ascii(substr(text, 1, 1)) AS magic_byte
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata extraction over binary media payloads: byte length,
    content hash, leading magic byte, modality tag. All JVM-side column ops —
    the scan reads only (doc_id, text) and never deserializes payloads into
    Python."""
    d = load_table(spark, sf_dir, "documents")
    m = with_media_columns(d)
    return m.select(
        "doc_id",
        "modality",
        F.col("media_meta.byte_len").alias("byte_len"),
        F.col("media_meta.content_md5").alias("content_md5"),
        F.col("media_meta.magic_byte").alias("magic_byte"),
    )


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, payload, modality) via
    ``mapInPandas``: each input partition streams through Python once as
    pandas batches; no shuffle, no collect. This is the socket a real
    decode/resize/frame-sample kernel plugs into."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_media(p, m) for p, m in zip(pdf["payload"], pdf["modality"])]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_frames": [f["n_frames"] for f in feats],
                    "byte_hist": [f["byte_hist"] for f in feats],
                }
            )

    return media.mapInPandas(_extract, schema=MEDIA_FEATURE_SCHEMA)


@register(
    "media_features",
    survey="M5-multimodal,UDF",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, length(text) AS n,
             CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                                          WHEN 1 THEN 'audio'
                                          ELSE 'video' END AS modality,
             list_transform(
               string_split(substr(text, 1, {_HIST_BYTES}), ''),
               x -> ascii(x) // 64) AS bins,
             GREATEST(LEAST(n, {_HIST_BYTES}), 1) AS total
      FROM documents
    )
    SELECT doc_id, modality,
           CAST(GREATEST(1, n // 32) AS INT) AS n_frames,
           CAST(len(list_filter(bins, x -> x = 0)) AS DOUBLE) / total AS hist_b0,
           CAST(len(list_filter(bins, x -> x = 1)) AS DOUBLE) / total AS hist_b1,
           CAST(len(list_filter(bins, x -> x = 2)) AS DOUBLE) / total AS hist_b2,
           CAST(len(list_filter(bins, x -> x = 3)) AS DOUBLE) / total AS hist_b3
    FROM b
    """,
)
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake-decode feature extraction (frame count + normalized
    byte histogram) through the real mapInPandas plumbing.

    The registered query surfaces the histogram as SCALAR columns
    (``hist_b0..hist_b3``) rather than the raw ``byte_hist`` array: the
    driver's oracle canonicalizer (pandas ``sort_values``/``factorize``)
    cannot hash list-typed cells, and the four bin fractions determine the
    array exactly. ``extract_media_features`` keeps the array-returning form
    as the library API. Each fraction is one integer count IEEE-divided by
    one integer total, so Spark and DuckDB agree bit-for-bit (the payload is
    the UTF-8 bytes of ``documents.text``, ASCII in this corpus, so DuckDB's
    per-character ``ascii()`` sees the same byte values the Python kernel
    does — the same contract ``media_decode_real``'s oracle relies on)."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    feats = extract_media_features(with_media_columns(d))
    return feats.select(
        "doc_id",
        "modality",
        "n_frames",
        *[
            F.element_at("byte_hist", i + 1).alias(f"hist_b{i}")
            for i in range(_HIST_BINS)
        ],
    )


# --------------------------------------------------------------------------
# Real codecs (pure-Python BMP + WAV + AVI — no external libraries needed).
#
# The env ships no PIL/ffmpeg, but three standard container formats are simple
# enough to implement from their public specs: 24-bpp uncompressed BMP
# (BITMAPINFOHEADER), PCM WAV (RIFF chunks), and uncompressed RIFF-AVI video
# (hdrl/avih/strl headers, raw '00db' DIB frames, idx1 index).
# `media_decode_real` runs the full loop — synthesize a REAL container from
# deterministic content bytes, parse it back with a spec-compliant decoder,
# compute features — so the multimodal path is no longer plumbing-only for
# any modality; only compressed codecs stay behind the library stub.

_BMP_WIDTH = 16  # 16 px * 3 bytes = 48-byte rows: already 4-aligned, no pad
_BMP_MAX_H = 8
_WAV_RATE = 8000
_WAV_MAX_SAMPLES = 256


def synthesize_bmp(content: bytes) -> bytes:
    """Build a real 24-bpp BMP whose pixel bytes are the first
    ``48 * height`` content bytes (zero-padded only when content < one row),
    ``height = clamp(len(content) // 48, 1, 8)``."""
    h = max(1, min(_BMP_MAX_H, len(content) // (_BMP_WIDTH * 3)))
    row = _BMP_WIDTH * 3
    pix = content[: row * h].ljust(row * h, b"\x00")
    data_offset = 14 + 40
    file_size = data_offset + len(pix)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_offset)
    info = struct.pack(
        "<IiiHHIIiiII", 40, _BMP_WIDTH, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0
    )
    # rows stored bottom-up, per spec
    rows = [pix[i * row : (i + 1) * row] for i in range(h)]
    return header + info + b"".join(reversed(rows))


def synthesize_wav(content: bytes) -> bytes:
    """Build a real PCM WAV (8-bit unsigned mono, 8 kHz) whose samples are the
    first ``min(len(content), 256)`` content bytes."""
    samples = content[:_WAV_MAX_SAMPLES]
    fmt = struct.pack("<HHIIHH", 1, 1, _WAV_RATE, _WAV_RATE, 1, 8)
    data = samples
    riff_body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_bmp(payload: bytes) -> dict:
    """Spec-compliant 24-bpp BMP parse: magic, BITMAPINFOHEADER geometry,
    bottom-up pixel array. Features are order-invariant so row order drops out."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP: bad magic")
    (_, _file_size, _, _, data_offset) = struct.unpack("<2sIHHI", payload[:14])
    (hdr_size, width, height, _planes, bpp) = struct.unpack("<IiiHH", payload[14:30])
    if hdr_size < 40 or bpp != 24:
        raise ValueError(f"unsupported BMP variant: hdr={hdr_size} bpp={bpp}")
    height = abs(height)
    row = ((width * 3 + 3) // 4) * 4  # rows padded to 4 bytes per spec
    pix = payload[data_offset : data_offset + row * height]
    useful = [
        pix[r * row + i]
        for r in range(height)
        for i in range(width * 3)
    ]
    return {
        "width": width,
        "height": height,
        "mean_value": sum(useful) / len(useful),
    }


def decode_wav(payload: bytes) -> dict:
    """RIFF chunk walk: validate RIFF/WAVE, read fmt geometry, pull the data
    chunk's PCM samples (8-bit unsigned)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE magic")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format != 1 or bits != 8 or channels != 1:
        raise ValueError(f"unsupported WAV variant: fmt={fmt}")
    return {
        "sample_rate": rate,
        "n_samples": len(data),
        "mean_value": sum(data) / len(data),
    }


_AVI_W = 8        # 8 px * 3 bytes = 24-byte rows, 4-aligned
_AVI_H = 8        # 192 bytes per raw 24-bpp frame
_AVI_MAX_F = 4
_AVI_FPS_NUM, _AVI_FPS_DEN = 25, 1
_AVI_FRAME_BYTES = _AVI_W * 3 * _AVI_H


def synthesize_avi(content: bytes) -> bytes:
    """Build a real uncompressed AVI (RIFF 'AVI ': hdrl/avih + strl/strh/strf,
    movi with raw '00db' DIB frames, idx1) whose frame pixels are the first
    ``192 * f`` content bytes, ``f = clamp(len(content) // 192, 1, 4)``
    (zero-padded only when content < one frame)."""
    f = max(1, min(_AVI_MAX_F, len(content) // _AVI_FRAME_BYTES))
    pix = content[: _AVI_FRAME_BYTES * f].ljust(_AVI_FRAME_BYTES * f, b"\x00")
    frames = [
        pix[i * _AVI_FRAME_BYTES : (i + 1) * _AVI_FRAME_BYTES] for i in range(f)
    ]

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) % 2 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    usec_per_frame = 1_000_000 * _AVI_FPS_DEN // _AVI_FPS_NUM
    avih = struct.pack(
        "<14I", usec_per_frame, _AVI_FRAME_BYTES * _AVI_FPS_NUM, 0, 0x10, f, 0, 1,
        _AVI_FRAME_BYTES, _AVI_W, _AVI_H, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H", b"vids", b"DIB ", 0, 0, 0, 0,
        _AVI_FPS_DEN, _AVI_FPS_NUM, 0, f, _AVI_FRAME_BYTES, 0, 0,
        0, 0, _AVI_W, _AVI_H,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, _AVI_W, _AVI_H, 1, 24, 0, _AVI_FRAME_BYTES, 0, 0, 0, 0
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"".join(chunk(b"00db", fr) for fr in frames)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per frame; offsets are relative to the 'movi' list kind
    idx_entries, off = [], 4
    for fr in frames:
        idx_entries.append(struct.pack("<4sIII", b"00db", 0x10, off, len(fr)))
        off += 8 + len(fr) + (len(fr) % 2)
    idx1 = chunk(b"idx1", b"".join(idx_entries))
    return chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def _riff_chunks(payload: bytes, pos: int, end: int):
    """Yield (chunk_id, body_start, body_size) walking sibling RIFF chunks."""
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        yield cid, pos + 8, size
        pos += 8 + size + (size % 2)  # chunks are word-aligned


def decode_avi(payload: bytes) -> dict:
    """Spec-compliant uncompressed-AVI parse: RIFF/'AVI ' magic, avih
    geometry, strh timing (fps = dwRate / dwScale), raw '00db' frames from the
    movi list. Features are frame-order-invariant."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI: bad RIFF/'AVI ' magic")
    width = height = None
    scale = rate = None
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal width, height, scale, rate
        for cid, body, size in _riff_chunks(payload, pos, end):
            if cid == b"LIST":
                walk(body + 4, body + size)  # skip the 4-byte list kind
            elif cid == b"avih":
                vals = struct.unpack("<14I", payload[body : body + 56])
                width, height = vals[8], vals[9]
            elif cid == b"strh":
                fcc = payload[body : body + 4]
                if fcc == b"vids":
                    scale, rate = struct.unpack("<II", payload[body + 20 : body + 28])
            elif cid == b"00db":
                frames.append(payload[body : body + size])

    walk(12, len(payload))
    if width is None or scale is None or not frames:
        raise ValueError("AVI missing avih/strh/frames")
    useful = b"".join(frames)
    return {
        "width": width,
        "height": height,
        "n_frames": len(frames),
        "fps": rate / scale,
        "mean_value": sum(useful) / len(useful),
    }


REAL_MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("fps", T.DoubleType()),
        T.StructField("mean_value", T.DoubleType()),
    ]
)


_CODECS = {
    "image": (synthesize_bmp, decode_bmp),
    "audio": (synthesize_wav, decode_wav),
    "video": (synthesize_avi, decode_avi),
}


def _decode_real_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out: dict[str, list] = {k.name: [] for k in REAL_MEDIA_SCHEMA.fields}
        for doc_id, payload, modality in zip(
            pdf["doc_id"], pdf["payload"], pdf["modality"]
        ):
            synth, decode = _CODECS[modality]
            feat = decode(synth(bytes(payload)))
            out["doc_id"].append(doc_id)
            out["modality"].append(modality)
            out["width"].append(feat.get("width"))
            out["height"].append(feat.get("height"))
            out["sample_rate"].append(feat.get("sample_rate"))
            out["n_samples"].append(feat.get("n_samples"))
            out["n_frames"].append(feat.get("n_frames"))
            out["fps"].append(feat.get("fps"))
            # no rounding: the sum is an exact integer and IEEE double
            # division is bit-identical across engines, while ROUND at a
            # binary-fraction tie differs (banker's vs half-away)
            out["mean_value"].append(feat["mean_value"])
        yield pd.DataFrame(out)


@register(
    "media_decode_real",
    survey="M5-multimodal,UDF",
    oracle="""
    WITH m AS (
      SELECT doc_id, text, length(text) AS n,
             CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
                                          WHEN 1 THEN 'audio'
                                          ELSE 'video' END AS modality
      FROM documents
    ),
    geo AS (
      SELECT doc_id, text, n, modality,
             CASE WHEN modality = 'image'
                  THEN 48 * GREATEST(1, LEAST(8, n // 48)) END AS n_pix,
             CASE WHEN modality = 'audio' THEN LEAST(256, n) END AS n_samp,
             CASE WHEN modality = 'video'
                  THEN 192 * GREATEST(1, LEAST(4, n // 192)) END AS n_vid
      FROM m
    )
    SELECT g.doc_id, g.modality,
           CASE g.modality WHEN 'image' THEN 16 WHEN 'video' THEN 8 END AS width,
           CASE g.modality WHEN 'image' THEN CAST(g.n_pix // 48 AS INT)
                           WHEN 'video' THEN 8 END AS height,
           CASE WHEN g.modality = 'audio' THEN 8000 END AS sample_rate,
           CASE WHEN g.modality = 'audio' THEN CAST(g.n_samp AS INT) END AS n_samples,
           CASE WHEN g.modality = 'video'
                THEN CAST(g.n_vid // 192 AS INT) END AS n_frames,
           CASE WHEN g.modality = 'video' THEN 25.0 END AS fps,
           list_aggregate(
             list_transform(
               string_split(
                 substr(g.text, 1, LEAST(g.n, COALESCE(g.n_pix, g.n_samp, g.n_vid))), ''),
               x -> ascii(x)), 'sum')
           / CAST(COALESCE(g.n_pix, g.n_samp, g.n_vid) AS DOUBLE) AS mean_value
    FROM geo g
    """,
)
def media_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL codec round-trip over the multimodal columns: per document,
    synthesize a genuine BMP (image), PCM WAV (audio), or uncompressed
    RIFF-AVI (video) container from the payload bytes, parse it back with the
    pure-Python spec decoder above, and emit geometry/timing + mean sample
    value. mapInPandas end to end — one Arrow batch in, one out,
    embarrassingly parallel over input partitions, no shuffle (same 100 TB
    shape as `media_features`). The DuckDB oracle recomputes the identical
    features straight from the content bytes, which certifies the
    synthesize→decode loop is lossless where it must be."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    media = with_media_columns(d)
    return media.select("doc_id", "payload", "modality").mapInPandas(
        _decode_real_kernel, schema=REAL_MEDIA_SCHEMA
    )
