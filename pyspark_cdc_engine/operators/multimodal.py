"""Multimodal (image/audio/video) column plumbing (SURVEY §7 M5).

Media travel as opaque ``binary`` payload columns with typed metadata — the
schema a 100 TB training-data lake uses (payload bytes + modality tag +
per-modality struct). Real codec work (JPEG decode, audio resample, video
frame-sampling) needs libraries this container doesn't ship, so the decode
kernel is STUBBED: :func:`decode_media` raises ``NotImplementedError`` for
real codecs and provides a deterministic fake (seeded by the payload bytes)
that exercises the exact Spark-side contract — Arrow batch shapes, schema,
partitioning — that a real decoder would plug into.

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

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyspark_cdc_engine.operators.registry import load_table, register

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
    oracle=None,  # mapInPandas kernel — rows-only driver check; exact values
    # covered by tests/test_multimodal.py against a pure-Python reference
)
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake-decode feature extraction (frame count + normalized
    byte histogram) through the real mapInPandas plumbing."""
    d = load_table(spark, sf_dir, "documents")
    return extract_media_features(with_media_columns(d))
