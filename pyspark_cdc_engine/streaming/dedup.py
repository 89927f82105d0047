"""Streaming document deduplication (M5 ingest-side counterpart of the batch
``exact_dedup`` operator).

A training-data ingest sees the same document again and again — re-crawls,
mirror sites, retry storms. Deduplicating AT INGEST (before storage and the
expensive near-dup passes) is the standard first gate. Spark-first shape:
content-hash the payload, then let the built-in streaming dedup operator keep
the seen-set in the state store — no custom state code at all.

Two modes, chosen by whether an event-time column is given:

- **unbounded** (``event_time_col=None``): ``dropDuplicates`` on the content
  hash. State grows with the number of DISTINCT documents ever seen; only
  viable for bounded backfills or corpora whose distinct count fits the state
  store (RocksDB spills to disk, so this is larger than it sounds — hash +
  key overhead per distinct doc, not the document bytes).
- **watermarked** (the 100 TB choice): ``dropDuplicatesWithinWatermark`` —
  duplicates are suppressed only within the watermark horizon and state is
  EVICTED past it, so state size is bounded by (arrival rate × horizon)
  regardless of corpus size. Exactly the re-crawl/retry dedup a pipeline
  needs; cross-epoch dedup belongs to the batch MinHash/LSH pass.

Only the 16-byte content hash enters the state store either way — never
document text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CONTENT_HASH_COL = "content_md5"


def with_content_hash(stream: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the dedup key: md5 of the payload bytes (JVM-side, codegen)."""
    return stream.withColumn(
        CONTENT_HASH_COL, F.md5(F.col(text_col).cast("binary"))
    )


def dedup_stream_exact(
    stream: DataFrame,
    text_col: str = "text",
    event_time_col: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exact-content streaming dedup; see module doc for the two modes.

    Returns the input columns plus ``content_md5``. First occurrence wins
    (per Spark's streaming dedup semantics); duplicates never reach the sink.
    """
    hashed = with_content_hash(stream, text_col)
    if event_time_col is None:
        return hashed.dropDuplicates([CONTENT_HASH_COL])
    return hashed.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
        [CONTENT_HASH_COL]
    )
