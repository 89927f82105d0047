"""Watermarked stream-stream interval join.

The Spark-idiomatic alternative to custom keyed-state assembly for the
two-stream case: where the reference buffers order + item events in
flatMapGroupsWithState until a transaction completes
(TransactionalCdcProcessingApp.scala:70-72), Structured Streaming can join two
streams directly when the match window is expressible as a time bound — each
side is watermarked, the join condition carries an event-time range, and Spark
sizes/expires the join state from exactly that range. No user state code, and
the state bound is declarative (late data outside the watermark is dropped,
state outside the interval is evicted).

Use the stateful assembler when completion is a *count/content* condition
(``eventCount`` protocol); use this join when it is a *time* condition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower: str = "INTERVAL 1 HOUR",
    upper: str = "INTERVAL 0 SECONDS",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join two event-time streams on an equi-key plus a time interval:
    ``right_ts BETWEEN left_ts - lower AND left_ts + upper``.

    Both inputs may be streaming or batch DataFrames — the same plan works in
    either mode, which is how the correctness test closes the loop (stream
    result == batch result for closed state). ``left_ts``/``right_ts`` must be
    distinct column names; the right key column is dropped from the output
    (it equals the left's).

    At scale the join state is the crux: each side keeps only rows within
    ``watermark`` + interval of the stream clock, keyed by ``on`` — state
    bytes are O(arrival rate x window), independent of total stream length.
    """
    l, r = left, right
    if l.isStreaming:
        l = l.withWatermark(left_ts, watermark)
    if r.isStreaming:
        r = r.withWatermark(right_ts, watermark)
    rk = f"__r_{on}"
    r = r.withColumnRenamed(on, rk)
    cond = (
        (F.col(on) == F.col(rk))
        & (F.col(right_ts) >= F.expr(f"{left_ts} - {lower}"))
        & (F.col(right_ts) <= F.expr(f"{left_ts} + {upper}"))
    )
    return l.join(r, cond, how).drop(rk)
