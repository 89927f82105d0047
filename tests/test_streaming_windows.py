"""Streaming windowed aggregation with watermark (beyond-reference streaming:
the reference has no watermarks at all — SURVEY §2.10 T6). Asserts the same
groupBy(window(ts)) plan runs under readStream + withWatermark, and that every
window the watermark closed matches the batch computation exactly."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from pyspark_cdc_engine.operators.registry import load_table


def test_streaming_tumbling_window_matches_batch(spark, tmp_path):
    src = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .filter("user_id < 10")
        .select("ts", "value")
    )
    data_dir = tmp_path / "stream_in"
    src.write.mode("overwrite").parquet(str(data_dir))

    stream = (
        spark.readStream.schema(src.schema)
        .parquet(str(data_dir))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sum_value"))
    )

    out: list[pd.DataFrame] = []
    q = (
        stream.writeStream.foreachBatch(
            lambda df, _id: out.append(df.toPandas()) if not df.isEmpty() else None
        )
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = pd.concat(out) if out else pd.DataFrame(columns=["window", "cnt", "sum_value"])
    got = {
        (r.window["start"], r.cnt, round(r.sum_value, 6))
        for r in streamed.itertuples(index=False)
    }

    # Append mode emits exactly the windows the final watermark closed:
    # window.end <= max(ts) - delay.
    max_ts = src.agg(F.max("ts")).first()[0]
    batch = (
        src.groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sum_value"))
        .filter(F.col("window.end") <= F.lit(max_ts) - F.expr("INTERVAL 1 HOUR"))
        .collect()
    )
    expected = {(r.window.start, r.cnt, round(r.sum_value, 6)) for r in batch}
    assert expected  # scenario must actually close windows
    assert got == expected


def test_streaming_drop_duplicates_within_watermark(spark, tmp_path):
    """Streaming exact dedup: duplicate event_ids across micro-batch files are
    emitted once (dropDuplicatesWithinWatermark keyed on event_id, RocksDB
    state) — the streaming face of the exact_dedup batch operator."""
    src = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .filter("event_id < 200")
        .select("event_id", "ts", "value")
    )
    d = tmp_path / "in"
    src.write.mode("overwrite").parquet(str(d / "b0"))
    src.limit(50).write.mode("overwrite").parquet(str(d / "b1"))  # replay subset

    stream = (
        spark.readStream.schema(src.schema)
        .parquet(str(d / "*"))
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    out = []
    q = (
        stream.writeStream.foreachBatch(
            lambda df, _id: out.append(df.toPandas()) if not df.isEmpty() else None
        )
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    import pandas as pd

    got = pd.concat(out)
    assert len(got) == 200                      # every id exactly once
    assert got["event_id"].is_unique


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Purchases joined to the same user's views within the preceding hour,
    as a watermarked stream-stream interval join. Inner interval joins in
    append mode emit exactly the matched pairs, so the streamed result must
    equal the identical batch join."""
    from pyspark_cdc_engine.streaming.joins import interval_join_streams

    ev = load_table(spark, "/root/testdata/sf0.001", "events").filter("user_id < 40")
    purchases = ev.filter("event_type = 'purchase'").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id")
    )
    views = ev.filter("event_type = 'view'").select(
        "user_id", F.col("ts").alias("v_ts"), F.col("event_id").alias("v_id")
    )
    p_dir, v_dir = tmp_path / "p", tmp_path / "v"
    purchases.write.mode("overwrite").parquet(str(p_dir))
    views.write.mode("overwrite").parquet(str(v_dir))

    joined = interval_join_streams(
        spark.readStream.schema(purchases.schema).parquet(str(p_dir)),
        spark.readStream.schema(views.schema).parquet(str(v_dir)),
        on="user_id",
        left_ts="p_ts",
        right_ts="v_ts",
    )
    out = []
    q = (
        joined.writeStream.foreachBatch(
            lambda df, _id: out.append(df.toPandas()) if not df.isEmpty() else None
        )
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.p_id, r.v_id)
        for frame in out
        for r in frame.itertuples(index=False)
    }

    batch = interval_join_streams(
        purchases, views, on="user_id", left_ts="p_ts", right_ts="v_ts"
    ).collect()
    expected = {(r.p_id, r.v_id) for r in batch}
    assert expected, "fixture must produce view->purchase pairs"
    assert got == expected
