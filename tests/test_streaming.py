"""Structured Streaming: stream/batch parity and cross-micro-batch
state persistence."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sparkswift.sources import load_table
from sparkswift.streaming.ops import (
    events_stream,
    run_stream_to_batch,
    sessionize,
    stateful_running_totals,
    stream_resample,
)


def test_stream_resample_equals_batch(spark, sf_dir):
    src = events_stream(spark, sf_dir)
    streamed = run_stream_to_batch(
        stream_resample(src, rule="1 hour", extra_keys=["event_type"]),
        mode="complete",
    ).toPandas()
    ev = load_table(spark, sf_dir, "events")
    batch = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(F.col("w.start").alias("bucket_ts"), "event_type", "n")
        .toPandas()
    )
    key = ["bucket_ts", "event_type"]
    pd.testing.assert_frame_equal(
        streamed.sort_values(key).reset_index(drop=True),
        batch.sort_values(key).reset_index(drop=True),
    )


def test_stateful_totals_accumulate_across_microbatches(spark, sf_dir, tmp_path):
    """Two files + maxFilesPerTrigger=1 → two micro-batches; the final
    emitted state per key must equal the global aggregate, proving the
    GroupState survived the batch boundary."""
    ev = load_table(spark, sf_dir, "events")
    half_a = ev.filter(F.col("event_id") % 2 == 0)
    half_b = ev.filter(F.col("event_id") % 2 == 1)
    src_dir = str(tmp_path / "stream_src")
    half_a.coalesce(1).write.parquet(src_dir)
    half_b.coalesce(1).write.mode("append").parquet(src_dir)

    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    out = run_stream_to_batch(stateful_running_totals(stream), mode="update").toPandas()
    # update mode emits one row per key per touched batch; keep last
    final = (
        out.sort_values("events_seen").groupby("user_id").last().reset_index()
    )
    expected = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
        .rename(columns={"n": "expected_n"})
    )
    merged = final.merge(expected, on="user_id")
    assert (merged.events_seen == merged.expected_n).all()
    # at least one key must have been emitted twice (two micro-batches)
    assert (out.groupby("user_id").size() > 1).any()


def test_sessionize_gap_semantics(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 1.0),
        (1, "2024-01-01 00:05:00", 1.0),   # within 10 min → same session
        (1, "2024-01-01 00:30:00", 1.0),   # 25 min gap → new session
        (2, "2024-01-01 00:00:00", 1.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string, value double").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = sessionize(df, gap="10 minutes", keys=["user_id"]).toPandas()
    assert len(out[out.user_id == 1]) == 2
    assert len(out[out.user_id == 2]) == 1
    s1 = out[(out.user_id == 1)].sort_values("session_start").iloc[0]
    assert str(s1.session_end) == "2024-01-01 00:15:00"  # last ts + gap
