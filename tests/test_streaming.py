"""Structured Streaming tests: windowed aggregation equivalence with the
batch plan, and the custom stateful sessionizer."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_batch_spark.catalog import load_table
from etl_batch_spark.streaming import (
    read_events_stream,
    run_stream_to_memory,
    sessionize_stateful,
    windowed_event_counts,
)


def test_windowed_counts_match_batch(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    run_stream_to_memory(
        windowed_event_counts(stream, window="1 hour", watermark="2 hours"),
        query_name="win_counts",
        output_mode="update",
    )
    streamed = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("select * from win_counts").collect()
    }

    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
    )
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in batch.collect()
    }
    assert streamed == expected


def test_stateful_sessionizer_counts_match_batch_sessionization(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    run_stream_to_memory(
        sessionize_stateful(stream, gap_minutes=30),
        query_name="sessions",
        output_mode="update",
    )
    streamed = {
        r["user_id"]: (r["session_count"], r["event_count"])
        for r in spark.sql("select * from sessions").collect()
    }

    # batch oracle: lag/gap sessionization (same rule as q27)
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1).otherwise(0)
    batch = (
        e.withColumn("is_new", is_new)
        .groupBy("user_id")
        .agg(F.sum("is_new").alias("sessions"), F.count(F.lit(1)).alias("events"))
    )
    expected = {r["user_id"]: (r["sessions"], r["events"]) for r in batch.collect()}
    assert streamed == expected
