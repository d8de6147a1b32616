"""Streaming queries with batch-exact oracles (driver-verifiable).

Structured Streaming output was previously test-only (no SQL-oracle
form), but a bounded file source drained with ``availableNow`` into a
memory sink IS deterministically batch-equivalent when two conditions
hold, and then the ordinary DuckDB value-hash oracle applies:

1. **update output mode** — every group's final value is emitted even
   if the watermark never passes it (append mode withholds windows
   newer than ``max(ts) − delay`` at end-of-stream);
2. **single-batch source** — each fixture table is one parquet file,
   so ``availableNow`` processes exactly one trigger and the memory
   sink holds one final row per group (across multiple batches, update
   mode would append one row per group PER UPDATE).

The callables run the stream to completion as a build side effect and
return the memory-sink table; the driver/oracle compare proceeds as
for any batch query.  This is the same batch-equivalence argument
tests/test_streaming.py proves for the wider streaming surface
(stateful sessionization, stream-stream joins, crash replay) — these
registry entries put the two simplest members under the driver's
value-hash gate as well.

Event-time domain is stated EXPLICITLY on both sides (the ev01
lesson), and it has TWO exclusions:

* NULL ``ts`` — no window and no watermark position;
* **pre-epoch ``ts``** — Spark's watermark starts at 0 (1970-01-01
  UTC) before the first batch, so any pre-epoch event time is BORN
  LATE and the watermarked stateful operator silently drops it (found
  by the o95/o96 pre-epoch corpora: the 1947 windows vanished from
  the streaming side only).  Real deployments hit this with sentinel
  dates and mis-parsed timestamps; the explicit ``ts >= epoch`` domain
  on both sides makes the behavior visible instead of silent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_batch_spark.queries.registry import query
from etl_batch_spark.streaming.events import (
    dedup_stream,
    read_events_stream,
    run_stream_to_memory,
    windowed_event_counts,
)


@query(
    "st01_streaming_window_counts",
    doc="Structured Streaming tumbling-window counts/sums drained with "
    "availableNow into a memory sink — q05's streaming twin, value-hash "
    "checked against the batch oracle (update mode + single-batch "
    "source ⇒ emission is complete and batch-exact)",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           CAST(date_trunc('hour', ts) + INTERVAL 1 HOUR AS TIMESTAMP)
             AS window_end,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    -- NULL ts has no window position; pre-epoch ts is below Spark's
    -- initial watermark (0) and born-late: both excluded on both sides
    FROM events
    WHERE ts IS NOT NULL AND ts >= TIMESTAMP '1970-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
)
def st01_streaming_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_events_stream(spark, sf_dir).filter(
        F.col("ts").isNotNull() & (F.col("ts") >= F.lit("1970-01-01 00:00:00").cast("timestamp"))
    )
    run_stream_to_memory(
        windowed_event_counts(stream, window="1 hour", watermark="2 hours"),
        query_name="st01_win_counts",
        output_mode="update",
    )
    return spark.table("st01_win_counts")


@query(
    "st02_streaming_dedup",
    doc="dropDuplicatesWithinWatermark over the event stream, drained "
    "with availableNow — bounded-state streaming dedup whose single-"
    "batch output equals DISTINCT (fixture duplicate rows are exact "
    "full-row copies, so first-per-id == any-per-id)",
    oracle="""
    SELECT DISTINCT event_id, ts, user_id, event_type, value, props
    -- NULL ts has no watermark position; pre-epoch ts is below
    -- Spark's initial watermark (0) and born-late: both excluded
    FROM events
    WHERE ts IS NOT NULL AND ts >= TIMESTAMP '1970-01-01 00:00:00'
    """,
)
def st02_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_events_stream(spark, sf_dir).filter(
        F.col("ts").isNotNull() & (F.col("ts") >= F.lit("1970-01-01 00:00:00").cast("timestamp"))
    )
    run_stream_to_memory(
        dedup_stream(stream, id_col="event_id", watermark="2 hours"),
        query_name="st02_dedup",
        output_mode="append",
    )
    return spark.table("st02_dedup").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
