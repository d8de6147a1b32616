"""Structured Streaming over the ``events`` table.

The reference's notion of "streaming" is scheduled batches gated by
DAILY000 (SURVEY.md §2.D); the engine adds real Structured Streaming:

- :func:`read_events_stream`       — file-source stream with the same
  nanos→micros ts handling as the batch catalog
- :func:`windowed_event_counts`    — watermarked tumbling-window aggs
  (late data dropped past the watermark)
- :func:`sessionize_stateful`      — custom stateful operator via
  ``applyInPandasWithState`` (per-user session tracking with a gap
  timeout), the pattern for operators Spark lacks natively
- :func:`dedup_stream`             — bounded-state exact dedup via
  ``dropDuplicatesWithinWatermark`` (at-least-once → exactly-once)
- :func:`purchase_attribution_join` — stream-stream interval join with
  two-sided watermarks (evictable join state)

Tests run with ``trigger(availableNow=True)`` against the fixture
parquet and assert equivalence with the batch semantics.  At production
scale the same code points at a Kafka/object-store source; state is
checkpointed per trigger.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from etl_batch_spark.catalog import DATA_TABLES, _events_ts_is_nanos

_RAW_EVENTS = T.StructType(
    [
        f if f.name != "ts" else T.StructField("ts", T.LongType())
        for f in DATA_TABLES["events"].fields
    ]
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # file-source streams require a directory: stream the sf dir with a
    # glob filter selecting only the events file.  Fixtures have shipped
    # ts as both TIMESTAMP(NANOS) and TIMESTAMP(MICROS); mirror the
    # batch catalog's footer sniff (catalog.load_table).
    if _events_ts_is_nanos(sf_dir):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return (
            spark.readStream.schema(_RAW_EVENTS)
            .option("pathGlobFilter", "events*.parquet")
            .parquet(sf_dir)
            .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        )
    return (
        spark.readStream.schema(DATA_TABLES["events"])
        .option("pathGlobFilter", "events*.parquet")
        .parquet(sf_dir)
    )


def windowed_event_counts(
    stream: DataFrame, *, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts+sums per event_type with late-data watermark."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


_SESSION_STATE = T.StructType(
    [
        T.StructField("session_count", T.LongType()),
        T.StructField("event_count", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)

_SESSION_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_count", T.LongType()),
        T.StructField("event_count", T.LongType()),
    ]
)


def sessionize_stateful(stream: DataFrame, *, gap_minutes: int = 30) -> DataFrame:
    """Custom stateful operator: per-user session/event counters with a
    gap rule, kept across triggers in GroupState.  This is the engine's
    template for operators the built-in surface can't express."""
    gap_us = gap_minutes * 60 * 1_000_000

    def update(
        key: tuple[Any, ...],
        batches: Iterator["pd.DataFrame"],  # noqa: F821
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        if state.exists:
            sessions, events, last_us = state.get
        else:
            sessions, events, last_us = 0, 0, None
        ts_list: list[int] = []
        for pdf in batches:
            ts_list.extend(int(v) for v in pdf["ts_us"])
        for ts_us in sorted(ts_list):
            if last_us is None or ts_us - last_us > gap_us:
                sessions += 1
            events += 1
            last_us = ts_us
        state.update((sessions, events, last_us))
        yield pd.DataFrame(
            {"user_id": [key[0]], "session_count": [sessions], "event_count": [events]}
        )

    return (
        stream.withColumn("ts_us", F.unix_micros("ts"))
        .groupBy("user_id")
        .applyInPandasWithState(
            update, _SESSION_OUT, _SESSION_STATE, "Update", GroupStateTimeout.NoTimeout
        )
    )


def dedup_stream(
    stream: DataFrame, *, id_col: str = "event_id", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming exact dedup: drop re-deliveries of the same ``id_col``
    arriving within the watermark horizon.  State is bounded — ids older
    than the watermark are evicted — which is the only dedup that can
    run forever on an unbounded stream (an unwatermarked
    ``dropDuplicates`` grows state without limit).  Ingest-side
    at-least-once sources (Kafka redeliveries, file re-lists) become
    exactly-once rows for everything downstream."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark([id_col])


def session_window_aggregate(
    stream: DataFrame, *, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming sessionization with the BUILT-IN ``session_window``
    (ev07's batch twin): per-user events closer than ``gap`` merge into
    one session row carrying start/count/duration.  State is the set of
    open sessions; the watermark closes (and evicts) a session once no
    event can extend it, so state is bounded by the active-user count —
    the plan that holds on an unbounded 100 TB/day stream.  Streaming
    session aggregations support append and complete output only
    (update would emit a session mid-merge); append emits each session
    exactly once when the watermark passes its end."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.min("ts").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.unix_micros(F.max("ts")) / 1e6 - F.unix_micros(F.min("ts")) / 1e6, 2
            ).alias("duration_s"),
        )
        .select("user_id", "session_start", "n_events", "duration_s")
    )


def purchase_attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    *,
    attribution_window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: each purchase matched to same-user
    clicks in the preceding ``attribution_window``.  Both sides carry
    watermarks and the join condition bounds event-time distance, so
    state for both streams is evictable — the canonical funnel /
    attribution shape.  Inputs are pre-filtered event streams (e.g.
    ``stream.filter(event_type == 'click')``)."""
    c = clicks.select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("c_user_id") == F.col("p_user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {attribution_window}"))
    )
    return c.join(p, cond).select(
        F.col("p_user_id").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "purchase_value",
        "click_id",
        "click_ts",
    )


def purchase_attribution_join_outer(
    clicks: DataFrame,
    purchases: DataFrame,
    *,
    attribution_window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Left-outer stream-stream interval join: every purchase emits —
    attributed rows as in :func:`purchase_attribution_join`, ORGANIC
    purchases (no qualifying click) with NULL click columns.

    The outer side is the genuinely stateful case: a purchase cannot be
    declared organic until the click watermark has passed its whole
    attribution window, so null rows surface only when state for that
    event-time range is evicted.  Purchases younger than the final
    watermark stay buffered (exactly-once under the checkpoint) — a
    batch backfill over closed data sees every row, a live stream sees
    nulls trail by the watermark delay.  Same evictable-state bounds as
    the inner form; the join order is purchases LEFT OUTER clicks."""
    c = clicks.select(
        F.col("user_id").alias("c_user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("c_user_id") == F.col("p_user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {attribution_window}"))
    )
    return p.join(c, cond, "leftOuter").select(
        F.col("p_user_id").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "purchase_value",
        "click_id",
        "click_ts",
    )


def run_stream_to_memory(
    result: DataFrame, *, query_name: str, output_mode: str = "update"
) -> None:
    """Drain the stream into an in-memory table with availableNow (test /
    backfill harness; production uses a real sink + checkpoint)."""
    q = (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


_FUNNEL_STATE = T.StructType(
    [
        T.StructField("step", T.LongType()),
        T.StructField("step_ts_us", T.LongType()),
    ]
)

_FUNNEL_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("step", T.LongType()),
    ]
)


def funnel_stateful(
    stream: DataFrame, *, steps: tuple[str, ...] = ("view", "click", "purchase")
) -> DataFrame:
    """Streaming conversion funnel: per-user furthest step reached, with
    chain-of-first-occurrence semantics matching the batch ``ev01``
    query — step k+1 counts only strictly after the event that completed
    step k.  State per user is two longs (step, its event time), never a
    buffer of events; each trigger folds its micro-batch in event-time
    order.  Cross-batch stragglers older than the completed step's
    timestamp are ignored — the standard streaming-funnel approximation;
    an exact replay lives one batch query away (``eventsq.ev01_funnel``).
    """

    def update(
        key: tuple[Any, ...],
        batches: Iterator["pd.DataFrame"],  # noqa: F821
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        # the "no step yet" sentinel must sit below ANY event time —
        # pre-epoch timestamps are NEGATIVE micros, so a -1 sentinel
        # would silently refuse to start the funnel for a user whose
        # first view is pre-1970 (caught by the o95 corpus); int64 min
        # is below every representable event time
        step, step_ts = state.get if state.exists else (0, -(1 << 63))
        rows: list[tuple[int, str]] = []
        for pdf in batches:
            rows.extend(zip((int(v) for v in pdf["ts_us"]), pdf["event_type"]))
        for ts_us, etype in sorted(rows):
            if step < len(steps) and etype == steps[step] and ts_us > step_ts:
                step += 1
                step_ts = ts_us
        state.update((step, step_ts))
        yield pd.DataFrame({"user_id": [key[0]], "step": [step]})

    return (
        stream.withColumn("ts_us", F.unix_micros("ts"))
        .groupBy("user_id")
        .applyInPandasWithState(
            update, _FUNNEL_OUT, _FUNNEL_STATE, "Update", GroupStateTimeout.NoTimeout
        )
    )


def sliding_event_counts(
    stream: DataFrame,
    *,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "3 hours",
) -> DataFrame:
    """Sliding-window counts per event_type (each event lands in
    window/slide overlapping windows).  State per key is bounded by
    (watermark + window) / slide open windows; the overlap factor
    multiplies shuffle volume, which is why the tumbling variant is the
    default and sliding is reserved for trend queries that need it."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def write_idempotent_batches(
    result: DataFrame, *, path: str, checkpoint: str
) -> None:
    """Exactly-once file sink via ``foreachBatch``: each micro-batch
    lands in a ``batch_id=N`` partition with dynamic partition
    overwrite, so a batch replayed after a crash (same batch_id)
    overwrites its own output instead of appending duplicates —
    idempotence from partition layout rather than sink transactions.
    Drains with availableNow; the checkpoint carries source offsets so
    a restart resumes, not re-reads.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(path)
        )

    q = (
        result.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def enrich_with_dimension(stream: DataFrame, dim: DataFrame, *, on: str, how: str = "left") -> DataFrame:
    """Stream-static broadcast enrichment: join a micro-batched stream to
    a bounded dimension table.

    The static side is re-resolved per micro-batch (so a dim refresh is
    picked up without restarting the query) and broadcast — the stream
    side never shuffles, which is the only sane plan for a 100 TB/day
    stream against a bounded dim.  For unbounded/slow-changing dims use
    ``purchase_attribution_join`` (stream-stream, watermarked) instead.
    """
    return stream.join(F.broadcast(dim), on, how)


def ingest_incrementally(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    checkpoint_dir: str,
    *,
    schema: T.StructType,
    file_format: str = "parquet",
    transform=None,
    merge_schema: bool = False,
) -> int:
    """Incremental file ingestion (the cloud "auto loader" pattern):
    each call discovers files in ``src_dir`` that no previous call
    processed — tracked in the streaming checkpoint, not by listing
    diffs — transforms them, and appends to ``dst_dir``.  Returns the
    number of micro-batches processed (0 when nothing is new).

    ``trigger(availableNow=True)`` drains everything pending and stops,
    so this runs as a plain batch job on a schedule (the engine's
    BatchRunner slots it like any module) while inheriting streaming's
    exactly-once file tracking: a crashed run replays from the
    checkpoint instead of double-loading, the property the reference
    approximates with duplicate-run checks + loader file lists
    (pkg_batch_util_body.sql:219–247, 1163–1251).

    The sink lands each micro-batch in a ``batch_id=N`` partition with
    dynamic partition overwrite (the ``write_idempotent_batches``
    layout) rather than a bare append: ``foreachBatch`` is only
    AT-LEAST-once per batch — a crash between the sink write and the
    checkpoint commit re-runs the same batch_id on restart, and an
    append sink would then hold the batch twice.  The partition
    overwrite makes the replay rewrite its own output instead
    (tests/test_streaming.py pins the torn-crash path).  Readers take
    ``spark.read.parquet(dst_dir)`` as usual; ``batch_id`` rides along
    as a partition column they may drop.

    At 100 TB the file listing is the bottleneck — cap per-batch intake
    with ``maxFilesPerTrigger`` upstream or partition ``src_dir`` by
    arrival date; state stays O(files seen), on storage, not memory.

    **Schema evolution across runs is PINNED** (the checkpoint records
    the ingest's output schema in ``_engine_ingest_schema.json``): a
    later run whose output schema drifts REFUSES with
    :class:`~etl_batch_spark.sources.txlog.SchemaEvolutionError`
    BEFORE the stream starts — the checkpoint and ``dst_dir`` are
    untouched — unless ``merge_schema=True``, which admits ADDED
    nullable columns (older ``dst_dir`` files then lack them; read the
    landing dir with ``sources.io.read_parquet_evolving`` /
    ``mergeSchema`` so they NULL-fill).  A type change or a REMOVED
    column refuses either way: silently narrowing a landing table is
    how downstream batch jobs start reading garbage (reference
    analogue: resume with changed parameters,
    pkg_batch_util_body.sql:632–645 — the run either matches its
    registered definition or is rejected).
    """
    from etl_batch_spark.sources.txlog import (
        SchemaEvolutionError,
        _merge_schemas,
        _norm_schema,
    )

    reader = spark.readStream.schema(schema)
    stream = getattr(reader, file_format)(src_dir)
    if transform is not None:
        stream = transform(stream)

    out_schema = _norm_schema(stream.schema)
    pin_path = os.path.join(checkpoint_dir, "_engine_ingest_schema.json")
    if os.path.exists(pin_path):
        with open(pin_path) as f:
            prior = _norm_schema(T.StructType.fromJson(json.load(f)))
        if {(x.name, x.dataType) for x in prior.fields} != {
            (x.name, x.dataType) for x in out_schema.fields
        }:
            removed = set(prior.fieldNames()) - set(out_schema.fieldNames())
            if removed:
                raise SchemaEvolutionError(
                    f"ingest output drops column(s) {sorted(removed)} the "
                    "checkpoint's pinned schema carries; narrowing a "
                    "landing table needs a new checkpoint + dst, not a "
                    "resumed stream"
                )
            merged = _merge_schemas(prior, out_schema)  # type change raises
            if not merge_schema:
                raise SchemaEvolutionError(
                    f"ingest output schema {out_schema.simpleString()} "
                    f"drifted from the checkpoint's pinned "
                    f"{prior.simpleString()}; pass merge_schema=True to "
                    "evolve (older landed files NULL-fill the new columns "
                    "under a mergeSchema read)"
                )
            out_schema = merged
    n_batches = 0

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal n_batches
        n_batches += 1
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(dst_dir)
        )

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # pin (or re-pin, post-evolution) the output schema only after a
    # successful drain — a failed run must leave the pin untouched
    os.makedirs(checkpoint_dir, exist_ok=True)
    tmp = pin_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(out_schema.jsonValue(), f)
    os.replace(tmp, pin_path)
    return n_batches


# ---------------------------------------------------------------------------
# transformWithState (Spark 4): the successor API to
# applyInPandasWithState — typed per-key state primitives
# (ValueState/ListState/MapState), timers, and state evolution.  The
# running per-user aggregate below is the reference pattern: RocksDB-
# backed ValueState at scale, one row emitted per key per micro-batch.
# NB the TWS driver worker imports google.protobuf; environments
# without a working protobuf install (this container) must stay on
# applyInPandasWithState (sessionize_stateful above) — the test skips
# itself when protobuf is absent.
# ---------------------------------------------------------------------------
RUNNING_AGG_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

_AGG_STATE = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("s", T.DoubleType())]
)


def running_user_aggregate(stream: DataFrame) -> DataFrame:
    """Per-user lifetime (event count, value sum), maintained in typed
    ValueState via ``transformWithStateInPandas`` and re-emitted on
    every micro-batch that touches the user."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningAgg(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("agg", _AGG_STATE)

        def handleInputRows(self, key, rows, timerValues):
            n, s = (self._state.get() or (0, 0.0)) if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
            self._state.update((n, s))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
            )

        def close(self) -> None:
            pass

    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningAgg(),
            outputStructType=RUNNING_AGG_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def _checkpoint_incarnation(checkpoint_dir: str) -> str:
    """Token identifying one checkpoint directory's lifetime.

    Minted when the checkpoint is first used and stored INSIDE it, so it
    lives and dies with the checkpoint.  Replay guards must pair the
    recorded batch id with this token: after a checkpoint loss a fresh
    ``availableNow`` run re-reads the full source with batch ids
    restarting at 0 and a different file→batch mapping, so a bare
    ``stored_batch_id >= batch_id`` check would silently drop the new
    run's data.  With the token, an incarnation mismatch instead routes
    the sink to rebuild-from-scratch over the full re-read — correct as
    long as source retention covers the checkpoint's loss window (keep
    state and checkpoint together; vacuum source files only past both).
    """
    import os
    import uuid

    os.makedirs(checkpoint_dir, exist_ok=True)
    path = os.path.join(checkpoint_dir, "_incarnation")
    try:
        with open(path) as f:
            tok = f.read().strip()
        if tok:
            return tok
    except OSError:
        pass
    tok = uuid.uuid4().hex
    tmp = f"{path}.__{tok}__"
    with open(tmp, "w") as f:
        f.write(tok)
    os.rename(tmp, path)
    return tok


def maintain_rollup_incrementally(
    spark: SparkSession,
    src_dir: str,
    rollup_dir: str,
    checkpoint_dir: str,
    *,
    level: str = "day",
    key_cols: "tuple[str, ...]" = ("event_type",),
) -> int:
    """Streaming continuous aggregate: keep an et04-style partial-
    aggregate table (n/sum/min/max per bucket×keys) up to date as new
    event files arrive, WITHOUT ever re-scanning history.

    Each micro-batch aggregates only its own rows to partials, then
    merges them into the stored partial table (read-merge-swap; the
    partial merge is associative, so batch boundaries don't matter).
    The checkpoint tracks which source files were consumed, and the
    rollup directory carries an ``_applied_batch_id`` marker written
    atomically with the data (staged into the directory BEFORE the
    swap): if a crash lands between the swap and the checkpoint commit,
    the restart re-delivers the same batch_id, the marker shows it was
    already merged, and the sink skips it — resume, never double-count.
    The marker also records the checkpoint's incarnation token, so if
    the checkpoint itself is lost the fresh run (which re-reads the full
    source under restarted batch ids) rebuilds the rollup instead of
    mistaking its batches for replays — see
    :func:`_checkpoint_incarnation`.
    Returns micro-batches processed.  Query the result with
    ``operators.rollup.read_level``.

    At scale the merge touches only buckets present in the batch (a
    day's stream touches ~1 bucket); the swap is the same atomic
    directory rename every overwrite in this engine uses.
    """
    import os
    from etl_batch_spark.operators.rollup import _merge_partials, _partials_from_raw

    return maintain_partials_incrementally(
        spark,
        src_dir,
        rollup_dir,
        checkpoint_dir,
        build=lambda batch: _partials_from_raw(
            batch, ts_col="ts", key_cols=key_cols, value_col="value", level=level
        ),
        merge=lambda both: _merge_partials(both, key_cols=key_cols, level=level),
    )


def maintain_partials_incrementally(
    spark: SparkSession,
    src_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    *,
    build,
    merge,
) -> int:
    """Generic streaming continuous aggregate over ANY mergeable-partials
    family: ``build(batch_df) -> partials`` turns one micro-batch into
    partial rows, ``merge(stored ∪ fresh) -> partials`` re-aggregates —
    the only requirement is that ``merge`` is associative/idempotent over
    row UNION, which every partials family in this engine satisfies
    (numeric n/sum/min/max: operators/rollup.py; HLL registers via MAX:
    operators/sketch.py::hll_merge; histogram bins and count-min
    counters via SUM: hist_merge / cms_merge).

    Shares one exactly-once discipline: the streaming checkpoint tracks
    consumed files, and the ``_applied_batch_id`` marker staged into the
    store directory BEFORE the atomic swap makes replayed batches no-ops
    (see ``maintain_rollup_incrementally``).  Returns batches processed.
    """
    import os
    import shutil
    import uuid

    stream = read_events_stream(spark, src_dir)
    n_batches = 0
    marker = "_applied_batch_id"  # leading _ => ignored by parquet readers
    incarnation = _checkpoint_incarnation(checkpoint_dir)

    def applied_state(path: str) -> "tuple[str, int]":
        """(incarnation, batch_id) recorded in the store's marker; a
        pre-incarnation bare-int marker reads as a foreign incarnation
        (safe: triggers rebuild, never a silent skip)."""
        try:
            with open(os.path.join(path, marker)) as f:
                raw = f.read().strip()
            tok, _, bid = raw.rpartition(":")
            return tok, int(bid)
        except (OSError, ValueError):
            return "", -1

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal n_batches
        n_batches += 1
        tok, applied = applied_state(store_dir) if os.path.isdir(store_dir) else ("", -1)
        same_run = tok == incarnation
        if same_run and applied >= batch_id:
            return  # checkpoint replay of a batch already merged — skip
        fresh = build(batch_df)
        if os.path.isdir(store_dir) and same_run:
            existing = spark.read.parquet(store_dir)
            merged = merge(existing.unionByName(fresh))
        else:
            # no store yet, or state written under a DIFFERENT checkpoint
            # incarnation: batch ids from the old run must not gate this
            # one, and a fresh checkpoint re-reads the FULL source, so the
            # correct move is rebuild-from-this-run, never merge (double
            # count) or skip (drop)
            merged = fresh
        tmp = f"{store_dir}.__stage_{uuid.uuid4().hex}__"
        merged.write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, marker), "w") as f:
            f.write(f"{incarnation}:{batch_id}")
        old = f"{store_dir}.__old_{uuid.uuid4().hex}__"
        if os.path.isdir(store_dir):
            os.rename(store_dir, old)
        os.rename(tmp, store_dir)
        if os.path.isdir(old):
            shutil.rmtree(old, ignore_errors=True)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches


def maintain_partials_versioned(
    spark: SparkSession,
    src_dir: str,
    table_path: str,
    checkpoint_dir: str,
    *,
    build,
    merge,
):
    """:func:`maintain_partials_incrementally` with the store as a
    :class:`~etl_batch_spark.sources.txlog.TxTable` instead of a bare
    directory: each micro-batch's merge lands as one versioned commit
    whose metadata records the batch id, so

    - replay detection is part of the atomic commit itself (no separate
      marker file to keep in step with the data);
    - the rollup's full history is queryable — ``table.read(version=k)``
      shows the aggregate exactly as it stood after batch k, the
      continuous-aggregate analogue of time travel;
    - compaction/vacuum come for free from the table format.

    Returns ``(n_batches, TxTable)``.
    """
    from etl_batch_spark.sources.txlog import TxTable

    table = TxTable(spark, table_path)
    stream = read_events_stream(spark, src_dir)
    n_batches = 0
    incarnation = _checkpoint_incarnation(checkpoint_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal n_batches
        n_batches += 1
        meta = table.latest_meta()
        same_run = meta is not None and meta.get("incarnation") == incarnation
        if same_run and meta.get("batch_id", -1) >= batch_id:
            return  # checkpoint replay of a committed batch — skip
        fresh = build(batch_df)
        if table.latest_version() >= 0 and same_run:
            merged = merge(table.read().unionByName(fresh))
        else:
            # fresh table, or state committed under a different checkpoint
            # incarnation (checkpoint lost → full source re-read): rebuild
            # from this run's batches — see _checkpoint_incarnation
            merged = fresh
        table.overwrite(merged, meta={"batch_id": batch_id, "incarnation": incarnation})

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches, table



def _latest_per_key(df: DataFrame, key_col: str) -> DataFrame:
    """Latest event per key by (ts, event_id) — the upsert fold.  Kept
    module-level so the tombstone-vs-late-event merge semantics are
    directly testable.  Carries EVERY non-key column through the fold
    (schema evolution adds columns; the fold must not drop them); the
    struct comparison stays (ts, event_id, <remaining in input
    order>), so added columns only ever extend the tie-break tail."""
    rest = [c for c in df.columns if c not in (key_col, "ts", "event_id")]
    cols = ["ts", "event_id", *rest]
    return (
        df.groupBy(key_col)
        .agg(F.max(F.struct(*cols)).alias("s"))
        .select(
            key_col, *[F.col(f"s.{c}").alias(c) for c in cols]
        )
    )


def upsert_latest_versioned(
    spark: SparkSession,
    src_dir: str,
    table_path: str,
    checkpoint_dir: str,
    *,
    key_col: str = "user_id",
    delete_type: str = "error",
    transform=None,
    merge_schema: bool = False,
):
    """Streaming keyed upsert (the row-level sibling of
    :func:`maintain_partials_versioned`): each micro-batch folds to its
    latest event per key, merges latest-wins into the stored state, and
    commits one TxTable version — a Delta-style streaming MERGE sink.
    Events of ``delete_type`` are tombstones: a key whose latest event
    is a delete is ABSENT from the live view (CDC I/U/D semantics over
    a stream).  Tombstone rows stay in stored state — dropping them
    would let a later batch resurrect the key from an older, late-
    arriving event, since latest-wins needs the delete's (ts, event_id)
    to compare against.  Read live state via the returned ``live``
    builder (``read()`` filtered of tombstones); a retention job may
    vacuum tombstones older than the source's max lateness.

    Exactly-once discipline is the table's own commit metadata (batch
    id + checkpoint incarnation recorded atomically with the data:
    replays within a checkpoint's lifetime skip, and a LOST checkpoint —
    whose fresh run renumbers batches over a full source re-read —
    triggers a rebuild instead of a silent skip, see
    :func:`_checkpoint_incarnation`); per-batch work
    is one batch-local reduce + one keyed merge against current state —
    O(state + batch), never reprocessing history.  Returns
    ``(n_batches, TxTable, live)`` with ``live()`` the tombstone-free
    view of the current version.

    **Schema evolution across runs is PINNED**: a resumed run whose
    (post-``transform``) batch schema drifts from the stored state's
    refuses with :class:`~etl_batch_spark.sources.txlog.
    SchemaEvolutionError` at the NEXT BATCH boundary — inside the sink,
    BEFORE any commit, so the streaming checkpoint does not advance and
    the table head is untouched; the re-run (fixed code, or
    ``merge_schema=True``) re-delivers the same batch.  With
    ``merge_schema=True`` the state evolves: the merged snapshot
    carries the union schema in the commit log (et40 semantics), rows
    whose latest event predates the evolution NULL-fill the new
    columns, and a column the new batches no longer produce NULL-fills
    going forward.  A TYPE change on a shared column refuses either
    way.  (The rebuild path — lost checkpoint, fresh incarnation —
    replaces the schema wholesale like any overwrite: the full source
    re-read defines the state from scratch.)
    """
    from etl_batch_spark.sources.txlog import (
        SchemaEvolutionError,
        TxTable,
        _merge_schemas,
        _norm_schema,
    )

    table = TxTable(spark, table_path)
    stream = read_events_stream(spark, src_dir)
    if transform is not None:
        stream = transform(stream)
    n_batches = 0
    incarnation = _checkpoint_incarnation(checkpoint_dir)

    def latest_per_key(df: DataFrame) -> DataFrame:
        return _latest_per_key(df, key_col)

    # the drift refusal raises INSIDE foreachBatch, which Spark wraps in
    # a StreamingQueryException at awaitTermination — record the real
    # exception so callers catch the documented SchemaEvolutionError,
    # not a wrapper they must string-match
    drift_refusal: "list[SchemaEvolutionError]" = []

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal n_batches
        n_batches += 1
        meta = table.latest_meta()
        same_run = meta is not None and meta.get("incarnation") == incarnation
        if same_run and meta.get("batch_id", -1) >= batch_id:
            return  # checkpoint replay of a committed batch — skip
        fresh = latest_per_key(batch_df)
        if table.latest_version() >= 0 and same_run:
            cur = table.read()
            cur_s = _norm_schema(cur.schema)
            new_s = _norm_schema(fresh.schema)
            if {(x.name, x.dataType) for x in cur_s.fields} != {
                (x.name, x.dataType) for x in new_s.fields
            }:
                # union schema first: a type change raises regardless —
                # record EITHER refusal path (drift with
                # merge_schema=False, or _merge_schemas' type-change
                # error) so both unwrap identically at awaitTermination,
                # honoring the docstring's "refuses either way" contract
                try:
                    union_s = _merge_schemas(cur_s, new_s)
                    if not merge_schema:
                        raise SchemaEvolutionError(
                            f"batch schema {new_s.simpleString()} drifted "
                            f"from stored state {cur_s.simpleString()}; pass "
                            "merge_schema=True to evolve at this batch "
                            "boundary (the checkpoint has not advanced)"
                        )
                except SchemaEvolutionError as refusal:
                    drift_refusal.append(refusal)
                    raise
                merged = latest_per_key(
                    cur.unionByName(fresh, allowMissingColumns=True)
                    .select(*union_s.fieldNames())
                )
            else:
                merged = latest_per_key(cur.unionByName(fresh))
        else:
            # fresh table, or state from a different checkpoint
            # incarnation (checkpoint lost → full source re-read):
            # rebuild — latest-wins over the full replay reproduces the
            # exact state, so nothing is dropped or double-applied
            merged = fresh
        # tombstones are state, not garbage: keep them so a later
        # batch's OLDER event for the key still loses latest-wins
        table.overwrite(merged, meta={"batch_id": batch_id, "incarnation": incarnation})

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    except Exception as exc:
        if drift_refusal:  # unwrap to the documented exception type
            raise drift_refusal[0] from exc
        raise

    def live() -> DataFrame:
        # null-safe: a stored row whose latest event_type is NULL is not
        # a tombstone — plain != would evaluate NULL and drop it
        return table.read().filter(
            ~F.col("event_type").eqNullSafe(F.lit(delete_type))
        )

    return n_batches, table, live
