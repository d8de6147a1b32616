"""Product-analytics operators over the events stream: funnel, cohort
retention, rolling active users, top event paths.

The reference's control tables track batch runs, not user events, but an
analytics engine at 100 TB lives on exactly these shapes (ClickHouse's
``windowFunnel``/``retention``, every product warehouse's DAU/WAU).  All
are expressed as one-or-two-shuffle DataFrame plans keyed on ``user_id``
— the natural partitioning for an event log — so consecutive stages
reuse the same exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_batch_spark.catalog import load_table
from etl_batch_spark.queries.registry import query


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# ---------------------------------------------------------------------------
# ev01 — ordered conversion funnel view → click → purchase: users whose
# first click follows their first view, and first purchase follows that
# click.  The chain-of-first-occurrence semantics make every stage an
# aggregate on user_id — three aggs, one exchange key, no sequential
# scan state.  (ClickHouse windowFunnel(strict_order-less) analogue.)
# ---------------------------------------------------------------------------
@query(
    "ev01_funnel",
    bench=True,
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' AND ts IS NOT NULL GROUP BY 1
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY 1
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY 1
    )
    SELECT (SELECT COUNT(*) FROM s1) AS step1_view,
           (SELECT COUNT(*) FROM s2) AS step2_click,
           (SELECT COUNT(*) FROM s3) AS step3_purchase
    """,
)
def ev01_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE corpus pass: the oracle's per-stage CTEs re-read events three
    # times and join each stage back on user_id; here the sequential
    # stage times chain as per-user window minima over a single scan —
    # one hash exchange on user_id serves all three stages (the old
    # stage-join form carried 6 scans / 13 exchanges).  NULL chaining
    # matches the join form: ts > NULL is never true, so a user without
    # stage k has NULL for every later stage.  Domain exclusion, stated
    # on BOTH sides: a TIME funnel is defined over timed events, so a
    # user whose every 'view' has a NULL ts never enters step 1 (the
    # window form's count(t1) drops them naturally; the oracle says
    # `ts IS NOT NULL` explicitly — the m14 stress corpus caught the
    # asymmetry the old stage-join oracle hid).
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    staged = e.withColumn("t1", t1)
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") > F.col("t1")),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")),
            F.col("ts"),
        )
    ).over(w)
    per_user = (
        staged.withColumn("t3", t3)
        .select("user_id", "t1", "t2", "t3")
        .distinct()
    )
    return per_user.agg(
        F.count("t1").alias("step1_view"),
        F.count("t2").alias("step2_click"),
        F.count("t3").alias("step3_purchase"),
    )


# ---------------------------------------------------------------------------
# ev02 — cohort retention: users grouped by first-activity day; how many
# return exactly 1 / 7 days later.  First-day is an agg on user_id; the
# (user, active-day) grid is a distinct on the same key; conditional
# distinct counts finish per cohort.  Day arithmetic stays integer.
# ---------------------------------------------------------------------------
@query(
    "ev02_retention_cohorts",
    oracle="""
    WITH firstday AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY 1
    ),
    activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    )
    SELECT f.cohort_day,
           COUNT(DISTINCT f.user_id) AS cohort_size,
           COUNT(DISTINCT CASE WHEN a.day = f.cohort_day + 1
                               THEN a.user_id END) AS retained_d1,
           COUNT(DISTINCT CASE WHEN a.day = f.cohort_day + 7
                               THEN a.user_id END) AS retained_d7
    FROM firstday f
    JOIN activity a ON a.user_id = f.user_id
    GROUP BY f.cohort_day
    """,
)
def ev02_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    firstday = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_day")
    )
    activity = e.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    return (
        firstday.join(activity, "user_id")
        .groupBy("cohort_day")
        .agg(
            F.countDistinct("user_id").alias("cohort_size"),
            F.countDistinct(
                F.when(F.col("day") == F.date_add(F.col("cohort_day"), 1),
                       F.col("user_id"))
            ).alias("retained_d1"),
            F.countDistinct(
                F.when(F.col("day") == F.date_add(F.col("cohort_day"), 7),
                       F.col("user_id"))
            ).alias("retained_d7"),
        )
    )


# ---------------------------------------------------------------------------
# ev03 — DAU + trailing-7-day WAU: rolling COUNT(DISTINCT) over days is
# not window-expressible, so it becomes a range join of the (tiny) day
# spine against the distinct (user, day) grid — the spine broadcasts;
# the grid is the only shuffle.  At 100 TB the grid is already orders
# of magnitude smaller than the raw log.
# ---------------------------------------------------------------------------
@query(
    "ev03_active_users",
    oracle="""
    WITH activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    spine AS (SELECT DISTINCT day FROM activity)
    SELECT s.day,
           COUNT(DISTINCT CASE WHEN a.day = s.day THEN a.user_id END) AS dau,
           COUNT(DISTINCT a.user_id) AS wau
    FROM spine s
    JOIN activity a ON a.day BETWEEN s.day - 6 AND s.day
    GROUP BY s.day
    """,
)
def ev03_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    activity = e.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    spine = activity.select(F.col("day").alias("s_day")).distinct()
    return (
        activity.join(
            F.broadcast(spine),
            (F.col("day") >= F.date_sub(F.col("s_day"), 6))
            & (F.col("day") <= F.col("s_day")),
        )
        .groupBy(F.col("s_day").alias("day"))
        .agg(
            F.countDistinct(
                F.when(F.col("day") == F.col("s_day"), F.col("user_id"))
            ).alias("dau"),
            F.countDistinct("user_id").alias("wau"),
        )
    )


# ---------------------------------------------------------------------------
# ev04 — top event trigrams: the 10 most common consecutive 3-event
# paths across user timelines.  Two leads on the user_id/ts sort give
# the path per row; a global count + TakeOrdered top-k finishes.  Ties
# broken on the path string so the limit is deterministic.
# ---------------------------------------------------------------------------
@query(
    "ev04_top_paths",
    oracle="""
    SELECT path, COUNT(*) AS n
    FROM (
      SELECT event_type || '>' ||
             LEAD(event_type, 1) OVER w || '>' ||
             LEAD(event_type, 2) OVER w AS path
      -- an event with no timestamp has no position in a path (engines
      -- disagree on where NULL ts sorts; pinned by exclusion)
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    WHERE path IS NOT NULL
    GROUP BY path
    ORDER BY n DESC, path
    LIMIT 10
    """,
)
def ev04_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no timestamp -> no position in a path; see the oracle note
    e = _events(spark, sf_dir).filter(F.col("ts").isNotNull())
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # F.concat, not concat_ws: the oracle's '||' propagates NULL, so a
    # NULL event_type anywhere in the trigram must null the whole path
    # (concat_ws would silently skip it and emit a malformed 2-part path)
    path = F.concat(
        F.col("event_type"),
        F.lit(">"),
        F.lead("event_type", 1).over(w),
        F.lit(">"),
        F.lead("event_type", 2).over(w),
    )
    return (
        e.select(path.alias("path"))
        .filter(F.col("path").isNotNull())
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("path"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# ev05 — the general as-of operator (operators/asof.py) against DuckDB's
# native ASOF JOIN: each purchase takes the latest click at-or-before it
# per user.  Clicks are pre-deduped to one per (user, ts) so the match
# is well-defined in both engines.
# ---------------------------------------------------------------------------
@query(
    "ev05_asof_operator",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      -- NULL ts kept OUT of the ASOF inputs on both sides: DuckDB's
      -- sort-based ASOF treats NULL as an ordering value (a NULL-ts
      -- left row matches the LATEST right row; NULL pairs with NULL),
      -- where asof_join's contract is SQL comparison semantics — a
      -- timeless row matches nothing
      SELECT user_id, ts, ROUND(MAX(value), 2) AS click_value
      FROM events WHERE event_type = 'click' AND ts IS NOT NULL
      GROUP BY user_id, ts
    )
    SELECT p.event_id, p.user_id, p.ts,
           c.ts AS ts_right, c.click_value AS click_value_right
    FROM (SELECT * FROM purchases WHERE ts IS NOT NULL) p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    UNION ALL
    SELECT event_id, user_id, ts,
           NULL AS ts_right, NULL AS click_value_right
    FROM purchases WHERE ts IS NULL
    """,
)
def ev05_asof_operator(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_batch_spark.operators.asof import asof_join

    e = _events(spark, sf_dir)
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 2).alias("click_value"))
    )
    return asof_join(
        purchases, clicks, on="ts", by=["user_id"], direction="backward"
    ).select("event_id", "user_id", "ts", "ts_right", "click_value_right")


# ---------------------------------------------------------------------------
# ev06 — per-user linear interpolation of the purchase-value series at
# click timestamps, via cogroup(...).applyInPandas (operators/cogroup.py).
# One shuffle of each side on user_id; per-task state is one user's
# events.  Timestamp math is integer microseconds on both engines, so
# the interpolated doubles hash-match the DuckDB oracle exactly.
# Clicks outside a user's purchase hull interpolate to NULL.
# ---------------------------------------------------------------------------
@query(
    "ev06_interpolate_at_clicks",
    doc="cogrouped per-key linear interpolation (operators.cogroup.cogroup_interpolate)",
    oracle="""
    WITH clicks AS (
      -- a timeless click has no interpolation point; a timeless
      -- purchase can't anchor the series — both pinned by exclusion.
      -- DISTINCT pins the per-click grain: duplicate ingested click
      -- rows would otherwise fan out quadratically through the
      -- prev/nxt event_id self-joins below
      SELECT DISTINCT event_id, user_id, ts FROM events
      WHERE event_type = 'click' AND ts IS NOT NULL
    ),
    purch AS (
      -- identical-division avg: decimal sum then ONE double division,
      -- so a tied-ts group's mean can't straddle a ROUND half boundary
      -- differently per engine
      SELECT user_id, ts, epoch_us(ts) AS pts,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
                   / COUNT(value), 2) AS pval
      FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
      GROUP BY user_id, ts
    ),
    prev AS (
      SELECT c.event_id, p.pts AS xp, p.pval AS vp
      FROM clicks c ASOF LEFT JOIN purch p
        ON c.user_id = p.user_id AND c.ts >= p.ts
    ),
    nxt AS (
      SELECT c.event_id, p.pts AS xn, p.pval AS vn
      FROM clicks c ASOF LEFT JOIN (SELECT *, -pts AS npts FROM purch) p
        ON c.user_id = p.user_id AND -epoch_us(c.ts) >= p.npts
    )
    SELECT c.event_id, c.user_id,
           ROUND(CASE
             WHEN prev.vp IS NULL OR nxt.vn IS NULL THEN NULL
             WHEN nxt.xn = prev.xp THEN prev.vp
             ELSE prev.vp + (nxt.vn - prev.vp)
                  * (CAST(epoch_us(c.ts) - prev.xp AS DOUBLE)
                     / CAST(nxt.xn - prev.xp AS DOUBLE))
           END, 6) AS interp_value
    FROM clicks c
    JOIN prev ON prev.event_id = c.event_id
    JOIN nxt  ON nxt.event_id = c.event_id
    """,
)
def ev06_interpolate_at_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_batch_spark.operators.cogroup import cogroup_interpolate

    e = _events(spark, sf_dir).filter(F.col("ts").isNotNull())
    clicks = (
        e.filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "ts")
        .distinct()  # per-click grain, matching the oracle's DISTINCT
    )
    purch = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(12,2)")).cast("double")
                / F.count("value"),
                2,
            ).alias("pval")
        )
    )
    out = cogroup_interpolate(
        clicks, purch, key_col="user_id", ts_col="ts", value_col="pval"
    )
    return out.select(
        "event_id", "user_id", F.round("interp_value", 6).alias("interp_value")
    )


# ---------------------------------------------------------------------------
# ev07 — the BUILT-IN session_window aggregation (vs q27's manual
# gaps-and-islands): Spark merges per-user events closer than the gap
# into one session in a single aggregate — the same operator Structured
# Streaming uses for stateful session aggs, exercised here in batch.
# One shuffle on (user_id, window merge).  The oracle recomputes the
# sessions with the lag/cumsum island construction.
# ---------------------------------------------------------------------------
@query(
    "ev07_session_window_builtin",
    doc="built-in session_window(ts, gap) sessionization",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      -- session_window() drops NULL-ts rows on the Spark side; a
      -- timeless event belongs to no session — pinned by exclusion
      FROM events WHERE ts IS NOT NULL
    ),
    islands AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
           ROUND(epoch(MAX(ts)) - epoch(MIN(ts)), 2) AS duration_s
    FROM islands GROUP BY user_id, sid
    """,
)
def ev07_session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.min("ts").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.unix_micros(F.max("ts")) / 1e6 - F.unix_micros(F.min("ts")) / 1e6, 2
            ).alias("duration_s"),
        )
        .select("user_id", "session_start", "n_events", "duration_s")
    )


# ---------------------------------------------------------------------------
# ev08 — time-weighted average (TimescaleDB `time_weight('LOCF')`
# analogue): per-user piecewise-constant integral of `value` over the
# user's observation span, i.e. sum(value_i * (t_{i+1} - t_i)) / span.
# A plain AVG over-weights bursts of closely-spaced events; the TWA is
# the right statistic for sampled gauges.  One shuffle on user_id (the
# lead() window), partial-aggregated sum/min/max on the same exchange.
# ---------------------------------------------------------------------------
@query(
    "ev08_time_weighted_avg",
    doc="per-user LOCF time-weighted average of value",
    oracle="""
    WITH stepped AS (
      -- a timeless gauge reading has no LOCF interval; pinned by
      -- exclusion on both sides
      SELECT user_id, value, ts,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_ts
      FROM events WHERE ts IS NOT NULL
    )
    SELECT user_id,
           ROUND(SUM(value * (epoch(next_ts) - epoch(ts)))
                 / (epoch(MAX(next_ts)) - epoch(MIN(ts))), 6) AS twa,
           COUNT(*) AS n_events
    FROM stepped
    WHERE next_ts IS NOT NULL
    GROUP BY user_id
    HAVING epoch(MAX(next_ts)) > epoch(MIN(ts))
    """,
)
def ev08_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).filter(F.col("ts").isNotNull())
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    sec = lambda c: F.unix_micros(c) / F.lit(1e6)  # noqa: E731
    stepped = e.select(
        "user_id",
        "value",
        "ts",
        F.lead("ts").over(w).alias("next_ts"),
    ).filter(F.col("next_ts").isNotNull())
    return (
        stepped.groupBy("user_id")
        .agg(
            F.sum(F.col("value") * (sec(F.col("next_ts")) - sec(F.col("ts")))).alias("wsum"),
            F.max(sec(F.col("next_ts"))).alias("t_hi"),
            F.min(sec(F.col("ts"))).alias("t_lo"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .filter(F.col("t_hi") > F.col("t_lo"))
        .select(
            "user_id",
            F.round(F.col("wsum") / (F.col("t_hi") - F.col("t_lo")), 6).alias("twa"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# ev09 — OHLC bars (candlesticks): daily open/high/low/close of `value`
# per event_type in ONE aggregate pass using min_by/max_by keyed on
# (ts, event_id) — no window, no self-join, no sort.  The (ts,
# event_id) struct key makes open/close deterministic under ts ties.
# This is the shape every market-data / metrics warehouse rolls up at
# ingest; at 100 TB it is a single map-side-combined shuffle on
# (day, type).  Oracle uses DuckDB's ordered-aggregate FIRST/LAST.
# ---------------------------------------------------------------------------
@query(
    "ev09_ohlc_bars",
    bench=True,
    doc="daily OHLC bars via min_by/max_by, one aggregate pass",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bar_day,
           event_type,
           ROUND(FIRST(value ORDER BY ts, event_id), 4) AS open,
           ROUND(MAX(value), 4) AS high,
           ROUND(MIN(value), 4) AS low,
           ROUND(LAST(value ORDER BY ts, event_id), 4) AS close,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def ev09_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    key = F.struct("ts", "event_id")
    return (
        e.groupBy(
            F.date_trunc("day", "ts").alias("bar_day"),
            "event_type",
        )
        .agg(
            F.round(F.min_by("value", key), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max_by("value", key), 4).alias("close"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# ev10 — behavioral state-transition matrix (first-order Markov chain):
# counts and row-normalized probabilities of event_type -> event_type
# transitions within each user's ordered stream.  lag() is one shuffle
# on user_id; the probability denominator is a window over the tiny
# (5x5) transition aggregate, not the fact table.
# ---------------------------------------------------------------------------
@query(
    "ev10_markov_transitions",
    doc="event-type transition counts + probabilities (Markov chain)",
    oracle="""
    WITH pairs AS (
      -- a timeless event has no position in the transition order
      SELECT LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type,
             event_type
      FROM events WHERE ts IS NOT NULL
    ),
    counts AS (
      SELECT prev_type, event_type, COUNT(*) AS n
      FROM pairs WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT prev_type, event_type, n,
           ROUND(n / SUM(n) OVER (PARTITION BY prev_type), 6) AS p
    FROM counts
    """,
)
def ev10_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).filter(F.col("ts").isNotNull())
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    counts = (
        e.select(F.lag("event_type").over(w).alias("prev_type"), "event_type")
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wp = W.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "event_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wp), 6).alias("p"),
    )


# ---------------------------------------------------------------------------
# ev11 — time since last occurrence of a marker event: for every event,
# seconds since the user's most recent PRIOR purchase (NULL before the
# first).  max(CASE …) over an expanding frame — one shuffle on
# user_id, no self-join, no sequential scan state.  The recency
# feature every churn/propensity model starts from.
# ---------------------------------------------------------------------------
@query(
    "ev11_time_since_purchase",
    oracle="""
    SELECT event_id, user_id, event_type,
           ROUND(epoch(ts) - MAX(CASE WHEN event_type = 'purchase'
                                      THEN epoch(ts) END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 2)
             AS s_since_purchase
    FROM events WHERE user_id % 25 = 11
    """,
)
def ev11_time_since_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).filter(F.col("user_id") % 25 == 11)
    sec = F.unix_micros("ts") / F.lit(1e6)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    last_purchase = F.max(
        F.when(F.col("event_type") == "purchase", sec)
    ).over(w)
    return e.select(
        "event_id",
        "user_id",
        "event_type",
        F.round(sec - last_purchase, 2).alias("s_since_purchase"),
    )


# ---------------------------------------------------------------------------
# ev12 — time-bounded funnel (ClickHouse windowFunnel semantics):
# view → click → purchase must complete within 24h of the FIRST view.
# Unlike ev01's unbounded chain, each stage joins on user AND the
# window bound, so conversion credit expires.  Still pure aggregates
# on user_id — the stage joins reuse one exchange key; no sequential
# scan state, no window functions over the fact table.
# ---------------------------------------------------------------------------
@query(
    "ev12_windowed_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' AND ts IS NOT NULL GROUP BY 1
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
        AND e.ts <= s1.t1 + INTERVAL 24 HOUR
      GROUP BY 1
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e
      JOIN s2 ON e.user_id = s2.user_id
      JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        AND e.ts <= s1.t1 + INTERVAL 24 HOUR
      GROUP BY 1
    )
    SELECT (SELECT COUNT(*) FROM s1) AS step1_view,
           (SELECT COUNT(*) FROM s2) AS step2_click_24h,
           (SELECT COUNT(*) FROM s3) AS step3_purchase_24h
    """,
)
def ev12_windowed_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE corpus pass (ev01's window-chain form, plus the 24 h deadline
    # riding each stage): one scan + one hash exchange on user_id
    # replaces the three stage-joins (6 scans / 13 exchanges)
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id")
    t1 = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    staged = e.withColumn("t1", t1)
    deadline = F.col("t1") + F.expr("INTERVAL 24 HOURS")
    t2 = F.min(
        F.when(
            (F.col("event_type") == "click")
            & (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= deadline),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= deadline),
            F.col("ts"),
        )
    ).over(w)
    per_user = (
        staged.withColumn("t3", t3)
        .select("user_id", "t1", "t2", "t3")
        .distinct()
    )
    return per_user.agg(
        F.count("t1").alias("step1_view"),
        F.count("t2").alias("step2_click_24h"),
        F.count("t3").alias("step3_purchase_24h"),
    )


# ---------------------------------------------------------------------------
# ev13 — last-touch attribution (batch twin of the streaming
# purchase_attribution_join): every purchase attributes to the latest
# same-user click within the preceding hour via the engine's as-of join
# (backward + tolerance — one union+window shuffle on user_id, never an
# inequality join); revenue splits into attributed vs organic per day.
# The oracle replays the pick with a LATERAL ORDER BY/LIMIT 1.
# ---------------------------------------------------------------------------
@query(
    "ev13_last_touch_attribution",
    doc="per-day attributed vs organic purchase revenue "
    "(operators.asof.asof_join, backward, 1h tolerance)",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'
    ),
    att AS (
      SELECT p.ts, p.value, t.click_ts
      FROM p LEFT JOIN LATERAL (
        SELECT c.click_ts FROM c
        WHERE c.user_id = p.user_id AND c.click_ts <= p.ts
          AND c.click_ts >= p.ts - INTERVAL 1 HOUR
        ORDER BY c.click_ts DESC LIMIT 1
      ) t ON TRUE
    )
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           COUNT(*) AS n_purchases,
           CAST(SUM(CASE WHEN click_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_attributed,
           ROUND(SUM(CASE WHEN click_ts IS NOT NULL THEN value ELSE 0 END), 2)
             AS attributed_revenue,
           ROUND(SUM(CASE WHEN click_ts IS NULL THEN value ELSE 0 END), 2)
             AS organic_revenue
    FROM att GROUP BY 1
    """,
)
def ev13_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_batch_spark.operators.asof import asof_join

    e = _events(spark, sf_dir)
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    c = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("ts").alias("click_ts")
    )
    att = asof_join(
        p,
        c,
        on="ts",
        by=["user_id"],
        direction="backward",
        tolerance_s=3600.0,
        right_value_cols=["click_ts"],
    )
    attributed = F.col("click_ts_right").isNotNull()  # asof suffixes right cols
    return att.groupBy(F.date_trunc("DAY", F.col("ts")).alias("day")).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(attributed.cast("int")).cast("bigint").alias("n_attributed"),
        F.round(F.sum(F.when(attributed, F.col("value")).otherwise(0.0)), 2).alias(
            "attributed_revenue"
        ),
        F.round(F.sum(F.when(~attributed, F.col("value")).otherwise(0.0)), 2).alias(
            "organic_revenue"
        ),
    )


@query(
    "ev14_linear_attribution",
    doc="linear multi-touch attribution: equal credit to every click in "
    "the pre-purchase hour, per props-derived channel",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts AS pts, value FROM events
      WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT user_id AS cuser, ts AS cts,
             'c' || CAST((CAST(json_extract_string(props, '$.k') AS BIGINT) % 3)
                         AS VARCHAR) AS channel
      FROM events WHERE event_type = 'click'
    ),
    j AS (
      SELECT p.event_id, p.value, c.channel
      FROM p LEFT JOIN c
        ON c.cuser = p.user_id AND c.cts <= p.pts
       AND c.cts >= p.pts - INTERVAL 1 HOUR
    ),
    cr AS (
      SELECT event_id, value, COALESCE(channel, 'organic') AS channel,
             COUNT(*) OVER (PARTITION BY event_id) AS n
      FROM j
    )
    SELECT channel, COUNT(*) AS n_touches,
           -- exact fixed-point credit: value/n at double precision is
           -- summation-order-dependent and odd-cents/2 lands exactly on
           -- the ROUND half boundary; integer micro-cents with floor
           -- division are bit-identical on every engine (value >= 0,
           -- n >= 1, so // == truncation)
           ROUND(SUM(CAST(ROUND(value * 100) AS BIGINT) * 10000 // n)
                 / 1000000.0, 2) AS credited_revenue
    FROM cr GROUP BY channel
    """,
)
def ev14_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch complement of ev13: every click in the hour before a
    purchase shares the credit EQUALLY (value / n_touches); orphan
    purchases credit a synthetic 'organic' channel.  Channels derive
    from props.k % 3 (the fixture has no channel column; the fractional
    credit mechanics are what this query pins).

    Plan shape: the touch join is an equi-join on user_id with the time
    band as a residual predicate — clicks and purchases of ONE user meet
    in one task, never a cross join; per-purchase touch counts are a
    window over that purchase's touches only.
    """
    e = _events(spark, sf_dir)
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("pts"), "value"
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cuser"),
        F.col("ts").alias("cts"),
        F.concat(
            F.lit("c"),
            (F.get_json_object("props", "$.k").cast("long") % 3).cast("string"),
        ).alias("channel"),
    )
    j = p.join(
        c,
        (F.col("cuser") == F.col("user_id"))
        & (F.col("cts") <= F.col("pts"))
        & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    w = W.partitionBy("event_id")
    credited = j.select(
        "event_id",
        "value",
        F.coalesce("channel", F.lit("organic")).alias("channel"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    return credited.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_touches"),
        # exact fixed-point micro-cent credit (see oracle note)
        F.round(
            F.sum(F.expr("cast(round(value * 100) as bigint) * 10000 div n"))
            / 1000000.0,
            2,
        ).alias("credited_revenue"),
    )



# ---------------------------------------------------------------------------
# ev15 — peak concurrency per day (sweep line): each event opens a
# 15-minute activity interval; the day's peak is the max number of
# simultaneously open intervals.  Plan: boundary stream (+1 at open,
# −1 at close), one scale-safe global running sum over (t, delta)
# order (operators/ranks.py::global_prefix_agg — range-sliced, no
# single-task window), then a max per day.  Closes sort before opens at
# the same instant (delta −1 < +1), so half-open [t, t+15m) intervals
# never self-overlap; ties within a (t, delta) group only permute a
# same-sign run whose endpoints are fixed, so the day max is
# deterministic.  Linear in events at any scale.
# ---------------------------------------------------------------------------
@query(
    "ev15_peak_concurrency",
    bench=True,
    doc="sweep-line peak concurrent 15-min activity intervals per day "
    "(operators.ranks.global_prefix_agg running sum)",
    oracle="""
    WITH b AS (
      SELECT ts AS t, 1 AS delta FROM events
      UNION ALL
      SELECT ts + INTERVAL 15 MINUTE AS t, -1 AS delta FROM events
    ),
    r AS (
      SELECT t, SUM(delta) OVER (ORDER BY t, delta
                                 ROWS UNBOUNDED PRECEDING) AS run
      FROM b
    )
    SELECT CAST(date_trunc('day', t) AS DATE) AS day,
           CAST(MAX(run) AS BIGINT) AS peak
    FROM r GROUP BY 1
    """,
)
def ev15_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_batch_spark.operators.ranks import global_prefix_agg

    e = _events(spark, sf_dir).select("ts", "event_id")
    opens = e.select(F.col("ts").alias("t"), F.lit(1).alias("delta"), "event_id")
    closes = e.select(
        (F.col("ts") + F.expr("INTERVAL 15 MINUTES")).alias("t"),
        F.lit(-1).alias("delta"),
        "event_id",
    )
    b = opens.unionByName(closes)
    run = global_prefix_agg(
        b,
        [F.col("t").asc(), F.col("delta").asc(), F.col("event_id").asc()],
        F.col("delta"),
        "run",
        agg="sum",
        inclusive=True,
    )
    return (
        run.groupBy(F.to_date("t").alias("day"))
        .agg(F.max("run").cast("bigint").alias("peak"))
    )


# ---------------------------------------------------------------------------
# ev16 — A/B experiment readout: users hash-split 50/50 (the same
# engine-portable md5 split sm08 uses for train/val/test — assignment
# is reproducible from user_id alone, no assignment table), conversion
# = a heavy-buyer outcome (≥14 purchase events — "any purchase" is ~1.0
# on this fixture and a degenerate rate makes the z denominator 0),
# then the two-proportion z-statistic.  One groupBy(user) + one
# conditional aggregate — two linear shuffles at any scale; the
# statistic itself is arithmetic over a 1-row aggregate.  Every float
# is computed with the same expression tree in both engines, so even
# the z-score is bit-exact under ROUND; NULLIF keeps the degenerate
# all-convert/none-convert case NULL instead of an engine-specific
# division error.
# ---------------------------------------------------------------------------
@query(
    "ev16_ab_test_zscore",
    doc="hash-split A/B conversion readout with two-proportion z-score "
    "(one conditional aggregate; md5 assignment)",
    oracle="""
    WITH conv AS (
      SELECT user_id,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
                  THEN 1 ELSE 0 END AS converted,
             (('0x' || substr(md5(CAST(user_id AS VARCHAR) || '|ab'), 1, 15))::BIGINT) % 2
               AS variant
      FROM events GROUP BY user_id
    ),
    s AS (
      SELECT SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS n_a,
             SUM(CASE WHEN variant = 0 THEN converted ELSE 0 END) AS conv_a,
             SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n_b,
             SUM(CASE WHEN variant = 1 THEN converted ELSE 0 END) AS conv_b
      FROM conv
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(conv_a AS BIGINT) AS conv_a,
           CAST(n_b AS BIGINT) AS n_b, CAST(conv_b AS BIGINT) AS conv_b,
           ROUND(CAST(conv_a AS DOUBLE) / n_a, 6) AS rate_a,
           ROUND(CAST(conv_b AS DOUBLE) / n_b, 6) AS rate_b,
           ROUND(
             (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
             / NULLIF(sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (1 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b)), 0),
             4) AS z_score
    FROM s
    """,
)
def ev16_ab_test_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    variant = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit("|ab"))), 1, 15
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    conv = e.groupBy("user_id").agg(
        (
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)) >= 14
        )
        .cast("int")
        .alias("converted")
    ).withColumn("variant", variant)
    s = conv.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("variant") == 0, F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("conv_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("variant") == 1, F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("conv_b"),
    )
    ca, na = F.col("conv_a").cast("double"), F.col("n_a")
    cb, nb = F.col("conv_b").cast("double"), F.col("n_b")
    pooled = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (ca / na - cb / nb) / F.nullif(
        F.sqrt(
            pooled
            * (1 - pooled)
            * (F.lit(1).cast("double") / na + F.lit(1).cast("double") / nb)
        ),
        F.lit(0.0),
    )
    return s.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.round(ca / na, 6).alias("rate_a"),
        F.round(cb / nb, 6).alias("rate_b"),
        F.round(z, 4).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# ev17 — Markov removal-effect attribution (the model-based member of
# the attribution trio: last-touch ev13, linear ev14, Markov here).
# User journeys (pre-first-purchase event sequences, 'start' prepended,
# absorbed into 'conv'/'null') reduce to an integer transition-count
# matrix over a BOUNDED state space — the only O(rows) stage, two
# shuffles (first-purchase agg + per-user path agg).  Conversion
# probability from 'start' is then a 12-step value iteration on that
# ≤7×7 matrix; each channel's removal effect re-runs it with the
# channel's state pinned to 0 ("journeys through it fail").  The
# iteration is exact fixed-point integer arithmetic (nano-scale,
# floor division) on driver-side aggregate state — the k-means-
# centroid pattern — so a DuckDB oracle replays it bit-for-bit as 12
# unrolled CTE steps.
# ---------------------------------------------------------------------------
_EV17_SCALE = 1_000_000_000
_EV17_ITERS = 12


def _ev17_duck_oracle() -> str:
    steps = []
    for t in range(1, _EV17_ITERS + 1):
        prev = f"v{t-1}"
        steps.append(f"""
    v{t} AS MATERIALIZED (
      SELECT g.variant, g.state,
             CASE WHEN g.state = g.variant THEN CAST(0 AS BIGINT)
                  ELSE CAST(CAST(SUM(c.n *
                         CASE WHEN c.t2 = 'conv' THEN {_EV17_SCALE}
                              WHEN c.t2 = 'null' THEN 0
                              WHEN c.t2 = g.variant THEN 0
                              ELSE COALESCE(pv.v, 0) END) AS BIGINT)
                       // CAST(MAX(tt.N) AS BIGINT) AS BIGINT) END AS v
      FROM grid g
      JOIN counts c ON c.f = g.state
      LEFT JOIN {prev} pv ON pv.variant = g.variant AND pv.state = c.t2
      JOIN totals tt ON tt.f = g.state
      GROUP BY g.variant, g.state
    )""")
    return f"""
    WITH fp AS MATERIALIZED (
      -- no timestamp -> no position in a journey (ev04 convention);
      -- filtered identically on the Spark side, where array_sort would
      -- otherwise put NULL ts FIRST while ORDER BY ts puts it LAST
      SELECT user_id, MIN(ts) AS fp_ts FROM events
      WHERE event_type = 'purchase' AND ts IS NOT NULL GROUP BY 1
    ),
    pre AS MATERIALIZED (
      SELECT e.user_id, e.ts, e.event_id, e.event_type, fp.fp_ts
      FROM events e LEFT JOIN fp ON e.user_id = fp.user_id
      WHERE e.event_type <> 'purchase' AND e.ts IS NOT NULL
        AND (fp.fp_ts IS NULL OR e.ts < fp.fp_ts)
    ),
    seqs AS MATERIALIZED (
      SELECT user_id,
             list(event_type ORDER BY ts, event_id) AS types,
             MAX(CASE WHEN fp_ts IS NOT NULL THEN 1 ELSE 0 END) AS has_conv
      FROM pre GROUP BY user_id
    ),
    only_conv AS (
      SELECT fp.user_id FROM fp
      LEFT JOIN (SELECT DISTINCT user_id FROM pre) p ON p.user_id = fp.user_id
      WHERE p.user_id IS NULL
    ),
    paths AS MATERIALIZED (
      SELECT ['start'] || types ||
             [CASE WHEN has_conv = 1 THEN 'conv' ELSE 'null' END] AS path
      FROM seqs
      UNION ALL
      SELECT ['start', 'conv'] FROM only_conv
    ),
    hops AS MATERIALIZED (
      SELECT UNNEST(generate_series(1, len(path) - 1)) AS i, path FROM paths
    ),
    counts AS MATERIALIZED (
      SELECT path[i] AS f, path[i + 1] AS t2, COUNT(*) AS n
      FROM hops GROUP BY 1, 2
    ),
    totals AS MATERIALIZED (SELECT f, SUM(n) AS N FROM counts GROUP BY 1),
    variants AS MATERIALIZED (
      -- channels are DERIVED from the data (every journey from-state
      -- except 'start'), so a new event_type cannot be silently
      -- excluded from attribution
      SELECT 'base' AS variant
      UNION ALL
      SELECT DISTINCT f FROM counts WHERE f <> 'start'
    ),
    grid AS MATERIALIZED (
      SELECT v.variant, s.f AS state
      FROM variants v
      CROSS JOIN (SELECT DISTINCT f FROM counts) s
    ),
    v0 AS MATERIALIZED (SELECT variant, state, CAST(0 AS BIGINT) AS v FROM grid),
    {",".join(steps)},
    res AS (
      SELECT r.variant AS channel,
             (SELECT v FROM v{_EV17_ITERS}
               WHERE variant = 'base' AND state = 'start') AS base_nano,
             r.v AS removed_nano
      FROM v{_EV17_ITERS} r
      WHERE r.state = 'start' AND r.variant <> 'base'
    )
    SELECT channel, base_nano, removed_nano,
           base_nano - removed_nano AS removal_nano,
           ROUND((base_nano - removed_nano)
                 / NULLIF(CAST(SUM(base_nano - removed_nano) OVER ()
                               AS DOUBLE), 0), 4) AS share
    FROM res
    """


@query(
    "ev17_markov_attribution",
    bench=True,
    doc="Markov removal-effect channel attribution (bounded-state "
    "fixed-point value iteration over journey transition counts)",
    oracle=_ev17_duck_oracle(),
)
def ev17_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no timestamp -> no position in a journey (ev04 convention; see oracle)
    e = _events(spark, sf_dir).filter(F.col("ts").isNotNull())
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fp_ts"))
    )
    pre = e.join(fp, "user_id", "left").filter(
        (F.col("event_type") != "purchase")
        & (F.col("fp_ts").isNull() | (F.col("ts") < F.col("fp_ts")))
    )
    seqs = pre.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("arr"),
        F.max(F.col("fp_ts").isNotNull().cast("int")).alias("has_conv"),
    )
    paths = seqs.select(
        F.concat(
            F.array(F.lit("start")),
            F.expr("transform(arr, x -> x.event_type)"),
            F.array(F.when(F.col("has_conv") == 1, "conv").otherwise("null")),
        ).alias("path")
    ).unionByName(
        fp.join(pre.select("user_id").distinct(), "user_id", "left_anti").select(
            F.array(F.lit("start"), F.lit("conv")).alias("path")
        )
    )
    hops = paths.select(
        F.explode(F.expr("sequence(1, size(path) - 1)")).alias("i"), "path"
    )
    counts_df = hops.groupBy(
        F.expr("element_at(path, i)").alias("f"),
        F.expr("element_at(path, i + 1)").alias("t2"),
    ).agg(F.count(F.lit(1)).alias("n"))

    # bounded aggregate state (≤ 7×7 integer cells) — the k-means-
    # centroid pattern: the matrix is collected, never the rows
    counts = {(r["f"], r["t2"]): r["n"] for r in counts_df.collect()}
    schema = (
        "channel string, base_nano long, removed_nano long, "
        "removal_nano long, share double"
    )
    if not counts:
        return spark.createDataFrame([], schema)
    totals: dict[str, int] = {}
    for (f, _), n in counts.items():
        totals[f] = totals.get(f, 0) + n
    states = sorted(totals)

    def iterate(blocked: "str | None") -> int:
        v = {s: 0 for s in states}
        for _ in range(_EV17_ITERS):
            nv = {}
            for s in states:
                if s == blocked:
                    nv[s] = 0
                    continue
                acc = sum(
                    n
                    * (
                        _EV17_SCALE
                        if t2 == "conv"
                        else 0
                        if t2 in ("null", blocked)
                        else v.get(t2, 0)
                    )
                    for (f, t2), n in counts.items()
                    if f == s
                )
                nv[s] = acc // totals[s]
            v = nv
        return v.get("start", 0)

    base = iterate(None)
    rows = []
    # channels derived from the data: every journey from-state except
    # 'start' — a new event_type automatically joins the attribution
    channels = sorted(s for s in states if s != "start")
    removals = {c: base - iterate(c) for c in channels}
    total_removal = sum(removals.values())
    # half-up at 4dp like the DuckDB oracle's ROUND (and F.round everywhere
    # else) — Python's round() is half-to-even and diverges on exact halves
    from decimal import ROUND_HALF_UP, Decimal

    for c in channels:
        share = (
            float(
                Decimal(repr(removals[c] / float(total_removal))).quantize(
                    Decimal("0.0001"), rounding=ROUND_HALF_UP
                )
            )
            if total_removal
            else None
        )
        rows.append((c, base, base - removals[c], removals[c], share))
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# ev18 — RFM segmentation (recency / frequency / monetary), the classic
# customer-scoring analytic, built the SCALE-SAFE way: scores come from
# comparing each user's metric against the exact q20/q40/q60/q80
# quantile thresholds (one tiny all-users aggregate, broadcast back),
# NOT from a global ntile() — an unpartitioned ranking window over all
# users is exactly the anti-pattern the plan sweep forbids (users are
# data-sized at 100 TB; four threshold doubles are not).  Strict `>`
# at each threshold puts boundary values in the lower bucket on both
# engines; quantile interpolation arithmetic is IEEE-identical
# (the q26 precedent).  Purchases only; a NULL-ts purchase has no
# recency position and is excluded from BOTH sides' recency metric by
# taking max(ts) over non-null ts — but still counts toward
# frequency/monetary (stated domain).
# ---------------------------------------------------------------------------
@query(
    "ev18_rfm_segments",
    doc="RFM customer scoring via exact quantile thresholds "
    "(scale-safe: no global ntile window; one broadcast of 12 doubles)",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             epoch_us(MAX(ts)) AS recency_us,
             COUNT(*) AS freq,
             ROUND(SUM(value), 2) AS monetary
      FROM events
      WHERE event_type = 'purchase'
      GROUP BY user_id
    ),
    th AS (
      SELECT quantile_cont(recency_us, 0.2) AS r20,
             quantile_cont(recency_us, 0.4) AS r40,
             quantile_cont(recency_us, 0.6) AS r60,
             quantile_cont(recency_us, 0.8) AS r80,
             quantile_cont(freq, 0.2) AS f20, quantile_cont(freq, 0.4) AS f40,
             quantile_cont(freq, 0.6) AS f60, quantile_cont(freq, 0.8) AS f80,
             quantile_cont(monetary, 0.2) AS m20, quantile_cont(monetary, 0.4) AS m40,
             quantile_cont(monetary, 0.6) AS m60, quantile_cont(monetary, 0.8) AS m80
      FROM per_user
    )
    SELECT user_id, freq, monetary,
           CAST(1 + (recency_us > r20)::INT + (recency_us > r40)::INT
                  + (recency_us > r60)::INT + (recency_us > r80)::INT AS INT)
             AS r_score,
           CAST(1 + (freq > f20)::INT + (freq > f40)::INT
                  + (freq > f60)::INT + (freq > f80)::INT AS INT) AS f_score,
           CAST(1 + (monetary > m20)::INT + (monetary > m40)::INT
                  + (monetary > m60)::INT + (monetary > m80)::INT AS INT)
             AS m_score
    FROM per_user CROSS JOIN th
    """,
)
def ev18_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    per_user = e.groupBy("user_id").agg(
        F.unix_micros(F.max("ts")).alias("recency_us"),
        F.count(F.lit(1)).alias("freq"),
        F.round(F.sum("value"), 2).alias("monetary"),
    )
    th = per_user.agg(
        *[
            F.expr(f"percentile({m}, {p})").alias(f"{m[0]}{int(p * 100)}")
            for m in ("recency_us", "freq", "monetary")
            for p in (0.2, 0.4, 0.6, 0.8)
        ]
    )
    scored = per_user.crossJoin(F.broadcast(th))

    def score(metric: str, prefix: str):
        s = F.lit(1)
        for p in (20, 40, 60, 80):
            s = s + (F.col(metric) > F.col(f"{prefix}{p}")).cast("int")
        return s.cast("int")

    return scored.select(
        "user_id",
        "freq",
        "monetary",
        score("recency_us", "r").alias("r_score"),
        score("freq", "f").alias("f_score"),
        score("monetary", "m").alias("m_score"),
    )


# ---------------------------------------------------------------------------
# ev19 — per-user inter-arrival statistics (the burstiness/cadence
# signal behind rate limiting and bot heuristics): event count, active
# span, mean gap and max gap.  All arithmetic stays in INTEGER
# micros until one final division (span/(n-1), then /1e6 — identical
# left-associated IEEE ops on both engines), so no rounding is needed
# anywhere.  The lag window partitions by user — never data-sized.
# A single-event user has no gaps: mean/max are NULL on both sides.
# ---------------------------------------------------------------------------
@query(
    "ev19_interarrival_stats",
    doc="per-user event cadence: count, active span, mean/max inter-"
    "arrival gap (exact integer-micros arithmetic, one final division)",
    oracle="""
    WITH g AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      -- a timeless event has no position in the arrival sequence
      FROM events WHERE ts IS NOT NULL
    )
    SELECT user_id,
           COUNT(*) AS n_events,
           (MAX(us) - MIN(us)) / 1000000.0 AS span_s,
           CASE WHEN COUNT(*) > 1
                THEN CAST(MAX(us) - MIN(us) AS DOUBLE) / (COUNT(*) - 1)
                     / 1000000.0
           END AS mean_gap_s,
           MAX(gap_us) / 1000000.0 AS max_gap_s
    FROM g
    GROUP BY user_id
    """,
)
def ev19_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).filter(F.col("ts").isNotNull())
    us = F.unix_micros("ts")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    g = e.select(
        "user_id",
        us.alias("us"),
        (us - F.lag(us).over(w)).alias("gap_us"),
    )
    n = F.count(F.lit(1))
    span_us = F.max("us") - F.min("us")
    return g.groupBy("user_id").agg(
        n.alias("n_events"),
        (span_us / F.lit(1000000.0)).alias("span_s"),
        F.when(
            n > 1,
            span_us.cast("double") / (n - 1) / F.lit(1000000.0),
        ).alias("mean_gap_s"),
        (F.max("gap_us") / F.lit(1000000.0)).alias("max_gap_s"),
    )


# ---------------------------------------------------------------------------
# ev20 — time-decay attribution, completing the attribution quartet
# (ev13 last-touch, ev14 linear, ev17 Markov removal effects): each
# click in the pre-purchase hour earns weight 0.5^k where k is the
# number of COMPLETE 15-minute intervals between click and purchase
# (quarter-hour half-life, k ∈ 0..4).  Dyadic weights are exact in
# IEEE, and the credit split stays in integers end-to-end: weights are
# carried as w16 = 16 >> k ∈ {16,8,4,2,1}, credit =
# value_microcents * w16 // Σw16 — bit-identical on every engine, the
# ev14 micro-cent discipline with non-equal shares.  Orphan purchases
# credit 'organic' at full weight.  The touch join is an equi-join on
# user_id with the time band residual (one user's events meet in one
# task, never a cross join), k from exact microsecond arithmetic
# (unix_micros / epoch_us — no truncate-then-subtract second skew).
# ---------------------------------------------------------------------------
@query(
    "ev20_time_decay_attribution",
    doc="time-decay multi-touch attribution: 0.5^(15-min intervals) "
    "dyadic weights, integer micro-cent credit split per channel",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts AS pts, value FROM events
      WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT user_id AS cuser, ts AS cts,
             'c' || CAST((CAST(json_extract_string(props, '$.k') AS BIGINT) % 3)
                         AS VARCHAR) AS channel
      FROM events WHERE event_type = 'click'
    ),
    j AS (
      SELECT p.event_id, p.value, c.channel,
             CASE WHEN c.cuser IS NULL THEN 16
                  ELSE CAST(16 / POWER(2,
                       (epoch_us(p.pts) - epoch_us(c.cts)) // 900000000)
                       AS BIGINT) END AS w16
      FROM p LEFT JOIN c
        ON c.cuser = p.user_id AND c.cts <= p.pts
       AND c.cts >= p.pts - INTERVAL 1 HOUR
    ),
    cr AS (
      SELECT event_id, value, COALESCE(channel, 'organic') AS channel, w16,
             SUM(w16) OVER (PARTITION BY event_id) AS sw
      FROM j
    )
    SELECT channel, COUNT(*) AS n_touches,
           ROUND(SUM(CAST(ROUND(value * 100) AS BIGINT) * 10000 * w16 // sw)
                 / 1000000.0, 2) AS credited_revenue
    FROM cr GROUP BY channel
    """,
)
def ev20_time_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("pts"), "value"
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cuser"),
        F.col("ts").alias("cts"),
        F.concat(
            F.lit("c"),
            (F.get_json_object("props", "$.k").cast("long") % 3).cast("string"),
        ).alias("channel"),
    )
    j = p.join(
        c,
        (F.col("cuser") == F.col("user_id"))
        & (F.col("cts") <= F.col("pts"))
        & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    # k complete 15-min intervals -> dyadic weight 16 >> k (exact;
    # shiftright needs a column bit count, so the whole thing is SQL)
    w16 = F.when(F.col("cuser").isNull(), F.lit(16)).otherwise(
        F.expr(
            "shiftright(16, cast((unix_micros(pts) - unix_micros(cts)) "
            "div 900000000 as int))"
        )
    )
    w = W.partitionBy("event_id")
    credited = j.select(
        "event_id",
        "value",
        F.coalesce("channel", F.lit("organic")).alias("channel"),
        w16.alias("w16"),
    ).withColumn("sw", F.sum("w16").over(w))
    return credited.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.round(
            F.sum(F.expr(
                "cast(round(value * 100) as bigint) * 10000 * w16 div sw"
            ))
            / 1000000.0,
            2,
        ).alias("credited_revenue"),
    )
