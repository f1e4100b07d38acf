"""Event-time window semantics (SURVEY §2B phase 4) in BATCH mode,
oracle-checked: tumbling, sliding, and session windows over ``events``.

These are the exact groupings Structured Streaming maintains
incrementally (``conversadocs_spark/streaming/`` runs the SAME column
expressions over ``readStream``; tests/test_streaming.py proves
stream-replay == these batch plans). Registering the batch form gives
the driver hash-checkable correctness rows for the window semantics —
the streaming execution path itself is verified by deterministic replay
tests, which is the strongest check available for a non-SQL-expressible
runtime mode.

Exactness: value sums go through DECIMAL then rounded DOUBLE final
columns (the plans/ decimal policy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from conversadocs_spark import io
from conversadocs_spark.plans.registry import register

# --------------------------------------------------------------------------
# tumbling window (6 h) per event type
# --------------------------------------------------------------------------

_TUMBLING_ORACLE = """
SELECT time_bucket(INTERVAL '6 hours', ts)                       AS win_start,
       time_bucket(INTERVAL '6 hours', ts) + INTERVAL '6 hours'  AS win_end,
       event_type,
       count(*)                                                  AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
                                                                 AS total_value
FROM events
GROUP BY 1, 2, 3
"""


@register("window_tumbling", oracle=_TUMBLING_ORACLE, tags=("eventtime",))
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed 6-hour tumbling windows per event type. Epoch-aligned on
    both engines (Spark window() and DuckDB time_bucket() both anchor
    at epoch-divisible boundaries for divisor intervals)."""
    ev = io.table(spark, sf_dir, "events")
    w = F.window("ts", "6 hours")
    return ev.groupBy(w, "event_type").agg(
        F.count("*").alias("n_events"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6
        ).alias("total_value"),
    ).select(
        F.col("window.start").alias("win_start"),
        F.col("window.end").alias("win_end"),
        "event_type",
        "n_events",
        "total_value",
    )


# --------------------------------------------------------------------------
# sliding window (12 h window, 6 h slide)
# --------------------------------------------------------------------------

_SLIDING_ORACLE = """
WITH shifted AS (
    SELECT e.ts, e.value,
           time_bucket(INTERVAL '6 hours', e.ts)
               - k.k * INTERVAL '6 hours'            AS win_start
    FROM events e
    JOIN (SELECT unnest(range(0, 2)) AS k) k ON true
)
SELECT win_start,
       win_start + INTERVAL '12 hours'               AS win_end,
       count(*)                                      AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6)
                                                     AS total_value
FROM shifted
GROUP BY 1, 2
"""


@register("window_sliding", oracle=_SLIDING_ORACLE, tags=("eventtime",))
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """12-hour windows sliding every 6 hours: every event lands in
    exactly two overlapping windows (window/slide = 2 copies — the
    fan-out the streaming engine maintains incrementally)."""
    ev = io.table(spark, sf_dir, "events")
    w = F.window("ts", "12 hours", "6 hours")
    return ev.groupBy(w).agg(
        F.count("*").alias("n_events"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6
        ).alias("total_value"),
    ).select(
        F.col("window.start").alias("win_start"),
        F.col("window.end").alias("win_end"),
        "n_events",
        "total_value",
    )


# --------------------------------------------------------------------------
# session window (4 h gap) per user
# --------------------------------------------------------------------------

_SESSION_ORACLE = """
WITH marked AS (
    SELECT user_id, ts,
           CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                     >= INTERVAL '4 hours'
                OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
),
sessions AS (
    SELECT user_id, ts,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS session_id
    FROM marked
)
SELECT user_id,
       min(ts)                        AS session_start,
       max(ts) + INTERVAL '4 hours'   AS session_end,
       count(*)                       AS n_events
FROM sessions
GROUP BY user_id, session_id
"""


@register("window_session", oracle=_SESSION_ORACLE, tags=("eventtime",))
def window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 4-hour inactivity gap per user — the
    batch form of the reference's per-session conversation state (R12).
    Spark merges events whose gap < 4 h into one session whose end is
    last_event + gap; the oracle reproduces that with the
    gaps-and-islands idiom (lag + running sum)."""
    ev = io.table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "4 hours"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


# --------------------------------------------------------------------------
# interval attribution join (the stream-stream join shape, batch form)
# --------------------------------------------------------------------------

_INTERVAL_ATTRIB_ORACLE = """
SELECT c.event_id              AS click_id,
       p.event_id              AS purchase_id,
       c.user_id,
       epoch_us(p.ts - c.ts)   AS micros_between
FROM events c
JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click'
 AND p.event_type = 'purchase'
 AND p.ts > c.ts
 AND p.ts <= c.ts + INTERVAL 30 MINUTE
"""


@register(
    "join_interval_attrib",
    oracle=_INTERVAL_ATTRIB_ORACLE,
    tags=("eventtime", "join"),
)
def join_interval_attrib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click->purchase attribution: EVERY click within the 30-minute
    window before a same-user purchase (unlike `join_asof`, which
    keeps only the latest). This is the canonical stream-stream
    interval join — `streaming_interval_join_replay`
    (plans/streamqueries.py) runs the SAME predicate as a watermarked
    stream-stream join, and tests/test_streaming.py proves replay
    equals this batch plan.

    Plan shape: equi-join on user_id carries the shuffle, the time
    band is a post-join filter — so it scales like a hash join, not a
    cartesian. The gap rides along as exact integer microseconds
    (timestamp subtraction is exact in both engines; a float seconds
    column would be another rounding-boundary trap)."""
    ev = io.table(spark, sf_dir, "events")
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("c_ts"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    joined = c.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (
            F.col("p_ts")
            <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")
        ),
    )
    return joined.select(
        "click_id",
        "purchase_id",
        "user_id",
        (
            F.unix_micros(F.col("p_ts").cast("timestamp"))
            - F.unix_micros(F.col("c_ts").cast("timestamp"))
        ).alias("micros_between"),
    )


# --------------------------------------------------------------------------
# resample to a fixed grid + forward-fill gaps (time-series conforming)
# --------------------------------------------------------------------------

_GAPFILL_ORACLE = """
WITH ev AS (
    SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS bucket, value
    FROM events WHERE user_id < 8
),
agg AS (
    SELECT user_id, bucket, count(*) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                 / count(*), 6) AS obs
    FROM ev GROUP BY user_id, bucket
),
bounds AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM ev),
hours AS (
    SELECT unnest(generate_series(lo, hi, INTERVAL 1 hour)) AS bucket
    FROM bounds
),
users AS (SELECT DISTINCT user_id FROM ev),
grid AS (SELECT user_id, bucket FROM users CROSS JOIN hours)
SELECT g.user_id, g.bucket,
       coalesce(a.n_events, 0) AS n_events,
       last_value(a.obs IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.bucket
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS value_filled,
       a.n_events IS NOT NULL AS is_observed
FROM grid g
LEFT JOIN agg a ON a.user_id = g.user_id AND a.bucket = g.bucket
"""


@register("resample_gapfill", oracle=_GAPFILL_ORACLE, tags=("eventtime",))
def resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample per-user event values onto a dense 1-hour grid and
    forward-fill gaps (the conforming step before any time-series
    model or as-of join; TimescaleDB's time_bucket_gapfill + locf).

    Plan: one (user, bucket) partial-aggregated shuffle over the
    filtered events; the grid is users x buckets built from a 1-row
    bounds aggregate (sequence + explode, broadcast onto the user
    list — never a scan-sized relation); forward-fill is one window
    pass per user ordered by bucket. At 100 TB the only data-sized
    stage is the first aggregation; grid size is |users| x |buckets|,
    which is a *model* decision, and the window shuffle moves the
    already-aggregated grid, not raw events. Exactness: hourly mean
    goes through DECIMAL sum / exact count, so no float-order drift.
    Leading gaps (before a user's first observation) stay NULL — the
    honest answer locf gives.
    """
    ev = io.table(spark, sf_dir, "events").where(F.col("user_id") < 8)
    bucketed = ev.select(
        "user_id",
        F.date_trunc("hour", F.col("ts")).alias("bucket"),
        "value",
    )
    agg = bucketed.groupBy("user_id", "bucket").agg(
        F.count("*").alias("n_events"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("obs"),
    )
    bounds = bucketed.agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    hours = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("interval 1 hour"))
        ).alias("bucket")
    )
    users = bucketed.select("user_id").distinct()
    grid = users.crossJoin(F.broadcast(hours))
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(agg, ["user_id", "bucket"], "left")
        .select(
            "user_id",
            "bucket",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("obs", ignorenulls=True).over(w).alias("value_filled"),
            F.col("n_events").isNotNull().alias("is_observed"),
        )
    )
