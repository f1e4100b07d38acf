"""Event-analytics operators: ordered-funnel conversion and cohort
retention over ``events``.

These are the two workhorse product-analytics queries every
OLAP/event engine ships (Amplitude/Mixpanel-style): "who progressed
view -> click -> purchase, in order" and "of the users whose first
activity was day D, how many were active again D+k days later".
Both are pure aggregations/joins — no window over raw events, no
per-user UDF state.

Scale shape (100 TB of events):
- ``funnel_conversion`` is three cascading per-user MIN aggregations,
  each partial-aggregated map-side before one shuffle on user_id; the
  later stages join per-user 1-row relations (user-count-sized, far
  smaller than the event stream).
- ``cohort_retention`` is two per-user aggregates joined on user_id
  followed by a (cohort_day, offset) count-distinct — the matrix is
  |days| x |offsets|, a model-sized output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from conversadocs_spark import io
from conversadocs_spark.plans.registry import register

# --------------------------------------------------------------------------
# ordered funnel: view -> click -> purchase
# --------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH v AS (
    SELECT user_id, min(ts) AS t_view
    FROM events WHERE event_type = 'view'
    GROUP BY user_id
),
c AS (
    SELECT e.user_id, min(e.ts) AS t_click
    FROM events e JOIN v ON v.user_id = e.user_id
    WHERE e.event_type = 'click' AND e.ts > v.t_view
    GROUP BY e.user_id
),
p AS (
    SELECT e.user_id, min(e.ts) AS t_purchase
    FROM events e JOIN c ON c.user_id = e.user_id
    WHERE e.event_type = 'purchase' AND e.ts > c.t_click
    GROUP BY e.user_id
)
SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
       p.user_id IS NOT NULL AS converted
FROM v
LEFT JOIN c ON c.user_id = v.user_id
LEFT JOIN p ON p.user_id = v.user_id
"""


@register("funnel_conversion", oracle=_FUNNEL_ORACLE, tags=("analytics",))
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered 3-step funnel: earliest view, earliest click
    AFTER that view, earliest purchase AFTER that click, per user —
    with `converted` marking users who completed all three in order.

    Each stage is a per-user MIN with map-side partial aggregation;
    stages 2 and 3 join the previous stage's per-user 1-row relation
    (bounded by user count) against the filtered event stream. This
    is the O(n) funnel plan — no sort, no per-user event collection,
    no window over raw events.
    """
    ev = io.table(spark, sf_dir, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p.withColumn("_p", F.lit(True)), "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            F.coalesce("_p", F.lit(False)).alias("converted"),
        )
    )


# --------------------------------------------------------------------------
# cohort retention matrix
# --------------------------------------------------------------------------

_COHORT_ORACLE = """
WITH first_day AS (
    SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
    FROM events GROUP BY user_id
),
activity AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_day FROM events
),
joined AS (
    SELECT f.cohort_day,
           CAST(a.active_day - f.cohort_day AS INTEGER) AS day_offset,
           f.user_id
    FROM first_day f JOIN activity a ON a.user_id = f.user_id
),
cohort_size AS (
    SELECT cohort_day, count(*) AS n_users FROM first_day
    GROUP BY cohort_day
)
SELECT j.cohort_day, j.day_offset,
       count(DISTINCT j.user_id)               AS n_active,
       s.n_users                               AS cohort_size,
       round(CAST(count(DISTINCT j.user_id) AS DOUBLE)
             / s.n_users, 6)                   AS retention
FROM joined j
JOIN cohort_size s ON s.cohort_day = j.cohort_day
WHERE j.day_offset <= 14
GROUP BY j.cohort_day, j.day_offset, s.n_users
"""


@register("cohort_retention", oracle=_COHORT_ORACLE, tags=("analytics",))
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day;
    for each (cohort_day, day_offset <= 14) the distinct-user count
    still active and its share of the cohort.

    Two per-user aggregates (first day, distinct active days) joined
    on user_id — user-count-sized relations after the first shuffle —
    then a (cohort, offset) aggregation whose output is matrix-sized.
    Retention ratio is exact-integer division rounded once.
    """
    ev = io.table(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("cohort_day")
    )
    activity = ev.select(
        "user_id", F.col("ts").cast("date").alias("active_day")
    ).distinct()
    joined = first_day.join(activity, "user_id").select(
        "cohort_day",
        F.datediff("active_day", "cohort_day")
        .cast("int")
        .alias("day_offset"),
        "user_id",
    )
    size = first_day.groupBy("cohort_day").agg(
        F.count("*").alias("cohort_size")
    )
    return (
        joined.where(F.col("day_offset") <= 14)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").alias("n_active"))
        .join(F.broadcast(size), "cohort_day")
        .select(
            "cohort_day",
            "day_offset",
            "n_active",
            "cohort_size",
            F.round(
                F.col("n_active").cast("double") / F.col("cohort_size"), 6
            ).alias("retention"),
        )
    )
