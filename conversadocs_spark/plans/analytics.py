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

from pyspark.sql import DataFrame, SparkSession, Window
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


# --------------------------------------------------------------------------
# time-range rolling window (RANGE frame over seconds, per user)
# --------------------------------------------------------------------------

_RANGE_TIME_ORACLE = """
WITH sec AS (
    SELECT event_id, user_id, ts, value,
           (CAST(ts AS DATE) - DATE '2024-01-01') * 86400
           + hour(ts) * 3600 + minute(ts) * 60 + second(ts) AS sec
    FROM events WHERE user_id < 10
)
SELECT event_id, user_id, ts,
       count(*) OVER w                                   AS n_1h,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE),
             6)                                          AS sum_1h
FROM sec
WINDOW w AS (PARTITION BY user_id ORDER BY sec
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


@register("window_range_time", oracle=_RANGE_TIME_ORACLE, tags=("analytics",))
def window_range_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 1-hour aggregate per user with a RANGE (time-interval)
    frame — the frame every monitoring/feature-engineering query
    wants, and a different physical shape from ROWS frames: the frame
    bounds follow the VALUE of the ordering column, so each row's
    window covers however many events fell in its trailing hour.

    The NTZ timestamp is lowered to epoch-style integer seconds with
    field arithmetic (TIMESTAMP_NTZ has no direct long cast), then
    rangeBetween(-3600, 0). One shuffle on user_id; frame evaluation
    is streaming within each sorted partition. Sums go through
    DECIMAL so the rolling values are float-order exact.
    """
    ev = io.table(spark, sf_dir, "events").where(F.col("user_id") < 10)
    sec = (
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        * 86400
        + F.hour("ts") * 3600
        + F.minute("ts") * 60
        + F.second("ts")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("sec"))
        .rangeBetween(-3600, 0)
    )
    return (
        ev.withColumn("sec", sec)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.count("*").over(w).alias("n_1h"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)"))
                .over(w)
                .cast("double"),
                6,
            ).alias("sum_1h"),
        )
    )


# --------------------------------------------------------------------------
# event transition matrix (first-order Markov over event_type)
# --------------------------------------------------------------------------

_TRANSITIONS_ORACLE = """
WITH seq AS (
    SELECT user_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_type
    FROM events
),
counts AS (
    SELECT prev_type, event_type AS next_type, count(*) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
),
totals AS (
    SELECT prev_type, sum(n) AS total FROM counts GROUP BY prev_type
)
SELECT c.prev_type, c.next_type, c.n,
       round(CAST(c.n AS DOUBLE) / t.total, 6) AS p
FROM counts c JOIN totals t USING (prev_type)
"""


@register("event_transitions", oracle=_TRANSITIONS_ORACLE,
          tags=("analytics",))
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next_type | prev_type) with exact counts.

    lag() needs one shuffle on user_id; the (prev, next) aggregation
    is partial-aggregated map-side and its output is |types|^2 rows —
    model-sized at any corpus scale. The row-denominator join is a
    broadcast of the |types|-row totals."""
    ev = io.table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).where(F.col("prev_type").isNotNull())
    counts = (
        seq.groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )
    totals = counts.groupBy("prev_type").agg(F.sum("n").alias("total"))
    return counts.join(F.broadcast(totals), "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n").cast("double") / F.col("total"), 6).alias("p"),
    )


# --------------------------------------------------------------------------
# data-quality audit (Deequ/dbt-test style rule sweep)
# --------------------------------------------------------------------------

_DQ_ORACLE = """
WITH corrupted_docs AS (
    SELECT doc_id,
           CASE WHEN doc_id % 97 = 0 THEN '' ELSE text END AS text
    FROM documents
),
corrupted_orders AS (
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 89 = 0 THEN o_custkey + 900000
                ELSE o_custkey END AS o_custkey
    FROM orders
)
SELECT 'empty_text' AS rule, count(*) AS violations
FROM corrupted_docs WHERE length(text) = 0
UNION ALL
SELECT 'fk_orphan_orders', count(*)
FROM corrupted_orders o
WHERE NOT EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'dup_customer_key', count(*) FROM (
    SELECT c_custkey FROM customer
    GROUP BY c_custkey HAVING count(*) > 1
)
UNION ALL
SELECT 'negative_quantity', count(*) FROM lineitem WHERE l_quantity < 0
"""


@register("dq_audit", oracle=_DQ_ORACLE, tags=("analytics", "quality"))
def dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality rule sweep (the Deequ/dbt-test shape): one row per
    rule with its violation count. Rules: empty text, FK orphans
    (orders -> customer via left anti), duplicate primary keys,
    domain-range violation. Violations are injected deterministically
    in-plan (doc_id % 97 empties text, o_orderkey % 89 re-keys the
    customer FK out of range) so the audit itself is hash-checked
    non-vacuously — the pii_redact pattern.

    Each rule is a scan + aggregate or an anti-join keyed for
    broadcast/shuffle as size dictates; rules share no state, so the
    union runs them as independent parallel stages."""
    docs = io.table(spark, sf_dir, "documents").select(
        F.when(F.col("doc_id") % 97 == 0, "").otherwise(
            F.col("text")
        ).alias("text")
    )
    orders = io.table(spark, sf_dir, "orders").select(
        F.when(
            F.col("o_orderkey") % 89 == 0, F.col("o_custkey") + 900000
        ).otherwise(F.col("o_custkey")).alias("o_custkey")
    )
    cust = io.table(spark, sf_dir, "customer")
    li = io.table(spark, sf_dir, "lineitem")
    r1 = docs.where(F.length("text") == 0).agg(
        F.count("*").alias("violations")
    ).select(F.lit("empty_text").alias("rule"), "violations")
    r2 = (
        orders.join(
            cust.select("c_custkey"),
            orders["o_custkey"] == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count("*").alias("violations"))
        .select(F.lit("fk_orphan_orders").alias("rule"), "violations")
    )
    r3 = (
        cust.groupBy("c_custkey")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > 1)
        .agg(F.count("*").alias("violations"))
        .select(F.lit("dup_customer_key").alias("rule"), "violations")
    )
    r4 = (
        li.where(F.col("l_quantity") < 0)
        .agg(F.count("*").alias("violations"))
        .select(F.lit("negative_quantity").alias("rule"), "violations")
    )
    return r1.unionByName(r2).unionByName(r3).unionByName(r4)


# --------------------------------------------------------------------------
# sessionization: assign session ids by inactivity gap
# --------------------------------------------------------------------------

_SESSIONIZE_ORACLE = """
WITH seq AS (
    SELECT event_id, user_id, ts,
           lag(ts) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS prev_ts
    FROM events WHERE user_id < 20
),
flagged AS (
    SELECT event_id, user_id, ts,
           CASE WHEN prev_ts IS NULL
                     OR ts - prev_ts > INTERVAL '30 minutes'
                THEN 1 ELSE 0 END AS new_session
    FROM seq
)
SELECT event_id, user_id, ts,
       CAST(sum(new_session) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS INTEGER)
           AS session_seq
FROM flagged
"""


@register("sessionize", oracle=_SESSIONIZE_ORACLE, tags=("analytics",))
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign per-user session sequence numbers: a >30-minute
    inactivity gap starts a new session (the raw-event labeling that
    window_session aggregates; this keeps every event row, which
    funnels/attribution need).

    lag + running sum over one user_id shuffle — the standard
    gaps-and-islands lowering; both windows share the same sort so
    Catalyst evaluates them in a single Window operator."""
    ev = io.table(spark, sf_dir, "events").where(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("timestamp").cast("long") - F.lag(
        F.col("ts").cast("timestamp").cast("long")
    ).over(w)
    flagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0).alias(
            "new_session"
        ),
    )
    return flagged.select(
        "event_id",
        "user_id",
        "ts",
        F.sum("new_session")
        .over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .cast("int")
        .alias("session_seq"),
    )


# --------------------------------------------------------------------------
# anomaly detection: z-score vs trailing baseline
# --------------------------------------------------------------------------

_ANOMALY_ORACLE = """
WITH hourly AS (
    SELECT event_type,
           time_bucket(INTERVAL '1 hour', ts) AS win_start,
           count(*) AS n_events
    FROM events GROUP BY 1, 2
),
stats AS (
    SELECT event_type, win_start, n_events,
           count(*)              OVER w AS base_n,
           sum(n_events)         OVER w AS s1,
           sum(n_events * n_events) OVER w AS s2
    FROM hourly
    WINDOW w AS (PARTITION BY event_type ORDER BY win_start
                 ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, win_start, n_events,
       round((n_events - CAST(s1 AS DOUBLE) / base_n)
             / sqrt((s2 - CAST(s1 AS DOUBLE) * s1 / base_n)
                    / (base_n - 1)), 6) AS zscore
FROM stats
WHERE base_n >= 12
  AND (s2 - CAST(s1 AS DOUBLE) * s1 / base_n) > 0
"""


@register("anomaly_zscore", oracle=_ANOMALY_ORACLE, tags=("analytics",))
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type hourly event counts scored against their own trailing
    24-hour baseline: z = (x - mean) / std over the PRECEDING frame
    (current bucket excluded, so a spike can't mask itself). Rows need
    >= 12 baseline buckets and nonzero variance.

    The baseline moments are integer window sums (count/sum/sum-sq
    over counts — exact at any scale); mean/variance derive from them
    in one deterministic double expression, so no float-accumulation
    drift. One shuffle to hourly buckets (map-side partial agg over
    raw events), one bucket-count-sized window pass."""
    ev = io.table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.window("ts", "1 hour").alias("win")
    ).agg(F.count("*").alias("n_events")).select(
        "event_type", F.col("win.start").alias("win_start"), "n_events"
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("win_start")
        .rowsBetween(-24, -1)
    )
    stats = hourly.select(
        "event_type",
        "win_start",
        "n_events",
        F.count("*").over(w).alias("base_n"),
        F.sum("n_events").over(w).alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).over(w).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("base_n")
    var = (
        F.col("s2") - F.col("s1").cast("double") * F.col("s1") / F.col("base_n")
    ) / (F.col("base_n") - 1)
    return (
        stats.where(
            (F.col("base_n") >= 12)
            & (
                F.col("s2")
                - F.col("s1").cast("double") * F.col("s1") / F.col("base_n")
                > 0
            )
        )
        .select(
            "event_type",
            "win_start",
            "n_events",
            F.round((F.col("n_events") - mean) / F.sqrt(var), 6).alias(
                "zscore"
            ),
        )
    )


# --------------------------------------------------------------------------
# market-basket co-occurrence with lift
# --------------------------------------------------------------------------

_BASKET_ORACLE = """
WITH baskets AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pairs AS (
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           count(*) AS pair_n
    FROM baskets a JOIN baskets b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
),
part_n AS (
    SELECT l_partkey, count(*) AS n FROM baskets GROUP BY 1
),
total AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM baskets)
SELECT p.part_a, p.part_b, p.pair_n,
       round(CAST(p.pair_n AS DOUBLE) * t.n_orders
             / (na.n * CAST(nb.n AS DOUBLE)), 6) AS lift
FROM pairs p
JOIN part_n na ON na.l_partkey = p.part_a
JOIN part_n nb ON nb.l_partkey = p.part_b
CROSS JOIN total t
WHERE p.pair_n >= 3
"""


@register("basket_lift", oracle=_BASKET_ORACLE, tags=("analytics",))
def basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: parts bought together in one
    order, with lift = P(a,b) / (P(a) P(b)); pairs seen >= 3 times.

    The self-join is keyed on l_orderkey, so fan-out is C(items, 2)
    PER ORDER — bounded by basket size (~7 here), i.e. linear in
    orders, not quadratic in parts. Per-part frequencies broadcast
    (part-count-sized); the total is a 1-row broadcast. This is the
    co-occurrence shape recommendation pipelines run at full scale."""
    li = io.table(spark, sf_dir, "lineitem")
    baskets = li.select("l_orderkey", "l_partkey").distinct()
    a = baskets.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_a")
    )
    b = baskets.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        a.join(b, "k")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("pair_n"))
        .where(F.col("pair_n") >= 3)
    )
    part_n = baskets.groupBy("l_partkey").agg(F.count("*").alias("n"))
    total = baskets.agg(
        F.count_distinct("l_orderkey").alias("n_orders")
    )
    return (
        pairs.join(
            F.broadcast(part_n.select(F.col("l_partkey").alias("part_a"),
                                      F.col("n").alias("na"))),
            "part_a",
        )
        .join(
            F.broadcast(part_n.select(F.col("l_partkey").alias("part_b"),
                                      F.col("n").alias("nb"))),
            "part_b",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "part_a",
            "part_b",
            "pair_n",
            F.round(
                F.col("pair_n").cast("double")
                * F.col("n_orders")
                / (F.col("na") * F.col("nb").cast("double")),
                6,
            ).alias("lift"),
        )
    )


# --------------------------------------------------------------------------
# robust outlier detection: median / MAD z-score per event type
# --------------------------------------------------------------------------

_OUTLIER_MAD_ORACLE = """
WITH med AS (
    SELECT event_type,
           percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS med
    FROM events GROUP BY event_type
),
mad AS (
    SELECT e.event_type, m.med,
           percentile_cont(0.5)
               WITHIN GROUP (ORDER BY abs(e.value - m.med)) AS mad
    FROM events e JOIN med m USING (event_type)
    GROUP BY e.event_type, m.med
)
SELECT e.event_id, e.event_type, e.value,
       ROUND((e.value - s.med) / (1.4826 * s.mad), 6) AS robust_z
FROM events e JOIN mad s USING (event_type)
WHERE s.mad > 0
  AND abs(ROUND((e.value - s.med) / (1.4826 * s.mad), 6)) > 3.0
"""


@register("outlier_mad", oracle=_OUTLIER_MAD_ORACLE, tags=("analytics",))
def outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier detection: flag events whose value
    sits more than 3 robust z-units from its type's median, where the
    unit is 1.4826 * MAD (the consistency constant that makes MAD
    estimate sigma under normality — Hampel 1974). Complements
    anomaly_zscore (trailing mean/std over COUNTS): mean/std are
    themselves dragged by the outliers they're meant to flag; median
    and MAD have a 50% breakdown point, the standard choice for
    long-tailed training-data metrics (doc lengths, perplexities,
    event values).

    Scale: exact medians are a deliberate choice here — one shuffle
    per percentile on event_type (a LOW-cardinality, well-distributed
    key; Spark's percentile is a typed imperative aggregate, partial-
    aggregated map-side). The group-count-sized stats table (5 rows)
    broadcasts back onto the raw scan, so the events table itself
    never shuffles in the flagging pass. For 100 TB or high-
    cardinality keys, swap the exact median for the rank-epsilon
    approx_percentile (agg_percentile_approx) — same plan shape,
    bounded memory.
    """
    ev = io.table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("med")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(
            F.percentile(
                F.abs(F.col("value") - F.col("med")), 0.5
            ).alias("mad")
        )
    )
    # The keep predicate compares the ROUNDED z (same rounding the
    # output column carries, and the oracle mirrors it): Spark's
    # percentile and DuckDB's percentile_cont can disagree in the
    # last ulp of the interpolated median/MAD, so an unrounded
    # compare lets a value sitting exactly on the 3.0 boundary flip
    # membership between engines (ADVICE r8). Spark round (HALF_UP,
    # away from zero) and C round agree under abs(), so
    # abs(round(z)) == round(abs(z)) on both sides.
    z = F.round(
        (F.col("value") - F.col("med"))
        / (F.lit(1.4826) * F.col("mad")),
        6,
    )
    return (
        ev.join(F.broadcast(mad), "event_type")
        .where((F.col("mad") > 0) & (F.abs(z) > 3.0))
        .select(
            "event_id",
            "event_type",
            "value",
            z.alias("robust_z"),
        )
    )


# --------------------------------------------------------------------------
# skyline / Pareto frontier (dominance filtering)
# --------------------------------------------------------------------------

_PARETO_ORACLE = """
WITH p AS (SELECT * FROM part WHERE p_partkey < 200000)
SELECT r.p_partkey, r.p_retailprice, r.p_size
FROM p r
WHERE NOT EXISTS (
    SELECT 1 FROM p s
    WHERE s.p_retailprice <= r.p_retailprice
      AND s.p_size >= r.p_size
      AND (s.p_retailprice < r.p_retailprice
           OR s.p_size > r.p_size)
)
ORDER BY r.p_retailprice ASC, r.p_partkey ASC
"""


@register("pareto_frontier", oracle=_PARETO_ORACLE, tags=("analytics",))
def pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline query (Borzsonyi et al., ICDE 2001): the parts no other
    part strictly dominates on (cheaper price, bigger size) — the
    "best tradeoffs" operator behind product search, plan selection,
    and multi-objective data pruning.

    The oracle is the textbook O(n^2) NOT EXISTS; the Spark plan is
    the O(n log n) 2-D rewrite: collapse to one row per distinct
    price (groupBy price -> max size, a map-side-combined aggregate),
    take the running max of size over strictly-cheaper prices with
    ONE window over that collapsed table, and keep a row iff it tops
    its own price group (no same-price row is strictly taller) and
    beats every cheaper group's best (prev_max < size).

    Scale shape: the only corpus-sized work is one aggregate; the
    window is SinglePartition but runs over the DISTINCT-PRICE table
    (1000 rows here, bounded by the attribute's cardinality — the
    token_budget_select "global semantics over the bucket table only"
    pattern); the verdict joins back on the price key as an ordinary
    hash join, corpus never broadcast. Dominance semantics are pure
    integer/decimal comparisons — no float ambiguity anywhere.

    The p_partkey < 200000 bound keeps the ORACLE constant-cost: an
    unbounded first gate run measured the asymmetry directly — the
    quadratic NOT EXISTS took 548 s over 2M parts at sf10 while this
    plan's aggregate+window answered the same frontier in seconds —
    exactly the O(n^2) vs O(n log n) gap the rewrite exists for."""
    part = io.table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    ).where(F.col("p_partkey") < 200000)
    grp = part.groupBy("p_retailprice").agg(
        F.max("p_size").alias("gm")
    )
    w = Window.orderBy("p_retailprice").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bounds = grp.withColumn("prev_max", F.max("gm").over(w))
    return (
        part.join(bounds, "p_retailprice")
        .where(
            (F.col("p_size") == F.col("gm"))
            & (
                F.col("prev_max").isNull()
                | (F.col("prev_max") < F.col("p_size"))
            )
        )
        .select("p_partkey", "p_retailprice", "p_size")
        .orderBy(F.asc("p_retailprice"), F.asc("p_partkey"))
    )


# --------------------------------------------------------------------------
# interval concurrency (sweep-line peak load)
# --------------------------------------------------------------------------

_CONCURRENCY_ORACLE = """
WITH bounds AS (
    SELECT event_type, ts, 1 AS delta FROM events
    UNION ALL
    SELECT event_type, ts + INTERVAL 5 MINUTE, -1 FROM events
),
running AS (
    SELECT event_type, ts, delta,
           SUM(delta) OVER (PARTITION BY event_type
               ORDER BY ts, delta
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS load
    FROM bounds
),
peaks AS (
    SELECT event_type,
           CAST(MAX(load) AS BIGINT) AS peak_concurrency
    FROM running GROUP BY event_type
)
SELECT p.event_type, p.peak_concurrency,
       MIN(r.ts) AS peak_at
FROM peaks p
JOIN running r
  ON r.event_type = p.event_type AND r.load = p.peak_concurrency
GROUP BY p.event_type, p.peak_concurrency
"""


@register(
    "interval_concurrency", oracle=_CONCURRENCY_ORACLE,
    tags=("analytics",),
)
def interval_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent load per event type — the sweep-line kernel
    behind capacity planning, license-seat counting, and max-parallel-
    sessions dashboards: each event occupies [ts, ts+5min); emit a +1
    boundary at start and a -1 at end, running-sum the boundary
    stream, and the max of that sum IS the peak concurrency (with the
    first instant it was reached).

    Determinism under ties: boundaries order by (ts, delta), so an
    interval ending exactly when another starts closes FIRST
    (half-open semantics), and permutations within an equal-(ts,
    delta) group cannot change any per-instant maximum — the peak
    and its first timestamp are well-defined in both engines without
    any float involved.

    Scale shape: the boundary stream is 2 rows per event, the window
    partitions by event_type (never a global order), and the peak
    extraction is a map-side-combinable max + a small self-join on
    the (type, peak) key. At 100 TB the same query shards further by
    day via the usual partition pruning — the sweep only ever needs
    one type-partition ordered in memory at a time."""
    ev = io.table(spark, sf_dir, "events").select("event_type", "ts")
    bounds = ev.select(
        "event_type", "ts", F.lit(1).alias("delta")
    ).unionAll(
        ev.select(
            "event_type",
            (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("ts"),
            F.lit(-1).alias("delta"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = bounds.withColumn("load", F.sum("delta").over(w))
    peaks = running.groupBy("event_type").agg(
        F.max("load").cast("bigint").alias("peak_concurrency")
    )
    r = running.select(
        F.col("event_type").alias("r_type"),
        F.col("ts").alias("r_ts"),
        F.col("load").alias("r_load"),
    )
    return (
        r.join(
            peaks,
            (F.col("r_type") == F.col("event_type"))
            & (F.col("r_load") == F.col("peak_concurrency")),
        )
        .groupBy("event_type", "peak_concurrency")
        .agg(F.min("r_ts").alias("peak_at"))
    )


# --------------------------------------------------------------------------
# path mining (top event trigram journeys)
# --------------------------------------------------------------------------

_PATH_MINING_ORACLE = """
WITH ordered AS (
    SELECT user_id, event_type,
           lead(event_type, 1) OVER w AS t2,
           lead(event_type, 2) OVER w AS t3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
paths AS (
    SELECT event_type || '>' || t2 || '>' || t3 AS path
    FROM ordered WHERE t3 IS NOT NULL
)
SELECT path, CAST(count(*) AS BIGINT) AS n
FROM paths GROUP BY path
ORDER BY n DESC, path ASC LIMIT 15
"""


@register(
    "path_mining_3step", oracle=_PATH_MINING_ORACLE, tags=("analytics",)
)
def path_mining_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys: the 15 most common 3-step event-type paths
    across all users — the "what do people actually do" query behind
    funnel discovery (funnel_conversion checks a KNOWN path; this
    MINES the candidates). Per user, events order by (ts, event_id)
    — a total order, so the trigram set is deterministic — and two
    lead() windows assemble each step's successors without a
    self-join.

    Scale shape: ONE shuffle on the natural user key for the window
    (each user's history sorts independently — no global order),
    then a map-side-combinable trigram count and a
    TakeOrderedAndProject(15). The path alphabet is event-type-
    cubed-bounded, so the count table is tiny however large the
    event log; at 100 TB this is the same plan with the window's
    sort spilling per user-partition."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = io.table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    ordered = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    )
    paths = ordered.where(F.col("t3").isNotNull()).select(
        F.concat_ws(">", "event_type", "t2", "t3").alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(15)
    )


# --------------------------------------------------------------------------
# grouped closed-form linear regression (per-key OLS trend)
# --------------------------------------------------------------------------

_GROUPED_LINREG_ORACLE = """
WITH pts AS (
    SELECT event_type,
           CAST(floor((epoch(ts) - 1704067200) / 3600.0) AS BIGINT)
               AS x,
           CAST(round(value * 100, 0) AS BIGINT) AS yf
    FROM events
),
agg AS (
    SELECT event_type,
           CAST(count(*) AS DOUBLE) AS n,
           CAST(CAST(sum(x) AS HUGEINT) AS DOUBLE) AS sx,
           CAST(CAST(sum(yf) AS HUGEINT) AS DOUBLE) AS sy,
           CAST(CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT)
                AS DOUBLE) AS sxx,
           CAST(CAST(sum(CAST(x AS HUGEINT) * yf) AS HUGEINT)
                AS DOUBLE) AS sxy
    FROM pts GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx)
             / 100.0 * 24.0, 6) AS slope_per_day,
       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
             / (n * 100.0), 6) AS intercept
FROM agg
"""


@register(
    "grouped_linreg", oracle=_GROUPED_LINREG_ORACLE, tags=("analytics",)
)
def grouped_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key closed-form OLS — the trend line every metrics
    dashboard fits per series, as ONE map-side-combinable aggregate:
    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) per event_type over
    (hours-since-2024, value-in-cents), reported per day, plus the
    intercept at epoch start.

    Cross-engine float discipline (learned the hard way — the first
    cut used raw seconds and mismatched in the 6th decimal): every
    sufficient statistic accumulates in EXACT integer arithmetic
    (DECIMAL(38)/HUGEINT), and x is bucketed to hours and y
    fixed-pointed to cents so each statistic stays far below 2^53 —
    its int->double cast is therefore EXACT, and from identical
    doubles the identically-parenthesized IEEE expression tree gives
    bit-identical results in any engine. (Raw seconds pushed
    n*Sxy past 2^53, where HUGEINT->double and DECIMAL->double
    casts may round differently.)

    Scale shape: one aggregate with partial combine — the per-key
    sufficient statistics are 5 numbers however many points stream
    through; the textbook "model fits that are just aggregates"
    case."""
    pts = io.table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(
            (F.unix_timestamp("ts") - F.lit(1704067200)) / 3600.0
        )
        .cast("bigint")
        .alias("x"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("yf"),
    )
    dec = "decimal(38,0)"
    agg = pts.groupBy("event_type").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.col("x").cast(dec)).cast("double").alias("sx"),
        F.sum(F.col("yf").cast(dec)).cast("double").alias("sy"),
        F.sum((F.col("x").cast(dec) * F.col("x")))
        .cast("double")
        .alias("sxx"),
        F.sum((F.col("x").cast(dec) * F.col("yf")))
        .cast("double")
        .alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return agg.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(slope / 100.0 * 24.0, 6).alias("slope_per_day"),
        F.round(
            (F.col("sy") - slope * F.col("sx"))
            / (F.col("n") * F.lit(100.0)),
            6,
        ).alias("intercept"),
    )


# --------------------------------------------------------------------------
# gaps and islands (longest consecutive-day streak)
# --------------------------------------------------------------------------

_STREAKS_ORACLE = """
WITH days AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
    FROM events
),
islands AS (
    SELECT user_id, d,
           CAST(d - CAST('2024-01-01' AS DATE) AS BIGINT)
               - row_number() OVER (PARTITION BY user_id ORDER BY d)
               AS island
    FROM days
),
streaks AS (
    SELECT user_id, island,
           CAST(count(*) AS BIGINT) AS len,
           min(d) AS streak_start
    FROM islands GROUP BY user_id, island
),
best AS (
    SELECT user_id, len, streak_start,
           row_number() OVER (PARTITION BY user_id
               ORDER BY len DESC, streak_start ASC) AS rn
    FROM streaks
)
SELECT user_id, len AS longest_streak, streak_start
FROM best WHERE rn = 1
ORDER BY longest_streak DESC, user_id ASC
LIMIT 25
"""


@register(
    "window_gaps_islands", oracle=_STREAKS_ORACLE, tags=("analytics",)
)
def window_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands — the canonical consecutive-runs pattern
    (login streaks, uptime runs, contiguous coverage): collapse each
    user's event days to a distinct set, and the difference
    day_ordinal - row_number() is CONSTANT exactly within a
    consecutive run, so grouping by it materializes the islands
    without any self-join or iteration. Output: each user's longest
    streak (earliest start breaking ties), top 25.

    Every quantity is an integer (date ordinals, row numbers,
    counts), so the result is exactly reproducible in both engines;
    both windows partition by the natural user key — no global order
    anywhere except the final TakeOrdered(25).

    Scale shape: one distinct (user, day) aggregate with map-side
    combine, two user-partitioned windows, a (user, island) count —
    everything keyed on user; the classic example of turning an
    "iterate over sorted rows" problem into pure relational algebra.
    """
    ev = io.table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    days = ev.distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.withColumn(
        "island",
        F.datediff("d", F.lit("2024-01-01")).cast("bigint")
        - F.row_number().over(w),
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count("*").cast("bigint").alias("len"),
        F.min("d").alias("streak_start"),
    )
    w_best = Window.partitionBy("user_id").orderBy(
        F.desc("len"), F.asc("streak_start")
    )
    best = (
        streaks.withColumn("rn", F.row_number().over(w_best))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("len").alias("longest_streak"),
            "streak_start",
        )
    )
    return best.orderBy(
        F.desc("longest_streak"), F.asc("user_id")
    ).limit(25)


# --------------------------------------------------------------------------
# time-decayed engagement (feature-store scoring)
# --------------------------------------------------------------------------

_DECAY_ORACLE = """
WITH ref AS (SELECT max(ts) AS t_ref FROM events),
per_event AS (
    SELECT e.user_id,
           CAST(round(
               e.value * exp(-CAST(epoch_us(ref.t_ref)
                                   - epoch_us(e.ts) AS DOUBLE)
                             / 604800000000.0)
               * 1000000, 0) AS BIGINT) AS wf
    FROM events e, ref
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       round(CAST(sum(wf) AS DOUBLE) / 1000000.0, 6)
           AS decayed_score
FROM per_event
GROUP BY user_id
ORDER BY decayed_score DESC, user_id ASC
LIMIT 25
"""


@register(
    "decayed_engagement", oracle=_DECAY_ORACLE, tags=("analytics",)
)
def decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed engagement per user (half-life
    ~4.85 days via a one-week e-folding): the feature-store staple
    behind "recent activity counts more" ranking signals —
    sum(value * exp(-age/tau)) with tau = 604800 s, referenced to
    the corpus's latest event so the score is a pure function of the
    data. Top 25 users.

    Float discipline: the per-event decayed weight is rounded to 6
    and fixed-pointed to a BIGINT BEFORE summation (the
    lm_bigram_score rule), so the per-user sum is exact integer
    arithmetic — partition- and retry-order independent — and a
    1-ulp cross-engine exp() disagreement moves one event's weight
    by at most one micro-unit. The decay ages are exact integer
    MICROsecond differences on both engines (Spark ``unix_micros``,
    DuckDB ``epoch_us``) — whole-second ``unix_timestamp`` vs
    fractional ``epoch()`` would skew every age by up to 1 s because
    the fixture timestamps carry microsecond precision.

    Scale shape: a 1-row broadcast reference timestamp, one narrow
    codegen map, one map-side-combinable groupBy(user) —
    TakeOrdered(25) on top. The incremental form at 100 TB
    multiplies yesterday's per-user score by exp(-1 day/tau) and
    adds the new day's partial — the fixed-point representation
    makes that merge associative."""
    ev = io.table(spark, sf_dir, "events")
    ref = ev.agg(F.max("ts").alias("t_ref"))
    per_event = ev.crossJoin(F.broadcast(ref)).select(
        "user_id",
        F.round(
            F.col("value")
            * F.exp(
                -(
                    F.unix_micros(F.col("t_ref").cast("timestamp"))
                    - F.unix_micros(F.col("ts").cast("timestamp"))
                ).cast("double")
                / F.lit(604800.0e6)
            )
            * F.lit(1000000.0),
            0,
        )
        .cast("bigint")
        .alias("wf"),
    )
    return (
        per_event.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(
                F.sum("wf").cast("double") / F.lit(1000000.0), 6
            ).alias("decayed_score"),
        )
        .orderBy(F.desc("decayed_score"), F.asc("user_id"))
        .limit(25)
    )


# --------------------------------------------------------------------------
# RFM customer scoring (recency / frequency / monetary quintiles)
# --------------------------------------------------------------------------

_RFM_ORACLE = """
WITH ref AS (SELECT max(ts) AS t_ref FROM events),
pu AS (
    SELECT e.user_id,
           CAST((max(epoch_us(r.t_ref)) - epoch_us(max(e.ts)))
                // 86400000000 AS BIGINT)                AS recency_days,
           CAST(count(*) AS BIGINT)                      AS frequency,
           CAST(sum(CAST(round(e.value * 100, 0) AS BIGINT))
                AS BIGINT)                               AS monetary_cents
    FROM events e CROSS JOIN ref r
    GROUP BY e.user_id
),
n AS (SELECT count(*) AS n_users FROM pu),
ranked AS (
    SELECT user_id, recency_days, frequency, monetary_cents,
           row_number() OVER (ORDER BY recency_days ASC,
                              user_id ASC)               AS rp,
           row_number() OVER (ORDER BY frequency DESC,
                              user_id ASC)               AS fp,
           row_number() OVER (ORDER BY monetary_cents // 100 DESC,
                              user_id ASC)               AS mp
    FROM pu
)
SELECT r.user_id, r.recency_days, r.frequency, r.monetary_cents,
       CAST(5 - ((r.rp - 1) * 5) // n.n_users AS BIGINT) AS r_score,
       CAST(5 - ((r.fp - 1) * 5) // n.n_users AS BIGINT) AS f_score,
       CAST(5 - ((r.mp - 1) * 5) // n.n_users AS BIGINT) AS m_score,
       CAST(5 - ((r.rp - 1) * 5) // n.n_users AS VARCHAR)
       || CAST(5 - ((r.fp - 1) * 5) // n.n_users AS VARCHAR)
       || CAST(5 - ((r.mp - 1) * 5) // n.n_users AS VARCHAR)
                                                          AS rfm
FROM ranked r CROSS JOIN n
"""


def _quintile_score(pu: DataFrame, metric, out: str, asc: bool):
    """Global quintile of ``metric`` (5 = best) WITHOUT a global sort:
    the lr_calibration_deciles bucket decomposition. The bucket table
    holds one row per DISTINCT metric value (integer days / counts /
    whole currency units — low-cardinality by quantization), the only
    SinglePartition window runs over it, and each user's global
    position is bucket-prefix + within-bucket row_number ordered by
    user_id (the defined tie-break on BOTH engines)."""
    buckets = pu.groupBy(metric).agg(F.count("*").alias("_bn"))
    order = F.asc(metric) if asc else F.desc(metric)
    w_b = Window.orderBy(order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pref = buckets.withColumn(
        "_prefix", F.sum("_bn").over(w_b) - F.col("_bn")
    )
    w_in = Window.partitionBy(metric).orderBy(F.asc("user_id"))
    return (
        pu.join(
            F.broadcast(pref.select(metric, "_prefix")), metric
        )
        .withColumn("_win", F.row_number().over(w_in))
        .withColumn(
            out,
            F.expr(
                "CAST(5 - ((_prefix + _win - 1) * 5) div n_users"
                " AS BIGINT)"
            ),
        )
        .drop("_prefix", "_win")
    )


@register("rfm_scores", oracle=_RFM_ORACLE, tags=("analytics",))
def rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer scoring (Hughes 1994) — the classic segmentation
    behind "champions / at-risk / hibernating" marketing tiers: per
    user, recency (whole days since their last event, vs the corpus
    max so the score is a pure function of the data), frequency
    (event count), monetary (exact fixed-point cent total), each
    scored into global quintiles (5 = best) and concatenated into the
    3-digit RFM segment code.

    Cross-engine exactness: recency is integer-microsecond arithmetic
    floor-divided to whole days (the decayed_engagement rule);
    monetary sums round(value*100) BIGINTs — order-independent;
    quintile = 5 - ((pos-1)*5) div n in pure integer arithmetic, with
    pos defined by (metric, user_id) total orders the oracle replays
    verbatim. Monetary RANKS on whole currency units (cents div 100)
    so its bucket table stays low-cardinality — the defined
    within-unit tie-break is user_id.

    Scale shape: one map-side-combinable groupBy(user) over events,
    localCheckpointed once (it feeds three rank branches + output),
    then three bucket decompositions — each a bounded bucket
    aggregate + broadcast prefix join + user-keyed within-bucket
    window. No RangePartitioning / global sort anywhere; the 1-row
    reference timestamp and user-count are broadcasts."""
    ev = io.table(spark, sf_dir, "events")
    ref = ev.agg(F.max("ts").alias("t_ref"))
    pu = (
        ev.crossJoin(F.broadcast(ref))
        .groupBy("user_id")
        .agg(
            F.expr(
                "CAST((unix_micros(CAST(max(t_ref) AS TIMESTAMP))"
                " - unix_micros(CAST(max(ts) AS TIMESTAMP)))"
                " div 86400000000 AS BIGINT)"
            ).alias("recency_days"),
            F.count("*").cast("bigint").alias("frequency"),
            F.sum(
                F.round(F.col("value") * 100, 0).cast("bigint")
            ).cast("bigint").alias("monetary_cents"),
        )
        .withColumn(
            "monetary_units",
            F.expr("monetary_cents div 100").cast("bigint"),
        )
        # feeds three rank branches + the output projection; eager
        # localCheckpoint per the ADVICE-r9 rule (ContextCleaner frees
        # the blocks; no pinned cache across a driver sweep)
        .localCheckpoint(eager=True)
    )
    n = pu.agg(F.count("*").cast("bigint").alias("n_users"))
    base = pu.crossJoin(F.broadcast(n))
    scored = _quintile_score(
        base, "recency_days", "r_score", asc=True
    )
    scored = _quintile_score(scored, "frequency", "f_score", asc=False)
    scored = _quintile_score(
        scored, "monetary_units", "m_score", asc=False
    )
    return scored.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary_cents",
        "r_score",
        "f_score",
        "m_score",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ).alias("rfm"),
    )


# --------------------------------------------------------------------------
# conversion latency distribution (view -> purchase time percentiles)
# --------------------------------------------------------------------------

_CONV_LATENCY_ORACLE = """
WITH v AS (
    SELECT user_id, min(ts) AS t_view
    FROM events WHERE event_type = 'view'
    GROUP BY user_id
),
p AS (
    SELECT e.user_id, min(e.ts) AS t_purchase
    FROM events e JOIN v ON v.user_id = e.user_id
    WHERE e.event_type = 'purchase' AND e.ts > v.t_view
    GROUP BY e.user_id
),
lat AS (
    SELECT CAST((epoch_us(p.t_purchase) // 86400000000) % 7
                AS BIGINT)                               AS dow,
           epoch_us(p.t_purchase) - epoch_us(v.t_view)   AS lat_us
    FROM p JOIN v ON v.user_id = p.user_id
)
SELECT dow,
       CAST(count(*) AS BIGINT)                        AS n_conversions,
       round(quantile_cont(lat_us, 0.5)  / 1000000.0, 6) AS p50_s,
       round(quantile_cont(lat_us, 0.9)  / 1000000.0, 6) AS p90_s,
       round(quantile_cont(lat_us, 0.99) / 1000000.0, 6) AS p99_s
FROM lat GROUP BY dow
"""


@register(
    "conversion_latency_quantiles", oracle=_CONV_LATENCY_ORACLE,
    tags=("analytics",),
)
def conversion_latency_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Time-to-convert distribution — the product-analytics companion
    to funnel_conversion's WHO converts: per purchase day-of-week,
    exact p50/p90/p99 of the first-view -> first-subsequent-purchase
    latency. The funnel legs are the same per-user MIN aggregates as
    funnel_conversion (map-side partial, user-keyed joins of
    user-count-sized relations).

    Cross-engine exactness: latencies are exact integer microseconds
    (unix_micros / epoch_us — the decayed_engagement rule); the
    day-of-week is pure integer arithmetic (epoch_days % 7; 0 =
    Thursday, the epoch weekday) rather than engine dayofweek
    functions whose week origin differs; Spark `percentile` and
    DuckDB `quantile_cont` share the sort-based linear-interpolation
    definition over identical integer inputs (the agg_percentile
    precedent), and the single divide-then-round is the same IEEE
    expression.

    Scale note: exact percentile buffers each group's values —
    bounded here by conversions per weekday; the unbounded-stream
    variant swaps in percentile_approx exactly as agg_percentile /
    agg_percentile_approx document."""
    ev = io.table(spark, sf_dir, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    pu_us = F.unix_micros(F.col("t_purchase").cast("timestamp"))
    vu_us = F.unix_micros(F.col("t_view").cast("timestamp"))
    lat = p.join(v, "user_id").select(
        ((pu_us / F.lit(86400000000)).cast("long") % 7)
        .cast("bigint")
        .alias("dow"),
        (pu_us - vu_us).alias("lat_us"),
    )
    return lat.groupBy("dow").agg(
        F.count("*").cast("bigint").alias("n_conversions"),
        F.round(
            F.percentile("lat_us", F.lit(0.5)) / 1000000.0, 6
        ).alias("p50_s"),
        F.round(
            F.percentile("lat_us", F.lit(0.9)) / 1000000.0, 6
        ).alias("p90_s"),
        F.round(
            F.percentile("lat_us", F.lit(0.99)) / 1000000.0, 6
        ).alias("p99_s"),
    )
