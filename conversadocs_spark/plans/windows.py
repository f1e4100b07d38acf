"""Relational substrate, part 4: window functions (SURVEY.md §2B
"Window functions"). The reference's top-k retrieval (R9) is a global
rank; these queries generalize to partitioned ranking, analytic
lag/lead, and running frames.

Determinism: every window ORDER BY ends with a unique tiebreak column
so row_number/lag are stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from conversadocs_spark import io
from conversadocs_spark.plans.registry import register

# --------------------------------------------------------------------------
# ranking: top-3 orders per customer (reference R9 per-group top-k shape)
# --------------------------------------------------------------------------

_WINDOW_RANK_ORACLE = """
SELECT * FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER w AS rn,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4)     OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey ASC)
) t
WHERE rn <= 3
"""


@register("window_rank", oracle=_WINDOW_RANK_ORACLE, tags=("window",))
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number — the distributed form of the
    reference's `k` best chunks (bones.py:78): one shuffle on the
    partition key, no global sort."""
    o = io.table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .where(F.col("rn") <= 3)
    )


# --------------------------------------------------------------------------
# analytic: lag / lead / first / last
# --------------------------------------------------------------------------

_WINDOW_ANALYTIC_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderdate,
       lag(o_orderkey)  OVER w                       AS prev_order,
       lead(o_orderkey) OVER w                       AS next_order,
       first_value(o_orderkey) OVER w                AS first_order,
       date_diff('day',
                 CAST(lag(o_orderdate) OVER w AS DATE),
                 CAST(o_orderdate AS DATE))           AS days_since_prev
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@register(
    "window_analytic", oracle=_WINDOW_ANALYTIC_ORACLE, tags=("window",)
)
def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first_value over each customer's order timeline —
    the inter-order gap analysis shape."""
    o = io.table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc("o_orderdate"), F.asc("o_orderkey")
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.first("o_orderkey").over(wf).alias("first_order"),
        F.datediff(
            F.to_date("o_orderdate"),
            F.to_date(F.lag("o_orderdate").over(w)),
        ).alias("days_since_prev"),
    )


# --------------------------------------------------------------------------
# framed aggregates: running total + moving average on events
# --------------------------------------------------------------------------

_WINDOW_FRAME_ORACLE = """
SELECT event_id, user_id, ts,
       round(CAST(sum(CAST(value AS DECIMAL(18,6)))
           OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS DOUBLE), 6)
           AS running_total,
       round(CAST(sum(CAST(value AS DECIMAL(18,6)))
           OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
           / count(*)
           OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6)
           AS moving_avg3
FROM events
WHERE event_type = 'purchase'
"""


@register("window_frame", oracle=_WINDOW_FRAME_ORACLE, tags=("window",))
def window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + 3-row moving average per user. Sums go through
    DECIMAL so the frame accumulation is exact on both engines (window
    sums associate differently engine-to-engine in floating point)."""
    ev = io.table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = w.rowsBetween(-2, Window.currentRow)
    val = F.col("value").cast("decimal(18,6)")
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.sum(val).over(run).cast("double"), 6).alias(
            "running_total"
        ),
        F.round(
            F.sum(val).over(mov).cast("double") / F.count("*").over(mov), 6
        ).alias("moving_avg3"),
    )


_WINDOW_NTILE_ORACLE = """
SELECT c_custkey, c_nationkey,
       CAST(ntile(4) OVER w AS INTEGER)                       AS bal_quartile,
       CAST(count(*) OVER (PARTITION BY c_nationkey) AS BIGINT) AS n_part,
       CAST(round(percent_rank() OVER w
                  * (count(*) OVER (PARTITION BY c_nationkey) - 1), 0)
            AS BIGINT)                                        AS pct_rank_num,
       CAST(round(cume_dist() OVER w
                  * count(*) OVER (PARTITION BY c_nationkey), 0)
            AS BIGINT)                                        AS cume_num
FROM customer
WINDOW w AS (PARTITION BY c_nationkey
             ORDER BY c_acctbal ASC, c_custkey ASC)
"""


@register("window_ntile", oracle=_WINDOW_NTILE_ORACLE, tags=("window",))
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile/percent_rank/cume_dist per nation over account balance —
    the distribution-bucketing window family (quartile assignment for
    per-stratum quality cuts). Deterministic tie-break on (balance,
    custkey) keeps the rank functions hash-stable.

    Hash-stability for the two RATIO functions is the subtle part:
    cume_dist emits exact rationals like 1622/6400 = 0.2534375 —
    EXACTLY on a 6-decimal rounding boundary, where Spark's HALF_UP
    and DuckDB's rounding of the nearest double legitimately disagree
    (caught by the 10x gate: 18 mismatched rows at sf1, zero at
    sf0.01 — the FIXTURES.md float-boundary trap in the wild). So the
    checked output de-rationalizes them: pct_rank_num =
    percent_rank*(n-1) and cume_num = cume_dist*n are exact small
    integers (the underlying rank-1 and rows<=current counts), where
    round() sits a full 0.5 from any boundary — ulp noise can never
    flip them. Both window functions still execute; the fixed-point
    projection is what makes them verifiable at every scale."""
    c = io.table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.asc("c_acctbal"), F.asc("c_custkey")
    )
    wp = Window.partitionBy("c_nationkey")
    n_part = F.count("*").over(wp)
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).alias("bal_quartile"),
        n_part.cast("bigint").alias("n_part"),
        F.round(F.percent_rank().over(w) * (n_part - 1), 0)
        .cast("bigint")
        .alias("pct_rank_num"),
        F.round(F.cume_dist().over(w) * n_part, 0)
        .cast("bigint")
        .alias("cume_num"),
    )


# --------------------------------------------------------------------------
# IGNORE NULLS analytics: last-observation-carried-forward over sparse data
# --------------------------------------------------------------------------

_WINDOW_IGNORE_NULLS_ORACLE = """
SELECT event_id, user_id,
       last_value(v IGNORE NULLS) OVER w   AS last_seen_value,
       first_value(v IGNORE NULLS) OVER (
           PARTITION BY user_id
           ORDER BY ts ASC, event_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                                           AS first_seen_value
FROM (
    SELECT event_id, user_id, ts,
           CASE WHEN event_id % 3 = 0 THEN round(value, 6) END AS v
    FROM events WHERE user_id < 40
)
WINDOW w AS (PARTITION BY user_id
             ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@register(
    "window_ignore_nulls",
    oracle=_WINDOW_IGNORE_NULLS_ORACLE,
    tags=("window",),
)
def window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window analytics — the sparse-sensor idiom: only
    every 3rd event carries a reading (NULL injected in-plan, so the
    sparsity is hash-checked too); `last_value(... ignoreNulls)` over
    a trailing frame is last-observation-carried-forward WITHOUT the
    dense grid `resample_gapfill` builds, and the unbounded
    first_value backfills the leading NULLs. One shuffle on user_id,
    both functions share the same window sort."""
    ev = io.table(spark, sf_dir, "events").where(F.col("user_id") < 40)
    sparse = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.when(
            F.col("event_id") % 3 == 0, F.round("value", 6)
        ).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    return sparse.select(
        "event_id",
        "user_id",
        F.last("v", ignorenulls=True).over(w).alias("last_seen_value"),
        F.first("v", ignorenulls=True)
        .over(w_all)
        .alias("first_seen_value"),
    )
