"""Skew-mitigation query surface (operators/skew.py): salted join and
two-phase distinct, both oracle-checked — the salting/two-phase
rewrites change only the shuffle keys, never the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from conversadocs_spark import io
from conversadocs_spark.functions.money import disc_price_e4, sum_scaled
from conversadocs_spark.operators.skew import salted_join, two_phase_distinct
from conversadocs_spark.plans.registry import register

_JOIN_SKEW_ORACLE = """
SELECT o.o_orderpriority,
       round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
             * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))
             AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue,
       count(*) AS n_items
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
GROUP BY o.o_orderpriority
"""


@register("join_skew_salted", oracle=_JOIN_SKEW_ORACLE, tags=("join", "skew"))
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem joined to 1997+ orders through `salted_join` (8 salts,
    salt source = l_linenumber-qualified row identity via l_partkey),
    revenue by order priority. The result is identical to the plain
    join — the oracle proves it — while the shuffle spreads any hot
    l_orderkey over 8 reducers. This is the explicit fallback for the
    skew AQE can't fix (planned hot keys in shuffled hash joins / AQE
    disabled); see operators/skew.py for when to reach for it.
    """
    li = io.table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", disc_price_e4().alias("disc_e4")
    )
    o = (
        io.table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", "o_orderpriority")
        .withColumnRenamed("o_orderkey", "l_orderkey")
    )
    joined = salted_join(
        li, o, on="l_orderkey", salt_src="l_partkey", n_salt=8
    )
    return joined.groupBy("o_orderpriority").agg(
        # cents output: see the sum-rounding note in plans/aggregates.py
        F.round(sum_scaled("disc_e4", 10000), 2).alias("revenue"),
        F.count("*").alias("n_items"),
    )


_AGG_SKEW_ORACLE = """
SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_distinct
FROM lineitem
GROUP BY l_returnflag
"""


@register("agg_skew_distinct", oracle=_AGG_SKEW_ORACLE, tags=("agg", "skew"))
def agg_skew_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT l_suppkey) per l_returnflag via the explicit
    two-phase rewrite: 3 hot groups over the whole fact table would
    land on 3 reducers if shuffled by group key; phase one shuffles by
    (l_returnflag, l_suppkey) — spread across all reducers — and phase
    two counts the deduped survivors."""
    li = io.table(spark, sf_dir, "lineitem")
    return two_phase_distinct(li, ["l_returnflag"], "l_suppkey")
