"""Relational substrate, part 5: global sort / limit / top-k and set
operations (SURVEY.md §2B "Sort / limit / top-k / set ops").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from conversadocs_spark import io
from conversadocs_spark.plans.registry import register

# --------------------------------------------------------------------------
# global top-k with explicit rank (order-insensitive-oracle-safe)
# --------------------------------------------------------------------------

_SORT_LIMIT_ORACLE = """
SELECT o_orderkey, o_totalprice, o_orderdate,
       CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC)
            AS INTEGER) AS pos
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
"""


@register("sort_limit_topk", oracle=_SORT_LIMIT_ORACLE, tags=("sort",))
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by price. Physical plan is TakeOrderedAndProject —
    k rows per partition, no full sort (the same constant-memory shape
    as the reference's top-k retrieval R9). An explicit `pos` column
    pins the order because the oracle hash is order-insensitive."""
    o = io.table(spark, sf_dir, "orders")
    top = o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(10)
    # rank within the 10 survivors (cheap: 10 rows)
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return top.select(
        "o_orderkey",
        "o_totalprice",
        "o_orderdate",
        F.row_number().over(w).alias("pos"),
    )


# --------------------------------------------------------------------------
# dedicated union all (bag semantics) + name-aligned union
# --------------------------------------------------------------------------

_UNION_ALL_ORACLE = """
SELECT o_orderkey, o_custkey, 'high_value' AS src
FROM orders WHERE o_totalprice > 250000
UNION ALL
SELECT o_orderkey, o_custkey, 'urgent' AS src
FROM orders WHERE o_orderpriority = '1-URGENT'
UNION ALL
SELECT o_orderkey, o_custkey, 'recent' AS src
FROM orders WHERE o_orderdate >= DATE '1998-06-01'
"""


@register("union_all", oracle=_UNION_ALL_ORACLE, tags=("setop",))
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-branch UNION ALL with bag semantics: an order matching
    several predicates appears once per branch (the reference's scan
    loop union shape, bones.py:50-58 — per-loader Document lists are
    concatenated, never deduplicated). Branches are built with columns
    in *different* orders to exercise `unionByName`'s align-by-name
    contract (positional `union` would silently mis-zip). At scale a
    union is a zero-shuffle plan concatenation — each branch keeps its
    own partitioning and the filters push to the shared parquet scan.
    """
    o = io.table(spark, sf_dir, "orders")
    high = o.where(F.col("o_totalprice") > 250000).select(
        "o_orderkey", "o_custkey", F.lit("high_value").alias("src")
    )
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.lit("urgent").alias("src"), "o_orderkey", "o_custkey"
    )
    recent = o.where(F.col("o_orderdate") >= "1998-06-01").select(
        "o_custkey", F.lit("recent").alias("src"), "o_orderkey"
    )
    return high.unionByName(urgent).unionByName(recent)


# --------------------------------------------------------------------------
# union / intersect / except over yearly customer cohorts
# --------------------------------------------------------------------------

_SET_OPS_ORACLE = """
WITH c96 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE year(o_orderdate) = 1996),
     c97 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE year(o_orderdate) = 1997)
SELECT o_custkey, 'both'      AS cohort FROM (SELECT * FROM c96 INTERSECT SELECT * FROM c97)
UNION ALL
SELECT o_custkey, 'only_1996' AS cohort FROM (SELECT * FROM c96 EXCEPT SELECT * FROM c97)
UNION ALL
SELECT o_custkey, 'only_1997' AS cohort FROM (SELECT * FROM c97 EXCEPT SELECT * FROM c96)
"""


@register("set_ops", oracle=_SET_OPS_ORACLE, tags=("setop",))
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL over 1996-vs-1997 customer
    cohorts, labeled and recombined — computed as ONE grouped pass
    (r16, guide §2.4 "remove shuffles outright"): per customer,
    presence flags for each year, then the cohort label from the flag
    pair. Set-algebra equivalence to the explicit set-op form:
    INTERSECT = {in96 AND in97}, the two EXCEPTs = {in96 AND NOT in97}
    and {in97 AND NOT in96}; each custkey lands in exactly one branch
    under both forms, with the same label, and every set op emits
    distinct keys — exactly what one groupBy(o_custkey) yields. The
    explicit form paid 2 distinct exchanges + 3 hash-set-op joins over
    6 logical scan branches; this is 1 scan + 1 partial-aggregated
    exchange. At 100 TB the flag aggregate is map-side-combinable on
    the same key the set ops would have shuffled twice."""
    o = io.table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    flags = (
        o.where(yr.isin(1996, 1997))
        .select("o_custkey", (yr == 1996).alias("y96"))
        .groupBy("o_custkey")
        .agg(
            F.max("y96").alias("in96"),
            F.max(~F.col("y96")).alias("in97"),
        )
    )
    return flags.select(
        "o_custkey",
        F.when(F.col("in96") & F.col("in97"), F.lit("both"))
        .when(F.col("in96"), F.lit("only_1996"))
        .otherwise(F.lit("only_1997"))
        .alias("cohort"),
    )


_SET_OPS_ALL_ORACLE = """
WITH p96 AS (SELECT o_orderpriority FROM orders
             WHERE year(o_orderdate) = 1996),
     p97 AS (SELECT o_orderpriority FROM orders
             WHERE year(o_orderdate) = 1997),
     i AS (SELECT * FROM p96 INTERSECT ALL SELECT * FROM p97),
     e AS (SELECT * FROM p96 EXCEPT ALL SELECT * FROM p97)
SELECT o_orderpriority, 'common'     AS cohort,
       CAST(count(*) AS BIGINT) AS n
FROM i GROUP BY 1
UNION ALL
SELECT o_orderpriority, 'surplus_96' AS cohort,
       CAST(count(*) AS BIGINT) AS n
FROM e GROUP BY 1
"""


@register("set_ops_all", oracle=_SET_OPS_ALL_ORACLE, tags=("setop",))
def set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL — BAG semantics (each priority row
    survives min(c96,c97) times in the intersection, max(0, c96-c97)
    times in the difference), counted per value so the multiset
    cardinalities themselves are hash-checked. Spark plans both as a
    single aggregate computing per-row replication counts + generate —
    one shuffle each, no join explosion."""
    o = io.table(spark, sf_dir, "orders")
    p96 = o.where(F.year("o_orderdate") == 1996).select(
        "o_orderpriority"
    )
    p97 = o.where(F.year("o_orderdate") == 1997).select(
        "o_orderpriority"
    )
    common = (
        p96.intersectAll(p97)
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("n"))
        .withColumn("cohort", F.lit("common"))
    )
    surplus = (
        p96.exceptAll(p97)
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("n"))
        .withColumn("cohort", F.lit("surplus_96"))
    )
    return common.unionByName(surplus).select(
        "o_orderpriority", "cohort", "n"
    )
