"""LATERAL correlated top-k: de-correlation plan pin + closed-form
recheck (plans/joins.py sql_lateral_topk)."""

from __future__ import annotations




def test_lateral_topk_decorrelates_to_window_group_limit(
    spark, sf_oracle_dir
):
    """The LATERAL correlated LIMIT must reach execution as the
    de-correlated WindowGroupLimit + hash-join plan — never a per-row
    re-execution of the subquery — and the outer o_orderkey bound
    must be pushed through the join into the lineitem scan."""
    from conversadocs_spark.plans import QUERIES

    df = QUERIES["sql_lateral_topk"](spark, sf_oracle_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    assert "HashJoin" in plan, plan
    assert plan.count("l_orderkey") and "100" in plan


def test_lateral_topk_at_most_k_per_order(spark, sf_oracle_dir):
    """Each order contributes at most 2 rows and they are that
    order's two highest-priced line items (closed-form recheck
    against a window-rank re-derivation)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from conversadocs_spark import io
    from conversadocs_spark.plans import QUERIES

    rows = QUERIES["sql_lateral_topk"](spark, sf_oracle_dir).collect()
    got = {}
    for r in rows:
        got.setdefault(r.o_orderkey, set()).add(
            (r.l_partkey, r.l_extendedprice)
        )
    assert all(len(v) <= 2 for v in got.values())
    li = io.table(spark, sf_oracle_dir, "lineitem").where(
        F.col("l_orderkey") < 100
    )
    w = Window.partitionBy("l_orderkey").orderBy(
        F.desc("l_extendedprice"), F.asc("l_partkey")
    )
    want = {}
    for r in (
        li.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .collect()
    ):
        want.setdefault(r.l_orderkey, set()).add(
            (r.l_partkey, r.l_extendedprice)
        )
    assert got == want
