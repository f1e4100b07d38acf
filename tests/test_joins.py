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


def test_bucketed_join_has_no_exchange(spark, sf_oracle_dir):
    """The bucketed co-location contract: with broadcast disabled (at
    tiny SF Catalyst would otherwise broadcast the small side and
    hide the layout), the orders-x-lineitem join runs as a
    SortMergeJoin with ZERO Exchange anywhere below the aggregate's
    own shuffle — bucket i zips with bucket i straight off the scans.
    Values must equal the unbucketed formulation exactly (layout
    cannot change answers)."""
    from pyspark.sql import functions as F

    from conversadocs_spark import io
    from conversadocs_spark.functions.money import (
        disc_price_e4,
        sum_scaled,
    )
    from conversadocs_spark.plans.joins import join_bucketed_colocated

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = join_bucketed_colocated(spark, sf_oracle_dir)
        rows = {r.o_orderpriority: (r.n_items, r.revenue)
                for r in df.collect()}
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    final = plan.split("== Initial Plan ==")[0]
    assert "SortMergeJoin" in final
    # the ONLY exchange allowed is the 5-group aggregate's own
    # (hashpartitioning on o_orderpriority); the join itself and both
    # scans must be exchange-free — that IS the bucketing win
    for line in final.splitlines():
        if "Exchange" in line and "ReusedExchange" not in line:
            assert "hashpartitioning(o_orderpriority" in line, line
    # layout-invariance: equals the plain unbucketed computation
    o = io.table(spark, sf_oracle_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = io.table(spark, sf_oracle_dir, "lineitem").select(
        "l_orderkey", disc_price_e4().alias("d")
    )
    plain = {
        r.o_orderpriority: (r.n, r.rev)
        for r in o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(sum_scaled("d", 10_000), 2).alias("rev"),
        )
        .collect()
    }
    assert rows == plain
