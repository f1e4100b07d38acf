"""Physical-plan contract tests: the scale story (pushdown, pruning,
broadcast, top-k, single-shuffle aggregation) must hold in the plan
Catalyst actually produces, not just in docstrings. These pin the
properties audited via .explain so a refactor that silently loses a
pushed filter or upgrades a broadcast to a shuffle fails CI.

Assertions are deliberately scale-robust: they check properties that
hold at ANY data size (e.g. nation/region broadcast — 25/5 rows
always) and avoid ones AQE legitimately changes with volume (e.g.
whether lineitem⋈orders is broadcast at sf0.01 but shuffled at 100 TB).
"""

from __future__ import annotations

import pytest

from conversadocs_spark.plans import QUERIES

SF = "/root/testdata/sf0.01"


def _plan(spark, name: str) -> str:
    return (
        QUERIES[name](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_scan_project_prunes_and_pushes(spark):
    plan = _plan(spark, "scan_project")
    # column pruning: unreferenced lineitem columns never reach the scan
    assert "l_comment" not in plan
    assert "l_tax" not in plan
    # filter pushdown: both predicates reach the parquet scan
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters", 1)[1][:400]
    assert "l_quantity" in plan.split("PushedFilters", 1)[1][:400]


def test_agg_grouped_is_partial_final_single_exchange(spark):
    plan = _plan(spark, "agg_grouped")
    assert "partial_sum" in plan  # map-side combine
    assert plan.count("Exchange hashpartitioning") == 1
    # scaled-integer path: sums accumulate over longs/decimal(28,0),
    # no per-row decimal multiply (the old chain showed CheckOverflow
    # around promote_precision multiplies)
    assert "decimal(28,0)" in plan


def test_join_star_broadcasts_dims_and_pushes_date_filter(spark):
    plan = _plan(spark, "join_star")
    # nation + region (+ at this sf customer/orders) broadcast
    assert plan.count("BroadcastHashJoin") >= 2
    assert "n_nationkey" in plan and "r_regionkey" in plan
    # o_orderdate range filter sits in the orders scan, below the join
    scan = [
        ln for ln in plan.splitlines()
        if "FileScan" in ln and "o_orderkey" in ln
    ]
    assert scan and "o_orderdate" in scan[0]


def test_topk_queries_use_take_ordered(spark):
    # constant-memory top-k: k rows per partition, no global sort
    assert "TakeOrderedAndProject(limit=3" in _plan(spark, "knn_topk")
    assert "TakeOrderedAndProject(limit=10" in _plan(
        spark, "sort_limit_topk"
    )


def test_knn_topk_has_no_cartesian(spark):
    plan = _plan(spark, "knn_topk")
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan  # 1-row query side broadcast


def test_window_rank_single_shuffle_no_global_sort(spark):
    plan = _plan(spark, "window_rank")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "rangepartitioning" not in plan  # no global sort


@pytest.mark.parametrize(
    "name",
    ["agg_grouped", "join_star", "window_rank", "set_ops", "union_all"],
)
def test_no_driver_side_antipatterns(spark, name):
    """No query plan may contain a cartesian product (unbounded at
    scale) — the two bounded-by-design similarity ops are excluded
    from this sweep and documented in their docstrings."""
    assert "CartesianProduct" not in _plan(spark, name)
