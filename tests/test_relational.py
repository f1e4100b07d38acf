"""Phase-1 relational surface: every query must match its DuckDB oracle
at sf0.01 (the driver's t2 gate, replicated locally)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.oracle import assert_query_matches_oracle

RELATIONAL = [
    "scan_project",
    "filter_pred",
    "string_funcs",
    "date_funcs",
    "math_funcs",
    "array_funcs",
    "json_funcs",
    "conditional_funcs",
    "join_inner",
    "join_left",
    "join_semi",
    "join_anti",
    "join_star",
    "join_range",
    "join_asof",
    "agg_grouped",
    "agg_global",
    "agg_distinct",
    "agg_rollup",
    "agg_cube",
    "agg_collect_stuff",
    "window_rank",
    "window_analytic",
    "window_frame",
    "sort_limit_topk",
    "set_ops",
    "union_all",
]


@pytest.mark.parametrize("name", RELATIONAL)
def test_matches_oracle(spark, sf_oracle_dir, name):
    assert_query_matches_oracle(spark, name, sf_oracle_dir)


def test_approx_distinct_within_tolerance(spark, sf_oracle_dir):
    """agg_approx_distinct has no SQL oracle (HLL is engine-specific);
    assert the estimate lands within 5% of the exact count."""
    from conversadocs_spark import io
    from conversadocs_spark.plans import QUERIES

    approx = {
        r["o_orderstatus"]: r["approx_custs"]
        for r in QUERIES["agg_approx_distinct"](spark, sf_oracle_dir).collect()
    }
    from pyspark.sql import functions as F

    exact = {
        r["o_orderstatus"]: r["exact"]
        for r in io.table(spark, sf_oracle_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count_distinct("o_custkey").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        assert abs(approx[k] - exact[k]) / exact[k] < 0.05, (k, approx[k], exact[k])


def test_percentile_approx_within_rank_eps(spark, sf_oracle_dir):
    """agg_percentile_approx has no SQL oracle (the sketch is
    engine-specific); enforce the documented rank-error contract
    instead: with accuracy=1000 (eps = 0.001), each approx quantile
    must land inside the exact value envelope
    [quantile(q - eps), quantile(q + eps)] computed from the same
    group. A small float pad covers envelope-boundary equality."""
    from pyspark.sql import functions as F

    from conversadocs_spark import io
    from conversadocs_spark.plans import QUERIES

    eps = 1.0 / 1000
    approx = {
        r["event_type"]: r
        for r in QUERIES["agg_percentile_approx"](
            spark, sf_oracle_dir
        ).collect()
    }
    ev = io.table(spark, sf_oracle_dir, "events")
    groups = {
        r["event_type"]: sorted(r["vals"])
        for r in ev.groupBy("event_type")
        .agg(F.collect_list("value").alias("vals"))
        .collect()
    }
    assert set(approx) == set(groups)
    # contract: the returned value is an actual element whose RANK is
    # within eps*n of the target rank (one element of slack for the
    # floor/ceil at the boundary).
    for et, vals in groups.items():
        n = len(vals)
        for q, col in (
            (0.5, "p50_approx"),
            (0.95, "p95_approx"),
            (0.99, "p99_approx"),
        ):
            v = approx[et][col]
            rank_lo = sum(1 for x in vals if x < v)
            rank_hi = sum(1 for x in vals if x <= v)
            target = q * n
            slack = eps * n + 1
            assert rank_lo - slack <= target <= rank_hi + slack, (
                et, col, v, rank_lo, rank_hi, target, n,
            )


def test_scaled_integer_money_path_is_exact(spark, sf_oracle_dir):
    """The scaled-integer money fast path (functions/money.py cents/
    disc_price_e4/charge_e6/sum_scaled) must be bit-identical to the
    decimal reference formulation on every lineitem row and sum — this
    is the claim that lets the bench queries run ~2x faster without
    leaving the exactness policy."""
    from pyspark.sql import functions as F

    from conversadocs_spark import io
    from conversadocs_spark.functions.money import (
        charge,
        charge_e6,
        disc_price,
        disc_price_e4,
        sum_scaled,
    )

    li = io.table(spark, sf_oracle_dir, "lineitem")
    diff = li.where(
        (
            F.round(disc_price().cast("double"), 4)
            != F.round((disc_price_e4() / 10000).cast("double"), 4)
        )
        | (
            F.round(charge().cast("double"), 6)
            != F.round((charge_e6() / 1000000).cast("double"), 6)
        )
    ).count()
    assert diff == 0
    dec_sum, int_sum = li.select(
        F.round(F.sum(disc_price()).cast("double"), 4).alias("d"),
        F.round(sum_scaled(disc_price_e4(), 10000), 4).alias("i"),
    ).first()
    assert dec_sum == int_sum


def test_arrow_text_stats_matches_pure_python(spark, sf_dir):
    """mapInArrow kernel semantics pinned against a plain-Python
    recompute on the same rows (the oracle sweep separately checks it
    against DuckDB regexes at sf0.01)."""
    import re

    from conversadocs_spark import io
    from conversadocs_spark.plans import QUERIES

    got = {
        r["doc_id"]: (r["n_tokens"], r["n_chars"], r["n_newlines"])
        for r in QUERIES["arrow_text_stats"](spark, sf_dir).collect()
    }
    for row in io.table(spark, sf_dir, "documents").collect():
        want = (
            len(re.findall(r"\S+", row["text"])),
            len(row["text"]),
            row["text"].count("\n"),
        )
        assert got[row["doc_id"]] == want


def test_hll_union_within_tolerance(spark, sf_oracle_dir):
    """The two-level sketch (daily build -> union) must estimate
    within 5% of the exact distinct count, and must equal the
    one-level sketch of the same rows exactly (union of partial
    sketches is lossless vs sketching everything at once — the
    property that makes stored sketch blobs re-mergeable)."""
    from conversadocs_spark import io
    from conversadocs_spark.plans import QUERIES

    rows = QUERIES["agg_hll_mergeable"](spark, sf_oracle_dir).collect()
    assert rows
    for r in rows:
        rel = abs(r["est_users"] - r["exact_users"]) / r["exact_users"]
        assert rel <= 0.05, (r, rel)

    from pyspark.sql import functions as F

    ev = io.table(spark, sf_oracle_dir, "events")
    one_level = {
        r["event_type"]: r["est"]
        for r in ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id", 12))
            .cast("bigint")
            .alias("est")
        )
        .collect()
    }
    for r in rows:
        assert r["est_users"] == one_level[r["event_type"]]


def test_new_oracle_queries_match(spark, sf_oracle_dir):
    """Session-wave oracle parity in CI: the applyInArrow grouped map,
    the mixture realization, and stable_row_ids (the sf0.01 gate and
    the driver run them too; this keeps plain pytest sufficient)."""
    for name in (
        "arrow_grouped_seq", "mixture_realize", "stable_row_ids",
        "kfold_split", "scan_orc_roundtrip",
    ):
        assert_query_matches_oracle(spark, name, sf_oracle_dir)


def test_recursive_cte_walk_semantics(spark, sf_oracle_dir):
    """The recursive ancestor walk must agree with the closed form of
    the decimal-shift hierarchy: depth(k) = number-of-digits(k) - 1
    and root(k) = leading digit (k=0 is its own root at depth 0) —
    i.e. the recursion really iterated to the fixpoint rather than
    stopping after one level."""
    from conversadocs_spark.plans import QUERIES

    rows = QUERIES["sql_recursive_cte"](spark, sf_oracle_dir).collect()
    assert len(rows) == 1500
    for r in rows:
        if r.custkey == 0:
            assert (r.root_key, r.depth) == (0, 0)
        else:
            digits = str(r.custkey)
            assert r.depth == len(digits) - 1, r
            assert r.root_key == int(digits[0]), r
    assert max(r.depth for r in rows) >= 3


def test_histogram_equi_depth_balanced_and_unsorted(spark, sf_oracle_dir):
    """Equi-depth contract: buckets tile [0, B), depths differ by at
    most ceil(ties) across the quantized total order (re-derived in
    python), bounds are non-overlapping and ordered, and the plan has
    no RangePartitioning (global-rank semantics WITHOUT a global
    sort)."""
    from conversadocs_spark import io
    from conversadocs_spark.plans.aggregates import (
        _EQUI_DEPTH_B,
        histogram_equi_depth,
    )

    df = histogram_equi_depth(spark, sf_oracle_dir)
    rows = sorted(df.collect(), key=lambda r: r.bucket)
    assert [r.bucket for r in rows] == list(range(_EQUI_DEPTH_B))
    vals = sorted(
        (
            int(round(r.o_totalprice * 100)) // 100,
            r.o_orderkey,
        )
        for r in io.table(spark, sf_oracle_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .collect()
    )
    n = len(vals)
    assert sum(r.n_rows for r in rows) == n
    # python re-derivation of every bucket's depth and bounds
    expect = {}
    for p, (v, _) in enumerate(vals):
        b = (p * _EQUI_DEPTH_B) // n
        d = expect.setdefault(b, [0, v, v])
        d[0] += 1
        d[1] = min(d[1], v)
        d[2] = max(d[2], v)
    for r in rows:
        assert [r.n_rows, r.lo, r.hi] == expect[r.bucket], r.bucket
    # bounds ordered across buckets (ties may share a boundary value)
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower()
