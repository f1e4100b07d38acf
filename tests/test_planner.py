"""Cost-based retrieval planner (operators/planner.py): strategy
choice, logical-contract preservation, and the above-crossover IVF
path forced on the local fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from conversadocs_spark import io
from conversadocs_spark.operators.planner import (
    BRUTE_THRESHOLD,
    choose_knn_strategy,
    knn_auto,
)
from tests.conftest import SF_ORACLE


def test_strategy_crossover():
    assert choose_knn_strategy(1_000) == "brute"
    assert choose_knn_strategy(BRUTE_THRESHOLD) == "brute"
    assert choose_knn_strategy(BRUTE_THRESHOLD + 1) == "ivf"
    assert choose_knn_strategy(10_000_000) == "ivf"
    # a top-k that wants ~the whole corpus back cannot be pruned
    assert choose_knn_strategy(200_000, k=50_000) == "brute"


def _query_batch(spark):
    emb = io.table(spark, SF_ORACLE, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    corpus = emb.where(F.col("vec_id") >= 5)
    return corpus, queries


def test_auto_picks_brute_below_crossover_and_matches_exact(spark):
    """On the fixture (n << threshold) the planner must choose the
    exact scan, and its output must equal knn_per_query row-for-row —
    the physical choice never changes the logical result."""
    from conversadocs_spark.operators.knn import knn_per_query

    corpus, queries = _query_batch(spark)
    result, strategy = knn_auto(corpus, queries, k=3)
    assert strategy == "brute"
    got = sorted(map(tuple, result.collect()))
    want = sorted(map(tuple, knn_per_query(corpus, queries, k=3).collect()))
    assert got == want


def test_auto_injected_stat_flips_to_ivf_with_healthy_recall(spark):
    """Injecting an above-crossover cardinality statistic plans IVF
    without needing a 100k-row fixture; the IVF result keeps the
    (query_id, vec_id, sim, rank) contract, returns k rows per query,
    and holds recall@3 >= 0.8 vs the exact answer."""
    from conversadocs_spark.operators.knn import knn_per_query

    corpus, queries = _query_batch(spark)
    result, strategy = knn_auto(
        corpus, queries, k=3, n_corpus=10**7, n_queries=100
    )
    assert strategy == "ivf"
    rows = result.collect()
    assert result.columns == ["query_id", "vec_id", "sim", "rank"]
    per_query: dict[int, set[int]] = {}
    for r in rows:
        per_query.setdefault(r["query_id"], set()).add(r["vec_id"])
    assert len(per_query) == 5
    assert all(len(v) == 3 for v in per_query.values())
    exact: dict[int, set[int]] = {}
    for r in knn_per_query(corpus, queries, k=3).collect():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])
    recall = sum(
        len(per_query[q] & exact[q]) for q in exact
    ) / sum(len(v) for v in exact.values())
    assert recall >= 0.8


def test_tiny_batch_never_pays_for_inline_build():
    """An above-crossover corpus still plans brute when the query
    batch is too small to amortize an inline index build — measured at
    100x: inline IVF 19.1 s vs brute ~2 s for a 5-query batch over
    200k vectors."""
    from conversadocs_spark.operators.planner import AMORTIZE_MIN_QUERIES

    assert choose_knn_strategy(10**7, n_queries=5) == "brute"
    assert (
        choose_knn_strategy(10**7, n_queries=AMORTIZE_MIN_QUERIES)
        == "ivf"
    )


def test_planner_memory_budget_picks_ivfpq():
    """Above the brute crossover, a memory budget smaller than the
    raw float32 index must flip the plan to the quantized index —
    and a budget that fits raw vectors must keep plain IVF."""
    from conversadocs_spark.operators.planner import choose_knn_strategy

    n, dim = 10_000_000, 1024
    raw_bytes = n * dim * 4  # ~40 GB
    assert (
        choose_knn_strategy(
            n, dim=dim, memory_budget_bytes=raw_bytes // 10
        )
        == "ivfpq"
    )
    assert (
        choose_knn_strategy(
            n, dim=dim, memory_budget_bytes=raw_bytes * 2
        )
        == "ivf"
    )
    # budget never overrides the exact-path guards
    assert (
        choose_knn_strategy(
            50, dim=dim, memory_budget_bytes=1
        )
        == "brute"
    )


def test_planner_forced_ivfpq_runs_with_stable_contract(spark):
    """force='ivfpq' must execute the composed index and return the
    same (query_id, vec_id, sim, rank) contract as every strategy."""
    from pyspark.sql import functions as F

    from conversadocs_spark import io
    from conversadocs_spark.operators.planner import knn_auto

    emb = io.table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    corpus = emb.where(F.col("vec_id") >= 3)
    df, strategy = knn_auto(
        corpus, queries, k=3, force="ivfpq", dim=64
    )
    assert strategy == "ivfpq"
    rows = df.collect()
    assert sorted(df.columns) == ["query_id", "rank", "sim", "vec_id"]
    assert len(rows) == 9 and all(1 <= r["rank"] <= 3 for r in rows)
