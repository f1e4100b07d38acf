"""Graph centrality over the document-similarity graph.

``dedup_clusters`` already treats near-dup pairs as edges (connected
components); PageRank is the ranking view of the same graph — which
document is the hub of its similarity neighborhood. Iterative power
method => genuinely non-SQL-expressible (the driver records a
rows-only row); value-level correctness is pinned against a NumPy
power-iteration reference in tests/test_graph.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from conversadocs_spark import io
from conversadocs_spark.operators.dedup import dedup_ngram_pairs
from conversadocs_spark.operators.pagerank import pagerank
from conversadocs_spark.plans.registry import register


@register("graph_pagerank", tags=("graph",))
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the undirected 3-gram-Jaccard similarity graph
    (bounded candidate set doc_id < 150, sim >= 0.05 — the
    dedup_ngram_jaccard edge set), top-20 hubs.

    Undirected = each pair contributes both directions. The operator
    itself (operators/pagerank.py) is corpus-scale: per-round cost is
    two shuffles over an edge table partitioned once; this query's
    edge set is merely the oracle-checkable fixture slice.
    """
    d = io.table(spark, sf_dir, "documents").where(F.col("doc_id") < 150)
    pairs = dedup_ngram_pairs(d, threshold=0.05, n=3).select("id1", "id2")
    edges = pairs.select(
        F.col("id1").alias("src"), F.col("id2").alias("dst")
    ).union(
        pairs.select(F.col("id2").alias("src"), F.col("id1").alias("dst"))
    )
    ranks = pagerank(edges, alpha=0.85, max_iter=60, tol=1e-8)
    return (
        ranks.select("id", F.round("rank", 6).alias("rank"))
        .orderBy(F.desc("rank"), F.asc("id"))
        .limit(20)
    )
