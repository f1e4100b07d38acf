"""Graph centrality: TextRank keyword extraction (PageRank over the
word-adjacency graph).

TextRank (Mihalcea & Tarau, EMNLP'04) ranks corpus keywords by
PageRank over the graph whose nodes are terms and whose edges connect
terms adjacent in text — the classic unsupervised keyword/summary
substrate, squarely in the reference's document-summarization lane
(its map-reduce summarizer is plans/rag.py:summarize_mapreduce).
The graph is vocabulary-sized at any corpus scale, and its edges are
derived with one pass over the documents (slice+zip of the token
array — no self-join). Iterative power method => genuinely
non-SQL-expressible (rows-only driver row); value-level correctness
is pinned against a NumPy power-iteration reference in
tests/test_graph.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from conversadocs_spark import io
from conversadocs_spark.operators.pagerank import pagerank
from conversadocs_spark.plans.registry import register


def word_adjacency_edges(docs: DataFrame, min_len: int = 4) -> DataFrame:
    """Undirected (both-direction) edges between consecutive terms of
    ``docs.text``: one projection per document via slice+arrays_zip —
    token adjacency without a positional self-join — then a DISTINCT
    that shrinks to vocabulary^2 scale (in practice ~bigram-count)."""
    toks = F.split(F.lower(F.col("text")), " ")
    pairs = docs.select(
        F.explode(
            F.arrays_zip(
                F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
                F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
            )
        ).alias("bg")
    ).select(
        F.col("bg.0").alias("w1"), F.col("bg.1").alias("w2")
    ).where(
        (F.length("w1") >= min_len)
        & (F.length("w2") >= min_len)
        & (F.col("w1") != F.col("w2"))
    )
    return pairs.select(
        F.col("w1").alias("src"), F.col("w2").alias("dst")
    ).union(
        pairs.select(F.col("w2").alias("src"), F.col("w1").alias("dst"))
    ).distinct()


@register("graph_pagerank", tags=("graph",))
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank: PageRank over the corpus word-adjacency graph,
    top-20 keyword terms by centrality.

    The operator (operators/pagerank.py) is corpus-scale — per-round
    cost is two shuffles over an edge table partitioned once and
    cached, dangling mass via 1-row broadcast, L1-residual
    convergence with a hard non-convergence error. Here the edge
    relation is vocabulary-sized, so rounds are effectively free and
    the dominant cost is the single corpus scan that derives edges.
    """
    d = io.table(spark, sf_dir, "documents").select("text")
    edges = word_adjacency_edges(d)
    ranks = pagerank(edges, alpha=0.85, max_iter=60, tol=1e-8)
    return (
        ranks.select(
            F.col("id").alias("term"), F.round("rank", 6).alias("rank")
        )
        .orderBy(F.desc("rank"), F.asc("term"))
        .limit(20)
    )
