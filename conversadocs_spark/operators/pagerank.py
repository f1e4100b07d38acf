"""PageRank over an edge DataFrame — the iterative-algorithm class
(power iteration with dangling-mass redistribution).

The reference has no graph surface; this serves the corpus-curation
use the similarity graph creates anyway (dedup pairs -> graph):
centrality picks the canonical document per near-dup neighborhood and
scores hub-ness for sampling/weighting decisions (the same role the
original PageRank plays for web corpora like Common Crawl).

Spark-first design, mirroring operators/components.py:
- state is one (id, rank) DataFrame; each round is
  contribution-join -> groupBy-sum -> teleport/dangling correction —
  two shuffles on the edge key per round, edge table hash-partitioned
  ONCE and cached so every round reuses the distribution.
- dangling mass (nodes with no out-edges) is a 1-row aggregate
  broadcast into the update — never a driver-side vector.
- lineage is truncated per round with localCheckpoint(eager=False);
  the convergence aggregate (sum |delta|, an L1 residual) is the one
  action per round.
- ranks are plain doubles: convergence is detected on a tolerance,
  not bit-equality, so float-order drift cannot wedge the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def pagerank(
    edges: DataFrame,
    alpha: float = 0.85,
    max_iter: int = 40,
    tol: float = 1e-6,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Power-iteration PageRank. ``edges`` is a directed edge list;
    returns (id, rank) with ranks summing to 1 over all nodes that
    appear in the edge list (either side).

    Raises if the L1 residual has not dropped below ``tol`` within
    ``max_iter`` rounds — never returns silently-unconverged ranks
    (the components.py non-convergence contract).
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_nodes = nodes.count()  # scalar: also materializes the cache
    if n_nodes == 0:
        # empty graph: empty result, not a divide-by-zero
        nodes.unpersist()
        return nodes.select("id", F.lit(0.0).alias("rank"))
    out_deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    # (src, dst, out_deg) hash-partitioned once on src: both per-round
    # joins (ranks->contrib on src) reuse this distribution.
    links = (
        e.join(out_deg, "src")
        .repartition(F.col("src"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ranks = nodes.select(
        "id", F.lit(1.0 / n_nodes).alias("rank")
    ).localCheckpoint(eager=False)

    converged = False
    for _ in range(max_iter):
        contrib = (
            links.join(ranks, links["src"] == ranks["id"])
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        # dangling nodes (no out-edges) leak their rank; redistribute
        # it uniformly. 1-row aggregate, broadcast via crossJoin.
        dangling = (
            ranks.join(out_deg, ranks["id"] == out_deg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass"))
        )
        new_ranks = (
            nodes.join(contrib, "id", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit((1.0 - alpha) / n_nodes)
                    + alpha
                    * (
                        F.coalesce("inflow", F.lit(0.0))
                        + F.col("dmass") / n_nodes
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
        residual = (
            new_ranks.join(
                ranks.select(
                    F.col("id").alias("oid"), F.col("rank").alias("orank")
                ),
                new_ranks["id"] == F.col("oid"),
            )
            .agg(F.sum(F.abs(F.col("rank") - F.col("orank"))).alias("r"))
            .first()["r"]
        )
        ranks = new_ranks
        if residual < tol:
            converged = True
            break
    links.unpersist()
    nodes.unpersist()
    if not converged:
        raise RuntimeError(
            f"pagerank did not converge below {tol} in {max_iter} "
            "iterations; raise max_iter or loosen tol"
        )
    return ranks
