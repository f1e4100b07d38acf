"""Approximate nearest-neighbor search via seeded random-hyperplane
LSH — the scale path for the reference's exact top-k retrieval (R9):
at 100 TB a crossJoin(queries x corpus) is infeasible; bucketing by
hyperplane sign bits prunes the candidate set to same-bucket rows, then
exact cosine re-ranks survivors.

Pure DataFrame ops end to end: the projection matrix is a fixed-seed
numpy array (deterministic across runs and partitionings — no fit()
state to persist) shipped as a broadcast one-row-per-seed DataFrame,
NOT as literal expressions — plan size stays constant in dim, so
dim-768+ embeddings do not bloat codegen (an earlier version inlined
seeds x planes x dim literals). MLlib's BucketedRandomProjectionLSH
covers the Euclidean case; this operator is cosine-native (sign-bit
SimHash family), which matches the reference's similarity function.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from conversadocs_spark.functions.vector import dot_product, l2_norm


def _planes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return [
        [float(x) for x in row]
        for row in rng.standard_normal((n_planes, dim))
    ]


def planes_frame(
    spark, dim: int, n_planes: int, seeds: tuple[int, ...]
) -> DataFrame:
    """(seed, planes array<array<double>>) — one row per probe seed.
    Joined via broadcast so the projection matrix travels as DATA (a
    broadcast variable), never as plan literals."""
    return spark.createDataFrame(
        [(s, _planes(dim, n_planes, s)) for s in seeds],
        "seed int, planes array<array<double>>",
    )


def bucket_expr(vec_col: F.Column, planes_col: F.Column) -> F.Column:
    """Bucket id = integer of sign bits of <v, r_j> over the planes
    array: one aggregate pass with a nested dot-product lambda —
    expression size independent of dim and n_planes. Horner fold over
    descending j (acc*2 + bit_j) reproduces sum(2^j * bit_j) exactly
    (shiftleft needs a literal shift, so it can't consume the lambda
    index)."""
    idx_desc = F.sequence(
        F.size(planes_col) - 1, F.lit(0), F.lit(-1)
    )
    return F.aggregate(
        idx_desc,
        F.lit(0).cast("long"),
        lambda acc, j: acc * 2
        + F.when(
            F.aggregate(
                F.zip_with(
                    vec_col,
                    F.element_at(planes_col, j + 1),
                    lambda a, b: a.cast("double") * b,
                ),
                F.lit(0.0),
                lambda s, x: s + x,
            )
            > 0,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )


DEFAULT_SEEDS: tuple[int, ...] = tuple(range(101, 109))


def ann_topk_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 3,
    n_planes: int = 3,
    seeds: tuple[int, ...] = DEFAULT_SEEDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate per-query top-k: bucket both sides under each seed
    (multi-probe improves recall), join on (seed, bucket), exact-cosine
    re-rank the candidates.

    Plan shape at scale: corpus bucketed once per seed (narrow map),
    shuffle only on the bucket key; the final window ranks each query's
    candidate set (<< corpus size). Compare with operators/knn.py's
    exact `knn_per_query` to measure recall (tests/test_vector.py
    enforces recall@3 >= 0.8 on the fixtures; measured 0.93 with the
    defaults).

    Tuning: recall per seed is p^n_planes with p = 1 - theta/pi, so
    bits trade selectivity against recall. The fixture embeddings are
    near-uniform random (top-3 cosine ~0.35-0.44) — the ADVERSARIAL
    case, needing few bits + many seeds; clustered real corpora
    (near-dup sims >= 0.8) support 8-16 bits at far better prune
    ratios with the same recall. The projection matrix rides in a
    broadcast (seed, planes) DataFrame, so raising dim or either knob
    grows the broadcast payload, not the plan.
    """
    from pyspark.sql import Window

    spark = vectors.sparkSession
    pf = planes_frame(spark, dim, n_planes, seeds)

    v_bucketed = (
        vectors.crossJoin(F.broadcast(pf))
        .select(
            id_col,
            vec_col,
            "seed",
            bucket_expr(F.col(vec_col), F.col("planes")).alias("bucket"),
        )
    )

    q_bucketed = (
        queries.crossJoin(F.broadcast(pf))
        .select(
            query_id_col,
            query_vec_col,
            "seed",
            bucket_expr(
                F.col(query_vec_col), F.col("planes")
            ).alias("bucket"),
        )
    )

    # rescore with hoisted norms (the r11 CSE rule): the bucket join's
    # candidate set is a corpus-scale fraction, and a row colliding
    # with several queries (or in several seeds, pre-dedup) would
    # re-fold its norm per occurrence; the query norm likewise per
    # candidate. Identical expression tree, identical values.
    cand = (
        v_bucketed.withColumn("_n", l2_norm(F.col(vec_col)))
        .join(
            F.broadcast(
                q_bucketed.withColumn(
                    "_qn", l2_norm(F.col(query_vec_col))
                )
            ),
            on=["seed", "bucket"],
            how="inner",
        )
        .where(F.col(id_col) != F.col(query_id_col))
        .dropDuplicates([query_id_col, id_col])
    )
    sim = dot_product(F.col(vec_col), F.col(query_vec_col)) / (
        F.col("_n") * F.col("_qn")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("sim"), F.asc(id_col)
    )
    return (
        cand.select(
            query_id_col, id_col, F.round(sim, 6).alias("sim")
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
