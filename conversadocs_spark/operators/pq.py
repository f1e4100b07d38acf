"""Product quantization (PQ) — the memory-scale path for the
reference's exact top-k retrieval (R9, /root/reference/conversadocs/
bones.py:78), third ANN strategy alongside LSH (operators/lsh.py) and
IVF (operators/ivf.py).

LSH and IVF cut how many vectors a query *scores*; PQ cuts how many
bytes each vector *occupies*. A vector is split into ``m`` subvectors,
each quantized to one of ``ksub`` per-subspace centroids (Jégou,
Douze, Schmid, "Product Quantization for Nearest Neighbor Search",
IEEE TPAMI 2011): the corpus is stored as ``m`` small ints per vector
— dim=64 float32 (256 B) becomes 8 codes (8 B), 32x — and a query is
scored against a code row with ``m`` table lookups instead of ``dim``
multiplies (asymmetric distance computation, ADC). At 100 TB this is
the difference between an index that fits executor memory and one
that doesn't; real deployments compose it with IVF cell pruning
(IVF-PQ) — here the coarse and fine quantizers are kept orthogonal so
either composes with the other's table.

Everything is DataFrame-native and deterministic, mirroring
operators/ivf.py:

- train: per-subspace Lloyd k-means with hash init
  (``xxhash64(id, sub) % ksub``) and exact-decimal means, so the
  codebook is independent of partitioning and retry-reproducible.
- encode: ONE broadcast of the packed codebook (m*ksub*dsub doubles
  in a single row) against the corpus; all ``m`` argmin codes are
  computed inside a single Catalyst expression — the executed plan
  between corpus scan and codes is BroadcastNestedLoopJoin(1 row) +
  Project, zero Exchange (same contract as ivf._assign).
- search: per-query ADC lookup tables are built query-side (a
  broadcastable (m x ksub) grid per query), the corpus scan emits
  slim (query_id, vec_id, adc) rows, a top-``pool`` window prunes,
  and exact cosine re-ranks only the pooled candidates — the standard
  ADC + refine scheme, so recall is governed by ``pool`` exactly as
  nprobe governs IVF.

Vectors are L2-normalized before train/encode so the ADC inner
product approximates cosine — the reference's ranking function —
rather than favoring long vectors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from conversadocs_spark.functions.vector import (
    cosine_similarity,
    l2_normalize,
)


def _l2sq(a: Column, b: Column) -> Column:
    """Squared euclidean distance between two arrays."""
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _pack(codebook: DataFrame) -> DataFrame:
    """Fold the (sub, code, centroid) codebook into ONE row for
    broadcast: m*ksub*dsub doubles (8*16*8 = 1 KiB here; even
    m=64, ksub=256, dsub=16 is 2 MB — always broadcastable)."""
    return codebook.agg(
        F.collect_list(F.struct("sub", "code", "centroid")).alias("cb")
    )


def _codes_expr(
    vec: Column, m: int, dsub: int, digits: int = 9
) -> Column:
    """All m nearest-code assignments in one expression over the
    broadcast ``cb`` row — no explode, no shuffle. Tie-break on the
    lowest code via the negated field in the struct ordering.
    ``digits`` rounds the argmin distances (9 production; the md5
    twin uses 6 so cross-engine summation-order noise sits far
    inside one rounding step — the ivf_exact_md5 rule)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: -(
            F.array_max(
                F.transform(
                    F.filter(F.col("cb"), lambda e: e["sub"] == j),
                    lambda e: F.struct(
                        F.round(
                            -_l2sq(
                                F.slice(vec, j * dsub + 1, F.lit(dsub)),
                                e["centroid"],
                            ),
                            digits,
                        ).alias("nd"),
                        (-e["code"]).alias("negcode"),
                    ),
                )
            )["negcode"]
        ).cast("int"),
    )


def pq_encode(
    normed: DataFrame,
    codebook: DataFrame,
    m: int,
    dsub: int,
    id_col: str,
    vec_col: str,
    digits: int = 9,
) -> DataFrame:
    """(id, vec, codes array<int>) — the PQ-compressed corpus. At
    100 TB you persist (id, codes) and drop the raw vectors from the
    hot index; here vec rides along for the refine step."""
    return normed.crossJoin(F.broadcast(_pack(codebook))).select(
        id_col,
        vec_col,
        _codes_expr(F.col(vec_col), m, dsub, digits=digits).alias(
            "codes"
        ),
    )


def _means(subs: DataFrame) -> DataFrame:
    """Per-(sub, code) element-wise mean with exact-decimal sums
    (partition-order independent), -> (sub, code, centroid)."""
    exploded = subs.select(
        "sub", "code", F.posexplode("subvec").alias("pos", "x")
    )
    means = exploded.groupBy("sub", "code", "pos").agg(
        (
            F.sum(F.col("x").cast("decimal(28,10)")).cast("double")
            / F.count("*")
        ).alias("mval")
    )
    return means.groupBy("sub", "code").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("mval")))
            ),
            lambda s: s.getField("mval"),
        ).alias("centroid")
    )


def pq_train(
    vectors: DataFrame,
    m: int = 8,
    ksub: int = 16,
    refine_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Train the per-subspace codebooks: (sub, code, centroid).

    Each refine pass is one broadcast-encode over the corpus plus one
    dim-exploded aggregation — nothing shuffles wider than
    (sub, code, pos). Real systems train on a bounded sample of the
    corpus (the codebook is a statistic, not an index); the full-pass
    form here keeps the query deterministic end to end. Pass ``dim``
    when known (a schema fact) to skip the 1-row probe scan.
    """
    if dim is None:
        dim = len(vectors.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    normed = vectors.select(
        id_col, l2_normalize(F.col(vec_col)).alias(vec_col)
    )
    # hash init: deterministic, seedless, no sampling action
    subs = normed.select(
        id_col,
        F.posexplode(
            F.array(
                *[
                    F.slice(F.col(vec_col), j * dsub + 1, dsub)
                    for j in range(m)
                ]
            )
        ).alias("sub", "subvec"),
    ).withColumn(
        "code",
        F.pmod(F.xxhash64(F.col(id_col), F.col("sub")), F.lit(ksub))
        .cast("int"),
    )
    codebook = _means(subs)
    for _ in range(refine_iters):
        enc = pq_encode(normed, codebook, m, dsub, id_col, vec_col)
        assigned = enc.select(
            id_col,
            vec_col,
            F.posexplode("codes").alias("sub", "code"),
        ).select(
            "sub",
            "code",
            F.slice(
                F.col(vec_col),
                F.col("sub") * dsub + 1,
                F.lit(dsub),
            ).alias("subvec"),
        )
        codebook = _means(assigned)
    return codebook


def pq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 3,
    m: int = 8,
    ksub: int = 16,
    pool: int = 48,
    refine_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    dim: int | None = None,
) -> DataFrame:
    """ADC scan + exact refine: (query_id, vec_id, sim, rank<=k).

    Scale shape: the corpus-sized stage reads ONLY (id, codes) and
    emits slim (query_id, vec_id, adc) rows — m lookups per pair, no
    raw vectors move until the top-``pool`` window prunes to
    pool*|queries| rows; the exact re-rank joins vectors for just
    those. recall/pool is the PQ knob exactly as recall/nprobe is
    IVF's (tests/test_vector.py pins the floor on the uniform-random
    worst-case fixtures).
    """
    if dim is None:
        dim = len(vectors.select(vec_col).first()[0])
    dsub = dim // m
    codebook = pq_train(
        vectors, m=m, ksub=ksub, refine_iters=refine_iters,
        id_col=id_col, vec_col=vec_col, dim=dim,
    )
    normed = vectors.select(
        id_col, l2_normalize(F.col(vec_col)).alias(vec_col)
    )
    encoded = pq_encode(normed, codebook, m, dsub, id_col, vec_col)

    # per-query ADC lookup tables: tab[j][c] = <q_j, centroid[j][c]>
    # (missing codes — cells emptied during Lloyd — fill with -1e9 so
    # an indexed lookup can never silently misalign)
    qn = queries.select(
        query_id_col,
        query_vec_col,
        l2_normalize(F.col(query_vec_col)).alias("qv"),
    )
    def _dot(a: Column, b: Column) -> Column:
        return F.aggregate(
            F.zip_with(
                a, b, lambda x, y: x.cast("double") * y.cast("double")
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    tab = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.transform(
            F.sequence(F.lit(0), F.lit(ksub - 1)),
            lambda c: F.coalesce(
                # F.get (0-indexed) returns NULL on the empty array a
                # Lloyd-emptied cell produces — element_at would raise
                # under ANSI mode
                F.get(
                    F.transform(
                        F.filter(
                            F.col("cb"),
                            lambda e: (e["sub"] == j) & (e["code"] == c),
                        ),
                        lambda e: F.round(
                            _dot(
                                F.slice(
                                    F.col("qv"), j * dsub + 1, F.lit(dsub)
                                ),
                                e["centroid"],
                            ),
                            9,
                        ),
                    ),
                    0,
                ),
                F.lit(-1e9),
            ),
        ),
    )
    qtab = qn.crossJoin(F.broadcast(_pack(codebook))).select(
        query_id_col, query_vec_col, tab.alias("tab")
    )

    adc = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.col("tab"),
            lambda c, t: F.element_at(t, c + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cand = (
        encoded.crossJoin(F.broadcast(qtab))
        .where(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            F.round(adc, 9).alias("adc"),
        )
    )
    wpool = Window.partitionBy(query_id_col).orderBy(
        F.desc("adc"), F.asc(id_col)
    )
    pooled = (
        cand.withColumn("rn", F.row_number().over(wpool))
        .where(F.col("rn") <= pool)
        .select(query_id_col, id_col)
    )
    refined = (
        pooled.join(vectors.select(id_col, vec_col), on=id_col)
        .join(
            F.broadcast(qn.select(query_id_col, query_vec_col)),
            on=query_id_col,
        )
    )
    sim = cosine_similarity(F.col(vec_col), F.col(query_vec_col))
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("sim"), F.asc(id_col)
    )
    return (
        refined.select(
            query_id_col, id_col, F.round(sim, 6).alias("sim")
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def ivfpq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_lists: int = 16,
    nprobe: int = 8,
    m: int = 8,
    ksub: int = 16,
    pool: int = 48,
    refine_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    dim: int | None = None,
) -> DataFrame:
    """IVF-PQ — the canonical billion-scale ANN pairing (FAISS's
    default index family): IVF's coarse quantizer prunes WHICH vectors
    are scored (nprobe/n_lists of the corpus), PQ's fine quantizer
    shrinks WHAT is scored (m bytes instead of dim floats), and the
    two multiply — at nprobe/n_lists = 1/2 and 32x code compression
    the scored bytes drop ~64x versus a brute scan before the exact
    refine touches a single raw vector.

    Composition, not new machinery: ivf_build assigns cells
    (operators/ivf.py), pq_train/pq_encode compress members (this
    module), the probe semi-joins candidate cells exactly like
    ivf_search, the ADC scan + top-``pool`` window run on the pruned
    members only, and exact cosine re-ranks the pool. At 100 TB the
    persisted index is (list_id-partitioned codes) — probes read
    nprobe partitions of m-byte rows.
    """
    from pyspark.sql import Window

    from conversadocs_spark.operators.ivf import ivf_build

    if dim is None:
        dim = len(vectors.select(vec_col).first()[0])
    dsub = dim // m
    assigned, centroids = ivf_build(
        vectors, n_lists=n_lists, refine_iters=refine_iters,
        id_col=id_col, vec_col=vec_col,
    )
    codebook = pq_train(
        vectors, m=m, ksub=ksub, refine_iters=refine_iters,
        id_col=id_col, vec_col=vec_col, dim=dim,
    )
    normed = assigned.select(
        id_col, "list_id", l2_normalize(F.col(vec_col)).alias(vec_col)
    )
    encoded = pq_encode(
        normed, codebook, m, dsub, id_col, vec_col
    ).join(assigned.select(id_col, "list_id"), on=id_col)

    # probe: top-nprobe cells per query (identical to ivf_search)
    qn = queries.select(
        query_id_col,
        query_vec_col,
        l2_normalize(F.col(query_vec_col)).alias("qv"),
    )
    qsim = cosine_similarity(F.col("qv"), F.col("centroid"))
    wq = Window.partitionBy(query_id_col).orderBy(
        F.desc("qsim"), F.asc("list_id")
    )
    probed = (
        qn.crossJoin(F.broadcast(centroids))
        .select(
            query_id_col, "qv", query_vec_col, "list_id",
            F.round(qsim, 9).alias("qsim"),
        )
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= nprobe)
        .select(query_id_col, "qv", query_vec_col, "list_id")
    )

    # ADC tables per (query, probed cell set) — same expression as
    # pq_topk, built once per query row
    def _dot(a, b):
        return F.aggregate(
            F.zip_with(
                a, b, lambda x, y: x.cast("double") * y.cast("double")
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    tab = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.transform(
            F.sequence(F.lit(0), F.lit(ksub - 1)),
            lambda c: F.coalesce(
                F.get(
                    F.transform(
                        F.filter(
                            F.col("cb"),
                            lambda e: (e["sub"] == j) & (e["code"] == c),
                        ),
                        lambda e: F.round(
                            _dot(
                                F.slice(
                                    F.col("qv"), j * dsub + 1, F.lit(dsub)
                                ),
                                e["centroid"],
                            ),
                            9,
                        ),
                    ),
                    0,
                ),
                F.lit(-1e9),
            ),
        ),
    )
    qtab = probed.crossJoin(F.broadcast(_pack(codebook))).select(
        query_id_col, query_vec_col, "list_id", tab.alias("tab")
    )

    adc = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.col("tab"),
            lambda c, t: F.element_at(t, c + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cand = (
        encoded.join(F.broadcast(qtab), on="list_id")
        .where(F.col(id_col) != F.col(query_id_col))
        .select(query_id_col, id_col, F.round(adc, 9).alias("adc"))
    )
    wpool = Window.partitionBy(query_id_col).orderBy(
        F.desc("adc"), F.asc(id_col)
    )
    pooled = (
        cand.withColumn("rn", F.row_number().over(wpool))
        .where(F.col("rn") <= pool)
        .select(query_id_col, id_col)
    )
    refined = pooled.join(
        vectors.select(id_col, vec_col), on=id_col
    ).join(
        F.broadcast(queries.select(query_id_col, query_vec_col)),
        on=query_id_col,
    )
    sim = cosine_similarity(F.col(vec_col), F.col(query_vec_col))
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("sim"), F.asc(id_col)
    )
    return (
        refined.select(
            query_id_col, id_col, F.round(sim, 6).alias("sim")
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def pq_exact_md5(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    m: int = 4,
    ksub: int = 8,
    k: int = 3,
    pool: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Oracle-REPLAYABLE PQ twin (the md5-twin recipe's fourth
    application — simhash r13, MinHash r14, IVF + LSH r15 — closing
    the ANN ladder): the same train -> encode -> ADC -> pool ->
    exact-refine pipeline as :func:`pq_train` / :func:`pq_topk`, with
    every non-replayable ingredient swapped for one DuckDB recomputes
    bit for bit:

    - init: ``code0 = md5_60bit("id:sub") % ksub`` instead of
      xxhash64 (both engines evaluate the identical hex arithmetic);
    - ONE fixed Lloyd refinement round (static chained-CTE plan);
    - per-(sub, code, pos) means through exact DECIMAL(28,10) sums
      (the production :func:`_means`, unchanged — raw parquet doubles
      in, identical doubles out on both engines);
    - RAW vectors, no L2 normalize: the twin's checkable contract is
      the quantization machinery (subspace split, cell means, argmin
      codes, ADC lookups, pool, refine), and dividing by a
      float-summed norm ahead of the decimal-exact mean stage would
      inject the one cross-engine noise source the recipe exists to
      avoid; the exact re-rank stays cosine, so the emitted ranking
      contract matches the ladder's other twins;
    - argmin distances and the summed ADC rounded to 6 BEFORE any
      rank (noise ~1e-15 sits 9 orders inside the step), ties on
      lowest code / vec_id.

    Production stays :func:`pq_topk` with its recall audits; this
    twin is for bounded value-checked fixtures."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    raw = vectors.select(id_col, vec_col)
    subs = raw.select(
        id_col,
        F.posexplode(
            F.array(
                *[
                    F.slice(F.col(vec_col), j * dsub + 1, dsub)
                    for j in range(m)
                ]
            )
        ).alias("sub", "subvec"),
    ).withColumn(
        "code",
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.col(id_col).cast("string"),
                            F.col("sub").cast("string"),
                        ).cast("binary")
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(ksub),
        ).cast("int"),
    )
    # eager-localCheckpoint each codebook (<= m*ksub rows): the
    # ivf_exact_md5 lineage rule — without it the refine round's plan
    # embeds the full init-means chain per action. K-row state, so
    # the non-reliable-storage caveat is immaterial.
    c0 = _means(subs).localCheckpoint(eager=True)
    enc1 = pq_encode(raw, c0, m, dsub, id_col, vec_col, digits=6)
    a1 = enc1.select(
        id_col,
        vec_col,
        F.posexplode("codes").alias("sub", "code"),
    ).select(
        "sub",
        "code",
        F.slice(
            F.col(vec_col), F.col("sub") * dsub + 1, F.lit(dsub)
        ).alias("subvec"),
    )
    c1 = _means(a1).localCheckpoint(eager=True)
    encoded = pq_encode(raw, c1, m, dsub, id_col, vec_col, digits=6)

    qn = queries.select(query_id_col, query_vec_col)

    def _dot(a: Column, b: Column) -> Column:
        return F.aggregate(
            F.zip_with(
                a, b, lambda x, y: x.cast("double") * y.cast("double")
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    # per-query ADC tables over the UNrounded per-subspace dots; the
    # summed ADC is rounded to 6 below (one final rounding of the
    # 64-term total — the cross-engine-safe point)
    tab = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.transform(
            F.sequence(F.lit(0), F.lit(ksub - 1)),
            lambda c: F.coalesce(
                F.get(
                    F.transform(
                        F.filter(
                            F.col("cb"),
                            lambda e: (e["sub"] == j) & (e["code"] == c),
                        ),
                        lambda e: _dot(
                            F.slice(
                                F.col(query_vec_col),
                                j * dsub + 1,
                                F.lit(dsub),
                            ),
                            e["centroid"],
                        ),
                    ),
                    0,
                ),
                F.lit(-1e9),
            ),
        ),
    )
    qtab = qn.crossJoin(F.broadcast(_pack(c1))).select(
        query_id_col, query_vec_col, tab.alias("tab")
    )
    adc = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.col("tab"),
            lambda c, t: F.element_at(t, c + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cand = (
        encoded.crossJoin(F.broadcast(qtab))
        .where(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            F.round(adc, 6).alias("adc"),
        )
    )
    wpool = Window.partitionBy(query_id_col).orderBy(
        F.desc("adc"), F.asc(id_col)
    )
    pooled = (
        cand.withColumn("rn", F.row_number().over(wpool))
        .where(F.col("rn") <= pool)
        .select(query_id_col, id_col)
    )
    refined = pooled.join(
        vectors.select(id_col, vec_col), on=id_col
    ).join(
        F.broadcast(qn.select(query_id_col, query_vec_col)),
        on=query_id_col,
    )
    sim = cosine_similarity(F.col(vec_col), F.col(query_vec_col))
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("sim"), F.asc(id_col)
    )
    return (
        refined.select(
            query_id_col, id_col, F.round(sim, 6).alias("sim")
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
