"""Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998):
diversify a retrieved candidate list by greedily picking the item that
maximises  lambda * rel(q, d)  -  (1 - lambda) * max sim(d, selected).

The reference's retriever surface exposes exactly this as LangChain's
``search_type="mmr"`` alternative to plain similarity
(/root/reference/conversadocs/bones.py:74 uses "similarity"; the same
``as_retriever`` API's other documented mode is "mmr") — so a user
switching retrieval modes needs this operator.

Spark-first shape: MMR is inherently a sequential greedy loop, but ONLY
over the already-retrieved candidate list, which is bounded by
construction (retrieve-wide k' in the tens). So the distributed plan
is: wide retrieval (knn_per_query / ANN — corpus-scale, fully
distributed) -> groupBy(query_id).applyInPandas(greedy MMR) where each
group holds <= k' rows. Parallelism is across queries; per-query work
is O(k'^2) on a few dozen rows. No corpus data ever reaches the loop —
the same bounded-candidate contract as the rerank stage
(plans/retrieval.py).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mmr_rerank(
    candidates: DataFrame,
    k: int = 5,
    lam: float = 0.7,
    query_col: str = "query_id",
    id_col: str = "vec_id",
    rel_col: str = "sim",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-query greedy MMR over bounded candidate groups.

    ``candidates``: (query_col, id_col, rel_col, vec_col) — the output
    of a wide retrieval joined back to its vectors. Each query group
    MUST be bounded (it is, by the retrieval's top-k'); the whole
    group is buffered in one pandas frame, like every grouped-map op.

    Returns (query_col, id_col, rel_col as double, mmr_rank int) with
    mmr_rank = 0-based selection order. Deterministic: score ties
    break on ascending id (scores rounded to 9 decimals so float noise
    can't flip the tie-break); the group is re-sorted by id first so
    the result is independent of partition layout.

    The kernel is fully self-contained (no module globals) so the
    cloudpickled closure needs nothing importable on the workers —
    the same contract as every grouped-map kernel in this package.
    tests/test_vector.py re-derives the greedy independently and pins
    the selection value-for-value.
    """
    schema = (
        f"{query_col} long, {id_col} long, {rel_col} double, "
        "mmr_rank int"
    )

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(id_col)  # layout-independent input order
        ids = pdf[id_col].tolist()
        rel = np.asarray(pdf[rel_col].tolist(), dtype="float64")
        v = np.asarray(pdf[vec_col].tolist(), dtype="float64")
        norms = np.linalg.norm(v, axis=1)
        norms[norms == 0.0] = 1.0
        v = v / norms[:, None]
        sim = v @ v.T  # candidate-candidate cosine, k' x k'
        selected: list[int] = []
        remaining = list(range(len(ids)))
        rows = []
        while remaining and len(rows) < k:
            best, best_score = None, None
            for i in remaining:
                div = max((sim[i, j] for j in selected), default=0.0)
                score = round(lam * rel[i] - (1.0 - lam) * div, 9)
                if (
                    best is None
                    or score > best_score
                    or (score == best_score and ids[i] < ids[best])
                ):
                    best, best_score = i, score
            selected.append(best)
            remaining.remove(best)
            rows.append((ids[best], float(rel[best]), len(rows)))
        qid = pdf[query_col].iloc[0]
        return pd.DataFrame(
            [(qid, i, r, rk) for (i, r, rk) in rows],
            columns=[query_col, id_col, rel_col, "mmr_rank"],
        )

    return (
        candidates.select(query_col, id_col, rel_col, vec_col)
        .groupBy(query_col)
        .applyInPandas(pick, schema=schema)
    )


def mmr_rerank_fixedpoint(
    candidates: DataFrame,
    k: int = 5,
    lam_num: int = 7,
    lam_den: int = 10,
    query_col: str = "query_id",
    id_col: str = "vec_id",
    rel_col: str = "sim",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy MMR with FIXED-POINT scoring — the oracle-checkable twin
    of :func:`mmr_rerank`.

    Identical distributed shape (bounded per-query groups via
    applyInPandas), but every score is a BIGINT: relevance and each
    candidate-candidate cosine are lowered to micro-units with
    ``floor(x * 1e6 + 0.5)`` (the engine-agnostic HALF-UP spelled out
    so DuckDB can replay it verbatim — the lm_bigram fixed-point rule),
    and the MMR objective becomes the integer
    ``lam_num * rel_fp - (lam_den - lam_num) * max_sel_sim_fp``
    (lambda = lam_num/lam_den, default 0.7). Integer comparisons mean
    the argmax — and therefore the whole greedy selection — is
    bit-identical across engines; ties break on ascending id. A DuckDB
    ``WITH RECURSIVE`` replays the selection step for step (depth = k,
    working set = the bounded candidate list — the seq_pack_ffd
    technique), so the assignment is value-hash-checked, not just
    invariant-tested.

    Returns (query_col, id_col, rel_col as double, mmr_rank int); the
    returned relevance is the input's (already 6-dp-rounded) double,
    not the fixed-point form. Kernel is fully self-contained (no
    module globals) per the grouped-map closure contract.
    """
    schema = (
        f"{query_col} long, {id_col} long, {rel_col} double, "
        "mmr_rank int"
    )

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        def fp(x: float) -> int:
            return int(math.floor(x * 1e6 + 0.5))

        def fold_dot(a: list[float], b: list[float]) -> float:
            # strict sequential left fold over element products — the
            # SAME operation order as the oracle's list_reduce, so the
            # float64 result is bit-identical across engines and the
            # fp() quantization boundary can never flip (ADVICE r11:
            # BLAS pairwise summation vs SQL SUM order was a latent
            # last-ulp hash flake at floor(x*1e6+0.5) boundaries)
            acc = 0.0
            for x, y in zip(a, b):
                acc = acc + x * y
            return acc

        pdf = pdf.sort_values(id_col)  # ascending-id tie-break order
        ids = pdf[id_col].tolist()
        rel = [float(x) for x in pdf[rel_col]]
        vecs = [
            [float(x) for x in row] for row in pdf[vec_col].tolist()
        ]
        nrm = [math.sqrt(fold_dot(v, v)) for v in vecs]
        nrm = [x if x != 0.0 else 1.0 for x in nrm]
        n = len(ids)
        rel_fp = [fp(r) for r in rel]
        sim_fp = [
            [
                fp(fold_dot(vecs[i], vecs[j]) / (nrm[i] * nrm[j]))
                for j in range(n)
            ]
            for i in range(n)
        ]
        selected: list[int] = []
        rows = []
        while len(rows) < k and len(selected) < n:
            best = None
            best_score = None
            for i in range(n):  # ascending id: first max wins ties
                if i in selected:
                    continue
                div = max(
                    (sim_fp[i][j] for j in selected), default=0
                )
                score = lam_num * rel_fp[i] - (lam_den - lam_num) * div
                if best is None or score > best_score:
                    best, best_score = i, score
            selected.append(best)
            rows.append((ids[best], rel[best], len(rows)))
        qid = pdf[query_col].iloc[0]
        return pd.DataFrame(
            [(qid, i, r, rk) for (i, r, rk) in rows],
            columns=[query_col, id_col, rel_col, "mmr_rank"],
        )

    return (
        candidates.select(query_col, id_col, rel_col, vec_col)
        .groupBy(query_col)
        .applyInPandas(pick, schema=schema)
    )
