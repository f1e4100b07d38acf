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
