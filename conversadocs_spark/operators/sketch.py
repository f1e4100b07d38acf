"""Misra-Gries heavy hitters: frequent-item sketch with a hard error
bound, mergeable across partitions.

Why not exact vocab counting (plans/text.py vocab_topk)? Exact counts
shuffle the full (term, count) relation — fine while vocabulary fits
the shuffle, but the long tail of a 100 TB web corpus (typos, URLs,
numbers) makes the term dictionary itself corpus-scale. Misra-Gries
caps state at k counters PER PARTITION, emits at most k survivors per
partition, and the merged estimate keeps the classic guarantee:

    true_count - n/(k+1)  <=  estimate  <=  true_count

(per partition p the MG decrement step fires at most n_p/(k+1) times,
each lowering a term's counter by at most 1; summing the per-partition
sketches sums both the estimates and the error budgets). Every term
with frequency > n/(k+1) is guaranteed to survive.

The kernel is an Arrow-batched mapInPandas (one sketch per partition,
O(k) memory), and the merge is a plain groupBy-sum — the shuffle
carries at most k rows per partition regardless of data size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(
    df: DataFrame, col: str = "term", k: int = 200
) -> DataFrame:
    """Merged Misra-Gries sketch over ``df[col]``: (term, est) where
    est underestimates the true count by at most n/(k+1) in total.
    Deterministic for a fixed input layout (no sampling, no hashing).
    """

    def mg_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        for pdf in batches:
            for t in pdf[col]:
                if t in counters:
                    counters[t] += 1
                elif len(counters) < k:
                    counters[t] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame(
            {"term": list(counters.keys()), "est": list(counters.values())}
        )

    partial = df.select(F.col(col).alias("term")).mapInPandas(
        mg_partition, "term string, est long"
    )
    return partial.groupBy("term").agg(F.sum("est").alias("est"))
