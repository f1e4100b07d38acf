"""Hierarchical (tree) reduce — the reference's map-reduce summarize
loop (R14, /root/reference/conversadocs/bones.py:146-169: map =
summarize each chunk, reduce = concatenate partials and summarize the
concatenation, recursing while the payload exceeds the context limit).

Spark-first shape: each level is ONE grouped aggregation
(``groupBy(key, seq div fanout)`` + ordered concat + combine), so a
corpus with N chunks finishes in ceil(log_fanout(N)) shuffles, each
strictly smaller than the last — a treeAggregate expressed in
DataFrame ops. No collect() of data: the driver-side loop only reads
the max group size (one tiny agg per level), exactly like the
reference's "is it still too long?" check.
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ordered_concat(seq_col: str, text_col: str, sep: str = "\n") -> Column:
    """Deterministic ordered concat of a group's texts (collect_list is
    order-unstable, so sort (seq, text) structs before joining)."""
    return F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct(seq_col, text_col))),
            lambda s: s[text_col],
        ),
        sep,
    )


def reduce_level(
    df: DataFrame,
    combine: Callable[[Column], Column],
    key_col: str = "doc_id",
    seq_col: str = "seq",
    text_col: str = "text",
    fanout: int = 4,
) -> DataFrame:
    """One tree level: pack `fanout` consecutive texts per key into one
    combined text. Output has the same (key, seq, text) shape so levels
    compose."""
    return (
        df.groupBy(
            F.col(key_col),
            (F.col(seq_col) / fanout).cast("long").alias(seq_col),
        )
        .agg(combine(_ordered_concat(seq_col, text_col)).alias(text_col))
        .select(key_col, seq_col, text_col)
    )


def hierarchical_reduce(
    df: DataFrame,
    combine: Callable[[Column], Column],
    key_col: str = "doc_id",
    seq_col: str = "seq",
    text_col: str = "text",
    fanout: int = 4,
    max_levels: int = 64,
) -> tuple[DataFrame, int]:
    """Reduce each key's sequence of texts to ONE text, bottom-up.

    Returns (one row per key: (key, text), levels_run). Terminates in
    ceil(log_fanout(max_group_size)) levels — asserted by
    tests/test_reduce.py. The per-level driver check reads a single
    aggregated number (max rows per key), never row data.
    """
    cur = df.select(key_col, seq_col, text_col)
    levels = 0
    while levels < max_levels:
        max_n = (
            cur.groupBy(key_col)
            .count()
            .agg(F.max("count"))
            .first()[0]
        )
        if max_n is None or max_n <= 1:
            break
        cur = reduce_level(
            cur, combine, key_col, seq_col, text_col, fanout
        )
        levels += 1
    return cur.select(key_col, text_col), levels


def expected_levels(max_chunks: int, fanout: int = 4) -> int:
    """ceil(log_fanout(n)) — the termination bound for the loop above."""
    if max_chunks <= 1:
        return 0
    return math.ceil(math.log(max_chunks, fanout))
