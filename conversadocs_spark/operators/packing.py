"""Sequence packing: greedily pack documents into fixed token budgets.

Training pipelines batch documents into context windows (e.g. 2k/4k
tokens — the reference's own LLM context is 4096/2048,
/root/reference/conversadocs/bones.py:185,212); packing short docs
together instead of padding each one is the standard throughput win.

Greedy packing is inherently sequential WITHIN an ordering, so it
cannot be a window expression (the bin boundary depends on every prior
assignment — a cumsum with data-dependent resets). The scale shape is
applyInPandas per pack GROUP (here: ``source``): each group's docs are
packed independently in one Arrow batch, groups run in parallel across
executors, and no state crosses group boundaries. At 100 TB the group
key is whatever sharding the corpus already has (source, shard id,
date); per-group data stays executor-local.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACK_SCHEMA = (
    "doc_id long, source string, n_tokens long, pack_id long, "
    "pack_pos long"
)


#: pack_id = shard_index * _SHARD_STRIDE + local id, so ids stay
#: unique per source without cross-shard coordination (a shard of
#: shard_docs rows can open at most shard_docs packs < the stride)
_SHARD_STRIDE = 1 << 32


def _pack_group(budget: int):
    """Kernel factory: greedy first-fit-in-order packer for one
    (source, shard) group.

    Docs are processed in doc_id order; a doc opens a new pack when
    adding it would exceed ``budget`` (a doc larger than the budget
    gets a pack of its own). Deterministic given the group's rows.
    """

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        base = int(pdf["_shard"].iloc[0]) * _SHARD_STRIDE
        pack_ids, positions = [], []
        pack_id, used, pos = 0, 0, 0
        for n in pdf["n_tokens"]:
            if used > 0 and used + n > budget:
                pack_id += 1
                used, pos = 0, 0
            pack_ids.append(base + pack_id)
            positions.append(pos)
            used += n
            pos += 1
        pdf["pack_id"] = pack_ids
        pdf["pack_pos"] = positions
        return pdf[["doc_id", "source", "n_tokens", "pack_id", "pack_pos"]]

    return pack


def pack_documents(
    df: DataFrame,
    budget: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    shard_docs: int = 1 << 16,
) -> DataFrame:
    """(doc_id, source, n_tokens, pack_id, pack_pos): greedy packing of
    whitespace-token counts into ``budget``-sized packs per group.

    applyInPandas buffers one GROUP per Arrow batch, so grouping by
    source alone would OOM on an unbounded source at corpus scale.
    Each source is therefore pre-sharded by contiguous doc_id range
    (``shard_docs`` docs per shard): every pandas group is bounded,
    shards pack independently in parallel, and the only cost is that
    the last pack of each shard may underfill — bounded waste of one
    pack per shard_docs docs, the standard contiguity/boundedness
    trade. pack_id embeds the shard index (stride 2^32) so ids are
    unique per source without cross-shard coordination; pack_pos stays
    dense within each pack.
    """
    tokens = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("source"),
        F.size(F.split(F.col(text_col), r"\s+")).cast("long").alias(
            "n_tokens"
        ),
        (F.col(id_col) / F.lit(shard_docs))
        .cast("long")
        .alias("_shard"),
    )
    return tokens.groupBy("source", "_shard").applyInPandas(
        _pack_group(budget), schema=PACK_SCHEMA
    )


FFD_SCHEMA = "doc_id long, shard_id long, n_tokens long, pack_id long"


def _pack_group_ffd(budget: int):
    """Kernel factory: first-fit-DECREASING packer for one shard.

    Docs are processed longest-first (ties: ascending doc_id); each
    doc lands in the LOWEST-indexed pack with enough remaining budget,
    else opens a new pack. Fully deterministic given the shard's rows
    — which is what makes the rule oracle-replayable (a recursive CTE
    walks the same order and the same first-fit scan). A doc larger
    than the budget opens its own pack whose remainder goes negative
    and never fits anything else — the same arithmetic on both sides.
    O(docs x packs) per shard, bounded because shards are bounded."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        rem: list[int] = []
        pack_ids = []
        for n in pdf["n_tokens"]:
            idx = next(
                (i for i, r in enumerate(rem) if r >= n), None
            )
            if idx is None:
                rem.append(budget - int(n))
                idx = len(rem) - 1
            else:
                rem[idx] -= int(n)
            pack_ids.append(idx + 1)
        pdf["pack_id"] = pack_ids
        return pdf[["doc_id", "shard_id", "n_tokens", "pack_id"]]

    return pack


def pack_documents_ffd(
    df: DataFrame,
    budget: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_docs: int = 400,
) -> DataFrame:
    """(doc_id, shard_id, n_tokens, pack_id): first-fit-decreasing
    packing within contiguous ``shard_docs``-sized doc_id shards.

    FFD is the classic 11/9-OPT+1 bin-packing heuristic (Johnson
    1973) — better fills than arrival-order greedy at the cost of a
    within-shard sort. The shard IS the determinism and boundedness
    unit: every pandas group holds <= shard_docs rows whatever the
    corpus size, shards pack independently in parallel (no cross-
    shard state), and pack_id is shard-local so no coordination is
    needed. Token counts use the single-space split shared with the
    length_histogram/mixture oracles so both engines count
    identically."""
    tokens = df.select(
        F.col(id_col).alias("doc_id"),
        (F.col(id_col) / F.lit(shard_docs)).cast("long").alias(
            "shard_id"
        ),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias(
            "n_tokens"
        ),
    )
    return tokens.groupBy("shard_id").applyInPandas(
        _pack_group_ffd(budget), schema=FFD_SCHEMA
    )
