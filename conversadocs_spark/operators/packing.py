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
