"""Streaming CDC apply: a change stream (op = U/D/I rows) merged into
a versioned snapshot table batch-by-batch — the streaming half of
plans/lake.py's MERGE lowering, closing the CDC loop (batch MERGE
applies one known batch; this consumes an endless changelog).

Exactly-once WITHOUT a transaction log, from two composable pieces:

- each commit is a NEW immutable version with an atomic marker flip
  (sources/sink.py write_versioned), so a crashed apply never leaves
  a half-merged snapshot visible;
- the merge itself is IDEMPOTENT: updates set absolute values,
  deletes remove, and inserts anti-join the existing keys ("when not
  matched") — so an at-least-once redelivered batch re-applies to a
  fixed point. tests/test_streaming.py pins both (sequential-batch
  equivalence and redelivery no-op).

Scale shape: the snapshot is scanned once per batch with the (small)
change batch broadcast — the rewrite cost a table format would bound
to affected partitions; version dirs make old snapshots time-travel
readable (index_time_travel's contract) for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHANGES_SCHEMA = (
    "c_custkey long, op string, c_name string, c_nationkey long, "
    "c_acctbal double, c_mktsegment string"
)

_PAYLOAD = ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]


def apply_cdc_batch(target: DataFrame, batch: DataFrame) -> DataFrame:
    """One MERGE: (U)pdates overwrite payload columns, (D)eletes drop
    the key, (I)nserts add rows whose key is NOT already present
    (idempotent under redelivery). Target scanned once; batch
    broadcast."""
    ud = batch.where(F.col("op") != "I").select(
        "c_custkey", "op", *[F.col(c).alias(f"new_{c}") for c in _PAYLOAD]
    )
    is_upd = F.col("op") == "U"
    merged = (
        target.join(F.broadcast(ud), "c_custkey", "left")
        .where(F.col("op").isNull() | (F.col("op") != "D"))
        .select(
            "c_custkey",
            *[
                F.when(is_upd, F.col(f"new_{c}"))
                .otherwise(F.col(c))
                .alias(c)
                for c in _PAYLOAD
            ],
        )
    )
    inserts = (
        batch.where(F.col("op") == "I")
        .select("c_custkey", *_PAYLOAD)
        .join(target.select("c_custkey"), "c_custkey", "left_anti")
    )
    return merged.unionByName(inserts)


def foreach_batch_cdc_applier(table_path: str):
    """foreachBatch kernel: latest snapshot + change batch ->
    next committed version."""
    from conversadocs_spark.sources.sink import (
        read_versioned,
        write_versioned,
    )

    def fn(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        target = read_versioned(spark, table_path)
        nxt = apply_cdc_batch(target, batch_df)
        # detach the new version's lineage from the files it read so
        # the versioned write never overwrites its own input
        write_versioned(nxt.localCheckpoint(), table_path)

    return fn
