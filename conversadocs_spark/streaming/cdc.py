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

Multiple ops for ONE key in ONE micro-batch are routine in real CDC
(and ``availableNow`` can coalesce several files into a single
batch), so the merge first collapses each key's op sequence to its
NET effect with an exact two-state fold (see ``_net_effects``) —
``I→U`` nets to an insert of the updated payload, ``U→D`` nets to a
delete, ``D→I`` to a replacement, etc. Op order comes from a ``seq``
column when the changelog carries one (an LSN / Kafka offset in real
pipelines); otherwise batch row order is used as a documented
fallback.

Scale shape: the snapshot is scanned once per batch with the (small)
change batch broadcast — the rewrite cost a table format would bound
to affected partitions; version dirs make old snapshots time-travel
readable (index_time_travel's contract) for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CHANGES_SCHEMA = (
    "c_custkey long, op string, c_name string, c_nationkey long, "
    "c_acctbal double, c_mktsegment string"
)

_PAYLOAD = ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]


def _net_effects(batch: DataFrame, seq_col: str) -> DataFrame:
    """Collapse each key's op sequence to its net effect.

    Folds the seq-ordered ops per key through TWO simulations at once
    — one assuming the key is present in the target, one assuming it
    is absent — because the batch alone can't know. Each simulation
    tracks ``(alive, payload)`` where a null payload means "the
    target's original row" (only possible while no U/I has fired):

    - ``D``  -> alive := false
    - ``U``  -> payload := op payload   (only while alive)
    - ``I``  -> alive := true, payload := op payload (only while dead)

    Pure Catalyst (sort_array + aggregate over a collect_list of
    structs): one shuffle on the key, no Python. Returns one row per
    key: ``(key, p_alive, p_pay, a_alive, a_pay)`` consumed by
    :func:`apply_cdc_batch` — present keys use the ``p_*`` outcome,
    absent keys the ``a_*`` outcome.
    """
    pay_t = T.StructType(
        [batch.schema[c] for c in _PAYLOAD]
    )
    ops = F.sort_array(
        F.collect_list(
            F.struct(
                F.col(seq_col).alias("seq"),
                F.col("op").alias("op"),
                F.struct(*_PAYLOAD).alias("pay"),
            )
        )
    )

    def branch(x, alive, pay):
        is_d, is_u, is_i = (x["op"] == v for v in ("D", "U", "I"))
        new_alive = (
            F.when(is_d, F.lit(False))
            .when(is_i & ~alive, F.lit(True))
            .otherwise(alive)
        )
        new_pay = (
            F.when(is_d, F.lit(None).cast(pay_t))
            .when(is_u & alive, x["pay"])
            .when(is_i & ~alive, x["pay"])
            .otherwise(pay)
        )
        return new_alive, new_pay

    def step(acc, x):
        pa, pp = branch(x, acc["pa"], acc["pp"])
        aa, ap = branch(x, acc["aa"], acc["ap"])
        return F.struct(
            pa.alias("pa"), pp.alias("pp"),
            aa.alias("aa"), ap.alias("ap"),
        )

    zero = F.struct(
        F.lit(True).alias("pa"),
        F.lit(None).cast(pay_t).alias("pp"),
        F.lit(False).alias("aa"),
        F.lit(None).cast(pay_t).alias("ap"),
    )
    return batch.groupBy("c_custkey").agg(
        F.aggregate(ops, zero, step).alias("net")
    ).select(
        "c_custkey",
        F.col("net.pa").alias("p_alive"),
        F.col("net.pp").alias("p_pay"),
        F.col("net.aa").alias("a_alive"),
        F.col("net.ap").alias("a_pay"),
    )


def apply_cdc_batch(
    target: DataFrame, batch: DataFrame, seq_col: str = "seq"
) -> DataFrame:
    """One MERGE of a micro-batch's NET effect per key: (U)pdates
    overwrite payload columns, (D)eletes drop the key, (I)nserts add
    rows whose key is NOT already present (idempotent under
    redelivery). Multi-op keys are first collapsed by
    :func:`_net_effects` in ``seq_col`` order — if the batch has no
    such column, arrival row order within the batch is used (real
    changelogs should carry an explicit LSN/offset). Target scanned
    once; batch broadcast."""
    if seq_col not in batch.columns:
        # Fallback ordering: monotonically_increasing_id follows row
        # order within a partition and partition (= file) order across
        # them — correct for the one-file-per-trigger staging and for
        # availableNow coalescing whole files in listing order.
        batch = batch.withColumn(seq_col, F.monotonically_increasing_id())
    net = _net_effects(batch, seq_col)
    merged = (
        target.join(F.broadcast(net), "c_custkey", "left")
        # keys untouched by the batch, or whose present-state fold
        # survives (covers D→I replacement: p_alive with concrete pay)
        .where(F.col("p_alive").isNull() | F.col("p_alive"))
        .select(
            "c_custkey",
            # null p_pay = "keep the original row" (no U/I fired)
            *[
                F.coalesce(F.col(f"p_pay.{c}"), F.col(c)).alias(c)
                for c in _PAYLOAD
            ],
        )
    )
    inserts = (
        net.where(F.col("a_alive"))
        .select(
            "c_custkey",
            *[F.col(f"a_pay.{c}").alias(c) for c in _PAYLOAD],
        )
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
