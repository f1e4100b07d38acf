"""Streaming window/dedup operators — the incremental form of
plans/eventtime.py (same column expressions, so replaying the stream
must reproduce the batch answers; tests/test_streaming.py asserts it).

Watermarks bound state: a "1 hour" watermark means windows/sessions
older than (max event time - 1 h) are finalized and their state
dropped — at 100 TB/day this is what keeps the state store constant
instead of unbounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _value_sum() -> F.Column:
    return F.round(
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6
    ).alias("total_value")


def stream_tumbling_agg(
    events: DataFrame,
    width: str = "6 hours",
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling window counts/sums per event type (streaming form of
    plans/eventtime.window_tumbling)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width), "event_type")
        .agg(F.count("*").alias("n_events"), _value_sum())
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def stream_sliding_agg(
    events: DataFrame,
    width: str = "12 hours",
    slide: str = "6 hours",
    watermark: str = "1 hour",
) -> DataFrame:
    """Sliding window counts/sums (streaming form of window_sliding)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide))
        .agg(F.count("*").alias("n_events"), _value_sum())
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "n_events",
            "total_value",
        )
    )


def stream_session_agg(
    events: DataFrame,
    gap: str = "4 hours",
    watermark: str = "1 hour",
) -> DataFrame:
    """Session windows per user (streaming form of window_session).
    Session state merges as events arrive and finalizes once the
    watermark passes session_end — append mode emits exactly the
    closed sessions."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def stream_dedup(
    events: DataFrame,
    watermark: str = "2 hours",
) -> DataFrame:
    """Exactly-once event stream via dropDuplicatesWithinWatermark on
    event_id: duplicates arriving within the watermark horizon are
    suppressed while state stays bounded (ids older than the watermark
    are forgotten — the at-scale contract for ingest retries)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def foreach_batch_index_writer(index_dir: str):
    """foreachBatch sink (reference R19's closest Spark analog,
    llamacppmodels.py:256-305 streaming emission; SURVEY §2A maps it to
    "closest analog foreachBatch"): each micro-batch lands as one
    idempotent parquet partition ``batch_id=N`` under ``index_dir``.

    Idempotency contract: foreachBatch may redeliver a batch after
    failure WITH THE SAME batch_id — overwrite-by-partition makes the
    retry a no-op instead of a duplicate (the same
    overwrite-not-append reasoning as the R7/R8 batch index rebuild in
    sources/sink.py, applied incrementally). Readers see the growing
    index as plain partitioned parquet.
    """

    def write(batch_df, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option(
                "partitionOverwriteMode", "dynamic"
            )  # replace only this batch's partition on retry
            .partitionBy("batch_id")
            .parquet(index_dir)
        )

    return write


def stream_interval_join(
    events: DataFrame,
    window_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join (streaming form of
    plans/eventtime.join_interval_attrib): every click within the
    attribution window before a same-user purchase, both sides
    watermarked so the engine can bound join state — a click's state
    is droppable once the watermark passes click_ts + window (the
    time-bound condition is what makes an unbounded stream-stream
    join finite-state; without it Spark rejects the plan in append
    mode). The two sides are filters of ONE source stream — the
    standard fan-out-then-join topology."""
    c = events.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("c_ts"),
    ).withWatermark("c_ts", watermark)
    p = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    ).withWatermark("p_ts", watermark)
    joined = c.join(
        p,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (
            F.col("p_ts")
            <= F.col("c_ts")
            + F.expr(f"INTERVAL {window_minutes} MINUTES")
        ),
    )
    return joined.select(
        "click_id",
        "purchase_id",
        "user_id",
        (
            F.unix_micros(F.col("p_ts").cast("timestamp"))
            - F.unix_micros(F.col("c_ts").cast("timestamp"))
        ).alias("micros_between"),
    )


def foreach_batch_hll_merger(table_path: str):
    """foreachBatch kernel maintaining a per-event-type HLL sketch
    table: each micro-batch is sketched (bytes, not user sets) and
    UNIONED into the stored sketches, committed as a new immutable
    version (sources/sink.py write_versioned — atomic marker flip).

    Redelivery-safe BY ALGEBRA, not bookkeeping: HLL union is a
    register-wise max, so re-merging an already-merged batch is a
    no-op — the sketch table needs no batch_id dedup to stay exactly
    correct under at-least-once delivery. This is the streaming form
    of `agg_hll_mergeable`'s build-then-union contract: stored blobs
    absorb increments without rescanning history, the property that
    matters when history is 100 TB."""
    from pyspark.sql import functions as F

    from conversadocs_spark.sources.sink import (
        read_versioned,
        write_versioned,
    )

    def fn(batch_df, batch_id: int) -> None:
        import os

        from conversadocs_spark.sources.sink import _LATEST_MARKER

        spark = batch_df.sparkSession
        bsk = batch_df.groupBy("event_type").agg(
            F.hll_sketch_agg("user_id", 12).alias("sketch")
        )
        # First-batch detection must be EXPLICIT (marker existence),
        # not a bare except: a transient read failure (FS error,
        # corrupt file, schema mismatch) swallowed as "first batch"
        # would silently replace the accumulated sketch table with
        # just the current batch. Real read errors now propagate so
        # the micro-batch fails and retries instead of committing a
        # truncated table.
        if os.path.exists(os.path.join(table_path, _LATEST_MARKER)):
            prev = read_versioned(spark, table_path)
            merged = (
                prev.unionByName(bsk)
                .groupBy("event_type")
                .agg(
                    F.hll_union_agg("sketch", F.lit(False)).alias(
                        "sketch"
                    )
                )
            )
        else:  # first batch: no committed version yet
            merged = bsk
        # K-row table (one per event type): localCheckpoint detaches
        # the new version from the previous version's files before the
        # overwrite-free versioned write
        write_versioned(merged.localCheckpoint(), table_path)

    return fn


def foreach_batch_decay_merger(
    table_path: str, tau_s: float = 604800.0
):
    """foreachBatch kernel maintaining a per-user TIME-DECAYED
    engagement state table — the incremental form
    `decayed_engagement`'s docstring promises: state is
    (user_id, anchor_us, wsum, n_events) where wsum =
    sum(value * exp(-(anchor - ts)/tau)) referenced to the user's own
    latest event. The decay merge is ASSOCIATIVE: to fold a batch in,
    advance the anchor to the max of both sides and rescale each
    side's wsum by exp(-delta/tau) — exactly "multiply yesterday's
    score by the elapsed decay and add today's partial". No history
    rescan, state is one row per user.

    Redelivery safety: unlike the HLL merger (idempotent by register-
    max algebra), a decay merge applied twice DOUBLE-COUNTS, so the
    applied batch_id is stamped into the version manifest and a
    redelivered batch (batch_id <= last applied) is skipped — the
    standard foreachBatch transactional-sink recipe, here riding the
    versioned table's atomic marker flip as the commit point."""
    from pyspark.sql import functions as F

    def fn(batch_df, batch_id: int) -> None:
        import os

        from conversadocs_spark.sources.sink import (
            _LATEST_MARKER,
            read_manifest,
            read_versioned,
            write_versioned,
        )

        spark = batch_df.sparkSession
        tau_us = tau_s * 1e6
        has_prev = os.path.exists(
            os.path.join(table_path, _LATEST_MARKER)
        )
        if has_prev:
            m = read_manifest(table_path)
            if m is not None and batch_id <= m.get(
                "applied_batch_id", -1
            ):
                return  # redelivered micro-batch: already folded in
        ev = batch_df.select(
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias(
                "ts_us"
            ),
            "value",
        )
        anchors = ev.groupBy("user_id").agg(
            F.max("ts_us").alias("b_anchor")
        )
        bstate = (
            ev.join(anchors, "user_id")
            .groupBy("user_id")
            .agg(
                F.max("b_anchor").alias("anchor_us"),
                F.count("*").cast("long").alias("n_events"),
                F.sum(
                    F.col("value")
                    * F.exp(
                        -(
                            F.col("b_anchor") - F.col("ts_us")
                        ).cast("double")
                        / F.lit(tau_us)
                    )
                ).alias("wsum"),
            )
        )
        if has_prev:
            prev = read_versioned(spark, table_path).select(
                "user_id",
                F.col("anchor_us").alias("pa"),
                F.col("wsum").alias("pw"),
                F.col("n_events").alias("pn"),
            )
            b = bstate.select(
                "user_id",
                F.col("anchor_us").alias("ba"),
                F.col("wsum").alias("bw"),
                F.col("n_events").alias("bn"),
            )
            floor = F.lit(-(2**62)).cast("long")
            na = F.greatest(
                F.coalesce("pa", floor), F.coalesce("ba", floor)
            )
            scale = lambda a, w: F.coalesce(  # noqa: E731
                F.col(w)
                * F.exp(
                    -(na - F.col(a)).cast("double") / F.lit(tau_us)
                ),
                F.lit(0.0),
            )
            merged = (
                prev.join(b, "user_id", "full_outer")
                .select(
                    "user_id",
                    na.alias("anchor_us"),
                    (scale("pa", "pw") + scale("ba", "bw")).alias(
                        "wsum"
                    ),
                    (
                        F.coalesce("pn", F.lit(0))
                        + F.coalesce("bn", F.lit(0))
                    ).cast("long").alias("n_events"),
                )
            )
        else:  # first batch: no committed version yet
            merged = bstate
        write_versioned(
            merged.localCheckpoint(),
            table_path,
            manifest={"applied_batch_id": batch_id},
        )

    return fn
