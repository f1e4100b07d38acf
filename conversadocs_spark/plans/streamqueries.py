"""Driver-visible STREAMING queries (rows-only): each stages the
events fixture into time-ordered files, replays it through a real
``readStream`` pipeline with Trigger.AvailableNow into a memory sink,
and returns the materialized result.

Rows-only because a streaming runtime isn't SQL-expressible — but each
pipeline's *semantics* are hash-checked via its batch twin
(plans/eventtime.py), and tests/test_streaming.py asserts
stream-replay == batch on the same data. Together those give the
strongest available correctness story for the streaming surface.

Staging/checkpoints live under the repo's .stream_stage/ scratch dir
(gitignored); memory-sink table names are unique per invocation so the
driver can call each query repeatedly.
"""

from __future__ import annotations

import itertools
import os

from pyspark.sql import DataFrame, SparkSession

from conversadocs_spark.plans.registry import register
from conversadocs_spark.streaming.ops import (
    stream_dedup,
    stream_tumbling_agg,
)
from conversadocs_spark.streaming.source import (
    read_events_stream,
    stage_events_files,
)
from conversadocs_spark.streaming.state import session_chat

_STAGE_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".stream_stage",
)
_COUNTER = itertools.count()


def _stage(spark: SparkSession, sf_dir: str, duplicate_rows: bool) -> str:
    tag = os.path.basename(sf_dir.rstrip("/")) + (
        "_dup" if duplicate_rows else ""
    )
    out = os.path.join(_STAGE_ROOT, tag)
    return stage_events_files(
        spark, sf_dir, out, n_files=3, duplicate_rows=duplicate_rows
    )


def _replay(stream_df: DataFrame, mode: str) -> DataFrame:
    """Run the streaming DF to completion (AvailableNow) into a memory
    sink; return the sink contents as a batch DataFrame."""
    name = f"replay_{os.getpid()}_{next(_COUNTER)}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


@register("streaming_tumbling_replay", tags=("streaming", "rows-only"))
def streaming_tumbling_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation over a 3-micro-batch file-stream
    replay of events (complete mode: every window's final value).
    Batch twin (hash-checked): window_tumbling."""
    path = _stage(spark, sf_dir, duplicate_rows=False)
    ev = read_events_stream(spark, path)
    return _replay(stream_tumbling_agg(ev), "complete")


@register("streaming_dedup_replay", tags=("streaming", "rows-only"))
def streaming_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark over a replay where EVERY row
    arrives twice (ingest-retry duplicates): output must equal the
    distinct event set. Append mode — rows emit exactly once."""
    path = _stage(spark, sf_dir, duplicate_rows=True)
    ev = read_events_stream(spark, path)
    return _replay(stream_dedup(ev), "append")


@register("streaming_session_chat", tags=("streaming", "rows-only"))
def streaming_session_chat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState session chat (R10/R12): per-user turn
    counter + history digest carried across micro-batches; every event
    becomes a turn whose answer depends on the accumulated history."""
    path = _stage(spark, sf_dir, duplicate_rows=False)
    ev = read_events_stream(spark, path)
    return _replay(session_chat(ev), "append")


@register("streaming_foreachbatch_sink", tags=("streaming", "rows-only"))
def streaming_foreachbatch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch incremental index build (R19 analog + R7/R8
    lifecycle, incremental form): the 3-micro-batch events replay is
    written batch-by-batch into a parquet index partitioned by
    batch_id (idempotent overwrite-per-partition — a redelivered batch
    replaces itself instead of duplicating). Returns the re-read
    index; rows must equal the staged input
    (tests/test_streaming.py::test_foreachbatch_sink_idempotent also
    re-delivers a batch and asserts no duplication)."""
    import shutil

    from conversadocs_spark.streaming.ops import (
        foreach_batch_index_writer,
    )

    path = _stage(spark, sf_dir, duplicate_rows=False)
    tag = os.path.basename(sf_dir.rstrip("/"))
    index_dir = os.path.join(_STAGE_ROOT, f"fb_index_{tag}")
    ckpt = os.path.join(
        _STAGE_ROOT, f"fb_ckpt_{tag}_{os.getpid()}_{next(_COUNTER)}"
    )
    shutil.rmtree(index_dir, ignore_errors=True)
    ev = read_events_stream(spark, path)
    q = (
        ev.writeStream.foreachBatch(foreach_batch_index_writer(index_dir))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(index_dir)
