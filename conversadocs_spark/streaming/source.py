"""Streaming ingest of the ``events`` fixture (SURVEY §2B "streaming
ingest"): a parquet file-stream source, plus a staging helper that
splits the fixture into time-ordered files so tests can replay it in
multiple micro-batches (``maxFilesPerTrigger=1``).

Timestamps: the staged files carry ``ts`` as epoch MICROSECOND longs
(Spark's default parquet timestamp output is INT96, which a long-typed
stream schema can't read back — and the original fixture is
TIMESTAMP(NANOS), which Spark rejects outright). The stream source
reads the long and rebuilds the timestamp with ``timestamp_micros``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# schema with ts as long (epoch micros) — converted after read
EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def stage_events_files(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_files: int = 3,
    duplicate_rows: bool = False,
) -> str:
    """Split events into ``n_files`` time-ordered parquet files under
    ``out_dir`` — simulating an append-only ingest directory where
    files arrive in event-time order (so watermarks advance
    monotonically during replay). With ``duplicate_rows`` every slice
    contains each row twice (the ingest-retry shape stream_dedup must
    suppress). Returns ``out_dir``."""
    from conversadocs_spark import io

    ev = io.table(spark, sf_dir, "events")
    # ntile over ts gives n_files contiguous time ranges
    from pyspark.sql import Window

    ranked = ev.withColumn(
        "_slice",
        F.ntile(n_files).over(
            Window.orderBy(F.asc("ts"), F.asc("event_id"))
        ),
    ).withColumn(
        # cast first: the driver's parquet writes ts as TIMESTAMP or
        # TIMESTAMP_NTZ depending on generation round, and unix_micros
        # only accepts the former. Session tz is pinned to UTC, so the
        # NTZ->TZ cast is a deterministic identity on the wall clock.
        "ts",
        F.unix_micros(F.col("ts").cast("timestamp")),
    )
    os.makedirs(out_dir, exist_ok=True)
    for i in range(1, n_files + 1):
        part = ranked.where(F.col("_slice") == i).drop("_slice")
        if duplicate_rows:
            part = part.unionAll(part)
        (
            part.coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{out_dir}/slice={i:03d}")
        )
    return out_dir


def read_events_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-stream over an events directory (one micro-batch per file
    with the default trigger setting).

    ``path`` may be a staged directory from ``stage_events_files`` or
    any directory of events-schema parquet files.
    """
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(path)
    )
    return raw.withColumn("ts", F.expr("timestamp_micros(ts)"))


def stage_events_with_sentinels(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_files: int = 3,
) -> str:
    """``stage_events_files`` plus two far-future sentinel events
    (user_id = -1) as trailing micro-batches. Event-time timeouts only
    FIRE when the watermark passes them, and the watermark only
    advances on rows that REACH the watermark node — so (a) the
    sentinel must survive any upstream user filter (keep ``user_id <
    N`` forms, not ``between(0, N)``), and (b) a second sentinel batch
    is needed because timeouts armed in the batch that advanced the
    watermark fire one trigger LATER. Sessions for user -1 are the
    caller's to drop."""
    from conversadocs_spark import io

    stage_events_files(spark, sf_dir, out_dir, n_files=n_files)
    mx = (
        io.table(spark, sf_dir, "events")
        .agg(F.max(F.unix_micros(F.col("ts").cast("timestamp"))))
        .first()[0]
    )
    for i, off in ((n_files + 1, 10**12), (n_files + 2, 2 * 10**12)):
        spark.createDataFrame(
            [(10**9 + i, mx + off, -1, "sentinel", 0.0, "{}")],
            "event_id long, ts long, user_id long, event_type string, "
            "value double, props string",
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{out_dir}/slice={i:03d}"
        )
    return out_dir
