"""Structured Streaming surface (SURVEY §2B phase 4).

The reference's incremental analog is conversation/session state
(/root/reference/conversadocs/bones.py:92,140,275-277: history appended
per turn, cleared per session). This package provides the engine's
streaming operators over the ``events`` stream:

    source.py   file-stream source (+ staged multi-batch replay helper)
    ops.py      tumbling/sliding/session windows, watermarks,
                dropDuplicatesWithinWatermark — same column expressions
                as the batch plans in plans/eventtime.py
    state.py    applyInPandasWithState session chat (R10/R12)

Verification model: streaming runs aren't SQL-expressible, so
correctness is established by deterministic replay — the same rows
streamed in N micro-batches must reproduce the batch plan's answer
(tests/test_streaming.py).
"""

from conversadocs_spark.streaming.ops import (  # noqa: F401
    stream_dedup,
    stream_session_agg,
    stream_sliding_agg,
    stream_tumbling_agg,
)
from conversadocs_spark.streaming.source import (  # noqa: F401
    read_events_stream,
    stage_events_files,
)
