"""Stateful session chat over a stream — the reference's conversation
memory (R10/R12: chat_history list per session, appended each turn,
bones.py:92,140; cleared at bones.py:275-277) as an
``applyInPandasWithState`` operator keyed by user.

Each incoming event is a "turn": the answer digest depends on the
question AND the accumulated history digest (the property that makes
conversational retrieval different from stateless retrieval), and the
state carries (turn counter, history digest) across micro-batches.
Deterministic: replaying the same events in any micro-batch slicing
yields identical output (tests/test_streaming.py asserts 1-batch ==
3-batch replay).

State size is O(1) per user (a counter and a 16-hex digest) — the
at-scale contract: memory does not grow with turns, unlike the
reference's unbounded in-RAM history list.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from conversadocs_spark.serde import pickle_module_by_value

OUTPUT_SCHEMA = (
    "user_id long, event_id long, turn int, question string, answer string"
)
STATE_SCHEMA = "turn int, hist string"


def _digest(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()[:16]


def chat_turn(
    turn: int, hist: str, question: str, reset: bool
) -> tuple[int, str, str]:
    """One conversation step: (turn, hist) x (question, reset?) ->
    (turn', hist', answer). The SINGLE definition of the R12 state
    transition — the streaming operator and the test's batch twin both
    call it, so replay-equals-batch checks pin values, not just counts.

    ``reset`` mirrors the reference's two history-clear paths
    (``recall_previous_messages=False`` -> ``clr_history()``,
    bones.py:129-130, and the explicit clear button, bones.py:275-277):
    history empties BEFORE the question is answered, exactly like
    ``clr_history`` running ahead of ``convchain``'s QA call; the turn
    counter keeps counting (it is engine bookkeeping, not history)."""
    if reset:
        hist = ""
    turn += 1
    answer = f"ANSWER[{_digest(question + chr(10) + hist)}]"
    hist = _digest(f"{hist}|{question}|{answer}")
    return turn, hist, answer


def _make_chat_fn(reset_type: str | None):
    def _chat_fn(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            turn, hist = state.get
        else:
            turn, hist = 0, ""
        out: list[dict] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for _, row in pdf.iterrows():
                reset = (
                    reset_type is not None
                    and str(row["event_type"]) == reset_type
                )
                question = str(row["props"])
                turn, hist, answer = chat_turn(
                    turn, hist, question, reset
                )
                out.append(
                    {
                        "user_id": user_id,
                        "event_id": row["event_id"],
                        "turn": turn,
                        "question": question,
                        "answer": answer,
                    }
                )
        state.update((turn, hist))
        yield pd.DataFrame(
            out,
            columns=["user_id", "event_id", "turn", "question", "answer"],
        )

    return _chat_fn


def session_chat(
    events: DataFrame, reset_type: str | None = None
) -> DataFrame:
    """Per-user stateful chat over an event stream (streaming DF in,
    streaming DF out). Turns are ordered by (ts, event_id) within each
    micro-batch and the counter persists across batches. Events whose
    ``event_type`` equals ``reset_type`` clear the conversation
    history before being answered (the reference's clr_history,
    bones.py:275-277)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _make_chat_fn(reset_type),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


pickle_module_by_value(__name__)


def advance_session(
    secs: list[int],
    start: int | None,
    last: int | None,
    n: int,
    gap_s: int,
) -> tuple[list[tuple[int, int, int]], int, int, int]:
    """The ONE definition of the inactivity-gap session transition:
    fold sorted event epoch-seconds into (closed_sessions, open
    start/last/n). Both stateful APIs — applyInPandasWithState
    (timeout_sessions) and transformWithState
    (timeout_sessions_tws) — call this, so their parity is by
    construction and the env-gated new-API test only exercises the
    API wiring, not a second kernel."""
    closed: list[tuple[int, int, int]] = []
    for s in secs:
        s = int(s)
        if last is not None and s - last > gap_s:
            closed.append((start, last, n))
            start, n = None, 0
        if start is None:
            start = s
        n += 1
        last = s
    return closed, start, last, n


def timeout_sessions(
    events: DataFrame,
    gap_s: int = 1800,
    watermark: str = "1 second",
) -> DataFrame:
    """Inactivity-timeout sessionization via ``applyInPandasWithState``
    + ``EventTimeTimeout`` — the ONLY mechanism that can emit a session
    when the user goes quiet (no further event ever arrives to trigger
    the close; the watermark passing ``last_event + gap`` does). Emits
    one row per CLOSED session: (user_id, session_start, session_end,
    n_events), epoch seconds.

    Semantics contract: identical session boundaries to the batch
    gaps-and-islands `sessionize` (a > gap_s inactivity gap splits),
    pinned by tests/test_streaming.py replay-equals-batch. Within a
    micro-batch the kernel splits greedily on the sorted timestamps;
    across batches the open session rides in state; the timeout
    timestamp is re-armed to ``last + gap`` on every update.

    Scale: state per user is three longs; eviction is driven by the
    watermark, so abandoned users cost nothing after their timeout
    fires — the property session_window (which buffers windows, not
    three-scalar summaries) does not give a custom aggregate."""

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        uid = key[0]

        def row(start: int, last: int, n: int) -> pd.DataFrame:
            return pd.DataFrame(
                [
                    {
                        "user_id": uid,
                        "session_start": start,
                        "session_end": last,
                        "n_events": n,
                    }
                ]
            )

        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield row(start, last, n)
            return
        ev = pd.concat(list(pdfs))
        secs = sorted(
            ev["ts"].astype("datetime64[ns]").astype("int64")
            // 1_000_000_000
        )
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        closed, start, last, n = advance_session(
            secs, start, last, n, gap_s
        )
        state.update((start, last, n))
        state.setTimeoutTimestamp((last + gap_s) * 1000)
        for c in closed:
            yield row(*c)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=(
                "user_id long, session_start long, session_end long, "
                "n_events int"
            ),
            stateStructType="start long, last long, n int",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def timeout_sessions_tws(
    events: DataFrame,
    gap_s: int = 1800,
    watermark: str = "1 second",
) -> DataFrame:
    """`timeout_sessions` on Spark 4's ``transformWithState`` — the
    successor stateful API (SPARK-49564: named state variables, timer
    registry, per-key lifecycle hooks) that the session/chat state
    class migrates onto (VERDICT r10 #6 future-proofing).

    IDENTICAL semantics to timeout_sessions by construction: both
    fold events through `advance_session`, the single definition of
    the inactivity-gap transition; the only new surface is the API
    wiring — a ValueState named "sess" instead of the positional
    state tuple, and an explicit timer registry (delete stale timer,
    re-arm at last+gap on every update) instead of
    ``setTimeoutTimestamp``'s implicit single slot.

    ENVIRONMENT boundary: transformWithState's Python worker speaks a
    protobuf protocol to the JVM state server, so it needs
    ``google.protobuf`` at runtime — not installed in this sandbox
    (and installs are off-limits), the same documented boundary as
    the real embedding model (SURVEY §5.2). The parity test
    (tests/test_streaming.py) therefore importorskips protobuf: it
    runs green wherever the dependency exists and records the skip
    here. The plan construction below is dependency-free; only
    query START needs protobuf.
    """
    import pandas as pd  # noqa: F811 — self-contained for pickling
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap = gap_s

    class _TimeoutSessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.handle = handle
            self.state = handle.getValueState(
                "sess", "start long, last long, n int"
            )

        def handleInputRows(self, key, rows, timerValues):
            uid = key[0]
            ev = pd.concat(list(rows))
            secs = sorted(
                ev["ts"].astype("datetime64[ns]").astype("int64")
                // 1_000_000_000
            )
            if self.state.exists():
                start, last, n = self.state.get()
            else:
                start, last, n = None, None, 0
            closed, start, last, n = advance_session(
                secs, start, last, n, gap
            )
            self.state.update((start, last, n))
            # explicit timer registry: drop the previous arm, re-arm
            # at the new inactivity deadline (EventTimeTimeout's
            # setTimeoutTimestamp did this implicitly — one slot)
            for t in self.handle.listTimers():
                self.handle.deleteTimer(t)
            self.handle.registerTimer((last + gap) * 1000)
            if closed:
                yield pd.DataFrame(
                    [
                        {
                            "user_id": uid,
                            "session_start": a,
                            "session_end": b,
                            "n_events": c,
                        }
                        for (a, b, c) in closed
                    ]
                )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            uid = key[0]
            if self.state.exists():
                start, last, n = self.state.get()
                self.state.clear()
                yield pd.DataFrame(
                    [
                        {
                            "user_id": uid,
                            "session_start": int(start),
                            "session_end": int(last),
                            "n_events": int(n),
                        }
                    ]
                )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_TimeoutSessionProcessor(),
            outputStructType=(
                "user_id long, session_start long, session_end long, "
                "n_events int"
            ),
            outputMode="append",
            timeMode="eventTime",
        )
    )
