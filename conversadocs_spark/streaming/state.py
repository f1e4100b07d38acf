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
