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
            turn += 1
            question = str(row["props"])
            answer = f"ANSWER[{_digest(question + chr(10) + hist)}]"
            hist = _digest(f"{hist}|{question}|{answer}")
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


def session_chat(events: DataFrame) -> DataFrame:
    """Per-user stateful chat over an event stream (streaming DF in,
    streaming DF out). Turns are ordered by (ts, event_id) within each
    micro-batch and the counter persists across batches."""
    return events.groupBy("user_id").applyInPandasWithState(
        _chat_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


pickle_module_by_value(__name__)
