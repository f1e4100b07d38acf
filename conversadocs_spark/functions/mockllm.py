"""Deterministic mock-LLM column expressions.

The reference's LLM calls (R10 condense, R11 stuff-answer, R14
map-reduce summarize, R18 generate — /root/reference/conversadocs/
bones.py:77-87,146-169, llamacppmodels.py:217-254) are non-deterministic
model invocations and therefore excluded from the hash-checked oracle
surface (SURVEY.md §5.2 determinism rule). These stand-ins preserve the
*dataflow contract* of each call site — output depends on exactly the
inputs the real call would see — while being pure Catalyst expressions
(sha2 + substring + concat), so composed pipelines stay oracle-checkable
end to end and run JVM-side at full codegen speed.

Swapping in a real model means replacing one of these with an
Arrow-batched ``pandas_udf`` of the same signature; the surrounding plan
(broadcast joins, stuff aggregation, hierarchical reduce) is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def mock_condense(history: Column, question: Column) -> Column:
    """R10 question condensation: (chat_history, follow-up) ->
    standalone ``generated_question``.

    Mirrors the contract that the *retrieval key* depends on both the
    history and the raw question (bones.py:80-86): first 40 chars of
    the normalized question plus an 8-hex digest of history|question.
    """
    return F.concat(
        F.substring(F.lower(F.trim(question)), 1, 40),
        F.lit(" #"),
        F.substring(
            F.sha2(F.concat_ws("|", history, question), 256), 1, 8
        ),
    )


def mock_answer(generated_question: Column, context: Column) -> Column:
    """R11/R18 "stuff" answer: single LLM call over (question + stuffed
    context) -> answer. Digest binds the answer to both inputs."""
    return F.concat(
        F.lit("ANSWER["),
        F.substring(
            F.sha2(
                F.concat(generated_question, F.lit("\n"), context), 256
            ),
            1,
            16,
        ),
        F.lit("]"),
    )


def mock_summarize(text: Column) -> Column:
    """R14 map/combine summarizer: text -> short summary token.

    Output length is constant (12 chars), mirroring the real chain's
    property that summaries shrink the payload — which is what makes
    the hierarchical reduce terminate.
    """
    return F.concat(
        F.lit("S("), F.substring(F.sha2(text, 256), 1, 8), F.lit(")")
    )


# Matching DuckDB SQL fragment builders (keep in sync with the above).

def sql_mock_condense(history: str, question: str) -> str:
    return (
        f"concat(substring(lower(trim({question})), 1, 40), ' #', "
        f"substring(sha256(concat_ws('|', {history}, {question})), 1, 8))"
    )


def sql_mock_answer(generated_question: str, context: str) -> str:
    return (
        f"concat('ANSWER[', substring(sha256(concat({generated_question}, "
        f"chr(10), {context})), 1, 16), ']')"
    )


def sql_mock_summarize(text: str) -> str:
    return f"concat('S(', substring(sha256({text}), 1, 8), ')')"
