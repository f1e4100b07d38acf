"""Text kernels: recursive chunk splitting + tokenization + heuristics.

``chunk_text`` re-implements the *semantics* of the reference's
splitter (RecursiveCharacterTextSplitter(chunk_size=1000,
chunk_overlap=150), /root/reference/conversadocs/bones.py:67-68, and
the summarize variant 2000/100 with sentence-aware separators,
bones.py:160-165): recursively split on a separator cascade, then
greedily pack fragments into chunks of at most ``chunk_size`` chars
with ``overlap`` chars carried between consecutive chunks. It is a
pure function of (text, size, overlap, separators) — the determinism
the oracle/golden tests rely on (SURVEY.md §7 "hard parts").

This is an original implementation; only the operator'S contract
(separator cascade, size cap, tail overlap, metadata inheritance)
mirrors the reference.
"""

from __future__ import annotations

import re

DEFAULT_SEPARATORS: tuple[str, ...] = ("\n\n", "\n", " ", "")
# summarize variant (bones.py:163): sentence-aware lookbehind split
SENTENCE_SEPARATORS: tuple[str, ...] = ("\n\n", "\n", r"(?<=\. )", " ", "")

# separators containing regex metachars are treated as patterns
_REGEX_SEP = re.compile(r"[\\^$.|?*+()\[\]{}]")


def _split_on(text: str, sep: str) -> list[str]:
    """Split keeping the separator attached to the preceding fragment,
    so that re-joining fragments reproduces the original text."""
    if sep == "":
        return list(text)
    if _REGEX_SEP.search(sep):
        parts = re.split(f"({sep})", text)
        # re.split with a captured group interleaves separators; for
        # lookbehind patterns the captures are empty strings.
        merged: list[str] = []
        for p in parts:
            if p == "":
                continue
            merged.append(p)
        return merged
    pieces = text.split(sep)
    out = [p + sep for p in pieces[:-1]]
    if pieces[-1]:
        out.append(pieces[-1])
    return out


def chunk_text(
    text: str,
    chunk_size: int = 1000,
    overlap: int = 150,
    separators: tuple[str, ...] = DEFAULT_SEPARATORS,
) -> list[str]:
    """Recursively split ``text`` into chunks of <= ``chunk_size`` chars
    with ~``overlap`` chars of tail carried into the next chunk.

    Algorithm: produce atomic fragments no longer than chunk_size by
    recursing down the separator cascade, then greedily pack fragments
    left-to-right; when a chunk closes, seed the next one with the
    closing chunk's last ``overlap`` characters.
    """
    if not text:
        return []
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")

    fragments = _fragment(text, chunk_size, separators)

    chunks: list[str] = []
    cur = ""
    for frag in fragments:
        if cur and len(cur) + len(frag) > chunk_size:
            chunks.append(cur)
            tail = cur[-overlap:] if overlap else ""
            cur = tail
            # never let the seed alone exceed the cap
            while len(cur) + len(frag) > chunk_size and cur:
                cur = cur[1:]
        cur += frag
    if cur.strip():
        chunks.append(cur)
    return chunks


def _fragment(
    text: str, chunk_size: int, separators: tuple[str, ...]
) -> list[str]:
    """Atomic fragments each <= chunk_size, splitting with the first
    separator that produces progress and recursing on oversized parts."""
    if len(text) <= chunk_size:
        return [text]
    for i, sep in enumerate(separators):
        parts = _split_on(text, sep)
        if len(parts) == 1:
            continue
        out: list[str] = []
        rest = separators[i + 1 :] or ("",)
        for p in parts:
            if len(p) <= chunk_size:
                out.append(p)
            else:
                out.extend(_fragment(p, chunk_size, rest))
        return out
    # no separator made progress: hard cut
    return [
        text[i : i + chunk_size] for i in range(0, len(text), chunk_size)
    ]


# ---------------------------------------------------------------------------
# language-ID stopword tables (tiny, public-knowledge function words)
# ---------------------------------------------------------------------------

STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "des", "du", "que"),
    "es": ("el", "la", "los", "las", "y", "es", "un", "una", "de", "que"),
    "zh": ("的", "了", "是", "我", "不", "在", "他", "有", "这", "个"),
}

# BPE-ish token pattern: letter runs, digit runs, single other non-space
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Ship this module BY VALUE inside UDF closures (see serde.py: workers
# may not be able to import the package by path).
from conversadocs_spark.serde import pickle_module_by_value

pickle_module_by_value(__name__)


def bigram_array(t):
    """Word 2-gram array from a token-array column — shared by
    gopher_repetition and the bigram LM (plans/text.py, plans/lm.py).
    Guards the single-token case: Spark's sequence(1, 0) is DESCENDING
    [1, 0] (not empty like DuckDB's range(1, 1)), which would emit
    bogus grams for one-token documents."""
    from pyspark.sql import functions as F

    return F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(t, i), F.element_at(t, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
