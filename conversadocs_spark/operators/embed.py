"""Embed + token-count operators (reference R6/R17).

The reference embeds chunks with a sentence-transformer
(``HuggingFaceEmbeddings(model_name='all-MiniLM-L6-v2')``,
/root/reference/conversadocs/bones.py:71) and counts tokens with the
llama.cpp tokenizer (``get_num_tokens``,
/root/reference/conversadocs/llamacppmodels.py:307-309). Neither model
ships in this environment, and neither is deterministic across
versions — so per SURVEY.md §5.2 the engine provides:

- ``mock_embed_udf``: a deterministic hash-seeded unit vector per text,
  as an Arrow-batched ``pandas_udf``. The *plumbing* is exactly what a
  real model needs — Arrow batches in, ``array<float>`` out, pure
  function of the text so any partitioning/retry yields identical
  results. Swapping in a real encoder changes only the kernel body
  (load the model once per worker via the iterator form of
  ``mapInPandas`` — see operators/multimodal.py for that pattern).
- ``token_count_udf``: regex token count (BPE-ish letter/digit/other
  classes) — same value as the pure-Catalyst
  ``size(regexp_extract_all(text, TOKEN_PATTERN, 0))``, which is what
  makes the UDF path oracle-checkable end to end.

Scale notes: both are narrow per-row maps — no shuffle, embarrassingly
parallel, Arrow-vectorized. At 100 TB the embed stage is compute-bound
(model inference), so the win is batching + per-worker model reuse, not
plan shape.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, IntegerType

from conversadocs_spark.functions.text import TOKEN_PATTERN
from conversadocs_spark.serde import pickle_module_by_value

DEFAULT_EMBED_DIM = 64  # fixture embedding dim (FIXTURES.md)


def _embed_one(text: str, dim: int) -> list[float]:
    """Deterministic unit vector: sha256(text) seeds a PCG64 stream.

    Stable across partitionings, sessions, and platforms (NumPy
    Generator bit streams are versioned-stable), so the operator is
    safely retryable — the property a real frozen model also has.
    """
    seed = int.from_bytes(
        hashlib.sha256((text or "").encode("utf-8")).digest()[:8], "big"
    )
    vec = np.random.default_rng(seed).standard_normal(dim)
    norm = float(np.linalg.norm(vec))
    if norm == 0.0:
        return [0.0] * dim
    return (vec / norm).astype(np.float32).tolist()


def mock_embed_udf(dim: int = DEFAULT_EMBED_DIM):
    """array<float> pandas_udf: text -> deterministic unit vector."""

    @F.pandas_udf(ArrayType(FloatType()))
    def embed(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: _embed_one(t, dim))

    return embed


def token_count_udf():
    """int pandas_udf: text -> number of BPE-ish tokens (R17 stand-in).

    Matches size(regexp_extract_all(text, TOKEN_PATTERN, 0)) exactly —
    the pattern uses no constructs that differ between Python re and
    Java/DuckDB regex.
    """
    pat = re.compile(TOKEN_PATTERN)

    @F.pandas_udf(IntegerType())
    def token_count(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: len(pat.findall(t or ""))).astype(
            "int32"
        )

    return token_count


pickle_module_by_value(__name__)
