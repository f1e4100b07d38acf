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
import os
import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StructField,
    StructType,
)

from conversadocs_spark.functions.text import TOKEN_PATTERN
from conversadocs_spark.serde import pickle_module_by_value

DEFAULT_EMBED_DIM = 64  # fixture embedding dim (FIXTURES.md)

#: Set to a sentence-transformers model name (or "1" for the
#: reference's all-MiniLM-L6-v2, bones.py:71) to route embed_texts
#: through the real encoder. Unset = deterministic mock (the oracle
#: surface's determinism rule, SURVEY.md §5.2).
REAL_EMBED_ENV = "SPARK_GRAFT_REAL_EMBED"

_DEFAULT_MODEL = "sentence-transformers/all-MiniLM-L6-v2"


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


class _FakeSentenceModel:
    """Deterministic stand-in with the SentenceTransformer.encode API
    surface the kernel uses — lets CI drive the real mapInPandas
    iterator path (per-task model init, Arrow batch loop, normalize
    contract) without the library or a model download (r5 verdict
    item 9). Selected via model name ``fake:<dim>``."""

    def __init__(self, dim: int):
        self.dim = dim

    def encode(self, texts, batch_size=32, normalize_embeddings=True):
        del batch_size  # API-compat; the fake has no batching cost
        out = [_embed_one(t, self.dim) for t in texts]
        if not normalize_embeddings:  # pragma: no cover - always True
            raise ValueError("kernel always normalizes")
        return np.asarray(out, dtype=np.float32)


def real_embed_map(model_name: str = _DEFAULT_MODEL, batch_size: int = 64):
    """mapInPandas ITERATOR kernel for a real sentence-transformer
    (reference R6, bones.py:71): the model loads ONCE per Python
    worker task — the per-partition init pattern proven in
    operators/multimodal.py — then encodes Arrow batches, appending a
    unit-normalized float32 ``embedding`` column.

    Import-guarded: sentence-transformers is not in this container, so
    the kernel raises a clear actionable error at *execution* time if
    the library is missing. A ``fake:<dim>`` model name substitutes
    the deterministic ``_FakeSentenceModel`` so the iterator plumbing
    itself runs under test."""

    def _load_model():
        if model_name.startswith("fake:"):
            return _FakeSentenceModel(int(model_name.split(":", 1)[1]))
        try:
            from sentence_transformers import (  # type: ignore
                SentenceTransformer,
            )
        except ImportError as e:  # pragma: no cover - lib not installed
            raise ImportError(
                "real embedding path requires sentence-transformers "
                "(pip install sentence-transformers); unset "
                f"{REAL_EMBED_ENV} to use the deterministic mock"
            ) from e
        return SentenceTransformer(model_name)

    def embed_iter(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        model = _load_model()  # once per task
        for pdf in batches:
            vecs = model.encode(
                pdf["text"].fillna("").tolist(),
                batch_size=batch_size,
                normalize_embeddings=True,
            )
            out = pdf.copy()
            out["embedding"] = [
                np.asarray(v, dtype=np.float32).tolist() for v in vecs
            ]
            yield out

    return embed_iter


def embed_texts(
    df: DataFrame,
    text_col: str = "text",
    dim: int = DEFAULT_EMBED_DIM,
    model_name: str | None = None,
) -> DataFrame:
    """Append an ``embedding array<float>`` column to ``df``.

    Default: the deterministic mock pandas_udf (retry-safe, oracle
    surface). If ``model_name`` is given — or the ``SPARK_GRAFT_
    REAL_EMBED`` env var is set ("1" means the reference's MiniLM) —
    the real sentence-transformer runs via the mapInPandas iterator
    kernel instead. Same output schema either way, so downstream knn /
    index / dedup plans are oblivious to which encoder produced the
    vectors."""
    name = model_name or os.environ.get(REAL_EMBED_ENV)
    if not name:
        return df.withColumn(
            "embedding", mock_embed_udf(dim)(F.col(text_col))
        )
    if name == "1":
        name = _DEFAULT_MODEL
    src = df
    if text_col != "text":
        src = df.withColumnRenamed(text_col, "text")
    schema = StructType(
        src.schema.fields
        + [StructField("embedding", ArrayType(FloatType()))]
    )
    out = src.mapInPandas(real_embed_map(name), schema=schema)
    if text_col != "text":
        out = out.withColumnRenamed("text", text_col)
    return out


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


def pool_doc_embeddings(
    chunks: DataFrame,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    weight_col: str | None = None,
) -> DataFrame:
    """Chunk-level embeddings -> one document vector: element-wise
    (optionally weighted) mean, then L2 normalization — the standard
    pooling that bridges chunk retrieval (R9) and document-level
    ANN/dedup (`dedup_embedding`, `ann_ivf`).

    Scale shape: posexplode to (id, pos, component) rows, one hash
    aggregate keyed by (id, pos) with map-side combine, regroup to
    the array — the same dim-exploded aggregation as
    `vector_centroid`/IVF cell means, corpus-linear with no window
    and no driver-side vectors. Weighted form (e.g. by chunk token
    count) multiplies before the sum and divides by the weight total,
    so short trailing chunks don't dominate the mean.
    """
    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1.0)
    )
    exploded = chunks.select(
        F.col(id_col).alias("id"),
        w.alias("w"),
        F.posexplode(F.col(vec_col)).alias("pos", "x"),
    )
    comp = exploded.groupBy("id", "pos").agg(
        (F.sum(F.col("x") * F.col("w")) / F.sum("w")).alias("m")
    )
    pooled = comp.groupBy("id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("m")))
            ),
            lambda s: s.getField("m"),
        ).alias("mean_vec")
    )
    norm = F.sqrt(
        F.aggregate(
            "mean_vec",
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        )
    )
    return pooled.select(
        F.col("id").alias(id_col),
        F.transform(
            "mean_vec", lambda x: (x / norm).cast("float")
        ).alias(vec_col),
    )
