"""Property tests for the mock embed + token count operators (R6/R17):
dimension, unit norm, determinism across partitionings, and agreement
between the pandas_udf token counter and the pure-Catalyst expression."""

from __future__ import annotations

import importlib.util
import math

import pytest
from pyspark.sql import functions as F

from conversadocs_spark import io
from conversadocs_spark.operators.embed import (
    DEFAULT_EMBED_DIM,
    REAL_EMBED_ENV,
    _embed_one,
    embed_texts,
    mock_embed_udf,
    token_count_udf,
)
from conversadocs_spark.functions.text import TOKEN_PATTERN

_HAVE_ST = importlib.util.find_spec("sentence_transformers") is not None


def test_embed_kernel_deterministic_unit_norm():
    a = _embed_one("hello world", DEFAULT_EMBED_DIM)
    b = _embed_one("hello world", DEFAULT_EMBED_DIM)
    c = _embed_one("hello worlds", DEFAULT_EMBED_DIM)
    assert a == b
    assert a != c
    assert len(a) == DEFAULT_EMBED_DIM
    assert math.isclose(sum(x * x for x in a), 1.0, rel_tol=1e-5)


def test_embed_udf_dim_and_determinism_across_partitionings(spark, sf_dir):
    docs = io.table(spark, sf_dir, "documents").limit(100)
    emb = mock_embed_udf(DEFAULT_EMBED_DIM)

    def run(df):
        return {
            (r.doc_id, tuple(r.embedding))
            for r in df.select(
                "doc_id", emb(F.col("text")).alias("embedding")
            ).collect()
        }

    one = run(docs.repartition(1))
    many = run(docs.repartition(13))
    assert one == many
    dims = {len(e) for _, e in one}
    assert dims == {DEFAULT_EMBED_DIM}


def test_embed_texts_default_is_mock(spark, sf_dir, monkeypatch):
    """Without the env flag, embed_texts must be byte-identical to the
    deterministic mock UDF — the oracle surface's determinism rule."""
    monkeypatch.delenv(REAL_EMBED_ENV, raising=False)
    docs = io.table(spark, sf_dir, "documents").limit(50)
    via_front_door = {
        (r.doc_id, tuple(r.embedding))
        for r in embed_texts(docs).select("doc_id", "embedding").collect()
    }
    emb = mock_embed_udf(DEFAULT_EMBED_DIM)
    direct = {
        (r.doc_id, tuple(r.embedding))
        for r in docs.select(
            "doc_id", emb(F.col("text")).alias("embedding")
        ).collect()
    }
    assert via_front_door == direct


def test_embed_texts_env_flag_routes_to_real_kernel(
    spark, sf_dir, monkeypatch
):
    """Flag set but library absent: the real path must be selected
    (schema gains the embedding column pre-execution) and fail at
    execution with the actionable install message — not silently fall
    back to the mock."""
    if _HAVE_ST:  # pragma: no cover - lib not in this container
        pytest.skip("sentence-transformers installed; covered below")
    monkeypatch.setenv(REAL_EMBED_ENV, "1")
    docs = io.table(spark, sf_dir, "documents").limit(5)
    out = embed_texts(docs)
    assert "embedding" in out.columns  # plan built via the real path
    with pytest.raises(Exception, match="sentence-transformers"):
        out.collect()


def test_embed_texts_fake_model_drives_iterator_path(
    spark, sf_dir, monkeypatch
):
    """Run the REAL mapInPandas iterator kernel end-to-end with the
    injected fake model (env hook model name fake:<dim>) — per-task
    model init, Arrow batch loop, schema contract, normalization —
    without sentence-transformers installed (r5 verdict item 9). The
    output must be deterministic across partitionings, unit-norm, and
    carry the requested dim."""
    monkeypatch.setenv(REAL_EMBED_ENV, "fake:32")
    docs = io.table(spark, sf_dir, "documents").limit(40)
    a = {
        (r.doc_id, tuple(r.embedding))
        for r in embed_texts(docs.repartition(2))
        .select("doc_id", "embedding")
        .collect()
    }
    b = {
        (r.doc_id, tuple(r.embedding))
        for r in embed_texts(docs.repartition(7))
        .select("doc_id", "embedding")
        .collect()
    }
    assert a == b and len(a) == 40
    for _, vec in a:
        assert len(vec) == 32
        assert math.isclose(sum(x * x for x in vec), 1.0, rel_tol=1e-3)


@pytest.mark.skipif(
    not _HAVE_ST, reason="sentence-transformers not installed"
)
def test_embed_texts_real_model(spark, sf_dir, monkeypatch):  # pragma: no cover
    """Production path: real encoder, unit-normalized vectors, stable
    dim, schema identical to the mock path."""
    monkeypatch.setenv(REAL_EMBED_ENV, "1")
    docs = io.table(spark, sf_dir, "documents").limit(8)
    rows = embed_texts(docs).select("doc_id", "embedding").collect()
    assert len(rows) == 8
    dims = {len(r.embedding) for r in rows}
    assert len(dims) == 1
    for r in rows:
        assert math.isclose(
            sum(x * x for x in r.embedding), 1.0, rel_tol=1e-3
        )


def test_token_count_udf_matches_catalyst_expression(spark, sf_dir):
    docs = io.table(spark, sf_dir, "documents")
    both = docs.select(
        token_count_udf()(F.col("text")).alias("py"),
        F.size(
            F.regexp_extract_all("text", F.lit(TOKEN_PATTERN), 0)
        ).alias("jvm"),
    )
    assert both.where(F.col("py") != F.col("jvm")).count() == 0
