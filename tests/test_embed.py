"""Property tests for the mock embed + token count operators (R6/R17):
dimension, unit norm, determinism across partitionings, and agreement
between the pandas_udf token counter and the pure-Catalyst expression."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from conversadocs_spark import io
from conversadocs_spark.functions.text import TOKEN_PATTERN
from conversadocs_spark.operators.embed import (
    DEFAULT_EMBED_DIM,
    _embed_one,
    mock_embed_udf,
    token_count_udf,
)


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


def test_token_count_udf_matches_catalyst_expression(spark, sf_dir):
    docs = io.table(spark, sf_dir, "documents")
    both = docs.select(
        token_count_udf()(F.col("text")).alias("py"),
        F.size(
            F.regexp_extract_all("text", F.lit(TOKEN_PATTERN), 0)
        ).alias("jvm"),
    )
    assert both.where(F.col("py") != F.col("jvm")).count() == 0
