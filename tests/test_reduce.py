"""Hierarchical reduce (R14): termination bound + equivalence with the
oracle-checked fixed two-level tree in plans/rag.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from conversadocs_spark import io
from conversadocs_spark.functions.mockllm import mock_summarize
from conversadocs_spark.operators.chunker import split_fixed
from conversadocs_spark.operators.reduce import (
    expected_levels,
    hierarchical_reduce,
)


def _mapped_chunks(spark, sf_dir):
    docs = io.table(spark, sf_dir, "documents")
    chunks = split_fixed(docs, chunk_size=100, overlap=20)
    return chunks.select(
        "doc_id", "seq", mock_summarize(F.col("chunk")).alias("partial")
    )


def test_terminates_in_log_rounds(spark, sf_dir):
    mapped = _mapped_chunks(spark, sf_dir).cache()
    max_chunks = (
        mapped.groupBy("doc_id").count().agg(F.max("count")).first()[0]
    )
    reduced, levels = hierarchical_reduce(
        mapped, mock_summarize, text_col="partial", fanout=4
    )
    assert levels == expected_levels(max_chunks, fanout=4)
    # one summary per document
    n_docs = mapped.select("doc_id").distinct().count()
    assert reduced.count() == n_docs
    mapped.unpersist()


def test_matches_fixed_two_level_query(spark, sf_dir):
    """While fixture docs yield <= 16 chunks, the generic loop runs
    exactly 2 levels and must equal the oracle-checked plan."""
    from conversadocs_spark.plans import QUERIES

    mapped = _mapped_chunks(spark, sf_dir)
    reduced, levels = hierarchical_reduce(
        mapped, mock_summarize, text_col="partial", fanout=4
    )
    assert levels == 2
    got = {
        (r.doc_id, r.partial) for r in reduced.collect()
    }
    want = {
        (r.doc_id, r.summary)
        for r in QUERIES["summarize_mapreduce"](spark, sf_dir).collect()
    }
    assert got == want


def test_reduce_deterministic_across_partitionings(spark, sf_dir):
    mapped = _mapped_chunks(spark, sf_dir)
    one, _ = hierarchical_reduce(
        mapped.repartition(1), mock_summarize, text_col="partial"
    )
    many, _ = hierarchical_reduce(
        mapped.repartition(16), mock_summarize, text_col="partial"
    )
    assert {tuple(r) for r in one.collect()} == {
        tuple(r) for r in many.collect()
    }
