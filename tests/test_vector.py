"""Vector operator tests: flagship kNN vs DuckDB oracle."""

from __future__ import annotations

import pytest

from tests.oracle import assert_query_matches_oracle


@pytest.mark.parametrize("name", ["knn_topk"])
def test_vector_query_matches_oracle(spark, sf_oracle_dir, name):
    assert_query_matches_oracle(spark, name, sf_oracle_dir)
