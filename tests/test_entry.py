"""Driver-contract smoke tests: entry() runs, registry is consistent."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["vec_id", "sim", "source"]


def test_registry_consistent():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert q, "no queries registered"
    # every oracle key must have a query
    assert set(o) <= set(q)


def test_all_queries_run_smoke(spark, sf_dir):
    """Every registered query must at least execute at sf0.001."""
    for name, fn in entry_mod.queries().items():
        df = fn(spark, sf_dir)
        df.limit(5).collect()
