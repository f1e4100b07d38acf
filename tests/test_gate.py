"""Unit tests for scripts/scale_gate.py's big-output value signal.

Above the gate's hash-compare cap the only feasible check is
engine-side: per-column checksums computed by BOTH Spark and DuckDB
over the full result. These tests pin that the signal (a) agrees when
the data agrees, (b) diverges when a value differs while the row
COUNT still matches (exactly the blind spot count-parity had), and
(c) applies per-type rules (float tolerance, string length, bool).
"""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest

_GATE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "scale_gate.py",
)


@pytest.fixture(scope="module")
def gate():
    spec = importlib.util.spec_from_file_location("scale_gate", _GATE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_ROWS = [
    (1, 1.25, "alpha", True),
    (2, -0.5, "bb", False),
    (3, 7.0, "", True),
    (4, None, None, None),
]
_SCHEMA = "id long, val double, s string, flag boolean"


def _ducksetup(rows):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (id BIGINT, val DOUBLE, s VARCHAR, "
        "flag BOOLEAN)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)
    return con


def test_value_signals_agree_on_identical_data(spark, gate):
    sdf = spark.createDataFrame(_ROWS, _SCHEMA)
    con = _ducksetup(_ROWS)
    ssig, osig, ok = gate.value_signals(con, sdf, "SELECT * FROM t")
    assert ok, f"signals diverged on identical data: {ssig} vs {osig}"
    assert ssig is not None and osig is not None


def test_value_signals_catch_value_drift_at_equal_count(spark, gate):
    """The case count-parity is blind to: same cardinality, one
    different value."""
    drifted = [(1, 1.25, "alpha", True), (2, -0.5, "bb", False),
               (3, 7.0, "", True), (4, 999.0, None, None)]
    sdf = spark.createDataFrame(_ROWS, _SCHEMA)
    con = _ducksetup(drifted)
    _, _, ok = gate.value_signals(con, sdf, "SELECT * FROM t")
    assert not ok


def test_value_signals_catch_string_and_bool_drift(spark, gate):
    drift_s = [(1, 1.25, "alphaX", True), (2, -0.5, "bb", False),
               (3, 7.0, "", True), (4, None, None, None)]
    drift_b = [(1, 1.25, "alpha", False), (2, -0.5, "bb", False),
               (3, 7.0, "", True), (4, None, None, None)]
    sdf = spark.createDataFrame(_ROWS, _SCHEMA)
    for rows in (drift_s, drift_b):
        con = _ducksetup(rows)
        _, _, ok = gate.value_signals(con, sdf, "SELECT * FROM t")
        assert not ok


def test_value_signals_tolerate_float_summation_order(spark, gate):
    """Engines sum floats in different orders; the comparison must
    not flag last-ulp noise (rel_tol covers it)."""
    rows = [(i, 0.1 * i, "x", True) for i in range(1, 200)]
    sdf = spark.createDataFrame(rows, _SCHEMA)
    con = _ducksetup(list(reversed(rows)))
    _, _, ok = gate.value_signals(con, sdf, "SELECT * FROM t")
    assert ok


def test_value_signals_skip_unsignalable_columns(spark, gate):
    """All-array schema -> no signal, reported as vacuous-ok (the
    gate prints 'no signal-able columns' instead of a fake pass)."""
    sdf = spark.createDataFrame(
        [([1.0, 2.0],), ([3.0],)], "emb array<double>"
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (emb DOUBLE[])")
    ssig, osig, ok = gate.value_signals(con, sdf, "SELECT * FROM t")
    assert (ssig, osig, ok) == (None, None, True)


def test_value_signals_midpoint_unambiguous(spark, gate):
    """Round-half midpoints (x.xxx5) were the ADVICE r8 hazard: Spark
    round is BigDecimal HALF_UP, DuckDB round is C round, and they
    can disagree on the same double. The floor(x*1000 + 0.5)
    integerization is the identical IEEE expression in both engines,
    so a result column full of midpoints must still agree exactly."""
    rows = [(i, (2 * i + 1) / 2000.0, "m", True) for i in range(50)]
    rows += [(100 + i, -(2 * i + 1) / 2000.0, "m", False)
             for i in range(50)]
    sdf = spark.createDataFrame(rows, _SCHEMA)
    con = _ducksetup(list(reversed(rows)))
    ssig, osig, ok = gate.value_signals(con, sdf, "SELECT * FROM t")
    assert ok, f"midpoint column diverged: {ssig} vs {osig}"
