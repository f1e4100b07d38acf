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


# --------------------------------------------------------------------------
# VERDICT r9 #6: the quadratic-oracle queries' scale runs must assert
# values. Unit-level: each checker's diverge path on tampered outputs.
# Integration: every QUADRATIC_CHECKS entry green on its real query at
# sf0.01 (the same call the gate makes at sf1/sf10).
# --------------------------------------------------------------------------


def test_quadratic_checks_green_on_real_queries(
    spark, gate, sf_oracle_dir
):
    from conversadocs_spark.plans import QUERIES

    con = duckdb.connect()
    for t in ("documents", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{sf_oracle_dir}/{t}.parquet'"
        )
    for name, check in gate.QUADRATIC_CHECKS.items():
        sdf = QUERIES[name](spark, sf_oracle_dir)
        ok, note = check(spark, con, sdf)
        assert ok, f"{name}: {note}"


def _doc_con(texts):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(texts.items())
    )
    return con


def test_pair_checker_catches_wrong_jaccard(spark, gate):
    texts = {
        1: "a b c d e f",       # shingles {a b c, b c d, c d e, d e f}
        2: "a b c d e g",       # true jaccard = 3/5 = 0.6
    }
    con = _doc_con(texts)
    good = spark.createDataFrame(
        [(1, 2, 0.6)], "id1 long, id2 long, jaccard_sim double"
    )
    ok, _ = gate.check_dedup_pairs_values(spark, con, good)
    assert ok
    wrong_val = spark.createDataFrame(
        [(1, 2, 0.75)], "id1 long, id2 long, jaccard_sim double"
    )
    ok, note = gate.check_dedup_pairs_values(spark, con, wrong_val)
    assert not ok and "mismatches=1" in note
    non_canonical = spark.createDataFrame(
        [(2, 1, 0.6)], "id1 long, id2 long, jaccard_sim double"
    )
    ok, _ = gate.check_dedup_pairs_values(spark, con, non_canonical)
    assert not ok
    below_batch_floor = spark.createDataFrame(
        [(1, 2, 0.6)], "id1 long, id2 long, jaccard_sim double"
    )
    ok, _ = gate.check_dedup_pairs_values(
        spark, con, below_batch_floor, min_id2=400
    )
    assert not ok


def test_cluster_checker_catches_broken_fixed_point(spark, gate):
    schema = "doc_id long, cluster_id long, is_survivor boolean"
    good = spark.createDataFrame(
        [(1, 1, True), (5, 1, False), (9, 1, False),
         (2, 2, True), (4, 2, False)],
        schema,
    )
    ok, _ = gate.check_clusters_fixed_point(spark, None, good)
    assert ok
    # cluster_id is not the min member id
    not_min = spark.createDataFrame(
        [(1, 5, False), (5, 5, True)], schema
    )
    ok, _ = gate.check_clusters_fixed_point(spark, None, not_min)
    assert not ok
    # singleton cluster
    single = spark.createDataFrame([(3, 3, True)], schema)
    ok, _ = gate.check_clusters_fixed_point(spark, None, single)
    assert not ok
    # two survivors
    twosurv = spark.createDataFrame(
        [(1, 1, True), (5, 1, True)], schema
    )
    ok, _ = gate.check_clusters_fixed_point(spark, None, twosurv)
    assert not ok
    # one doc labeled twice
    double = spark.createDataFrame(
        [(1, 1, True), (5, 1, False), (5, 2, False), (2, 2, True),
         (7, 2, False)],
        schema,
    )
    ok, _ = gate.check_clusters_fixed_point(spark, None, double)
    assert not ok


def test_basket_checker_catches_wrong_lift(spark, gate):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE lineitem (l_orderkey BIGINT, l_partkey BIGINT)"
    )
    # 4 orders; parts 10,20 co-occur in orders 1 and 2 and 3
    rows = [(1, 10), (1, 20), (2, 10), (2, 20), (3, 10), (3, 20),
            (4, 30)]
    con.executemany("INSERT INTO lineitem VALUES (?, ?)", rows)
    # n_orders=4, n10=3, n20=3, pair=3 -> lift = 3*4/(3*3) = 1.333333
    schema = "part_a long, part_b long, pair_n long, lift double"
    good = spark.createDataFrame([(10, 20, 3, round(12 / 9, 6))], schema)
    ok, note = gate.check_basket_lift_values(spark, con, good)
    assert ok, note
    wrong_lift = spark.createDataFrame([(10, 20, 3, 1.5)], schema)
    ok, note = gate.check_basket_lift_values(spark, con, wrong_lift)
    assert not ok and "mismatches=1" in note
    wrong_n = spark.createDataFrame(
        [(10, 20, 4, round(16 / 9, 6))], schema
    )
    ok, _ = gate.check_basket_lift_values(spark, con, wrong_n)
    assert not ok
    below_support = spark.createDataFrame(
        [(10, 20, 2, round(8 / 9, 6))], schema
    )
    ok, _ = gate.check_basket_lift_values(spark, con, below_support)
    assert not ok


# ---------------------------------------------------------------- #
# Oracle result-TYPE lint (scripts/oracle_typelint.py): the r5/r12
# HUGEINT class. Value-normalized gates cannot see column types, so
# the lint must (a) flag an injected uncast sum(BIGINT) oracle and
# (b) find ZERO offenders in the live registry.
# ---------------------------------------------------------------- #

_TYPELINT = os.path.join(
    os.path.dirname(_GATE), "oracle_typelint.py")


@pytest.fixture(scope="module")
def typelint():
    spec = importlib.util.spec_from_file_location(
        "oracle_typelint", _TYPELINT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_typelint_catches_injected_hugeint(typelint):
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT CAST(1 AS BIGINT) AS x")
    bad = typelint.hugeint_offenders(con, {
        "uncast": "SELECT sum(x) AS total FROM t",       # HUGEINT
        "negated": "SELECT -sum(x) AS total FROM t",      # HUGEINT
        "cast_ok": "SELECT CAST(sum(x) AS BIGINT) AS total FROM t",
        "bindless": "SELECT nope FROM t",
    })
    assert any(b.startswith("uncast.total=") for b in bad)
    assert any(b.startswith("negated.total=") for b in bad)
    assert any(b.startswith("bindless: BIND-ERR") for b in bad)
    assert not any(b.startswith("cast_ok") for b in bad)


def test_typelint_registry_clean(typelint):
    sf = os.environ.get("SPARK_GRAFT_TYPELINT_SF",
                        "/root/testdata/sf0.001")
    if not os.path.isdir(sf):
        pytest.skip(f"no testdata at {sf}")
    from conversadocs_spark.plans import ORACLES
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders "
              "lineitem events documents embeddings").split():
        p = os.path.join(sf, f"{t}.parquet")
        glob = "/*.parquet" if os.path.isdir(p) else ""
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}{glob}'")
    assert typelint.hugeint_offenders(con, ORACLES) == []


def test_typelint_class_parity_helpers(typelint):
    tc, sc = typelint.type_class, typelint.spark_type_class
    assert tc("BIGINT") == sc("bigint") == "int"
    assert tc("INTEGER") == sc("int") == "int"       # width-blind
    assert tc("DOUBLE") == sc("double") == "float"
    assert tc("VARCHAR") == sc("string") == "str"
    assert tc("VARCHAR[]") == sc("array<string>") == "array"
    assert tc("HUGEINT") == "BANNED"
    assert tc("STRUCT(a BIGINT)[]") == "array"
    bad = typelint.class_mismatches(
        [("a", "bigint"), ("b", "double")],
        ["a", "b"], ["HUGEINT", "DOUBLE"])
    assert bad and "a:" in bad[0]
    assert typelint.class_mismatches(
        [("a", "bigint")], ["a"], ["INTEGER"]) == []
