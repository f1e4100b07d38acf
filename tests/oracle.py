"""Local replica of the driver's t2 correctness check.

Runs a registered Spark query and its DuckDB oracle SQL over the same
parquet fixtures, then compares row count, column names, and
order-insensitive values (floats rounded to 6 decimals, matching
FIXTURES.md tolerance rules).
"""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb

from conversadocs_spark.io import TABLES


def run_duckdb(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    return v


def _normalize(cols, rows):
    """Sort columns by name, normalize cells, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return [cols[i] for i in order], out


def assert_query_matches_oracle(spark, name: str, sf_dir: str) -> None:
    """Run queries()[name] and oracle_sql()[name]; assert they agree."""
    from conversadocs_spark.plans import ORACLES, QUERIES

    sdf = QUERIES[name](spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    o_cols, o_rows = run_duckdb(ORACLES[name], sf_dir)

    s_cols_n, s_norm = _normalize(s_cols, s_rows)
    o_cols_n, o_norm = _normalize(o_cols, o_rows)

    assert s_cols_n == o_cols_n, (
        f"{name}: column mismatch spark={s_cols_n} oracle={o_cols_n}"
    )
    assert len(s_norm) == len(o_norm), (
        f"{name}: row count spark={len(s_norm)} oracle={len(o_norm)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_norm, o_norm)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first 3: {mismatches[:3]}"
    )
