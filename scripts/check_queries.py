#!/usr/bin/env python
"""Spot-check named queries against their DuckDB oracles at one sf dir
(the per-query form of scripts/scale_gate.py, for fast iteration).

Usage:
    python scripts/check_queries.py SF_DIR name [name ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    import duckdb

    import __spark_entry__ as entry
    from conversadocs_spark.session import get_spark
    from scripts.oracle_typelint import class_mismatches

    sf_dir, names = sys.argv[1], sys.argv[2:]
    spark = get_spark(app_name="check-queries")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        glob = "/*.parquet" if os.path.isdir(path) else ""
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}{glob}'")

    qs, oracles = entry.queries(), entry.oracle_sql()

    def norm(cols, rows):
        order = sorted(range(len(cols)), key=lambda i: cols[i])
        cell = lambda v: round(v, 6) if isinstance(v, float) else v  # noqa: E731
        return [cols[i] for i in order], sorted(
            [tuple(cell(r[i]) for i in order) for r in rows], key=str
        )

    bad = []
    for name in names:
        t0 = time.time()
        sdf = qs[name](spark, sf_dir)
        sc, sr = norm(sdf.columns, [tuple(r) for r in sdf.collect()])
        if name not in oracles:
            print(f"{name}: rows-only rows={len(sr)}"
                  f" ({time.time() - t0:.1f}s)")
            continue
        rel = con.sql(oracles[name])
        d_cols, d_types = list(rel.columns), [str(t) for t in rel.types]
        cur = con.execute(oracles[name])
        oc, orr = norm([d[0] for d in cur.description], cur.fetchall())
        # Type-class assertion (the r5/r12 HUGEINT lesson): value
        # compare is normalization-blind to column types, but the
        # driver's hash is not — assert coarse class parity too.
        ty_bad = class_mismatches(sdf.dtypes, d_cols, d_types)
        ok = sc == oc and sr == orr and not ty_bad
        if ty_bad:
            print(f"{name}: TYPE MISMATCH {ty_bad}")
        if not ok:
            bad.append(name)
            print(f"{name}: MISMATCH ({time.time() - t0:.1f}s)")
            print("  spark cols:", sc)
            print("  duck  cols:", oc)
            print("  spark rows:", len(sr), "duck rows:", len(orr))
            for a, b in list(zip(sr, orr))[:8]:
                if a != b:
                    print("   s:", a)
                    print("   d:", b)
        else:
            print(f"{name}: OK rows={len(sr)} ({time.time() - t0:.1f}s)")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
