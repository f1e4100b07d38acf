#!/usr/bin/env python
"""Dev helper: run EVERY registered query against its DuckDB oracle at
sf0.01 (the driver's t2 shape) and print a pass/fail table. Queries
without an oracle get a rows-only execution check.

Usage: python tests/run_oracle_sweep.py [name ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    from oracle import assert_query_matches_oracle

    from conversadocs_spark.plans import ORACLES, QUERIES
    from conversadocs_spark.session import get_spark

    spark = get_spark(app_name="oracle-sweep", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    names = sys.argv[1:] or sorted(QUERIES)
    failures = []
    for name in names:
        t0 = time.perf_counter()
        try:
            if name in ORACLES:
                assert_query_matches_oracle(spark, name, SF_DIR)
                status = "PASS"
            else:
                n = QUERIES[name](spark, SF_DIR).count()
                status = f"ROWS-ONLY ({n} rows)"
        except Exception as e:  # noqa: BLE001
            status = f"FAIL: {e}"
            failures.append(name)
            traceback.print_exc()
        dt = time.perf_counter() - t0
        print(f"{name:28s} {dt:6.2f}s  {status}")
    print(f"\n{len(names) - len(failures)}/{len(names)} ok")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
